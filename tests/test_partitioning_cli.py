"""Salted key partitioning, partial aggregation, and the CLI."""

import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_salted_partition_spreads_hot_key(ray_session):
    import ray.data
    from rdf_mapper_ray.engine.partitioning import salted_partition_ids
    rows = ([{"repo": "mega", "v": i} for i in range(5000)]
            + [{"repo": f"r{i}", "v": i} for i in range(100)])
    ds = ray.data.from_items(rows)
    out = salted_partition_ids(ds, "repo", num_partitions=64,
                               salt=8).to_pandas()
    mega = out[out["repo"] == "mega"]["pid"].nunique()
    assert 2 <= mega <= 8            # hot key spread over <= salt partitions
    cold = out[out["repo"] == "r1"]["pid"].nunique()
    assert cold == 1                 # cold keys stay co-located


def test_detect_hot_keys(ray_session):
    import ray.data
    from rdf_mapper_ray.engine.partitioning import detect_hot_keys
    rows = ([{"k": "hot"}] * 900) + [{"k": f"c{i}"} for i in range(100)]
    ds = ray.data.from_items(rows)
    assert detect_hot_keys(ds, "k") == ["hot"]


def test_repo_stats_partial_agg(ray_session):
    from rdf_mapper_ray.engine.partitioning import repo_stats
    out = repo_stats(SF).to_pandas().sort_values("repo")
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "lang"]).to_pandas()
    expect = t.groupby("source").agg(
        n_files=("lang", "count"), n_langs=("lang", "nunique"))
    assert len(out) == len(expect)
    m = out.set_index("repo").join(expect, rsuffix="_e")
    assert (m["n_files"] == m["n_files_e"]).all()
    assert (m["n_langs"] == m["n_langs_e"]).all()


def test_cli_parquet_and_turtle(tmp_path):
    spec = tmp_path / "spec.yaml"
    spec.write_text("""
globals:
  $datasetID: docs
namespaces:
  ex: "http://example.org/def/"
resources:
  - name: document
    properties:
      "@id": "<http://example.org/doc/{doc_id}>"
      "@type": "<ex:Document>"
      "<ex:source>": "{source}"
""")
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_ray", str(spec),
         f"{SF}/documents.parquet", str(out_dir),
         "--format", "parquet", "--columns", "doc_id,source",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    tbl = pa.concat_tables(
        [pq.read_table(str(f)) for f in out_dir.glob("*.parquet")])
    assert tbl.num_rows == 1000  # 500 docs x (type + source)

    ttl = tmp_path / "out.ttl"
    r = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_ray", str(spec),
         f"{SF}/documents.parquet", str(ttl),
         "--format", "turtle", "--columns", "doc_id,source",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    from rdf_mapper_ray.kernel.turtle import parse_turtle
    quads = parse_turtle(ttl.read_text())
    assert len(quads) == 1000
