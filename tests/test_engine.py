"""Ray engine tests: sources, extract, dedup, canonicalize, reconcile,
sharded resume, sinks — all on the sf0.001 testdata."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

DOC_SPEC = {
    "globals": {"$datasetID": "docs"},
    "namespaces": {"ex": "http://example.org/def/"},
    "resources": [{
        "name": "document",
        "properties": {
            "@id": "<http://example.org/doc/{doc_id}>",
            "@type": "<ex:Document>",
            "<ex:source>": "{source}",
            "<ex:chars>": "{n_chars | asInt}",
            "<ex:lang>": "{lang | autoCV('langs','label')}",
        },
    }],
}


@pytest.fixture(scope="module")
def docs_meta():
    t = pq.read_table(f"{SF}/documents.parquet")
    return {"rows": t.num_rows,
            "langs": len(set(t.column("lang").to_pylist()))}


def test_read_parquet_rows_deterministic(ray_session):
    from rdf_mapper_ray.engine.sources import read_parquet_rows
    ds = read_parquet_rows(f"{SF}/documents.parquet", columns=["doc_id"])
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # row numbers are the 1-based position within the (single) file
    assert df["$row"].tolist() == [i + 1 for i in range(len(df))]
    assert set(df["$file"]) == {"documents"}


def test_pipeline_counts(ray_session, docs_meta):
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    out = pipe.run_files(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    df = out.to_pandas()
    n, langs = docs_meta["rows"], docs_meta["langs"]
    # per-doc: type, source, chars, lang-concept-ref = 4; per lang: 5 concept
    # triples (type, prefLabel, inScheme, topConceptOf, hasTopConcept);
    # scheme: 3 (type, title, description)
    assert len(df) == 4 * n + 5 * langs + 3
    assert df["subject"].str.startswith("http://example.org/doc/").sum() == 4 * n
    # global dedup: no duplicate quads
    assert not df.duplicated().any()


def test_extract_matches_local_kernel(ray_session):
    """Ray extract output == local RowProcessor output on the same rows."""
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.kernel.processor import RowProcessor
    from rdf_mapper_ray.kernel.spec import MapperSpec

    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    out = pipe.run_files(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    ray_keys = {tuple(r) for r in out.to_pandas().itertuples(index=False)}

    rows = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    proc = RowProcessor(MapperSpec(DOC_SPEC, auto_declare=False),
                        filename="documents")
    proc.process_rows(rows)
    local_keys = {q.key() for q in proc.quads()}
    assert ray_keys == local_keys


def test_canonicalize_sameas(ray_session):
    import ray.data
    from rdf_mapper_ray.engine.canonicalize import canonicalize_sameas
    from rdf_mapper_ray.kernel.nodes import OWL_SAMEAS

    def row(s, p, o, ok="uri"):
        return {"graph": "g", "subject": s, "subject_kind": "uri",
                "predicate": p, "object_kind": ok, "object_value": o,
                "lang": None, "datatype": None}

    ds = ray.data.from_items([
        row("http://e/a", OWL_SAMEAS, "http://e/b"),
        row("http://e/b", OWL_SAMEAS, "http://e/c"),
        row("http://e/c", "http://e/p", "v", ok="literal"),
        row("http://e/x", "http://e/q", "http://e/b"),
        row("http://e/z", "http://e/p", "w", ok="literal"),
    ])
    out = canonicalize_sameas(ds).to_pandas()
    # all of a/b/c collapse to the lexicographically smallest: a
    subs = set(out["subject"])
    assert "http://e/b" not in subs and "http://e/c" not in subs
    assert ("http://e/a" in subs)
    objs = set(out.loc[out["object_kind"] == "uri", "object_value"])
    assert objs == {"http://e/a"}
    # self-sameAs dropped after rewrite
    assert not ((out["predicate"] == OWL_SAMEAS)
                & (out["subject"] == out["object_value"])).any()


RECON_SPEC = {
    "globals": {"$datasetID": "docs",
                "$reconciliationAPI": "urn:x-test-endpoint"},
    "resources": [{
        "name": "document",
        "properties": {
            "@id": "<http://example.org/doc/{doc_id}>",
            "linked": "{source | reconcile('srcEntity')}",
        },
    }],
}

# documents.source values are src0..src19; match two, proxy the rest
INDEX = {
    "src0": [{"id": "http://kb.example.org/Src0", "name": "src0",
              "score": 99, "match": True}],
    "src1": [{"id": "http://kb.example.org/Src1", "name": "src1",
              "score": 99, "match": True}],
}


@pytest.mark.parametrize("mode", ["inline", "mentions"])
def test_reconcile_modes(ray_session, mode):
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.engine.reconcile import InMemoryReconcileBackend

    backend = InMemoryReconcileBackend(INDEX)
    pipe = KGPipeline(RECON_SPEC, auto_declare=False, canonicalize=False,
                      reconcile_backend=backend, reconcile_mode=mode)
    out = pipe.run_files(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"])
    df = out.to_pandas()
    linked = df[df["predicate"].str.endswith("/def/linked")]
    assert (linked["object_value"] == "http://kb.example.org/Src0").any()
    assert (linked["object_value"] == "http://kb.example.org/Src1").any()
    # unmatched sources got deterministic proxy concepts, not mention URNs
    assert not linked["object_value"].str.startswith("urn:x-mention").any()
    proxies = linked[~linked["object_value"].str.startswith("http://kb.")]
    assert len(proxies) > 0
    labels = df[df["predicate"].str.endswith("prefLabel")]
    assert set(proxies["object_value"]) == set(labels["subject"])


def test_run_sharded_resume(ray_session, tmp_path, docs_meta):
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    workdir = str(tmp_path / "wk")
    out1 = pipe.run_sharded(f"{SF}/documents.parquet", workdir)
    n1 = out1.count()
    manifests = glob.glob(os.path.join(workdir, "manifests", "*.json"))
    assert manifests
    m = json.load(open(manifests[0]))
    assert m["rows"] == docs_meta["rows"] and m["errors"] == 0
    # rerun must skip the completed shard and produce identical output
    out2 = pipe.run_sharded(f"{SF}/documents.parquet", workdir)
    assert out2.count() == n1


def test_run_sharded_wide_stage_resume(ray_session, tmp_path):
    """Kill-and-resume MID-DEDUP: extract shards must not recompute and
    sealed dedup buckets must not rewrite; only unsealed buckets redo."""
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    workdir = str(tmp_path / "wk")
    out1 = pipe.run_sharded(f"{SF}/documents.parquet", workdir,
                            dedup_buckets=8)
    df1 = out1.to_pandas()
    marker = os.path.join(workdir, "dedup_COMPLETE.json")
    assert os.path.isfile(marker)
    meta1 = json.load(open(marker))
    assert meta1["buckets"] == 8 and meta1["resumed_buckets"] == 0

    # simulate a crash mid-dedup: completion marker gone, 3 of 8
    # buckets never sealed (manifest missing => bucket is garbage)
    os.remove(marker)
    buckets = sorted(glob.glob(os.path.join(workdir, "dedup",
                                            "bucket=*")))
    assert len(buckets) == 8
    for b in buckets[:3]:
        os.remove(os.path.join(b, "_MANIFEST.json"))
    stamp = {p: os.stat(os.path.join(p, "part.parquet")).st_mtime_ns
             for p in buckets}
    extract_stamp = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(workdir, "manifests", "*.json"))}

    out2 = pipe.run_sharded(f"{SF}/documents.parquet", workdir,
                            dedup_buckets=8)
    df2 = out2.to_pandas()
    # extract manifests untouched => no shard recomputation
    assert extract_stamp == {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(workdir, "manifests", "*.json"))}
    # sealed buckets skipped, unsealed rewritten
    for p in buckets[:3]:
        assert os.stat(os.path.join(p, "part.parquet")).st_mtime_ns \
            != stamp[p]
    for p in buckets[3:]:
        assert os.stat(os.path.join(p, "part.parquet")).st_mtime_ns \
            == stamp[p]
    meta2 = json.load(open(marker))
    assert meta2["resumed_buckets"] == 5
    # identical output either way
    key = ["subject", "predicate", "object_value"]
    assert df1.sort_values(key).reset_index(drop=True).equals(
        df2.sort_values(key).reset_index(drop=True))
    # third run: marker present => wide stages skipped entirely
    out3 = pipe.run_sharded(f"{SF}/documents.parquet", workdir,
                            dedup_buckets=8)
    assert out3.count() == len(df1)
    assert stamp[buckets[3]] == os.stat(
        os.path.join(buckets[3], "part.parquet")).st_mtime_ns


def test_turtle_roundtrip(ray_session):
    """Serialize pipeline output and re-parse with the kernel parser."""
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.engine.sinks import serialize_turtle
    from rdf_mapper_ray.kernel.turtle import parse_turtle

    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    out = pipe.run_files(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    out = out.filter(lambda r: r["subject"].endswith("/doc/1"))
    text = serialize_turtle(out, dict(pipe.spec.namespaces))
    keys = parse_turtle(text)
    df_keys = {tuple(r) for r in out.to_pandas().itertuples(index=False)}
    assert set(keys) == df_keys


def test_sparql_update_delete_roundtrip(ray_session):
    """Reference test_graphs.py:88-99: generate update + delete scripts,
    apply them to a seeded quad store, compare against the
    graphs-update.trig / graphs-delete.trig fixtures."""
    import io

    import ray.data
    from rdf_mapper_ray.engine.schema import quads_to_table
    from rdf_mapper_ray.engine.sinks import write_sparql_update
    from rdf_mapper_ray.kernel.turtle import canonical_quads
    from sparql_applier import apply_update
    from test_conformance import (GRAPHS_ROWS, GRAPHS_SPEC, _graphs_processor,
                                  load_expected)

    proc = _graphs_processor()
    ds = ray.data.from_arrow(quads_to_table(proc.quads()))
    namespaces = dict(proc.spec.namespaces)
    preserved = set(proc.state.preserved_graphs)

    seeded = {
        ("http://example.com/base", "http://example.com/should_go", "uri",
         "http://example.com/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.com/current", "http://example.com/should_stay",
         "uri", "http://example.com/p", "literal", "foo", None, None),
    }

    update_io, delete_io = io.StringIO(), io.StringIO()
    write_sparql_update(ds, namespaces, preserved, update_io, mode="update")
    write_sparql_update(ds, namespaces, preserved, delete_io, mode="delete")

    after_update = apply_update(update_io.getvalue(), seeded)
    expected = canonical_quads(load_expected("graphs-update.trig"))
    assert canonical_quads(list(after_update)) == expected

    after_delete = apply_update(delete_io.getvalue(), after_update)
    expected = canonical_quads(load_expected("graphs-delete.trig"))
    assert canonical_quads(list(after_delete)) == expected


def test_plugin_function_in_ray_workers(ray_session, tmp_path):
    """A Python plugin module (imports: [...] stanza) registers a custom
    transformer; workers recompile the spec from its raw dict and re-exec
    the plugin, so the function is available in every actor
    (SURVEY.md §2.2 C5)."""
    plugin = tmp_path / "shout_plugin.py"
    plugin.write_text(
        "from rdf_mapper_ray.kernel.functions import register\n"
        "def shout(value, state=None):\n"
        "    return str(value).upper() + '!'\n"
        "register('shout', shout)\n")
    spec = {
        "globals": {"$datasetID": "docs"},
        "namespaces": {"ex": "http://example.org/def/"},
        "imports": ["shout_plugin.py"],
        "resources": [{"name": "document", "properties": {
            "@id": "<http://example.org/doc/{doc_id}>",
            "<ex:loud>": "{source | shout}",
        }}],
    }
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.kernel.spec import MapperSpec
    pipe = KGPipeline(
        MapperSpec(spec, auto_declare=False,
                   search_paths=(str(tmp_path),)),
        canonicalize=False)
    out = pipe.run_files(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    loud = out[out["predicate"].str.endswith("/loud")]
    assert len(loud) == 500
    assert loud["object_value"].str.endswith("!").all()
    assert loud["object_value"].str.isupper().all()


def test_csv_and_jsonlines_sources(ray_session, tmp_path):
    """S1/S2: csv.DictReader semantics (all strings) and nested JSON
    values, with deterministic $file/$row (mapper.py:14-26)."""
    csv_path = tmp_path / "rows.csv"
    csv_path.write_text("id,label\n1,alpha\n2,beta\n")
    jsonl_path = tmp_path / "rows.jsonl"
    jsonl_path.write_text(
        '{"id": 1, "tags": ["a", "b"]}\n{"id": 2, "tags": ["c"]}\n')

    from rdf_mapper_ray.engine.sources import (read_csv_rows,
                                               read_jsonlines_rows)
    cdf = read_csv_rows(str(csv_path)).to_pandas().sort_values("$row")
    assert cdf["$row"].tolist() == [1, 2]
    assert set(cdf["$file"]) == {"rows"}
    assert cdf["id"].tolist() == ["1", "2"]       # CSV values are strings

    jdf = read_jsonlines_rows(str(jsonl_path)).to_pandas().sort_values("$row")
    assert jdf["id"].tolist() == [1, 2]           # JSON keeps types
    assert list(jdf["tags"].tolist()[0]) == ["a", "b"]  # nested values survive

    # end-to-end through the pipeline with a split fan-out over csv
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    spec = {"globals": {"$datasetID": "t"},
            "namespaces": {"ex": "http://e/"},
            "resources": [{"name": "r", "properties": {
                "@id": "<http://e/r/{id}>",
                "<ex:label>": "{label | toUpper}"}}]}
    pipe = KGPipeline(spec, auto_declare=False, canonicalize=False)
    out = pipe.run(read_csv_rows(str(csv_path))).to_pandas()
    assert sorted(out["object_value"]) == ["ALPHA", "BETA"]


def test_canonicalize_distributed_matches_unionfind(ray_session):
    """The min-label-propagation scale path produces exactly the
    union-find result, including a multi-hop chain component."""
    import ray.data
    from rdf_mapper_ray.engine.canonicalize import (
        canonicalize_sameas, canonicalize_sameas_distributed)
    from rdf_mapper_ray.kernel.nodes import OWL_SAMEAS

    def row(s, p, o, ok="uri"):
        return {"graph": "g", "subject": s, "subject_kind": "uri",
                "predicate": p, "object_kind": ok, "object_value": o,
                "lang": None, "datatype": None}

    rows = [row(f"http://e/n{i}", OWL_SAMEAS, f"http://e/n{i+1}")
            for i in range(6)]                       # chain n0..n6
    rows += [row("http://e/x", OWL_SAMEAS, "http://e/y"),
             row("http://e/n6", "http://e/p", "v", ok="literal"),
             row("http://e/z", "http://e/q", "http://e/n3")]
    ds = ray.data.from_items(rows)
    a = canonicalize_sameas(ds).to_pandas()
    b = canonicalize_sameas_distributed(ds).to_pandas()
    ka = set(map(tuple, a.values))
    kb = set(map(tuple, b.values))
    assert ka == kb
    assert ("g", "http://e/n0", "uri", "http://e/p", "literal", "v",
            None, None) in kb


def test_canonicalize_join_rewrite_matches_unionfind(ray_session):
    """driver_max_map=0 forces the co-partition-join rewrite (labels
    stay a Dataset end to end) — it must equal the union-find result,
    including self-sameAs dropping and literal non-rewrites whose value
    happens to equal a node URI."""
    import ray.data
    from rdf_mapper_ray.engine.canonicalize import (
        canonicalize_sameas, canonicalize_sameas_distributed)
    from rdf_mapper_ray.kernel.nodes import OWL_SAMEAS

    def row(s, p, o, ok="uri"):
        return {"graph": "g", "subject": s, "subject_kind": "uri",
                "predicate": p, "object_kind": ok, "object_value": o,
                "lang": None, "datatype": None}

    rows = [row(f"http://e/n{i}", OWL_SAMEAS, f"http://e/n{i+1}")
            for i in range(6)]
    rows += [row("http://e/x", OWL_SAMEAS, "http://e/y"),
             row("http://e/n6", "http://e/p", "v", ok="literal"),
             # literal whose VALUE is a rewritable node URI — must stay
             row("http://e/z", "http://e/q", "http://e/n3", ok="literal"),
             row("http://e/z", "http://e/q", "http://e/n3")]
    ds = ray.data.from_items(rows)
    a = canonicalize_sameas(ds).to_pandas()
    b = canonicalize_sameas_distributed(ds, driver_max_map=0).to_pandas()
    ka = sorted(map(tuple, a[sorted(a.columns)].values))
    kb = sorted(map(tuple, b[sorted(b.columns)].values))
    assert ka == kb
    lit = b[(b["object_kind"] == "literal") & (b["subject"] == "http://e/z")]
    assert lit["object_value"].tolist() == ["http://e/n3"]


def test_run_sharded_partial_failure_resume(ray_session, tmp_path):
    """Resume recomputes ONLY the shard whose checkpoint is missing:
    completed shards keep their output files untouched (north_rule:
    resumable from checkpoint with per-partition lineage)."""
    import shutil

    from rdf_mapper_ray.engine.pipeline import KGPipeline
    # two input files -> two shards
    src = pq.read_table(f"{SF}/documents.parquet")
    half = src.num_rows // 2
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(src.slice(0, half), str(d / "a.parquet"))
    pq.write_table(src.slice(half), str(d / "b.parquet"))

    pipe = KGPipeline(DOC_SPEC, auto_declare=False, canonicalize=False)
    workdir = str(tmp_path / "wk")
    n1 = pipe.run_sharded(str(d), workdir, files_per_shard=1).count()

    # simulate a failed shard 1: remove its manifest + output
    os.remove(os.path.join(workdir, "manifests", "shard=00001.json"))
    shutil.rmtree(os.path.join(workdir, "extract", "shard=00001"))
    kept = os.path.join(workdir, "extract", "shard=00000")
    mtime_before = os.path.getmtime(kept)

    n2 = pipe.run_sharded(str(d), workdir, files_per_shard=1).count()
    assert n2 == n1
    assert os.path.getmtime(kept) == mtime_before   # shard 0 untouched
    assert os.path.isfile(os.path.join(workdir, "manifests",
                                       "shard=00001.json"))


def test_row_uri_partition_order_independence(ray_session, tmp_path):
    """SURVEY §4.3: <row> URIs derive from (file, within-file position),
    so a multi-file input produces identical URIs regardless of which
    blocks execute first — equal to the sequential kernel on the same
    rows in file order."""
    import pyarrow as pa

    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.kernel.processor import RowProcessor
    from rdf_mapper_ray.kernel.spec import MapperSpec

    spec = {"globals": {"$datasetID": "t"},
            "namespaces": {"ex": "http://e/"},
            "resources": [{"name": "rec", "properties": {
                "@id": "<row>",
                "<ex:v>": "{v}"}}]}

    d = tmp_path / "in"
    d.mkdir()
    rows_by_file = {}
    for fi in range(3):
        vals = [f"f{fi}-r{ri}" for ri in range(40)]
        pq.write_table(pa.table({"v": vals}), str(d / f"part{fi}.parquet"))
        rows_by_file[f"part{fi}"] = vals

    pipe = KGPipeline(spec, auto_declare=False, canonicalize=False)
    out = pipe.run_files(str(d)).to_pandas()
    got = dict(zip(out.loc[out["predicate"] == "http://e/v", "object_value"],
                   out.loc[out["predicate"] == "http://e/v", "subject"]))

    # sequential kernel, explicit $file/$row per file
    expect = {}
    for fname, vals in rows_by_file.items():
        proc = RowProcessor(MapperSpec(spec, auto_declare=False),
                            filename=fname)
        proc.process_rows([{"v": v} for v in vals])
        for q in proc.quads():
            k = q.key()
            if k[3] == "http://e/v":
                expect[k[5]] = k[1]
    assert got == expect
    # every URI embeds its file name and 1-based position
    assert got["f2-r0"].endswith("/part2-1")
    assert got["f0-r39"].endswith("/part0-40")


def test_cc_min_label_large_random_graph(ray_session):
    """Distributed min-label CC on a non-trivial graph (long chains,
    cliques, random unions) must reproduce union-find exactly — and do it
    through pid-routed shuffles, never a driver-side label dict."""
    import random

    import ray.data
    from rdf_mapper_ray.engine.canonicalize import UnionFind, _cc_min_label

    rng = random.Random(7)
    edges = []
    # 40 chains of length 60 (multi-hop propagation)
    for c in range(40):
        for i in range(60):
            edges.append((f"n{c:03d}_{i:03d}", f"n{c:03d}_{i + 1:03d}"))
    # 20 cliques of 12
    for c in range(20):
        members = [f"k{c:03d}_{i:02d}" for i in range(12)]
        for i in range(len(members)):
            edges.append((members[i], members[(i + 1) % len(members)]))
    # random cross links merging some components
    for _ in range(150):
        a = f"n{rng.randrange(40):03d}_{rng.randrange(61):03d}"
        b = f"k{rng.randrange(20):03d}_{rng.randrange(12):02d}"
        if rng.random() < 0.3:
            edges.append((a, b))
    rng.shuffle(edges)

    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    expected = {n: uf.find(n)
                for n in {x for e in edges for x in e}}

    edge_ds = ray.data.from_items(
        [{"a": a, "b": b} for a, b in edges])
    labels = _cc_min_label(edge_ds, num_partitions=4).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == expected


def test_reconciled_pipeline_via_distributed_cc(ray_session, monkeypatch):
    """The flagship reconcile+canonicalize pipeline must produce
    identical output when the sameAs merge is forced through the
    distributed min-label venue instead of driver union-find."""
    from rdf_mapper_ray.engine import canonicalize as C
    from rdf_mapper_ray.pipelines.sourcecode import reconciled

    a = reconciled(SF).to_pandas()

    orig = C.canonicalize_sameas

    def forced(ds, **kw):
        kw["driver_max_edges"] = 0
        return orig(ds, **kw)

    monkeypatch.setattr(C, "canonicalize_sameas", forced)
    # pipeline.py imported the symbol directly — patch there too
    import rdf_mapper_ray.engine.pipeline as P
    monkeypatch.setattr(P, "canonicalize_sameas", forced)
    b = reconciled(SF).to_pandas()
    ka = sorted(map(tuple, a.values.tolist()))
    kb = sorted(map(tuple, b.values.tolist()))
    assert ka == kb and len(ka) > 0


def test_pointer_dedup_matches_groupby(ray_session):
    """The pointer-shuffle distinct must produce exactly the groupby
    distinct's row set, including injected cross-block duplicates."""
    import ray.data
    from rdf_mapper_ray.engine.dedup import (distinct_triples,
                                             distinct_triples_pointer)
    from rdf_mapper_ray.engine.pipeline import KGPipeline
    spec = {"globals": {"$datasetID": "t"},
            "namespaces": {"ex": "http://e/"},
            "resources": [{"name": "r", "properties": {
                "@id": "<http://e/r/{id}>",
                "<ex:v>": "{v}",
                "<ex:k>": "{k}"}}]}
    rows = [{"id": str(i % 500), "v": f"v{i % 400}", "k": f"k{i % 7}"}
            for i in range(20000)]                 # heavy duplication
    pipe = KGPipeline(spec, auto_declare=False, canonicalize=False)
    ext = pipe.extract(ray.data.from_items(rows).repartition(16))
    a = distinct_triples(ext).to_pandas()
    ext2 = pipe.extract(ray.data.from_items(rows).repartition(16))
    b = distinct_triples_pointer(ext2).to_pandas()
    ka = sorted(map(tuple, a.values.tolist()))
    kb = sorted(map(tuple, b.values.tolist()))
    assert ka == kb and len(ka) > 0


def test_sparql_update_sharded_matches_driver_writer(ray_session, tmp_path):
    """The distributed SPARQL writer (prologue + any-order shards) must
    produce the same final quad store as the driver-side streaming
    writer when applied shard by shard."""
    import io

    import ray.data
    from rdf_mapper_ray.engine.schema import quads_to_table
    from rdf_mapper_ray.engine.sinks import (write_sparql_update,
                                             write_sparql_update_sharded)
    from sparql_applier import apply_update
    from test_conformance import _graphs_processor

    proc = _graphs_processor()
    ds = ray.data.from_arrow(quads_to_table(proc.quads())).repartition(3)
    namespaces = dict(proc.spec.namespaces)
    preserved = set(proc.state.preserved_graphs)

    seeded = {
        ("http://example.com/base", "http://example.com/should_go", "uri",
         "http://example.com/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.com/current", "http://example.com/should_stay",
         "uri", "http://example.com/p", "literal", "foo", None, None),
    }

    for mode in ("update", "delete"):
        ref_io = io.StringIO()
        write_sparql_update(ds, namespaces, preserved, ref_io, mode=mode)
        expected = apply_update(ref_io.getvalue(), set(seeded))

        files = write_sparql_update_sharded(
            ds, namespaces, preserved, str(tmp_path / mode), mode=mode)
        state = set(seeded)
        for f in files:                       # prologue first, shards any order
            state = set(apply_update(open(f, encoding="utf-8").read(),
                                     state))
        assert state == set(expected), mode


def test_kg_incremental_update_equals_full_rebuild(ray_session):
    """Delete-changed-subjects + re-extract + distinct must equal the
    from-scratch flagship graph row-for-row (the incremental
    maintenance contract; content-derived triples live only under
    file subjects by spec construction)."""
    from rdf_mapper_ray.pipelines.sourcecode import (
        flagship, kg_incremental_update_query)
    sf = "/root/testdata/sf0.001"
    cols = ["graph", "subject", "subject_kind", "predicate",
            "object_kind", "object_value", "lang", "datatype"]
    inc = kg_incremental_update_query(sf).to_pandas()[cols] \
        .fillna("").sort_values(cols).reset_index(drop=True)
    full = flagship(sf).to_pandas()[cols] \
        .fillna("").sort_values(cols).reset_index(drop=True)
    assert len(inc) == len(full) > 0
    assert inc.equals(full)


def test_pregel_actor_reuse_is_clean(ray_session):
    """A released actor set must be reused by the next same-size pool
    with NO state or adjacency leaking across uses (the round-5
    cross-query reuse mechanism)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from rdf_mapper_ray.engine import pregel
    from rdf_mapper_ray.engine.pregel import PregelPool, pid_of

    def adj_of(edges):
        df = pd.DataFrame(edges, columns=["node", "other"])
        df["pid"] = pid_of(df["node"].to_numpy(), 3)
        return ray.data.from_pandas(df)

    def send(state, adj):
        f = state.loc[state["changed"] == 1, ["node", "level"]]
        if not len(f):
            return None
        m = adj.merge(f, on="node")
        out = pd.DataFrame({"node": m["other"].to_numpy(),
                            "level": m["level"].to_numpy() + 1})
        return out.groupby("node", as_index=False)["level"].min()

    from rdf_mapper_ray.ops.graphs import _min_reduce
    reduce = _min_reduce("level")

    def bfs(pool, source):
        pool.init_state(pa.Table.from_pydict({
            "node": pa.array([source], pa.int64()),
            "level": pa.array([0], pa.int64()),
            "changed": pa.array([1], pa.int64())}))
        pool.run(16)
        out = pool.collect().to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pool.shutdown()
        return dict(zip(out["node"], out["level"]))

    pregel._RELEASED_ACTORS.pop(3, None)
    p1 = PregelPool(adj_of([(1, 2), (2, 1), (2, 3), (3, 2)]), 3,
                    send, reduce)
    ids1 = [a._actor_id for a in p1._actors]
    got1 = bfs(p1, 1)
    assert got1 == {1: 0, 2: 1, 3: 2}
    assert 3 in pregel._RELEASED_ACTORS          # released, not killed
    # a DIFFERENT graph on a same-size pool must reuse the actors and
    # see none of the first run's adjacency/state
    p2 = PregelPool(adj_of([(7, 8), (8, 7)]), 3, send, reduce)
    ids2 = [a._actor_id for a in p2._actors]
    assert ids1 == ids2                          # same actor set
    got2 = bfs(p2, 7)
    assert got2 == {7: 0, 8: 1}                  # no leakage from p1
