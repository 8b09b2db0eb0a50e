"""Round-4 session-9 ops: RDFS domain/range inference and friends."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_domain_range_planted(ray_session):
    """rdfs2/rdfs3 on a tiny graph: domain types subjects, range types
    objects, distinct entities counted once per class."""
    import ray.data
    from rdf_mapper_ray.ops.ontology import domain_range_infer

    rows = [
        {"subject": "s1", "predicate": "knows", "object_value": "s2"},
        {"subject": "s1", "predicate": "knows", "object_value": "s3"},
        {"subject": "s2", "predicate": "knows", "object_value": "s3"},
        {"subject": "s1", "predicate": "owns", "object_value": "car1"},
        {"subject": "s9", "predicate": "ignored", "object_value": "x"},
    ]
    out = domain_range_infer(
        ray.data.from_items(rows),
        {"knows": ("Person", "Person"), "owns": ("Person", None)},
    ).to_pandas()
    got = dict(zip(out["class"], out["n_entities"]))
    # Person: s1, s2 (subjects) ∪ s2, s3 (objects) = {s1,s2,s3}
    assert got == {"Person": 3}
    assert out["n_entities"].dtype == np.int64


def test_domain_range_range_only_class(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import domain_range_infer

    rows = [
        {"subject": "a", "predicate": "p", "object_value": "v1"},
        {"subject": "b", "predicate": "p", "object_value": "v1"},
        {"subject": "a", "predicate": "q", "object_value": "v2"},
    ]
    out = domain_range_infer(
        ray.data.from_items(rows),
        {"p": ("S", "V"), "q": (None, "V")},
    ).to_pandas()
    got = dict(zip(out["class"], out["n_entities"]))
    assert got == {"S": 2, "V": 2}
    assert list(out["class"]) == sorted(out["class"])


def test_max_drawdown_planted(ray_session):
    """values 10, -4, -3, +20, -6, -5: cum = 10,6,3,23,17,12 — peak 23,
    deepest dip after it 11; the earlier 10->3 dip is 7."""
    import datetime
    import ray.data
    from rdf_mapper_ray.ops.timeseries import max_drawdown

    t0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, -4.0, -3.0, 20.0, -6.0, -5.0]
    rows = [{"event_id": i, "user_id": 7,
             "ts": t0 + datetime.timedelta(minutes=i), "value": v}
            for i, v in enumerate(vals)]
    rows.append({"event_id": 99, "user_id": 8, "ts": t0, "value": 5.0})
    out = max_drawdown(ray.data.from_items(rows)).to_pandas() \
        .set_index("user_id")
    assert out.loc[7, "max_drawdown"] == 1100  # cents
    assert out.loc[7, "n_events"] == 6
    assert out.loc[8, "max_drawdown"] == 0  # single rising point


def test_set_op_all_multiplicities(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.setops import set_op_all

    l = ray.data.from_items([{"k": v} for v in [1, 1, 1, 2, 3]])
    r = ray.data.from_items([{"k": v} for v in [1, 2, 2, 4]])
    inter = sorted(set_op_all(l, r, "k", "intersect_all")
                   .to_pandas()["k"])
    exc = sorted(set_op_all(l, r, "k", "except_all").to_pandas()["k"])
    assert inter == [1, 2]          # min(3,1)=1, min(1,2)=1, 3/4 absent
    assert exc == [1, 1, 3]         # 3-1 copies of 1, 1-2<0, 3 unmatched


def test_pca_power_matches_numpy_eigvec(ray_session):
    """On a strongly anisotropic cloud the integer power iteration
    must align with numpy's top eigenvector of the same quantized
    Gram (cosine > 0.999)."""
    import ray.data
    from rdf_mapper_ray.ops.vectors import pca_power

    rng = np.random.RandomState(0)
    base = rng.randn(200, 1) @ np.array([[3.0, 1.0, 0.2, -0.5]])
    noise = 0.05 * rng.randn(200, 4)
    m = base + noise
    ds = ray.data.from_items(
        [{"embedding": row.astype(np.float32).tolist()} for row in m])
    out = pca_power(ds, iters=12).to_pandas().sort_values("dim")
    v = out["component"].to_numpy(np.float64)
    q = np.floor(m.astype(np.float64) * 1e6 + 0.5)
    g = q.T @ q
    w, vecs = np.linalg.eigh(g)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    assert np.abs(v).max() == 1_000_000


def test_embedding_decontaminate_planted(ray_session):
    """A train vector identical to an eval vector must be flagged with
    the right match count; orthogonal ones must not appear."""
    import ray.data
    from rdf_mapper_ray.ops.cleaning import embedding_decontaminate

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    ev = ray.data.from_items([
        {"vec_id": 100, "embedding": e1},
        {"vec_id": 101, "embedding": e2},
    ])
    train = ray.data.from_items([
        {"vec_id": 1, "embedding": e1},                  # = eval 100
        {"vec_id": 2, "embedding": [0.9, 0.9, 0.0, 0.0]},  # hits both
        {"vec_id": 3, "embedding": [0.0, 0.0, 1.0, 0.0]},  # clean
    ])
    out = embedding_decontaminate(train, ev, threshold=0.7) \
        .to_pandas().set_index("vec_id")
    assert out.loc[1, "n_matches"] == 1
    assert out.loc[2, "n_matches"] == 2
    assert 3 not in out.index


def test_t_closeness_extremes(ray_session):
    """A class matching the global distribution has TVD 0; a class
    concentrated on one value of a 50/50 global has TVD = 1/2
    (wait: global includes the class itself — verified by hand)."""
    import ray.data
    from rdf_mapper_ray.ops.cleaning import t_closeness

    # group A: 2x s=0, 2x s=1; group B: 4x s=0
    rows = ([{"q": "A", "s": 0}] * 2 + [{"q": "A", "s": 1}] * 2
            + [{"q": "B", "s": 0}] * 4)
    out = t_closeness(ray.data.from_items(rows), ["q"], "s",
                      t_milli=200).to_pandas().set_index("q")
    # global: s=0 6/8, s=1 2/8. A: 2/4,2/4 -> TVD = |.5-.75|/1... =
    # (|2*8-6*4| + |2*8-2*4|)/(2*4*8) = (8+8)/64 = 0.25
    assert out.loc["A", "milli_tvd"] == 250
    # B: (|4*8-6*4| + |0-2*4|)/(2*4*8) = (8+8)/64 = 0.25
    assert out.loc["B", "milli_tvd"] == 250
    assert bool(out.loc["A", "is_violating"]) is True

    # a uniform table: every class distribution equals global, TVD 0
    rows2 = [{"q": q, "s": s} for q in ("X", "Y") for s in (0, 1)]
    out2 = t_closeness(ray.data.from_items(rows2), ["q"], "s") \
        .to_pandas()
    assert (out2["milli_tvd"] == 0).all()


def test_functional_violations_planted(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import functional_violations

    rows = [
        {"subject": "o1", "predicate": "f", "object_value": "a"},
        {"subject": "o1", "predicate": "f", "object_value": "a"},  # dup ok
        {"subject": "o2", "predicate": "f", "object_value": "a"},
        {"subject": "o2", "predicate": "f", "object_value": "b"},  # viol
        {"subject": "o1", "predicate": "g", "object_value": "x"},
        {"subject": "o1", "predicate": "other", "object_value": "y"},
    ]
    out = functional_violations(
        ray.data.from_items(rows), ["f", "g"]).to_pandas() \
        .set_index("predicate")
    assert out.loc["f", "n_subjects"] == 2
    assert out.loc["f", "n_violating"] == 1
    assert out.loc["g", "n_subjects"] == 1
    assert out.loc["g", "n_violating"] == 0
    assert "other" not in out.index


def test_cross_corr_shifted_series(ray_session):
    """y is x shifted by exactly 2 hours: the lag-2 cross product must
    dominate and equal the lag-0 autovariance of the pattern."""
    import datetime
    import ray.data
    from rdf_mapper_ray.ops.timeseries import cross_corr

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    pattern = [3, 0, 1, 0, 5, 0, 0, 2]
    for h, cnt in enumerate(pattern):
        for _ in range(cnt):
            rows.append({"ts": t0 + datetime.timedelta(hours=h),
                         "event_type": "click"})
        for _ in range(cnt):  # same pattern, 2 hours later
            rows.append({"ts": t0 + datetime.timedelta(hours=h + 2),
                         "event_type": "purchase"})
    out = cross_corr(ray.data.from_items(rows), "click", "purchase",
                     max_lag=3).to_pandas().set_index("lag")
    x = np.array(pattern + [0, 0])
    y = np.array([0, 0] + pattern)
    for k in range(4):
        xs, ys = x[: len(x) - k], y[k:]
        assert out.loc[k, "sum_xy"] == xs @ ys
        assert out.loc[k, "n"] == len(xs)
    assert out.loc[2, "sum_xy"] == (np.array(pattern) ** 2).sum()


def test_assoc_rules_planted(ray_session):
    """4 baskets: {1,2} x3, {1} x1 -> rule 2->1 conf=1000, 1->2
    conf=750; lift = 1000*3*4/(4*3) = 1000 both ways."""
    import ray.data
    from rdf_mapper_ray.ops.baskets import assoc_rules

    rows = []
    for b, items in enumerate([[1, 2], [1, 2], [1, 2], [1]]):
        rows += [{"b": b, "i": i} for i in items]
    out = assoc_rules(ray.data.from_items(rows), "b", "i",
                      min_support=2).to_pandas() \
        .set_index(["antecedent", "consequent"])
    assert out.loc[(2, 1), "conf_milli"] == 1000
    assert out.loc[(1, 2), "conf_milli"] == 750
    assert out.loc[(1, 2), "support"] == 3
    assert out.loc[(1, 2), "lift_milli"] == 1000
    assert out.loc[(2, 1), "lift_milli"] == 1000


def test_neighbor_agg_path_graph(ray_session):
    """Path 1-2-3 with x = (10, 20, 30): A·x = (20, 40, 20);
    A²·x = (40, 40, 40) (backtracking included)."""
    import ray.data
    from rdf_mapper_ray.ops.graphs import neighbor_agg

    edges = ray.data.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3}])
    feats = ray.data.from_items([
        {"node": 1, "val": 10}, {"node": 2, "val": 20},
        {"node": 3, "val": 30}])
    out = neighbor_agg(edges, feats, hops=2).to_pandas() \
        .set_index("node")
    assert out.loc[1, "sum_1hop"] == 20 and out.loc[1, "sum_2hop"] == 40
    assert out.loc[2, "sum_1hop"] == 40 and out.loc[2, "sum_2hop"] == 40
    assert out.loc[3, "sum_1hop"] == 20 and out.loc[3, "sum_2hop"] == 40
    assert out.loc[2, "degree"] == 2


def test_blocking_audit_dense_region(ray_session):
    """5 records all within eps of each other, window 3: truth C(5,2)
    = 10, SNM candidates = 4+3 = 7 (rank distance <= 2), so
    completeness = 700 milli."""
    import ray.data
    from rdf_mapper_ray.ops.editdist import blocking_audit

    rows = [{"id": i, "v": 100 + i} for i in range(5)]
    out = blocking_audit(ray.data.from_items(rows), id_col="id",
                         key_col="v", window=3, eps=10).to_pandas()
    r = out.iloc[0]
    assert r["n_true"] == 10
    assert r["n_candidates"] == 7
    assert r["n_matched"] == 7
    assert r["completeness_milli"] == 700
    assert r["reduction_milli"] == 1000 - (1000 * 7) // 10


def test_luby_coloring_proper(ray_session):
    """K4 plus a pendant: coloring must be proper (no edge shares a
    color) and K4 needs all 4 colors."""
    import ray.data
    from rdf_mapper_ray.ops.graphs import luby_coloring

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    out = luby_coloring(ds, max_colors=4).to_pandas() \
        .set_index("node")["color"]
    for a, b in edges:
        assert out[a] != out[b] or (out[a] == -1 and out[b] == -1)
    assert set(out[[1, 2, 3, 4]]) == {0, 1, 2, 3}
    assert out[5] >= 0 and out[5] != out[4]


def test_markov_entropy_deterministic_vs_uniform(ray_session):
    """A deterministic chain (a->b always) has H=0; a 50/50 split has
    the quantized two-way entropy."""
    import datetime
    import ray.data
    from rdf_mapper_ray.ops.sessions import markov_entropy

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: a b a b a b  -> from a always b (x3? a->b 3, b->a 2)
    seq1 = ["a", "b", "a", "b", "a", "b"]
    for i, et in enumerate(seq1):
        rows.append({"user_id": 1, "event_id": i,
                     "ts": t0 + datetime.timedelta(minutes=i),
                     "event_type": et})
    # user 2: c d c e  -> from c: d once, e once (50/50)
    for i, et in enumerate(["c", "d", "c", "e"]):
        rows.append({"user_id": 2, "event_id": 100 + i,
                     "ts": t0 + datetime.timedelta(minutes=i),
                     "event_type": et})
    out = markov_entropy(ray.data.from_items(rows), "user_id", "ts",
                         "event_id", "event_type").to_pandas() \
        .set_index("from_type")
    # deterministic: h_milli = n * qln(n) -> H = ln(n) - qln(n)/1000 ≈ 0
    assert out.loc["a", "n"] == 3
    assert out.loc["a", "h_milli"] == 3 * round(np.log(3) * 1000)
    # 50/50: both counts 1, qln(1)=0 -> h_milli 0 -> H = ln(2)
    assert out.loc["c", "n"] == 2 and out.loc["c", "h_milli"] == 0


def test_coverage_select_greedy(ray_session):
    """doc1 covers 4 bigrams, doc2 covers 3 new, doc3 fully covered by
    doc1 -> greedy picks 1 then 2, stops (3 has zero gain)."""
    import ray.data
    from rdf_mapper_ray.ops.coverage import coverage_select

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "a b c d e"},          # ab bc cd de
        {"doc_id": 2, "text": "x y z w"},            # xy yz zw
        {"doc_id": 3, "text": "a b c"},              # ab bc (covered)
    ])
    out = coverage_select(ds, k=5).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out["gain"].tolist() == [4, 3]
    assert out["rank"].tolist() == [0, 1]


def test_pq_codes_reconstruction_beats_random(ray_session):
    """PQ codes must assign each subvector to its nearest codebook
    entry — verified directly against numpy per subspace."""
    import ray.data
    from rdf_mapper_ray.ops.kmeans import pq_codes

    rng = np.random.RandomState(1)
    vecs = rng.randn(60, 8).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v.tolist()}
         for i, v in enumerate(vecs)])
    out = pq_codes(ds, m=2, k=4).to_pandas().sort_values("vec_id")
    cent = vecs[:4].astype(np.float64)  # 4 lowest-id seeds
    v64 = vecs.astype(np.float64)
    for j, col in enumerate(["code_0", "code_1"]):
        lo, hi = j * 4, (j + 1) * 4
        d2 = ((v64[:, None, lo:hi] - cent[None, :, lo:hi]) ** 2) \
            .sum(axis=2)
        assert (out[col].to_numpy() == d2.argmin(axis=1)).all()


def test_knn_pq_recall_vs_bruteforce(ray_session):
    """ADC over the real embeddings: recall@10 against exact kNN must
    be well above chance (clustered latents quantize cleanly)."""
    import pyarrow.parquet as pq
    import ray.data
    from rdf_mapper_ray.ops.kmeans import knn_pq
    from rdf_mapper_ray.ops.similarity import knn_bruteforce

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    qids, qvecs = ids[:5], vecs[:5]
    ds = ray.data.from_arrow(tbl)
    exact = knn_bruteforce(ds, qids, qvecs, k=10).to_pandas()
    approx = knn_pq(ds, qids, qvecs, m=4, kcode=8, k=10).to_pandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    # exact knn ranks by cosine, ADC by L2 with one-round 8-entry
    # codebooks: 0.2 is 10x chance (10/500)
    assert len(a & e) / len(e) > 0.2


def test_hll_union_equals_direct_sketch(ray_session):
    """The per-type max-merged registers must equal the direct
    whole-stream sketch (HLL merge theorem)."""
    from rdf_mapper_ray.ops.distinct import (hll_registers,
                                             hll_union_query)
    from rdf_mapper_ray.ops.readers import read_table

    sf = "/root/testdata/sf0.001"
    union = hll_union_query(sf).to_pandas().set_index("bucket")["r"]
    direct = hll_registers(
        read_table(sf, "events", columns=["user_id"]),
        "user_id", p=6).to_pandas().set_index("bucket")["r"]
    for b in range(64):
        assert union.get(b, 0) == direct.get(b, 0)


def test_merkle_buckets_localize_diff(ray_session):
    """Two replicas differing in ONE row must differ in exactly the
    buckets holding that row's old/new hashes; equal replicas match
    everywhere. Bucket sums must also fold to the table fingerprint's
    totals."""
    import ray.data
    from rdf_mapper_ray.ops.diff import merkle_buckets, table_fingerprint

    rows = [{"doc_id": i, "text": f"t{i}"} for i in range(50)]
    a = merkle_buckets(ray.data.from_items(rows),
                       ["doc_id", "text"], 16).to_pandas()
    rows2 = [dict(r) for r in rows]
    rows2[7]["text"] = "CHANGED"
    b = merkle_buckets(ray.data.from_items(rows2),
                       ["doc_id", "text"], 16).to_pandas()
    diff = (a[["fp_lo", "fp_hi"]] != b[["fp_lo", "fp_hi"]]).any(axis=1)
    assert 1 <= diff.sum() <= 2  # old + new hash buckets
    fp = table_fingerprint(ray.data.from_items(rows),
                           ["doc_id", "text"]).to_pandas().iloc[0]
    assert a["n_rows"].sum() == fp["n_rows"]
    assert a["fp_lo"].sum() % (1 << 32) == fp["fp_lo"]
    assert a["fp_hi"].sum() % (1 << 32) == fp["fp_hi"]


def test_densest_subgraph_finds_clique(ray_session):
    """A K6 attached to a long path: the densest prefix is the clique
    (density 15/6 = 2.5 vs the whole graph's lower ratio)."""
    import ray.data
    from rdf_mapper_ray.ops.graphs import densest_subgraph

    k6 = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    path = [(100 + i, 101 + i) for i in range(20)] + [(6, 100)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in k6 + path])
    out = densest_subgraph(ds, max_rounds=12).to_pandas()
    best = out[out["is_best"]].iloc[0]
    # the best surviving round must be exactly the K6 core
    assert best["n_nodes"] == 6 and best["n_edges"] == 15
    assert best["density_micro"] == (10**6 * 15) // 6


def test_quantile_map_matches_numpy(ray_session):
    """Mapping src distribution onto ref: each src value lands on the
    ref order statistic at its own quantile."""
    import ray.data
    from rdf_mapper_ray.ops.normalize import quantile_map

    src_vals = [5, 1, 9, 3, 7]          # ranks 3,1,5,2,4
    ref_vals = [100, 200, 300, 400, 500, 600, 700, 800, 900, 1000]
    src = ray.data.from_items(
        [{"id": i, "v": v} for i, v in enumerate(src_vals)])
    ref = ray.data.from_items(
        [{"id": 100 + i, "v": v} for i, v in enumerate(ref_vals)])
    out = quantile_map(src, ref, "id", "v").to_pandas() \
        .set_index("id").sort_index()
    ref_sorted = sorted(ref_vals)
    ranks = {0: 3, 1: 1, 2: 5, 3: 2, 4: 4}
    for i, r in ranks.items():
        expect = ref_sorted[((r - 1) * 10) // 5]  # 1-based -> 0-based
        assert out.loc[i, "mapped"] == expect


def test_cdc_chunks_shift_stability(ray_session):
    """The CDC property: prepending words to a doc changes early
    chunks, but chunk lengths after the first boundary past the edit
    are IDENTICAL — fixed-window chunking would shift everything."""
    import ray.data
    from rdf_mapper_ray.ops.packing import cdc_chunks

    base = " ".join(f"w{i}" for i in range(200))
    edited = "zz yy " + base
    ds = ray.data.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": edited},
    ])
    out = cdc_chunks(ds, mask=7).to_pandas()
    c1 = out[out["doc_id"] == 1].sort_values("chunk_no")
    c2 = out[out["doc_id"] == 2].sort_values("chunk_no")
    # all chunks except each doc's first must agree pairwise
    t1 = c1["n_words"].tolist()[1:]
    t2 = c2["n_words"].tolist()[1:]
    assert t1 == t2 and len(t1) >= 3
    # and the word positions differ by exactly the 2 inserted words
    f1 = c1["first_pos"].tolist()[1:]
    f2 = c2["first_pos"].tolist()[1:]
    assert [p + 2 for p in f1] == f2


def test_void_stats_planted(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.ontology import void_stats

    rows = [
        {"subject": "s1", "predicate": "p", "object_value": "a"},
        {"subject": "s1", "predicate": "p", "object_value": "b"},
        {"subject": "s2", "predicate": "p", "object_value": "a"},
        {"subject": "s1", "predicate": "q", "object_value": "a"},
    ]
    out = void_stats(ray.data.from_items(rows)).to_pandas() \
        .set_index("predicate")
    assert out.loc["p", "n_triples"] == 3
    assert out.loc["p", "n_subjects"] == 2
    assert out.loc["p", "n_objects"] == 2
    assert out.loc["q", "n_triples"] == 1


def test_kg_diff_planted(ray_session):
    """Triple-set CDC: one removed, one added, shared ones silent."""
    import ray.data
    from rdf_mapper_ray.pipelines.sourcecode import kg_diff

    def t(s, p, o):
        return {"graph": "g", "subject": s, "subject_kind": "uri",
                "predicate": p, "object_kind": "literal",
                "object_value": o, "lang": None, "datatype": None}

    old = ray.data.from_items([t("a", "p", "1"), t("b", "q", "2")])
    new = ray.data.from_items([t("a", "p", "1"), t("c", "q", "3"),
                               t("d", "r", "4")])
    out = kg_diff(old, new).to_pandas().set_index("predicate")
    assert out.loc["q", "n_removed"] == 1
    assert out.loc["q", "n_added"] == 1
    assert out.loc["r", "n_added"] == 1 and out.loc["r", "n_removed"] == 0
    assert "p" not in out.index


def test_partition_plan_interleaves_heavy_keys(ray_session):
    """The P heaviest keys must land on P distinct partitions."""
    import ray.data
    from rdf_mapper_ray.engine.partitioning import partition_plan

    rows = []
    sizes = {f"k{i}": (10 - i) * 1000 for i in range(10)}
    for k, b in sizes.items():
        rows.append({"key": k, "nbytes": b})
    out = partition_plan(ray.data.from_items(rows), "key", "nbytes",
                         num_partitions=4).to_pandas()
    # ranks 1..4 (k0..k3) on distinct partitions; 10 keys over 4
    # partitions -> loads interleave: p0 {k0,k4,k8} etc.
    assert out["n_keys"].tolist() == [3, 3, 2, 2]
    assert out.loc[0, "total_bytes"] == 10000 + 6000 + 2000
    assert out.loc[0, "max_key_bytes"] == 10000
