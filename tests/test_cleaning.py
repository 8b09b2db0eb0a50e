"""Cleaning ops: PII redaction, deterministic hash split, benchmark
decontamination — planted-case units plus DuckDB-oracle parity on
random data (the sf fixtures are checked by the driver's correctness
gate; these tests plant adversarial inputs the fixtures don't have)."""

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from rdf_mapper_ray.ops.cleaning import (DECONTAMINATE_ORACLE_SQL,
                                         HASH_SPLIT_ORACLE_SQL, PII_RULES,
                                         decontaminate, hash_split,
                                         pii_redact)


@pytest.fixture()
def con():
    return duckdb.connect()


def _cmp(df, o, key):
    cols = sorted(df.columns)
    assert cols == sorted(o.columns), (cols, sorted(o.columns))
    df = df[cols].sort_values(key).reset_index(drop=True)
    o = o[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(df, o, check_dtype=False)


def test_pii_redact_planted(ray_session):
    import ray.data
    docs = [
        "reach me at alice.smith+work@example.co.uk thanks",
        "server 10.0.255.7 and backup 192.168.1.1 are down",
        "call +44-207-9460000 or mail bob@corp.io from 8.8.8.8",
        "no pii here at all",
        "",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    out = pii_redact(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_emails"].tolist() == [1, 0, 1, 0, 0]
    assert out["n_ips"].tolist() == [0, 2, 1, 0, 0]
    assert out["n_phones"].tolist() == [0, 0, 1, 0, 0]
    assert out["clean_text"][0] == "reach me at [EMAIL] thanks"
    assert out["clean_text"][1] == "server [IP] and backup [IP] are down"
    assert out["clean_text"][2] == "call [PHONE] or mail [EMAIL] from [IP]"
    assert out["clean_text"][3] == "no pii here at all"


def test_pii_redact_random_oracle(ray_session, con):
    """RE2 parity: random docs with planted PII must redact identically
    in pyarrow and DuckDB."""
    import ray.data
    rng = random.Random(42)
    words = ["alpha", "beta", "x", "data", "10.1", "a@b", "+1", "127"]
    docs = []
    for i in range(400):
        parts = rng.choices(words, k=rng.randrange(0, 12))
        if i % 3 == 0:
            parts.append(f"user{i}@test{i % 7}.org")
        if i % 5 == 0:
            parts.append(f"10.{i % 256}.0.{i % 100}")
        if i % 7 == 0:
            parts.append(f"+{1 + i % 90}-555-{1000000 + i}")
        rng.shuffle(parts)
        docs.append(" ".join(parts))
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    con.register("docs", tbl)
    out = pii_redact(ray.data.from_arrow(tbl).repartition(4)).to_pandas()
    sql_redact = "text"
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(f"CAST(len(regexp_extract_all(text, '{pat}')) "
                      f"AS BIGINT) AS n_{name}")
        sql_redact = (f"regexp_replace({sql_redact}, '{pat}', "
                      f"'{repl}', 'g')")
    o = con.execute(f"SELECT doc_id, {', '.join(counts)}, "
                    f"{sql_redact} AS clean_text FROM docs").df()
    _cmp(out, o, ["doc_id"])


def test_hash_split_deterministic_and_weighted(ray_session):
    import ray.data
    tbl = pa.table({"doc_id": pa.array(range(20000), type=pa.int64())})
    a = hash_split(ray.data.from_arrow(tbl).repartition(4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = hash_split(ray.data.from_arrow(tbl).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)           # partition-invariant
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    assert ((a["bucket"] >= 0) & (a["bucket"] < 100)).all()


def test_hash_split_md5_oracle(ray_session, con):
    import ray.data
    tbl = pa.table({"doc_id": pa.array(range(0, 5000, 3), type=pa.int64())})
    con.register("documents", tbl)
    out = hash_split(ray.data.from_arrow(tbl).repartition(4),
                     hash_fn="md5").to_pandas()
    o = con.execute(HASH_SPLIT_ORACLE_SQL).df()
    _cmp(out, o, ["doc_id"])


def test_hash_split_rejects_bad_weights(ray_session):
    import ray.data
    tbl = pa.table({"doc_id": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError):
        hash_split(ray.data.from_arrow(tbl),
                   weights=(("train", 50), ("test", 40)))


def test_decontaminate_planted(ray_session):
    import ray.data
    bench_phrase = "the quick brown fox jumps over"
    docs = [
        f"prefix {bench_phrase} suffix",          # contaminated
        "totally clean document",                  # clean
        bench_phrase,                              # exact match
        "the quick brown fox sleeps",              # partial: clean
        f"{bench_phrase} and {bench_phrase}",      # still one phrase
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    out = decontaminate(ray.data.from_arrow(tbl),
                        [bench_phrase, "unseen phrase zz"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, False, True, False, True]
    assert out["n_phrases_hit"].tolist() == [1, 0, 1, 0, 1]


def test_decontaminate_random_oracle(ray_session, con):
    import ray.data
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = [" ".join(rng.choices(vocab, k=rng.randrange(12, 60)))
            for _ in range(600)]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    con.register("documents", tbl)
    phrases = [t[9:49] for i, t in enumerate(docs)
               if i % 97 == 0 and len(t) >= 49]
    out = decontaminate(ray.data.from_arrow(tbl).repartition(4),
                        phrases).to_pandas()
    o = con.execute(DECONTAMINATE_ORACLE_SQL).df()
    _cmp(out, o, ["doc_id"])


def test_repetition_signals_planted(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.text import repetition_signals
    docs = [
        "a b\na b\nc d",          # 3 lines, 1 dup; bigrams incl "a b"x2
        "x y z",                   # 1 line, bigrams: "x y","y z"
        "",                        # 1 empty line, no bigrams
        "w w w w",                 # "w w" x3 (overlapping)
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    out = repetition_signals(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_lines"].tolist() == [3, 1, 1, 1]
    assert out["n_dup_lines"].tolist() == [1, 0, 0, 0]
    assert out["n_2grams"].tolist() == [5, 2, 0, 3]
    assert out["top_2gram_count"].tolist() == [2, 1, 0, 3]


def test_repetition_signals_random_oracle(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.text import (REPETITION_ORACLE_SQL,
                                         repetition_signals)
    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for _ in range(500):
        lines = [" ".join(rng.choices(vocab, k=rng.randrange(0, 8)))
                 for _ in range(rng.randrange(1, 6))]
        docs.append("\n".join(lines))
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    con.register("documents", tbl)
    out = repetition_signals(ray.data.from_arrow(tbl).repartition(4)) \
        .to_pandas()
    o = con.execute(REPETITION_ORACLE_SQL).df()
    _cmp(out, o, ["doc_id"])


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data
    from rdf_mapper_ray.ops.cleaning import stratified_sample
    tbl = pa.table({
        "doc_id": pa.array(range(40000), type=pa.int64()),
        "lang": pa.array([["en", "de", "es", "zh"][i % 4]
                          for i in range(40000)]),
    })
    rates = {"en": 1.0, "de": 0.5, "es": 0.25, "zh": 0.1}
    a = stratified_sample(ray.data.from_arrow(tbl).repartition(4), rates) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(ray.data.from_arrow(tbl).repartition(9), rates) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)           # partition-invariant
    kept = a["lang"].value_counts()
    assert kept["en"] == 10000                     # rate 1.0 keeps all
    for g, r in [("de", 0.5), ("es", 0.25), ("zh", 0.1)]:
        assert abs(kept.get(g, 0) / 10000 - r) < 0.03


def test_stratified_sample_md5_oracle(ray_session, con):
    import ray.data
    from rdf_mapper_ray.ops.cleaning import (SAMPLE_RATES,
                                             STRATIFIED_SAMPLE_ORACLE_SQL,
                                             stratified_sample)
    tbl = pa.table({
        "doc_id": pa.array(range(3000), type=pa.int64()),
        "lang": pa.array([["en", "de", "es", "zh", "fr"][i % 5]
                          for i in range(3000)]),
    })
    con.register("documents", tbl)
    out = stratified_sample(ray.data.from_arrow(tbl).repartition(4),
                            SAMPLE_RATES, default_rate=0.75,
                            hash_fn="md5").to_pandas()
    o = con.execute(STRATIFIED_SAMPLE_ORACLE_SQL).df()
    assert 0 < len(o) < 3000
    _cmp(out, o, ["doc_id"])


def test_json_field_int_extraction(ray_session):
    import ray.data
    import pyarrow as pa
    from rdf_mapper_ray.ops.cleaning import json_field_int
    ds = ray.data.from_arrow(pa.table({
        "props": pa.array(['{"k": 7}', '{"k": -3, "x": 1}', '{"x": 9}',
                           None, 'not json', '{"k": "str"}']),
    }))
    out = json_field_int(ds, "props", "k").to_pandas()
    got = out["k"].tolist()
    assert got[0] == 7 and got[1] == -3
    assert all(pd.isna(v) for v in got[2:])


def test_decontaminate_ngram_planted_leak(ray_session):
    """A document quoting >= shingle_k consecutive benchmark words is
    flagged; unrelated and sub-threshold docs are not."""
    import ray.data
    from rdf_mapper_ray.ops.cleaning import decontaminate_ngram
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    corpus = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            # quotes 5 consecutive benchmark words -> contaminated
            "intro words then quick brown fox jumps over and more",
            # shares only 3 consecutive words -> no 5-gram match
            "quick brown fox elsewhere entirely different tail words",
            "totally unrelated content about databases and joins",
        ]}))
    bench = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [100], "text": [bench_text]}))
    out = decontaminate_ngram(corpus, bench, shingle_k=5) \
        .to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "contaminated"])
    assert not bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])
    assert int(out.loc[0, "n_matched"]) == 1


def test_dedup_rate_by_group(ray_session):
    import pyarrow as pa
    import ray.data
    from rdf_mapper_ray.ops.dedup import dedup_rate_by_group
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array(["s1"] * 4 + ["s2"] * 2),
        "text": pa.array(["a", "a", "b", "a", "x", "y"])})) \
        .repartition(3)
    out = dedup_rate_by_group(ds, "source", num_partitions=2) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    assert list(out["n_docs"]) == [4, 2]
    assert list(out["n_unique"]) == [2, 2]
    assert list(out["dup_rate_milli"]) == [2 * 1000 // 4, 0]


def test_ngram_novelty_planted(ray_session):
    """doc 1 all-novel; doc 2 copies doc 1 (all seen); doc 3 half
    overlaps; short doc = single whole-text shingle."""
    import ray.data
    from rdf_mapper_ray.ops.text import ngram_novelty
    base = "a b c d e f g h i j"          # 6 distinct 5-gram shingles
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},       # exact copy -> 0 novelty
        {"doc_id": 3, "text": "a b c d e x y z w v"},
        {"doc_id": 4, "text": "tiny"},     # <5 words -> 1 shingle
    ]
    out = ngram_novelty(ray.data.from_items(rows), num_partitions=4) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "n_shingles"] == 6
    assert out.loc[1, "n_seen"] == 0
    assert out.loc[1, "novelty_milli"] == 1000
    assert out.loc[2, "n_seen"] == 6
    assert out.loc[2, "novelty_milli"] == 0
    # doc 3 shares exactly one shingle with doc 1 ("a b c d e")
    assert out.loc[3, "n_shingles"] == 6
    assert out.loc[3, "n_seen"] == 1
    assert out.loc[4, "n_shingles"] == 1
    assert out.loc[4, "n_seen"] == 0
