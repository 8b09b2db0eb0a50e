"""Paragraph-level dedup: planted boilerplate cases, venue
equivalence (broadcast vs co-partition), and DuckDB-oracle parity on
random data. The sf-fixture demo query is checked by the driver's
correctness gate; these tests plant the adversarial shapes the demo
doesn't have (within-doc repeats, all-dropped docs, empty docs)."""

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from rdf_mapper_ray.ops.paragraphs import paragraph_dedup

# generic form of the demo oracle: first occurrence in (doc_id, pos)
# order survives, everything else is dropped
_GENERIC_SQL = """
WITH paras AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos,
         unnest(string_split(text, chr(10))) AS para
  FROM docs
),
ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM paras
)
SELECT doc_id,
       COALESCE(string_agg(para, chr(10) ORDER BY pos)
                  FILTER (WHERE rn = 1), '') AS clean_text,
       CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def _run(docs, venue):
    import ray.data
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs, type=pa.string())})
    out = paragraph_dedup(ray.data.from_arrow(tbl), venue=venue,
                          rows_hint=len(docs)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _oracle(docs):
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    con = duckdb.connect()
    con.register("docs", df)
    return con.execute(_GENERIC_SQL).df()


PLANTED = [
    "HEADER\nunique body zero\nFOOTER",       # first copy of both kept
    "HEADER\nunique body one\nFOOTER",        # boilerplate dropped
    "HEADER\nFOOTER",                          # loses EVERY paragraph
    "repeat me\nrepeat me\nrepeat me",         # within-doc repeats
    "",                                        # empty doc ('' is a para;
    "",                                        # second empty doc drops it)
    "unique body zero",                        # dup of doc 0's body
]


@pytest.mark.parametrize("venue", ["broadcast", "copartition"])
def test_planted_boilerplate(ray_session, venue):
    out = _run(PLANTED, venue)
    assert out["clean_text"].tolist() == [
        "HEADER\nunique body zero\nFOOTER",
        "unique body one",
        "",
        "repeat me",
        "",
        "",
        "",
    ]
    assert out["n_kept"].tolist() == [3, 1, 0, 1, 1, 0, 0]
    assert out["n_dropped"].tolist() == [0, 2, 2, 2, 0, 1, 1]


def _random_docs(n_docs=120, seed=7):
    rng = random.Random(seed)
    pool = [f"para {i} " + "x" * rng.randint(0, 5) for i in range(40)]
    docs = []
    for d in range(n_docs):
        k = rng.randint(0, 6)
        paras = [rng.choice(pool) if rng.random() < 0.7
                 else f"unique {d}-{j}" for j in range(k)]
        docs.append("\n".join(paras))
    return docs


@pytest.mark.parametrize("venue", ["broadcast", "copartition"])
def test_oracle_parity_random(ray_session, venue):
    docs = _random_docs()
    out = _run(docs, venue)
    o = _oracle(docs)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], o[sorted(o.columns)], check_dtype=False)


def test_venues_agree_and_auto_dispatch(ray_session):
    docs = _random_docs(n_docs=80, seed=13)
    a = _run(docs, "broadcast")
    b = _run(docs, "copartition")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    auto = _run(docs, None)
    pd.testing.assert_frame_equal(a, auto, check_dtype=False)
