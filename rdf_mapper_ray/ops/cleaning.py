"""Training-data cleaning ops: PII redaction, deterministic splits,
benchmark decontamination.

These are LLM-pipeline operators with no reference counterpart
(the reference stops at KG extraction); they follow the same engine
rules as the rest of ``ops/``: vectorized Arrow kernels per batch,
broadcast small sides, no driver funnels, and a bit-exact DuckDB
oracle wherever the semantics are relational.

Regex parity note: both pyarrow.compute and DuckDB compile patterns
with RE2, so one pattern string behaves identically in both engines —
that is what makes the redaction oracle bit-exact rather than
approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL, hash64

from rdf_mapper_ray.ops.readers import read_table

# RE2 patterns (identical semantics in pyarrow and DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3,10}"

# (name, pattern, replacement) — applied IN ORDER; email first so the
# address's host part is gone before the IP pass, phone last
PII_RULES = (
    ("emails", EMAIL_RE, "[EMAIL]"),
    ("ips", IP_RE, "[IP]"),
    ("phones", PHONE_RE, "[PHONE]"),
)


class PIIRedact:
    """Actor-pool batch stage: count then strip PII spans.

    Counts are taken against the ORIGINAL text (so overlapping rules
    don't hide each other), redaction is sequential in PII_RULES order.
    Pure pyarrow.compute regex kernels — no Python per row.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(self.text_col), pa.string())
        cols = {self.id_col: batch.column(self.id_col)}
        clean = text
        for name, pat, repl in PII_RULES:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pat), pa.int64())
            clean = pc.replace_substring_regex(clean, pat, repl)
        cols["clean_text"] = clean
        return pa.table(cols)


def pii_redact(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(PIIRedact(text_col, id_col),
                          batch_format="pyarrow")


def pii_redact_query(sf_dir: str):
    """Oracle-checkable demo: the test documents carry no natural PII,
    so inject a deterministic doc_id-derived contact line on BOTH the
    Ray and SQL sides, then redact — a probative end-to-end check of
    the actual regexes, not a no-op hash match."""
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.string())
        suffix = pc.binary_join_element_wise(
            " contact user", ids, "@example.com or +1-555-000", ids,
            " at 192.168.", ids, ".1", "")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join_element_wise(
                batch.column("text").cast(pa.string()), suffix, ""),
        })

    return pii_redact(ds.map_batches(inject, batch_format="pyarrow"))


PII_REDACT_ORACLE_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or +1-555-000'
              || doc_id || ' at 192.168.' || doc_id || '.1' AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
         AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{IP_RE}', '[IP]', 'g'),
         '{PHONE_RE}', '[PHONE]', 'g') AS clean_text
FROM injected
ORDER BY doc_id
"""


def hash_split(ds: "ray.data.Dataset", id_col: str = "doc_id",
               weights: tuple = (("train", 80), ("val", 10), ("test", 10)),
               hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: bucket =
    hash64(str(id)) % 100, split by cumulative weights. Stable across
    runs, resumable, and embarrassingly parallel (no shuffle at all —
    the label is a pure function of the id). ``hash_fn="md5"`` is the
    portable venue the SQL oracle checks bit-exactly (see
    ops/hashing.py)."""
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError("split weights must sum to 100")
    bounds = []
    acc = 0
    for name, w in weights:
        acc += w
        bounds.append((acc, name))
    labels = [name for _, name in bounds]

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        bucket = (hash64(ids, hash_fn) % np.uint64(100)).astype("int64")
        idx = np.searchsorted([b for b, _ in bounds], bucket, side="right")
        split = pd.Categorical.from_codes(idx, categories=labels) \
            .astype(str)
        return pa.table({
            id_col: batch.column(id_col),
            "bucket": pa.array(bucket, type=pa.int64()),
            "split": pa.array(split, type=pa.string()),
        })

    return ds.map_batches(part, batch_format="pyarrow")


def hash_split_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id"])
    return hash_split(ds, hash_fn="md5")


_BUCKET = MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)") + " % 100"
HASH_SPLIT_ORACLE_SQL = f"""
SELECT doc_id,
       CAST({_BUCKET} AS BIGINT) AS bucket,
       CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


def stratified_sample(ds: "ray.data.Dataset", rates: dict,
                      group_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 1.0,
                      hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Deterministic per-group downsampling (e.g. rebalance languages):
    keep a row iff hash64(str(id)) % 10000 < rate[group]*10000. Like
    hash_split this is a pure function of the id — zero shuffle,
    partition-invariant, resumable, and the same row set survives
    re-runs (unlike ``ds.random_sample``). Rates quantize to 1/10000
    so the md5 venue has an integer-exact SQL oracle."""
    cuts = {g: int(round(r * 10000)) for g, r in rates.items()}
    default_cut = int(round(default_rate * 10000))

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        bucket = (hash64(ids, hash_fn) % np.uint64(10000)).astype("int64")
        groups = batch.column(group_col).to_pylist()
        cut = np.fromiter((cuts.get(g, default_cut) for g in groups),
                          dtype=np.int64, count=len(groups))
        return batch.filter(pa.array(bucket < cut))

    return ds.map_batches(part, batch_format="pyarrow")


# demo rates for the documents table (deterministic, oracle-mirrored)
SAMPLE_RATES = {"en": 1.0, "de": 0.5, "es": 0.25, "zh": 0.1}


def stratified_sample_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "lang"])
    return stratified_sample(ds, SAMPLE_RATES, default_rate=0.75,
                             hash_fn="md5")


_SBUCKET = MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)") + " % 10000"
STRATIFIED_SAMPLE_ORACLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_SBUCKET} < CASE lang
  WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
  WHEN 'es' THEN 2500 WHEN 'zh' THEN 1000 ELSE 7500 END
ORDER BY doc_id
"""


class _ContaminationCheck:
    """Actor-pool stage holding the broadcast benchmark-phrase list.

    Each phrase scan is one vectorized ``match_substring`` kernel over
    the whole batch; work is O(phrases × batch chars) with no Python
    per row. For phrase sets beyond ~10k, route through the n-gram
    inverted-index machinery in ops/dedup.py instead (hash-shingle
    join) — this venue is the broadcast small-side one.
    """

    def __init__(self, phrases_ref, text_col: str, id_col: str,
                 keep_text: bool = False):
        self.phrases = ray.get(phrases_ref) \
            if not isinstance(phrases_ref, list) else phrases_ref
        self.text_col, self.id_col = text_col, id_col
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(self.text_col), pa.string())
        n_hit = np.zeros(batch.num_rows, dtype=np.int64)
        for p in self.phrases:
            n_hit += pc.match_substring(text, p).to_numpy(
                zero_copy_only=False).astype(np.int64)
        cols = {
            self.id_col: batch.column(self.id_col),
            "n_phrases_hit": pa.array(n_hit, type=pa.int64()),
            "contaminated": pa.array(n_hit > 0, type=pa.bool_()),
        }
        if self.keep_text:
            # pipeline composers keep the document in-band so the
            # downstream filter stays ONE linear stream (no rejoin)
            cols[self.text_col] = batch.column(self.text_col)
        return pa.table(cols)


def decontaminate(ds: "ray.data.Dataset", phrases: list,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_text: bool = False) -> "ray.data.Dataset":
    """Benchmark decontamination: flag documents containing any of the
    (deduplicated) benchmark phrases as an exact substring. The phrase
    list is broadcast once via ``ray.put`` and read per actor, never
    re-shipped per batch."""
    phrases = sorted(set(p for p in phrases if p))
    # small sets ride the actor-creation spec directly (restart-safe);
    # big ones go through the object store once (ray.put) rather than
    # bloating every task spec
    payload = phrases if len(phrases) < 10_000 else ray.put(phrases)
    return ds.map_batches(
        _ContaminationCheck,
        fn_constructor_args=(payload, text_col, id_col, keep_text),
        batch_format="pyarrow", concurrency=(1, 8))


_PHRASE_FILTER = "doc_id % 97 = 0 AND length(text) >= 49"


def benchmark_phrases(sf_dir: str) -> list:
    """The demo benchmark set: a 40-char slice of every 97th document,
    derived deterministically so SQL oracles can rebuild it. The
    extraction streams; only the phrase rows (1/97th of doc count)
    reach the driver — the benchmark side of decontamination is small
    by definition."""
    def mk_phrases(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((ids % 97) == 0))
        ph = [x[9:49] for x in t.column("text").to_pylist()
              if x is not None and len(x) >= 49]
        return pa.table({"phrase": pa.array(ph, type=pa.string())})

    phrase_rows = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(mk_phrases, batch_format="pyarrow").take_all()
    return [r["phrase"] for r in phrase_rows]


def decontaminate_query(sf_dir: str):
    """Phrases derive deterministically from the corpus itself (see
    :func:`benchmark_phrases`) so the oracle can rebuild the identical
    benchmark set in SQL. In production the phrases come from a small
    benchmark file instead."""
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return decontaminate(ds, benchmark_phrases(sf_dir))


DECONTAMINATE_ORACLE_SQL = f"""
WITH bench AS (
  SELECT DISTINCT substr(text, 10, 40) AS phrase FROM documents
  WHERE {_PHRASE_FILTER}
),
hits AS (
  SELECT d.doc_id, COUNT(*) AS n_phrases_hit
  FROM documents d JOIN bench b ON contains(d.text, b.phrase)
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_phrases_hit, 0) AS BIGINT) AS n_phrases_hit,
       (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


# --- semi-structured (JSON) column extraction ----------------------------------

def json_field_int(ds: "ray.data.Dataset", json_col: str, field: str,
                   out_col: str | None = None) -> "ray.data.Dataset":
    """Extract an integer field from a JSON-string column, vectorized —
    the metadata-sidecar pattern (training corpora carry per-record
    JSON attributes that pipelines must project without a Python
    json.loads per row). One RE2 ``extract_regex`` kernel per batch
    pulls scalar integer fields (incl. negatives); absent/null/non-int
    fields yield null. A full JSON-path engine would swap in a
    JSON-capable kernel here; the op contract (typed column out,
    null on absence) stays the same."""
    import re as _re

    out_col = out_col or field
    pat = '"' + _re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)'

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(json_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(pc.fill_null(col, ""), pat)
        vals = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return batch.append_column(out_col, vals)

    return ds.map_batches(fn, batch_format="pyarrow")


def json_field_stats_query(sf_dir: str):
    """Per event type: count, non-null count and sum of the JSON
    metadata field ``k`` in events.props."""
    import ray.data as rd
    ds = read_table(sf_dir, "events",
                         columns=["event_type", "props"])
    ex = json_field_int(ds, "props", "k")

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column("k")
        t = pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_k": pc.cast(pc.is_valid(k), pa.int64()),
            "sum_k": pc.fill_null(pc.cast(k, pa.int64()), 0),
        })
        agg = t.group_by("event_type", use_threads=False).aggregate(
            [("n", "sum"), ("n_k", "sum"), ("sum_k", "sum")])
        return agg.rename_columns(["event_type", "n", "n_k", "sum_k"])

    merged = ex.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").sum(["n", "n_k", "sum_k"])
    return merged.map_batches(
        lambda t: t.rename_columns(["event_type", "n", "n_k", "sum_k"]),
        batch_format="pyarrow")


JSON_FIELD_STATS_ORACLE_SQL = """
SELECT event_type,
       count(*)::BIGINT AS n,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
         AS n_k,
       COALESCE(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                0)::BIGINT AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- fuzzy (n-gram overlap) decontamination -------------------------------------

def decontaminate_ngram(ds: "ray.data.Dataset",
                        bench: "ray.data.Dataset",
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 5, threshold: int = 1,
                        hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Fuzzy benchmark decontamination: flag every document sharing at
    least ``threshold`` DISTINCT word ``shingle_k``-grams with the
    benchmark corpus — the GPT-3-style 13-gram overlap filter
    (exact-substring filtering is ``decontaminate``; this catches
    reworded/partial leakage).

    Scale shape: eval benchmarks are small by construction, so their
    distinct shingle-hash set broadcasts once (``ray.put`` of a sorted
    uint64 array) and the 100 TB corpus side STREAMS — membership is a
    vectorized ``searchsorted`` per batch, per-doc distinct matching is
    one lexsort + bincount, and nothing shuffles at all. (A benchmark
    too large to broadcast would use the hash(shingle) co-partition
    join of ops/dedup.py's verify stage instead.)

    Output: (id_col, n_matched, contaminated) for EVERY input doc.
    """
    from rdf_mapper_ray.ops.dedup import _shingle_hashes_batch

    def bench_shingles(batch: pa.Table) -> pa.Table:
        hs = _shingle_hashes_batch(
            batch.column(text_col).to_pylist(), shingle_k, hash_fn)
        flat = np.unique(np.concatenate(hs)) if hs \
            else np.array([], dtype=np.uint64)
        return pa.Table.from_pydict({
            "sh": pa.array(flat, type=pa.uint64())})

    parts = [b.column("sh").to_numpy(zero_copy_only=False)
             for b in bench.map_batches(
                 bench_shingles, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    bset = np.unique(np.concatenate(parts)) if parts \
        else np.array([], dtype=np.uint64)
    bref = ray.put(bset)

    def scan(batch: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        texts = batch.column(text_col).to_pylist()
        hs = _shingle_hashes_batch(texts, shingle_k, hash_fn)
        n = batch.num_rows
        if hs and len(bs):
            lens = np.array([len(h) for h in hs], dtype=np.int64)
            doc_idx = np.repeat(np.arange(n), lens)
            flat = np.concatenate(hs) if len(hs) else \
                np.array([], dtype=np.uint64)
            # distinct (doc, shingle) pairs, fully vectorized
            order = np.lexsort((flat, doc_idx))
            di, fl = doc_idx[order], flat[order]
            first = np.r_[True, (di[1:] != di[:-1]) | (fl[1:] != fl[:-1])]
            di, fl = di[first], fl[first]
            idx = np.clip(np.searchsorted(bs, fl), 0, len(bs) - 1)
            hit = bs[idx] == fl
            matched = np.bincount(di[hit], minlength=n).astype(np.int64)
        else:
            matched = np.zeros(n, dtype=np.int64)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "n_matched": pa.array(matched),
            "contaminated": pa.array(matched >= threshold),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def decontaminate_ngram_query(sf_dir: str):
    """Every 50th document plays the benchmark set; 5-gram overlap."""
    import ray.data as rd
    ds = read_table(sf_dir, "documents",
                         columns=["doc_id", "text"])

    def every_50th(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return batch.filter(pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 50), 50)), 0))

    bench = ds.map_batches(every_50th, batch_format="pyarrow")
    return decontaminate_ngram(ds, bench, shingle_k=5, threshold=1,
                               hash_fn="md5")


# matches _shingle_strings: k-gram windows, whole-doc fallback below k
# words, '' for the empty doc; membership compared on the SAME md5-based
# 64-bit hash the engine uses so both sides are the identical function
DECONTAMINATE_NGRAM_ORACLE_SQL = r"""
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''),
             ' ' || chr(9) || chr(10) || chr(13)), '\s+') AS w
  FROM documents
),
shingled AS (
  SELECT doc_id,
         array_to_string(list_slice(w, i, i + 4), ' ') AS sh
  FROM words,
       LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
  WHERE len(w) >= 5
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM words
  WHERE len(w) < 5
),
sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS h
  FROM shingled
),
bsh AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
m AS (
  SELECT s.doc_id, count(*)::BIGINT AS n
  FROM sh s JOIN bsh USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id, COALESCE(m.n, 0)::BIGINT AS n_matched,
       COALESCE(m.n, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN m USING (doc_id) ORDER BY d.doc_id
"""


def weighted_mix(ds: "ray.data.Dataset", id_col: str = "doc_id",
                 source_col: str = "source",
                 weights: dict | None = None,
                 default_weight: float = 1.0,
                 hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Dataset mixture sampling with per-source weights (the Pile /
    DoReMi training-mix shape): weight w < 1 keeps a deterministic
    hash-selected fraction of the source, w > 1 upsamples by emitting
    floor(w) copies of every doc plus one extra for a hash-selected
    frac(w) share. Output: (id, source, copy) with copy in 1..n.

    Like :func:`hash_split` this is a pure function of (id, source) —
    zero shuffle, resumable, embarrassingly parallel — and
    ``hash_fn="md5"`` is the portable venue the SQL oracle replays
    bit-exactly."""
    weights = weights or {}

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        bucket = (hash64(ids, hash_fn) % np.uint64(10_000)) \
            .astype(np.int64)
        w = pd.Series(batch.column(source_col).to_pandas()) \
            .map(weights).fillna(default_weight).to_numpy(np.float64)
        nfull = np.floor(w).astype(np.int64)
        frac = np.rint((w - nfull) * 10_000).astype(np.int64)
        reps = nfull + (bucket < frac)
        total = int(reps.sum())
        run_starts = np.cumsum(reps) - reps
        copy = np.arange(total) - np.repeat(run_starts, reps) + 1
        id_vals = batch.column(id_col).to_numpy(zero_copy_only=False)
        src = batch.column(source_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(id_vals, reps)),
            source_col: pa.array(np.repeat(src, reps), type=pa.string()),
            "copy": pa.array(copy, type=pa.int64()),
        })

    return ds.map_batches(part, batch_format="pyarrow")


# src<i> weight by i % 4: downsample, identity, and two upsample tiers
_MIX_TIERS = (0.25, 1.0, 1.5, 2.5)


def weighted_mix_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "source"])
    weights = {f"src{i}": _MIX_TIERS[i % 4] for i in range(64)}
    return weighted_mix(ds, weights=weights, hash_fn="md5")


WEIGHTED_MIX_ORACLE_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         {MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)")} % 10000
           AS bucket,
         CASE CAST(substr(source, 4) AS INT) % 4
              WHEN 0 THEN 0.25 WHEN 1 THEN 1.0
              WHEN 2 THEN 1.5 ELSE 2.5 END AS w
  FROM documents
)
SELECT doc_id, source,
       UNNEST(generate_series(
         1, CAST(floor(w) AS BIGINT)
            + CASE WHEN bucket < round((w - floor(w)) * 10000)
                   THEN 1 ELSE 0 END)) AS copy
FROM d
ORDER BY doc_id, copy
"""


def data_audit(ds: "ray.data.Dataset", rules: dict) -> "ray.data.Dataset":
    """Data-quality expectations audit: count violations of named
    predicate rules in one streaming pass (the Great-Expectations
    shape). ``rules`` maps rule name -> callable(pa.Table) -> boolean
    ndarray marking VIOLATING rows. Map-side combine: each batch emits
    one (rule, n_violations, n_rows) partial per rule; the only shuffle
    is over rules × batches rows. Output: (rule, n_violations, n_rows).
    """
    from ray.data.aggregate import Sum
    names = sorted(rules)

    def partial(batch: pa.Table) -> pa.Table:
        viol = [int(np.asarray(rules[r](batch)).sum()) for r in names]
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "n_violations": pa.array(viol, pa.int64()),
            "n_rows": pa.array([batch.num_rows] * len(names), pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("rule").aggregate(Sum("n_violations"), Sum("n_rows")) \
        .map_batches(lambda t: t.rename_columns(
            ["rule", "n_violations", "n_rows"]), batch_format="pyarrow")


def data_audit_query(sf_dir: str):
    """Order-table expectations: nonneg price, known status, sane date
    range, key present, price cap — each rule one vectorized Arrow
    kernel."""
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate"])

    def b(arr):
        return pc.fill_null(arr, True).to_numpy(zero_copy_only=False)

    rules = {
        "price_nonpositive": lambda t: b(pc.less_equal(
            t.column("o_totalprice"), 0.0)),
        "status_unknown": lambda t: ~np.isin(
            t.column("o_orderstatus").to_numpy(zero_copy_only=False),
            ("O", "F", "P")),
        "custkey_null": lambda t: pc.is_null(
            t.column("o_custkey")).to_numpy(zero_copy_only=False),
        "date_out_of_range": lambda t: b(pc.or_(
            pc.less(t.column("o_orderdate"),
                    pa.scalar(np.datetime64("1990-01-01", "us"))),
            pc.greater(t.column("o_orderdate"),
                       pa.scalar(np.datetime64("2030-01-01", "us"))))),
        "price_over_cap": lambda t: b(pc.greater(
            t.column("o_totalprice"), 400_000.0)),
    }
    return data_audit(ds, rules)


DATA_AUDIT_ORACLE_SQL = """
WITH t AS (SELECT * FROM orders)
SELECT rule, n_violations, n_rows FROM (
  SELECT 'price_nonpositive' AS rule,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations,
         CAST(COUNT(*) AS BIGINT) AS n_rows FROM t
  UNION ALL
  SELECT 'status_unknown',
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                  THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM t
  UNION ALL
  SELECT 'custkey_null',
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT), COUNT(*) FROM t
  UNION ALL
  SELECT 'date_out_of_range',
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                        OR o_orderdate > TIMESTAMP '2030-01-01'
                  THEN 1 ELSE 0 END) AS BIGINT), COUNT(*) FROM t
  UNION ALL
  SELECT 'price_over_cap',
         CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END)
              AS BIGINT), COUNT(*) FROM t
)
ORDER BY rule
"""


def split_leakage(ds: "ray.data.Dataset", id_col: str = "doc_id",
                  text_col: str = "text", key_len: int = 50,
                  train_below: int = 80, test_from: int = 90,
                  hash_fn: str = "pandas",
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Cross-split contamination check: test-split documents whose
    content fingerprint also appears in the train split — the
    eval-leakage audit every split pipeline needs. Splits come from the
    same deterministic id-hash buckets as :func:`hash_split`; the
    fingerprint here is the first ``key_len`` codepoints (swap in the
    sha256 column for exact-text leakage or the minhash machinery for
    near-dup leakage — same join shape).

    One shuffle: (fingerprint, id, split-flag) rows route by
    hash(fingerprint); inside each partition one vectorized isin marks
    test rows whose fingerprint has a train occurrence. Output:
    (id,) leaked test docs."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.string()).to_pylist()
        bucket = (hash64(ids, hash_fn) % np.uint64(100)).astype(np.int64)
        is_train = bucket < train_below
        is_test = bucket >= test_from
        keep = is_train | is_test
        key = pc.utf8_slice_codeunits(
            pc.fill_null(batch.column(text_col), ""), 0, key_len)
        t = pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "k": key,
            "is_train": pa.array(is_train.astype(np.int8)),
        }).filter(pa.array(keep))
        h = pd.util.hash_pandas_object(
            t.column("k").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def leaked(g: pd.DataFrame) -> pd.DataFrame:
        train_keys = g.loc[g["is_train"] == 1, "k"]
        tests = g[g["is_train"] == 0]
        hit = tests[tests["k"].isin(set(train_keys))]
        return pd.DataFrame({id_col: hit[id_col].to_numpy()})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("pid").map_groups(leaked, batch_format="pandas")


def split_leakage_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return split_leakage(ds, hash_fn="md5")


SPLIT_LEAKAGE_ORACLE_SQL = f"""
WITH s AS (
  SELECT doc_id, substr(COALESCE(text, ''), 1, 50) AS k,
         {MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)")} % 100
           AS bucket
  FROM documents
)
SELECT t.doc_id
FROM s t
WHERE t.bucket >= 90
  AND EXISTS (SELECT 1 FROM s tr
              WHERE tr.bucket < 80 AND tr.k = t.k)
ORDER BY doc_id
"""


def negative_samples(ds: "ray.data.Dataset", id_col: str = "vec_id",
                     k: int = 4, n_items: int | None = None,
                     hash_fn: str = "pandas") -> "ray.data.Dataset":
    """Deterministic negative sampling for contrastive training: each
    anchor draws ``k`` pseudo-random negatives by hashing (anchor, j)
    into the contiguous [0, n) id domain, shifted one past the anchor
    so a negative never equals its anchor. Output:
    (anchor_id, neg_rank, neg_id).

    Pure function of the id — zero shuffle, embarrassingly parallel,
    identical on every rerun/retry (the property a resumable training
    pipeline needs); ``hash_fn="md5"`` is the portable venue the SQL
    oracle replays bit-exactly. Assumes contiguous ids (standard after
    an id-densification pass)."""
    if n_items is None:
        n_items = ds.count()        # metadata-only on parquet sources

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        anchors, ranks, negs = [], [], []
        for j in range(1, k + 1):
            keys = [f"{i}#{j}" for i in ids]
            h = hash64(keys, hash_fn) % np.uint64(n_items - 1)
            neg = (ids + 1 + h.astype(np.int64)) % n_items
            anchors.append(ids)
            ranks.append(np.full(len(ids), j, dtype=np.int64))
            negs.append(neg)
        return pa.table({
            "anchor_id": pa.array(np.concatenate(anchors)),
            "neg_rank": pa.array(np.concatenate(ranks)),
            "neg_id": pa.array(np.concatenate(negs)),
        })

    return ds.select_columns([id_col]) \
        .map_batches(sample, batch_format="pyarrow")


def negative_samples_query(sf_dir: str, k: int = 4):
    ds = read_table(sf_dir, "embeddings",
                               columns=["vec_id"])
    return negative_samples(ds, k=k, hash_fn="md5")


def negative_samples_oracle_sql(k: int = 4) -> str:
    h = MD5_HASH64_SQL.format(
        col="CAST(vec_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)")
    return f"""
WITH n AS (SELECT COUNT(*) AS total FROM embeddings)
SELECT vec_id AS anchor_id,
       CAST(j AS BIGINT) AS neg_rank,
       CAST((vec_id + 1 + CAST({h} % (total - 1) AS BIGINT))
            % total AS BIGINT) AS neg_id
FROM embeddings, n, UNNEST(generate_series(1, {k})) AS g(j)
ORDER BY anchor_id, neg_rank
"""


# --- weighted sampling (deterministic hash priority) --------------------------------

def weighted_sample_per_group(ds: "ray.data.Dataset", group_col: str,
                              id_col: str, weight_col: str, n: int = 5,
                              num_partitions: int | None = None
                              ) -> "ray.data.Dataset":
    """Weighted sample of ``n`` rows per group WITHOUT randomness: each
    row's priority is ``md5_u64(id) / (weight + 1)`` — the fixed-hash
    variant of priority sampling (Efraimidis-Spiliotis A-Res with u
    pinned by the id hash), so heavier rows draw smaller priorities
    and the whole sample is reproducible run-to-run AND replayable in
    SQL. Same two-phase shape as top_n_per_group: per-block local
    prune (≤ n rows per block-group ride the shuffle), pid-routed
    finish. -> (group, rank, id)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, id_col, weight_col]).to_pandas()
        h = hash64([str(i) for i in df[id_col]], "md5")
        df["pri"] = h.astype(np.float64) \
            / (df[weight_col].to_numpy(np.float64) + 1.0)
        df = df.sort_values([group_col, "pri"]) \
            .groupby(group_col, sort=False).head(n)
        pid = pd.util.hash_pandas_object(df[group_col], index=False) \
            .to_numpy()
        df["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(
            df[[group_col, id_col, "pri", "pid"]], preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "pri"]) \
            .groupby(group_col, sort=False).head(n)
        g["rank"] = (g.groupby(group_col, sort=False).cumcount() + 1) \
            .astype(np.int64)
        return g[[group_col, "rank", id_col]]

    return ds.map_batches(local_prune, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def weighted_sample_query(sf_dir: str, n: int = 5):
    """n-chars-weighted doc sample per language."""
    ds = read_table(sf_dir, "documents",
                    columns=["lang", "doc_id", "n_chars"])
    return weighted_sample_per_group(ds, "lang", "doc_id", "n_chars",
                                     n=n)


def weighted_sample_oracle_sql(n: int = 5) -> str:
    return f"""
WITH pri AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           / CAST(n_chars + 1 AS DOUBLE) AS pri
  FROM documents
),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY pri) AS rank
  FROM pri
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
FROM r WHERE rank <= {n}
ORDER BY lang, rank
"""


# --- preference-pair construction ---------------------------------------------------

def preference_pairs(ds: "ray.data.Dataset", group_col: str,
                     id_col: str, text_col: str,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """RLHF-style (chosen, rejected) pair construction: per group, the
    best- and worst-scoring document under an integer quality signal —
    here milli-units of mean token length, ``cpt_milli =
    n_token_chars·1000 // n_tokens`` (the repo's exact floor
    contract; docs with zero tokens are excluded, groups with < 2
    scored docs emit nothing). Chosen = first by (score DESC, id
    ASC); rejected = first by (score ASC, id ASC) — fully
    deterministic, so the SQL oracle replays the pairing exactly.

    Scale shape (grouped_top_n lesson): each block prunes every group
    it sees to ≤ 2 candidate rows + a count partial; only those
    shuffle, hash(group)-routed. -> (group, chosen_id, rejected_id,
    chosen_cpt_milli, rejected_cpt_milli)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 1)

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"),
                           pa.int64())
        n_ws = pc.cast(pc.count_substring_regex(text, r"\s"),
                       pa.int64())
        n_chars = pc.subtract(
            pc.cast(pc.utf8_length(text), pa.int64()), n_ws)
        t = pa.Table.from_pydict({
            "grp": batch.column(group_col),
            "id": batch.column(id_col),
            "n_tokens": n_tokens, "n_chars": n_chars})
        t = t.filter(pc.greater(t.column("n_tokens"), 0))
        cpt = pc.divide(pc.multiply(t.column("n_chars"), 1000),
                        t.column("n_tokens"))
        g = pd.DataFrame({"grp": t.column("grp").to_pandas(),
                          "id": t.column("id").to_pandas(),
                          "cpt": pc.cast(cpt, pa.int64()).to_pandas()})
        cnt = g.groupby("grp", as_index=False).size() \
            .rename(columns={"size": "n"})
        best = g.sort_values(["grp", "cpt", "id"],
                             ascending=[True, False, True],
                             kind="stable").groupby(
            "grp", sort=False).head(1)
        worst = g.sort_values(["grp", "cpt", "id"],
                              ascending=[True, True, True],
                              kind="stable").groupby(
            "grp", sort=False).head(1)
        out = pd.concat([best, worst]).drop_duplicates(["grp", "id"])
        out = out.merge(cnt, on="grp")
        h = pd.util.hash_pandas_object(out["grp"],
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        grps, ch_id, rj_id, ch_c, rj_c = [], [], [], [], []
        for grp, gg in g.groupby("grp", sort=False):
            if int(gg["n"].sum()) < 2:
                continue
            gg = gg.drop_duplicates("id")
            b = gg.sort_values(["cpt", "id"],
                               ascending=[False, True],
                               kind="stable").iloc[0]
            w = gg.sort_values(["cpt", "id"],
                               ascending=[True, True],
                               kind="stable").iloc[0]
            grps.append(grp)
            ch_id.append(b["id"])
            rj_id.append(w["id"])
            ch_c.append(int(b["cpt"]))
            rj_c.append(int(w["cpt"]))
        return pd.DataFrame({
            group_col: grps,
            "chosen_id": np.asarray(ch_id, dtype=object),
            "rejected_id": np.asarray(rj_id, dtype=object),
            "chosen_cpt_milli": np.asarray(ch_c, dtype=np.int64),
            "rejected_cpt_milli": np.asarray(rj_c, dtype=np.int64)})

    return ds.map_batches(score, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")


def preference_pairs_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                    columns=["source", "doc_id", "text"])
    return preference_pairs(ds, "source", "doc_id", "text")


PREFERENCE_PAIRS_ORACLE_SQL = """
WITH s AS (
  SELECT source, doc_id,
         (length(text) - len(regexp_extract_all(text, '\\s')))
           * 1000 // len(regexp_extract_all(text, '\\S+')) AS cpt
  FROM documents
  WHERE len(regexp_extract_all(text, '\\S+')) > 0
),
r AS (
  SELECT source, doc_id, cpt,
         row_number() OVER (PARTITION BY source
                            ORDER BY cpt DESC, doc_id) AS rn_best,
         row_number() OVER (PARTITION BY source
                            ORDER BY cpt ASC, doc_id) AS rn_worst,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM s
)
SELECT b.source,
       b.doc_id AS chosen_id, w.doc_id AS rejected_id,
       CAST(b.cpt AS BIGINT) AS chosen_cpt_milli,
       CAST(w.cpt AS BIGINT) AS rejected_cpt_milli
FROM (SELECT * FROM r WHERE rn_best = 1 AND n >= 2) b
JOIN (SELECT * FROM r WHERE rn_worst = 1) w USING (source)
ORDER BY b.source
"""


# --- k-anonymity audit ------------------------------------------------------------


def k_anonymity(ds: "ray.data.Dataset", quasi_cols: list[str],
                k: int = 10) -> "ray.data.Dataset":
    """k-anonymity audit (Sweeney 2002) over a quasi-identifier
    combination: every equivalence class with its size and a
    violation flag (n < k means the combo re-identifies to fewer
    than k individuals — the release-gating privacy check a training
    corpus runs before shipping user-derived tables).

    Map-side combine (per-batch class counts) before one
    class-cardinality exchange. -> quasi_cols + (n, is_violating)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(quasi_cols).group_by(
            quasi_cols, use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(quasi_cols + ["n"])

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.cast(t.column("sum(n)"), pa.int64())
        cols = {c: t.column(c) for c in quasi_cols}
        cols["n"] = n
        cols["is_violating"] = pc.less(n, k)
        return pa.Table.from_pydict(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(quasi_cols).aggregate(Sum("n")) \
        .map_batches(finish, batch_format="pyarrow")


def k_anonymity_query(sf_dir: str, k: int = 10):
    ds = read_table(sf_dir, "customer",
                    columns=["c_nationkey", "c_mktsegment"])
    return k_anonymity(ds, ["c_nationkey", "c_mktsegment"], k=k)


def k_anonymity_oracle_sql(k: int = 10) -> str:
    return f"""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
       COUNT(*) AS n,
       COUNT(*) < {k} AS is_violating
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""


# --- GDPR cascade-delete impact audit ----------------------------------------------


def cascade_delete_audit(sf_dir: str, modulus: int = 97
                         ) -> "ray.data.Dataset":
    """Right-to-erasure impact audit: given a deletion request set
    (customers with ``c_custkey % modulus == 0`` — the deterministic
    stand-in for an uploaded key list), count the rows each table
    loses, INCLUDING the two-hop cascade (lineitem rows die through
    their parent order, not through a customer key they don't carry).

    Scale shape: the three key-carrying tables count map-side (one
    tiny sum each, zero exchanges); the cascade hop is a semi-join of
    lineitem against the deleted-order keys (equi_join's venue
    dispatch: broadcast under threshold, hash-routed above).
    -> (tbl, n_total, n_deleted), one row per table."""
    from rdf_mapper_ray.ops.joins import equi_join

    def direct(table: str, key: str) -> tuple[int, int]:
        ds = read_table(sf_dir, table, columns=[key])

        def partial(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "n": pa.array([len(k)], pa.int64()),
                "d": pa.array([int((k % modulus == 0).sum())],
                              pa.int64())})

        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .sum(["n", "d"])
        return int(agg["sum(n)"]), int(agg["sum(d)"])

    rows = []
    for table, key in [("customer", "c_custkey"),
                       ("orders", "o_custkey"),
                       ("events", "user_id")]:
        n, d = direct(table, key)
        rows.append((table, n, d))

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    def dead(batch: pa.Table) -> pa.Table:
        k = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(k % modulus == 0)) \
            .select(["o_orderkey"])

    dead_orders = read_table(sf_dir, "orders",
                             columns=["o_orderkey", "o_custkey"]) \
        .map_batches(dead, batch_format="pyarrow")
    n_li = li.count()
    d_li = equi_join(li, dead_orders, "l_orderkey", "o_orderkey",
                     how="semi").count()
    rows.append(("lineitem", n_li, d_li))

    rows.sort()
    return ray.data.from_arrow(pa.Table.from_pydict({
        "tbl": pa.array([r[0] for r in rows], pa.string()),
        "n_total": pa.array([r[1] for r in rows], pa.int64()),
        "n_deleted": pa.array([r[2] for r in rows], pa.int64()),
    }))


def cascade_delete_oracle_sql(modulus: int = 97) -> str:
    return f"""
SELECT * FROM (
  SELECT 'customer' AS tbl, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN c_custkey % {modulus} = 0 THEN 1
                  ELSE 0 END) AS BIGINT) AS n_deleted
  FROM customer
  UNION ALL
  SELECT 'orders', COUNT(*),
         CAST(SUM(CASE WHEN o_custkey % {modulus} = 0 THEN 1
                  ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'events', COUNT(*),
         CAST(SUM(CASE WHEN user_id % {modulus} = 0 THEN 1
                  ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'lineitem', COUNT(*),
         CAST(SUM(CASE WHEN o.o_custkey % {modulus} = 0 THEN 1
                  ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
) ORDER BY tbl
"""


# --- exact-total quota sampling (largest remainder) --------------------------------

def quota_sample(ds: "ray.data.Dataset", group_col: str, id_col: str,
                 total: int, num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """Sample EXACTLY ``total`` rows, allocated across groups
    proportional to group size by the largest-remainder (Hamilton)
    method — the training-mix shape when the budget is a hard row
    count, not a rate (weighted_mix's fractions hit quotas only in
    expectation). quota_g = floor(total·n_g/N) plus +1 for the
    groups with the largest remainders (ties by group ascending);
    within a group the md5-rank smallest ids win (deterministic,
    SQL-replayable). -> (group, id).

    Shape: group counts reduce map-side then merge on the driver
    (group-cardinality — mixture domains are dozens, not millions);
    quotas broadcast; the pick is the weighted_sample two-phase —
    per-block prune to ≤ quota_g rows per group seen, pid-routed
    finish. If ``total`` exceeds the row count everything is kept."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def counts(batch: pa.Table) -> pa.Table:
        agg = batch.select([group_col]).group_by(
            group_col, use_threads=False).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "n"])

    c = ds.map_batches(counts, batch_format="pyarrow").to_pandas() \
        .groupby(group_col, as_index=False)["n"].sum() \
        .sort_values(group_col).reset_index(drop=True)
    n = c["n"].to_numpy(np.int64)
    grand = int(n.sum())
    fl = (total * n) // grand
    rem = (total * n) % grand
    leftover = int(total - fl.sum())
    order = np.lexsort((np.arange(len(n)), -rem))  # rem desc, grp asc
    fl[order[:leftover]] += 1
    quota = dict(zip(c[group_col], (int(q) for q in fl)))
    qref = ray.put(quota)

    def prune(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        df = batch.select([group_col, id_col]).to_pandas()
        df["h"] = hash64([str(i) for i in df[id_col]], "md5") \
            .astype(np.uint64)
        df = df.sort_values([group_col, "h", id_col], kind="stable")
        k = df[group_col].map(q).to_numpy(np.int64)
        keep = df.groupby(group_col, sort=False).cumcount() \
            .to_numpy() < k
        df = df[keep]
        pid = pd.util.hash_pandas_object(df[group_col],
                                         index=False).to_numpy()
        df["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        g = g.sort_values([group_col, "h", id_col], kind="stable")
        k = g[group_col].map(q).to_numpy(np.int64)
        keep = g.groupby(group_col, sort=False).cumcount() \
            .to_numpy() < k
        g = g[keep]
        return g[[group_col, id_col]]

    return ds.map_batches(prune, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def quota_sample_query(sf_dir: str, total: int = 500):
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source"])
    return quota_sample(ds, group_col="source", id_col="doc_id",
                        total=total)


def quota_sample_oracle_sql(total: int = 500) -> str:
    h = MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source
),
t AS (SELECT SUM(n) AS grand FROM c),
q AS (
  SELECT source, n,
         ({total} * n) // grand AS fl,
         ({total} * n) % grand AS rem
  FROM c, t
),
lo AS (SELECT {total} - SUM(fl) AS leftover FROM q),
r AS (
  SELECT source, fl,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
  FROM q
),
quota AS (
  SELECT source,
         fl + CASE WHEN rk <= (SELECT leftover FROM lo)
                   THEN 1 ELSE 0 END AS k
  FROM r
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY {h}, doc_id) AS rnk
  FROM documents
)
SELECT ranked.source AS source, doc_id
FROM ranked JOIN quota ON ranked.source = quota.source
WHERE rnk <= k
ORDER BY ranked.source, doc_id
"""


# --- l-diversity audit (Machanavajjhala et al. 2007) --------------------------------


def l_diversity(ds: "ray.data.Dataset", quasi_cols: list[str],
                sensitive_col: str, l: int = 3,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Distinct l-diversity audit, the companion gate to k_anonymity:
    every quasi-identifier equivalence class with its row count, its
    number of DISTINCT sensitive values, and a violation flag
    (l_distinct < l means an attacker who locates the class learns
    the sensitive attribute almost surely). -> quasi_cols +
    (n, l_distinct, is_violating).

    Scale shape: per-batch partials shrink blocks to distinct
    (quasi, sensitive) triples with counts FIRST, so the one
    hash(quasi) exchange carries class x sensitive cardinality, never
    rows; the per-partition finish is a vectorized pandas groupby."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(quasi_cols + [sensitive_col]).group_by(
            quasi_cols + [sensitive_col], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(quasi_cols + [sensitive_col, "cnt"])

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(quasi_cols).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(quasi_cols + [sensitive_col],
                      as_index=False)["cnt"].sum()
        out = m.groupby(quasi_cols, as_index=False).agg(
            n=("cnt", "sum"), l_distinct=(sensitive_col, "size"))
        out["n"] = out["n"].astype(np.int64)
        out["l_distinct"] = out["l_distinct"].astype(np.int64)
        out["is_violating"] = out["l_distinct"] < l
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(finish, batch_format="pandas")


def l_diversity_query(sf_dir: str, l: int = 3):
    """Does knowing an order's (priority, status) pin down its price
    band? — price band = cents // 5_000_000 ($50k) is the sensitive
    attribute stand-in."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_orderstatus",
                             "o_totalprice"])

    def band(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0)), pa.int64())
        return pa.Table.from_pydict({
            "o_orderpriority": batch.column("o_orderpriority"),
            "o_orderstatus": batch.column("o_orderstatus"),
            "band": pc.cast(pc.divide(cents, 5_000_000), pa.int64())})

    return l_diversity(ds.map_batches(band, batch_format="pyarrow"),
                       ["o_orderpriority", "o_orderstatus"], "band",
                       l=l)


def l_diversity_oracle_sql(l: int = 3) -> str:
    return f"""
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)
                           // 5000000) AS BIGINT) AS l_distinct,
       COUNT(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)
             // 5000000) < {l} AS is_violating
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


# --- embedding-space decontamination -------------------------------------------------


def embedding_decontaminate(train: "ray.data.Dataset",
                            eval_ds: "ray.data.Dataset",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            threshold: float = 0.35
                            ) -> "ray.data.Dataset":
    """Semantic benchmark-contamination scan: for every TRAIN vector,
    count the EVAL vectors with cosine ≥ threshold. The n-gram
    decontaminate catches verbatim leakage; this catches paraphrases
    and near-duplicates that survive lexical checks (the SemDeDup /
    benchmark-overlap concern). -> (vec_id, n_matches), matched train
    rows only.

    Venue: the eval side is small BY CONSTRUCTION (benchmarks are
    KB–MB scale), so its row-normalized matrix broadcasts once via
    ``ray.put`` and each train block does ONE dense matmul against it
    — zero shuffles, zero driver funnel for the corpus side. Past
    broadcast scale the block-pair self-join venue
    (dedup.embedding_neardup_pairs) is the stated path."""
    import ray

    from rdf_mapper_ray.ops.dedup import _vecs_from_block

    eval_ids, eval_m = [], []
    for b in eval_ds.select_columns([id_col, vec_col]) \
                    .iter_batches(batch_format="pyarrow"):
        i, m = _vecs_from_block(b, id_col, vec_col)
        if len(i):
            eval_ids.append(i)
            eval_m.append(m)
    if not eval_ids:
        return ray.data.from_arrow(pa.Table.from_pydict({
            id_col: pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64())}))
    ref = ray.put(np.concatenate(eval_m, axis=0))

    def scan(batch: pa.Table, _thr=threshold) -> pa.Table:
        ev = ray.get(ref)
        ids, m = _vecs_from_block(batch, id_col, vec_col)
        if not len(ids):
            return pa.Table.from_pydict({
                id_col: pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64())})
        hits = ((m @ ev.T) >= _thr).sum(axis=1).astype(np.int64)
        keep = hits > 0
        return pa.Table.from_pydict({
            id_col: pa.array(ids[keep], pa.int64()),
            "n_matches": pa.array(hits[keep], pa.int64())})

    return train.select_columns([id_col, vec_col]) \
        .map_batches(scan, batch_format="pyarrow")


_EVAL_MOD = 20  # vec_id % 20 == 0 -> the held-out eval split (5%)


def embedding_decontaminate_query(sf_dir: str):
    full = read_table(sf_dir, "embeddings",
                      columns=["vec_id", "embedding"])

    def split(want_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            m = (ids % _EVAL_MOD) == 0
            keep = np.flatnonzero(m if want_eval else ~m)
            return t.take(pa.array(keep, pa.int64()))
        return f

    train = full.map_batches(split(False), batch_format="pyarrow")
    ev = full.map_batches(split(True), batch_format="pyarrow")
    return embedding_decontaminate(train, ev)


EMBEDDING_DECONTAMINATE_ORACLE_SQL = f"""
WITH ev AS (SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % {_EVAL_MOD} = 0),
tr AS (SELECT vec_id, embedding FROM embeddings
       WHERE vec_id % {_EVAL_MOD} <> 0)
SELECT t.vec_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM tr t JOIN ev e
  ON list_cosine_similarity(t.embedding, e.embedding) >= 0.35
GROUP BY t.vec_id ORDER BY t.vec_id
"""


# --- t-closeness ---------------------------------------------------------------------


def t_closeness(ds: "ray.data.Dataset", quasi_cols: list[str],
                sensitive_col: str, t_milli: int = 200
                ) -> "ray.data.Dataset":
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) with
    total variation distance: for every quasi-identifier class, the
    TVD between its sensitive-value distribution and the GLOBAL one —
    TVD = Σ_c |n_gc·N − n_c·N_g| / (2·N_g·N), including sensitive
    values absent from the class. Reported as exact-integer milli-TVD
    ``(1000·S + N_g·N) // (2·N_g·N)`` (the repo's positive-operand
    truncating-division rounding — DuckDB ``//`` replays it
    bit-exactly). -> quasi_cols + (n, milli_tvd, is_violating).

    Scale shape: blocks shrink map-side to (quasi, sensitive) count
    partials; the merged cell table is class × sensitive-cardinality
    sized BY CONSTRUCTION, so it finishes driver-side in Python ints
    (the mutual_info / rdfs_entail cell-table pattern — re-shuffling
    it would pay sort floors for nothing)."""
    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(quasi_cols + [sensitive_col]).group_by(
            quasi_cols + [sensitive_col], use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(quasi_cols + [sensitive_col, "cnt"])

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")) \
        .groupby(quasi_cols + [sensitive_col], as_index=False)["cnt"] \
        .sum()
    big_n = int(cells["cnt"].sum())
    glob = cells.groupby(sensitive_col)["cnt"].sum()
    rows = []
    for quasi, g in cells.groupby(quasi_cols, sort=True):
        ng = int(g["cnt"].sum())
        by_s = dict(zip(g[sensitive_col], g["cnt"]))
        s_dev = sum(abs(int(by_s.get(sv, 0)) * big_n - int(nc) * ng)
                    for sv, nc in glob.items())
        milli = (1000 * s_dev + ng * big_n) // (2 * ng * big_n)
        key = quasi if isinstance(quasi, tuple) else (quasi,)
        rows.append((*key, ng, milli, milli > t_milli))
    cols = {c: pa.array([r[i] for r in rows])
            for i, c in enumerate(quasi_cols)}
    cols["n"] = pa.array([r[-3] for r in rows], pa.int64())
    cols["milli_tvd"] = pa.array([r[-2] for r in rows], pa.int64())
    cols["is_violating"] = pa.array([r[-1] for r in rows], pa.bool_())
    return ray.data.from_arrow(pa.Table.from_pydict(cols))


def t_closeness_query(sf_dir: str, t_milli: int = 200):
    """Is any (priority, status) class's price-band distribution far
    from the corpus-wide one? Same quasi/sensitive frame as
    l_diversity (band = cents // $50k)."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderpriority", "o_orderstatus",
                             "o_totalprice"])

    def band(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0)), pa.int64())
        return pa.Table.from_pydict({
            "o_orderpriority": batch.column("o_orderpriority"),
            "o_orderstatus": batch.column("o_orderstatus"),
            "band": pc.cast(pc.divide(cents, 5_000_000), pa.int64())})

    return t_closeness(ds.map_batches(band, batch_format="pyarrow"),
                       ["o_orderpriority", "o_orderstatus"], "band",
                       t_milli=t_milli)


def t_closeness_oracle_sql(t_milli: int = 200) -> str:
    return f"""
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS band,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2, 3
),
g AS (SELECT o_orderpriority, o_orderstatus, SUM(c) AS ng
      FROM cells GROUP BY 1, 2),
gl AS (SELECT band, SUM(c) AS nc FROM cells GROUP BY band),
tot AS (SELECT SUM(c) AS n FROM cells),
grid AS (
  SELECT g.o_orderpriority, g.o_orderstatus, g.ng, gl.band, gl.nc,
         COALESCE(cells.c, 0) AS c
  FROM g CROSS JOIN gl
  LEFT JOIN cells ON cells.o_orderpriority = g.o_orderpriority
                 AND cells.o_orderstatus = g.o_orderstatus
                 AND cells.band = gl.band
),
s AS (
  SELECT o_orderpriority, o_orderstatus, ng,
         SUM(abs(CAST(c AS HUGEINT) * (SELECT n FROM tot)
                 - CAST(nc AS HUGEINT) * ng)) AS sdev
  FROM grid GROUP BY 1, 2, 3
)
SELECT o_orderpriority, o_orderstatus, CAST(ng AS BIGINT) AS n,
       CAST((1000 * sdev + ng * (SELECT n FROM tot))
            // (2 * ng * (SELECT n FROM tot)) AS BIGINT) AS milli_tvd,
       ((1000 * sdev + ng * (SELECT n FROM tot))
        // (2 * ng * (SELECT n FROM tot))) > {t_milli} AS is_violating
FROM s ORDER BY o_orderpriority, o_orderstatus
"""


# --- stratified k-fold assignment --------------------------------------------------------


def stratified_kfold(ds: "ray.data.Dataset", label_col: str,
                     id_col: str, k: int = 4,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """Deterministic stratified k-fold assignment (the
    cross-validation splitter): within each label class, rows rank by
    the portable md5-64 of their id (the hash_split convention — a
    pure function of the id, reshuffling-proof) and fold =
    (rank−1) mod k, so every fold gets ⌈n_c/k⌉ or ⌊n_c/k⌋ rows of
    class c — balance is exact by construction, not in expectation.
    -> (id, label, fold).

    Shape: ONE hash(label) exchange co-partitions each class; the
    per-class rank is a vectorized lexsort (hash, id tiebreak)."""
    from rdf_mapper_ray.ops.hashing import hash64

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select([id_col, label_col])
        pid = pd.util.hash_pandas_object(
            t.column(label_col).to_pandas(), index=False).to_numpy()
        ids = t.column(id_col).cast(pa.string()).to_pylist()
        h = hash64(ids, "md5")
        return t.append_column(
            "h", pa.array(h.astype(np.uint64), pa.uint64())) \
            .append_column(
            "pid", pa.array((pid % np.uint64(num_partitions))
                            .astype(np.int64)))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lab, grp in g.groupby(label_col, sort=False):
            ids = grp[id_col].to_numpy()
            h = grp["h"].to_numpy(np.uint64)
            order = np.lexsort((ids, h))
            fold = np.empty(len(ids), np.int64)
            fold[order] = np.arange(len(ids), dtype=np.int64) % k
            # label keeps the INPUT dtype (int32 parquet labels must
            # not upcast — the driver's value hash is dtype-sensitive)
            out.append(pd.DataFrame({
                id_col: ids,
                label_col: grp[label_col].to_numpy(),
                "fold": fold}))
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(assign, batch_format="pandas")


def stratified_kfold_query(sf_dir: str, k: int = 4):
    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "label"])
    return stratified_kfold(ds, "label", "vec_id", k=k)


def stratified_kfold_oracle_sql(k: int = 4) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="CAST(vec_id AS VARCHAR)")
    return f"""
SELECT vec_id, label,
       CAST((row_number() OVER (PARTITION BY label
                                ORDER BY {h}, vec_id) - 1) % {k}
            AS BIGINT) AS fold
FROM embeddings ORDER BY vec_id
"""


# --- contrastive training triplets -----------------------------------------------------------


def contrastive_pairs(emb: "ray.data.Dataset",
                      threshold: float = 0.45
                      ) -> "ray.data.Dataset":
    """Contrastive training triplets (SimCSE/InfoNCE data prep):
    every embedding near-dup pair becomes an (anchor, positive) and
    draws a DETERMINISTIC negative — ``vocab[md5_64(anchor||positive)
    % n]`` over the sorted vec_id vocabulary — with the degeneracy
    flag marking negatives that collide with the anchor or the
    positive (the filtered-negatives discipline, same as
    kg_negatives). -> (anchor, positive, negative, degenerate).

    Shape: positives ride the existing block-pair exact near-dup op
    unchanged; the vocabulary is id-table-sized (broadcast sorted
    array); the negative draw is map-only."""
    from rdf_mapper_ray.ops.dedup import embedding_neardup_pairs
    from rdf_mapper_ray.ops.hashing import hash64

    ids = np.sort(np.concatenate(
        [b.column("vec_id").to_numpy(zero_copy_only=False)
         for b in emb.select_columns(["vec_id"])
         .iter_batches(batch_format="pyarrow")]))
    n = len(ids)
    ref = ray.put(ids)

    pairs = embedding_neardup_pairs(emb, threshold=threshold) \
        .select_columns(["left_id", "right_id"])

    def draw(t: pa.Table) -> pa.Table:
        vocab = ray.get(ref)
        a = t.column("left_id").to_numpy(zero_copy_only=False)
        p = t.column("right_id").to_numpy(zero_copy_only=False)
        keys = [f"{x}|{y}" for x, y in zip(a, p)]
        neg = vocab[(hash64(keys, "md5") % np.uint64(n))
                    .astype(np.int64)]
        return pa.Table.from_pydict({
            "anchor": pa.array(a, pa.int64()),
            "positive": pa.array(p, pa.int64()),
            "negative": pa.array(neg, pa.int64()),
            "degenerate": pa.array((neg == a) | (neg == p))})

    return pairs.map_batches(draw, batch_format="pyarrow")


def contrastive_pairs_query(sf_dir: str):
    return contrastive_pairs(
        read_table(sf_dir, "embeddings",
                   columns=["vec_id", "embedding"]))


def contrastive_pairs_oracle_sql(threshold: float = 0.45) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(
        col="CAST(a.vec_id AS VARCHAR) || '|' "
            "|| CAST(b.vec_id AS VARCHAR)")
    return f"""
WITH vocab AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS idx
  FROM embeddings
),
n AS (SELECT COUNT(*) AS n FROM vocab),
p AS (
  SELECT a.vec_id AS anchor, b.vec_id AS positive,
         CAST({h} % (SELECT n FROM n) AS BIGINT) AS nidx
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding)
        >= {threshold}
)
SELECT p.anchor, p.positive, v.vec_id AS negative,
       v.vec_id = p.anchor OR v.vec_id = p.positive AS degenerate
FROM p JOIN vocab v ON v.idx = p.nidx
ORDER BY anchor, positive
"""
