"""Vocab-file-driven BPE tokenization — real subword token counts for
packing / budget ops, replacing whitespace proxies (Sennrich et al.
2016; GPT-2 file format: ``merges.txt`` priority list + ``vocab.json``
token ids).

Engine shape: a stateful actor pool — each actor parses the merges
file ONCE in ``__init__`` and keeps a word -> token-count cache across
batches (the classic encoder trick: web-corpus word frequency is
Zipfian, so the cache hit rate approaches 1). Per batch the text column
tokenizes with one Arrow RE2 kernel, distinct words encode once, and
counts scatter back via searchsorted — no per-row Python in the hot
path beyond the first sighting of each distinct word.

Oracle: the merge loop is replayed IN SQL — merges inlined as VALUES
and K unrolled steps (the pagerank-oracle pattern), each step finding
every word's lowest-rank adjacent pair via a zipped-unnest self-join
and merging all its occurrences left-to-right (run-parity window math
picks the non-overlapping matches). Exact for any word needing at most
K merge steps; a word's merge count is < its length, so K bounds word
length at K+1 chars (asserted against the fixture corpus in tests).
Every step CTE is MATERIALIZED — without it DuckDB inlines each
3-times-referenced step and the plan blows up exponentially in K.

Pre-tokenization is whitespace (documented deviation from GPT-2's
byte-level regex: the fixture corpus is plain lowercase ASCII; the
byte-level pre-tokenizer is a drop-in swap of ``_WORD_RE``).
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table

_RES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "resources", "bpe")
DEFAULT_MERGES = os.path.join(_RES_DIR, "merges.txt")
DEFAULT_VOCAB = os.path.join(_RES_DIR, "vocab.json")

_WS = r"\s+"


def load_merges(path: str = DEFAULT_MERGES) -> list[tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p1, p2 = line.split()
            out.append((p1, p2))
    return out


def load_vocab(path: str = DEFAULT_VOCAB) -> dict[str, int]:
    with open(path) as f:
        return json.load(f)


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                merges: list[tuple[str, str]]) -> list[str]:
    """Reference BPE encode: repeatedly merge ALL occurrences of the
    lowest-rank adjacent pair, left to right, until none remains."""
    syms = list(word)
    while len(syms) > 1:
        cand = [ranks[p] for p in zip(syms, syms[1:]) if p in ranks]
        if not cand:
            break
        p1, p2 = merges[min(cand)]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
                out.append(p1 + p2)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BPETokenize:
    """Actor-pool batch fn: (id, text) -> (id, n_tokens). Merges parse
    and the word cache live for the actor's lifetime."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 merges_path: str = DEFAULT_MERGES):
        self.id_col = id_col
        self.text_col = text_col
        self.merges = load_merges(merges_path)
        self.ranks = {p: i for i, p in enumerate(self.merges)}
        self._cache: dict[str, int] = {}

    def _count(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks, self.merges))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(lengths)), lengths)
        keep = flat != ""
        flat, doc = flat[keep], doc[keep]
        uniq, inv = np.unique(flat, return_inverse=True)
        per_word = np.fromiter((self._count(w) for w in uniq),
                               dtype=np.int64, count=len(uniq))
        n_tokens = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(n_tokens, doc, per_word[inv])
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "n_tokens": pa.array(n_tokens),
        })


def tokenize_bpe(ds: "ray.data.Dataset", id_col: str = "doc_id",
                 text_col: str = "text",
                 merges_path: str = DEFAULT_MERGES,
                 concurrency: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """-> (id, n_tokens) via the BPE actor pool."""
    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        BPETokenize, fn_constructor_kwargs={
            "id_col": id_col, "text_col": text_col,
            "merges_path": merges_path},
        batch_format="pyarrow", **kwargs)


def tokenize_bpe_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return tokenize_bpe(ds, concurrency=2)


# --- SQL replay ------------------------------------------------------------------

_BPE_STEP = """
e{k} AS MATERIALIZED (
  SELECT w, unnest(generate_series(1, len(syms))) AS pos,
         unnest(syms) AS sym
  FROM s{j}
),
p{k} AS MATERIALIZED (
  SELECT e.w, e.pos, m.rank
  FROM e{k} e JOIN e{k} e2 ON e2.w = e.w AND e2.pos = e.pos + 1
  JOIN bpe_merges m ON m.p1 = e.sym AND m.p2 = e2.sym
),
b{k} AS MATERIALIZED (SELECT w, min(rank) AS rank FROM p{k} GROUP BY w),
m0{k} AS MATERIALIZED (
  SELECT p.w, p.pos,
         p.pos - row_number() OVER (PARTITION BY p.w ORDER BY p.pos)
           AS grp
  FROM p{k} p JOIN b{k} b ON b.w = p.w AND p.rank = b.rank
),
r{k} AS MATERIALIZED (
  SELECT w, pos FROM (
    SELECT w, pos, pos - min(pos) OVER (PARTITION BY w, grp) AS off
    FROM m0{k})
  WHERE off % 2 = 0
),
s{k} AS MATERIALIZED (
  SELECT e.w,
         list(CASE WHEN r.pos IS NOT NULL THEN e.sym || e2.sym
                   ELSE e.sym END ORDER BY e.pos) AS syms
  FROM e{k} e
  LEFT JOIN r{k} r ON r.w = e.w AND r.pos = e.pos
  LEFT JOIN r{k} r2 ON r2.w = e.w AND r2.pos = e.pos - 1
  LEFT JOIN e{k} e2 ON e2.w = e.w AND e2.pos = e.pos + 1
  WHERE r2.pos IS NULL
  GROUP BY e.w
)"""


def bpe_count_ctes(merges_path: str = DEFAULT_MERGES,
                   steps: int = 11) -> str:
    """CTE chain ending in ``bpe_tok(doc_id, w)`` and ``bpe_cnt(w, n)``
    — shared by the tokenize and BPE-pack oracles. ``steps`` bounds the
    per-word merge iterations (exact for words of <= steps+1 chars)."""
    merges = load_merges(merges_path)
    vals = ", ".join(f"('{a}','{b}',{r})"
                     for r, (a, b) in enumerate(merges))
    parts = [f"""bpe_merges(p1, p2, rank) AS MATERIALIZED (
  SELECT * FROM (VALUES {vals})),
bpe_tok0 AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
  FROM documents
),
bpe_tok AS MATERIALIZED (SELECT doc_id, w FROM bpe_tok0 WHERE w <> ''),
w0 AS (SELECT DISTINCT w FROM bpe_tok),
s0 AS MATERIALIZED (
  SELECT w, list_transform(range(1, len(w)+1),
                           i -> substr(w, CAST(i AS INT), 1)) AS syms
  FROM w0
)"""]
    for k in range(1, steps + 1):
        parts.append(_BPE_STEP.format(k=k, j=k - 1))
    parts.append(f"bpe_cnt AS (SELECT w, len(syms) AS n FROM s{steps})")
    return ",".join(parts)


def tokenize_bpe_oracle_sql(steps: int = 11) -> str:
    return f"""
WITH {bpe_count_ctes(steps=steps)}
SELECT d.doc_id,
       CAST(COALESCE(x.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d
LEFT JOIN (
  SELECT t.doc_id, SUM(c.n) AS n_tokens
  FROM bpe_tok t JOIN bpe_cnt c USING (w) GROUP BY t.doc_id) x
USING (doc_id)
ORDER BY doc_id
"""


def pack_bpe_query(sf_dir: str, seq_len: int = 512):
    """Sequence packing driven by REAL BPE token counts instead of the
    whitespace proxy: tokenize_bpe feeds pack_sequences' counts slot."""
    from rdf_mapper_ray.ops.packing import pack_sequences
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    counts = tokenize_bpe(ds, concurrency=2) \
        .map_batches(lambda t: t.rename_columns(["doc_id", "n"]),
                     batch_format="pyarrow")
    return pack_sequences(ds, seq_len=seq_len, counts=counts)


def pack_bpe_oracle_sql(seq_len: int = 512, steps: int = 11) -> str:
    return f"""
WITH {bpe_count_ctes(steps=steps)},
t AS (
  SELECT d.doc_id, CAST(COALESCE(x.n, 0) AS BIGINT) AS n
  FROM documents d
  LEFT JOIN (
    SELECT t.doc_id, SUM(c.n) AS n
    FROM bpe_tok t JOIN bpe_cnt c USING (w) GROUP BY t.doc_id) x
  USING (doc_id)
), c AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS begin_tok
  FROM t
)
SELECT doc_id, begin_tok,
       UNNEST(generate_series(begin_tok // {seq_len},
                              (begin_tok + n - 1) // {seq_len}))
         AS chunk_id
FROM c
WHERE n > 0
ORDER BY doc_id, chunk_id
"""


# --- distributed BPE vocabulary TRAINING -------------------------------------------


def _word_counts(ds: "ray.data.Dataset", text_col: str,
                 num_partitions: int) -> "ray.data.Dataset":
    """(word, cnt) over lowercased whitespace words — routed in-task
    merge (word-cardinality group counts degrade Ray's
    sort-aggregate)."""
    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(col, "")), r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.Table.from_pydict({
            "word": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64())})

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column("word").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["cnt"].sum()

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas")


def bpe_train(ds: "ray.data.Dataset", text_col: str = "text",
              n_merges: int = 20,
              num_partitions: int | None = None
              ) -> tuple[list[tuple[str, str]], "ray.data.Dataset"]:
    """Distributed BPE vocabulary TRAINING (Sennrich et al. 2016,
    word-level): learn ``n_merges`` merge rules from the corpus. The
    companion of :func:`tokenize_bpe` — the returned merges feed its
    encoder directly (same (p1, p2) priority-list format), so
    train → tokenize composes end-to-end.

    Determinism contract: the merge each round is the pair with the
    HIGHEST total count, ties broken by (p1, p2) ascending — the rule
    the pure-Python reference in tests replays.

    Scale shape: the corpus reduces ONCE to the distributed
    (word, cnt, syms) vocabulary table (web-scale word vocabularies
    are ~1e8 rows — table-sized, never driver-sized), which then
    carries every round: per-batch weighted pair counts shrink
    map-side, route by hash(pair) for in-task final sums, each task
    emits its top-1 candidate and only P rows reach the driver's
    argmax; the winning pair broadcasts back into a 1:1 merge map.
    Each round is one vocab-sized exchange — the corpus is never
    re-read. Per-round work is O(vocab), per-word Python (words are
    short; the vocab table is the working set, not the corpus)."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    words = _word_counts(ds, text_col, num_partitions)

    def init_syms(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cnt": g["cnt"].to_numpy(np.int64),
            "syms": [list(w) for w in g["word"]]})

    vocab = words.map_batches(init_syms, batch_format="pandas") \
        .materialize()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter
            c: Counter = Counter()
            for syms, cnt in zip(g["syms"], g["cnt"]):
                for i in range(len(syms) - 1):
                    c[(syms[i], syms[i + 1])] += int(cnt)
            if not c:
                return pd.DataFrame({"p1": [], "p2": [], "c": []})
            p1, p2 = zip(*c.keys())
            return pd.DataFrame({
                "p1": list(p1), "p2": list(p2),
                "c": np.fromiter(c.values(), np.int64, len(c))})

        def pair_route(t: pa.Table) -> pa.Table:
            h = (pd.util.hash_pandas_object(
                     t.column("p1").to_pandas(), index=False)
                 .to_numpy()
                 ^ pd.util.hash_pandas_object(
                     t.column("p2").to_pandas(), index=False)
                 .to_numpy())
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))

        def task_top1(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["p1", "p2"], as_index=False)["c"].sum()
            s = s.sort_values(["c", "p1", "p2"],
                              ascending=[False, True, True],
                              kind="stable")
            return s.head(1)

        cands = vocab.map_batches(pair_partial, batch_format="pandas") \
            .map_batches(pair_route, batch_format="pyarrow") \
            .groupby("pid").map_groups(task_top1,
                                       batch_format="pandas") \
            .to_pandas()
        if cands.empty:
            break
        cands = cands.sort_values(["c", "p1", "p2"],
                                  ascending=[False, True, True],
                                  kind="stable")
        best = (str(cands.iloc[0]["p1"]), str(cands.iloc[0]["p2"]))
        merges.append(best)
        ref = ray.put(best)

        def apply_merge(g: pd.DataFrame) -> pd.DataFrame:
            a, b = ray.get(ref)
            ab = a + b
            out = []
            for syms in g["syms"]:
                syms = list(syms)
                i, n = 0, len(syms)
                w = []
                while i < n:
                    if (i + 1 < n and syms[i] == a
                            and syms[i + 1] == b):
                        w.append(ab)
                        i += 2
                    else:
                        w.append(syms[i])
                        i += 1
                out.append(w)
            return pd.DataFrame({"cnt": g["cnt"].to_numpy(np.int64),
                                 "syms": out})

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pandas").materialize()

    return merges, vocab


def bpe_train_reference(texts: list[str], n_merges: int = 20
                        ) -> list[tuple[str, str]]:
    """Pure-Python single-process BPE trainer — the test oracle for
    :func:`bpe_train` (identical count/tie contract)."""
    from collections import Counter
    wc: Counter = Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wc[w]
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


# --- BPE training as a query (learned merge table + SQL replay) -----------------------

_BPE_TRAIN_STEP = """e{k} AS MATERIALIZED (
  SELECT w, unnest(generate_series(1, len(syms))) AS pos,
         unnest(syms) AS sym
  FROM t_s{j}
),
pc{k} AS MATERIALIZED (
  SELECT e.sym AS p1, e2.sym AS p2, SUM(wc.cnt) AS c
  FROM e{k} e JOIN e{k} e2 ON e2.w = e.w AND e2.pos = e.pos + 1
  JOIN t_wc wc ON wc.w = e.w
  GROUP BY 1, 2
),
best{k} AS MATERIALIZED (
  SELECT p1, p2 FROM pc{k}
  ORDER BY c DESC, p1, p2 LIMIT 1
),
p{k} AS MATERIALIZED (
  SELECT e.w, e.pos
  FROM e{k} e JOIN e{k} e2 ON e2.w = e.w AND e2.pos = e.pos + 1
  JOIN best{k} b ON b.p1 = e.sym AND b.p2 = e2.sym
),
m0{k} AS MATERIALIZED (
  SELECT p.w, p.pos,
         p.pos - row_number() OVER (PARTITION BY p.w ORDER BY p.pos)
           AS grp
  FROM p{k} p
),
r{k} AS MATERIALIZED (
  SELECT w, pos FROM (
    SELECT w, pos, pos - min(pos) OVER (PARTITION BY w, grp) AS off
    FROM m0{k})
  WHERE off % 2 = 0
),
t_s{k} AS MATERIALIZED (
  SELECT e.w,
         list(CASE WHEN r.pos IS NOT NULL THEN e.sym || e2.sym
                   ELSE e.sym END ORDER BY e.pos) AS syms
  FROM e{k} e
  LEFT JOIN r{k} r ON r.w = e.w AND r.pos = e.pos
  LEFT JOIN r{k} r2 ON r2.w = e.w AND r2.pos = e.pos - 1
  LEFT JOIN e{k} e2 ON e2.w = e.w AND e2.pos = e.pos + 1
  WHERE r2.pos IS NULL
  GROUP BY e.w
)"""


def bpe_learn_query(sf_dir: str, n_merges: int = 8):
    """The learned merge table (rank, p1, p2) of :func:`bpe_train`
    over the documents corpus — train → tokenize composes; this query
    exposes the training half with a full SQL replay."""
    ds = read_table(sf_dir, "documents", columns=["text"])
    merges, _ = bpe_train(ds, n_merges=n_merges)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "p1": pa.array([a for a, _ in merges], pa.string()),
        "p2": pa.array([b for _, b in merges], pa.string())}))


def bpe_learn_oracle_sql(n_merges: int = 8) -> str:
    """Unrolled training replay: per round — weighted adjacent pair
    counts over the current symbolization, argmax merge
    (c DESC, p1, p2), run-parity non-overlapping application (the
    tokenize-oracle machinery with the fixed merge list swapped for
    the per-round winner)."""
    parts = ["""t_tok AS MATERIALIZED (
  SELECT unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                '\\s+')) AS w
  FROM documents
),
t_wc AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM t_tok
  WHERE w <> '' GROUP BY w
),
t_s0 AS MATERIALIZED (
  SELECT w, list_transform(range(1, len(w)+1),
                           i -> substr(w, CAST(i AS INT), 1)) AS syms
  FROM t_wc
)"""]
    for k in range(1, n_merges + 1):
        parts.append(_BPE_TRAIN_STEP.format(k=k, j=k - 1))
    sel = " UNION ALL ".join(
        f"SELECT {k - 1} AS rank, p1, p2 FROM best{k}"
        for k in range(1, n_merges + 1))
    return ("WITH " + ",".join(parts)
            + f"\nSELECT CAST(rank AS BIGINT) AS rank, p1, p2"
              f" FROM ({sel}) ORDER BY rank")


# --- tokenizer fertility per language -----------------------------------------------------


def bpe_fertility(docs: "ray.data.Dataset",
                  merges_path: str = DEFAULT_MERGES,
                  concurrency: Optional[int] = None
                  ) -> "ray.data.Dataset":
    """Tokenizer fertility per language — BPE tokens emitted per
    whitespace word, the standard multilingual-tokenizer health
    metric (a fertility of 2–3× on one language means its training
    share is undercounted by the same factor). Words are whitespace
    tokens (the readability convention, counted non-empty); the
    ratio is the trunc-div milli ``1000·Σtokens // Σwords``.
    -> (lang, n_docs, sum_tokens, sum_words, fert_milli).

    Shape: ONE actor-pool pass computes per-doc token AND word
    counts (the BPE merge table loads once per actor), per-batch
    (lang, sums) partials follow, and the language-bounded cells
    finish driver-side — zero exchanges."""
    import re as _re

    ws = _re.compile(r"\s+")

    class TokWords(BPETokenize):
        def __init__(self, **kw):
            super().__init__(**kw)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(
                batch.select([self.id_col, self.text_col]))
            col = batch.column(self.text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            texts = pc.fill_null(col, "").to_pylist()
            words = np.fromiter(
                (sum(1 for w in ws.split(t) if w) for t in texts),
                dtype=np.int64, count=len(texts))
            return out.append_column(
                "n_words", pa.array(words)).append_column(
                "lang", batch.column("lang"))

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    per_doc = docs.map_batches(
        TokWords, fn_constructor_kwargs={
            "id_col": "doc_id", "text_col": "text",
            "merges_path": merges_path},
        batch_format="pyarrow", **kwargs)

    def partial(t: pa.Table) -> pa.Table:
        return t.select(["lang", "n_tokens", "n_words"]) \
            .group_by(["lang"], use_threads=False).aggregate(
            [("n_tokens", "sum"), ("n_words", "sum"),
             ([], "count_all")])

    cells = pd.concat(
        b.to_pandas() for b in per_doc.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("lang", as_index=False).agg(
        sum_tokens=("n_tokens_sum", "sum"),
        sum_words=("n_words_sum", "sum"),
        n_docs=("count_all", "sum")).sort_values("lang")
    tok = cells["sum_tokens"].to_numpy(np.int64)
    wrd = cells["sum_words"].to_numpy(np.int64)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "lang": pa.array(cells["lang"], pa.string()),
        "n_docs": pa.array(cells["n_docs"].to_numpy(np.int64)),
        "sum_tokens": pa.array(tok),
        "sum_words": pa.array(wrd),
        "fert_milli": pa.array(1000 * tok // np.maximum(wrd, 1))}))


def bpe_fertility_query(sf_dir: str):
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"])
    return bpe_fertility(docs, concurrency=2)


def bpe_fertility_oracle_sql(steps: int = 11) -> str:
    return f"""
WITH {bpe_count_ctes(steps=steps)},
tok AS (
  SELECT t.doc_id, SUM(c.n) AS n_tokens
  FROM bpe_tok t JOIN bpe_cnt c USING (w) GROUP BY t.doc_id
),
w AS (
  SELECT doc_id, lang,
         (SELECT COUNT(*) FROM unnest(string_split_regex(
              lower(coalesce(text, '')), '\\s+')) AS u(x)
          WHERE x <> '') AS n_words
  FROM documents
),
cells AS (
  SELECT w.lang, COUNT(*) AS n_docs,
         SUM(COALESCE(tok.n_tokens, 0)) AS sum_tokens,
         SUM(w.n_words) AS sum_words
  FROM w LEFT JOIN tok USING (doc_id)
  GROUP BY w.lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(sum_tokens AS BIGINT) AS sum_tokens,
       CAST(sum_words AS BIGINT) AS sum_words,
       CAST(1000 * sum_tokens // GREATEST(sum_words, 1) AS BIGINT)
         AS fert_milli
FROM cells ORDER BY lang
"""
