"""Text-analysis operators: stats/quality, token counting, language ID,
document fingerprinting.

All stages are vectorised ``map_batches`` transforms — pyarrow.compute
regex kernels where possible — so they stream at Arrow speed; language
ID is an actor-pool stage whose n-gram profiles are built once per actor.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.readers import read_table


# BPE-ish pre-tokenizer: the GPT-2 pattern with its RE2-incompatible
# trailing-space lookahead dropped — contractions, unicode letter runs,
# digit runs, punctuation runs, whitespace runs. RE2 in both pyarrow and
# DuckDB (leftmost-first alternation), so counts agree bit-exactly.
BPE_TOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                r"| ?[^\s\p{L}\p{N}]+|\s+")


class TextStats:
    """doc -> (id, n_chars, n_tokens, n_alpha, n_bpe_tokens) —
    integer-only outputs so the DuckDB oracle matches bit-exactly.
    ``n_bpe_tokens`` counts GPT-2-style pre-tokenizer pieces (the
    cheap length-in-tokens estimate a data pipeline budgets by)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(text, r"\S+"), pa.int64()),
            "n_alpha": pc.cast(
                pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()),
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64()),
        })


def text_stats(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(TextStats(text_col, id_col), batch_format="pyarrow")


TEXT_STATS_ORACLE_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE.replace("'", "''")}'))
         AS n_bpe_tokens
FROM documents
ORDER BY doc_id
"""


class RepetitionSignals:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1), integer-only so the
    DuckDB oracle is bit-exact:

    - ``n_lines`` / ``n_dup_lines``: newline-split lines, dups =
      occurrences beyond each line's first (n_lines - n_distinct).
    - ``n_2grams`` / ``top_2gram_count``: word-bigram total and the
      count of the most frequent bigram (the "top n-gram fraction"
      numerator/denominator, left unratioed to stay integer-exact).

    Vectorized: one pandas explode + groupby per batch over all docs'
    bigrams at once — no Python loop per document.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        # --- lines ---
        line_lists = [(t or "").split("\n") for t in texts]
        ldoc = np.repeat(np.arange(n), [len(x) for x in line_lists])
        lf = pd.DataFrame({"d": ldoc,
                           "ln": [s for x in line_lists for s in x]})
        lstats = lf.groupby("d")["ln"].agg(["count", "nunique"])
        n_lines = np.zeros(n, dtype=np.int64)
        n_dup = np.zeros(n, dtype=np.int64)
        n_lines[lstats.index] = lstats["count"]
        n_dup[lstats.index] = lstats["count"] - lstats["nunique"]
        # --- word bigrams ---
        word_lists = [(t or "").split() for t in texts]
        wdoc = np.repeat(np.arange(n), [max(len(x) - 1, 0)
                                        for x in word_lists])
        bgs = [f"{x[i]} {x[i + 1]}" for x in word_lists
               for i in range(len(x) - 1)]
        n_2g = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)
        if bgs:
            bf = pd.DataFrame({"d": wdoc, "bg": bgs})
            cnt = bf.groupby(["d", "bg"]).size()
            per_doc = cnt.groupby(level=0).agg(["sum", "max"])
            n_2g[per_doc.index] = per_doc["sum"]
            top[per_doc.index] = per_doc["max"]
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "n_lines": pa.array(n_lines),
            "n_dup_lines": pa.array(n_dup),
            "n_2grams": pa.array(n_2g),
            "top_2gram_count": pa.array(top),
        })


def repetition_signals(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(RepetitionSignals(text_col, id_col),
                          batch_format="pyarrow")


def repetition_query(sf_dir: str):
    import ray.data
    return repetition_signals(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


REPETITION_ORACLE_SQL = r"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), chr(10))) AS ln
  FROM documents
),
lstats AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) - count(DISTINCT ln) AS n_dup_lines
  FROM lines GROUP BY doc_id
),
words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)), '\s+') AS w
  FROM documents
),
bgs AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS bg
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
  WHERE len(w) >= 2
),
bcnt AS (SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY doc_id, bg),
bstats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
         CAST(max(c) AS BIGINT) AS top_2gram_count
  FROM bcnt GROUP BY doc_id
)
SELECT d.doc_id, l.n_lines, l.n_dup_lines,
       COALESCE(b.n_2grams, 0) AS n_2grams,
       COALESCE(b.top_2gram_count, 0) AS top_2gram_count
FROM documents d
JOIN lstats l USING (doc_id)
LEFT JOIN bstats b USING (doc_id)
ORDER BY d.doc_id
"""


class QualityScore:
    """Heuristic quality signals (int/bool columns; ratio thresholds are
    encoded as integer comparisons so the SQL oracle is exact).

    is_quality := 10 <= n_tokens AND mean token length in [3, 12]
    (both sides integer arithmetic: 3*n_tokens <= n_alnum_chars etc.)
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        # characters inside tokens = total chars minus whitespace chars
        n_ws = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
        n_tok_chars = pc.subtract(
            pc.cast(pc.utf8_length(text), pa.int64()), n_ws)
        long_enough = pc.greater_equal(n_tokens, 10)
        mean_ge_3 = pc.greater_equal(n_tok_chars,
                                     pc.multiply(n_tokens, 3))
        mean_le_12 = pc.less_equal(n_tok_chars,
                                   pc.multiply(n_tokens, 12))
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "n_tokens": n_tokens,
            "n_token_chars": n_tok_chars,
            "is_quality": pc.and_(pc.and_(long_enough, mean_ge_3),
                                  mean_le_12),
        })


def quality_score(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(QualityScore(text_col, id_col),
                          batch_format="pyarrow")


QUALITY_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+')) AS n_tokens,
         length(text) - len(regexp_extract_all(text, '\\s')) AS n_token_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_token_chars,
       (n_tokens >= 10 AND n_token_chars >= 3 * n_tokens
        AND n_token_chars <= 12 * n_tokens) AS is_quality
FROM t
ORDER BY doc_id
"""


# --- language ID -------------------------------------------------------------

# Tiny deterministic character-trigram profiles per language; built from
# each language's stopword-ish marker words. Public-knowledge heuristic
# (cf. Cavnar & Trenkle n-gram text categorization).
_LANG_MARKERS = {
    "en": "the and of to in is that it for was with as his on be at by",
    "de": "der die und in den von zu das mit sich des auf ist im nicht ein",
    "fr": "le la et les des en un du une que est pour qui dans par sur",
    "es": "de la que el en y los del se las por un para con una su al",
    "zh": "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以",
}


def _profile(words: str) -> Counter:
    c: Counter = Counter()
    for w in words.split():
        padded = f" {w} "
        for i in range(len(padded) - 2):
            c[padded[i:i + 3]] += 1
    return c


class LangID:
    """Actor-pool stage: n-gram-overlap language guess per document.

    Profiles compile once per actor (``__init__``); scoring is a
    Counter-intersection per document — cheap relative to I/O.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = {lang: _profile(words)
                         for lang, words in _LANG_MARKERS.items()}

    def classify(self, text: str) -> str:
        grams = _profile(" ".join(text.split()[:200]))
        best, best_score = "unknown", 0.0
        for lang, prof in self.profiles.items():
            inter = sum(min(n, grams.get(g, 0)) for g, n in prof.items())
            if inter > best_score:
                best, best_score = lang, inter
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t or "")
                 for t in batch.column(self.text_col).to_pylist()]
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "predicted_lang": pa.array(preds, type=pa.string()),
        })


def lang_id(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(LangID(text_col, id_col), batch_format="pyarrow",
                          concurrency=None)


def _lang_id_oracle_sql() -> str:
    """Bit-exact SQL replay of ``LangID.classify``: both the doc and
    the marker profiles are re-derived in SQL with the same
    space-padded-word trigram counting, score = Σ min(profile n, doc n)
    over profile grams, and the winner reproduces the Python loop's
    tie behavior (first dict-order lang with a strictly greater score;
    'unknown' when every score is 0)."""
    markers = ", ".join(
        f"('{lang}', {i}, '{words}')"
        for i, (lang, words) in enumerate(_LANG_MARKERS.items()))
    ws = "' ' || chr(9) || chr(10) || chr(13)"
    return f"""
WITH docwords AS (
  SELECT doc_id,
         unnest(list_slice(
           regexp_split_to_array(trim(COALESCE(text, ''), {ws}), '\\s+'),
           1, 200)) AS w
  FROM documents
),
docgrams AS (
  SELECT doc_id, substr(' ' || w || ' ', i, 3) AS g,
         count(*) AS n
  FROM docwords,
       LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i) t
  GROUP BY doc_id, g
),
markers AS (SELECT * FROM (VALUES {markers}) AS m(lang, ord, ws)),
mwords AS (
  SELECT lang, ord, unnest(string_split(ws, ' ')) AS w FROM markers
),
profgrams AS (
  SELECT lang, ord, substr(' ' || w || ' ', i, 3) AS g,
         count(*) AS pn
  FROM mwords,
       LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i) t
  GROUP BY lang, ord, g
),
scores AS (
  SELECT d.doc_id, pg.lang, pg.ord,
         SUM(LEAST(pg.pn, COALESCE(dg.n, 0))) AS score
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN profgrams pg
  LEFT JOIN docgrams dg ON dg.doc_id = d.doc_id AND dg.g = pg.g
  GROUP BY d.doc_id, pg.lang, pg.ord
),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, ord) AS rn
  FROM scores
)
SELECT doc_id,
       CASE WHEN score > 0 THEN lang ELSE 'unknown' END AS predicted_lang
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


LANG_ID_ORACLE_SQL = _lang_id_oracle_sql()


# --- fingerprinting ----------------------------------------------------------

class Fingerprint:
    """Winnowing-style document fingerprint: the minimum 64-bit hash
    over k-word windows per document plus a sha256 of the whole text.
    Window hashing is batched — ONE vectorized pandas hash over every
    window string in the batch, per-doc mins via ``minimum.reduceat`` —
    no per-window Python hashing. Deterministic; fast doc identity at
    scale."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 8, hash_fn: str = "pandas") -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.window = window
        self.hash_fn = hash_fn

    def _min_hashes(self, texts: list) -> "np.ndarray":
        import numpy as np
        import pandas as pd
        windows_per_doc = []
        for t in texts:
            words = (t or "").split()
            if not words:
                windows_per_doc.append([])
                continue
            k = min(self.window, len(words))
            windows_per_doc.append(
                [" ".join(words[i:i + k])
                 for i in range(len(words) - k + 1)])
        lens = [len(w) for w in windows_per_doc]
        flat = [w for ws in windows_per_doc for w in ws]
        out = np.zeros(len(texts), dtype=np.uint64)
        if not flat:
            return out
        from rdf_mapper_ray.ops.hashing import hash64
        h = hash64(flat, self.hash_fn)
        nonempty = [i for i, n in enumerate(lens) if n]
        offsets = np.concatenate(
            [[0], np.cumsum([lens[i] for i in nonempty])[:-1]]) \
            .astype(np.int64)
        mins = np.minimum.reduceat(h, offsets)
        out[nonempty] = mins
        return out

    def fingerprint(self, text: str) -> tuple[int, str]:
        sha = hashlib.sha256(text.encode()).hexdigest()
        return int(self._min_hashes([text])[0]), sha

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = self._min_hashes(texts)
        shas = [hashlib.sha256((t or "").encode()).hexdigest()
                for t in texts]
        return pa.Table.from_pydict({
            self.id_col: batch.column(self.id_col),
            "min_fingerprint": pa.array(fps, type=pa.uint64()),
            "text_sha256": pa.array(shas, type=pa.string()),
        })


def fingerprints(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id",
                 hash_fn: str = "pandas") -> "ray.data.Dataset":
    return ds.map_batches(Fingerprint(text_col, id_col, hash_fn=hash_fn),
                          batch_format="pyarrow")


# bit-exact DuckDB equivalent of fingerprints(..., hash_fn="md5"):
# k = min(8, n_words) word windows, min of the md5-based 64-bit window
# hash per doc (0 for empty docs), plus sha256 of the raw text
FINGERPRINT_ORACLE_SQL = r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
), nn AS (
  SELECT doc_id, t, ws, len(ws) AS n, least(8, len(ws)) AS k FROM base
), idx AS (
  SELECT doc_id, unnest(generate_series(1, n - k + 1)) AS i
  FROM nn WHERE n > 0
), wins AS (
  SELECT idx.doc_id,
         array_to_string(nn.ws[idx.i:idx.i + nn.k - 1], ' ') AS win
  FROM idx JOIN nn USING (doc_id)
), mins AS (
  SELECT doc_id,
         MIN(('0x' || substr(md5(win), 1, 16))::UBIGINT) AS mfp
  FROM wins GROUP BY doc_id
)
SELECT d.doc_id, coalesce(m.mfp, 0)::UBIGINT AS min_fingerprint,
       sha256(coalesce(d.text, '')) AS text_sha256
FROM documents d LEFT JOIN mins m USING (doc_id)
ORDER BY d.doc_id
"""


# --- normalization + intra-doc line dedup ---------------------------------------

def normalize_text(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Canonical text normalization: unicode NFC, lowercase, whitespace
    runs collapsed to single spaces, ends trimmed — the first stage of
    any dedup/tokenize pipeline (two byte-different strings that render
    identically must hash identically). Three Arrow kernels per batch,
    map-only, zero shuffle. Output: (id, norm_text, changed)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(pc.fill_null(batch.column(text_col), ""),
                       pa.string())
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_normalize(text, form="NFC")),
            r"\s+", " "))
        return pa.table({
            id_col: batch.column(id_col),
            "norm_text": norm,
            "changed": pc.not_equal(norm, text),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text_query(sf_dir: str):
    import ray.data as rd
    return normalize_text(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


NORMALIZE_TEXT_ORACLE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                           '\s+', ' ', 'g')) AS norm_text,
       trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                           '\s+', ' ', 'g')) <> COALESCE(text, '')
         AS changed
FROM documents ORDER BY doc_id
"""


def dedup_lines_within(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id",
                       sep: str = "\n") -> "ray.data.Dataset":
    """Remove repeated lines WITHIN each document, keeping each line's
    first occurrence (CCNet does this before any cross-doc pass;
    cross-corpus paragraph dedup is ops/paragraphs.py). Map-only and
    fully vectorized: one split, one stable lexsort to find per-doc
    duplicate line hashes, offsets rebuilt zero-copy. Output:
    (id, clean_text, n_kept, n_dropped)."""
    import numpy as np

    from rdf_mapper_ray.ops.hashing import hash64

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(pc.fill_null(batch.column(text_col), ""),
                       pa.large_string())
        lists = pc.split_pattern(text, sep)
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        n = batch.num_rows
        total = int(lens.sum())
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64)
        h = hash64(flat.to_pylist(), "pandas").view(np.int64)
        # first occurrence per (doc, line-hash): stable sort by
        # (doc, hash, pos); keep rows where the (doc, hash) key changes
        order = np.lexsort((pos, h, doc_idx))
        d_s, h_s = doc_idx[order], h[order]
        first_in_key = np.r_[True, (d_s[1:] != d_s[:-1])
                             | (h_s[1:] != h_s[:-1])]
        keep = np.zeros(total, dtype=bool)
        keep[order[first_in_key]] = True
        csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        ends = np.cumsum(lens)
        starts = ends - lens
        kept_per_doc = csum[ends] - csum[starts]
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_flat = pc.filter(flat, pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        rebuilt = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept_flat)
        clean = pc.binary_join(rebuilt,
                               pa.scalar(sep, type=pa.large_string()))
        return pa.table({
            id_col: batch.column(id_col),
            "clean_text": pc.cast(clean, pa.string()),
            "n_kept": pa.array(kept_per_doc, type=pa.int64()),
            "n_dropped": pa.array(lens - kept_per_doc, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_lines_within_query(sf_dir: str):
    """The word-soup docs are single-line; split on spaces instead so
    the demo actually exercises intra-doc duplicate removal (docs DO
    repeat words) — mirrored exactly in the SQL."""
    import ray.data as rd
    return dedup_lines_within(
        read_table(sf_dir, "documents",
                        columns=["doc_id", "text"]), sep=" ")


DEDUP_LINES_WITHIN_ORACLE_SQL = """
WITH lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(COALESCE(text, ''), ' '), 1)
           AS pos,
         unnest(string_split(COALESCE(text, ''), ' ')) AS line
  FROM documents
),
ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
  FROM lines
)
SELECT doc_id,
       COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                '') AS clean_text,
       COUNT(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
       COUNT(*) FILTER (WHERE rn > 1)::BIGINT AS n_dropped
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def lm_score(ds: "ray.data.Dataset", text_col: str = "text",
             id_col: str = "doc_id", min_count: int = 3
             ) -> "ray.data.Dataset":
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    a unigram LM is estimated from the corpus itself and every document
    gets (n_tokens, n_oov, nll_milli) — the negative log-likelihood of
    its in-vocabulary tokens in MILLI-NATS, an exact integer, so any
    summation order gives identical results and the SQL oracle matches
    value-for-value (per-type log-probs quantize to floor(ln·1000+0.5);
    a sub-ulp libm difference only matters within 1e-13 of a quantile
    boundary — negligible, and deterministic per dataset). Tokens with
    corpus count < ``min_count`` are OOV and excluded from the NLL.

    Scale shape: the LM is one map-side-combined token-count groupby
    (vocab-sized, never corpus-sized) broadcast once via ray.put; the
    scoring pass is a vectorized pandas-map lookup + one bincount per
    batch. Past broadcast scale the documented venue is a hash(token)
    co-partition join like tfidf's df join."""
    import ray

    from rdf_mapper_ray.ops.topk import _batch_token_counts

    counts = ds.map_batches(
        lambda b: _batch_token_counts(b, text_col),
        batch_format="pyarrow").groupby("token").sum("cnt").to_pandas()
    c = counts.iloc[:, 1].to_numpy(dtype=np.int64)
    total = int(c.sum())
    ql = np.floor(np.log(c / float(total)) * 1000.0 + 0.5) \
        .astype(np.int64)
    lm = pd.DataFrame({"tok": counts.iloc[:, 0].to_numpy(),
                       "c": c, "ql": ql}).set_index("tok")
    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(lm_ref)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, r"\s+")
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc = np.repeat(np.arange(len(lengths)), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = pd.Series(flat.filter(pa.array(keep)).to_pandas())
        doc = doc[keep]
        cc = toks.map(m["c"]).to_numpy(dtype=np.int64)
        qq = toks.map(m["ql"]).to_numpy(dtype=np.int64)
        oov = cc < min_count
        n_docs = batch.num_rows
        return pa.Table.from_pydict({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(np.bincount(doc, minlength=n_docs)
                                 .astype(np.int64)),
            "n_oov": pa.array(np.bincount(doc, weights=oov,
                                          minlength=n_docs)
                              .astype(np.int64)),
            "nll_milli": pa.array(np.bincount(doc,
                                              weights=np.where(oov, 0,
                                                               -qq),
                                              minlength=n_docs)
                                  .astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def lm_score_query(sf_dir: str):
    ds = read_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return lm_score(ds)


def lm_score_oracle_sql(min_count: int = 3) -> str:
    return f"""
WITH tk AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                        '\\s+')) AS tok
    FROM documents) WHERE tok <> ''
),
cnt AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
tot AS (SELECT SUM(c) AS n FROM cnt),
q AS (
  SELECT tok, c,
         CAST(floor(ln(CAST(c AS DOUBLE) / n) * 1000 + 0.5) AS BIGINT)
           AS ql
  FROM cnt, tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN q.c < {min_count} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN q.c >= {min_count} THEN -q.ql ELSE 0 END)
            AS BIGINT) AS nll_milli
FROM tk JOIN q USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


# --- regex extraction table ------------------------------------------------------

def regex_extract(ds: "ray.data.Dataset", pattern: str,
                  id_col: str = "doc_id", text_col: str = "text"
                  ) -> "ray.data.Dataset":
    """Flat-map every match of ``pattern`` to its own row (bag
    semantics, document order within a doc) — SQL's
    ``unnest(regexp_extract_all(...))``. Map-only: the regex compiles
    once per task (closure), matches via pandas' C findall loop, and
    the id column repeats by match count — no shuffle, no Python
    per-row loop. -> (id, match)."""
    rx = re.compile(pattern)

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        found = s.str.findall(rx)
        counts = found.str.len().to_numpy()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .repeat(counts)
        flat = [m for lst in found for m in lst]
        return pa.Table.from_pydict({
            id_col: pa.array(ids),
            "match": pa.array(flat, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# words with an inner double letter — non-degenerate on the synthetic
# word-soup corpus (batch, small, ...) yet selective
REGEX_EXTRACT_PATTERN = r"\b\w*(?:tt|ll|gg)\w*\b"


def regex_extract_query(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return regex_extract(ds, REGEX_EXTRACT_PATTERN)


# DuckDB string literals don't process backslashes, so the raw
# pattern drops straight in; RE2 and Python `re` agree on \b/\w over
# this ASCII corpus (leftmost non-overlapping scan both sides)
REGEX_EXTRACT_ORACLE_SQL = f"""
SELECT doc_id,
       unnest(regexp_extract_all(text, '{REGEX_EXTRACT_PATTERN}'))
         AS match
FROM documents
ORDER BY doc_id
"""


# --- lexical diversity (type-token ratio) --------------------------------------------


def lexical_diversity(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document type-token ratio (lexical-diversity quality
    signal: template spam and keyword stuffing crater it): lowercased
    whitespace tokens, ``ttr_milli = 1000·n_types // n_tokens``
    (pure-integer floor; 0-token docs report -1). Map-only, zero
    exchanges; the per-batch kernel is one pandas explode + TWO
    groupby-nunique/size passes over all docs at once — no Python
    loop per document. -> (doc_id, n_tokens, n_types, ttr_milli)."""

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas()
        toks = batch.column(text_col).to_pandas().fillna("") \
            .str.lower().str.split()
        n_tok = toks.str.len().to_numpy(np.int64)
        ex = pd.DataFrame({
            "d": ids.repeat(n_tok).to_numpy(),
            "t": np.concatenate(
                [np.array(t, dtype=object) for t in toks]
                or [np.array([], dtype=object)])})
        types = ex.groupby("d")["t"].nunique()
        n_typ = types.reindex(ids).fillna(0).to_numpy(np.int64)
        ttr = np.where(n_tok > 0, 1000 * n_typ // np.maximum(n_tok, 1),
                       -1)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids.to_numpy(np.int64)),
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_typ),
            "ttr_milli": pa.array(ttr.astype(np.int64))})

    return ds.map_batches(kernel, batch_format="pyarrow")


def lexical_diversity_query(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return lexical_diversity(ds)


LEXICAL_DIVERSITY_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(COALESCE(text, '')),
                                        '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
       CAST(CASE WHEN len(toks) > 0
                 THEN 1000 * len(list_distinct(toks)) // len(toks)
                 ELSE -1 END AS BIGINT) AS ttr_milli
FROM t ORDER BY doc_id
"""


# --- character-bigram entropy (compressibility proxy) ----------------------------------


def char_entropy(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document character-bigram entropy — the order-2
    compressibility proxy the Gopher/RefinedWeb-style quality filters
    use in place of an actual zstd pass (low bigram entropy ≈ highly
    compressible ≈ boilerplate/repetitive). Emitted in the repo's
    milli-nat integer contract: each distinct bigram's count c
    contributes ``c · floor(ln(c)·1000 + 0.5)``, so
    ``H = ln(n) − h_milli/(1000·n)`` nats; docs shorter than 2 chars
    are skipped on both sides. -> (doc_id, n, h_milli).

    Map-only (zero shuffle): per doc, the text round-trips through
    UTF-32 into a codepoint array, adjacent pairs pack into one
    uint64, and np.unique counts the bigrams — no Python loop over
    characters."""
    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = pc.fill_null(col, "").to_pylist()
        ids, ns, hs = [], [], []
        for did, txt in zip(batch.column(id_col).to_pylist(), texts):
            if len(txt) < 2:
                continue
            codes = np.frombuffer(txt.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.uint64)
            big = (codes[:-1] << np.uint64(32)) | codes[1:]
            _, cnt = np.unique(big, return_counts=True)
            cnt = cnt.astype(np.int64)
            q = np.floor(np.log(cnt) * 1000.0 + 0.5).astype(np.int64)
            ids.append(did)
            ns.append(int(cnt.sum()))
            hs.append(int((cnt * q).sum()))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "h_milli": pa.array(hs, pa.int64())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def char_entropy_query(sf_dir: str):
    return char_entropy(read_table(sf_dir, "documents",
                                   columns=["doc_id", "text"]))


# correlated generate_series is unavailable (the gap_fill lesson), so
# bigram positions come from a bounded range join against 1..max(len)
CHAR_ENTROPY_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM documents
  WHERE length(COALESCE(text, '')) >= 2
),
g AS (
  SELECT unnest(generate_series(
      1, (SELECT CAST(MAX(length(t)) AS INTEGER) FROM d))) AS i
),
b AS (
  SELECT d.doc_id, substr(d.t, g.i, 2) AS bg
  FROM d JOIN g ON g.i <= length(d.t) - 1
),
c AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       CAST(SUM(c * CAST(floor(ln(c) * 1000 + 0.5) AS BIGINT))
            AS BIGINT) AS h_milli
FROM c GROUP BY doc_id ORDER BY doc_id
"""


# --- Flesch readability (integer contract) ----------------------------------------------


def readability(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Flesch reading-ease per document with the classic heuristic
    counts, kept exactly replayable: words = whitespace tokens,
    sentences = ``[.!?]+`` runs (min 1), syllables = ``[aeiouy]+``
    vowel groups in the lowered text (min 1). The score is the exact
    trunc-div milli form of Flesch's 206.835 − 1.015·w/s − 84.6·sy/w:
    ``flesch_milli = 206835 − (1015·w) // s − (84600·sy) // w`` —
    pure int64 both sides (DuckDB ``//`` truncates; every operand
    here is positive, so trunc == floor).
    -> (doc_id, n_words, n_sentences, n_syllables, flesch_milli).
    Map-only, RE2 kernels, zero exchanges."""
    _sent = re.compile(r"[.!?]+")
    _syl = re.compile(r"[aeiouy]+")

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        words = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(lowered), r"\s+")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # empty text splits to [''] -> 1; true word count needs the
        # trimmed-empty special case (both sides count 0 words as 1
        # via the max() floor below, so the formula never divides by 0)
        texts = lowered.to_pylist()
        sents = np.fromiter((len(_sent.findall(t)) for t in texts),
                            dtype=np.int64, count=len(texts))
        syls = np.fromiter(
            (sum(1 for _ in _syl.finditer(t)) for t in texts),
            dtype=np.int64, count=len(texts))
        w = np.maximum(words, 1)
        s = np.maximum(sents, 1)
        sy = np.maximum(syls, 1)
        flesch = (206835 - (1015 * w) // s - (84600 * sy) // w)
        return pa.Table.from_pydict({
            "doc_id": batch.column(id_col),
            "n_words": pa.array(w),
            "n_sentences": pa.array(s),
            "n_syllables": pa.array(sy),
            "flesch_milli": pa.array(flesch)})

    return ds.map_batches(kernel, batch_format="pyarrow")


def readability_query(sf_dir: str):
    return readability(read_table(sf_dir, "documents",
                                  columns=["doc_id", "text"]))


READABILITY_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, lower(COALESCE(text, '')) AS t FROM documents
),
c AS (
  SELECT doc_id,
         GREATEST(len(string_split_regex(trim(t), '\\s+')), 1) AS w,
         GREATEST(len(regexp_extract_all(t, '[.!?]+')), 1) AS s,
         GREATEST(len(regexp_extract_all(t, '[aeiouy]+')), 1) AS sy
  FROM d
)
SELECT doc_id, CAST(w AS BIGINT) AS n_words,
       CAST(s AS BIGINT) AS n_sentences,
       CAST(sy AS BIGINT) AS n_syllables,
       CAST(206835 - (1015 * w) // s - (84600 * sy) // w AS BIGINT)
         AS flesch_milli
FROM c ORDER BY doc_id
"""


# --- language-ID evaluation against the labeled corpus ----------------------------------


_LANG_ID_CACHE: dict = {}


def _lang_id_cached(sf_dir: str) -> "ray.data.Dataset":
    """Per-process pinned lang_id predictions (the _cust_graph
    discipline): compositions reuse ONE materialized classifier pass;
    the driver-checked lang_id query itself stays fresh."""
    if sf_dir not in _LANG_ID_CACHE:
        from rdf_mapper_ray.ops.readers import read_table as _rt
        _LANG_ID_CACHE[sf_dir] = lang_id(
            _rt(sf_dir, "documents",
                columns=["doc_id", "text"])).materialize()
    return _LANG_ID_CACHE[sf_dir]


def lang_id_report_query(sf_dir: str):
    """Per-class precision/recall/F1 of the trigram language
    identifier against the corpus's labeled ``lang`` column — the
    same class_report evaluator the NB holdout uses, pointed at a
    second classifier (eval machinery is classifier-agnostic by
    construction). Predictions meet the column-pruned label table in
    the shared equi_join (doc-keyed 1:1, venue-dispatched)."""
    from rdf_mapper_ray.ops.nbayes import class_report

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang"])
    preds = _lang_id_cached(sf_dir)
    # doc-keyed 1:1: co-partition merge by hash(doc_id)
    from rdf_mapper_ray.ops.joins import equi_join
    lab = ds.map_batches(
        lambda t: t.select(["doc_id", "lang"]),
        batch_format="pyarrow")
    joined = equi_join(preds, lab, "doc_id", "doc_id")

    def shape(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "label": t.column("lang"),
            "pred": t.column("predicted_lang")})

    return class_report(
        joined.map_batches(shape, batch_format="pyarrow"))


def lang_id_report_oracle_sql() -> str:
    from rdf_mapper_ray.ops.nbayes import class_report_oracle_sql
    base = f"""
WITH preds AS ({LANG_ID_ORACLE_SQL}),
j AS (
  SELECT d.lang AS label, p.predicted_lang AS pred
  FROM documents d JOIN preds p USING (doc_id)
),
cm AS (SELECT label, pred, COUNT(*) AS c FROM j GROUP BY label, pred),
cls AS (SELECT DISTINCT label AS cls FROM j
        UNION SELECT DISTINCT pred FROM j),
per AS (
  SELECT cls,
    COALESCE((SELECT SUM(c) FROM cm
              WHERE label = cls AND pred = cls), 0) AS tp,
    COALESCE((SELECT SUM(c) FROM cm
              WHERE pred = cls AND label <> cls), 0) AS fp,
    COALESCE((SELECT SUM(c) FROM cm
              WHERE label = cls AND pred <> cls), 0) AS fn
  FROM cls)
SELECT cls AS label, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(CASE WHEN tp + fp = 0 THEN 0
            ELSE 1000 * tp // (tp + fp) END AS BIGINT) AS prec_milli,
       CAST(CASE WHEN tp + fn = 0 THEN 0
            ELSE 1000 * tp // (tp + fn) END AS BIGINT) AS rec_milli,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
            ELSE 2000 * tp // (2 * tp + fp + fn) END AS BIGINT)
         AS f1_milli
FROM per ORDER BY label
"""
    return base


# --- corpus novelty profile (temporal shingle overlap) ----------------------------------


def ngram_novelty(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id", shingle_k: int = 5,
                  num_partitions: int | None = None
                  ) -> "ray.data.Dataset":
    """Per-doc novelty against everything that came before it (docs
    ordered by id — the streaming-crawl contract): of a doc's DISTINCT
    word-``shingle_k``-gram shingles, how many were already emitted by
    ANY smaller-id doc. The standard memorization / staleness signal
    for LLM corpus curation (cf. the Lee et al. 2022 dedup analyses).
    -> (doc_id, n_shingles, n_seen, novelty_milli).

    Shape: the shared _distinct_shingles stream (hashed shingles, the
    ngram_jaccard collision contract) flattens via Arrow list offsets,
    routes ONE exchange on hash(shingle) where each partition computes
    per-shingle first-occurrence and per-doc partial (seen, total)
    counts, then a doc-keyed groupby sums the partials — two bounded
    exchanges, no pair table, no driver state."""
    from rdf_mapper_ray.ops.dedup import _distinct_shingles
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    shingles = _distinct_shingles(ds, None, text_col, id_col,
                                  shingle_k)

    def emit(batch: pa.Table) -> pa.Table:
        col = batch.column("shingles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        parents = pc.list_parent_indices(col)
        ids = batch.column("id").take(parents)
        sh = flat.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.Table.from_pydict({
            "pid": pa.array((sh % np.uint64(num_partitions))
                            .astype(np.int64)),
            "sh": flat,
            "id": ids})

    def per_shingle_part(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a shingle hash land here: first occurrence is
        # the min doc id; every later holder counts it as 'seen'
        ids = g["id"].to_numpy(np.int64)
        first = g.groupby("sh")["id"].transform("min") \
            .to_numpy(np.int64)
        out = pd.DataFrame({
            "id": ids,
            "n": np.ones(len(ids), np.int64),
            "s": (ids > first).astype(np.int64)})
        return out.groupby("id", as_index=False)[["n", "s"]].sum()

    parts = shingles.map_batches(emit, batch_format="pyarrow") \
        .groupby("pid").map_groups(per_shingle_part,
                                   batch_format="pandas")

    # doc-keyed merge of the (docs × P)-bounded partials via a routed
    # in-task groupby — Ray's sort-aggregate degrades ~100x on this
    # tiny-group shape (the partsupp_edges lesson; measured 24 s)
    def route_doc(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column(
            "dpid", pa.array(i % np.int64(num_partitions)))

    def merge_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("id", as_index=False)[["n", "s"]].sum()
        n = out["n"].to_numpy(np.int64)
        s = out["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": out["id"].to_numpy(np.int64),
            "n_shingles": n,
            "n_seen": s,
            "novelty_milli": 1000 * (n - s) // n})

    return parts.map_batches(route_doc, batch_format="pyarrow") \
        .groupby("dpid").map_groups(merge_doc,
                                    batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow") \
        .sort("doc_id")


def ngram_novelty_query(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_novelty(ds)


# word-5-gram shingles exactly as NGRAM_JACCARD_ORACLE_SQL (short docs
# contribute their whole text as the single shingle)
NGRAM_NOVELTY_ORACLE_SQL = """
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(trim(COALESCE(text, ''), ' ' || chr(9) || chr(10) || chr(13)), '\\s+') AS w
  FROM documents
),
shingled AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS sh
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
  WHERE len(w) >= 5
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM words WHERE len(w) < 5
),
dsh AS (SELECT DISTINCT doc_id, sh FROM shingled),
firsts AS (SELECT sh, MIN(doc_id) AS first_doc FROM dsh GROUP BY sh),
per AS (
  SELECT d.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN d.doc_id > f.first_doc
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
  FROM dsh d JOIN firsts f USING (sh)
  GROUP BY d.doc_id
)
SELECT doc_id, n_shingles, n_seen,
       CAST(1000 * (n_shingles - n_seen) // n_shingles AS BIGINT)
         AS novelty_milli
FROM per ORDER BY doc_id
"""
