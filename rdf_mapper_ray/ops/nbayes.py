"""Distributed multinomial Naive Bayes — train AND classify as Ray
Data passes (McCallum & Nigam 1998): the canonical "train a text
classifier on the corpus you just cleaned" step of a data pipeline.

Training is one map-side-combined (class, token) count pass — the
shuffle carries (class, token, count) partials, vocab × classes-sized,
never the corpus — plus a class-prior doc count. The fitted model
(quantized log-probs) broadcasts once via ``ray.put``; classification
is a vectorized pandas-map + bincount per batch, one pass per class
over the flattened token buffer.

Exactness contract (the lm_score rule): every per-TYPE log-probability
— Laplace-smoothed ln((c+1)/(total_c+V)), the per-class missing-pair
default ln(1/(total_c+V)), and the prior ln(n_c/n) — quantizes to
integer MILLI-NATS (floor(ln·1000 + 0.5)) before any summation, so
document scores are integer sums (identical under any order) and the
SQL oracle replays them value-for-value. Argmax ties break on label
ascending, replayed via row_number."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rdf_mapper_ray.ops.readers import read_table

_WS = r"\s+"


def _q(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1000.0 + 0.5).astype(np.int64)


def nb_train(ds: "ray.data.Dataset", label_col: str = "source",
             text_col: str = "text",
             num_partitions: Optional[int] = None) -> dict:
    """-> fitted model dict: classes (sorted), quantized priors,
    per-class (token -> milli-nat log-prob) Series, per-class default.
    The count pass is distributed; the model itself is
    vocab × classes-sized driver state (broadcast by the caller)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        labels = batch.column(label_col).to_pandas().to_numpy(object)
        lab = np.repeat(labels, lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"lab": lab[keep],
                          "tok": flat.filter(pa.array(keep))
                          .to_pandas()})
        cnt = g.groupby(["lab", "tok"], as_index=False).size() \
            .rename(columns={"size": "c"})
        # doc-count partials ride along with tok='' (never a token)
        docs = pd.DataFrame({"lab": labels, "tok": "", "c": 1}) \
            .groupby(["lab", "tok"], as_index=False)["c"].sum()
        out = pd.concat([cnt, docs])
        out["c"] = out["c"].astype(np.int64)
        pid = pd.util.hash_pandas_object(out["lab"].astype(str)
                                         + "\x00" + out["tok"],
                                         index=False).to_numpy()
        out["pid"] = (pid % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lab", "tok"], as_index=False)["c"].sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pid").map_groups(merge, batch_format="pandas") \
        .to_pandas()

    tok_counts = counts[counts["tok"] != ""]
    doc_counts = counts[counts["tok"] == ""] \
        .groupby("lab")["c"].sum()
    classes = sorted(doc_counts.index)
    n_docs = int(doc_counts.sum())
    vocab = tok_counts["tok"].nunique()

    model = {"classes": classes, "vocab": int(vocab),
             "prior": {}, "pair": {}, "default": {}}
    for cls in classes:
        sub = tok_counts[tok_counts["lab"] == cls]
        tot = int(sub["c"].sum())
        model["prior"][cls] = int(
            _q(np.array([np.log(doc_counts[cls] / n_docs)]))[0])
        ql = _q(np.log((sub["c"].to_numpy(np.int64) + 1.0)
                       / (tot + vocab)))
        model["pair"][cls] = pd.Series(ql, index=sub["tok"].to_numpy())
        model["default"][cls] = int(
            _q(np.array([np.log(1.0 / (tot + vocab))]))[0])
    return model


def nb_classify(ds: "ray.data.Dataset", model: dict,
                id_col: str = "doc_id", text_col: str = "text",
                keep_cols: tuple = ()) -> "ray.data.Dataset":
    """-> (id, *keep_cols, pred, score_milli): argmax class per doc
    (ties -> label ascending), integer milli-nat joint log-prob.
    ``keep_cols`` ride through unchanged (e.g. the true label for a
    held-out evaluation)."""
    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        classes = m["classes"]
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc = np.repeat(np.arange(batch.num_rows), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = pd.Series(flat.filter(pa.array(keep)).to_pandas())
        doc = doc[keep]
        n = batch.num_rows
        scores = np.empty((n, len(classes)), dtype=np.int64)
        for j, cls in enumerate(classes):
            ql = toks.map(m["pair"][cls]) \
                .fillna(m["default"][cls]).to_numpy(np.int64)
            scores[:, j] = m["prior"][cls] + np.bincount(
                doc, weights=ql, minlength=n).astype(np.int64)
        best = np.argmax(scores, axis=1)   # first max = label asc
        out = {id_col: batch.column(id_col)}
        for c in keep_cols:
            out[c] = batch.column(c)
        out["pred"] = pa.array([classes[j] for j in best], pa.string())
        out["score_milli"] = pa.array(scores[np.arange(n), best])
        return pa.Table.from_pydict(out)

    return ds.map_batches(score, batch_format="pyarrow")


def nb_classify_query(sf_dir: str):
    """Self-classification demo (train and score on the same corpus,
    the lm_score convention): predict each document's source from its
    text."""
    train = read_table(sf_dir, "documents",
                       columns=["source", "text"])
    model = nb_train(train)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return nb_classify(ds, model)


NB_CLASSIFY_ORACLE_SQL = """
WITH tk AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                        '\\s+')) AS tok
    FROM documents) WHERE tok <> ''
),
lab AS (SELECT doc_id, source FROM documents),
cnt AS (
  SELECT l.source, t.tok, COUNT(*) AS c
  FROM tk t JOIN lab l USING (doc_id) GROUP BY l.source, t.tok
),
totc AS (SELECT source, SUM(c) AS tot FROM cnt GROUP BY source),
v AS (SELECT COUNT(DISTINCT tok) AS v FROM cnt),
docs AS (SELECT source, COUNT(*) AS d FROM lab GROUP BY source),
nn AS (SELECT SUM(d) AS n FROM docs),
prior AS (
  SELECT source,
         CAST(floor(ln(CAST(d AS DOUBLE) / (SELECT n FROM nn))
                    * 1000 + 0.5) AS BIGINT) AS pq
  FROM docs
),
pairq AS (
  SELECT c.source, c.tok,
         CAST(floor(ln((c.c + 1.0) / (t.tot + (SELECT v FROM v)))
                    * 1000 + 0.5) AS BIGINT) AS ql
  FROM cnt c JOIN totc t USING (source)
),
dfltq AS (
  SELECT source,
         CAST(floor(ln(1.0 / (tot + (SELECT v FROM v)))
                    * 1000 + 0.5) AS BIGINT) AS dq
  FROM totc
),
scores AS (
  SELECT l.doc_id, p.source,
         p.pq + COALESCE(s.s, 0) AS score
  FROM lab l
  CROSS JOIN prior p
  LEFT JOIN (
    SELECT t.doc_id, d.source,
           SUM(COALESCE(q.ql, d.dq)) AS s
    FROM tk t
    CROSS JOIN dfltq d
    LEFT JOIN pairq q ON q.source = d.source AND q.tok = t.tok
    GROUP BY t.doc_id, d.source) s
    ON s.doc_id = l.doc_id AND s.source = p.source
),
ranked AS (
  SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, source) AS rn
  FROM scores
)
SELECT doc_id, source AS pred, CAST(score AS BIGINT) AS score_milli
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


def nb_holdout_query(sf_dir: str, train_pct: int = 80):
    """Held-out evaluation: md5-bucket split (the hash_split
    convention — bucket = md5_hash64(str(id)) % 100, pure function of
    the id, zero shuffle), train on bucket < ``train_pct``, classify
    the held-out rest, and flag each prediction against the true
    label. -> (doc_id, label, pred, score_milli, correct)."""
    from rdf_mapper_ray.ops.hashing import hash64

    full = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"])

    def split_filter(keep_train: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").cast(pa.string()).to_pylist()
            b = (hash64(ids, "md5") % np.uint64(100)).astype(np.int64)
            mask = b < train_pct if keep_train else b >= train_pct
            return batch.filter(pa.array(mask))
        return fn

    train = full.map_batches(split_filter(True), batch_format="pyarrow")
    model = nb_train(train, label_col="source")
    test = full.map_batches(split_filter(False), batch_format="pyarrow")
    scored = nb_classify(test, model, keep_cols=("source",))

    def finish(batch: pa.Table) -> pa.Table:
        correct = pc.cast(pc.equal(batch.column("pred"),
                                   batch.column("source")), pa.int64())
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "label": batch.column("source"),
            "pred": batch.column("pred"),
            "score_milli": batch.column("score_milli"),
            "correct": correct,
        })

    return scored.map_batches(finish, batch_format="pyarrow")


def nb_holdout_oracle_sql(train_pct: int = 80) -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    bucket = MD5_HASH64_SQL.format(col="CAST(doc_id AS VARCHAR)") \
        + " % 100"
    return f"""
WITH split AS (
  SELECT doc_id, source, text, {bucket} AS b FROM documents
),
tr AS (SELECT * FROM split WHERE b < {train_pct}),
te AS (SELECT * FROM split WHERE b >= {train_pct}),
tk_tr AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                        '\\s+')) AS tok
    FROM tr) WHERE tok <> ''
),
tk_te AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(COALESCE(text, '')),
                                        '\\s+')) AS tok
    FROM te) WHERE tok <> ''
),
cnt AS (
  SELECT l.source, t.tok, COUNT(*) AS c
  FROM tk_tr t JOIN tr l USING (doc_id) GROUP BY l.source, t.tok
),
totc AS (SELECT source, SUM(c) AS tot FROM cnt GROUP BY source),
v AS (SELECT COUNT(DISTINCT tok) AS v FROM cnt),
docs AS (SELECT source, COUNT(*) AS d FROM tr GROUP BY source),
nn AS (SELECT SUM(d) AS n FROM docs),
prior AS (
  SELECT source,
         CAST(floor(ln(CAST(d AS DOUBLE) / (SELECT n FROM nn))
                    * 1000 + 0.5) AS BIGINT) AS pq
  FROM docs
),
pairq AS (
  SELECT c.source, c.tok,
         CAST(floor(ln((c.c + 1.0) / (t.tot + (SELECT v FROM v)))
                    * 1000 + 0.5) AS BIGINT) AS ql
  FROM cnt c JOIN totc t USING (source)
),
dfltq AS (
  SELECT source,
         CAST(floor(ln(1.0 / (tot + (SELECT v FROM v)))
                    * 1000 + 0.5) AS BIGINT) AS dq
  FROM totc
),
scores AS (
  SELECT l.doc_id, p.source,
         p.pq + COALESCE(s.s, 0) AS score
  FROM te l
  CROSS JOIN prior p
  LEFT JOIN (
    SELECT t.doc_id, d.source,
           SUM(COALESCE(q.ql, d.dq)) AS s
    FROM tk_te t
    CROSS JOIN dfltq d
    LEFT JOIN pairq q ON q.source = d.source AND q.tok = t.tok
    GROUP BY t.doc_id, d.source) s
    ON s.doc_id = l.doc_id AND s.source = p.source
),
ranked AS (
  SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, source) AS rn
  FROM scores
)
SELECT r.doc_id, te.source AS label, r.source AS pred,
       CAST(r.score AS BIGINT) AS score_milli,
       CAST(CASE WHEN r.source = te.source THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM ranked r JOIN te USING (doc_id)
WHERE r.rn = 1 ORDER BY r.doc_id
"""


# --- calibration-by-margin reliability bins -------------------------------------------

_MARGIN_BIN_MILLI = 5000  # 5-nat margin buckets


def nb_margin_calibration(ds: "ray.data.Dataset", model: dict,
                          label_col: str = "source",
                          text_col: str = "text"
                          ) -> "ray.data.Dataset":
    """Reliability audit of the NB classifier by SCORE MARGIN (the
    integer-exact stand-in for probability calibration — softmax
    would break the milli-nat discipline): margin = best − second
    joint log-score (milli-nats, ≥ 0), binned at 5-nat width; per bin
    the row count, correct count and pure-integer accuracy floor.
    Does a bigger margin mean a more trustworthy prediction?
    -> (bin, n, n_correct, acc_milli).

    Per-batch kernel reuses nb_classify's vectorized scorer plus one
    np.partition for the runner-up; bin-bounded cells finish
    driver-side."""
    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        classes = m["classes"]
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        lists = pc.split_pattern_regex(lowered, _WS)
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        doc = np.repeat(np.arange(batch.num_rows), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = pd.Series(flat.filter(pa.array(keep)).to_pandas())
        doc = doc[keep]
        n = batch.num_rows
        scores = np.empty((n, len(classes)), dtype=np.int64)
        for j, cls in enumerate(classes):
            ql = toks.map(m["pair"][cls]) \
                .fillna(m["default"][cls]).to_numpy(np.int64)
            scores[:, j] = m["prior"][cls] + np.bincount(
                doc, weights=ql, minlength=n).astype(np.int64)
        best_j = np.argmax(scores, axis=1)
        best = scores[np.arange(n), best_j]
        part = np.partition(scores, len(classes) - 2, axis=1)
        second = part[:, len(classes) - 2]
        margin = best - second
        true = batch.column(label_col).to_pandas().to_numpy(object)
        ok = np.array([classes[j] for j in best_j],
                      dtype=object) == true
        df = pd.DataFrame({"bin": margin // _MARGIN_BIN_MILLI,
                           "ok": ok.astype(np.int64)})
        out = df.groupby("bin", as_index=False).agg(
            n=("ok", "size"), n_correct=("ok", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            score, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("bin", as_index=False)[["n", "n_correct"]].sum() \
        .sort_values("bin")
    n = cells["n"].to_numpy(np.int64)
    c = cells["n_correct"].to_numpy(np.int64)
    return ray.data.from_arrow(pa.Table.from_pydict({
        "bin": pa.array(cells["bin"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(n, pa.int64()),
        "n_correct": pa.array(c, pa.int64()),
        "acc_milli": pa.array(1000 * c // n, pa.int64())}))


def nb_calibration_query(sf_dir: str):
    train = read_table(sf_dir, "documents",
                       columns=["source", "text"])
    model = nb_train(train)
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source", "text"])
    return nb_margin_calibration(ds, model)


def nb_calibration_oracle_sql() -> str:
    # reuse nb_classify's full scoring chain; swap the final argmax
    # projection for the top-2 margin + reliability bins
    base = NB_CLASSIFY_ORACLE_SQL
    prefix = base[:base.rindex("SELECT doc_id, source AS pred")] \
        .rstrip().rstrip(",")
    return prefix + f""",
top2 AS (
  SELECT a.doc_id, a.source AS pred,
         a.score - b.score AS margin
  FROM ranked a JOIN ranked b
    ON b.doc_id = a.doc_id AND b.rn = 2
  WHERE a.rn = 1
),
j AS (
  SELECT t.margin // {_MARGIN_BIN_MILLI} AS bin,
         CASE WHEN t.pred = l.source THEN 1 ELSE 0 END AS ok
  FROM top2 t JOIN lab l USING (doc_id)
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ok) AS BIGINT) AS n_correct,
       CAST(1000 * SUM(ok) // COUNT(*) AS BIGINT) AS acc_milli
FROM j GROUP BY bin ORDER BY bin
"""


# --- per-class precision / recall / F1 report -----------------------------------------


def class_report(ds: "ray.data.Dataset", label_col: str = "label",
                 pred_col: str = "pred") -> "ray.data.Dataset":
    """Per-class classifier evaluation over (label, pred) rows: the
    confusion-matrix marginals and trunc-div milli metrics
    ``prec = 1000·tp // (tp+fp)``, ``rec = 1000·tp // (tp+fn)``,
    ``f1 = 2000·tp // (2·tp+fp+fn)`` — all exact integers, so the
    SQL oracle replays them bit-for-bit (DuckDB ``//`` truncates and
    every operand here is ≥ 0, so trunc == floor on both sides).
    Zero denominators report 0 (CASE WHEN, both sides).
    -> (label, tp, fp, fn, prec_milli, rec_milli, f1_milli).

    Shape: per-batch (label, pred) count partials (class²-bounded by
    construction), summed driver-side like every cell-table finish."""
    def partial(t: pa.Table) -> pa.Table:
        return t.select([label_col, pred_col]) \
            .group_by([label_col, pred_col], use_threads=False) \
            .aggregate([([], "count_all")])

    cm = pd.concat(
        b.to_pandas() for b in ds.map_batches(
            partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")) \
        .groupby([label_col, pred_col], as_index=False)[
            "count_all"].sum()
    classes = sorted(set(cm[label_col]) | set(cm[pred_col]))
    rows = []
    for c in classes:
        tp = int(cm.loc[(cm[label_col] == c) & (cm[pred_col] == c),
                        "count_all"].sum())
        fp = int(cm.loc[(cm[label_col] != c) & (cm[pred_col] == c),
                        "count_all"].sum())
        fn = int(cm.loc[(cm[label_col] == c) & (cm[pred_col] != c),
                        "count_all"].sum())
        prec = 1000 * tp // (tp + fp) if tp + fp else 0
        rec = 1000 * tp // (tp + fn) if tp + fn else 0
        f1 = 2000 * tp // (2 * tp + fp + fn) if 2 * tp + fp + fn \
            else 0
        rows.append((c, tp, fp, fn, prec, rec, f1))
    return ray.data.from_arrow(pa.Table.from_pydict({
        "label": pa.array([r[0] for r in rows], pa.string()),
        "tp": pa.array([r[1] for r in rows], pa.int64()),
        "fp": pa.array([r[2] for r in rows], pa.int64()),
        "fn": pa.array([r[3] for r in rows], pa.int64()),
        "prec_milli": pa.array([r[4] for r in rows], pa.int64()),
        "rec_milli": pa.array([r[5] for r in rows], pa.int64()),
        "f1_milli": pa.array([r[6] for r in rows], pa.int64())}))


def class_report_query(sf_dir: str):
    """Precision/recall/F1 per source class of the held-out NB run
    (the nb_holdout chain feeds it unchanged)."""
    return class_report(nb_holdout_query(sf_dir))


def class_report_oracle_sql() -> str:
    return f"""
WITH base AS ({nb_holdout_oracle_sql()}),
cm AS (SELECT label, pred, COUNT(*) AS c FROM base
       GROUP BY label, pred),
cls AS (SELECT DISTINCT label AS cls FROM base
        UNION SELECT DISTINCT pred FROM base),
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
