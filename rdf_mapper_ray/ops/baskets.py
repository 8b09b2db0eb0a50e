"""Frequent item-pair mining — A-Priori's pass 2 (Agrawal & Srikant
1994), the market-basket co-occurrence statistic: count how many
baskets (orders) contain each item pair, and keep the top pairs by
support.

Scale shape: baskets dedup per batch (map-side), route ONCE by basket
key so each partition holds complete baskets, and the within-basket
pair expansion is fully vectorized — baskets sort by (basket, item)
and a loop over OFFSETS k = 1..max_basket_size (a handful of
iterations, each one whole-partition vectorized compare) emits every
within-run pair with items already in canonical order. Pair counts
merge in a hash(pair)-routed co-partition pass with an in-task pandas
groupby — Ray's own sort-aggregate degrades when the group count is
table-sized (measured 83x slower here) — and each merge task prunes to
its local top-k, so the final sort sees only tasks × k candidates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def frequent_pairs(ds: "ray.data.Dataset", basket_col: str,
                   item_col: str, k: int = 50,
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """-> (item_a, item_b, support): the k most co-purchased item
    pairs, ties broken by (item_a, item_b) ascending."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def dedup_route(batch: pa.Table) -> pa.Table:
        t = batch.select([basket_col, item_col]) \
            .group_by([basket_col, item_col], use_threads=False) \
            .aggregate([])
        h = pd.util.hash_pandas_object(
            t.column(basket_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([basket_col, item_col]) \
            .sort_values([basket_col, item_col])
        b = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        n = len(g)
        runs = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        max_sz = int(np.diff(np.append(runs, n)).max()) if n else 0
        la, lb = [], []
        # offsets 1..max_basket_size: each pass compares the whole
        # partition at once; items are sorted within a basket, so the
        # emitted pair is already canonical (a < b)
        for off in range(1, max_sz):
            same = b[off:] == b[:-off]
            la.append(it[:-off][same])
            lb.append(it[off:][same])
        if not la:
            return pd.DataFrame({"item_a": pd.array([], "int64"),
                                 "item_b": pd.array([], "int64"),
                                 "support": pd.array([], "int64")})
        out = pd.DataFrame({"item_a": np.concatenate(la),
                            "item_b": np.concatenate(lb)})
        out = out.groupby(["item_a", "item_b"], as_index=False).size()
        return out.rename(columns={"size": "support"}).astype("int64")

    # the same pair can surface from baskets in different partitions:
    # merge by routing pairs by hash(pair) and counting INSIDE each
    # task (16-ish groups for the engine, pandas handles the 100k+
    # real groups) — Ray's sort-aggregate degrades when the group
    # count is table-sized
    def route_pairs(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series(a * np.int64(2_654_435_761) + b),
            index=False).to_numpy()
        return t.append_column(
            "pid2", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64)))

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["item_a", "item_b"],
                        as_index=False)["support"].sum()
        # map-side prune: only each task's local top-k candidates can
        # reach the global top-k (counts are final after this merge)
        out = out.sort_values(["support", "item_a", "item_b"],
                              ascending=[False, True, True]).head(k)
        return out

    counts = ds.map_batches(dedup_route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs, batch_format="pandas") \
        .map_batches(route_pairs, batch_format="pyarrow") \
        .groupby("pid2").map_groups(merge_counts, batch_format="pandas")
    return counts.sort(["support", "item_a", "item_b"],
                       descending=[True, False, False]).limit(k)


def frequent_pairs_query(sf_dir: str, k: int = 50):
    ds = read_table(sf_dir, "lineitem",
                               columns=["l_orderkey", "l_partkey"])
    return frequent_pairs(ds, basket_col="l_orderkey",
                          item_col="l_partkey", k=k)


def frequent_pairs_oracle_sql(k: int = 50) -> str:
    return f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
       CAST(COUNT(*) AS BIGINT) AS support
FROM b x JOIN b y
  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
GROUP BY x.l_partkey, y.l_partkey
ORDER BY support DESC, item_a, item_b
LIMIT {k}
"""


# --- item-item cosine similarity from basket co-occurrence -----------------------

def _pair_count_exchange(ds: "ray.data.Dataset", basket_col: str,
                         item_col: str, num_partitions: int,
                         emit_basket_total: bool = False
                         ) -> "ray.data.Dataset":
    """Shared basket machinery (item_cosine / assoc_rules): two routed
    exchanges producing exact per-pair co-occurrence counts (kind 1)
    with the per-item basket counts riding the SAME exchange as
    kind-0 rows; ``emit_basket_total`` adds kind-2 rows whose merged
    sum is the total distinct-basket count N (each hash(basket)
    partition holds complete baskets, so its local distinct count is
    exact and the kind-2 rows all route to one partition)."""

    def dedup_route(batch: pa.Table) -> pa.Table:
        t = batch.select([basket_col, item_col]) \
            .group_by([basket_col, item_col], use_threads=False) \
            .aggregate([])
        h = pd.util.hash_pandas_object(
            t.column(basket_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs_and_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Each complete basket lives here: emit its item pairs AND
        one (item, NULL-pair) count row per item occurrence so the
        item totals ride the same exchange (kind 0 = count row,
        kind 1 = pair row, kind 2 = basket-total row)."""
        g = g.drop_duplicates([basket_col, item_col]) \
            .sort_values([basket_col, item_col])
        b = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        n = len(g)
        runs = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        max_sz = int(np.diff(np.append(runs, n)).max()) if n else 0
        la, lb = [], []
        for off in range(1, max_sz):
            same = b[off:] == b[:-off]
            la.append(it[:-off][same])
            lb.append(it[off:][same])
        cnt = pd.DataFrame({"item_a": it,
                            "item_b": np.zeros(n, dtype=np.int64),
                            "kind": np.zeros(n, dtype=np.int8)})
        if la:
            pr = pd.DataFrame({"item_a": np.concatenate(la),
                               "item_b": np.concatenate(lb)})
            pr["kind"] = np.int8(1)
            cnt = pd.concat([cnt, pr], ignore_index=True)
        out = cnt.groupby(["item_a", "item_b", "kind"],
                          as_index=False).size() \
            .rename(columns={"size": "cooc"})
        out = out.astype({"item_a": np.int64, "item_b": np.int64,
                          "kind": np.int8, "cooc": np.int64})
        if emit_basket_total and n:
            total = pd.DataFrame({
                "item_a": [np.int64(0)], "item_b": [np.int64(0)],
                "kind": [np.int8(2)], "cooc": [np.int64(len(runs))]})
            out = pd.concat([out, total], ignore_index=True)
        return out

    def route_pairs(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        # count rows (kind 0) route by item alone so each item's
        # total merges exactly once; kind-2 rows share key 0
        key = np.where(kind == 1,
                       a * np.int64(2_654_435_761) + b, a)
        h = pd.util.hash_pandas_object(pd.Series(key),
                                       index=False).to_numpy()
        return t.append_column(
            "pid2", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64)))

    return ds.map_batches(dedup_route, batch_format="pyarrow") \
        .groupby("pid").map_groups(pairs_and_counts,
                                   batch_format="pandas") \
        .map_batches(route_pairs, batch_format="pyarrow") \
        .groupby("pid2").map_groups(
            lambda g: g.groupby(["item_a", "item_b", "kind"],
                                as_index=False)["cooc"].sum(),
            batch_format="pandas").materialize()


def item_cosine(ds: "ray.data.Dataset", basket_col: str,
                item_col: str, k: int = 100, min_support: int = 2,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Collaborative-filtering item similarity: cosine over the
    basket-incidence vectors, cos(i, j) = cooc(i,j)/√(c_i·c_j), for
    pairs with cooc ≥ min_support. Reported as the quantized integer
    ``cos_milli = floor(1000·cooc/√(c_i·c_j) + 0.5)`` so the one
    float expression is evaluated identically on both sides (the SQL
    oracle runs the same literal formula).

    Shape: frequent_pairs' two routed exchanges produce exact pair
    counts; the per-item basket counts c_i (item-cardinality-sized —
    the small side BY CONSTRUCTION) reduce map-side and broadcast via
    ray.put into the scoring task, so no third shuffle.
    -> (item_a, item_b, cooc, count_a, count_b, cos_milli)."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    merged = _pair_count_exchange(ds, basket_col, item_col,
                                  num_partitions)

    # item totals: item-cardinality-sized by construction -> filter
    # the count rows distributed, pull ONLY them, broadcast once
    import pyarrow.compute as pc

    def split_counts(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"),
                                 pa.scalar(0, pa.int8()))) \
            .select(["item_a", "cooc"])

    cnt_df = merged.map_batches(split_counts,
                                batch_format="pyarrow").to_pandas()
    counts = dict(zip(cnt_df["item_a"].tolist(),
                      cnt_df["cooc"].tolist()))
    counts_ref = ray.put(counts)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"),
                              pa.scalar(1, pa.int8())))
        if t.num_rows == 0:
            return pa.Table.from_pydict({
                "item_a": pa.array([], pa.int64()),
                "item_b": pa.array([], pa.int64()),
                "cooc": pa.array([], pa.int64()),
                "count_a": pa.array([], pa.int64()),
                "count_b": pa.array([], pa.int64()),
                "cos_milli": pa.array([], pa.int64())})
        c = ray.get(counts_ref)
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        cooc = t.column("cooc").to_numpy(zero_copy_only=False)
        keep = cooc >= min_support
        a, b, cooc = a[keep], b[keep], cooc[keep]
        ca = np.fromiter((c[x] for x in a), dtype=np.int64,
                         count=len(a))
        cb = np.fromiter((c[x] for x in b), dtype=np.int64,
                         count=len(b))
        cos = np.floor(1000.0 * cooc
                       / np.sqrt((ca * cb).astype(np.float64))
                       + 0.5).astype(np.int64)
        out = pa.Table.from_pydict({
            "item_a": pa.array(a), "item_b": pa.array(b),
            "cooc": pa.array(cooc), "count_a": pa.array(ca),
            "count_b": pa.array(cb), "cos_milli": pa.array(cos)})
        # map-side prune: counts are final, only a local top-k can
        # reach the global top-k
        idx = pd.DataFrame({"cos_milli": cos, "item_a": a,
                            "item_b": b}).sort_values(
            ["cos_milli", "item_a", "item_b"],
            ascending=[False, True, True]).index[:k]
        return out.take(pa.array(np.sort(np.asarray(idx))))

    return merged.map_batches(score, batch_format="pyarrow") \
        .sort(["cos_milli", "item_a", "item_b"],
              descending=[True, False, False]).limit(k)


def item_cosine_query(sf_dir: str, k: int = 100):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])
    return item_cosine(ds, basket_col="l_orderkey",
                       item_col="l_partkey", k=k)


def item_cosine_oracle_sql(k: int = 100, min_support: int = 2) -> str:
    return f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY l_partkey),
p AS (
  SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
         COUNT(*) AS cooc
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
)
SELECT item_a, item_b, CAST(cooc AS BIGINT) AS cooc,
       CAST(ca.c AS BIGINT) AS count_a,
       CAST(cb.c AS BIGINT) AS count_b,
       CAST(floor(1000.0 * cooc
            / sqrt(CAST(ca.c * cb.c AS DOUBLE)) + 0.5) AS BIGINT)
         AS cos_milli
FROM p JOIN ic ca ON ca.l_partkey = item_a
       JOIN ic cb ON cb.l_partkey = item_b
ORDER BY cos_milli DESC, item_a, item_b LIMIT {k}
"""


def frequent_triples(ds: "ray.data.Dataset", basket_col: str,
                     item_col: str, k: int = 30,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """-> (item_a, item_b, item_c, support): the k most co-purchased
    item TRIPLES (A-priori level 3; Agrawal & Srikant 1994), ties by
    (a, b, c) ascending.

    Same two-exchange shape as :func:`frequent_pairs` — baskets
    co-locate by hash(basket), each task emits canonical sorted
    triples, and triple counts merge in pid-routed tasks (group counts
    are table-sized, where Ray's sort-aggregate degrades). Triple
    generation is vectorized over OFFSET PAIRS, not rows: with items
    sorted within baskets, positions (p, p+o1, p+o2) share a basket
    iff b[p] == b[p+o2], so each (o1 < o2) pass compares the whole
    partition at once — the loop runs C(max_basket, 2) times, bounded
    by the biggest basket, never by row count. Scale contract: basket
    fan-out is C(|basket|, 3); cap or sample mega-baskets upstream."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)

    def dedup_route(batch: pa.Table) -> pa.Table:
        t = batch.select([basket_col, item_col]) \
            .group_by([basket_col, item_col], use_threads=False) \
            .aggregate([])
        h = pd.util.hash_pandas_object(
            t.column(basket_col).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([basket_col, item_col]) \
            .sort_values([basket_col, item_col])
        b = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        n = len(g)
        runs = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        max_sz = int(np.diff(np.append(runs, n)).max()) if n else 0
        la, lb, lc = [], [], []
        for o2 in range(2, max_sz):
            same = b[o2:] == b[:-o2]
            for o1 in range(1, o2):
                la.append(it[:n - o2][same])
                lb.append(it[o1:n - o2 + o1][same])
                lc.append(it[o2:][same])
        if not la:
            return pd.DataFrame({"item_a": pd.array([], "int64"),
                                 "item_b": pd.array([], "int64"),
                                 "item_c": pd.array([], "int64"),
                                 "support": pd.array([], "int64")})
        out = pd.DataFrame({"item_a": np.concatenate(la),
                            "item_b": np.concatenate(lb),
                            "item_c": np.concatenate(lc)})
        out = out.groupby(["item_a", "item_b", "item_c"],
                          as_index=False).size()
        return out.rename(columns={"size": "support"}).astype("int64")

    def route_triples(t: pa.Table) -> pa.Table:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        c = t.column("item_c").to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(
            pd.Series((a * np.int64(2_654_435_761) + b)
                      * np.int64(2_654_435_761) + c),
            index=False).to_numpy()
        return t.append_column(
            "pid2", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64)))

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["item_a", "item_b", "item_c"],
                        as_index=False)["support"].sum()
        out = out.sort_values(
            ["support", "item_a", "item_b", "item_c"],
            ascending=[False, True, True, True]).head(k)
        return out

    counts = ds.map_batches(dedup_route, batch_format="pyarrow") \
        .groupby("pid").map_groups(triples, batch_format="pandas") \
        .map_batches(route_triples, batch_format="pyarrow") \
        .groupby("pid2").map_groups(merge_counts,
                                    batch_format="pandas")
    return counts.sort(["support", "item_a", "item_b", "item_c"],
                       descending=[True, False, False, False]).limit(k)


def frequent_triples_query(sf_dir: str, k: int = 30):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])
    return frequent_triples(ds, basket_col="l_orderkey",
                            item_col="l_partkey", k=k)


def frequent_triples_oracle_sql(k: int = 30) -> str:
    return f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
       z.l_partkey AS item_c,
       CAST(COUNT(*) AS BIGINT) AS support
FROM b x
JOIN b y ON x.l_orderkey = y.l_orderkey
        AND x.l_partkey < y.l_partkey
JOIN b z ON x.l_orderkey = z.l_orderkey
        AND y.l_partkey < z.l_partkey
GROUP BY 1, 2, 3
ORDER BY support DESC, item_a, item_b, item_c
LIMIT {k}
"""


# --- association rules (confidence / lift) -----------------------------------------

def assoc_rules(ds: "ray.data.Dataset", basket_col: str,
                item_col: str, k: int = 100, min_support: int = 2,
                num_partitions: int | None = None
                ) -> "ray.data.Dataset":
    """Association rules over basket co-occurrence (Agrawal & Srikant,
    VLDB 1994): every ordered rule a → b with pair support ≥
    min_support, scored by exact-integer confidence and lift —
    ``conf_milli = (1000·n_ab) // n_a`` and ``lift_milli =
    (1000·n_ab·N) // (n_a·n_b)`` (positive-operand truncating
    division; DuckDB ``//`` replays both bit-exactly). Top-k by
    (lift_milli DESC, antecedent, consequent).

    Shape: the shared ``_pair_count_exchange`` produces pair counts,
    per-item basket counts AND the distinct-basket total N on the
    same two exchanges (no extra pass for N — each hash(basket)
    partition counts its complete baskets as kind-2 rows); item
    counts broadcast once; scoring + map-side top-k prune run per
    block. -> (antecedent, consequent, support, conf_milli,
    lift_milli)."""
    import pyarrow.compute as pc

    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(ds, 8)
    merged = _pair_count_exchange(ds, basket_col, item_col,
                                  num_partitions,
                                  emit_basket_total=True)

    def split_counts(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("kind"),
                                     pa.scalar(1, pa.int8()))) \
            .select(["item_a", "kind", "cooc"])

    cnt_df = merged.map_batches(split_counts,
                                batch_format="pyarrow").to_pandas()
    n_baskets = int(cnt_df.loc[cnt_df["kind"] == 2, "cooc"].sum())
    item_rows = cnt_df[cnt_df["kind"] == 0]
    counts = dict(zip(item_rows["item_a"].tolist(),
                      item_rows["cooc"].tolist()))
    counts_ref = ray.put(counts)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"),
                              pa.scalar(1, pa.int8())))
        c = ray.get(counts_ref)
        a0 = t.column("item_a").to_numpy(zero_copy_only=False)
        b0 = t.column("item_b").to_numpy(zero_copy_only=False)
        s0 = t.column("cooc").to_numpy(zero_copy_only=False)
        keep = s0 >= min_support
        a0, b0, s0 = a0[keep], b0[keep], s0[keep]
        # both rule directions from each unordered pair
        ant = np.concatenate([a0, b0])
        con = np.concatenate([b0, a0])
        sup = np.concatenate([s0, s0])
        ca = np.fromiter((c[x] for x in ant), dtype=np.int64,
                         count=len(ant))
        cc = np.fromiter((c[x] for x in con), dtype=np.int64,
                         count=len(con))
        conf = (1000 * sup) // ca
        lift = (1000 * sup * np.int64(n_baskets)) // (ca * cc)
        out = pd.DataFrame({
            "antecedent": ant, "consequent": con, "support": sup,
            "conf_milli": conf, "lift_milli": lift})
        # counts are final -> only a local top-k can reach the global
        out = out.sort_values(["lift_milli", "antecedent",
                               "consequent"],
                              ascending=[False, True, True]).head(k)
        return pa.Table.from_pydict(
            {c2: pa.array(out[c2].to_numpy(np.int64), pa.int64())
             for c2 in out.columns})

    return merged.map_batches(score, batch_format="pyarrow") \
        .sort(["lift_milli", "antecedent", "consequent"],
              descending=[True, False, False]).limit(k)


def assoc_rules_query(sf_dir: str, k: int = 100):
    from rdf_mapper_ray.ops.readers import read_table
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])
    return assoc_rules(ds, basket_col="l_orderkey",
                       item_col="l_partkey", k=k)


def assoc_rules_oracle_sql(k: int = 100, min_support: int = 2) -> str:
    return f"""
WITH b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY l_partkey),
p AS (
  SELECT x.l_partkey AS item_a, y.l_partkey AS item_b,
         COUNT(*) AS cooc
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
),
r AS (
  SELECT item_a AS antecedent, item_b AS consequent, cooc FROM p
  UNION ALL
  SELECT item_b, item_a, cooc FROM p
)
SELECT antecedent, consequent, CAST(cooc AS BIGINT) AS support,
       CAST((1000 * cooc) // ca.c AS BIGINT) AS conf_milli,
       CAST((1000 * cooc * (SELECT n FROM nb)) // (ca.c * cc.c)
            AS BIGINT) AS lift_milli
FROM r JOIN ic ca ON ca.l_partkey = antecedent
       JOIN ic cc ON cc.l_partkey = consequent
ORDER BY lift_milli DESC, antecedent, consequent LIMIT {k}
"""
