"""Distributed minimum spanning forest — Borůvka's algorithm (1926),
the classic O(log n)-round distributed MST: every round each component
picks its minimum-weight outgoing edge (distinct weights ⇒ the choice
is unique, deterministic, and cycle-free except the mutual-pick pair,
which edge-identity dedup removes), picked edges join the forest, and
components merge by min-label connected components over the forest.

Exactness contract: edge weights are minted DISTINCT by construction
(the query documents the injective formula), so the MSF is the unique
one and a SQL oracle can replay every round — each unrolled round is
one argmin-per-component CTE plus one recursive min-label closure over
the forest-so-far (multiple recursive CTEs in one WITH RECURSIVE).
The engine asserts it converged within the oracle's unrolled round
budget, so a mismatch is loud, never silent.

Distribution shape per round: components attach to edges through TWO
pid-routed exchanges (by each endpoint — the dbscan/k_core tag
pattern), candidate minima reduce per-component inside one routed
groupby (map-side argmin first, so only component-cardinality rows
ride), and the forest CC is the engine's Hash-to-Min. The forest is
re-materialized per round with severed lineage (the _pin lesson).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from rdf_mapper_ray.ops.readers import read_table
from rdf_mapper_ray.ops.dedup import neardup_pairs_cached


def _pid_arr(vals: np.ndarray, num_partitions: int) -> pa.Array:
    h = pd.util.hash_pandas_object(pd.Series(vals),
                                   index=False).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


def _kruskal_driver(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Driver venue: exact Kruskal over a bounded edge table. Distinct
    weights ⇒ the MSF is UNIQUE, so Kruskal and the distributed
    Borůvka rounds return the identical forest (venue-equality unit
    in tests/test_mst.py). Array union-find with path halving; the
    only Python loop is over the ≤ driver_max_edges rows the venue
    gate admitted."""
    df = edges.to_pandas()
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    w = df["w"].to_numpy(np.int64)
    order = np.argsort(w, kind="stable")
    a, b, w = a[order], b[order], w[order]
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = np.zeros(len(a), dtype=bool)
    for i in range(len(a)):
        ra, rb = find(ai[i]), find(bi[i])
        if ra != rb:
            parent[rb] = ra
            keep[i] = True
    out = pa.Table.from_pydict({
        "a": pa.array(a[keep]), "b": pa.array(b[keep]),
        "w": pa.array(w[keep])})
    return ray.data.from_arrow(out).sort(["a", "b"])


def boruvka_msf(edges: "ray.data.Dataset", max_rounds: int = 10,
                num_partitions: int | None = None,
                venue: str = "auto",
                driver_max_edges: int = 2_000_000
                ) -> "ray.data.Dataset":
    """(a, b, w) distinct-weight undirected edges -> the minimum
    spanning forest as (a, b, w) rows (one per kept edge), sorted.
    Raises if not converged within ``max_rounds`` (the SQL oracle
    unrolls exactly that many rounds).

    Venue dispatch (the dedup_keep_best pattern): every Borůvka round
    costs ~5 routed exchanges plus a Hash-to-Min closure — tens of
    shuffle floors on this box — so an edge table under
    ``driver_max_edges`` runs exact driver Kruskal instead (unique
    MSF ⇒ identical output; measured 110.9 s → ~6 s on the sf0.1
    near-dup graph). The distributed rounds are the venue past that
    gate, where the edge table can't land on one machine."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(edges, 8)

    from rdf_mapper_ray.engine.canonicalize import _cc_min_label

    edges = edges.select_columns(["a", "b", "w"]).materialize()
    if venue == "auto":
        venue = ("driver" if edges.count() <= driver_max_edges
                 else "dataset")
    if venue == "driver":
        return _kruskal_driver(edges)

    def _sever(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        mat = ds.materialize()
        return ray.data.from_arrow_refs(mat.to_arrow_refs())

    # comp: (node, comp) — starts as identity over edge endpoints
    def init_comp(t: pa.Table) -> pa.Table:
        n = pc.unique(pa.concat_arrays(
            [t.column("a").combine_chunks(),
             t.column("b").combine_chunks()]))
        return pa.Table.from_pydict({"node": n, "comp": n})

    comp = edges.map_batches(init_comp, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "pid", _pid_arr(t.column("node").to_numpy(),
                            num_partitions)),
            batch_format="pyarrow") \
        .groupby("pid").map_groups(
            lambda g: g.drop_duplicates("node"),
            batch_format="pandas").materialize()

    forest = None
    rounds = 0
    for _ in range(max_rounds):
        # attach comp(a) then comp(b): kind-tagged routed joins
        def edge_by(col: str):
            def f(t: pa.Table) -> pa.Table:
                out = pa.Table.from_pydict({
                    "node": t.column(col), "a": t.column("a"),
                    "b": t.column("b"), "w": t.column("w"),
                    "comp": pa.array(
                        np.zeros(t.num_rows, dtype=np.int64))})
                out = out.append_column(
                    "kind",
                    pa.array(np.zeros(t.num_rows, dtype=np.int8)))
                return out.append_column(
                    "pid", _pid_arr(out.column("node").to_numpy(),
                                    num_partitions))
            return f

        def comp_rows(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, dtype=np.int64)
            out = pa.Table.from_pydict({
                "node": t.column("node"), "a": pa.array(z),
                "b": pa.array(z), "w": pa.array(z),
                "comp": t.column("comp")})
            out = out.append_column(
                "kind", pa.array(np.ones(t.num_rows, dtype=np.int8)))
            return out.append_column(
                "pid", _pid_arr(out.column("node").to_numpy(),
                                num_partitions))

        def attach(colname: str):
            def f(g: pd.DataFrame) -> pd.DataFrame:
                lab = g.loc[g["kind"] == 1, ["node", "comp"]] \
                    .rename(columns={"comp": colname})
                e = g.loc[g["kind"] == 0,
                          ["node", "a", "b", "w"]
                          + (["ca"] if colname == "cb" else [])]
                return e.merge(lab, on="node") \
                    .drop(columns=["node"])
            return f

        e1 = edges.map_batches(edge_by("a"), batch_format="pyarrow") \
            .union(comp.map_batches(comp_rows,
                                    batch_format="pyarrow")) \
            .groupby("pid").map_groups(attach("ca"),
                                       batch_format="pandas")

        def re_route_b(t: pa.Table) -> pa.Table:
            out = pa.Table.from_pydict({
                "a": t.column("a"), "b": t.column("b"),
                "w": t.column("w"), "ca": t.column("ca"),
                "node": t.column("b"),
                "comp": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, np.int8))})
            return out.append_column(
                "pid2", _pid_arr(out.column("node").to_numpy(),
                                 num_partitions))

        def comp_rows2(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, dtype=np.int64)
            out = pa.Table.from_pydict({
                "a": pa.array(z), "b": pa.array(z),
                "w": pa.array(z), "ca": pa.array(z),
                "node": t.column("node"),
                "comp": t.column("comp"),
                "kind": pa.array(np.ones(t.num_rows, np.int8))})
            return out.append_column(
                "pid2", _pid_arr(out.column("node").to_numpy(),
                                 num_partitions))

        def attach_b(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["kind"] == 1, ["node", "comp"]] \
                .rename(columns={"comp": "cb"})
            e = g.loc[g["kind"] == 0, ["node", "a", "b", "w", "ca"]]
            m = e.merge(lab, on="node").drop(columns=["node"])
            m = m[m["ca"] != m["cb"]]
            if not len(m):
                return pd.DataFrame({
                    "comp": pd.array([], "int64"),
                    "a": pd.array([], "int64"),
                    "b": pd.array([], "int64"),
                    "w": pd.array([], "int64")})
            # map-side argmin per INCIDENT component (both sides)
            both = pd.concat([
                m.rename(columns={"ca": "comp"})[
                    ["comp", "a", "b", "w"]],
                m.rename(columns={"cb": "comp"})[
                    ["comp", "a", "b", "w"]]], ignore_index=True)
            both = both.sort_values(["comp", "w"])
            return both.groupby("comp", sort=False).head(1)

        cand = e1.map_batches(re_route_b, batch_format="pyarrow") \
            .union(comp.map_batches(comp_rows2,
                                    batch_format="pyarrow")) \
            .groupby("pid2").map_groups(attach_b,
                                        batch_format="pandas")

        # final argmin per component + edge-identity dedup
        def pick(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["comp", "w"])
            p = g.groupby("comp", sort=False).head(1)
            return p[["a", "b", "w"]].drop_duplicates(["a", "b"])

        picked = cand.map_batches(
            lambda t: t.append_column(
                "pid3", _pid_arr(t.column("comp").to_numpy(),
                                 num_partitions)),
            batch_format="pyarrow") \
            .groupby("pid3").map_groups(pick,
                                        batch_format="pandas") \
            .map_batches(lambda t: t.append_column(
                "pid", _pid_arr(
                    t.column("a").to_numpy()
                    * np.int64(1_000_003)
                    + t.column("b").to_numpy(), num_partitions)),
                batch_format="pyarrow") \
            .groupby("pid").map_groups(
                lambda g: g.drop_duplicates(["a", "b"])[
                    ["a", "b", "w"]],
                batch_format="pandas").materialize()

        rounds += 1
        if picked.count() == 0:
            break

        forest = picked if forest is None else _sever(
            forest.union(picked).map_batches(
                lambda t: t.append_column(
                    "pid", _pid_arr(
                        t.column("a").to_numpy()
                        * np.int64(1_000_003)
                        + t.column("b").to_numpy(),
                        num_partitions)),
                batch_format="pyarrow")
            .groupby("pid").map_groups(
                lambda g: g.drop_duplicates(["a", "b"])[
                    ["a", "b", "w"]], batch_format="pandas"))

        # components = min-label CC over the forest + self for nodes
        # not yet in the forest. VENUE NOTE: this must stay the
        # Hash-to-Min _cc_min_label (log-round pointer doubling) — MST
        # forests are chain-heavy, and the Pregel actors CC is plain
        # min-label propagation (O(diameter) rounds): tried, it hits
        # its round budget on the sf0.1 forest's ~10^3-long chains
        cc = _cc_min_label(forest.select_columns(["a", "b"]),
                           num_partitions=num_partitions)

        def cc_rows(t: pa.Table) -> pa.Table:
            out = t.rename_columns(["node", "comp"])
            out = out.append_column(
                "kind", pa.array(np.ones(out.num_rows, np.int8)))
            return out.append_column(
                "pid", _pid_arr(out.column("node").to_numpy(),
                                num_partitions))

        def self_rows(t: pa.Table) -> pa.Table:
            out = pa.Table.from_pydict({
                "node": t.column("node"),
                "comp": t.column("node")})
            out = out.append_column(
                "kind", pa.array(np.zeros(out.num_rows, np.int8)))
            return out.append_column(
                "pid", _pid_arr(out.column("node").to_numpy(),
                                num_partitions))

        def merge_comp(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node", "kind"])
            return g.groupby("node", as_index=False).last()[
                ["node", "comp"]]

        comp = _sever(cc.map_batches(cc_rows, batch_format="pyarrow")
                      .union(comp.map_batches(
                          self_rows, batch_format="pyarrow"))
                      .groupby("pid").map_groups(
                          merge_comp, batch_format="pandas")
                      .map_batches(lambda t: t.append_column(
                          "pid", _pid_arr(
                              t.column("node").to_numpy(),
                              num_partitions)),
                          batch_format="pyarrow"))
    else:
        raise RuntimeError(
            f"boruvka_msf: not converged in {max_rounds} rounds — "
            f"raise max_rounds AND the oracle's unroll budget")

    if forest is None:
        raise ValueError("boruvka_msf: empty edge set")
    return forest.select_columns(["a", "b", "w"]).sort(["a", "b"])


def msf_query(sf_dir: str, threshold: float = 0.3):
    """Minimum spanning forest of the embedding near-dup graph with
    DISTINCT minted weights: w = ((a·31 + b) mod 97)·2^40 +
    a·100000 + b — the low term is injective over canonical a < b
    pairs (vec_ids < 100000), the high term pseudo-shuffles so the
    MSF isn't just the lexicographic forest; the oracle mints the
    identical expression."""
    from rdf_mapper_ray.ops.dedup import (_pairs_as_edges,
                                          embedding_neardup_pairs,
                                          partitions_for)
    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    pairs = neardup_pairs_cached(sf_dir, threshold)

    def weigh(t: pa.Table) -> pa.Table:
        t = _pairs_as_edges(t)
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        w = ((a * 31 + b) % 97) * (1 << 40) + a * 100_000 + b
        return t.append_column("w", pa.array(w.astype(np.int64)))

    return boruvka_msf(pairs.map_batches(weigh,
                                         batch_format="pyarrow"),
                       num_partitions=partitions_for(emb, 8))


def msf_oracle_sql(max_rounds: int = 10) -> str:
    """Unrolled Borůvka: each round r has an argmin-per-component CTE
    (pick_r) and a recursive min-label closure over the forest so far
    (compN via reachN). Distinct weights make every pick unique."""
    head = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         CAST(((a.vec_id * 31 + b.vec_id) % 97) AS BIGINT)
           * (1::BIGINT << 40)
           + a.vec_id * 100000 + b.vec_id AS w
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
),
nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
comp0 AS (SELECT node, node AS comp FROM nodes)"""
    parts = [head]
    prev_comp = "comp0"
    prev_forest = None
    for r in range(1, max_rounds + 1):
        forest_r = f"forest{r}"
        # candidate min outgoing edge per component
        parts.append(f"""
cand{r} AS MATERIALIZED (
  SELECT ca.comp AS comp, e.a, e.b, e.w FROM e
  JOIN {prev_comp} ca ON ca.node = e.a
  JOIN {prev_comp} cb ON cb.node = e.b
  WHERE ca.comp <> cb.comp
  UNION ALL
  SELECT cb.comp, e.a, e.b, e.w FROM e
  JOIN {prev_comp} ca ON ca.node = e.a
  JOIN {prev_comp} cb ON cb.node = e.b
  WHERE ca.comp <> cb.comp
),
pick{r} AS MATERIALIZED (
  SELECT DISTINCT a, b, w FROM (
    SELECT a, b, w,
           row_number() OVER (PARTITION BY comp ORDER BY w) AS rn
    FROM cand{r}) WHERE rn = 1
)""")
        if prev_forest is None:
            parts.append(
                f"{forest_r} AS MATERIALIZED "
                f"(SELECT a, b, w FROM pick{r})")
        else:
            parts.append(f"""
{forest_r} AS MATERIALIZED (
  SELECT a, b, w FROM {prev_forest}
  UNION SELECT a, b, w FROM pick{r}
)""")
        parts.append(f"""
fu{r} AS (SELECT a, b FROM {forest_r}
          UNION ALL SELECT b, a FROM {forest_r}),
reach{r}(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT fu{r}.b, rr.label FROM reach{r} rr
  JOIN fu{r} ON fu{r}.a = rr.node
),
comp{r} AS MATERIALIZED (
  SELECT node, CAST(MIN(label) AS BIGINT) AS comp
  FROM reach{r} GROUP BY node
)""")
        prev_comp = f"comp{r}"
        prev_forest = forest_r
    return (",\n".join(parts)
            + f"\nSELECT a, b, CAST(w AS BIGINT) AS w "
              f"FROM {prev_forest} ORDER BY a, b\n")
