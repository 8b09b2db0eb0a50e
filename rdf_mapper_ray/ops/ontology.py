"""RDFS subclass entailment over an instance table — the
KG-construction companion op: given class assertions (every customer
is an instance of its nation class) and a subClassOf ontology
(nation:k ⊑ region:r ⊑ world, derived from the nation table), count
the ENTAILED instances of every class in the reflexive-transitive
closure.

Scale shape: the ontology is small-side BY CONSTRUCTION (class
vocabulary, not instances) — its closure builds driver-side and
broadcasts, exactly the map_by small-lookup venue; instance rows
never shuffle (per-batch class-count partials, class-bounded driver
finish). Past broadcast-ontology scale the closure is a semi-naive
delta join (the engine's bgp path_plus venue) and the assertion ⋈
closure step is an equi_join — both exist as ops; this module's
venue is the common case (ontologies are KB-sized, instances are
corpus-sized).

Reference anchor: the reference's mapping language auto-declares
classes and emits rdf:type triples (rdf-mapper mapping semantics);
entailment materialization is the downstream step a KG pipeline runs
before serving subclass-aware queries.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from rdf_mapper_ray.ops.readers import read_table


def rdfs_entail_counts(instances: "ray.data.Dataset", class_col: str,
                       closure: dict[str, list[str]]
                       ) -> "ray.data.Dataset":
    """Entailed-instance counts per class: each instance row asserts
    ``class_col``; ``closure`` maps every asserted class to its
    reflexive-transitive superclass list (precomputed from the
    ontology — small side). -> (class, n_inst), one row per entailed
    class, ordered.

    Per-batch partials count asserted classes (vectorized
    value_counts), expand through the closure at CLASS cardinality
    (never per row), and the class-bounded cell table finishes
    driver-side."""
    import ray

    closure_ref = ray.put(closure)

    def partial(t: pa.Table) -> pa.Table:
        cl = ray.get(closure_ref)
        vc = pd.Series(
            t.column(class_col).to_pandas()).value_counts()
        out: dict[str, int] = {}
        for asserted, cnt in vc.items():
            for sup in cl[asserted]:
                out[sup] = out.get(sup, 0) + int(cnt)
        return pa.Table.from_pydict({
            "class": pa.array(list(out), pa.string()),
            "n": pa.array(list(out.values()), pa.int64())})

    cells = pd.concat(
        b.to_pandas() for b in instances.map_batches(
            partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")) \
        .groupby("class", as_index=False)["n"].sum() \
        .sort_values("class")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "class": pa.array(cells["class"].to_numpy(), pa.string()),
        "n_inst": pa.array(cells["n"].to_numpy(np.int64),
                           pa.int64())}))


def rdfs_entail_query(sf_dir: str):
    """Entailed class sizes for the customer KG: nation:k ⊑ region:r
    ⊑ world — every customer is entailed into 3 classes."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # ontology (small side): nation -> region subclass edges
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    closure = {
        f"nation:{int(nk)}": [f"nation:{int(nk)}",
                              f"region:{int(rk)}", "world"]
        for nk, rk in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_regionkey").to_pylist())}

    cust = read_table(sf_dir, "customer", columns=["c_nationkey"])

    def assert_class(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch.column("c_nationkey"), pa.int64())
        return pa.Table.from_pydict({
            "class": pc.binary_join_element_wise(
                pa.array(["nation"] * len(batch)),
                pc.cast(nk, pa.string()), ":")})

    return rdfs_entail_counts(
        cust.map_batches(assert_class, batch_format="pyarrow"),
        "class", closure)


RDFS_ENTAIL_ORACLE_SQL = """
WITH types AS (
  SELECT 'nation:' || CAST(c_nationkey AS BIGINT) AS class
  FROM customer
  UNION ALL
  SELECT 'region:' || CAST(n_regionkey AS BIGINT)
  FROM customer JOIN nation ON n_nationkey = c_nationkey
  UNION ALL
  SELECT 'world' FROM customer
)
SELECT class, CAST(COUNT(*) AS BIGINT) AS n_inst
FROM types GROUP BY class ORDER BY class
"""


# --- SHACL-lite cardinality validation ----------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def shacl_cardinality(triples: "ray.data.Dataset", target_class: str,
                      shapes: list[tuple[str, int, int]],
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """SHACL-lite cardinality validation (sh:minCount/sh:maxCount over
    sh:targetClass) — the release gate a KG-construction pipeline runs
    before publishing a graph: for every target-class subject and
    every shape (predicate, min, max), count the subject's triples
    with that predicate and tally the violations.
    -> (predicate, min_count, max_count, n_targets, n_min_viol,
    n_max_viol), one row per shape.

    Scale shape: per-batch (subject, predicate) count partials over
    only the shape predicates (column-pruned filter), ONE
    hash(subject) exchange co-locates each subject's counts with its
    target marker, the per-partition finish is a vectorized pivot
    (missing predicates count 0 — that's what min violations ARE),
    and the shape-bounded cells sum driver-side."""
    import pyarrow.compute as pc

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)
    preds = [p for p, _, _ in shapes]

    def shred(t: pa.Table) -> pa.Table:
        subj = t.column("subject")
        pred = t.column("predicate")
        is_target = pc.and_(pc.equal(pred, _RDF_TYPE),
                            pc.equal(t.column("object_value"),
                                     target_class))
        tt = t.filter(is_target)
        cc = t.filter(pc.is_in(pred, value_set=pa.array(preds)))
        agg = pa.Table.from_pydict({
            "subject": cc.column("subject"),
            "predicate": cc.column("predicate")}).group_by(
            ["subject", "predicate"], use_threads=False).aggregate(
            [([], "count_all")])
        out = pa.Table.from_pydict({
            "subject": pa.concat_arrays(
                [tt.column("subject").combine_chunks(),
                 agg.column("subject").combine_chunks()]),
            "predicate": pa.concat_arrays(
                [pa.array(["__target__"] * tt.num_rows, pa.string()),
                 agg.column("predicate").combine_chunks()]),
            "cnt": pa.concat_arrays(
                [pa.array([1] * tt.num_rows, pa.int64()),
                 agg.column("count_all").combine_chunks()
                 .cast(pa.int64())])})
        h = pd.util.hash_pandas_object(
            out.column("subject").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["subject", "predicate"],
                      as_index=False)["cnt"].sum()
        targets = m.loc[m["predicate"] == "__target__", "subject"]
        rows = []
        for pred, mn, mx in shapes:
            c = m[m["predicate"] == pred].set_index("subject")["cnt"] \
                .reindex(targets).fillna(0).to_numpy(np.int64)
            rows.append((pred, mn, mx, len(c),
                         int((c < mn).sum()), int((c > mx).sum())))
        return pd.DataFrame(rows, columns=[
            "predicate", "min_count", "max_count", "n_targets",
            "n_min_viol", "n_max_viol"]) \
            .astype({c: np.int64 for c in
                     ["min_count", "max_count", "n_targets",
                      "n_min_viol", "n_max_viol"]})

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            shred, batch_format="pyarrow")
        .groupby("pid").map_groups(audit, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby(["predicate", "min_count", "max_count"],
                 as_index=False)[["n_targets", "n_min_viol",
                                  "n_max_viol"]].sum() \
        .sort_values("predicate")
    return ray.data.from_arrow(pa.Table.from_pandas(
        cells, preserve_index=False))


def shacl_cardinality_query(sf_dir: str):
    """Validate the guard-sparse customer tier graph: every
    ex:Customer must carry exactly one ex:name and ex:segment (all
    conform) and exactly one ex:tier — the guard (acctbal > 5000)
    makes tier sparse, so its min-count violations ARE the guarded-out
    customers."""
    from rdf_mapper_ray.pipelines.relational import _cust_graph
    ex = "http://example.org/def/"
    return shacl_cardinality(
        _cust_graph(sf_dir), f"{ex}Customer",
        [(f"{ex}name", 1, 1), (f"{ex}segment", 1, 1),
         (f"{ex}tier", 1, 1)])


SHACL_CARDINALITY_ORACLE_SQL = """
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
           AS predicate,
         'http://example.org/def/Customer' AS object_value
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         'http://example.org/def/name', c_name FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         'http://example.org/def/segment', lower(c_mktsegment)
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         'http://example.org/def/tier',
         replace(lower(c_mktsegment), ' ', '-')
  FROM customer WHERE c_acctbal > 5000
),
targets AS (
  SELECT subject FROM trip
  WHERE predicate = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
    AND object_value = 'http://example.org/def/Customer'
),
shapes(predicate, minc, maxc) AS (VALUES
  ('http://example.org/def/name', 1, 1),
  ('http://example.org/def/segment', 1, 1),
  ('http://example.org/def/tier', 1, 1)
),
cnt AS (
  SELECT t.subject, s.predicate, s.minc, s.maxc,
         COUNT(tr.subject) AS c
  FROM targets t CROSS JOIN shapes s
  LEFT JOIN trip tr ON tr.subject = t.subject
                   AND tr.predicate = s.predicate
  GROUP BY t.subject, s.predicate, s.minc, s.maxc
)
SELECT predicate, CAST(minc AS BIGINT) AS min_count,
       CAST(maxc AS BIGINT) AS max_count,
       CAST(COUNT(*) AS BIGINT) AS n_targets,
       CAST(SUM(CASE WHEN c < minc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_min_viol,
       CAST(SUM(CASE WHEN c > maxc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_max_viol
FROM cnt GROUP BY predicate, minc, maxc ORDER BY predicate
"""


# --- RDFS domain/range type inference -----------------------------------------------


def domain_range_infer(triples: "ray.data.Dataset",
                       dom_rng: dict[str, tuple],
                       subj_col: str = "subject",
                       pred_col: str = "predicate",
                       obj_col: str = "object_value",
                       num_partitions: Optional[int] = None
                       ) -> "ray.data.Dataset":
    """rdfs:domain / rdfs:range entailment (RDFS rules rdfs2/rdfs3,
    W3C RDF Semantics): for every triple (s p o) with ``p`` declared
    ``rdfs:domain C`` infer ``s rdf:type C``; with ``rdfs:range C``
    infer ``o rdf:type C``. -> (class, n_entities) with n_entities =
    COUNT(DISTINCT inferred instance), ordered by class.

    ``dom_rng`` maps predicate -> (domain_class | None,
    range_class | None) — ontology-sized, broadcast once (the map_by
    small-lookup venue; past that scale the property table joins the
    triple stream by predicate, the equi_join venue).

    Scale shape: per-batch vectorized expansion to (class, entity)
    with a batch-local Arrow distinct, ONE hash((class, entity))
    routed exchange so each pair lands in exactly one partition,
    per-partition distinct + per-class partials, class-bounded driver
    finish (the rdfs_entail cell-table pattern)."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)
    ref = ray.put(dom_rng)

    def expand(t: pa.Table) -> pa.Table:
        dr = ray.get(ref)
        preds = t.column(pred_col).to_pandas()
        subj = t.column(subj_col).to_pandas()
        obj = t.column(obj_col).to_pandas()
        parts = []
        for p, (dom, rng) in dr.items():
            m = (preds == p).to_numpy()
            if not m.any():
                continue
            if dom is not None:
                parts.append(pd.DataFrame(
                    {"class": dom, "entity": subj[m]}))
            if rng is not None:
                parts.append(pd.DataFrame(
                    {"class": rng, "entity": obj[m]}))
        if not parts:
            return pa.Table.from_pydict({
                "pid": pa.array([], pa.int64()),
                "class": pa.array([], pa.string()),
                "entity": pa.array([], pa.string())})
        df = pd.concat(parts).drop_duplicates()
        h = pd.util.hash_pandas_object(
            df["class"] + "\x1f" + df["entity"], index=False).to_numpy()
        return pa.Table.from_pydict({
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)),
            "class": pa.array(df["class"].to_numpy(), pa.string()),
            "entity": pa.array(df["entity"].to_numpy(), pa.string())})

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["class", "entity"])
        out = d.groupby("class", as_index=False).size()
        return pd.DataFrame({"class": out["class"],
                             "n": out["size"].astype("int64")})

    cells = pd.concat(
        b.to_pandas() for b in triples
        .map_batches(expand, batch_format="pyarrow")
        .groupby("pid").map_groups(count_part, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    agg = cells.groupby("class", as_index=False)["n"].sum() \
               .sort_values("class")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "class": pa.array(agg["class"].to_numpy(), pa.string()),
        "n_entities": pa.array(agg["n"].to_numpy(np.int64),
                               pa.int64())}))


def domain_range_query(sf_dir: str):
    """Infer types over the procurement graph: ``supplies`` edges
    (lineitem: supplier -> part) and ``placed`` edges (orders:
    customer -> order) entail Supplier/Part/Customer/Order classes."""
    import pyarrow.compute as pc

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_partkey"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey"])

    def li_triples(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "subject": pc.binary_join_element_wise(
                pa.array(["supplier"] * n),
                pc.cast(t.column("l_suppkey"), pa.string()), ":"),
            "predicate": pa.array(["supplies"] * n, pa.string()),
            "object_value": pc.binary_join_element_wise(
                pa.array(["part"] * n),
                pc.cast(t.column("l_partkey"), pa.string()), ":")})

    def ord_triples(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "subject": pc.binary_join_element_wise(
                pa.array(["customer"] * n),
                pc.cast(t.column("o_custkey"), pa.string()), ":"),
            "predicate": pa.array(["placed"] * n, pa.string()),
            "object_value": pc.binary_join_element_wise(
                pa.array(["order"] * n),
                pc.cast(t.column("o_orderkey"), pa.string()), ":")})

    triples = li.map_batches(li_triples, batch_format="pyarrow") \
        .union(orders.map_batches(ord_triples, batch_format="pyarrow"))
    return domain_range_infer(triples, {
        "supplies": ("Supplier", "Part"),
        "placed": ("Customer", "Order")})


DOMAIN_RANGE_ORACLE_SQL = """
WITH ents AS (
  SELECT 'Supplier' AS class,
         'supplier:' || CAST(l_suppkey AS VARCHAR) AS entity
  FROM lineitem
  UNION ALL
  SELECT 'Part', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'Customer', 'customer:' || CAST(o_custkey AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'Order', 'order:' || CAST(o_orderkey AS VARCHAR) FROM orders
)
SELECT class, CAST(COUNT(DISTINCT entity) AS BIGINT) AS n_entities
FROM ents GROUP BY class ORDER BY class
"""


# --- owl:FunctionalProperty violation audit ------------------------------------------


def functional_violations(triples: "ray.data.Dataset",
                          functional_preds: list[str],
                          subj_col: str = "subject",
                          pred_col: str = "predicate",
                          obj_col: str = "object_value",
                          num_partitions: Optional[int] = None
                          ) -> "ray.data.Dataset":
    """owl:FunctionalProperty audit (OWL 2 semantics): a functional
    property admits at most ONE distinct object per subject; any
    subject with ≥2 violates. -> (predicate, n_subjects,
    n_violating), one row per declared functional predicate.

    Scale shape: blocks shrink map-side to distinct (pred, subj, obj)
    triples FIRST (Arrow hash distinct), ONE hash(pred, subj) routed
    exchange co-locates each subject's objects, the per-partition
    finish counts distinct objects per subject vectorized, and the
    predicate-bounded cell table ends driver-side."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)
    fset = set(functional_preds)
    fref = ray.put(fset)

    def partial(t: pa.Table) -> pa.Table:
        fs = ray.get(fref)
        df = t.select([pred_col, subj_col, obj_col]).to_pandas()
        df = df[df[pred_col].isin(fs)].drop_duplicates()
        h = pd.util.hash_pandas_object(
            df[pred_col] + "\x1f" + df[subj_col].astype(str),
            index=False).to_numpy()
        return pa.Table.from_pydict({
            "p": pa.array(df[pred_col].to_numpy(), pa.string()),
            "s": pa.array(df[subj_col].to_numpy()),
            "o": pa.array(df[obj_col].to_numpy()),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p", "s", "o"])
        per = d.groupby(["p", "s"], as_index=False).size()
        out = per.groupby("p", as_index=False).agg(
            n_subjects=("size", "size"),
            n_violating=("size", lambda k: int((k > 1).sum())))
        return out

    cells = pd.concat(
        b.to_pandas() for b in triples
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pid").map_groups(finish, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    agg = cells.groupby("p", as_index=False)[
        ["n_subjects", "n_violating"]].sum().sort_values("p")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "predicate": pa.array(agg["p"].to_numpy(), pa.string()),
        "n_subjects": pa.array(agg["n_subjects"].to_numpy(np.int64),
                               pa.int64()),
        "n_violating": pa.array(agg["n_violating"].to_numpy(np.int64),
                                pa.int64())}))


def functional_violations_query(sf_dir: str):
    """Audit the procurement graph: ``placed_by`` (order → customer)
    is genuinely functional; ``shipped_by`` (order → supplier) is
    declared functional but multi-supplier orders violate it."""
    import pyarrow.compute as pc

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"])

    def li_t(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "subject": pc.cast(t.column("l_orderkey"), pa.string()),
            "predicate": pa.array(["shipped_by"] * n, pa.string()),
            "object_value": pc.cast(t.column("l_suppkey"),
                                    pa.string())})

    def ord_t(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict({
            "subject": pc.cast(t.column("o_orderkey"), pa.string()),
            "predicate": pa.array(["placed_by"] * n, pa.string()),
            "object_value": pc.cast(t.column("o_custkey"),
                                    pa.string())})

    triples = li.map_batches(li_t, batch_format="pyarrow") \
        .union(orders.map_batches(ord_t, batch_format="pyarrow"))
    return functional_violations(triples, ["shipped_by", "placed_by"])


FUNCTIONAL_VIOLATIONS_ORACLE_SQL = """
WITH t AS (
  SELECT 'shipped_by' AS p, CAST(l_orderkey AS VARCHAR) AS s,
         CAST(l_suppkey AS VARCHAR) AS o
  FROM lineitem
  UNION ALL
  SELECT 'placed_by', CAST(o_orderkey AS VARCHAR),
         CAST(o_custkey AS VARCHAR)
  FROM orders
),
d AS (SELECT DISTINCT p, s, o FROM t),
per AS (SELECT p, s, COUNT(*) AS k FROM d GROUP BY 1, 2)
SELECT p AS predicate, CAST(COUNT(*) AS BIGINT) AS n_subjects,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating
FROM per GROUP BY p ORDER BY p
"""


# --- VoID dataset statistics ----------------------------------------------------------


def void_stats(triples: "ray.data.Dataset",
               subj_col: str = "subject", pred_col: str = "predicate",
               obj_col: str = "object_value",
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """W3C VoID property partitions — the statistics block a KG
    publisher emits alongside the graph (void:triples,
    void:distinctSubjects, void:distinctObjects per predicate).
    -> (predicate, n_triples, n_subjects, n_objects), ordered.

    Scale shape: blocks shrink map-side to distinct (pred, subj) /
    (pred, obj) partials plus per-pred triple counts; ONE routed
    exchange per distinct-kind (hash of the pair ⇒ each pair lands in
    exactly one partition, partition-local distinct counts sum
    exactly); the predicate-bounded cells finish driver-side."""
    import ray

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p": t.column(pred_col).to_pandas(),
            "s": t.column(subj_col).to_pandas(),
            "o": t.column(obj_col).to_pandas().fillna("\x00null")})
        cnt = df.groupby("p", as_index=False).size()
        subs = df[["p", "s"]].drop_duplicates()
        objs = df[["p", "o"]].drop_duplicates()
        rows = pd.concat([
            pd.DataFrame({"p": cnt["p"], "k": "\x00cnt",
                          "n": cnt["size"].astype("int64"),
                          "kind": np.int8(0)}),
            pd.DataFrame({"p": subs["p"], "k": subs["s"], "n": 1,
                          "kind": np.int8(1)}),
            pd.DataFrame({"p": objs["p"], "k": objs["o"], "n": 1,
                          "kind": np.int8(2)}),
        ], ignore_index=True)
        h = pd.util.hash_pandas_object(
            rows["p"] + "\x1f" + rows["k"], index=False).to_numpy()
        return pa.Table.from_pydict({
            "p": pa.array(rows["p"].to_numpy(), pa.string()),
            "k": pa.array(rows["k"].to_numpy(), pa.string()),
            "n": pa.array(rows["n"].to_numpy(np.int64)),
            "kind": pa.array(rows["kind"].to_numpy(np.int8)),
            "pid": pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64))})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g[g["kind"] == 0].groupby("p", as_index=False)["n"].sum()
        cnt["col"] = "n_triples"
        su = g[g["kind"] == 1].drop_duplicates(["p", "k"]) \
            .groupby("p", as_index=False).size() \
            .rename(columns={"size": "n"})
        su["col"] = "n_subjects"
        ob = g[g["kind"] == 2].drop_duplicates(["p", "k"]) \
            .groupby("p", as_index=False).size() \
            .rename(columns={"size": "n"})
        ob["col"] = "n_objects"
        return pd.concat([cnt, su, ob], ignore_index=True)[
            ["p", "col", "n"]].astype({"n": "int64"})

    cells = pd.concat(
        b.to_pandas() for b in triples
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pid").map_groups(finish, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))
    wide = cells.groupby(["p", "col"], as_index=False)["n"].sum() \
        .pivot(index="p", columns="col", values="n") \
        .fillna(0).astype("int64").reset_index().sort_values("p")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "predicate": pa.array(wide["p"].to_numpy(), pa.string()),
        "n_triples": pa.array(wide["n_triples"].to_numpy(np.int64)),
        "n_subjects": pa.array(
            wide["n_subjects"].to_numpy(np.int64)),
        "n_objects": pa.array(wide["n_objects"].to_numpy(np.int64))}))


def void_stats_query(sf_dir: str):
    """VoID property partitions of the CONSTRUCTED flagship graph —
    extract → dedup → profile as one streaming composition (the
    publish-time statistics step; reference anchor: rdf-mapper's
    emitted dataset is what a VoID block would describe)."""
    from rdf_mapper_ray.pipelines.sourcecode import flagship_cached
    return void_stats(flagship_cached(sf_dir))


def void_stats_oracle_sql() -> str:
    from rdf_mapper_ray.pipelines.sourcecode import FLAGSHIP_ORACLE_SQL
    return f"""
SELECT predicate, CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subject) AS BIGINT) AS n_subjects,
       CAST(COUNT(DISTINCT object_value) AS BIGINT) AS n_objects
FROM ({FLAGSHIP_ORACLE_SQL}) t
GROUP BY predicate ORDER BY predicate
"""


# --- SHACL datatype / pattern conformance ----------------------------------------------


def shacl_datatype(triples: "ray.data.Dataset", target_class: str,
                   shapes: list[tuple[str, str | None, str]],
                   num_partitions: int | None = None
                   ) -> "ray.data.Dataset":
    """SHACL-lite value validation (sh:datatype + sh:pattern over
    sh:targetClass) — the other half of the release gate next to
    :func:`shacl_cardinality`: for every triple of a target-class
    subject whose predicate has a shape ``(predicate,
    expected_datatype | None, pattern)``, flag a datatype violation
    when the literal's datatype differs (None = plain literal) and a
    pattern violation when the lexical form fails the anchored RE2
    fullmatch. -> (predicate, n_values, n_dt_viol, n_pattern_viol).

    Shape: violation flags are computed per batch BEFORE the
    exchange (map-side, vectorized), ONE hash(subject) exchange
    semi-joins them to the target markers, and the shape-bounded
    cells sum driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)
    preds = [p for p, _, _ in shapes]

    def shred(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        pred = t.column("predicate")
        is_target = pc.and_(pc.equal(pred, _RDF_TYPE),
                            pc.equal(t.column("object_value"),
                                     target_class))
        tt = t.filter(is_target)
        vals = t.filter(pc.is_in(pred, value_set=pa.array(preds)))
        df = vals.select(["subject", "predicate", "object_value",
                          "datatype"]).to_pandas()
        dtv = np.zeros(len(df), np.int64)
        pv = np.zeros(len(df), np.int64)
        for p, dt, pat in shapes:
            m = (df["predicate"] == p).to_numpy()
            if not m.any():
                continue
            d = df.loc[m, "datatype"]
            ok_dt = d.isna() if dt is None else (d == dt)
            dtv[m] = (~ok_dt).to_numpy().astype(np.int64)
            ov = df.loc[m, "object_value"].fillna("")
            pv[m] = (~ov.str.fullmatch(pat)) \
                .to_numpy().astype(np.int64)
        out = pd.DataFrame({
            "subject": np.concatenate([
                tt.column("subject").to_pandas().to_numpy(object),
                df["subject"].to_numpy(object)]),
            "predicate": np.concatenate([
                np.full(tt.num_rows, "__target__", object),
                df["predicate"].to_numpy(object)]),
            "dtv": np.concatenate([np.zeros(tt.num_rows, np.int64),
                                   dtv]),
            "pv": np.concatenate([np.zeros(tt.num_rows, np.int64),
                                  pv])})
        h = pd.util.hash_pandas_object(out["subject"],
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        targets = set(g.loc[g["predicate"] == "__target__",
                            "subject"])
        v = g[(g["predicate"] != "__target__")
              & g["subject"].isin(targets)]
        out = v.groupby("predicate", as_index=False).agg(
            n_values=("dtv", "size"), n_dt_viol=("dtv", "sum"),
            n_pattern_viol=("pv", "sum"))
        return out

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            shred, batch_format="pyarrow")
        .groupby("pid").map_groups(audit, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("predicate", as_index=False)[
            ["n_values", "n_dt_viol", "n_pattern_viol"]].sum() \
        .sort_values("predicate")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "predicate": pa.array(cells["predicate"], pa.string()),
        "n_values": pa.array(cells["n_values"].to_numpy(np.int64)),
        "n_dt_viol": pa.array(cells["n_dt_viol"].to_numpy(np.int64)),
        "n_pattern_viol": pa.array(
            cells["n_pattern_viol"].to_numpy(np.int64))}))


_EX = "http://example.org/def/"
_XSD = "http://www.w3.org/2001/XMLSchema#"


def shacl_datatype_query(sf_dir: str):
    """Validate the customer graph's literals: name must look like
    Customer#digits (all conform), acctbal must be an xsd:decimal
    with a plain numeric form, segment must start with a–f (the
    machinery/household segments violate — non-degenerate)."""
    from rdf_mapper_ray.pipelines.relational import \
        _customer_graph_cached
    return shacl_datatype(
        _customer_graph_cached(sf_dir), f"{_EX}Customer",
        [(f"{_EX}name", None, r"Customer#[0-9]+"),
         (f"{_EX}acctbal", f"{_XSD}decimal", r"-?[0-9]+\.[0-9]+"),
         (f"{_EX}segment", None, r"[a-f][a-z]*")])


SHACL_DATATYPE_ORACLE_SQL = f"""
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         '{_RDF_TYPE}' AS predicate,
         '{_EX}Customer' AS object_value,
         CAST(NULL AS VARCHAR) AS datatype
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}name', c_name, NULL FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}acctbal', CAST(c_acctbal AS VARCHAR),
         '{_XSD}decimal' FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}segment', lower(c_mktsegment), NULL FROM customer
),
targets AS (
  SELECT subject FROM trip
  WHERE predicate = '{_RDF_TYPE}'
    AND object_value = '{_EX}Customer'
),
shapes(predicate, dt, pat) AS (VALUES
  ('{_EX}name', CAST(NULL AS VARCHAR), 'Customer#[0-9]+'),
  ('{_EX}acctbal', '{_XSD}decimal', '-?[0-9]+\\.[0-9]+'),
  ('{_EX}segment', CAST(NULL AS VARCHAR), '[a-f][a-z]*')),
v AS (
  SELECT s.predicate,
         CASE WHEN t.datatype IS DISTINCT FROM s.dt
              THEN 1 ELSE 0 END AS dtv,
         CASE WHEN NOT regexp_full_match(
                  COALESCE(t.object_value, ''), s.pat)
              THEN 1 ELSE 0 END AS pv
  FROM trip t JOIN shapes s ON s.predicate = t.predicate
  WHERE t.subject IN (SELECT subject FROM targets)
)
SELECT predicate, CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(dtv) AS BIGINT) AS n_dt_viol,
       CAST(SUM(pv) AS BIGINT) AS n_pattern_viol
FROM v GROUP BY predicate ORDER BY predicate
"""


# --- SHACL closed-shape audit -----------------------------------------------------------


def shacl_closed(triples: "ray.data.Dataset", target_class: str,
                 allowed: list[str],
                 num_partitions: int | None = None
                 ) -> "ray.data.Dataset":
    """SHACL ``sh:closed`` audit: on target-class subjects, every
    predicate OUTSIDE the allowed list is a violation — the
    schema-drift detector a KG pipeline runs when an upstream
    template grows a property the downstream contract doesn't know.
    -> (predicate, n_triples, n_subjects), one row per unexpected
    predicate. Same one-exchange shred/audit shape as
    :func:`shacl_datatype`."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)
    allow = set(allowed) | {_RDF_TYPE}

    def shred(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        pred = t.column("predicate")
        is_target = pc.and_(pc.equal(pred, _RDF_TYPE),
                            pc.equal(t.column("object_value"),
                                     target_class))
        tt = t.filter(is_target)
        bad = t.filter(pc.invert(pc.is_in(
            pred, value_set=pa.array(sorted(allow)))))
        out = pd.DataFrame({
            "subject": np.concatenate([
                tt.column("subject").to_pandas().to_numpy(object),
                bad.column("subject").to_pandas().to_numpy(object)]),
            "predicate": np.concatenate([
                np.full(tt.num_rows, "__target__", object),
                bad.column("predicate").to_pandas()
                .to_numpy(object)])})
        h = pd.util.hash_pandas_object(out["subject"],
                                       index=False).to_numpy()
        out["pid"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        targets = set(g.loc[g["predicate"] == "__target__",
                            "subject"])
        v = g[(g["predicate"] != "__target__")
              & g["subject"].isin(targets)]
        return v.groupby("predicate", as_index=False).agg(
            n_triples=("subject", "size"),
            n_subjects=("subject", "nunique"))

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            shred, batch_format="pyarrow")
        .groupby("pid").map_groups(audit, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("predicate", as_index=False)[
            ["n_triples", "n_subjects"]].sum() \
        .sort_values("predicate")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "predicate": pa.array(cells["predicate"], pa.string()),
        "n_triples": pa.array(cells["n_triples"].to_numpy(np.int64)),
        "n_subjects": pa.array(
            cells["n_subjects"].to_numpy(np.int64))}))


def shacl_closed_query(sf_dir: str):
    """Closed-shape audit of the customer graph with ex:nation left
    off the allowed list — every customer carries exactly one
    unexpected triple, so the violation table is non-degenerate by
    construction."""
    from rdf_mapper_ray.pipelines.relational import \
        _customer_graph_cached
    return shacl_closed(
        _customer_graph_cached(sf_dir), f"{_EX}Customer",
        [f"{_EX}name", f"{_EX}segment", f"{_EX}acctbal"])


SHACL_CLOSED_ORACLE_SQL = f"""
WITH bad AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         '{_EX}nation' AS predicate
  FROM customer
)
SELECT predicate, CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subject) AS BIGINT) AS n_subjects
FROM bad GROUP BY predicate ORDER BY predicate
"""


# --- characteristic sets (RDF schema discovery) -------------------------------------------


def characteristic_sets(triples: "ray.data.Dataset",
                        num_partitions: int | None = None
                        ) -> "ray.data.Dataset":
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011) — THE
    classic RDF statistic: group subjects by their exact predicate
    set and count each set's population. Query optimizers estimate
    star-join cardinalities straight off this table, and for a KG
    builder it is the schema-conformance fingerprint (a guard-sparse
    property splits the population into with/without variants).
    -> (pred_set, n_subjects), pred_set = '|'-joined sorted distinct
    predicates.

    Shape: ONE hash(subject) exchange co-locates each subject's
    triples; the per-partition finish is a sorted-join string per
    subject plus a local set count, and the schema-bounded set table
    finishes driver-side (the number of DISTINCT characteristic sets
    is bounded by the template spec, not the data)."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select(["subject", "predicate"])
        h = pd.util.hash_pandas_object(
            t.column("subject").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def local_sets(g: pd.DataFrame) -> pd.DataFrame:
        cs = g.groupby("subject")["predicate"].agg(
            lambda p: "|".join(sorted(set(p))))
        out = cs.value_counts().rename_axis("pred_set") \
            .reset_index(name="n_subjects")
        return out

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            route, batch_format="pyarrow")
        .groupby("pid").map_groups(local_sets, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("pred_set", as_index=False)["n_subjects"].sum() \
        .sort_values("pred_set")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "pred_set": pa.array(cells["pred_set"], pa.string()),
        "n_subjects": pa.array(
            cells["n_subjects"].to_numpy(np.int64))}))


def char_sets_query(sf_dir: str):
    """Characteristic sets of the guard-sparse customer tier graph:
    the acctbal > 5000 guard splits customers into the with-tier and
    without-tier variants — exactly what the statistic exists to
    surface."""
    from rdf_mapper_ray.pipelines.relational import _cust_graph
    return characteristic_sets(_cust_graph(sf_dir))


CHAR_SETS_ORACLE_SQL = f"""
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         '{_RDF_TYPE}' AS predicate
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}name' FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}segment' FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}tier' FROM customer WHERE c_acctbal > 5000
),
cs AS (
  SELECT subject,
         string_agg(DISTINCT predicate, '|' ORDER BY predicate)
           AS pred_set
  FROM trip GROUP BY subject
)
SELECT pred_set, CAST(COUNT(*) AS BIGINT) AS n_subjects
FROM cs GROUP BY pred_set ORDER BY pred_set
"""


# --- URI namespace mining -----------------------------------------------------------------


def ns_mining(triples: "ray.data.Dataset",
              num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Subject-namespace statistics over a constructed graph: every
    subject's namespace is its scheme + authority + two path
    segments (hierarchical URIs nest arbitrarily deep — file URIs
    carry the repo path — so the fixed-depth rule is what groups
    them into publishable partitions), and the
    op reports triples and distinct subjects per namespace — what a
    publisher reads before choosing prefix declarations and what a
    void:uriSpace partition is built from (the subject-side
    complement of void_stats' predicate partitions).
    -> (namespace, n_triples, n_subjects).

    Shape: (namespace, subject) rows route on hash(subject) — every
    subject lands whole in one partition, so the per-partition
    nunique is exact and the namespace-bounded cells sum
    driver-side. Routing on the namespace itself would put the whole
    graph's dominant prefix on one task (skew by construction)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def shred(t: pa.Table) -> pa.Table:
        subj = t.column("subject")
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        ns = pc.extract_regex(
            subj, r"^(?P<ns>[a-z]+://[^/]+/[^/]+/[^/]+/)")
        ns = pc.struct_field(ns, "ns")
        out = pa.Table.from_pydict({
            "namespace": pc.fill_null(ns, ""),
            "subject": subj})
        h = pd.util.hash_pandas_object(
            out.column("subject").to_pandas(), index=False).to_numpy()
        return out.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("namespace", as_index=False).agg(
            n_triples=("subject", "size"),
            n_subjects=("subject", "nunique"))

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            shred, batch_format="pyarrow")
        .groupby("pid").map_groups(count, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("namespace", as_index=False)[
            ["n_triples", "n_subjects"]].sum() \
        .sort_values("namespace")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "namespace": pa.array(cells["namespace"], pa.string()),
        "n_triples": pa.array(cells["n_triples"].to_numpy(np.int64)),
        "n_subjects": pa.array(
            cells["n_subjects"].to_numpy(np.int64))}))


def ns_mining_query(sf_dir: str):
    """Namespace partition of the flagship source-code graph."""
    from rdf_mapper_ray.pipelines.sourcecode import flagship_cached
    return ns_mining(flagship_cached(sf_dir))


def ns_mining_oracle_sql() -> str:
    from rdf_mapper_ray.pipelines.sourcecode import \
        FLAGSHIP_ORACLE_SQL
    return f"""
WITH base AS ({FLAGSHIP_ORACLE_SQL}),
n AS (
  SELECT COALESCE(regexp_extract(subject,
             '^([a-z]+://[^/]+/[^/]+/[^/]+/)', 1), '')
           AS namespace,
         subject
  FROM base
)
SELECT namespace, CAST(COUNT(*) AS BIGINT) AS n_triples,
       CAST(COUNT(DISTINCT subject) AS BIGINT) AS n_subjects
FROM n GROUP BY namespace ORDER BY namespace
"""


# --- KG-embedding negative sampling (triple corruption) -------------------------------------


def kg_negatives(triples: "ray.data.Dataset", predicate: str
                 ) -> "ray.data.Dataset":
    """TransE-style negative sampling for KG-embedding training
    (Bordes et al., NeurIPS 2013): every (s, p, o) triple of the
    target predicate gets a corrupted object o' drawn
    DETERMINISTICALLY from the predicate's object vocabulary —
    ``o' = objects[md5_64(s) % |objects|]`` (portable, replayable,
    reshuffling-proof) — plus the collision flag marking corruptions
    that accidentally reproduce a true triple (the filtered-negatives
    discipline). The target predicate must be FUNCTIONAL (one object
    per subject — asserted), so the collision test is an equality
    against the row's own object; for non-functional predicates the
    stated venue is a broadcast/bloom membership probe of the
    (s, o) pair set. -> (subject, object_value, neg_object,
    collides).

    Shape: the object vocabulary is predicate-bounded (broadcast as a
    sorted array); the corruption itself is map-only, zero
    exchanges."""
    import pyarrow.compute as pc

    from rdf_mapper_ray.ops.hashing import hash64

    def only_pred(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("predicate"), predicate)) \
            .select(["subject", "object_value"])

    pred_rows = triples.map_batches(
        only_pred, batch_format="pyarrow").materialize()
    objs = sorted(set(
        v for b in pred_rows.iter_batches(batch_format="pyarrow")
        for v in b.column("object_value").to_pylist()))
    n_obj = len(objs)
    vocab = np.array(objs, dtype=object)
    ref = ray.put(vocab)

    def corrupt(t: pa.Table) -> pa.Table:
        v = ray.get(ref)
        subj = t.column("subject").to_pylist()
        h = hash64(subj, "md5") % np.uint64(n_obj)
        neg = v[h.astype(np.int64)]
        obj = t.column("object_value").to_pandas().to_numpy(object)
        return pa.Table.from_pydict({
            "subject": t.column("subject"),
            "object_value": t.column("object_value"),
            "neg_object": pa.array(list(neg), pa.string()),
            "collides": pa.array((neg == obj)),
        })

    return pred_rows.map_batches(corrupt, batch_format="pyarrow")


def kg_negatives_query(sf_dir: str):
    """Corrupt the customer graph's functional ex:nation edges."""
    from rdf_mapper_ray.pipelines.relational import \
        _customer_graph_cached
    return kg_negatives(_customer_graph_cached(sf_dir),
                        f"{_EX}nation")


def kg_negatives_oracle_sql() -> str:
    from rdf_mapper_ray.ops.hashing import MD5_HASH64_SQL
    h = MD5_HASH64_SQL.format(col="subject")
    return f"""
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         'http://example.org/nation/' || CAST(c_nationkey AS VARCHAR)
           AS object_value
  FROM customer
),
vocab AS (
  SELECT object_value AS o,
         row_number() OVER (ORDER BY object_value) - 1 AS idx
  FROM (SELECT DISTINCT object_value FROM trip)
),
n AS (SELECT COUNT(*) AS n FROM vocab)
SELECT t.subject, t.object_value, v.o AS neg_object,
       v.o = t.object_value AS collides
FROM trip t
JOIN vocab v ON v.idx = CAST({h} % (SELECT n FROM n) AS BIGINT)
ORDER BY t.subject
"""


# --- KG release gate (composition) -----------------------------------------------------------


def kg_release_query(sf_dir: str):
    """Release-gate dashboard for the customer graph — the
    composition a publisher runs before shipping a snapshot, four
    audits over ONE cached extraction (the corpus_prep discipline:
    chained ops, one oracle CTE chain): total triples, distinct
    subjects, SHACL cardinality violations (the guard-sparse tier),
    pattern violations (segment must start a–f), characteristic-set
    count, and namespace count. -> one row.

    Every number rides an op that is itself an oracle-checked query
    (shacl_cardinality / shacl_datatype / characteristic_sets /
    ns_mining); this entry checks their COMPOSITION end to end."""
    from rdf_mapper_ray.pipelines.relational import _cust_graph

    g = _cust_graph(sf_dir)
    ex = "http://example.org/def/"

    card = shacl_cardinality(
        g, f"{ex}Customer",
        [(f"{ex}name", 1, 1), (f"{ex}segment", 1, 1),
         (f"{ex}tier", 1, 1)]).to_pandas()
    dtv = shacl_datatype(
        g, f"{ex}Customer",
        [(f"{ex}segment", None, r"[a-f][a-z]*")]).to_pandas()
    cs = characteristic_sets(g).to_pandas()
    ns = ns_mining(g).to_pandas()

    n_triples = int(ns["n_triples"].sum())
    n_subjects = int(ns["n_subjects"].sum())
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_triples": pa.array([n_triples], pa.int64()),
        "n_subjects": pa.array([n_subjects], pa.int64()),
        "n_min_viol": pa.array([int(card["n_min_viol"].sum())],
                               pa.int64()),
        "n_pattern_viol": pa.array(
            [int(dtv["n_pattern_viol"].sum())], pa.int64()),
        "n_char_sets": pa.array([len(cs)], pa.int64()),
        "n_namespaces": pa.array([len(ns)], pa.int64())}))


KG_RELEASE_ORACLE_SQL = f"""
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject,
         '{_RDF_TYPE}' AS predicate,
         '{_EX}Customer' AS object_value
  FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}name', c_name FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}segment', lower(c_mktsegment) FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}tier', replace(lower(c_mktsegment), ' ', '-')
  FROM customer WHERE c_acctbal > 5000
),
ns AS (
  SELECT COALESCE(regexp_extract(subject,
             '^([a-z]+://[^/]+/[^/]+/[^/]+/)', 1), '') AS namespace,
         subject
  FROM trip
),
cs AS (
  SELECT subject,
         string_agg(DISTINCT predicate, '|' ORDER BY predicate)
           AS pred_set
  FROM trip GROUP BY subject
),
-- min-count violations: tier is the only sparse shape (guard)
tier AS (
  SELECT COUNT(*) AS missing FROM customer WHERE c_acctbal <= 5000
),
pat AS (
  SELECT COUNT(*) AS v FROM trip
  WHERE predicate = '{_EX}segment'
    AND NOT regexp_full_match(COALESCE(object_value, ''),
                              '[a-f][a-z]*')
)
SELECT CAST((SELECT COUNT(*) FROM trip) AS BIGINT) AS n_triples,
       CAST((SELECT COUNT(DISTINCT subject) FROM trip) AS BIGINT)
         AS n_subjects,
       CAST((SELECT missing FROM tier) AS BIGINT) AS n_min_viol,
       CAST((SELECT v FROM pat) AS BIGINT) AS n_pattern_viol,
       CAST((SELECT COUNT(DISTINCT pred_set) FROM cs) AS BIGINT)
         AS n_char_sets,
       CAST((SELECT COUNT(DISTINCT namespace) FROM ns) AS BIGINT)
         AS n_namespaces
"""


# --- subject out-degree profile ------------------------------------------------------------


def subject_profile(triples: "ray.data.Dataset",
                    num_partitions: int | None = None
                    ) -> "ray.data.Dataset":
    """Subject out-degree profile of a constructed graph: how many
    subjects carry exactly k triples — the KG shape histogram (a
    spike = a template family, a long tail = heterogeneous nesting;
    the first thing to diff across releases next to void_stats).
    -> (n_triples_per_subject, n_subjects).

    Shape: per-batch subject-count partials, ONE hash(subject)
    exchange merges split subjects, per-partition histograms, and
    the degree-bounded cells sum driver-side."""
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def partial(t: pa.Table) -> pa.Table:
        c = t.select(["subject"]) \
            .group_by(["subject"], use_threads=False) \
            .aggregate([([], "count_all")])
        h = pd.util.hash_pandas_object(
            c.column("subject").to_pandas(), index=False).to_numpy()
        return c.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("subject")["count_all"].sum()
        v, c = np.unique(per.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"k": v, "n": c.astype(np.int64)})

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            partial, batch_format="pyarrow")
        .groupby("pid").map_groups(hist, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby("k", as_index=False)["n"].sum().sort_values("k")
    return ray.data.from_arrow(pa.Table.from_pydict({
        "n_triples_per_subject": pa.array(
            cells["k"].to_numpy(np.int64)),
        "n_subjects": pa.array(cells["n"].to_numpy(np.int64))}))


def subject_profile_query(sf_dir: str):
    from rdf_mapper_ray.pipelines.sourcecode import flagship_cached
    return subject_profile(flagship_cached(sf_dir))


def subject_profile_oracle_sql() -> str:
    from rdf_mapper_ray.pipelines.sourcecode import \
        FLAGSHIP_ORACLE_SQL
    return f"""
WITH base AS ({FLAGSHIP_ORACLE_SQL}),
per AS (SELECT subject, COUNT(*) AS k FROM base GROUP BY subject)
SELECT CAST(k AS BIGINT) AS n_triples_per_subject,
       CAST(COUNT(*) AS BIGINT) AS n_subjects
FROM per GROUP BY k ORDER BY n_triples_per_subject
"""


# --- predicate co-occurrence ----------------------------------------------------------------


def predicate_cooccur(triples: "ray.data.Dataset",
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """Pairwise predicate co-occurrence within subjects — the edge
    weights of the SCHEMA graph (which properties travel together;
    characteristic sets' pairwise marginal, and what a query
    optimizer prices p1 ⋈ p2 subject joins with).
    -> (pred_a, pred_b, n_subjects), pred_a < pred_b.

    Shape: ONE hash(subject) exchange co-locates each subject's
    predicates; the per-partition pair fan-out is C(|preds|, 2) per
    subject — template-bounded BY CONSTRUCTION (a spec emits a fixed
    property set), never data-sized; predicate-pair cells sum
    driver-side."""
    from itertools import combinations

    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def route(t: pa.Table) -> pa.Table:
        t = t.select(["subject", "predicate"])
        h = pd.util.hash_pandas_object(
            t.column("subject").to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[tuple, int] = {}
        for _, grp in g.groupby("subject", sort=False):
            for a, b in combinations(
                    sorted(set(grp["predicate"])), 2):
                out[(a, b)] = out.get((a, b), 0) + 1
        return pd.DataFrame({
            "pred_a": [k[0] for k in out],
            "pred_b": [k[1] for k in out],
            "n": np.fromiter(out.values(), np.int64, len(out))})

    cells = pd.concat(
        b.to_pandas() for b in triples.map_batches(
            route, batch_format="pyarrow")
        .groupby("pid").map_groups(pairs, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")) \
        .groupby(["pred_a", "pred_b"], as_index=False)["n"].sum() \
        .sort_values(["pred_a", "pred_b"])
    return ray.data.from_arrow(pa.Table.from_pydict({
        "pred_a": pa.array(cells["pred_a"], pa.string()),
        "pred_b": pa.array(cells["pred_b"], pa.string()),
        "n_subjects": pa.array(cells["n"].to_numpy(np.int64))}))


def predicate_cooccur_query(sf_dir: str):
    """Schema graph of the guard-sparse customer tier graph: tier
    co-occurs with the others on only the acctbal > 5000 subjects."""
    from rdf_mapper_ray.pipelines.relational import _cust_graph
    return predicate_cooccur(_cust_graph(sf_dir))


PREDICATE_COOCCUR_ORACLE_SQL = f"""
WITH trip AS (
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR)
           AS subject, '{_RDF_TYPE}' AS predicate FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}name' FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}segment' FROM customer
  UNION ALL
  SELECT 'http://example.org/cust/' || CAST(c_custkey AS VARCHAR),
         '{_EX}tier' FROM customer WHERE c_acctbal > 5000
),
d AS (SELECT DISTINCT subject, predicate FROM trip)
SELECT a.predicate AS pred_a, b.predicate AS pred_b,
       CAST(COUNT(*) AS BIGINT) AS n_subjects
FROM d a JOIN d b
  ON a.subject = b.subject AND a.predicate < b.predicate
GROUP BY pred_a, pred_b ORDER BY pred_a, pred_b
"""
