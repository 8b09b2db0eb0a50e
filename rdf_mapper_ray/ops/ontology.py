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
