"""Basic-graph-pattern matching over the materialized triple table —
the "query the graph you just built" step: SPARQL's BGP core (a
conjunction of triple patterns with shared variables) evaluated as a
left-deep chain of the repo's own distributed equi-joins.

Each pattern first PRUNES the triple table with vectorized constant
filters (subject / predicate / object equality — one Arrow mask per
batch, predicate selectivity does the heavy lifting exactly as a
triple-store's POS index would), projects its variables, and then
joins the accumulated bindings on ONE shared variable per step
(star / path / tree BGPs — the standard left-deep plan); any
additional shared variables are checked with a post-join filter.
A pattern sharing NO variable with the bindings so far is a cartesian
product and is rejected loudly.

Scale: the triple table streams — each pattern's filter is map-only,
and the only exchanges are the per-join co-partitions on the shared
variable. Constants never ride the shuffle (projected away before the
join)."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SLOTS = ("subject", "predicate", "object_value")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp_match(triples: "ray.data.Dataset",
              patterns: list[tuple[str, str, str]],
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """-> Dataset of bindings, one column per distinct ``?var``."""
    if not patterns:
        raise ValueError("empty BGP")

    def scan(pattern: tuple[str, str, str]) -> "ray.data.Dataset":
        consts = [(slot, t) for slot, t in zip(_SLOTS, pattern)
                  if not _is_var(t)]
        out_vars: list[tuple[str, str]] = []
        seen: dict[str, str] = {}
        dup_checks: list[tuple[str, str]] = []
        for slot, t in zip(_SLOTS, pattern):
            if _is_var(t):
                name = t[1:]
                if name in seen:        # ?x ?p ?x — same var twice
                    dup_checks.append((seen[name], slot))
                else:
                    seen[name] = slot
                    out_vars.append((slot, name))

        def fn(batch: pa.Table) -> pa.Table:
            mask = None
            for slot, val in consts:
                m = pc.equal(batch.column(slot), val)
                m = pc.fill_null(m, False)
                mask = m if mask is None else pc.and_(mask, m)
            for a, b in dup_checks:
                m = pc.fill_null(pc.equal(batch.column(a),
                                          batch.column(b)), False)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                batch = batch.filter(mask)
            return pa.Table.from_pydict({
                name: batch.column(slot) for slot, name in out_vars})

        return triples.map_batches(fn, batch_format="pyarrow")

    from rdf_mapper_ray.ops.dedup import partitions_for
    from rdf_mapper_ray.ops.joins import equi_join
    if num_partitions is None:
        num_partitions = partitions_for(triples, 8)

    acc = scan(patterns[0])
    acc_vars = [t[1:] for t in patterns[0] if _is_var(t)]
    for pattern in patterns[1:]:
        pat_vars = [t[1:] for t in pattern if _is_var(t)]
        shared = [v for v in pat_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"pattern {pattern} shares no variable with the "
                f"bindings so far ({acc_vars}) — cartesian BGPs are "
                f"not supported")
        rhs = scan(pattern)
        join_var, rest = shared[0], shared[1:]
        acc = equi_join(acc, rhs, left_on=join_var, right_on=join_var,
                        how="inner", venue="copartition",
                        num_partitions=num_partitions)

        drop = [join_var + "_r"] + [v + "_r" for v in rest]

        def post(batch: pa.Table, _rest=tuple(rest), _drop=tuple(drop)
                 ) -> pa.Table:
            mask = None
            for v in _rest:
                m = pc.fill_null(pc.equal(batch.column(v),
                                          batch.column(v + "_r")),
                                 False)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                batch = batch.filter(mask)
            return batch.drop_columns(
                [c for c in _drop if c in batch.column_names])

        acc = acc.map_batches(post, batch_format="pyarrow")
        acc_vars += [v for v in pat_vars if v not in acc_vars]
    return acc
