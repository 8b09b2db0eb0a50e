"""Basic-graph-pattern matching over the materialized triple table —
the "query the graph you just built" step: SPARQL's BGP core (a
conjunction of triple patterns with shared variables) evaluated as a
left-deep chain of the repo's own distributed equi-joins, plus the
algebra one level up: OPTIONAL (left outer join), UNION (bag union of
arms with null-padded variable alignment) and FILTER (vectorized
constraint masks over the bindings).

Each pattern first PRUNES the triple table with vectorized constant
filters (subject / predicate / object equality — one Arrow mask per
batch, predicate selectivity does the heavy lifting exactly as a
triple-store's POS index would), projects its variables, and then
joins the accumulated bindings on the shared variables (star / path /
tree BGPs — the standard left-deep plan). Joins on ONE shared
variable ride the distributed equi-join directly; multiple shared
variables join on a composite key column built per batch (map-only).
A pattern sharing NO variable with the bindings so far is a cartesian
product and is rejected loudly.

OPTIONAL groups follow SPARQL's well-designed-pattern restriction:
every variable an optional group shares with the outside must be
bound by the REQUIRED patterns (not by a sibling OPTIONAL), so each
group is exactly one left outer join and unmatched bindings
null-extend. FILTERs evaluate with SPARQL error semantics: a
comparison touching an unbound (null) variable is an error, and an
error eliminates the binding (``fill_null(mask, False)``).

Scale: the triple table streams — each pattern's filter is map-only,
and the only exchanges are the per-join co-partitions on the shared
variable. Constants never ride the shuffle (projected away before the
join)."""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SLOTS = ("subject", "predicate", "object_value")
_JK = "__jk"
_SEP = "\x1f"


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _scan(triples: "ray.data.Dataset",
          pattern: tuple[str, str, str]) -> "ray.data.Dataset":
    """One triple pattern -> Dataset of its variable bindings."""
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


def _with_jk(ds: "ray.data.Dataset", vars_: Sequence[str]
             ) -> "ray.data.Dataset":
    """Append a composite string join key over ``vars_`` (map-only).
    A null in any component nulls the key, so SQL join semantics give
    SPARQL's "unbound never matches a bound value" for free."""
    cols = list(vars_)

    def fn(batch: pa.Table) -> pa.Table:
        if len(cols) == 1:
            key = batch.column(cols[0])
        else:
            key = pc.binary_join_element_wise(
                *[batch.column(c).cast(pa.string()) for c in cols],
                _SEP, null_handling="emit_null")
        return batch.append_column(_JK, key.cast(pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _str_schema(vars_: Sequence[str]) -> pa.Schema:
    """Static schema of a binding set + join key — every BGP binding
    column is a string (the triple table carries strings), so an
    empty scan never strands a join without a schema."""
    return pa.schema([(v, pa.string()) for v in vars_]
                     + [(_JK, pa.string())])


def _eval_required(triples: "ray.data.Dataset",
                   patterns: list[tuple[str, str, str]],
                   num_partitions: int
                   ) -> tuple["ray.data.Dataset", list[str]]:
    from rdf_mapper_ray.ops.joins import equi_join

    acc = _scan(triples, patterns[0])
    acc_vars = []
    for t in patterns[0]:
        if _is_var(t) and t[1:] not in acc_vars:
            acc_vars.append(t[1:])
    for pattern in patterns[1:]:
        pat_vars = []
        for t in pattern:
            if _is_var(t) and t[1:] not in pat_vars:
                pat_vars.append(t[1:])
        shared = [v for v in pat_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"pattern {pattern} shares no variable with the "
                f"bindings so far ({acc_vars}) — cartesian BGPs are "
                f"not supported")
        rhs = _scan(triples, pattern)
        acc = equi_join(_with_jk(acc, shared), _with_jk(rhs, shared),
                        left_on=_JK, right_on=_JK, how="inner",
                        venue="copartition",
                        num_partitions=num_partitions,
                        left_schema=_str_schema(acc_vars),
                        right_schema=_str_schema(pat_vars))
        drop = [_JK, _JK + "_r"] + [v + "_r" for v in shared]

        def post(batch: pa.Table, _drop=tuple(drop)) -> pa.Table:
            return batch.drop_columns(
                [c for c in _drop if c in batch.column_names])

        acc = acc.map_batches(post, batch_format="pyarrow")
        acc_vars += [v for v in pat_vars if v not in acc_vars]
    return acc, acc_vars


def _pin_triples(triples: "ray.data.Dataset",
                 num_partitions: Optional[int]
                 ) -> tuple["ray.data.Dataset", int]:
    """Materialize the triple table and derive the join partition
    count from its actual row count (metadata on a materialized
    Dataset). Re-entrant: a second call on the already-materialized
    table is a no-op recompute of pinned blocks. At 100 TB the pin
    trades object-store residency (with spill) for N-pattern scan
    reuse — strictly better than N re-extractions; callers with a
    cheap re-scannable source (parquet triples) can pre-materialize
    or pass num_partitions to keep the same behavior."""
    triples = triples.materialize()
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import _num_partitions
        num_partitions = max(8, _num_partitions(triples.count()) // 8)
    # compact: the extraction pipeline emits many small blocks and
    # every downstream join pays the blocks × partitions sort floor
    if triples.num_blocks() > 2 * num_partitions:
        triples = triples.repartition(num_partitions).materialize()
    return triples, num_partitions


_FILTER_OPS = {
    "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
    "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def _apply_filters(ds: "ray.data.Dataset",
                   filters: Sequence[tuple[str, str, str]],
                   acc_vars: Sequence[str]) -> "ray.data.Dataset":
    """FILTER constraints: ``(lhs, op, rhs)`` where lhs/rhs are
    ``?var`` or literal strings and op is one of == != < <= > >=
    contains ~ (regex). String comparison semantics (the triple table
    carries strings); error-eliminates on unbound."""
    for lhs, op, rhs in filters:
        for term in (lhs, rhs):
            if _is_var(term) and term[1:] not in acc_vars:
                raise ValueError(f"FILTER references unbound {term}")
        if op not in _FILTER_OPS and op not in ("contains", "~"):
            raise ValueError(f"unsupported FILTER op {op!r}")

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for lhs, op, rhs in filters:
            lv = batch.column(lhs[1:]) if _is_var(lhs) else lhs
            rv = batch.column(rhs[1:]) if _is_var(rhs) else rhs
            if op == "contains":
                m = pc.match_substring(lv, rv)
            elif op == "~":
                m = pc.match_substring_regex(lv, rv)
            else:
                m = _FILTER_OPS[op](lv, rv)
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return ds.map_batches(fn, batch_format="pyarrow")


def bgp_match(triples: "ray.data.Dataset",
              patterns: list[tuple[str, str, str]],
              optional: Optional[list[list[tuple[str, str, str]]]] = None,
              filters: Optional[Sequence[tuple[str, str, str]]] = None,
              minus: Optional[list[list[tuple[str, str, str]]]] = None,
              exists: Optional[list[list[tuple[str, str, str]]]] = None,
              not_exists: Optional[list[list[tuple[str, str, str]]]] = None,
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """-> Dataset of bindings, one column per distinct ``?var``.

    ``patterns`` is the required BGP; ``optional`` is a list of
    pattern GROUPS, each evaluated as its own BGP and left-outer
    joined on the variables it shares with the required part (which
    must all be required-bound — the well-designed restriction);
    ``filters`` are ``(lhs, op, rhs)`` constraints applied last.

    Negation algebra (SPARQL 1.1 §8): ``minus`` groups remove
    bindings COMPATIBLE with some solution of the group on their
    shared variables — a distributed anti-join; a MINUS group sharing
    NO variable removes nothing (the spec's disjoint-domain rule).
    ``exists`` / ``not_exists`` groups are FILTER (NOT) EXISTS —
    semi / anti joins on the shared variables; with NO shared
    variable the group's global (non-)emptiness gates ALL bindings
    (one count, evaluated once — the uncorrelated EXISTS). Shared
    variables must be required-bound (the same well-designed
    restriction as OPTIONAL), which keeps every negation one exact
    null-free key join."""
    if not patterns:
        raise ValueError("empty BGP")
    from rdf_mapper_ray.ops.joins import equi_join

    # materialize the triple table ONCE: every pattern scans it, so a
    # lazy upstream (a full KG-extraction pipeline) would otherwise
    # re-execute per pattern — measured 4x wall on the union demo.
    # The materialized count is metadata, so the join partition count
    # scales with the REAL triple count instead of the untagged
    # cluster default (the blocks × partitions floor, ops/readers.py).
    triples, num_partitions = _pin_triples(triples, num_partitions)

    acc, acc_vars = _eval_required(triples, patterns, num_partitions)
    required_vars = list(acc_vars)

    for group in (optional or []):
        g_ds, g_vars = _eval_required(triples, group, num_partitions)
        shared = [v for v in g_vars if v in acc_vars]
        if not shared:
            raise ValueError(
                f"OPTIONAL group {group} shares no variable with the "
                f"required patterns — cartesian OPTIONALs are not "
                f"supported")
        not_required = [v for v in shared if v not in required_vars]
        if not_required:
            raise ValueError(
                f"OPTIONAL group {group} joins on {not_required}, "
                f"bound only by a sibling OPTIONAL — only "
                f"well-designed patterns are supported")
        acc = equi_join(_with_jk(acc, shared), _with_jk(g_ds, shared),
                        left_on=_JK, right_on=_JK, how="left",
                        venue="copartition",
                        num_partitions=num_partitions,
                        left_schema=_str_schema(acc_vars),
                        right_schema=_str_schema(g_vars))
        drop = [_JK, _JK + "_r"] + [v + "_r" for v in shared]

        def post(batch: pa.Table, _drop=tuple(drop)) -> pa.Table:
            return batch.drop_columns(
                [c for c in _drop if c in batch.column_names])

        acc = acc.map_batches(post, batch_format="pyarrow")
        acc_vars += [v for v in g_vars if v not in acc_vars]

    neg_groups = ([(g, "anti", "MINUS", True) for g in (minus or [])]
                  + [(g, "semi", "EXISTS", False) for g in (exists or [])]
                  + [(g, "anti", "NOT EXISTS", False)
                     for g in (not_exists or [])])
    for group, how, kind, skip_disjoint in neg_groups:
        g_ds, g_vars = _eval_required(triples, group, num_partitions)
        shared = [v for v in g_vars if v in acc_vars]
        if not shared:
            if skip_disjoint:      # MINUS with disjoint domains: no-op
                continue
            # uncorrelated (NOT) EXISTS: one global emptiness test
            nonempty = bool(g_ds.limit(1).count())
            keep = nonempty if kind == "EXISTS" else not nonempty
            if keep:
                continue
            acc = acc.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")
            continue
        not_required = [v for v in shared if v not in required_vars]
        if not_required:
            raise ValueError(
                f"{kind} group {group} joins on {not_required}, not "
                f"bound by the required patterns — only well-designed "
                f"patterns are supported")

        # prune the group to its shared variables before the exchange:
        # a semi/anti probe side never needs its private bindings
        def proj(batch: pa.Table, _shared=tuple(shared)) -> pa.Table:
            return batch.select(list(_shared))

        acc = equi_join(_with_jk(acc, shared),
                        _with_jk(g_ds.map_batches(
                            proj, batch_format="pyarrow"), shared),
                        left_on=_JK, right_on=_JK, how=how,
                        venue="copartition",
                        num_partitions=num_partitions,
                        left_schema=_str_schema(acc_vars),
                        right_schema=_str_schema(shared))

        def unjk(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(
                [c for c in (_JK,) if c in batch.column_names])

        acc = acc.map_batches(unjk, batch_format="pyarrow")

    if filters:
        acc = _apply_filters(acc, filters, acc_vars)
    return acc


def bgp_union(triples: "ray.data.Dataset",
              arms: list[dict],
              num_partitions: Optional[int] = None
              ) -> "ray.data.Dataset":
    """SPARQL UNION: evaluate each arm (a dict of ``bgp_match``
    kwargs: patterns / optional / filters) and take the bag union of
    the binding multisets, null-padding variables an arm does not
    bind (SPARQL bindings are partial functions; UNION does not
    require arms to share a schema)."""
    if not arms:
        raise ValueError("empty UNION")
    # pin once here so the per-arm bgp_match materializations are
    # no-op re-pins of the same blocks, not arm-count re-extractions
    triples, num_partitions = _pin_triples(triples, num_partitions)
    results = []
    all_vars: list[str] = []
    for arm in arms:
        ds = bgp_match(triples, num_partitions=num_partitions, **arm)
        vars_ = []
        for p in list(arm["patterns"]) + [
                q for g in arm.get("optional") or [] for q in g]:
            for t in p:
                if _is_var(t) and t[1:] not in vars_:
                    vars_.append(t[1:])
        results.append((ds, vars_))
        all_vars += [v for v in vars_ if v not in all_vars]

    padded = []
    for ds, vars_ in results:
        missing = [v for v in all_vars if v not in vars_]

        def pad(batch: pa.Table, _missing=tuple(missing),
                _order=tuple(all_vars)) -> pa.Table:
            for v in _missing:
                batch = batch.append_column(
                    v, pa.nulls(batch.num_rows, type=pa.string()))
            return batch.select(list(_order))

        padded.append(ds.map_batches(pad, batch_format="pyarrow"))

    out = padded[0]
    for ds in padded[1:]:
        out = out.union(ds)
    return out


def _tc_send(state, adj):
    """Pregel transitive closure: fresh (node, target) pairs propagate
    to the node's IN-neighbors (adj rows dir=0: node, other=in-nbr)."""
    import pandas as pd
    if state is None or not len(state):
        return None
    f = state.loc[state["fresh"] == 1, ["node", "target"]]
    if not len(f):
        return None
    e = adj.loc[adj["dir"] == 0, ["node", "other"]]
    m = e.merge(f, on="node")
    if not len(m):
        return None
    out = pd.DataFrame({"node": m["other"].to_numpy(),
                        "target": m["target"].to_numpy()})
    return out.drop_duplicates()


def _tc_reduce(msgs, state):
    """Append pairs not seen before (semi-naive delta), mark them
    fresh; everything else goes stale."""
    import numpy as np
    import pandas as pd
    if not len(state):
        return state, 0
    state = state.copy()
    state["fresh"] = np.int64(0)
    if msgs is None or not len(msgs):
        return state, 0
    new = msgs[["node", "target"]].drop_duplicates()
    m = new.merge(state[["node", "target"]].assign(_old=1),
                  on=["node", "target"], how="left")
    new = m[m["_old"].isna()][["node", "target"]]
    if not len(new):
        return state, 0
    new = new.assign(fresh=np.int64(1))
    return (pd.concat([state, new], ignore_index=True), len(new))


def path_plus(triples: "ray.data.Dataset", predicate: str,
              src_name: str = "src", dst_name: str = "dst",
              max_depth: int = 32,
              num_partitions: Optional[int] = None,
              venue: str = "dataset"
              ) -> "ray.data.Dataset":
    """SPARQL property path ``?s <p>+ ?o`` — the transitive closure of
    one predicate's edge set, evaluated SEMI-NAIVELY (Datalog's
    delta-iteration): round k joins only the NEW pairs found in round
    k-1 against the base edges, then anti-joins against everything
    reached so far, so work per round is proportional to the delta,
    not the closure. Converges in O(longest simple path) rounds; every
    round is two pid-routed exchanges (join on the frontier's dst =
    edge src; dedup on the (src, dst) pair), block-size-independent.

    The base edge table is routed ONCE per role and reused; cycles
    terminate naturally because the anti-join empties the frontier.
    -> (src, dst) string columns, one row per reachable pair.

    ``venue="actors"`` runs the same semi-naive delta on the
    persistent Pregel pool (row-identical, unit-asserted): reach-sets
    live in the partition actors and only fresh pairs move per round.
    On a 150-deep chain the actors venue closes in ~11 s where the
    dataset venue's 150 rounds of exchanges exceed 10 minutes
    (measured at 8 cpus) — the venue for long-diameter graphs."""
    import numpy as np
    import pandas as pd

    triples, num_partitions = _pin_triples(triples, num_partitions)

    def scan(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(
            pc.equal(batch.column("predicate"), predicate), False)
        t = batch.filter(m)
        return pa.Table.from_pydict({
            "a": t.column("subject").cast(pa.string()),
            "b": t.column("object_value").cast(pa.string()),
        })

    def _route(col: str):
        def _r(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.column(col).to_pandas(), index=False).to_numpy()
            return t.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))
        return _r

    def _route_pair(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("a"), t.column("b"), _SEP)
        h = pd.util.hash_pandas_object(
            key.to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    edges = triples.map_batches(scan, batch_format="pyarrow")

    if venue == "actors":
        # transitive closure on the persistent Pregel pool (tenth
        # algorithm on engine/pregel.py): each partition holds its
        # nodes' reach-sets as (node, target) rows; per round only the
        # FRESH pairs move, to the node's in-neighbors (the same
        # semi-naive delta discipline as the dataset venue below, so
        # the two are row-identical — unit-asserted). Wins on
        # long-diameter graphs where the dataset venue re-ships the
        # edge table O(depth) times.
        from rdf_mapper_ray.engine.pregel import PregelPool

        def adj_rows(t: pa.Table) -> pa.Table:
            import numpy as np
            a = t.column("a")
            b = t.column("b")
            a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) \
                else a
            b = b.combine_chunks() if isinstance(b, pa.ChunkedArray) \
                else b
            n = len(a)
            tbl = pa.Table.from_pydict({
                # dir=0: keyed by edge dst, other = in-neighbor (send)
                # dir=1: keyed by edge src, other = dst (seed pairs)
                "node": pa.concat_arrays([b, a]),
                "other": pa.concat_arrays([a, b]),
                "dir": pa.array(np.concatenate([
                    np.zeros(n, np.int64), np.ones(n, np.int64)])),
            })
            import pandas as pd
            h = pd.util.hash_pandas_object(
                tbl.column("node").to_pandas(), index=False).to_numpy()
            return tbl.append_column(
                "pid", pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64)))

        adjacency = edges.map_batches(adj_rows, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
        pool = PregelPool(adjacency, num_partitions,
                          _tc_send, _tc_reduce)
        empty = pa.Table.from_pydict({
            "node": pa.array([], pa.string()),
            "target": pa.array([], pa.string()),
            "fresh": pa.array([], pa.int64())})

        def seed(adj_df):
            import numpy as np
            s = adj_df.loc[adj_df["dir"] == 1, ["node", "other"]] \
                .drop_duplicates()
            return s.rename(columns={"other": "target"}) \
                .assign(fresh=np.int64(1))

        pool.init_state_from_adj(seed, empty)
        pool.run(max_depth)
        out = pool.collect().map_batches(
            lambda t: pa.Table.from_pydict({
                src_name: t.column("node"),
                dst_name: t.column("target")}),
            batch_format="pyarrow")
        pool.shutdown()
        return out

    # base edges routed by SRC once, reused as the join's right side
    edges_by_src = edges.map_batches(_route("a"), batch_format="pyarrow") \
        .materialize()

    reach = edges.map_batches(_route_pair, batch_format="pyarrow") \
        .materialize()
    frontier = reach

    def _tag(kind: int, cols: dict):
        def _t(t: pa.Table) -> pa.Table:
            out = {k: t.column(v) for k, v in cols.items()}
            out["kind"] = pa.array(
                np.full(t.num_rows, kind, dtype=np.int8))
            out["pid"] = t.column("pid")
            return pa.Table.from_pydict(out)
        return _t

    for _ in range(max_depth):
        # join frontier.b == edges.a  (route frontier by b)
        f_by_dst = frontier.drop_columns(["pid"]) \
            .map_batches(_route("b"), batch_format="pyarrow")

        def join(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["kind"] == 1, ["a", "b"]] \
                .rename(columns={"a": "src", "b": "mid"})
            e = g.loc[g["kind"] == 0, ["a", "b"]] \
                .rename(columns={"a": "mid", "b": "dst"})
            m = f.merge(e, on="mid")[["src", "dst"]] \
                .drop_duplicates()
            return m.rename(columns={"src": "a", "dst": "b"})

        msgs = edges_by_src.map_batches(
                _tag(0, {"a": "a", "b": "b"}), batch_format="pyarrow") \
            .union(f_by_dst.map_batches(
                _tag(1, {"a": "a", "b": "b"}), batch_format="pyarrow")) \
            .groupby("pid").map_groups(join, batch_format="pandas")

        # anti-join against reach on the (a, b) pair
        merged = msgs.map_batches(_route_pair, batch_format="pyarrow") \
            .map_batches(_tag(0, {"a": "a", "b": "b"}),
                         batch_format="pyarrow") \
            .union(reach.map_batches(_tag(1, {"a": "a", "b": "b"}),
                                     batch_format="pyarrow"))

        def fresh(g: pd.DataFrame) -> pd.DataFrame:
            old = g.loc[g["kind"] == 1, ["a", "b"]]
            new = g.loc[g["kind"] == 0, ["a", "b"]].drop_duplicates()
            m = new.merge(old.assign(_old=1), on=["a", "b"],
                          how="left")
            out = m[m["_old"].isna()][["a", "b"]]
            out["pid"] = np.zeros(len(out), dtype=np.int64)
            return out

        new_pairs = merged.groupby("pid").map_groups(
            fresh, batch_format="pandas") \
            .map_batches(lambda t: t.drop_columns(["pid"]),
                         batch_format="pyarrow") \
            .map_batches(_route_pair, batch_format="pyarrow") \
            .materialize()
        if not new_pairs.count():
            break
        reach = reach.union(new_pairs).materialize()
        frontier = new_pairs

    def out(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            src_name: t.column("a"), dst_name: t.column("b")})

    return reach.map_batches(out, batch_format="pyarrow")


def _distinct_rows(ds: "ray.data.Dataset", cols: Sequence[str],
                   num_partitions: int) -> "ray.data.Dataset":
    """Distinct over a column tuple: hash(tuple)-route, per-partition
    pandas drop_duplicates — one exchange, no global sort."""
    import numpy as np
    import pandas as pd
    _cols = list(cols)

    def route(t: pa.Table) -> pa.Table:
        if len(_cols) == 1:
            key = t.column(_cols[0]).cast(pa.string())
        else:
            key = pc.binary_join_element_wise(
                *[t.column(c).cast(pa.string()) for c in _cols], _SEP)
        h = pd.util.hash_pandas_object(
            key.to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=_cols)[_cols]

    return ds.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(dd, batch_format="pandas")


def path_seq(triples: "ray.data.Dataset", predicates: Sequence[str],
             src_name: str = "src", dst_name: str = "dst",
             num_partitions: Optional[int] = None
             ) -> "ray.data.Dataset":
    """SPARQL sequence property path ``?s <p1>/<p2>/... ?o`` — a chain
    of co-partition equi-joins, one per step, mid variables projected
    away before each exchange (they are existential — only the
    endpoint pair survives). DISTINCT pairs (set semantics, matching
    ``path_plus``). -> (src, dst) string columns."""
    if not predicates:
        raise ValueError("empty sequence path")
    from rdf_mapper_ray.ops.joins import equi_join

    triples, num_partitions = _pin_triples(triples, num_partitions)

    def scan_edges(pred: str, an: str, bn: str) -> "ray.data.Dataset":
        def fn(batch: pa.Table) -> pa.Table:
            m = pc.fill_null(
                pc.equal(batch.column("predicate"), pred), False)
            t = batch.filter(m)
            return pa.Table.from_pydict({
                an: t.column("subject").cast(pa.string()),
                bn: t.column("object_value").cast(pa.string())})
        return triples.map_batches(fn, batch_format="pyarrow")

    acc = scan_edges(predicates[0], "a", "b")
    for pred in predicates[1:]:
        nxt = scan_edges(pred, "mid", "c")
        acc = equi_join(
            acc, nxt, left_on="b", right_on="mid", how="inner",
            venue="copartition", num_partitions=num_partitions,
            left_schema=pa.schema([("a", pa.string()),
                                   ("b", pa.string())]),
            right_schema=pa.schema([("mid", pa.string()),
                                    ("c", pa.string())]))

        def step(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "a": t.column("a"), "b": t.column("c")})

        acc = acc.map_batches(step, batch_format="pyarrow")

    out = _distinct_rows(acc, ["a", "b"], num_partitions)
    return out.map_batches(
        lambda g, _s=src_name, _d=dst_name: g.rename(
            columns={"a": _s, "b": _d}),
        batch_format="pandas")


def bgp_construct(triples: "ray.data.Dataset",
                  patterns: list[tuple[str, str, str]],
                  template: list[tuple[str, str, str]],
                  optional: Optional[list[list[tuple[str, str, str]]]] = None,
                  filters: Optional[Sequence[tuple[str, str, str]]] = None,
                  num_partitions: Optional[int] = None
                  ) -> "ray.data.Dataset":
    """SPARQL CONSTRUCT — instantiate ``template`` triples (terms are
    ``?var`` or constants) once per binding, drop incomplete triples
    (any term unbound, e.g. from OPTIONAL), and return the DISTINCT
    (subject, predicate, object_value) set: a graph is a set of
    triples. Map-only emission; the only exchange is the final
    distinct."""
    if not template:
        raise ValueError("empty CONSTRUCT template")
    b = bgp_match(triples, patterns, optional=optional, filters=filters,
                  num_partitions=num_partitions)
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import _num_partitions
        num_partitions = max(8, _num_partitions(None) // 8)
    slots = ("subject", "predicate", "object_value")

    def emit(batch: pa.Table) -> pa.Table:
        outs = []
        for tmpl in template:
            cols = {}
            for name, term in zip(slots, tmpl):
                if _is_var(term):
                    cols[name] = batch.column(term[1:]).cast(pa.string())
                else:
                    cols[name] = pa.array(
                        [term] * batch.num_rows, type=pa.string())
            t = pa.Table.from_pydict(cols)
            mask = None
            for name in slots:
                m = pc.is_valid(t.column(name))
                mask = m if mask is None else pc.and_(mask, m)
            outs.append(t.filter(mask))
        return pa.concat_tables(outs)

    g = b.map_batches(emit, batch_format="pyarrow")
    return _distinct_rows(g, list(slots), num_partitions)


def bgp_group_count(triples: "ray.data.Dataset",
                    patterns: list[tuple[str, str, str]],
                    group_var: str, count_name: str = "n_bindings",
                    num_partitions: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """SPARQL solution-group aggregation — ``SELECT ?g (COUNT(*) AS
    ?n) WHERE { ... } GROUP BY ?g``: the BGP's bindings reduce with a
    map-side combine (per-batch counts per group ride the one small
    exchange, never binding rows). -> (group_var, count_name)."""
    from ray.data.aggregate import Sum

    b = bgp_match(triples, patterns, num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        agg = t.select([group_var]) \
            .group_by([group_var], use_threads=False) \
            .aggregate([([], "count_all")])
        return agg.rename_columns([group_var, "c"])

    return b.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_var).aggregate(Sum("c")) \
        .map_batches(lambda t: pa.Table.from_pydict({
            group_var: t.column(group_var),
            count_name: pc.cast(t.column("sum(c)"), pa.int64())}),
            batch_format="pyarrow")


# --- SPARQL numeric aggregates over solution groups ----------------------------

def bgp_aggregate(triples: "ray.data.Dataset",
                  patterns: list[tuple[str, str, str]],
                  group_var: str, value_var: str, scale: int = 100,
                  num_partitions: Optional[int] = None
                  ) -> "ray.data.Dataset":
    """``SELECT ?g (COUNT(*) ?n) (SUM(?v)) (AVG(?v)) (MIN(?v))
    (MAX(?v)) WHERE { ... } GROUP BY ?g``. Triple objects are strings,
    so the value variable quantizes to int64 ``round(x·scale)`` units
    (the repo's exact-integer contract): SUM/MIN/MAX are exact ints
    in those units and AVG is the one double division, applied
    identically in the SQL oracle. Per-batch partials reduce
    map-side; only group-cardinality rows ride the exchange.
    -> (group_var, n, sum_c, avg, min_c, max_c)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    b = bgp_match(triples, patterns,
                  num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_var).to_pandas()
        v = np.rint(t.column(value_var).cast(pa.float64())
                    .to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        df = pd.DataFrame({group_var: g, "v": v})
        out = df.groupby(group_var, as_index=False)["v"].agg(
            n="size", s="sum", mn="min", mx="max")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = b.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_var).aggregate(
            Sum("n"), Sum("s"), Min("mn"), Max("mx"))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("sum(n)"), pa.int64())
        s = pc.cast(t.column("sum(s)"), pa.int64())
        return pa.Table.from_pydict({
            group_var: t.column(group_var), "n": n, "sum_c": s,
            "avg": pc.divide(pc.cast(s, pa.float64()),
                             pc.cast(n, pa.float64())),
            "min_c": pc.cast(t.column("min(mn)"), pa.int64()),
            "max_c": pc.cast(t.column("max(mx)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# --- SPARQL solution modifiers: ORDER BY ... LIMIT k ----------------------------

def bgp_order_limit(triples: "ray.data.Dataset",
                    patterns: list[tuple[str, str, str]],
                    order_var: str, k: int, descending: bool = True,
                    tie_var: Optional[str] = None, scale: int = 100,
                    num_partitions: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """``SELECT * WHERE { ... } ORDER BY DESC(xsd:decimal(?v)) ?tie
    LIMIT k``: the numeric sort key is the quantized int64 (exact, so
    cross-venue ordering is stable), ties break on ``tie_var`` for a
    deterministic top-k. Distributed top-k = Ray sort + limit (sort
    is the documented all-to-all; k rows leave it)."""
    b = bgp_match(triples, patterns, num_partitions=num_partitions)

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(order_var), pa.float64()),
            float(scale))), pa.int64())
        return t.append_column("__key", key)

    cols = ["__key"] + ([tie_var] if tie_var else [])
    out = b.map_batches(keyed, batch_format="pyarrow") \
        .sort(cols, descending=[descending] + [False] * (len(cols) - 1)) \
        .limit(k)
    return out.map_batches(
        lambda t: t.drop_columns(["__key"]), batch_format="pyarrow")


# --- SPARQL VALUES (inline data) and BIND (expression binding) ------------------

def apply_values(ds: "ray.data.Dataset", var: str,
                 allowed: Sequence[str]) -> "ray.data.Dataset":
    """``VALUES ?var { "a" "b" ... }`` joined into the solution
    sequence — with a constant-sized value list this is a vectorized
    is_in mask, the broadcast-semi-join venue of SPARQL's inline
    data."""
    allowed_arr = pa.array(list(allowed), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.is_in(batch.column(var),
                                  value_set=allowed_arr), False)
        return batch.filter(m)

    return ds.map_batches(fn, batch_format="pyarrow")


def bind_concat(ds: "ray.data.Dataset", new_var: str,
                parts: Sequence[str]) -> "ray.data.Dataset":
    """``BIND(CONCAT(...) AS ?new)``: parts are ``?var`` references
    or literal strings; a null input nulls the binding (SPARQL error
    semantics -> unbound). Map-only."""
    def fn(batch: pa.Table) -> pa.Table:
        cols = [batch.column(p[1:]) if _is_var(p)
                else pa.array([p] * batch.num_rows, pa.string())
                for p in parts]
        val = pc.binary_join_element_wise(
            *[c.cast(pa.string()) for c in cols], "",
            null_handling="emit_null")
        return batch.append_column(new_var, val)

    return ds.map_batches(fn, batch_format="pyarrow")


# --- SPARQL ASK -------------------------------------------------------------------

def bgp_ask(triples: "ray.data.Dataset",
            patterns: list[tuple[str, str, str]],
            filters: Optional[Sequence[tuple[str, str, str]]] = None,
            num_partitions: Optional[int] = None) -> pa.Table:
    """``ASK WHERE { ... }`` -> one-row (ask: bool) table. limit(1)
    keeps the streaming executor from materializing more than the
    first matching binding block."""
    b = bgp_match(triples, patterns, filters=filters,
                  num_partitions=num_partitions)
    found = b.limit(1).count() > 0
    return pa.Table.from_pydict({"ask": pa.array([found])})


# --- SPARQL path alternation / inverse: (p1 | ^p2) ------------------------------

def path_alt(triples: "ray.data.Dataset",
             predicates: Sequence[str] = (),
             inverse_predicates: Sequence[str] = (),
             num_partitions: Optional[int] = None
             ) -> "ray.data.Dataset":
    """Property-path alternation with inverse arms:
    ``?a (p1 | p2 | ^q1) ?b`` = the set-union of each arm's (a, b)
    pairs, inverse arms swapping subject/object. Each arm is one
    vectorized predicate scan (map-only); the union dedups through
    one routed drop_duplicates exchange (SPARQL path semantics are
    set-valued). -> (src, dst)."""
    triples, num_partitions = _pin_triples(triples, num_partitions)
    arms = []
    for p in predicates:
        arms.append(_scan(triples, ("?src", p, "?dst")))
    for p in inverse_predicates:
        arms.append(_scan(triples, ("?dst", p, "?src"))
                    .map_batches(lambda t: t.select(["src", "dst"]),
                                 batch_format="pyarrow"))
    if not arms:
        raise ValueError("path_alt needs at least one arm")
    acc = arms[0]
    for a in arms[1:]:
        acc = acc.union(a)
    return _distinct_rows(acc, ["src", "dst"], num_partitions)


def path_star(triples: "ray.data.Dataset", predicate: str,
              src_name: str = "src", dst_name: str = "dst",
              max_depth: int = 32,
              num_partitions: Optional[int] = None,
              venue: str = "dataset") -> "ray.data.Dataset":
    """SPARQL property path ``?s <p>* ?o`` — zero-or-more: the
    transitive closure (path_plus, either venue) UNION the identity
    pair (n, n) for every node of the predicate's edge set, made
    distinct (a cycle's closure already contains its self-pairs).
    ``path_zero_or_one`` (p?) composes the same way from the base
    edges instead of the closure."""
    plus = path_plus(triples, predicate, src_name, dst_name,
                     max_depth, num_partitions, venue)
    if num_partitions is None:
        from rdf_mapper_ray.ops.dedup import partitions_for
        num_partitions = partitions_for(triples, 8)

    def ident(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(
            pc.equal(batch.column("predicate"), predicate), False)
        t = batch.filter(m)
        s = t.column("subject").cast(pa.string())
        o = t.column("object_value").cast(pa.string())
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        o = o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o
        both = pa.concat_arrays([s, o])
        return pa.Table.from_pydict({src_name: both, dst_name: both})

    merged = plus.union(triples.map_batches(ident,
                                            batch_format="pyarrow"))
    return _distinct_rows(merged, [src_name, dst_name],
                          num_partitions)


def negated_path(triples: "ray.data.Dataset",
                 excluded: Sequence[str],
                 src_name: str = "src", pred_name: str = "p",
                 dst_name: str = "dst") -> "ray.data.Dataset":
    """SPARQL 1.1 negated property set ``?s !(p1|...|pk) ?o`` — every
    triple whose predicate is NOT in the set. Map-only (one vectorized
    mask per batch, nothing shuffles)."""
    preds = list(excluded)

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for p in preds:
            m = pc.not_equal(batch.column("predicate"), p)
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            batch = batch.filter(pc.fill_null(mask, False))
        return pa.Table.from_pydict({
            src_name: batch.column("subject").cast(pa.string()),
            pred_name: batch.column("predicate").cast(pa.string()),
            dst_name: batch.column("object_value").cast(pa.string()),
        })

    return triples.map_batches(fn, batch_format="pyarrow")


# --- SPARQL HAVING over solution groups -----------------------------------------

def bgp_having(triples: "ray.data.Dataset",
               patterns: list[tuple[str, str, str]],
               group_var: str, value_var: str, sample_var: str,
               scale: int = 100, avg_floor_units: int = 0,
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """``SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?sum) (SAMPLE(?s))
    WHERE { ... } GROUP BY ?g HAVING (AVG(?v) > floor)`` — the
    post-aggregate filter of the SPARQL algebra. The HAVING predicate
    is evaluated in EXACT integers (``sum > floor·n`` instead of the
    float average), and SAMPLE — implementation-defined in the spec —
    is pinned to MIN(?s) so the result is deterministic and the
    DuckDB oracle replays it. Same map-side-combine shape as
    bgp_aggregate: per-batch partials ride the one group-sized
    exchange, the HAVING filter runs on the group table.
    -> (group_var, n, sum_c, sample)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    b = bgp_match(triples, patterns, num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_var: t.column(group_var).to_pandas(),
            "v": np.rint(t.column(value_var).cast(pa.float64())
                         .to_numpy(zero_copy_only=False)
                         * scale).astype(np.int64),
            "smp": t.column(sample_var).to_pandas(),
        })
        out = df.groupby(group_var, as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), smp=("smp", "min"))
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = b.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_var).aggregate(Sum("n"), Sum("s"), Min("smp"))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("sum(n)"), pa.int64())
        s = pc.cast(t.column("sum(s)"), pa.int64())
        keep = pc.greater(s, pc.multiply(n, avg_floor_units))
        out = pa.Table.from_pydict({
            group_var: t.column(group_var), "n": n, "sum_c": s,
            "sample": t.column("min(smp)")})
        return out.filter(keep)

    return agg.map_batches(finish, batch_format="pyarrow")


# --- SPARQL DESCRIBE --------------------------------------------------------------

def bgp_describe(triples: "ray.data.Dataset",
                 patterns: list[tuple[str, str, str]], var: str,
                 num_partitions: Optional[int] = None
                 ) -> "ray.data.Dataset":
    """``DESCRIBE ?x WHERE { ... }`` — the description form is
    implementation-defined by the SPARQL spec; this engine pins it to
    "every triple whose SUBJECT is a solution of ?x" (the asymmetric
    concise-bounded-description core), so the result is deterministic
    and the SQL oracle replays it. One distinct exchange for the
    solution set, then a hash(subject)-co-partitioned semi-join of the
    triple table against it (equi_join's venue dispatch: broadcast
    below threshold, routed above). -> (subject, predicate,
    object_value)."""
    from rdf_mapper_ray.ops.joins import equi_join

    triples, num_partitions = _pin_triples(triples, num_partitions)
    b = bgp_match(triples, patterns, num_partitions=num_partitions)
    subjects = _distinct_rows(b, [var], num_partitions) \
        .map_batches(lambda t: pa.Table.from_pydict(
            {"x": t.column(var)}), batch_format="pyarrow")

    body = triples.map_batches(
        lambda t: pa.Table.from_pydict({
            "subject": t.column("subject").cast(pa.string()),
            "predicate": t.column("predicate").cast(pa.string()),
            "object_value": t.column("object_value").cast(pa.string()),
        }), batch_format="pyarrow")
    return equi_join(body, subjects, "subject", "x", how="semi",
                     num_partitions=num_partitions)


# --- SPARQL 1.1 subquery: group-aggregate sub-SELECT + FILTER --------------------

def bgp_filter_above_group_avg(triples: "ray.data.Dataset",
                               patterns: list[tuple[str, str, str]],
                               group_var: str, value_var: str,
                               scale: int = 100,
                               num_partitions: Optional[int] = None
                               ) -> "ray.data.Dataset":
    """SPARQL 1.1 subquery (§12): solutions whose value exceeds their
    group's average —

        SELECT ?g ?s ?v WHERE {
          <outer patterns binding ?g ?s ?v>
          { SELECT ?g (AVG(?v2) AS ?avg) WHERE { ... } GROUP BY ?g }
          FILTER(?v > ?avg)
        }

    The inner SELECT reuses :func:`bgp_aggregate` (map-side partials,
    one group-cardinality exchange) and its result is GROUP-sized, so
    it broadcasts once (``ray.put``) instead of riding a shuffle join;
    the outer match then filters map-side with zero further exchanges.
    The comparison cross-multiplies — ``v·n > sum`` — so the whole
    query stays in the exact-integer contract (no float division to
    drift against the oracle). -> outer solution columns with the
    value re-emitted as int64 ``<value_var>_c`` units."""
    triples, num_partitions = _pin_triples(triples, num_partitions)
    import numpy as np
    import pandas as pd

    import ray

    agg = bgp_aggregate(triples, patterns, group_var, value_var,
                        scale=scale,
                        num_partitions=num_partitions).to_pandas()
    n_by_g = pd.Series(agg["n"].to_numpy(np.int64),
                       index=agg[group_var])
    s_by_g = pd.Series(agg["sum_c"].to_numpy(np.int64),
                       index=agg[group_var])
    ref = ray.put((n_by_g, s_by_g))

    b = bgp_match(triples, patterns, num_partitions=num_partitions)

    def filt(t: pa.Table) -> pa.Table:
        n_map, s_map = ray.get(ref)
        g = t.column(group_var).to_pandas()
        v = np.rint(t.column(value_var).cast(pa.float64())
                    .to_numpy(zero_copy_only=False)
                    * scale).astype(np.int64)
        n = g.map(n_map).to_numpy(np.int64)
        s = g.map(s_map).to_numpy(np.int64)
        keep = v * n > s
        out = t.drop_columns([value_var]) \
            .append_column(f"{value_var}_c", pa.array(v))
        return out.filter(pa.array(keep))

    return b.map_batches(filt, batch_format="pyarrow")


# --- SPARQL GROUP_CONCAT aggregate ------------------------------------------------

def bgp_group_concat(triples: "ray.data.Dataset",
                     patterns: list[tuple[str, str, str]],
                     group_var: str, value_var: str,
                     separator: str = ",",
                     num_partitions: Optional[int] = None
                     ) -> "ray.data.Dataset":
    """``SELECT ?g (GROUP_CONCAT(?v; separator=S) AS ?vals) GROUP BY
    ?g`` — pinned to the deterministic ordered form (values sort
    ascending within the group; SPARQL leaves the order
    implementation-defined, the oracle replays ``string_agg(v, S
    ORDER BY v)``). One hash(group) exchange co-locates each group;
    the per-group join runs once per GROUP (group-cardinality — the
    exchange already shrank the data), not per row.
    -> (group_var, n, vals)."""
    import numpy as np
    import pandas as pd

    triples, num_partitions = _pin_triples(triples, num_partitions)
    b = bgp_match(triples, patterns, num_partitions=num_partitions)

    def route(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.column(group_var).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "pid", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_var, value_var], kind="stable")
        by = g.groupby(group_var, sort=False)[value_var]
        out = by.agg(lambda s: separator.join(s))
        n = by.size()
        return pd.DataFrame({group_var: out.index.to_numpy(),
                             "n": n.to_numpy(np.int64),
                             "vals": out.to_numpy()})

    return b.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(concat, batch_format="pandas")


def path_range(triples: "ray.data.Dataset", predicate: str,
               lo: int = 1, hi: int = 3,
               src_name: str = "src", dst_name: str = "dst",
               num_partitions: Optional[int] = None
               ) -> "ray.data.Dataset":
    """Bounded-length property path ``?s <p>{lo,hi} ?o`` (the
    SPARQL 1.1 draft's counted form, still the common engine
    extension): DISTINCT pairs connected by a p-chain of length
    between lo and hi. Evaluated as hi-1 chained co-partition
    equi-joins with a per-depth distinct (the depth-indexed variant
    of path_plus — bounded depth means no fixpoint test, and the
    per-depth dedup keeps the frontier set-sized on cyclic graphs).
    -> (src, dst) string columns."""
    if not (1 <= lo <= hi):
        raise ValueError(f"bad path range {{{lo},{hi}}}")
    from rdf_mapper_ray.ops.joins import equi_join

    triples, num_partitions = _pin_triples(triples, num_partitions)

    def scan(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(
            pc.equal(batch.column("predicate"), predicate), False)
        t = batch.filter(m)
        return pa.Table.from_pydict({
            "a": t.column("subject").cast(pa.string()),
            "b": t.column("object_value").cast(pa.string())})

    edges = triples.map_batches(scan, batch_format="pyarrow") \
        .materialize()
    cur = _distinct_rows(edges, ["a", "b"], num_partitions)
    collected = [cur] if lo <= 1 else []
    for depth in range(2, hi + 1):
        nxt = equi_join(
            cur, edges.map_batches(
                lambda t: t.rename_columns(["mid", "c"]),
                batch_format="pyarrow"),
            left_on="b", right_on="mid", how="inner",
            venue="copartition", num_partitions=num_partitions,
            left_schema=pa.schema([("a", pa.string()),
                                   ("b", pa.string())]),
            right_schema=pa.schema([("mid", pa.string()),
                                    ("c", pa.string())]))

        def step(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "a": t.column("a"), "b": t.column("c")})

        cur = _distinct_rows(nxt.map_batches(
            step, batch_format="pyarrow"), ["a", "b"], num_partitions)
        if depth >= lo:
            collected.append(cur)

    u = collected[0]
    for c in collected[1:]:
        u = u.union(c)
    out = _distinct_rows(u, ["a", "b"], num_partitions)
    return out.map_batches(
        lambda g, _s=src_name, _d=dst_name: g.rename(
            columns={"a": _s, "b": _d}),
        batch_format="pandas")
