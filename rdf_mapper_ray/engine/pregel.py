"""Pregel-style persistent-actor venue for iterative graph algorithms.

The Dataset venues in :mod:`rdf_mapper_ray.ops.graphs` (bfs_levels,
sssp_bounded, community_lpa) pid-route the adjacency ONCE and reuse
it, but every round the adjacency blocks still ride the round's
``union(...).groupby("pid")`` exchange — at web-graph scale the static
edge set is re-shuffled O(diameter) times.  This venue removes that:
a pool of P persistent actors each holds ONE hash partition of the
adjacency in memory (loaded once), plus that partition's node state.
Per round only the *messages* move, actor-to-actor through the object
store (each actor ``ray.put``s one table per destination partition;
the driver forwards only the tiny ref matrix, never the data).  This
is the standard Pregel/BSP execution shape (Malewicz et al., SIGMOD
2010) expressed with Ray actors.

Algorithms plug in as two plain functions over pandas frames (the
exact same kernels the Dataset venue runs inside ``map_groups``), so
venue equality is testable row-for-row:

- ``send(state, adj) -> msgs``: frame with a ``node`` destination
  column plus payload columns; evaluated against the partition's
  adjacency ``(node, other[, w])``.
- ``reduce(msgs, state) -> (new_state, changed)``: fold the incoming
  messages into the partition's state; ``changed`` drives the global
  convergence vote (sum over partitions, a P-sized driver reduction).

Partitioning contract: a node's state and all adjacency rows keyed by
that node live in partition ``hash(node) % P`` — the same
``pd.util.hash_pandas_object`` routing the Dataset venues use, so the
two venues are bit-identical.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


# released-but-alive actor sets, keyed by partition count — reused by
# the next PregelPool of the same size (see _acquire_actors)
_RELEASED_ACTORS: dict[int, list] = {}


def pid_of(nodes, num_partitions: int) -> np.ndarray:
    """The repo-standard node -> partition hash (must match the
    Dataset venues' ``_pid`` helpers)."""
    h = pd.util.hash_pandas_object(pd.Series(nodes),
                                   index=False).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int64)


@ray.remote
def _block_pids(t: pa.Table) -> list:
    """Which partitions' rows live in this adjacency block (blocks
    come out of a pid groupby, so usually 1-2 pids per block).
    Empty groupby output blocks carry an empty schema — skip them.
    Blocks may be pandas (upstream map_groups) or Arrow."""
    if isinstance(t, pd.DataFrame):
        if not len(t) or "pid" not in t.columns:
            return []
        return np.unique(t["pid"].to_numpy()).tolist()
    if t.num_rows == 0 or "pid" not in t.schema.names:
        return []
    return np.unique(t.column("pid").to_numpy()).tolist()


@ray.remote
class _PregelPart:
    """One vertex partition: adjacency rows + node state, resident
    for the whole run. Messages leave via ``ray.put`` per destination
    partition; inbound refs are resolved inside the actor, so message
    bytes never touch the driver."""

    def __init__(self, pid: int, num_partitions: int,
                 send_fn: Callable, reduce_fn: Callable):
        self._pid = pid
        self._num_partitions = num_partitions
        self._send = send_fn
        self._reduce = reduce_fn
        self._adj: Optional[pd.DataFrame] = None
        self._state: Optional[pd.DataFrame] = None

    def load_adj(self, refs: list) -> int:
        parts = []
        for t in ray.get(list(refs)):
            if isinstance(t, pd.DataFrame):
                t = pa.Table.from_pandas(t, preserve_index=False)
            t = t.filter(pa.compute.equal(
                t.column("pid"), pa.scalar(self._pid, pa.int64())))
            if t.num_rows:
                parts.append(t.drop_columns(["pid"]).to_pandas())
        self._adj = (pd.concat(parts, ignore_index=True) if parts
                     else None)
        return 0 if self._adj is None else len(self._adj)

    def init_state(self, table: pa.Table) -> int:
        self._state = table.to_pandas()
        return len(self._state)

    def init_state_from_adj(self, fn: Callable, empty: pa.Table) -> int:
        """Derive the initial per-node state from this partition's own
        adjacency (e.g. LPA's label=node) — no driver node table."""
        if self._adj is None or not len(self._adj):
            self._state = empty.to_pandas()
        else:
            self._state = fn(self._adj)
        return len(self._state)

    def send_msgs(self) -> list:
        P = self._num_partitions
        if (self._adj is None or self._state is None
                or not len(self._state)):
            return [None] * P
        msgs = self._send(self._state, self._adj)
        if msgs is None or not len(msgs):
            return [None] * P
        pids = pid_of(msgs["node"].to_numpy(), P)
        out: list = [None] * P
        for j in np.unique(pids):
            part = msgs.iloc[np.flatnonzero(pids == j)]
            out[int(j)] = ray.put(
                pa.Table.from_pandas(part, preserve_index=False))
        return out

    def apply_msgs(self, refs: list) -> int:
        live = [r for r in refs if r is not None]
        tables = ray.get(live) if live else []
        if not tables and (self._state is None
                           or not len(self._state)):
            return 0
        msgs = (pd.concat([t.to_pandas() for t in tables],
                          ignore_index=True) if tables
                else None)
        state = (self._state if self._state is not None
                 else pd.DataFrame())
        self._state, changed = self._reduce(msgs, state)
        return int(changed)

    def rebind(self, send_fn: Callable, reduce_fn: Callable) -> int:
        self._send = send_fn
        self._reduce = reduce_fn
        return 0

    def transform_state(self, fn: Callable) -> int:
        if self._state is not None and len(self._state):
            self._state = fn(self._state)
        return 0 if self._state is None else len(self._state)

    def transform_adj(self, fn: Callable) -> int:
        if self._adj is not None and len(self._adj):
            self._adj = fn(self._adj)
        return 0 if self._adj is None else len(self._adj)

    def write_state(self, path: str) -> int:
        import pyarrow.parquet as pq
        t = (pa.Table.from_pandas(self._state, preserve_index=False)
             if self._state is not None and len(self._state)
             else None)
        if t is None:
            # empty partitions still write a (schema-less) marker so
            # restore can distinguish "empty" from "missing"
            t = pa.Table.from_pydict({"__empty": pa.array([1])})
        pq.write_table(t, path)
        return 0 if self._state is None else len(self._state)

    def read_state(self, path: str) -> int:
        import pyarrow.parquet as pq
        t = pq.read_table(path)
        if "__empty" in t.schema.names:
            self._state = (self._state.iloc[:0]
                           if self._state is not None else
                           pd.DataFrame())
            return 0
        self._state = t.to_pandas()
        return len(self._state)

    def clear(self) -> int:
        """Drop the adjacency and state references so a released
        (cached) actor pins no object-store or heap memory."""
        self._adj = None
        self._state = None
        return 0

    def state_rows(self) -> int:
        return 0 if self._state is None else len(self._state)

    def state_table(self) -> pa.Table:
        if self._state is None or not len(self._state):
            return None
        return pa.Table.from_pandas(self._state,
                                    preserve_index=False)


class PregelPool:
    """Build the actor pool from a pid-tagged adjacency Dataset and
    run rounds until convergence (or ``max_rounds``).

    ``adjacency`` must carry int64 ``node`` and a ``pid`` column
    routed with :func:`pid_of`; any other columns ride along into the
    per-partition adjacency frame (``other``, weights, ...).
    """

    def __init__(self, adjacency: "ray.data.Dataset",
                 num_partitions: int,
                 send_fn: Callable, reduce_fn: Callable,
                 reuse: bool = True):
        self._P = num_partitions
        # One exchange total: co-partition the adjacency by pid so each
        # block holds few pids, then hand each actor only the blocks
        # that contain its pid (zero-copy plasma reads; on a cluster a
        # block ships to at most the 1-2 actors that own its pids).
        routed = adjacency.groupby("pid").map_groups(
            lambda g: g, batch_format="pyarrow").materialize()
        refs = routed.to_arrow_refs()
        blk_pids = ray.get([_block_pids.remote(r) for r in refs])
        self._reusable = reuse
        self._actors = self._acquire_actors(send_fn, reduce_fn)
        loads = []
        for i, a in enumerate(self._actors):
            mine = [r for r, ps in zip(refs, blk_pids) if i in ps]
            loads.append(a.load_adj.remote(mine))
        ray.get(loads)

    def _acquire_actors(self, send_fn: Callable,
                        reduce_fn: Callable) -> list:
        """Reuse a released actor set of the same partition count when
        one exists (actor spawn is the dominant cold cost of a small
        pool run — ~0.3-1 s per fresh worker process); kernels rebind
        and the adjacency reloads, so reuse is semantics-free. A dead
        cached set (killed cluster worker) falls back to a respawn."""
        cached = _RELEASED_ACTORS.pop(self._P, None) \
            if self._reusable else None
        if cached is not None:
            try:
                ray.get([a.rebind.remote(send_fn, reduce_fn)
                         for a in cached], timeout=30)
                return cached
            except Exception:
                for a in cached:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
        return [_PregelPart.remote(i, self._P, send_fn, reduce_fn)
                for i in range(self._P)]

    def init_state(self, table: pa.Table) -> None:
        """Scatter a driver-built initial state (small: e.g. the BFS
        source row). Rows route by hash(node)."""
        pids = pid_of(table.column("node").to_numpy(), self._P)
        empty = table.slice(0, 0)
        calls = []
        for i, a in enumerate(self._actors):
            mask = pa.array(pids == i)
            calls.append(a.init_state.remote(table.filter(mask)
                                             if mask.true_count
                                             else empty))
        ray.get(calls)

    def init_state_from_adj(self, fn: Callable,
                            empty: pa.Table) -> None:
        ray.get([a.init_state_from_adj.remote(fn, empty)
                 for a in self._actors])

    def run(self, max_rounds: int,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 8) -> int:
        """Run synchronous rounds; returns the number executed.
        Stops early when no partition reports a change.

        ``checkpoint_dir`` makes long runs resumable: every
        ``checkpoint_every`` rounds the per-partition node states
        write to ``<dir>/round=<k>/part-<pid>.parquet`` with a
        manifest sealed AFTER the data (the repo's write_partitioned
        discipline). A restarted job rebuilds the pool (adjacency
        re-loads from its source) and calls
        :meth:`restore_checkpoint` before ``run`` — at 100 TB the
        adjacency is a re-read, the O(rounds) message history is NOT
        re-paid."""
        import json
        import os
        rounds = 0
        for _ in range(max_rounds):
            mats = ray.get([a.send_msgs.remote()
                            for a in self._actors])
            changed = ray.get([
                self._actors[j].apply_msgs.remote(
                    [mats[i][j] for i in range(self._P)])
                for j in range(self._P)])
            rounds += 1
            if not sum(changed):
                break
            if checkpoint_dir and rounds % checkpoint_every == 0:
                d = os.path.join(checkpoint_dir, f"round={rounds}")
                os.makedirs(d, exist_ok=True)
                ray.get([a.write_state.remote(
                    os.path.join(d, f"part-{i}.parquet"))
                    for i, a in enumerate(self._actors)])
                with open(os.path.join(d, "_MANIFEST.json"),
                          "w") as f:
                    json.dump({"round": rounds,
                               "partitions": self._P}, f)
        return rounds

    def rebind(self, send_fn: Callable, reduce_fn: Callable,
               transform: Optional[Callable] = None) -> None:
        """Swap the message kernels (and optionally transform each
        partition's state in place) — a multi-phase algorithm (e.g. a
        forward shortest-path-counting pass then a backward dependency
        accumulation) runs on ONE pool without reloading the adjacency
        or round-tripping state through storage."""
        ray.get([a.rebind.remote(send_fn, reduce_fn)
                 for a in self._actors])
        if transform is not None:
            ray.get([a.transform_state.remote(transform)
                     for a in self._actors])

    def transform_adj(self, fn: Callable) -> int:
        """Rewrite each partition's RESIDENT adjacency in place (e.g.
        drop edges incident to nodes a previous phase consumed) —
        multi-phase residual algorithms (greedy coloring, peeling)
        run every phase on ONE pool instead of rebuilding it per
        phase. Returns the total remaining adjacency rows, so callers
        can stop when the residual graph empties."""
        return sum(ray.get([a.transform_adj.remote(fn)
                            for a in self._actors]))

    def checkpoint(self, checkpoint_dir: str, round_no: int = 0) -> None:
        """Write the current per-partition states as a sealed
        checkpoint (same layout run() writes) — lets a SECOND pool
        with the same partition count take over the state (e.g. a
        backward pass over a forward pass's result) without the
        driver ever holding the node table."""
        import json
        import os
        d = os.path.join(checkpoint_dir, f"round={round_no}")
        os.makedirs(d, exist_ok=True)
        ray.get([a.write_state.remote(
            os.path.join(d, f"part-{i}.parquet"))
            for i, a in enumerate(self._actors)])
        with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
            json.dump({"round": round_no, "partitions": self._P}, f)

    def restore_checkpoint(self, checkpoint_dir: str) -> int:
        """Load the LATEST sealed checkpoint into the pool's actors;
        returns the round number it represents (0 if none found).
        Only sealed rounds (manifest present) count — a crash mid-
        write leaves no manifest and the round is ignored."""
        import json
        import os
        rounds = []
        if os.path.isdir(checkpoint_dir):
            for name in os.listdir(checkpoint_dir):
                man = os.path.join(checkpoint_dir, name,
                                   "_MANIFEST.json")
                if name.startswith("round=") and os.path.exists(man):
                    with open(man) as f:
                        m = json.load(f)
                    if m["partitions"] != self._P:
                        raise ValueError(
                            f"checkpoint {name} has "
                            f"{m['partitions']} partitions, pool "
                            f"has {self._P}")
                    rounds.append(int(name.split("=", 1)[1]))
        if not rounds:
            return 0
        k = max(rounds)
        d = os.path.join(checkpoint_dir, f"round={k}")
        ray.get([a.read_state.remote(
            os.path.join(d, f"part-{i}.parquet"))
            for i, a in enumerate(self._actors)])
        return k

    def collect(self) -> "ray.data.Dataset":
        """Final state as a Dataset WITHOUT driver materialization:
        the per-partition state tables stay in the object store
        (actor-owned refs) and are copied into job-owned blocks so
        :meth:`shutdown` can't strand them."""
        counts = ray.get([a.state_rows.remote()
                          for a in self._actors])
        live = [a.state_table.remote()
                for a, c in zip(self._actors, counts) if c]
        if not live:
            raise ValueError("pregel: empty final state")
        return ray.data.from_arrow_refs(live) \
            .map_batches(lambda t: t, batch_format="pyarrow") \
            .materialize()

    def shutdown(self) -> None:
        """Release the actors for reuse by the next same-size pool
        (cleared of adjacency/state first); kill them when reuse is
        off or a released set of this size is already cached."""
        if not self._actors:
            return
        if self._reusable and self._P not in _RELEASED_ACTORS:
            try:
                ray.get([a.clear.remote() for a in self._actors],
                        timeout=30)
                _RELEASED_ACTORS[self._P] = self._actors
                self._actors = []
                return
            except Exception:
                pass
        for a in self._actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self._actors = []
