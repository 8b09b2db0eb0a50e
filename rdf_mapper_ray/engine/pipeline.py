"""End-to-end KG construction pipeline (SURVEY.md §7.1).

driver:  compile spec → evaluate one_offs (broadcast backlinks)
stream:  read(+row numbers) → ExtractTriples actor pool
         → [mention resolve: distinct → actor pool → broadcast join]
         → canonicalize (owl:sameAs union-find + broadcast rewrite)
         → global dedup (local distinct → 128-bit hash groupby)
         → sort → parquet (or Turtle/SPARQL text for small outputs)

Checkpoint/resume (north_rule): ``run_sharded`` processes the input in
file shards, writing each shard's extract output + a lineage manifest
under ``<workdir>/extract/shard=<id>/``; completed shards are skipped on
rerun, and the wide stages read the checkpointed triple table instead of
re-extracting.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from rdf_mapper_ray.engine.canonicalize import canonicalize_sameas
from rdf_mapper_ray.engine.dedup import (distinct_triples,
                                          distinct_triples_pointer)
from rdf_mapper_ray.engine.extract import (
    METRICS_GRAPH,
    ExtractTriples,
    evaluate_one_offs,
)
from rdf_mapper_ray.engine.reconcile import (
    InlineReconciler,
    resolve_mentions,
    split_mentions,
)
from rdf_mapper_ray.engine.schema import COLUMNS, quads_to_table
from rdf_mapper_ray.engine.sinks import sort_triples, write_triples_parquet
from rdf_mapper_ray.engine.sources import expand_paths, read_parquet_rows
from rdf_mapper_ray.kernel.spec import MapperSpec

log = logging.getLogger(__name__)

import pyarrow.compute as pc


class KGPipeline:
    def __init__(self, spec: MapperSpec | dict, auto_declare: bool = True,
                 abort_on_error: bool = False,
                 reconcile_backend: Any = None,
                 reconcile_mode: str = "inline",
                 canonicalize: bool = True,
                 batch_size: int = 2048,
                 extract_concurrency: Optional[int] = None,
                 emit_metrics: bool = False,
                 vectorize: bool = True,
                 rows_per_block: int = 8192,
                 dedup_strategy: str = "groupby") -> None:
        if isinstance(spec, dict):
            spec = MapperSpec(spec, auto_declare=auto_declare)
        self.spec = spec
        self.ship = spec.ship_state()
        self.abort_on_error = abort_on_error
        self.reconcile_backend = reconcile_backend
        self.reconcile_mode = reconcile_mode
        self.canonicalize = canonicalize
        self.batch_size = batch_size
        self.extract_concurrency = extract_concurrency
        self.emit_metrics = emit_metrics
        self.vectorize = vectorize
        # "groupby": streaming full-row distinct (default; exact by
        # column comparison). "pointer": materialize + 128-bit-hash
        # pointer shuffle (engine/dedup.py distinct_triples_pointer) —
        # ~10x less shuffle volume on wide rows.
        self.dedup_strategy = dedup_strategy
        # per-row extraction parallelism is block-count-bound; when any
        # resource needs the per-row kernel, small inputs (one fat block)
        # are split to ~rows_per_block rows so CPU-heavy extraction
        # spreads across cores. Fully-vectorized specs skip the split.
        self.rows_per_block = rows_per_block
        if vectorize:
            from rdf_mapper_ray.engine.vectorized import compile_spec
            self._any_slow = len(compile_spec(self.spec)) < len(
                self.spec.resources)
        else:
            self._any_slow = True
        self.one_off_quads, self.one_off_backlinks = evaluate_one_offs(spec)
        self.preserved_graphs: set[str] = set()

    # -- stages -------------------------------------------------------------

    def extract(self, ds: "ray.data.Dataset",
                emit_metrics: Optional[bool] = None,
                rows_hint: Optional[int] = None) -> "ray.data.Dataset":
        mention_mode = (self.reconcile_backend is not None
                        and self.reconcile_mode == "mentions")
        reconciler = None
        if self.reconcile_backend is not None and not mention_mode:
            reconciler = InlineReconciler(self.reconcile_backend)
        if self.rows_per_block:
            # per-row kernel: small blocks = max CPU parallelism; fully
            # vectorized specs: ~one block per core — fewer, fatter
            # blocks amortise per-task overhead across the whole chain
            # (measured 2.9x on the 600k-row lineitem workload at 32
            # cpus) while small inputs keep enough blocks to parallelise
            if self._any_slow:
                target = self.rows_per_block
            elif rows_hint:
                # sweet spot measured at ~cpus/2 blocks (lineitem 600k:
                # 19 blocks 3.1s vs 73 blocks 8.9s; events 100k: 12
                # blocks 4.0s vs 3 blocks 5.8s)
                try:
                    cpus = int(ray.cluster_resources().get("CPU", 8))
                except Exception:
                    cpus = 8
                target = min(max(rows_hint // max(1, cpus // 2), 2048),
                             65536)
            else:
                target = self.rows_per_block
            ds = ds.repartition(target_num_rows_per_block=target)
        ext = ExtractTriples(
            self.ship, abort_on_error=self.abort_on_error,
            oneoff_backlinks=self.one_off_backlinks,
            reconciler=reconciler, mention_mode=mention_mode,
            emit_metrics=self.emit_metrics if emit_metrics is None else emit_metrics,
            vectorize=self.vectorize)
        # fully-vectorized specs want whole-block batches (fewer Arrow
        # plan invocations; measured ~10% on lineitem/orders); the
        # per-row kernel keeps bounded batches for memory and fan-out
        batch_size = self.batch_size if self._any_slow else None
        out = ds.map_batches(ext, batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=self.extract_concurrency)
        if self.one_off_quads:
            out = out.union(ray.data.from_arrow(
                quads_to_table(self.one_off_quads)))
        return out

    def _dedup_partitions(self, rows_hint: Optional[int]
                          ) -> Optional[int]:
        """Dedup shuffle partitions from the INPUT row-count hint: the
        sort shuffle's coordination cost scales with blocks ×
        partitions, not bytes (ops/readers.py), so a 15k-row table
        must not pay the 256-partition cluster default. Triples ≈
        rows × small factor; 8 is conservative — overshooting the
        factor only adds partitions, never drops below the 8-floor.
        Huge inputs saturate at the cluster-scaled default."""
        if rows_hint is None:
            return None
        from rdf_mapper_ray.ops.dedup import _num_partitions
        return _num_partitions(rows_hint * 8)

    def _post_extract(self, t: "ray.data.Dataset",
                      rows_hint: Optional[int] = None
                      ) -> "ray.data.Dataset":
        if self.emit_metrics:
            # filter metrics pseudo-triples unconditionally BEFORE the
            # mention/canonicalize stages (previously skipped in mentions
            # mode, leaking METRICS_GRAPH rows into the final output)
            t = t.map_batches(
                lambda b: b.filter(pc.invert(pc.equal(b.column("graph"),
                                                      METRICS_GRAPH))),
                batch_format="pyarrow")
        if self.reconcile_backend is not None and self.reconcile_mode == "mentions":
            t, mentions = split_mentions(t)
            t = resolve_mentions(t, mentions, self.ship,
                                 self.reconcile_backend)
        if self.canonicalize:
            t = canonicalize_sameas(t)
        return self._distinct(t, rows_hint=rows_hint)

    def _distinct(self, t: "ray.data.Dataset",
                  rows_hint: Optional[int] = None) -> "ray.data.Dataset":
        p = self._dedup_partitions(rows_hint)
        if self.dedup_strategy == "pointer":
            return distinct_triples_pointer(t, num_partitions=p)
        return distinct_triples(t, num_partitions=p)

    # -- entry points --------------------------------------------------------

    def run(self, ds: "ray.data.Dataset", output_dir: Optional[str] = None,
            sort: bool = True,
            rows_hint: Optional[int] = None) -> "ray.data.Dataset":
        t = self._post_extract(self.extract(ds, rows_hint=rows_hint),
                               rows_hint=rows_hint)
        if output_dir:
            write_triples_parquet(t, output_dir, sort=sort)
            return t
        return sort_triples(t) if sort else t

    def run_files(self, paths: str | list[str],
                  columns: Optional[list[str]] = None,
                  output_dir: Optional[str] = None,
                  sort: bool = True) -> "ray.data.Dataset":
        from rdf_mapper_ray.engine.sources import plan_parquet
        files = expand_paths(paths)
        # block-target sizing from parquet metadata only (no data I/O)
        rows_hint = sum(i["num_rows"] for i in plan_parquet(files))
        return self.run(read_parquet_rows(files, columns=columns),
                        output_dir=output_dir, sort=sort,
                        rows_hint=rows_hint)

    # -- sharded, resumable execution ----------------------------------------

    def run_sharded(self, paths: str | list[str], workdir: str,
                    columns: Optional[list[str]] = None,
                    files_per_shard: int = 16,
                    output_dir: Optional[str] = None,
                    sort: bool = True,
                    checkpoint_wide: bool = True,
                    dedup_buckets: int = 64) -> "ray.data.Dataset":
        """Checkpointed execution: extract per input shard with lineage
        manifests; rerun skips completed shards; wide stages read the
        checkpointed triple table.

        ``checkpoint_wide`` additionally checkpoints the POST-dedup
        triple table under ``<workdir>/dedup/`` through the sealed-
        manifest partitioned writer (ops/io.py): a run killed mid-dedup
        resumes by re-running only the wide compute and re-WRITING only
        the unsealed buckets (extract shards never recompute), and a
        run killed after the ``dedup_COMPLETE`` marker skips the wide
        stages entirely and reads the checkpoint. The workdir is bound
        to one (spec, input) pair — reusing it across different inputs
        is the caller's stale-checkpoint hazard, exactly like the
        extract manifests."""
        files = expand_paths(paths)
        shards = [files[i:i + files_per_shard]
                  for i in range(0, len(files), files_per_shard)]
        extract_root = os.path.join(workdir, "extract")
        manifest_root = os.path.join(workdir, "manifests")
        os.makedirs(extract_root, exist_ok=True)
        os.makedirs(manifest_root, exist_ok=True)
        total_errors = 0
        for sid, shard_files in enumerate(shards):
            shard_dir = os.path.join(extract_root, f"shard={sid:05d}")
            manifest_path = os.path.join(manifest_root, f"shard={sid:05d}.json")
            if os.path.isfile(manifest_path):
                with open(manifest_path, encoding="utf-8") as fh:
                    total_errors += json.load(fh).get("errors", 0)
                log.info("shard %d complete — skipping", sid)
                continue
            ds = read_parquet_rows(shard_files, columns=columns)
            t = self.extract(ds, emit_metrics=True)
            tmp_dir = shard_dir + ".tmp"
            if os.path.isdir(tmp_dir):
                import shutil
                shutil.rmtree(tmp_dir)
            t.write_parquet(tmp_dir)
            manifest = self._shard_manifest(sid, shard_files, tmp_dir)
            total_errors += manifest["errors"]
            os.rename(tmp_dir, shard_dir)
            with open(manifest_path, "w", encoding="utf-8") as fh:
                json.dump(manifest, fh, indent=2)
        if self.abort_on_error and total_errors > 0:
            raise RuntimeError(f"Aborting due to {total_errors + 1} errors")
        t = ray.data.read_parquet(extract_root)
        t = t.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("graph"),
                                                  METRICS_GRAPH))),
            batch_format="pyarrow")
        if checkpoint_wide:
            from rdf_mapper_ray.ops.io import write_partitioned
            dedup_root = os.path.join(workdir, "dedup")
            done_marker = os.path.join(workdir, "dedup_COMPLETE.json")
            if not os.path.isfile(done_marker):
                deduped = self._post_extract_from_checkpoint(t)
                receipts = write_partitioned(
                    deduped, dedup_root, by_col="subject",
                    num_buckets=dedup_buckets).to_pandas()
                marker_tmp = done_marker + ".tmp"
                with open(marker_tmp, "w", encoding="utf-8") as fh:
                    json.dump({
                        "rows": int(receipts["rows"].sum()),
                        "buckets": int(len(receipts)),
                        "resumed_buckets": int(receipts["skipped"].sum()),
                    }, fh)
                os.replace(marker_tmp, done_marker)
            t = ray.data.read_parquet(dedup_root,
                                      file_extensions=["parquet"])
        else:
            t = self._post_extract_from_checkpoint(t)
        if output_dir:
            write_triples_parquet(t, output_dir, sort=sort)
            return t
        return sort_triples(t) if sort else t

    def _post_extract_from_checkpoint(self, t: "ray.data.Dataset") -> "ray.data.Dataset":
        if self.reconcile_backend is not None and self.reconcile_mode == "mentions":
            t, mentions = split_mentions(t)
            t = resolve_mentions(t, mentions, self.ship, self.reconcile_backend)
        if self.canonicalize:
            t = canonicalize_sameas(t)
        return self._distinct(t)

    @staticmethod
    def _shard_manifest(sid: int, shard_files: list[str],
                        shard_dir: str) -> dict:
        rows = errors = triples = 0
        for part in expand_paths(shard_dir):
            tbl = pq.read_table(part, columns=["graph", "predicate",
                                               "object_value"])
            mask = pc.equal(tbl.column("graph"), METRICS_GRAPH)
            metrics = tbl.filter(mask)
            for pred, val in zip(metrics.column("predicate").to_pylist(),
                                 metrics.column("object_value").to_pylist()):
                if pred == "errors":
                    errors += int(val)
                elif pred == "rows":
                    rows += int(val)
            triples += tbl.num_rows - metrics.num_rows
        return {"shard": sid, "files": shard_files, "rows": rows,
                "errors": errors, "triples": triples}
