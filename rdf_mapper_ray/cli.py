"""Command-line entry point — parity with the reference CLI
(``mapper template input [output]``, mapper.py:36-88) plus the
cluster-scale options.

Run standalone or under ``ray job submit``::

    python -m rdf_mapper_ray template.yaml input.parquet out_dir \
        --format parquet --sharded /tmp/work --resume

Owns its Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rdf_mapper_ray",
        description="Ray-Data-native KG construction from a mapping spec")
    p.add_argument("template", help="YAML mapping spec")
    p.add_argument("input", help="input file/dir (.parquet/.csv/.json[l])")
    p.add_argument("output", nargs="?", default=None,
                   help="output dir (parquet) or file (text formats); "
                        "stdout for text formats when omitted")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "turtle", "trig", "nquads",
                            "update", "delete"])
    p.add_argument("--auto-declare", action="store_true")
    p.add_argument("--abort-on-error", action="store_true")
    p.add_argument("--no-canonicalize", action="store_true")
    p.add_argument("--columns", default=None,
                   help="comma-separated column projection pushed to the read")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--sharded", metavar="WORKDIR", default=None,
                   help="checkpointed execution: extract per input shard "
                        "under WORKDIR with lineage manifests; rerunning "
                        "with the same WORKDIR resumes (skips finished "
                        "shards)")
    p.add_argument("--files-per-shard", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init(num_cpus=...) when starting our own Ray")
    return p


def _read_input(path: str, columns: Optional[list[str]]):
    from rdf_mapper_ray.engine import sources
    low = path.lower()
    if low.endswith(".csv"):
        return sources.read_csv_rows(path)
    if low.endswith((".json", ".jsonl", ".ndjson")):
        return sources.read_jsonlines_rows(path)
    return sources.read_parquet_rows(path, columns=columns)


def main(argv: Optional[list[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    import yaml

    from rdf_mapper_ray.engine.pipeline import KGPipeline
    from rdf_mapper_ray.engine.sinks import serialize_turtle, write_sparql_update

    with open(args.template, encoding="utf-8") as fh:
        spec_dict = yaml.safe_load(fh)
    pipe = KGPipeline(spec_dict, auto_declare=args.auto_declare,
                      abort_on_error=args.abort_on_error,
                      canonicalize=not args.no_canonicalize,
                      batch_size=args.batch_size)
    columns = args.columns.split(",") if args.columns else None

    if args.sharded:
        triples = pipe.run_sharded(args.input, args.sharded,
                                   columns=columns,
                                   files_per_shard=args.files_per_shard,
                                   output_dir=(args.output
                                               if args.format == "parquet"
                                               else None))
    elif args.format == "parquet":
        triples = pipe.run(_read_input(args.input, columns),
                           output_dir=args.output)
    else:
        triples = pipe.run(_read_input(args.input, columns))

    if args.format == "parquet":
        if not args.output and not args.sharded:
            print(f"{triples.count()} triples (no output dir given)")
    elif args.format in ("turtle", "trig", "nquads"):
        text = serialize_turtle(triples, dict(pipe.spec.namespaces),
                                fmt=args.format)
        if args.output:
            with open(args.output, "w", encoding="utf-8") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)
    else:
        out = open(args.output, "w", encoding="utf-8") if args.output \
            else sys.stdout
        preserved = {g for g in pipe.preserved_graphs}
        for rs in pipe.spec.resources:
            if rs.preserved_graph and rs.graph:
                # static graph URIs only in the driver path
                if "{" not in rs.graph:
                    from rdf_mapper_ray.kernel.namespaces import expand_curie
                    preserved.add(expand_curie(rs.graph[1:-1],
                                               pipe.spec.namespaces))
        write_sparql_update(triples, dict(pipe.spec.namespaces), preserved,
                            out, mode=args.format)
        if args.output:
            out.close()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
