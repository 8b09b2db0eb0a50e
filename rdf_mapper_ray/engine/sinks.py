"""Sinks: sorted Parquet triple tables, Turtle/TriG text, SPARQL scripts.

The primary sink at scale is partitioned Parquet of the triple schema
(sorted for deterministic output, SURVEY.md §2.8). The text serializers
mirror the reference's writers (template_processor.py:72-134) and are
driver-side streaming over ``iter_batches`` — intended for small /
conformance outputs, not the 100 TB path.
"""

from __future__ import annotations

import re
from typing import IO, Iterable, Mapping, Optional

from rdf_mapper_ray.engine.schema import COLUMNS
from rdf_mapper_ray.kernel.nodes import DEFAULT_GRAPH, RDF_TYPE

SORT_KEY = ["graph", "subject", "predicate", "object_value"]


def sort_triples(ds: "ray.data.Dataset") -> "ray.data.Dataset":  # noqa: F821
    """Deterministic output ordering (the reference's output order is an
    rdflib serializer artifact; we sort explicitly).

    Ray's sort chooses its reduce-partition count from the input block
    count; a handful of fat blocks would serialise the merge, so split
    first (narrow op, no shuffle)."""
    return ds.repartition(target_num_rows_per_block=65536).sort(SORT_KEY)


def write_triples_parquet(ds: "ray.data.Dataset", path: str,  # noqa: F821
                          sort: bool = True) -> None:
    if sort:
        ds = sort_triples(ds)
    ds.write_parquet(path)


# ---------------------------------------------------------------------------
# text serialization
# ---------------------------------------------------------------------------

_LOCAL_RE = re.compile(r"[A-Za-z_][\w\-]*")


def _qname(uri: str, prefixes: list[tuple[str, str]]) -> Optional[str]:
    for (p, ns) in prefixes:
        if uri.startswith(ns):
            local = uri[len(ns):]
            if _LOCAL_RE.fullmatch(local):
                return f"{p}:{local}"
    return None


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"') \
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")


def _term(kind: str, value: str, lang: Optional[str], dt: Optional[str],
          prefixes: list[tuple[str, str]]) -> str:
    if kind == "uri":
        q = _qname(value, prefixes)
        return q if q else f"<{value}>"
    if kind == "bnode":
        return f"_:{value}"
    out = f'"{_esc(value)}"'
    if lang:
        return f"{out}@{lang}"
    if dt:
        q = _qname(dt, prefixes)
        return f"{out}^^{q}" if q else f"{out}^^<{dt}>"
    return out


def _pred(p: str, prefixes: list[tuple[str, str]]) -> str:
    if p == RDF_TYPE:
        return "a"
    q = _qname(p, prefixes)
    return q if q else f"<{p}>"


def iter_quad_rows(ds: "ray.data.Dataset") -> Iterable[tuple]:  # noqa: F821
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        yield from zip(*[batch.column(c).to_pylist() for c in COLUMNS])


def serialize_graph_block(rows: Iterable[tuple],
                          prefixes: list[tuple[str, str]],
                          indent: str = "") -> str:
    """Serialize already-sorted rows of ONE graph as Turtle statements,
    grouped by subject."""
    out: list[str] = []
    last_subject = None
    for (_g, s, sk, p, ok, ov, lang, dt) in rows:
        subj = _term(sk, s, None, None, prefixes)
        obj = _term(ok, ov, lang, dt, prefixes)
        pred = _pred(p, prefixes)
        if subj != last_subject:
            if last_subject is not None:
                out.append(" .\n\n")
            out.append(f"{indent}{subj} {pred} {obj}")
            last_subject = subj
        else:
            out.append(f" ;\n{indent}    {pred} {obj}")
    if last_subject is not None:
        out.append(" .\n")
    return "".join(out)


def _group_rows_by_graph(rows: Iterable[tuple]) -> Iterable[tuple[str, list]]:
    cur_g, cur = None, []
    for row in rows:
        if row[0] != cur_g:
            if cur:
                yield (cur_g, cur)
            cur_g, cur = row[0], []
        cur.append(row)
    if cur:
        yield (cur_g, cur)


def _prefix_list(namespaces: Mapping[str, str]) -> list[tuple[str, str]]:
    # longest namespace first so the most specific prefix wins
    return sorted(namespaces.items(), key=lambda kv: -len(kv[1]))


def serialize_turtle(ds: "ray.data.Dataset",  # noqa: F821
                     namespaces: Mapping[str, str],
                     fmt: str = "turtle") -> str:
    """Serialize a (small) sorted triple dataset as turtle/trig/nquads."""
    prefixes = _prefix_list(namespaces)
    rows = iter_quad_rows(sort_triples(ds))
    if fmt == "nquads":
        out = []
        for (g, s, sk, p, ok, ov, lang, dt) in rows:
            terms = [_term(sk, s, None, None, []), f"<{p}>",
                     _term(ok, ov, lang, dt, [])]
            if g != DEFAULT_GRAPH:
                terms.append(f"<{g}>")
            out.append(" ".join(terms) + " .\n")
        return "".join(out)
    header = "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in
                     sorted(prefixes)) + "\n"
    blocks = []
    for (g, grows) in _group_rows_by_graph(rows):
        if fmt == "trig" and g != DEFAULT_GRAPH:
            blocks.append(f"<{g}> {{\n"
                          + serialize_graph_block(grows, prefixes, "    ")
                          + "}\n")
        else:
            blocks.append(serialize_graph_block(grows, prefixes))
    return header + "\n".join(blocks)


def write_sparql_update(ds: "ray.data.Dataset",  # noqa: F821
                        namespaces: Mapping[str, str],
                        preserved_graphs: set[str], out: IO[str],
                        mode: str = "update") -> None:
    """SPARQL UPDATE / DELETE scripts (template_processor.py:72-97):
    ``update`` drops non-preserved graphs then INSERTs everything;
    ``delete`` drops non-preserved graphs and DELETEs preserved data."""
    prefixes = _prefix_list(namespaces)
    emit_prefixes = mode == "update" or bool(preserved_graphs)
    if emit_prefixes:
        for p, ns in sorted(prefixes):
            out.write(f"PREFIX {p}: <{ns}>\n")
    rows = iter_quad_rows(sort_triples(ds))
    for (g, grows) in _group_rows_by_graph(rows):
        preserved = g in preserved_graphs
        if not preserved:
            out.write(f"DROP SILENT GRAPH <{g}> ;\n")
        if mode == "update" or (mode == "delete" and preserved):
            op = "INSERT" if mode == "update" else "DELETE"
            out.write(f"{op} DATA {{\n")
            if g != DEFAULT_GRAPH:
                out.write(f"GRAPH <{g}> {{\n")
            out.write(serialize_graph_block(grows, prefixes))
            if g != DEFAULT_GRAPH:
                out.write("}\n")
            out.write("};\n")


def write_sparql_update_sharded(ds: "ray.data.Dataset",  # noqa: F821
                                namespaces: Mapping[str, str],
                                preserved_graphs: set[str],
                                out_dir: str,
                                mode: str = "update") -> list[str]:
    """Distributed SPARQL UPDATE/DELETE writer — the scale path for
    S5/S6 (the streaming driver-side writer stays for small outputs).

    ``00-prologue.ru`` (driver, tiny) carries the PREFIX header and the
    one-time DROP statements — graph names come from a distinct
    aggregate, never the triples. Every data block then writes its own
    ``part-<sha12>.ru`` of INSERT/DELETE DATA statements from inside the
    map task: INSERT DATA bodies compose in any order, so shards apply
    after the prologue in any sequence, and the content-hashed names
    make re-runs overwrite instead of duplicate (resumable output).

    Returns the ordered file list (prologue first).
    """
    import hashlib
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    prefixes = _prefix_list(namespaces)

    graphs = sorted(
        r["graph"] for r in
        ds.groupby("graph").count().select_columns(["graph"]).take_all())
    prologue = os.path.join(out_dir, "00-prologue.ru")
    with open(prologue, "w", encoding="utf-8") as fh:
        if mode == "update" or bool(preserved_graphs):
            for p, ns in sorted(prefixes):
                fh.write(f"PREFIX {p}: <{ns}>\n")
        for g in graphs:
            if g not in preserved_graphs:
                fh.write(f"DROP SILENT GRAPH <{g}> ;\n")

    def write_shard(batch: pa.Table) -> pa.Table:
        rows = sorted(zip(*[batch.column(c).to_pylist() for c in COLUMNS]))
        # each shard is an independently-applicable script → own header
        parts: list[str] = [f"PREFIX {p}: <{ns}>\n"
                            for p, ns in sorted(prefixes)]
        for (g, grows) in _group_rows_by_graph(rows):
            preserved = g in preserved_graphs
            if mode == "update" or (mode == "delete" and preserved):
                op = "INSERT" if mode == "update" else "DELETE"
                body = [f"{op} DATA {{\n"]
                if g != DEFAULT_GRAPH:
                    body.append(f"GRAPH <{g}> {{\n")
                body.append(serialize_graph_block(grows, prefixes))
                if g != DEFAULT_GRAPH:
                    body.append("}\n")
                body.append("};\n")
                parts.append("".join(body))
        text = "".join(parts)
        digest = hashlib.sha1(text.encode()).hexdigest()[:12]
        path = os.path.join(out_dir, f"part-{digest}.ru")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        return pa.Table.from_pydict({"path": pa.array([path])})

    part_paths = [r["path"] for r in
                  ds.map_batches(write_shard,
                                 batch_format="pyarrow").take_all()]
    return [prologue] + sorted(part_paths)
