"""Local (single-process) row processor.

The in-memory counterpart of the reference's TemplateProcessor
(template_processor.py:18-134): evaluates one-offs at init, then rows, and
accumulates quads with set semantics. Used by the conformance tests and by
the driver to evaluate one-offs before launching the distributed pipeline;
the Ray path replaces the accumulation with streaming extraction + a
global dedup stage.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from rdf_mapper_ray.kernel.evaluator import EvalState, process_resource
from rdf_mapper_ray.kernel.nodes import DEFAULT_GRAPH, Quad
from rdf_mapper_ray.kernel.spec import MapperSpec


class RowProcessor:
    def __init__(self, spec: MapperSpec, filename: str = "file",
                 abort_on_error: bool = False, reconciler: Any = None) -> None:
        self.spec = spec
        self.abort_on_error = abort_on_error
        self.row = 0
        self.error_count = 0
        bindings = spec.context.new_child(
            {"$file": filename, "$row": None, "$graph": DEFAULT_GRAPH})
        self.state = EvalState(spec, bindings, abort_on_error=abort_on_error,
                               reconciler=reconciler, row_key="oneoff")
        for one_off in spec.one_offs:
            if not one_off.name:
                self.log_error(f"One-off resource has no name {one_off}")
            else:
                process_resource(one_off.name, one_off, self.state)

    def log_error(self, message: str) -> None:
        self.error_count += 1

    def process_row(self, data: dict) -> None:
        self.row += 1
        self.state.bindings["$row"] = self.row
        self.state.row_key = f"r{self.row}"
        state = self.state.child(dict(data))
        state.row_key = f"r{self.row}"
        try:
            for rs in self.spec.resources:
                if not rs.name:
                    self.log_error(f"Resource has no name {rs}")
                    continue
                try:
                    process_resource(rs.name, rs, state)
                except Exception:
                    self.log_error(f"failed to process resource {rs.name}")
        except Exception:
            self.log_error("processing failed")

    def process_rows(self, rows: Iterable[dict]) -> "RowProcessor":
        for row in rows:
            self.process_row(row)
        return self

    # -- results -------------------------------------------------------------

    def quads(self) -> list[Quad]:
        """All emitted quads with duplicates collapsed (rdflib graph set
        semantics, template_state.py:118-120), insertion-ordered."""
        seen = set()
        out = []
        for q in self.state.quads:
            k = q.key()
            if k not in seen:
                seen.add(k)
                out.append(q)
        return out

    def quad_keys(self, graph: Optional[str] = None) -> set[tuple]:
        keys = {q.key() for q in self.state.quads}
        if graph is not None:
            keys = {k for k in keys if k[0] == graph}
        return keys

    def finalize_check(self) -> None:
        """abort-on-error semantics of finalize (template_processor.py:115-127):
        one extra error is logged for the abort itself before raising."""
        if self.error_count > 0 and self.abort_on_error:
            self.log_error("abort")
            raise RuntimeError(f"Aborting due to {self.error_count} errors")
