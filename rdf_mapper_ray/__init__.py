"""rdf_mapper_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the semantics of the epimorphics/rdf-mapper declarative YAML
template language (value templates, URI minting, datatype coercion, guards,
embedded templates, reconciliation, auto-CV) as streaming
``ray.data.Dataset`` transforms over Arrow triple tables.

Layout:
  kernel/   pure-Python template kernel (no Ray): spec compile, pattern
            engine, URI minting, scalar functions, per-row evaluator
  engine/   Ray Data stages: sources, extract, dedup, canonicalize,
            reconcile actor pool, sinks, end-to-end pipeline
  ops/      large-scale training-data operators: dedup family, ANN,
            text analysis, multimodal stubs
"""

__version__ = "0.1.0"

from rdf_mapper_ray.context import configure_data_context as _configure

_configure()
del _configure
