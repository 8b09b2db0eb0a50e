"""The Arrow triple table — the universal inter-stage representation.

Every stage of the distributed pipeline exchanges blocks of this schema
(SURVEY.md §1.2): one row per RDF statement, columnar and nullable, so
`map_batches(batch_format="pyarrow")` stages are zero-copy.
"""

from __future__ import annotations

import pyarrow as pa

from rdf_mapper_ray.kernel.nodes import Quad

TRIPLE_SCHEMA = pa.schema([
    ("graph", pa.string()),
    ("subject", pa.string()),
    ("subject_kind", pa.string()),     # uri | bnode
    ("predicate", pa.string()),
    ("object_kind", pa.string()),      # uri | bnode | literal
    ("object_value", pa.string()),
    ("lang", pa.string()),
    ("datatype", pa.string()),
])

COLUMNS = [f.name for f in TRIPLE_SCHEMA]


def quads_to_table(quads: list[Quad]) -> pa.Table:
    cols: dict[str, list] = {c: [] for c in COLUMNS}
    for q in quads:
        (g, s, sk, p, ok, ov, lang, dt) = q.key()
        cols["graph"].append(g)
        cols["subject"].append(s)
        cols["subject_kind"].append(sk)
        cols["predicate"].append(p)
        cols["object_kind"].append(ok)
        cols["object_value"].append(ov)
        cols["lang"].append(lang)
        cols["datatype"].append(dt)
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


def keys_to_table(keys: list[tuple]) -> pa.Table:
    cols = {c: [k[i] for k in keys] for i, c in enumerate(COLUMNS)}
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


def empty_table() -> pa.Table:
    return pa.Table.from_pydict({c: [] for c in COLUMNS}, schema=TRIPLE_SCHEMA)


def table_to_keys(table: pa.Table) -> list[tuple]:
    return list(zip(*[table.column(c).to_pylist() for c in COLUMNS]))
