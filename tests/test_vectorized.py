"""Vectorized fast-path parity: for every pipeline spec the Arrow-plan
extract must produce exactly the per-row kernel's triples."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rdf_mapper_ray.engine.extract import ExtractTriples
from rdf_mapper_ray.engine.vectorized import compile_spec
from rdf_mapper_ray.kernel.spec import MapperSpec

SF = "/root/testdata/sf0.001"


def _keys(tbl: pa.Table) -> set:
    cols = [tbl.column(c).to_pylist() for c in tbl.column_names]
    return set(zip(*cols))


def _run_both(spec_dict, table: pa.Table, expect_vec: set[str]):
    spec = MapperSpec(spec_dict, auto_declare=False)
    plans = compile_spec(spec)
    assert set(plans) == expect_vec, f"vectorized {set(plans)} != {expect_vec}"
    fast = ExtractTriples(spec.ship_state(), emit_metrics=False,
                          vectorize=True)
    slow = ExtractTriples(spec.ship_state(), emit_metrics=False,
                          vectorize=False)
    k_fast, k_slow = _keys(fast(table)), _keys(slow(table))
    assert k_fast == k_slow, (
        f"missing={list(k_slow - k_fast)[:3]} extra={list(k_fast - k_slow)[:3]}")


def test_flagship_fully_vectorized():
    from rdf_mapper_ray.pipelines.sourcecode import (FLAGSHIP_SPEC,
                                                     derive_source_code)
    tbl = derive_source_code(pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"]))
    _run_both(FLAGSHIP_SPEC, tbl, {"file", "repo"})


def test_customer_vectorized():
    from rdf_mapper_ray.pipelines.relational import CUSTOMER_SPEC
    tbl = pq.read_table(f"{SF}/customer.parquet")
    _run_both(CUSTOMER_SPEC, tbl, {"customer"})


def test_orders_vectorized():
    from rdf_mapper_ray.pipelines.relational import ORDERS_SPEC
    tbl = pq.read_table(f"{SF}/orders.parquet")
    _run_both(ORDERS_SPEC, tbl, {"order"})


def test_part_split_fanout_vectorized():
    from rdf_mapper_ray.pipelines.relational import PART_SPEC
    tbl = pq.read_table(f"{SF}/part.parquet")
    _run_both(PART_SPEC, tbl, {"part"})     # split() fan-out via take()


def test_requires_unless_vectorized():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r",
                       "requires": {"flag": ["y", "Y"], "label": None},
                       "unless": {"status": "closed"},
                       "properties": {
                           "@id": "<http://e/r/{id}>",
                           "<ex:l>": "{label}",
                       }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3", "4", "5"],
        "flag": ["y", "n", "Y", "y", "y"],
        "label": ["a", "b", "c", "", "e"],
        "status": [None, "open", "closed", "open", "  "],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    subs = set(out.column("subject").to_pylist())
    # 2: flag=n; 3: status=closed; 4: label empty → only 1 and 5 survive
    assert subs == {"http://e/r/1", "http://e/r/5"}


def test_lineitem_guard_expr_vectorized():
    """The restricted comparison-DSL guard (float(col) > 10) and the
    arithmetic expr() chain now compile to Arrow masks/programs, so the
    whole lineitem resource takes the fast path — byte-parity asserted
    against the per-row kernel."""
    from rdf_mapper_ray.pipelines.relational import LINEITEM_SPEC
    tbl = pq.read_table(f"{SF}/lineitem.parquet").slice(0, 2000)
    _run_both(LINEITEM_SPEC, tbl, {"line"})


def test_events_fully_vectorized():
    from rdf_mapper_ray.pipelines.relational import EVENTS_SPEC, _parse_props
    tbl = _parse_props(pq.read_table(f"{SF}/events.parquet"))
    # event: nested resource plan + native-timestamp asDateTime;
    # user: static named graph + concat
    _run_both(EVENTS_SPEC, tbl, {"user", "event"})


def test_nulls_skip_properties():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:a>": "{a}",
            "<ex:n>": "{n | asInt}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "a": ["x", None, "z"],
        "n": pa.array([10, 20, None], type=pa.int64()),
    })
    _run_both(spec, tbl, {"r"})
    fast = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                          emit_metrics=False)(tbl)
    assert fast.num_rows == 4  # a:2 + n:2


def test_langstring_and_datatype_suffix():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:lbl>": "{a}@en",
            "<ex:code>": "{a}^^<ex:Code>",
        }}],
    }
    tbl = pa.table({"id": ["1"], "a": ["hello"]})
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    d = {r["predicate"]: r for r in out.to_pylist()}
    assert d["http://e/lbl"]["lang"] == "en"
    assert d["http://e/code"]["datatype"] == "http://e/Code"


def test_inverse_vectorized():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "^<ex:has>": "<http://e/parent/{p}>",
        }}],
    }
    tbl = pa.table({"id": ["1", "2"], "p": ["a", None]})
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    rows = sorted(out.to_pylist(), key=lambda r: r["object_value"])
    # null p does NOT skip a URI value: U8 fallback subject instead
    assert len(rows) == 2
    assert rows[0]["subject"] == "http://e/parent/a"
    assert rows[0]["object_value"] == "http://e/r/1"
    assert rows[1]["subject"].endswith("/data/r")


def test_dates_and_boolean_vectorized():
    import datetime
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:dt>": "{ts | asDateTime}",
            "<ex:d>": "{ts | asDate}",
            "<ex:ok>": "{flag | asBoolean}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "ts": pa.array([datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
                        datetime.datetime(2024, 1, 2),
                        None], type=pa.timestamp("us")),
        "flag": ["Yes", "n", None],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl).to_pylist()
    dt = {r["subject"]: r["object_value"] for r in out
          if r["predicate"].endswith("/dt")}
    assert dt["http://e/r/1"] == "2024-01-01T00:00:07.179575"
    assert dt["http://e/r/2"] == "2024-01-02T00:00:00"
    ok = {r["subject"]: r["object_value"] for r in out
          if r["predicate"].endswith("/ok")}
    assert ok == {"http://e/r/1": "true", "http://e/r/2": "false",
                  "http://e/r/3": "false"}


def test_nested_requires_gates_link_triple():
    """ADVICE r2: the parent→child link must honor the child's
    requires/unless — the kernel skips the property when the nested
    resource is gated out (process_resource returns None)."""
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:child>": {"name": "c",
                           "requires": {"flag": "y"},
                           "properties": {
                               "@id": "<http://e/c/{id}>",
                               "<ex:v>": "{v}",
                           }},
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "flag": ["y", "n", None],
        "v": ["a", "b", "c"],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    links = [r for r in out.to_pylist()
             if r["predicate"] == "http://e/child"]
    assert [r["subject"] for r in links] == ["http://e/r/1"]


def test_autocv_non_ascii_label_parity():
    """ADVICE r2: member URIs and concept URIs must use ONE normalizer
    (Python Unicode \\w), not Arrow's ASCII-only RE2 \\w."""
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:lang>": "{label | autoCV('langs')}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "label": ["Français", "Ελληνικά", "plain ascii"],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    rows = out.to_pylist()
    members = {r["object_value"] for r in rows
               if r["predicate"] == "http://e/lang"}
    concepts = {r["subject"] for r in rows
                if r["object_value"].endswith("#Concept")}
    # every member URI must resolve to a minted concept (no dangling refs)
    assert members == concepts
    assert any("Français" in m for m in members)


def test_requires_list_with_null_keeps_null_rows():
    """ADVICE r2: kernel ``value not in expected`` lets None pass when the
    expected list contains None; the vectorized mask must agree."""
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r",
                       "requires": {"flag": ["y", None]},
                       "properties": {
                           "@id": "<http://e/r/{id}>",
                           "<ex:v>": "{v}",
                       }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "flag": ["y", "n", None],
        "v": ["a", "b", "c"],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    subs = {r["subject"] for r in out.to_pylist()}
    assert subs == {"http://e/r/1", "http://e/r/3"}


def test_guard_null_semantics_parity():
    """Null handling must mirror Python exactly: `col != 'v'` keeps null
    rows, ordering comparisons on null raise→skip, and `or` short-circuits
    past a raise on the right."""
    specs = [
        "q > 5",                           # ordering: null q -> skip
        "flag != 'bad'",                   # None != 'bad' -> True (keep)
        "flag == 'ok'",
        "flag == 'ok' or q > 5",           # short-circuit both ways
        "flag == 'ok' and q > 5",
        "float(q) * 2 > 10",
        "q / d > 1",                       # div-by-zero -> skip
        "not (q > 5)",                     # null q raises inside -> skip
    ]
    tbl = pa.table({
        "id": ["1", "2", "3", "4", "5"],
        "q": pa.array([10.0, 2.0, None, 7.0, 0.0], type=pa.float64()),
        "d": pa.array([2.0, 0.0, 1.0, None, 3.0], type=pa.float64()),
        "flag": ["ok", None, "bad", "ok", None],
    })
    for guard in specs:
        spec = {
            "globals": {"$datasetID": "t"},
            "namespaces": {"ex": "http://e/"},
            "resources": [{"name": "r", "guard": guard, "properties": {
                "@id": "<http://e/r/{id}>",
                "<ex:v>": "{id}",
            }}],
        }
        _run_both(spec, tbl, {"r"})


def test_expr_div_by_zero_skips_property():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:ratio>": "{a | expr('x / state.get(\"b\")') | asDecimal}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "a": pa.array([10.0, 4.0, 6.0], type=pa.float64()),
        "b": pa.array([2.0, 0.0, None], type=pa.float64()),
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl)
    vals = {r["subject"]: r["object_value"] for r in out.to_pylist()}
    assert vals == {"http://e/r/1": "5.0"}


def test_unvectorizable_guard_falls_back():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r",
                       "guard": "len(flag) > 2",     # len() not in subset
                       "properties": {
                           "@id": "<http://e/r/{id}>",
                           "<ex:v>": "{id}",
                       }}],
    }
    tbl = pa.table({"id": ["1", "2"], "flag": ["long", "x"]})
    _run_both(spec, tbl, set())


def test_asboolean_explicit_args_vectorized():
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:ok>": "{flag | asBoolean('oui','ja')}",
            "<ex:up>": "{flag | trim | asBoolean('OUI')}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3", "4"],
        "flag": ["Oui", "yes", None, " oui "],
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl).to_pylist()
    ok = {r["subject"]: r["object_value"] for r in out
          if r["predicate"].endswith("/ok")}
    # explicit set replaces the default truthy set ('yes' now false)
    assert ok == {"http://e/r/1": "true", "http://e/r/2": "false",
                  "http://e/r/3": "false", "http://e/r/4": "false"}


def test_guard_compiler_random_parity():
    """Property test: random restricted guard expressions over random
    (null-bearing) data — the Arrow mask must equal row-by-row Python
    evaluation with the kernel's exact skip rules (False/None/raise)."""
    import random

    from rdf_mapper_ray.engine.vectorized import (NotVectorizable,
                                                  compile_restricted)

    rng = random.Random(11)
    num_cols = ["q", "d", "n"]
    str_cols = ["flag", "status"]

    def rand_atom():
        c = rng.choice(num_cols)
        forms = [c, f"float({c})", f"int({c})",
                 f"state.get('{c}')",
                 f"{c} {rng.choice('+-*')} {rng.randint(1, 5)}",
                 f"{c} / {rng.choice(num_cols)}",
                 f"{c} + {rng.choice(num_cols)}"]
        return rng.choice(forms)

    def rand_cmp():
        if rng.random() < 0.35:
            s = rng.choice(str_cols)
            val = rng.choice(["ok", "bad", "x"])
            return f"{s} {rng.choice(['==', '!='])} '{val}'"
        op = rng.choice([">", ">=", "<", "<=", "==", "!="])
        rhs = rng.choice([str(rng.randint(-2, 8)), rand_atom()])
        return f"{rand_atom()} {op} {rhs}"

    def rand_guard(depth=0):
        if depth < 2 and rng.random() < 0.45:
            parts = [rand_guard(depth + 1) for _ in range(rng.randint(2, 3))]
            joiner = rng.choice([" and ", " or "])
            e = joiner.join(f"({p})" for p in parts)
            return f"not ({e})" if rng.random() < 0.2 else e
        return rand_cmp()

    def py_rows(n):
        rows = []
        for _ in range(n):
            rows.append({
                "q": rng.choice([None, 0.0, 1.5, -2.0, 4.0, 7.5]),
                "d": rng.choice([None, 0.0, 2.0, 3.5]),
                "n": rng.choice([None, -1.0, 0.0, 5.0]),
                "flag": rng.choice([None, "ok", "bad", "x"]),
                "status": rng.choice([None, "ok", "open"]),
            })
        return rows

    checked = 0
    for _ in range(300):
        expr = rand_guard()
        try:
            prog = compile_restricted(expr, "bool")
        except NotVectorizable:
            continue
        rows = py_rows(40)
        tbl = pa.table({
            "q": pa.array([r["q"] for r in rows], type=pa.float64()),
            "d": pa.array([r["d"] for r in rows], type=pa.float64()),
            "n": pa.array([r["n"] for r in rows], type=pa.float64()),
            "flag": pa.array([r["flag"] for r in rows], type=pa.string()),
            "status": pa.array([r["status"] for r in rows],
                               type=pa.string()),
        })
        assert prog.supports(tbl.schema), expr
        mask, _ = prog.evaluate(tbl)
        got = mask.to_pylist()
        code = compile(expr, "<guard>", "eval")
        for i, row in enumerate(rows):
            # kernel semantics: null columns are PRESENT as None in the
            # guard's bindings (None != x is True, None > x raises)
            env = dict(row)
            env["state"] = type("S", (), {
                "get": staticmethod(lambda k, d=None, _r=row: _r.get(k, d))})
            try:
                res = eval(code, {}, env)
                want = not (res is None or res is False)
            except Exception:
                want = False
            assert got[i] == want, (
                f"{expr!r} row={row} vec={got[i]} py={want}")
        checked += 1
    assert checked > 100        # enough expressions actually compiled


def test_map_by_vectorized_parity():
    """map_by lookup join: URI-valued and lang-literal mappings, with
    misses (kernel: ValueError → property skipped)."""
    uri_spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "mappings": {"m": {"a": "<ex:A>", "b": "<ex:B>"}},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:ref>": "{k | map_by('m')}",
        }}],
    }
    tbl = pa.table({"id": ["1", "2", "3", "4"],
                    "k": ["a", "b", "miss", None]})
    _run_both(uri_spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(uri_spec, auto_declare=False)
                         .ship_state(), emit_metrics=False)(tbl)
    got = {r["subject"]: (r["object_kind"], r["object_value"])
           for r in out.to_pylist()}
    assert got == {"http://e/r/1": ("uri", "http://e/A"),
                   "http://e/r/2": ("uri", "http://e/B")}

    lit_spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "mappings": {"m": {"a": "Alpha@en", "b": "Beta@en"}},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:lbl>": "{k | map_by('m')}",
        }}],
    }
    _run_both(lit_spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(lit_spec, auto_declare=False)
                         .ship_state(), emit_metrics=False)(tbl).to_pylist()
    assert {(r["object_value"], r["lang"]) for r in out} == {
        ("Alpha", "en"), ("Beta", "en")}

    # mixed kinds → per-row fallback
    mixed = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "mappings": {"m": {"a": "<ex:A>", "b": "plain"}},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:x>": "{k | map_by('m')}",
        }}],
    }
    _run_both(mixed, tbl, set())


def test_nation_mapby_chain_vectorized():
    """The nation spec's cast-then-lookup chain
    (expr('str(x)') | map_by) now takes the fast path — full parity
    against the per-row kernel on the real table."""
    from rdf_mapper_ray.pipelines.relational import _nation_spec
    tbl = pq.read_table(f"{SF}/nation.parquet")
    _run_both(_nation_spec(SF), tbl, {"nation"})


def test_asdateordatetime_vectorized_per_row_datatype():
    """Midnight timestamps become xsd:date, others xsd:dateTime — a
    per-ROW datatype column through the vectorized emit."""
    import datetime
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r", "properties": {
            "@id": "<http://e/r/{id}>",
            "<ex:when>": "{ts | asDateOrDatetime}",
        }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3", "4"],
        "ts": pa.array([datetime.datetime(2024, 1, 1),
                        datetime.datetime(2024, 1, 1, 0, 0, 7),
                        datetime.datetime(2024, 1, 2, 12, 30, 0, 250000),
                        None], type=pa.timestamp("us")),
    })
    _run_both(spec, tbl, {"r"})
    out = ExtractTriples(MapperSpec(spec, auto_declare=False).ship_state(),
                         emit_metrics=False)(tbl).to_pylist()
    got = {r["subject"]: (r["object_value"], r["datatype"]) for r in out}
    X = "http://www.w3.org/2001/XMLSchema#"
    assert got == {
        "http://e/r/1": ("2024-01-01", X + "date"),
        "http://e/r/2": ("2024-01-01T00:00:07", X + "dateTime"),
        "http://e/r/3": ("2024-01-02T12:30:00.250000", X + "dateTime"),
    }


def test_expr_compiler_random_parity():
    """Random restricted expr('...') bodies over null-bearing numeric
    data: the Arrow program's (value, validity) must match per-row
    Python evaluation (raise/None → property skipped)."""
    import math
    import random

    from rdf_mapper_ray.engine.vectorized import (NotVectorizable,
                                                  compile_restricted)

    rng = random.Random(23)
    cols = ["x", "a", "b"]

    def atom(depth=0):
        choices = ["x", "a", "b", str(rng.randint(1, 6)),
                   f"{rng.randint(1, 9)}.5"]
        if depth < 2 and rng.random() < 0.5:
            op = rng.choice(["+", "-", "*", "/"])
            return f"({atom(depth + 1)} {op} {atom(depth + 1)})"
        if rng.random() < 0.2:
            return f"float({atom(depth + 1)})"
        if rng.random() < 0.15:
            return f"-({atom(depth + 1)})"
        if rng.random() < 0.15:
            return "state.get('b')"
        return rng.choice(choices)

    checked = 0
    for _ in range(200):
        expr = atom()
        try:
            prog = compile_restricted(expr, "number", allow_x=True)
        except NotVectorizable:
            continue
        rows = [{"x": rng.choice([None, 0.0, 1.5, -3.0, 7.0]),
                 "a": rng.choice([None, 0.0, 2.0, -1.5]),
                 "b": rng.choice([None, 0.0, 4.0, 0.5])}
                for _ in range(30)]
        tbl = pa.table({c: pa.array([r[c] for r in rows],
                                    type=pa.float64()) for c in cols})
        assert prog.supports(tbl.schema), expr
        x = tbl.column("x").combine_chunks()
        vals, valid = prog.evaluate(tbl, x=x)
        vlist = vals.to_pylist() if hasattr(vals, "to_pylist") \
            else [vals] * len(rows)
        code = compile(expr, "<e>", "eval")
        for i, row in enumerate(rows):
            env = dict(row)
            env["state"] = type("S", (), {
                "get": staticmethod(lambda k, d=None, _r=row: _r.get(k, d))})
            try:
                want = eval(code, {}, env)
                ok = want is not None and not (isinstance(want, float)
                                               and math.isnan(want))
            except Exception:
                ok = False
            got_ok = bool(valid.to_pylist()[i])
            assert got_ok == ok, (expr, row, got_ok, ok)
            if ok:
                assert vlist[i] == float(want), (expr, row, vlist[i], want)
        checked += 1
    assert checked > 60


def test_random_spec_parity():
    """Spec-level fuzz: random combinations of vectorizable features —
    concat URIs, function chains, suffixes, requires/unless, guards,
    expr, asBoolean(args), map_by, autoCV, inverse, nested specs — over
    null-bearing data must produce byte-identical triples on the fast
    and per-row paths (whichever path compiles)."""
    import os
    import random

    # round-close ritual: RMR_FUZZ_SEED=n pytest -k random_spec_parity
    # (5 seeds × 200 specs caught the only real parity bugs in r2/r3)
    rng = random.Random(int(os.environ.get("RMR_FUZZ_SEED", "77")))

    def rand_value_template():
        choices = [
            "{s1}",
            "{s1}-{s2}",
            "<http://e/x/{s1}>",
            "{n1 | asInt}",
            "{f1 | asDecimal}",
            "{s1 | toLower}",
            "{s1 | trim | toUpper}",
            "{s2 | slug}",
            "{s1 | sha256}",
            "{s1 | length}",
            "{s1}@en",
            "{s1}^^<ex:T>",
            "{s2 | splitComma}",
            "{s2 | splitComma}@en",
            "{flag | asBoolean}",
            "{flag | asBoolean('y','maybe')}",
            "{f1 | expr('x * 2 + 1') | asDecimal}",
            "{f1 | expr('x / state.get(\"f2\")') | asDecimal}",
            "{k | map_by('m')}",
            "{s1 | autoCV('cv')}",
        ]
        return rng.choice(choices)

    def rand_guard():
        return rng.choice([
            None, None,
            "f1 > 2", "flag == 'y'", "flag != 'n'",
            "f1 + f2 > 3 and flag == 'y'",
            "not (f1 < 1)",
            "float(n1) >= 2 or f2 == 0.5",
        ])

    def rand_spec():
        props = {"@id": rng.choice(["<http://e/r/{id}>",
                                    "<http://e/r/{id}-{s1}>"])}
        if rng.random() < 0.5:
            props["@type"] = "<ex:Thing>"
        for i in range(rng.randint(1, 4)):
            key = f"<ex:p{i}>" if rng.random() < 0.9 else f"^<ex:q{i}>"
            if key.startswith("^"):
                props[key] = "<http://e/o/{s1}>"
            else:
                props[key] = rand_value_template()
        if rng.random() < 0.25:
            props["<ex:child>"] = {
                "name": "c",
                "requires": {"flag": "y"} if rng.random() < 0.5 else None,
                "properties": {"@id": "<http://e/c/{id}>",
                               "<ex:v>": "{s1}"},
            }
            if props["<ex:child>"]["requires"] is None:
                del props["<ex:child>"]["requires"]
        resources = [{"name": "r", "properties": props}]
        if rng.random() < 0.3:
            # second resource sharing columns — cross-resource dedup
            # candidates and independent gating
            resources.append({"name": "r2",
                              "guard": rand_guard() or "flag != 'n'",
                              "properties": {
                                  "@id": "<http://e/z/{id}>",
                                  "<ex:w>": rand_value_template()}})
        spec = {"globals": {"$datasetID": "t"},
                "namespaces": {"ex": "http://e/"},
                "mappings": {"m": {"a": "<ex:A>", "b": "<ex:B>"}},
                "resources": resources}
        g = rand_guard()
        if g:
            spec["resources"][0]["guard"] = g
        if rng.random() < 0.3:
            spec["resources"][0]["requires"] = {"flag": ["y", "n"]}
        if rng.random() < 0.3:
            spec["resources"][0]["unless"] = {"status": "closed"}
        return spec

    def rand_table(n=25):
        return pa.table({
            "id": [str(i) for i in range(n)],
            "s1": [rng.choice([None, "Ab c", "x", "Ünïcode", "a@b",
                               "q^^r", ""]) for _ in range(n)],
            "s2": [rng.choice([None, "a,b,c", "one", " sp ",
                               "x@en,plain", "v^^<ex:T>,w"])
                   for _ in range(n)],
            "n1": pa.array([rng.choice([None, 0, 3, -7])
                            for _ in range(n)], type=pa.int64()),
            "f1": pa.array([rng.choice([None, 0.0, 2.5, -1.0])
                            for _ in range(n)], type=pa.float64()),
            "f2": pa.array([rng.choice([None, 0.0, 0.5, 4.0])
                            for _ in range(n)], type=pa.float64()),
            "flag": [rng.choice([None, "y", "n", "maybe"])
                     for _ in range(n)],
            "k": [rng.choice([None, "a", "b", "zz"]) for _ in range(n)],
            "status": [rng.choice([None, "open", "closed", ""])
                       for _ in range(n)],
        })

    from rdf_mapper_ray.engine.vectorized import compile_spec
    vectorized_seen = 0
    for trial in range(200):
        spec_dict = rand_spec()
        tbl = rand_table()
        spec = MapperSpec(spec_dict, auto_declare=False)
        plans = compile_spec(spec)
        fast = ExtractTriples(spec.ship_state(), emit_metrics=False,
                              vectorize=True)
        slow = ExtractTriples(spec.ship_state(), emit_metrics=False,
                              vectorize=False)
        k_fast, k_slow = _keys(fast(tbl)), _keys(slow(tbl))
        assert k_fast == k_slow, (
            f"trial {trial} spec={spec_dict} "
            f"missing={list(k_slow - k_fast)[:3]} "
            f"extra={list(k_fast - k_slow)[:3]}")
        if plans:
            vectorized_seen += 1
    assert vectorized_seen > 70     # the fuzz actually exercises the fast path


def test_all_null_column_with_suffix():
    """Regression (r2 fuzz f255385): an all-null input column under a
    declared @lang / ^^dt suffix produced a null-typed Arrow mask and
    crashed pc.and_ in _finalize_literal / emit. The fast path must
    skip those rows exactly like the kernel, not crash."""
    spec = {
        "globals": {"$datasetID": "t"},
        "namespaces": {"ex": "http://e/"},
        "resources": [{"name": "r",
                       "properties": {
                           "@id": "<http://e/r/{id}>",
                           "<ex:a>": "{s1}@en",
                           "<ex:b>": "{s1}^^<ex:T>",
                           "<ex:c>": "{s1}",
                           "<ex:d>": "{id}-{s1}",
                       }}],
    }
    tbl = pa.table({
        "id": ["1", "2", "3"],
        "s1": pa.array([None, None, None], type=pa.null()),
    })
    _run_both(spec, tbl, {"r"})
