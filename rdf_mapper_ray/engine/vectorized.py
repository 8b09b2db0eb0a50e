"""Vectorized extract fast-path: compile statically-simple resource specs
to Arrow column plans.

The per-row template kernel is fully general but costs ~100µs/row. Most
production mapping specs are *statically simple*: constant predicates,
``@id``/value URIs that are pure concatenations of static text and
column references, literal properties that apply a short chain of
known scalar functions to one column. For those resources this module
compiles an Arrow plan once per spec; extraction then runs as
``pyarrow.compute`` kernels over whole batches (measured ~20-40x the
per-row path). Resources that use any dynamic feature — guards,
requires/unless, ``<row>``/``<uuid>``/``<hash>`` minting, backlinks,
embedded/nested templates, reconcile, map_by, split fan-out, ``expr`` —
are left to the per-row kernel (ExtractTriples runs both and unions the
output), so semantics never degrade, only speed up.

Parity contract: for every vectorizable construct the plan reproduces
the per-row kernel byte-for-byte (tests/test_vectorized.py asserts
plan-vs-kernel equality on every pipeline spec).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Callable, Optional

import pyarrow as pa
import pyarrow.compute as pc

from rdf_mapper_ray.engine.schema import TRIPLE_SCHEMA
from rdf_mapper_ray.kernel.evaluator import normalize
from rdf_mapper_ray.kernel.namespaces import expand_curie
from rdf_mapper_ray.kernel.nodes import (DEFAULT_GRAPH, RDF_TYPE, XSD_BOOLEAN,
                                         XSD_DECIMAL, XSD_INTEGER)
from rdf_mapper_ray.kernel.pattern import (_DT_RE, _LANGSTRING_RE, _PIPE_RE,
                                           _VAR_RE)
from rdf_mapper_ray.kernel.spec import MapperSpec, ResourceSpec

_SKOS = "http://www.w3.org/2004/02/skos/core#"
_DCT = "http://purl.org/dc/terms/"

_URI_ABS_RE = re.compile(r"(https?|file|urn)://.*")

# special variables / forms that force the per-row path
_SPECIAL_REFS = {"row", "uuid", "parent", "_"}


def _as_bool_mask(mask):
    """Coerce a null-typed mask (from an all-null input column) to bool_;
    pc.and_ has no (null, bool) kernel."""
    if isinstance(mask, (pa.Array, pa.ChunkedArray)) \
            and pa.types.is_null(mask.type):
        return pc.fill_null(pc.cast(mask, pa.bool_()), False)
    return mask


def _and_masks(a, b):
    """pc.and_ tolerant of null-typed operands."""
    return pc.and_(_as_bool_mask(a), _as_bool_mask(b))


class NotVectorizable(Exception):
    pass


# --------------------------------------------------------------------------
# concat plans: static text + bare column refs
# --------------------------------------------------------------------------

class ConcatPlan:
    """Pure concatenation of static fragments and column references."""

    __slots__ = ("parts", "columns")

    def __init__(self, parts: list[tuple[str, str]]) -> None:
        self.parts = parts                      # ("static", text) | ("col", name)
        self.columns = [p[1] for p in parts if p[0] == "col"]

    def supports(self, schema: pa.Schema) -> bool:
        for c in self.columns:
            if c not in schema.names:
                return False
            t = schema.field(c).type
            if not (pa.types.is_string(t) or pa.types.is_large_string(t)
                    or pa.types.is_integer(t)):
                return False
        return True

    def evaluate(self, batch: pa.Table, fallback: Optional[str] = None
                 ) -> tuple[pa.Array, pa.Array]:
        """-> (string array, validity mask).

        Rows where any referenced column is null: for literal values the
        row is masked out (empty expansion → no triple); for URI values
        the caller passes ``fallback`` — the reference's U8 rule
        (template_support.py:163-164) substitutes
        ``{$datasetBase}/data/{$resourceID}`` instead of skipping.
        """
        arrays = []
        mask = None
        n = batch.num_rows
        for kind, payload in self.parts:
            if kind == "static":
                arrays.append(pa.array([payload] * n, type=pa.string()))
            else:
                col = batch.column(payload)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                valid = pc.is_valid(col)
                mask = valid if mask is None else pc.and_(mask, valid)
                if not pa.types.is_string(col.type):
                    col = pc.cast(col, pa.string())
                arrays.append(col)
        if mask is None:
            mask = pa.array([True] * n)
        if len(arrays) == 1:
            out = arrays[0]
            if not pa.types.is_string(out.type):
                out = pc.cast(out, pa.string())
        else:
            out = pc.binary_join_element_wise(
                *arrays, "", null_handling="replace", null_replacement="")
        if fallback is not None:
            out = pc.if_else(mask, out,
                             pa.scalar(fallback, type=pa.string()))
            mask = pa.array([True] * n)
        return out, mask


def _compile_concat(template: str, namespaces) -> ConcatPlan:
    """Compile a concat-only value/URI template; raises NotVectorizable
    on any function chain or special variable."""
    parts: list[tuple[str, str]] = []
    last = 0
    for m in _VAR_RE.finditer(template):
        if m.start() > last:
            parts.append(("static", template[last:m.start()]))
        inner = m.group(1)
        if "|" in inner:
            raise NotVectorizable(f"function chain in {template!r}")
        var = inner.strip()
        if not var or var.startswith("$") or var.startswith("::"):
            raise NotVectorizable(f"special var in {template!r}")
        parts.append(("col", var))
        last = m.end()
    if last < len(template):
        parts.append(("static", template[last:]))
    return ConcatPlan(parts)


def _compile_uri(pattern: str, namespaces) -> ConcatPlan:
    """URI pattern -> concat plan producing absolute URIs."""
    if not (pattern.startswith("<") and pattern.endswith(">")):
        raise NotVectorizable(f"bare-name URI {pattern!r}")
    ref = pattern[1:-1]
    if ref in _SPECIAL_REFS or ref.startswith("hash") or ref.startswith("::"):
        raise NotVectorizable(f"special URI form {pattern!r}")
    plan = _compile_concat(ref, namespaces)
    # CURIE/absolute check must be decidable statically: the first part
    # must be static text that is already an absolute URI after CURIE
    # expansion (otherwise minting would depend on $resourceID urljoin)
    if not plan.parts:
        raise NotVectorizable("empty URI pattern")
    k, text = plan.parts[0]
    if k != "static":
        raise NotVectorizable(f"URI with leading variable {pattern!r}")
    if len(plan.parts) == 1:
        expanded = expand_curie(text, namespaces)
        if not _URI_ABS_RE.fullmatch(expanded):
            raise NotVectorizable(f"relative URI {pattern!r}")
        return ConcatPlan([("static", expanded)])
    if not _URI_ABS_RE.match(text):
        raise NotVectorizable(f"non-absolute templated URI {pattern!r}")
    return plan


# --------------------------------------------------------------------------
# vectorized scalar function chains
# --------------------------------------------------------------------------

def _str_input(col: pa.Array) -> pa.Array:
    if not pa.types.is_string(col.type):
        raise NotVectorizable("string function on non-string column")
    return col


def _v_tolower(col, mask):
    return pc.utf8_lower(_str_input(col)), mask, None, None


def _v_toupper(col, mask):
    return pc.utf8_upper(_str_input(col)), mask, None, None


def _v_trim(col, mask):
    return pc.utf8_trim_whitespace(_str_input(col)), mask, None, None


def _v_slug(col, mask):
    s = pc.utf8_lower(_str_input(col))
    s = pc.utf8_trim_whitespace(s)
    s = pc.replace_substring_regex(s, r"\s+", "-")
    for ch in ("%", "/", "[", "]"):
        s = pc.replace_substring(s, ch, "_")
    return s, mask, None, None


def _v_length(col, mask):
    # kernel length(None) == 0 (functions.py length) — nulls stay valid
    n = pc.fill_null(pc.utf8_length(_str_input(col)), 0)
    return pc.cast(n, pa.string()), mask, None, XSD_INTEGER


def _v_sha256(col, mask):
    vals = [None if v is None else hashlib.sha256(v.encode()).hexdigest()
            for v in _str_input(col).to_pylist()]
    return pa.array(vals, type=pa.string()), mask, None, None


def _v_asint(col, mask):
    if pa.types.is_integer(col.type):
        out = col
    elif pa.types.is_floating(col.type):
        out = pc.cast(pc.trunc(col), pa.int64())
    else:
        raise NotVectorizable("asInt on non-numeric column")
    # None input → property skipped (asInt returns None)
    mask = pc.and_(mask, pc.is_valid(col))
    return pc.cast(out, pa.string()), mask, None, XSD_INTEGER


def _v_asdecimal(col, mask):
    if not (pa.types.is_floating(col.type) or pa.types.is_integer(col.type)):
        raise NotVectorizable("asDecimal on non-numeric column")
    # Python float repr, not Arrow's ('1234.0' vs '1234'): C-speed loop
    vals = [None if v is None else str(float(v)) for v in col.to_pylist()]
    mask = pc.and_(mask, pc.is_valid(col))
    return pa.array(vals, type=pa.string()), mask, None, XSD_DECIMAL


def _v_asboolean(col, mask):
    if pa.types.is_boolean(col.type):
        out = pc.if_else(col, "true", "false")
    elif pa.types.is_string(col.type):
        truthy = pc.is_in(pc.utf8_lower(col),
                          value_set=pa.array(["yes", "true", "ok", "1"]))
        out = pc.if_else(truthy, "true", "false")
    else:
        raise NotVectorizable("asBoolean on unsupported column type")
    # asBoolean(None) == false, never skipped
    out = pc.fill_null(out, "false")
    n = len(col)
    return out, pa.array([True] * n), None, XSD_BOOLEAN


from rdf_mapper_ray.kernel.nodes import XSD_DATE, XSD_DATETIME  # noqa: E402


def _ts_col(col):
    if not pa.types.is_timestamp(col.type):
        raise NotVectorizable("date fn on non-timestamp column")
    if col.type.unit != "us":
        col = pc.cast(col, pa.timestamp("us"))
    return col


def _v_asdatetime(col, mask):
    col = _ts_col(col)
    # Arrow %S includes fractional seconds; Python isoformat drops a
    # zero fraction entirely — strip '.000000' for parity
    s = pc.strftime(col, format="%Y-%m-%dT%H:%M:%S")
    s = pc.replace_substring_regex(s, r"\.000000$", "")
    return s, pc.and_(mask, pc.is_valid(col)), None, XSD_DATETIME


def _v_asdate(col, mask):
    col = _ts_col(col)
    s = pc.strftime(col, format="%Y-%m-%d")
    return s, pc.and_(mask, pc.is_valid(col)), None, XSD_DATE


def _v_asdateordatetime(col, mask):
    """Per-VALUE datatype: midnight timestamps become xsd:date, others
    xsd:dateTime (functions.py asDateOrDatetime) — the datatype slot is
    an Array here, carried through emit()."""
    col = _ts_col(col)
    eu = pc.cast(col, pa.int64())
    midnight = pc.equal(_modulo_day(eu), 0)
    dt_s = pc.replace_substring_regex(
        pc.strftime(col, format="%Y-%m-%dT%H:%M:%S"), r"\.000000$", "")
    d_s = pc.strftime(col, format="%Y-%m-%d")
    values = pc.if_else(midnight, d_s, dt_s)
    dtypes = pc.if_else(midnight,
                        pa.scalar(XSD_DATE, type=pa.string()),
                        pa.scalar(XSD_DATETIME, type=pa.string()))
    return values, pc.and_(mask, pc.is_valid(col)), None, dtypes


def _modulo_day(eu):
    # floored modulo, matching Python datetime.time() == 0 for any
    # epoch (nulls filled 0 — those rows are masked by is_valid anyway)
    day = 86_400_000_000
    a = pc.fill_null(eu, 0).to_numpy(zero_copy_only=False)
    return pa.array(a % day, type=pa.int64())


_V_FUNCS: dict[str, Callable] = {
    "toLower": _v_tolower,
    "toUpper": _v_toupper,
    "trim": _v_trim,
    "slug": _v_slug,
    "length": _v_length,
    "sha256": _v_sha256,
    "asInt": _v_asint,
    "asDecimal": _v_asdecimal,
    "asBoolean": _v_asboolean,
    "asDateTime": _v_asdatetime,
    "asDate": _v_asdate,
    "asDateOrDatetime": _v_asdateordatetime,
}

# functions that end a chain (typed output)
_TERMINAL = {"length", "asInt", "asDecimal", "asBoolean", "asDateTime",
             "asDate", "asDateOrDatetime"}


class FnChainPlan:
    """``{col | f | g}`` with every f/g from the vectorizable set."""

    __slots__ = ("column", "chain", "lang", "datatype")

    def __init__(self, column: str, chain: list[str],
                 lang: Optional[str], datatype: Optional[str]) -> None:
        self.column = column
        self.chain = chain
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        if self.column not in schema.names:
            return False
        t = schema.field(self.column).type
        first = self.chain[0] if self.chain else None
        if first in ("asInt", "asDecimal"):
            return pa.types.is_integer(t) or pa.types.is_floating(t)
        if first in ("asDateTime", "asDate", "asDateOrDatetime"):
            return pa.types.is_timestamp(t)
        if first == "asBoolean":
            return pa.types.is_string(t) or pa.types.is_boolean(t)
        return pa.types.is_string(t) or pa.types.is_large_string(t)

    def evaluate(self, batch: pa.Table
                 ) -> tuple[pa.Array, pa.Array, Optional[str], Optional[str]]:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null input skips the property — except length(None) == 0 and
        # asBoolean(None) == false, which consume nulls as values
        if self.chain and self.chain[0] in ("length", "asBoolean"):
            mask = pa.array([True] * len(col))
        else:
            mask = pc.is_valid(col)
        lang, dt = self.lang, self.datatype
        for fname in self.chain:
            col, mask, flang, fdt = _V_FUNCS[fname](col, mask)
            if flang is not None:
                lang = flang
            if fdt is not None and dt is None:
                dt = fdt
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        return col, mask, lang, dt


class RowFilter:
    """Vectorized ``requires`` / ``unless`` row gate (evaluator
    process_resource:311-335). String columns only — numeric columns
    fall back to the per-row kernel (YAML expected-values are strings,
    and the per-row comparison is Python equality)."""

    __slots__ = ("column", "mode", "expected")

    def __init__(self, column: str, mode: str, expected: Any) -> None:
        self.column = column
        self.mode = mode            # require | unless
        self.expected = expected    # None | str | list[str|None]

    def supports(self, schema: pa.Schema) -> bool:
        return (self.column in schema.names
                and pa.types.is_string(schema.field(self.column).type))

    def mask(self, batch: pa.Table) -> pa.Array:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.mode == "require":
            if self.expected is None:
                # any non-empty value
                return pc.and_(pc.is_valid(col),
                               pc.not_equal(col, ""))
            if isinstance(self.expected, list):
                m = pc.fill_null(
                    pc.is_in(col, value_set=pa.array(
                        [e for e in self.expected if e is not None],
                        type=pa.string())), False)
                if None in self.expected:
                    # kernel: ``value not in expected`` → None passes when
                    # the expected list contains None (evaluator:317-319)
                    m = pc.or_(m, pc.is_null(col))
                return m
            return pc.fill_null(pc.equal(col, self.expected), False)
        # unless: blank-normalised value (strip -> "" counts as missing)
        stripped = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
        is_missing = pc.equal(stripped, "")
        if self.expected is None:
            return is_missing
        values = [self.expected] if not isinstance(self.expected, list) \
            else self.expected
        non_null = [v for v in values if v is not None]
        hit = pc.and_(pc.fill_null(pc.is_in(col, value_set=pa.array(
            non_null, type=pa.string())), False), pc.invert(is_missing)) \
            if non_null else pa.array([False] * batch.num_rows)
        if None in values:
            hit = pc.or_(hit, is_missing)
        return pc.invert(hit)


# --------------------------------------------------------------------------
# restricted guard / expr compiler: Python comparison+arithmetic subset
# → pyarrow.compute programs
# --------------------------------------------------------------------------

import ast as _ast


class _TypedProgram:
    """A compiled restricted-Python expression evaluated per batch with
    pyarrow.compute. ``columns`` are the referenced row variables;
    ``out_type`` is 'number' | 'string' | 'bool' (inferred statically so
    unsupported shapes fall back to the per-row kernel at compile time,
    never fail at runtime)."""

    __slots__ = ("tree", "columns", "out_type", "uses_x")

    def __init__(self, tree, columns: set, out_type: str,
                 uses_x: bool) -> None:
        self.tree = tree
        self.columns = columns
        self.out_type = out_type
        self.uses_x = uses_x

    def supports(self, schema: pa.Schema) -> bool:
        for c in self.columns:
            if c not in schema.names:
                return False
            t = schema.field(c).type
            if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_string(t)
                    or pa.types.is_large_string(t)):
                return False
        return True

    # -- evaluation ---------------------------------------------------------
    #
    # Every node evaluates to (value, raises): ``raises`` marks rows where
    # the per-row kernel would hit an exception (None in arithmetic or an
    # ordering comparison, float(None), division by zero) and therefore
    # skip the resource/property. Null semantics mirror Python exactly:
    # ``None == v`` is False, ``None != v`` is True, ``and``/``or``
    # short-circuit past a raise on the right.

    def evaluate(self, batch: pa.Table, x: Optional[pa.Array] = None
                 ) -> tuple[Any, pa.Array]:
        """-> (result, validity mask). For 'bool' programs the result is
        a null-free effective-True mask; for 'number' programs validity
        excludes raised and null rows."""
        v, valid, _r = self.evaluate_with_raises(batch, x=x)
        return v, valid

    def evaluate_with_raises(self, batch: pa.Table,
                             x: Optional[pa.Array] = None):
        """Like :meth:`evaluate` but also returns the per-row raise mask
        (rows where the per-row kernel would hit an exception — which
        the kernel escalates to a RESOURCE abort, not a property skip)."""
        n = batch.num_rows
        ctx = {"batch": batch, "x": x, "n": n}
        v, r = self._ev(self.tree.body, ctx)
        true_mask = pa.array([True] * n)
        no_raise = pa.array([False] * n) if r is None else r
        if self.out_type == "bool":
            # effective truth: True AND did not raise anywhere inside
            eff = v if r is None else pc.and_(v, pc.invert(r))
            return eff, true_mask, no_raise
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            # constant-only expression — broadcast to the batch length
            py = v.as_py() if isinstance(v, pa.Scalar) else v
            v = pa.array([py] * n)
        valid = pc.is_valid(v)
        if r is not None:
            valid = pc.and_(valid, pc.invert(r))
        return v, valid, no_raise

    @staticmethod
    def _or_raises(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return pc.or_(a, b)

    @staticmethod
    def _nulls_of(v):
        """Raise-mask contribution of nulls in an operand value."""
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return pc.is_null(v)
        return None

    def _col(self, ctx, name):
        if name == "x" and ctx["x"] is not None:
            col = ctx["x"]
        else:
            col = ctx["batch"].column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col

    @staticmethod
    def _num(v):
        """Promote to float64 (Python arithmetic on mixed int/float is
        float; TPC-H-scale ints are exact in doubles). Arrow scalars
        (constant subexpressions) collapse back to Python floats."""
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, pa.Scalar):
            return float(v.as_py())
        if isinstance(v, (pa.Array, pa.ChunkedArray)) \
                and v.type != pa.float64():
            return pc.cast(v, pa.float64())
        return v

    def _ev(self, node, ctx):
        if isinstance(node, _ast.Constant):
            return node.value, None
        if isinstance(node, _ast.Name):
            return self._col(ctx, node.id), None
        if isinstance(node, _ast.Call):
            fname = _call_name(node)
            if fname == "state.get":
                return self._col(ctx, node.args[0].value), None
            if fname == "str":
                # Python str(): never raises; str(None) == 'None'
                v, r = self._ev(node.args[0], ctx)
                if isinstance(v, (pa.Array, pa.ChunkedArray)):
                    vals = ["None" if x is None else str(x)
                            for x in v.to_pylist()]
                    return pa.array(vals, type=pa.string()), r
                return str(v), r
            # float()/int(): float(None) raises per-row
            v, r = self._ev(node.args[0], ctx)
            r = self._or_raises(r, self._nulls_of(v))
            v = self._num(v)
            if fname == "int":
                v = pc.trunc(v) if isinstance(
                    v, (pa.Array, pa.ChunkedArray)) else float(int(v))
            return v, r
        if isinstance(node, _ast.UnaryOp):
            v, r = self._ev(node.operand, ctx)
            if isinstance(node.op, _ast.USub):
                r = self._or_raises(r, self._nulls_of(v))
                v = self._num(v)
                return (pc.negate(v) if isinstance(
                    v, (pa.Array, pa.ChunkedArray)) else -v), r
            # Not: invert the value; a raise inside propagates out
            return pc.invert(v), r
        if isinstance(node, _ast.BinOp):
            lv, lr = self._ev(node.left, ctx)
            rv, rr = self._ev(node.right, ctx)
            r = self._or_raises(
                self._or_raises(lr, rr),
                self._or_raises(self._nulls_of(lv), self._nulls_of(rv)))
            lv, rv = self._num(lv), self._num(rv)
            if isinstance(node.op, _ast.Add):
                return pc.add(lv, rv), r
            if isinstance(node.op, _ast.Sub):
                return pc.subtract(lv, rv), r
            if isinstance(node.op, _ast.Mult):
                return pc.multiply(lv, rv), r
            # Div: Python raises ZeroDivisionError (row skipped); Arrow
            # float division yields inf — mark zero divisors as raising
            if isinstance(rv, (pa.Array, pa.ChunkedArray)):
                zero = pc.fill_null(pc.equal(rv, 0.0), False)
                r = self._or_raises(r, zero)
                rv = pc.if_else(zero, pa.scalar(1.0, type=pa.float64()),
                                pc.cast(rv, pa.float64()))
            elif rv == 0.0:
                r = self._or_raises(r, pa.array([True] * ctx["n"]))
                rv = 1.0
            return pc.divide(lv, rv), r
        if isinstance(node, _ast.Compare):
            lv, lr = self._ev(node.left, ctx)
            rv, rr = self._ev(node.comparators[0], ctx)
            r = self._or_raises(lr, rr)
            if _static_type(node.left) == "number" \
                    or _static_type(node.comparators[0]) == "number":
                lv, rv = self._num(lv), self._num(rv)
            op = node.ops[0]
            if isinstance(op, (_ast.Eq, _ast.NotEq)):
                # Python: None == v → False, None != v → True,
                # None == None → True — never raises on equality
                eq = pc.fill_null(pc.equal(lv, rv), False)
                ln, rn = self._nulls_of(lv), self._nulls_of(rv)
                if ln is not None and rn is not None:
                    eq = pc.or_(eq, pc.and_(ln, rn))
                out = eq if isinstance(op, _ast.Eq) else pc.invert(eq)
                return out, r
            # ordering: None in an ordering comparison raises TypeError
            r = self._or_raises(
                r, self._or_raises(self._nulls_of(lv), self._nulls_of(rv)))
            table = {_ast.Gt: pc.greater, _ast.GtE: pc.greater_equal,
                     _ast.Lt: pc.less, _ast.LtE: pc.less_equal}
            return pc.fill_null(table[type(op)](lv, rv), False), r
        if isinstance(node, _ast.BoolOp):
            # short-circuit parity, with raises PROPAGATED (so an
            # enclosing `not` still skips rows that raised inside):
            #   a and b raises iff a raises, or a was truly True and b
            #   raises; a or b raises iff a raises, or a was truly False
            #   and b raises. Values on raised rows are garbage — every
            #   consumer masks them via the raises channel.
            parts = [self._ev(v, ctx) for v in node.values]
            va, ra = parts[0]
            is_and = isinstance(node.op, _ast.And)
            for vb, rb in parts[1:]:
                not_ra = None if ra is None else pc.invert(ra)

                def _true_noraise(v, nr):
                    return v if nr is None else pc.and_(v, nr)

                if is_and:
                    decided_true = _true_noraise(va, not_ra)
                    ra = self._or_raises(
                        ra, None if rb is None
                        else pc.and_(decided_true, rb))
                    va = pc.and_(va, vb)
                else:
                    decided_false = pc.invert(va) if not_ra is None \
                        else pc.and_(pc.invert(va), not_ra)
                    ra = self._or_raises(
                        ra, None if rb is None
                        else pc.and_(decided_false, rb))
                    va = pc.or_(va, vb)
            return va, ra
        raise AssertionError(type(node))


def _call_name(node: "_ast.Call") -> str:
    f = node.func
    if isinstance(f, _ast.Name):
        return f.id
    if isinstance(f, _ast.Attribute) and isinstance(f.value, _ast.Name):
        return f"{f.value.id}.{f.attr}"
    return "?"


_TYPE_CACHE_KEY = "_graft_type"


def _static_type(node) -> str:
    return getattr(node, _TYPE_CACHE_KEY, "unknown")


def compile_restricted(expression: str, expect: str,
                       allow_x: bool = False,
                       allow_str: bool = False) -> "_TypedProgram":
    """Parse+type a guard / expr() body; raises NotVectorizable on any
    construct outside the comparison/arithmetic subset.

    ``expect`` is 'bool' (guards), 'number' (value exprs) or 'value'
    (number OR string — the map_by-tail path, which also enables the
    ``str()`` cast via ``allow_str``). Column types are assumed numeric
    unless only ever compared to strings — supports() re-checks against
    the real schema."""
    try:
        tree = _ast.parse(expression, mode="eval")
    except SyntaxError:
        raise NotVectorizable(f"unparseable expr {expression!r}")
    columns: set[str] = set()
    uses_x = False

    def typ(node) -> str:
        t = _typ(node)
        setattr(node, _TYPE_CACHE_KEY, t)
        return t

    def _typ(node) -> str:
        nonlocal uses_x
        if isinstance(node, _ast.Expression):
            return typ(node.body)
        if isinstance(node, _ast.Constant):
            if isinstance(node.value, bool):
                raise NotVectorizable("bool literal")
            if isinstance(node.value, (int, float)):
                return "number"
            if isinstance(node.value, str):
                return "string"
            raise NotVectorizable(f"literal {node.value!r}")
        if isinstance(node, _ast.Name):
            if node.id == "x" and allow_x:
                uses_x = True
            else:
                columns.add(node.id)
            return "column"
        if isinstance(node, _ast.Call):
            fname = _call_name(node)
            if fname in ("float", "int"):
                if len(node.args) != 1 or node.keywords:
                    raise NotVectorizable("cast arity")
                at = typ(node.args[0])
                if at not in ("number", "column"):
                    # float('str-col') works per-row but Arrow cast
                    # errors on malformed input — leave to the kernel
                    raise NotVectorizable("cast of non-numeric")
                return "number"
            if fname == "state.get":
                if len(node.args) != 1 \
                        or not isinstance(node.args[0], _ast.Constant) \
                        or not isinstance(node.args[0].value, str):
                    raise NotVectorizable("state.get shape")
                columns.add(node.args[0].value)
                return "column"
            if fname == "str" and allow_str:
                if len(node.args) != 1 or node.keywords:
                    raise NotVectorizable("str arity")
                if typ(node.args[0]) not in ("number", "column"):
                    raise NotVectorizable("str of non-scalar")
                return "string"
            raise NotVectorizable(f"call {fname!r}")
        if isinstance(node, _ast.UnaryOp):
            if isinstance(node.op, _ast.USub):
                if typ(node.operand) not in ("number", "column"):
                    raise NotVectorizable("negate non-number")
                return "number"
            if isinstance(node.op, _ast.Not):
                if typ(node.operand) != "bool":
                    raise NotVectorizable("not of non-bool")
                return "bool"
            raise NotVectorizable("unary op")
        if isinstance(node, _ast.BinOp):
            if not isinstance(node.op, (_ast.Add, _ast.Sub, _ast.Mult,
                                        _ast.Div)):
                raise NotVectorizable("binop")
            for side in (node.left, node.right):
                if typ(side) not in ("number", "column"):
                    raise NotVectorizable("arith on non-number")
            return "number"
        if isinstance(node, _ast.Compare):
            if len(node.ops) != 1 or len(node.comparators) != 1:
                raise NotVectorizable("chained comparison")
            lt, rt = typ(node.left), typ(node.comparators[0])
            if not isinstance(node.ops[0], (_ast.Gt, _ast.GtE, _ast.Lt,
                                            _ast.LtE, _ast.Eq, _ast.NotEq)):
                raise NotVectorizable("comparison op")
            if "string" in (lt, rt) and "number" in (lt, rt):
                raise NotVectorizable("mixed-type comparison")
            if "string" in (lt, rt) and not isinstance(
                    node.ops[0], (_ast.Eq, _ast.NotEq)):
                # string ordering: Python vs Arrow agree, but the
                # per-row TypeError-on-mixed risk isn't checkable here
                raise NotVectorizable("string ordering comparison")
            return "bool"
        if isinstance(node, _ast.BoolOp):
            for v in node.values:
                if typ(v) != "bool":
                    raise NotVectorizable("boolop of non-bool")
            return "bool"
        raise NotVectorizable(f"node {type(node).__name__}")

    out_type = typ(tree)
    ok = (out_type == expect
          or (expect == "value" and out_type in ("number", "string")))
    if not ok:
        raise NotVectorizable(f"{expression!r} yields {out_type},"
                              f" need {expect}")
    return _TypedProgram(tree, columns, out_type, uses_x)


class GuardFilter:
    """Vectorized ``guard:`` row gate for the restricted comparison
    subset (per-row semantics: False/None/exception → skip row)."""

    __slots__ = ("program",)

    def __init__(self, expression: str) -> None:
        self.program = compile_restricted(expression, "bool")

    def supports(self, schema: pa.Schema) -> bool:
        return self.program.supports(schema)

    def mask(self, batch: pa.Table) -> pa.Array:
        out, valid = self.program.evaluate(batch)
        return pc.and_(pc.fill_null(out, False), valid)


class ExprChainPlan:
    """``{col | expr('...') | f | ...}`` — restricted-arithmetic expr
    compiled to Arrow, then the remaining (vectorizable) chain."""

    __slots__ = ("column", "program", "chain", "lang", "datatype")

    def __init__(self, column: str, body: str, chain: list[str],
                 lang: Optional[str], datatype: Optional[str],
                 expect: str = "number") -> None:
        self.program = compile_restricted(body, expect, allow_x=True,
                                          allow_str=(expect == "value"))
        self.column = column
        self.chain = chain
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        if self.column not in schema.names:
            return False
        t = schema.field(self.column).type
        numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
        stringy = pa.types.is_string(t) or pa.types.is_large_string(t)
        if not (numeric or (stringy and self.program.out_type == "string")):
            return False
        return self.program.supports(schema)

    @property
    def columns(self) -> list[str]:
        return [self.column] + sorted(self.program.columns)

    def evaluate(self, batch: pa.Table
                 ) -> tuple[pa.Array, pa.Array, Optional[str], Optional[str]]:
        col, mask, lang, dt, _raises = self.evaluate_full(batch)
        return col, mask, lang, dt

    def evaluate_full(self, batch: pa.Table):
        """-> (values, mask, lang, dt, raises): ``raises`` marks rows
        where the per-row kernel's expr would throw — the kernel
        escalates those to a RESOURCE abort (remaining properties
        dropped), which ResourcePlan mirrors with an alive mask."""
        x = batch.column(self.column)
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        col, mask, raises = self.program.evaluate_with_raises(batch, x=x)
        lang, dt = self.lang, self.datatype
        for fname in self.chain:
            col, mask, flang, fdt = _V_FUNCS[fname](col, mask)
            if flang is not None:
                lang = flang
            if fdt is not None and dt is None:
                dt = fdt
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        return col, mask, lang, dt, raises


class FanOutPlan:
    """``{col | split('re') | f | ...}`` — list fan-out: one output row
    per split element (pattern.py:105-120 list flattening), emitted via
    a parent-index take."""

    __slots__ = ("column", "regex", "chain", "lang", "datatype")

    def __init__(self, column: str, regex: str, chain: list[str],
                 lang: Optional[str], datatype: Optional[str]) -> None:
        self.column = column
        self.regex = regex
        self.chain = chain
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        return (self.column in schema.names
                and pa.types.is_string(schema.field(self.column).type)
                and all(f in ("toLower", "toUpper", "trim", "slug")
                        for f in self.chain))

    def evaluate(self, batch: pa.Table):
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, self.regex)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        mask = pa.array([True] * len(flat))
        for fname in self.chain:
            flat, mask, _, _ = _V_FUNCS[fname](flat, mask)
        return flat, mask, parents, self.lang, self.datatype


_SPLIT_RE = re.compile(r"split\s*\(\s*'([^']*)'\s*\)$")


def _finalize_strings(values: pa.Array, namespaces):
    """Python-exact ``_finalize`` re-parse over an Arrow string array
    (pattern.py semantics: a DATA value shaped like ``x@lang`` or
    ``x^^<dt>`` becomes a language/datatype literal — reference
    changelog #61/#62). The fast path touches nothing when no value
    contains '@' or '^^' (the overwhelming majority); suspicious rows
    get the kernel's own regexes row-by-row.

    -> (values, lang_array_or_None, dt_array_or_None)."""
    import numpy as np

    from rdf_mapper_ray.kernel.pattern import _DT_RE as _PDT
    from rdf_mapper_ray.kernel.pattern import _LANGSTRING_RE as _PLANG
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    sus = pc.and_(pc.is_valid(values),
                  pc.or_(pc.match_substring(values, "@"),
                         pc.match_substring(values, "^^")))
    if not (pc.any(sus).as_py() or False):
        return values, None, None
    idx = np.flatnonzero(pc.fill_null(sus, False)
                         .to_numpy(zero_copy_only=False))
    vals = values.to_pylist()
    langs: list = [None] * len(vals)
    dts: list = [None] * len(vals)
    for i in idx:
        s = vals[i]
        if "@" in s:
            m = _PLANG.match(s)
            if m:
                vals[i] = m.group(1)
                langs[i] = m.group(2)
                continue
        if "^^" in s:
            m = _PDT.match(s)
            if m:
                vals[i] = m.group(1)
                dts[i] = expand_curie(m.group(2), namespaces)
    return (pa.array(vals, type=pa.string()),
            pa.array(langs, type=pa.string()),
            pa.array(dts, type=pa.string()))


def _strip_suffixes(values: pa.Array, namespaces) -> pa.Array:
    """URI-context variant: the kernel takes ``str(node.value)`` after
    _finalize, so a lang/datatype shape in a dynamic URI value strips
    to its body (trial: `<.../{id}-{s1}>` with s1='a@b' mints '…-a')."""
    out, _lang, _dt = _finalize_strings(values, namespaces)
    return out


def _v_normalize(col: pa.Array) -> pa.Array:
    """Column-wise evaluator.normalize.

    Arrow/RE2 ``\\w`` is ASCII-only while the kernel's Python ``\\w`` is
    Unicode-aware, so a regex kernel here would mint member URIs that
    disagree with the concept URIs produced by ``normalize`` (dangling
    references for non-ASCII labels).  Labels are low-cardinality per
    batch, so dictionary-encode and run the Python normalizer once per
    distinct value — one source of truth for both paths."""
    d = col.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    normed_dict = pa.array(
        [None if v is None else normalize(v)
         for v in d.dictionary.to_pylist()], type=pa.string())
    return normed_dict.take(d.indices)


class MapByPlan:
    """``{col | map_by('name')}`` — the broadcast-lookup join (J1).

    Mapping VALUES are themselves templates; they are expanded once at
    compile time (they are static in every reference example), so the
    runtime is one ``index_in`` + ``take`` over the prebuilt value
    array. Misses are masked out (kernel: ValueError → property
    skipped). Row-dependent mapping values, multi-valued expansions, or
    mixed output kinds/langs fall back to the per-row kernel."""

    __slots__ = ("column", "keys", "values", "kind", "lang", "datatype")

    def __init__(self, column: str, keys: list[str], values: list[str],
                 kind: str, lang: Optional[str],
                 datatype: Optional[str]) -> None:
        self.column = column
        self.keys = pa.array(keys, type=pa.string())
        self.values = pa.array(values, type=pa.string())
        self.kind = kind
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        return (self.column in schema.names
                and pa.types.is_string(schema.field(self.column).type))

    def evaluate(self, batch: pa.Table):
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.index_in(col, value_set=self.keys)
        out = self.values.take(idx)
        return out, pc.is_valid(idx), self.lang, self.datatype


def _compile_map_by(column: str, mapping_name: str, spec: MapperSpec,
                    lang, datatype) -> tuple[str, "MapByPlan"]:
    if lang or datatype:
        raise NotVectorizable("suffix on map_by")
    mapping = spec.mappings.get(mapping_name)
    if not mapping:
        raise NotVectorizable(f"unknown/empty mapping {mapping_name!r}")
    from rdf_mapper_ray.kernel.evaluator import EvalState, value_expand
    from rdf_mapper_ray.kernel.nodes import Iri, Lit
    state = EvalState(spec, spec.context.new_child({}))
    keys, values = [], []
    kind = mlang = mdt = _UNSET = object()
    for k, template in mapping.items():
        try:
            node = value_expand(str(template), state)
        except Exception:
            raise NotVectorizable("row-dependent mapping value")
        if isinstance(node, list):
            if len(node) != 1:
                raise NotVectorizable("multi-valued mapping value")
            node = node[0]
        if isinstance(node, Iri):
            nkind, nval, nlang, ndt = "uri", str(node), None, None
        elif isinstance(node, Lit):
            nkind = "literal"
            nval = node.lexical if hasattr(node, "lexical") else str(node.value)
            nlang = node.lang
            ndt = node.datatype
        else:
            raise NotVectorizable(f"mapping value node {type(node)}")
        if kind is _UNSET:
            kind, mlang, mdt = nkind, nlang, ndt
        elif (nkind, nlang, ndt) != (kind, mlang, mdt):
            raise NotVectorizable("mixed mapping output kinds")
        keys.append(str(k))
        values.append(nval)
    if state.quads:
        raise NotVectorizable("side-effecting mapping value")
    if "None" in mapping:
        # Python str(None) == 'None' would HIT this key per-row while
        # the vectorized null mask misses it — fall back
        raise NotVectorizable("mapping key 'None'")
    return kind, MapByPlan(column, keys, values, kind, mlang, mdt)


class LookupTailPlan:
    """expr-chain output piped into a map_by lookup (cast-then-join)."""

    __slots__ = ("inner", "map_plan")

    def __init__(self, inner: "ExprChainPlan", map_plan: "MapByPlan") -> None:
        self.inner = inner
        self.map_plan = map_plan

    @property
    def columns(self) -> list[str]:
        return self.inner.columns

    def supports(self, schema: pa.Schema) -> bool:
        return self.inner.supports(schema)

    def evaluate(self, batch: pa.Table):
        out, mask, lang, dt, _raises = self.evaluate_full(batch)
        return out, mask, lang, dt

    def evaluate_full(self, batch: pa.Table):
        col, mask, _lang, _dt, raises = self.inner.evaluate_full(batch)
        idx = pc.index_in(col, value_set=self.map_plan.keys)
        out = self.map_plan.values.take(idx)
        mask = pc.and_(mask, pc.is_valid(idx))
        # NB a map_by MISS also raises per-row (ValueError) — but that
        # one is caught by the property loop (warn+skip), so only the
        # inner expr raise aborts the resource
        return (out, mask, self.map_plan.lang, self.map_plan.datatype,
                raises)


class AutoCVPlan:
    """``{col | autoCV('name')}`` (label mode): member triples per row +
    per-batch distinct concept/scheme quads (global dedup collapses
    cross-batch repeats, SURVEY.md §2.8 A3)."""

    __slots__ = ("column", "base", "scheme_id", "cv_name")

    def __init__(self, column: str, dataset_base: str, cv_name: str) -> None:
        self.column = column
        self.cv_name = cv_name
        self.base = f"{dataset_base}/def/{cv_name}"
        self.scheme_id = self.base + "_scheme"

    def supports(self, schema: pa.Schema) -> bool:
        return (self.column in schema.names
                and pa.types.is_string(schema.field(self.column).type))

    def evaluate(self, batch: pa.Table
                 ) -> tuple[pa.Array, pa.Array, Optional[str], Optional[str]]:
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # empty label → autoCV returns None → property skipped
        mask = pc.and_(pc.is_valid(col),
                       pc.greater(pc.utf8_length(col), 0))
        uris = pc.binary_join_element_wise(
            self.base + "/", _v_normalize(col), "",
            null_handling="replace", null_replacement="")
        return uris, mask, None, None

    def concept_quads(self, batch: pa.Table, graph: str) -> list[list]:
        from rdf_mapper_ray.kernel.pattern import _DT_RE as _PDT
        from rdf_mapper_ray.kernel.pattern import _LANGSTRING_RE as _PLANG

        def _label_literal(label: str):
            # the kernel's prefLabel goes through pattern _finalize, so
            # a label shaped like 'a@b' becomes a lang literal
            if "@" in label:
                m = _PLANG.match(label)
                if m:
                    return m.group(1), m.group(2), None
            if "^^" in label:
                m = _PDT.match(label)
                if m:
                    return m.group(1), None, expand_curie(m.group(2), {})
            return label, None, None

        labels = sorted(set(
            v for v in batch.column(self.column).to_pylist() if v))
        if not labels:
            # kernel mints the scheme lazily on the FIRST non-empty
            # label — zero labels means zero scheme triples
            return []
        rows = []
        scheme = self.scheme_id
        rows.append([graph, scheme, "uri", RDF_TYPE, "uri",
                     _SKOS + "ConceptScheme", None, None])
        rows.append([graph, scheme, "uri", _DCT + "title", "literal",
                     self.cv_name, None, None])
        rows.append([graph, scheme, "uri", _DCT + "description", "literal",
                     f"Automatically generated concept scheme {self.cv_name}",
                     None, None])
        for label in labels:
            cid = f"{self.base}/{normalize(label)}"
            rows.append([graph, cid, "uri", RDF_TYPE, "uri",
                         _SKOS + "Concept", None, None])
            lex, llang, ldt = _label_literal(label)
            rows.append([graph, cid, "uri", _SKOS + "prefLabel", "literal",
                         lex, llang, ldt])
            rows.append([graph, cid, "uri", _SKOS + "inScheme", "uri",
                         scheme, None, None])
            rows.append([graph, cid, "uri", _SKOS + "topConceptOf", "uri",
                         scheme, None, None])
            rows.append([graph, scheme, "uri", _SKOS + "hasTopConcept", "uri",
                         cid, None, None])
        return rows


# --------------------------------------------------------------------------
# property / resource plans
# --------------------------------------------------------------------------

_ARG_RE = re.compile(r"(\w+)\s*\(\s*'([^']*)'\s*\)\s*$")
_EXPR_ARG_RE = re.compile(r"expr\s*\(\s*'(.*)'\s*\)\s*$", re.DOTALL)
_ASBOOL_ARGS_RE = re.compile(r"asBoolean\s*\(\s*(.+)\s*\)\s*$", re.DOTALL)


class AsBooleanArgsPlan:
    """``{col | asBoolean('v1','v2')}`` — explicit truthy-value set
    (functions.py asBoolean *args form: case-folded membership; None →
    false, never skipped)."""

    __slots__ = ("column", "prefix", "values", "lang", "datatype")

    def __init__(self, column: str, prefix: list[str], values: list[str],
                 lang, datatype) -> None:
        self.column = column
        self.prefix = prefix
        self.values = [v.lower() for v in values]
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        return (self.column in schema.names
                and pa.types.is_string(schema.field(self.column).type))

    def evaluate(self, batch: pa.Table):
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = pc.is_valid(col)
        for fname in self.prefix:
            col, mask, _, _ = _V_FUNCS[fname](col, mask)
        truthy = pc.is_in(pc.utf8_lower(col),
                          value_set=pa.array(self.values))
        out = pc.fill_null(pc.if_else(truthy, "true", "false"), "false")
        n = len(col)
        # bare form: asBoolean(None) == false (never skipped); with a
        # prefix chain a null raises inside the string fn per-row, so
        # the row keeps the chain's validity mask
        final_mask = mask if self.prefix else pa.array([True] * n)
        return out, final_mask, self.lang, XSD_BOOLEAN


class PropPlan:
    __slots__ = ("predicate", "inverse", "object_kind", "value_plan")

    def __init__(self, predicate: str, inverse: bool, object_kind: str,
                 value_plan: Any) -> None:
        self.predicate = predicate
        self.inverse = inverse
        self.object_kind = object_kind          # "uri" | "literal"
        self.value_plan = value_plan

    def supports(self, schema: pa.Schema) -> bool:
        return self.value_plan.supports(schema)


def _compile_value(template: str, spec: MapperSpec) -> tuple[str, Any]:
    """literal/URI value template -> ("uri"|"literal", plan)."""
    namespaces = spec.namespaces
    if template.startswith("<") and template.endswith(">") \
            and not template.startswith("<::"):
        return "uri", _compile_uri(template, namespaces)

    # static @lang / ^^<dt> suffix (dynamic suffixes fall back)
    lang = datatype = None
    body = template
    m = _DT_RE.match(template)
    if m and "{" not in m.group(2):
        body = m.group(1)
        datatype = expand_curie(m.group(2), namespaces)
    else:
        m = _LANGSTRING_RE.match(template)
        if m and "{" not in m.group(2) and "}" not in m.group(2):
            body = m.group(1)
            lang = m.group(2)
    if "@" in body or "^^" in body:
        # a static fragment containing suffix-like characters would hit
        # the _finalize re-parse; leave those to the per-row kernel
        raise NotVectorizable(f"suffix-ambiguous template {template!r}")

    exps = _VAR_RE.findall(body)
    if len(exps) == 1 and "|" in exps[0] and _VAR_RE.fullmatch("{%s}" % exps[0]) \
            and body == "{" + exps[0] + "}":
        parts = _PIPE_RE.split(exps[0])
        column = parts[0].strip()
        if not column or column.startswith("$"):
            raise NotVectorizable("special var")
        chain = [p.strip() for p in parts[1:]]
        if chain:
            sm = _SPLIT_RE.fullmatch(chain[0])
            if sm or chain[0] == "splitComma":
                regex = sm.group(1) if sm else r"\s*,\s*"
                return "literal", FanOutPlan(column, regex, chain[1:],
                                             lang, datatype)
        if len(chain) == 1:
            am = _ARG_RE.fullmatch(chain[0])
            if am and am.group(1) == "autoCV":
                if lang or datatype:
                    raise NotVectorizable("suffix on autoCV")
                base = str(spec.context.get("$datasetBase"))
                return "uri", AutoCVPlan(column, base, am.group(2))
            if am and am.group(1) == "map_by":
                return _compile_map_by(column, am.group(2), spec,
                                       lang, datatype)
        if chain:
            bm = _ASBOOL_ARGS_RE.fullmatch(chain[-1])
            if bm:
                if lang or datatype:
                    raise NotVectorizable("suffix on asBoolean(args)")
                prefix = chain[:-1]
                for fname in prefix:
                    if fname not in _V_FUNCS or fname in _TERMINAL:
                        raise NotVectorizable(f"function {fname!r}")
                bargs = re.findall(r"'([^']*)'", bm.group(1))
                if not bargs:
                    raise NotVectorizable("asBoolean() empty arg list")
                return "literal", AsBooleanArgsPlan(column, prefix, bargs,
                                                    lang, datatype)
            em = _EXPR_ARG_RE.fullmatch(chain[0])
            if em:
                rest = chain[1:]
                mm = _ARG_RE.fullmatch(rest[-1]) if rest else None
                if mm and mm.group(1) == "map_by":
                    # expr('...') | [string fns |] map_by('m') — the
                    # nation-style cast-then-lookup chain
                    mid = rest[:-1]
                    for fname in mid:
                        if fname not in _V_FUNCS or fname in _TERMINAL:
                            raise NotVectorizable(f"function {fname!r}")
                    kind, mplan = _compile_map_by(column, mm.group(2),
                                                  spec, lang, datatype)
                    inner = ExprChainPlan(column, em.group(1), mid,
                                          None, None, expect="value")
                    return kind, LookupTailPlan(inner, mplan)
                for fname in rest:
                    if fname not in _V_FUNCS:
                        raise NotVectorizable(f"function {fname!r}")
                for fname in rest[:-1]:
                    if fname in _TERMINAL:
                        raise NotVectorizable("typed fn mid-chain")
                return "literal", ExprChainPlan(column, em.group(1), rest,
                                                lang, datatype)
        for fname in chain:
            if fname not in _V_FUNCS:
                raise NotVectorizable(f"function {fname!r}")
        for fname in chain[:-1]:
            if fname in _TERMINAL:
                raise NotVectorizable("typed fn mid-chain")
        return "literal", FnChainPlan(column, chain, lang, datatype)

    plan = _compile_concat(body, namespaces)
    if lang or datatype:
        plan = FnChainWrapper(plan, lang, datatype)
    return "literal", plan


class NestedPlan:
    """Inline nested resource spec (M11): the child's subject URI is the
    property value; the child's own triples are emitted alongside."""

    __slots__ = ("plan",)

    def __init__(self, plan: "ResourcePlan") -> None:
        self.plan = plan

    def supports(self, schema: pa.Schema) -> bool:
        return self.plan.supports(schema)


class FnChainWrapper:
    """Concat plan + static lang/datatype."""

    __slots__ = ("inner", "lang", "datatype")

    def __init__(self, inner: ConcatPlan, lang, datatype) -> None:
        self.inner = inner
        self.lang = lang
        self.datatype = datatype

    def supports(self, schema: pa.Schema) -> bool:
        return self.inner.supports(schema)

    def evaluate(self, batch):
        col, mask = self.inner.evaluate(batch)
        return col, mask, self.lang, self.datatype


class ResourcePlan:
    """Fully-vectorizable resource spec."""

    __slots__ = ("name", "graph", "subject", "type_uri", "props", "fallback",
                 "filters", "namespaces")

    def __init__(self, name: str, graph: str, subject: ConcatPlan,
                 type_uri: Optional[str], props: list[PropPlan],
                 fallback: str, filters: Optional[list[RowFilter]] = None,
                 namespaces=None) -> None:
        self.name = name
        self.graph = graph
        self.subject = subject
        self.type_uri = type_uri
        self.props = props
        self.fallback = fallback
        self.filters = filters or []
        self.namespaces = namespaces or {}

    def _finalize_literal(self, values, mask, lang, dt):
        """Post-execute literal semantics shared by every literal plan:
        with no declared suffix, DATA values shaped like ``x@lang`` /
        ``x^^<dt>`` re-parse (pattern.py _finalize); with a declared
        scalar suffix, empty values are suppressed (changelog #61/#62)."""
        if lang is None and dt is None:
            values, lang_a, dt_a = _finalize_strings(values,
                                                     self.namespaces)
            return values, mask, lang_a, dt_a
        if not isinstance(lang, pa.Array) and not isinstance(dt, pa.Array) \
                and isinstance(values, (pa.Array, pa.ChunkedArray)):
            # An all-null input column yields null-typed arrays; pc.and_
            # has no (null, bool) kernel, so coerce both sides to bool_.
            nonempty = pc.fill_null(
                pc.cast(pc.not_equal(values, ""), pa.bool_()), False)
            if pa.types.is_null(mask.type):
                mask = pc.fill_null(pc.cast(mask, pa.bool_()), False)
            mask = _and_masks(mask, nonempty)
        return values, mask, lang, dt

    def supports(self, schema: pa.Schema) -> bool:
        names = set(schema.names)
        for plan in [self.subject] + [p.value_plan for p in self.props]:
            cols = getattr(plan, "columns", None)
            if cols is None:
                cols = [getattr(plan, "column", None)]
                if isinstance(plan, FnChainWrapper):
                    cols = plan.inner.columns
            for c in cols:
                if c is not None and c not in names:
                    return False
        return (self.subject.supports(schema)
                and all(p.supports(schema) for p in self.props)
                and all(f.supports(schema) for f in self.filters))

    def evaluate(self, batch: pa.Table) -> list[pa.Table]:
        for f in self.filters:
            batch = batch.filter(f.mask(batch))
        n = batch.num_rows
        if n == 0:
            return []
        subj, subj_mask = self.subject.evaluate(batch, fallback=self.fallback)
        subj = _strip_suffixes(subj, self.namespaces)
        out: list[pa.Table] = []

        def emit(pred: str, okind: str, values: pa.Array, mask: pa.Array,
                 lang: Optional[str], dt: Optional[str],
                 inverse: bool, subjects: pa.Array = None,
                 smask: pa.Array = None) -> None:
            ss = subjects if subjects is not None else subj
            sm = smask if smask is not None else subj_mask
            m = len(ss)
            full = _and_masks(sm, mask) if mask is not None \
                else _as_bool_mask(sm)
            s, o = (values, ss) if inverse else (ss, values)
            if isinstance(dt, pa.ChunkedArray):
                dt = dt.combine_chunks()
            if isinstance(lang, pa.ChunkedArray):
                lang = lang.combine_chunks()
            dt_col = dt if isinstance(dt, pa.Array) \
                else pa.array([dt] * m, type=pa.string())
            lang_col = lang if isinstance(lang, pa.Array) \
                else pa.array([lang] * m, type=pa.string())
            tbl = pa.Table.from_arrays([
                pa.array([self.graph] * m, type=pa.string()),
                s,
                pa.array(["uri"] * m, type=pa.string()),
                pa.array([pred] * m, type=pa.string()),
                pa.array([okind] * m, type=pa.string()),
                o,
                lang_col,
                dt_col,
            ], schema=TRIPLE_SCHEMA)
            out.append(tbl.filter(full))

        if self.type_uri is not None:
            emit(RDF_TYPE, "uri",
                 pa.array([self.type_uri] * n, type=pa.string()),
                 None, None, None, False)
        # resource-abort parity: a raising expr (None in arithmetic,
        # div-zero, float(None)…) is escalated by the kernel to a
        # ValueError out of process_resource — triples emitted BEFORE
        # the failing property stay, everything after is dropped. The
        # alive mask reproduces that property-order semantics.
        alive: Optional[pa.Array] = None

        def and_alive(m):
            if alive is None:
                return m
            return alive if m is None else _and_masks(m, alive)

        extra_rows: list[list] = []
        for p in self.props:
            if isinstance(p.value_plan, NestedPlan):
                sub = p.value_plan.plan
                child_subj, child_mask = sub.subject.evaluate(
                    batch, fallback=sub.fallback)
                child_subj = _strip_suffixes(child_subj, self.namespaces)
                # child requires/unless gate the link triple too: the
                # kernel skips the property when process_resource returns
                # None, so AND the child's row filters (computed on the
                # parent batch) into the link mask
                for f in sub.filters:
                    child_mask = _and_masks(child_mask, f.mask(batch))
                emit(p.predicate, "uri", child_subj,
                     and_alive(child_mask), None, None, p.inverse)
                out.extend(sub.evaluate(
                    batch if alive is None else batch.filter(alive)))
                continue
            if isinstance(p.value_plan, FanOutPlan):
                flat, mask, parents, lang, dt = p.value_plan.evaluate(batch)
                flat, mask, lang, dt = self._finalize_literal(
                    flat, mask, lang, dt)
                smask = subj_mask if alive is None \
                    else _and_masks(subj_mask, alive)
                emit(p.predicate, p.object_kind, flat, mask, lang, dt,
                     p.inverse, subjects=subj.take(parents),
                     smask=smask.take(parents))
                continue
            raises = None
            if isinstance(p.value_plan, (ExprChainPlan, LookupTailPlan)):
                values, mask, lang, dt, raises = \
                    p.value_plan.evaluate_full(batch)
                if p.object_kind == "uri":
                    values = _strip_suffixes(values, self.namespaces)
                else:
                    values, mask, lang, dt = self._finalize_literal(
                        values, mask, lang, dt)
            elif isinstance(p.value_plan, ConcatPlan) \
                    and p.object_kind == "uri":
                values, mask = p.value_plan.evaluate(batch,
                                                     fallback=self.fallback)
                values = _strip_suffixes(values, self.namespaces)
                lang = dt = None
            else:
                values, mask, lang, dt = _eval_value(p.value_plan, batch)
                if p.object_kind == "uri":
                    values = _strip_suffixes(values, self.namespaces)
                else:
                    values, mask, lang, dt = self._finalize_literal(
                        values, mask, lang, dt)
            emit(p.predicate, p.object_kind, values, and_alive(mask),
                 lang, dt, p.inverse)
            if raises is not None and (pc.any(raises).as_py() or False):
                alive = pc.invert(raises) if alive is None \
                    else _and_masks(alive, pc.invert(raises))
            if isinstance(p.value_plan, AutoCVPlan):
                extra_rows.extend(p.value_plan.concept_quads(
                    batch if alive is None else batch.filter(alive),
                    self.graph))
        if extra_rows:
            cols = list(zip(*extra_rows))
            out.append(pa.Table.from_arrays(
                [pa.array(list(c), type=pa.string()) for c in cols],
                schema=TRIPLE_SCHEMA))
        return out


def _eval_value(plan: Any, batch: pa.Table):
    if isinstance(plan, ConcatPlan):
        values, mask = plan.evaluate(batch)
        return values, mask, None, None
    return plan.evaluate(batch)


def compile_resource(rs: ResourceSpec, spec: MapperSpec
                     ) -> Optional[ResourcePlan]:
    """ResourceSpec -> ResourcePlan, or None when any feature needs the
    per-row kernel."""
    try:
        if rs.pattern is not None or rs.preserved_graph:
            raise NotVectorizable("pattern/graphAdd")
        filters: list[Any] = []
        if rs.guard is not None:
            # restricted comparison/arithmetic guards compile to Arrow
            # masks; anything else raises here → per-row kernel
            filters.append(GuardFilter(rs.guard))
        for mapping, mode in ((rs.requires, "require"), (rs.unless, "unless")):
            for key, expected in (mapping or {}).items():
                ok = (expected is None or isinstance(expected, str)
                      or (isinstance(expected, list)
                          and all(e is None or isinstance(e, str)
                                  for e in expected)))
                if not ok:
                    raise NotVectorizable("non-string requires/unless")
                filters.append(RowFilter(key, mode, expected))
        graph = DEFAULT_GRAPH
        if rs.graph:
            gplan = _compile_uri(rs.graph, spec.namespaces)
            if gplan.columns or len(gplan.parts) != 1:
                raise NotVectorizable("dynamic @graph")
            graph = gplan.parts[0][1]
        subject = None
        type_uri = None
        props: list[PropPlan] = []
        for (prop, template) in rs.properties:
            if prop == "@id":
                if not isinstance(template, str):
                    raise NotVectorizable("@id not a string")
                subject = _compile_uri(template, spec.namespaces)
                continue
            if prop == "@type":
                tplan = _compile_uri(template, spec.namespaces)
                if tplan.columns or len(tplan.parts) != 1:
                    raise NotVectorizable("dynamic @type")
                type_uri = tplan.parts[0][1]
                continue
            if prop == "@graph":
                continue
            if isinstance(template, dict):
                sub = compile_resource(ResourceSpec.from_dict(template), spec)
                if sub is None:
                    raise NotVectorizable("nested spec not vectorizable")
                if any(isinstance(sp.value_plan,
                                  (ExprChainPlan, LookupTailPlan))
                       for sp in sub.props):
                    # a raising child expr aborts the CHILD mid-way and
                    # skips only the parent link — per-row territory
                    raise NotVectorizable("expr in nested spec")
                inverse = prop.startswith("^")
                pname = prop[1:] if inverse else prop
                pplan = _compile_uri(pname, spec.namespaces)
                if pplan.columns or len(pplan.parts) != 1:
                    raise NotVectorizable("dynamic predicate")
                props.append(PropPlan(pplan.parts[0][1], inverse, "uri",
                                      NestedPlan(sub)))
                continue
            if not isinstance(template, str):
                raise NotVectorizable("nested/list template")
            inverse = prop.startswith("^")
            pname = prop[1:] if inverse else prop
            if pname.startswith(":") or not (pname.startswith("<")
                                             and pname.endswith(">")):
                raise NotVectorizable("propspec/bare property")
            pplan = _compile_uri(pname, spec.namespaces)
            if pplan.columns or len(pplan.parts) != 1:
                raise NotVectorizable("dynamic predicate")
            okind, vplan = _compile_value(template, spec)
            if inverse and okind != "uri":
                raise NotVectorizable("inverse of literal")
            props.append(PropPlan(pplan.parts[0][1], inverse, okind, vplan))
        if subject is None:
            raise NotVectorizable("no explicit @id")
        if spec.auto_declare:
            # implicit-declaration side effects need the per-row path
            raise NotVectorizable("auto_declare")
        fallback = f"{spec.context.get('$datasetBase')}/data/{rs.name}"
        return ResourcePlan(rs.name, graph, subject, type_uri, props,
                            fallback, filters,
                            namespaces=dict(spec.namespaces))
    except NotVectorizable:
        return None


def compile_spec(spec: MapperSpec) -> dict[str, ResourcePlan]:
    """name -> plan for every vectorizable resource in the spec."""
    import json as _json
    raw = _json.dumps(spec.raw, default=str)
    if "<::" in raw:
        # backlink references may point at resources that would otherwise
        # vectorize (and thus never record backlinks) — all per-row then
        return {}
    plans = {}
    for rs in spec.resources:
        plan = compile_resource(rs, spec)
        if plan is not None:
            plans[rs.name] = plan
    return plans
