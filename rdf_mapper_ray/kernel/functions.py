"""Transform-function registry and builtins.

Semantics mirror the reference registry (function.py:19-179):

* a pipeline step ``{var | fn | g('arg')}`` resolves each ``fn`` by name in
  a process-global registry;
* call arguments are parsed from the template text: quoted tokens are
  string literals, bare tokens are looked up in the row context with the
  token itself as fallback (``ctx.get(tok, tok)``, function.py:44);
* functions receive ``(value, ctx, *args)`` and may return ``None`` (skip),
  a scalar, a ``Lit``/``Iri`` node, or a list (which fans out downstream,
  pattern.py:105-120).

Unlike the reference we never build lambdas with ``eval`` — call strings
compile to plain closures (resolved lazily so plugin registrations made
after spec load are honoured), and compiled calls are cached per process.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import re
from typing import Any, Callable, Optional

from rdf_mapper_ray.kernel.dates import parse_datetime
from rdf_mapper_ray.kernel.errors import PatternError
from rdf_mapper_ray.kernel.nodes import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    Iri,
    Lit,
)

_REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable) -> None:
    """Register a transform function ``fn(value, ctx, *args)``."""
    _REGISTRY[name] = fn


def lookup(name: str) -> Optional[Callable]:
    return _REGISTRY.get(name)


_CALL_RE = re.compile(r"([\w]+)\s*\((.*)\)\s*$", re.DOTALL)


def _split_args(argstr: str) -> list[str]:
    """Split a call-argument string on top-level commas (quote/bracket aware)."""
    out, depth, buf, quote = [], 0, [], None
    for ch in argstr:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _compile_arg(tok: str) -> Callable[[Any], Any]:
    """Compile one argument token to ``ctx -> value``."""
    if (tok.startswith("'") and tok.endswith("'")) or \
       (tok.startswith('"') and tok.endswith('"')):
        lit = tok[1:-1]
        return lambda ctx: lit
    if tok == "None":
        return lambda ctx: None
    if tok == "True":
        return lambda ctx: True
    if tok == "False":
        return lambda ctx: False
    if tok.startswith("["):
        import ast
        try:
            val = ast.literal_eval(tok)
            return lambda ctx: val
        except (ValueError, SyntaxError):
            pass
    # bare token: context lookup with the token itself as fallback
    return lambda ctx: ctx.get(tok, tok)


_CALL_CACHE: dict[str, Callable] = {}


def compile_call(call_string: str) -> Callable[[Any, Any], Any]:
    """Compile a pipeline step like ``asInt`` or ``split('-')`` to a closure.

    Function-name resolution is deferred to first invocation (then cached)
    so templates may be compiled before plugins register their functions.
    """
    cached = _CALL_CACHE.get(call_string)
    if cached is not None:
        return cached

    m = _CALL_RE.match(call_string)
    if m:
        fname = m.group(1).strip()
        arg_fns = [_compile_arg(t) for t in _split_args(m.group(2).strip())]
    else:
        fname = call_string.strip()
        arg_fns = []
        if not re.fullmatch(r"[\w]+", fname):
            raise PatternError(f"Cannot parse function call '{call_string}'")

    holder: list[Callable] = []

    def _invoke(value: Any, ctx: Any) -> Any:
        if not holder:
            fn = _REGISTRY.get(fname)
            if fn is None:
                raise PatternError(f"Function '{fname}' not found in registry")
            holder.append(fn)
        return holder[0](value, ctx, *[afn(ctx) for afn in arg_fns])

    _CALL_CACHE[call_string] = _invoke
    return _invoke


def evaluate(call_string: str, value: Any, ctx: Any) -> Any:
    """Evaluate a call string once (test / interactive convenience)."""
    return compile_call(call_string)(value, ctx)


# ---------------------------------------------------------------------------
# builtin transforms (reference: function.py:64-179)
# ---------------------------------------------------------------------------

def _scalar(v: Any) -> Any:
    """Unwrap a Lit to its Python value; pass other values through."""
    return v.value if isinstance(v, Lit) else v


def _none_or_empty(s: Any) -> bool:
    return s is None or (type(s) is str and s == "")


def _string_check(s: Any, fname: str, permissive: bool = False) -> str:
    if s is None:
        raise ValueError(f"{fname} does not accept None as input")
    if isinstance(s, Lit):
        return str(s.value)
    if type(s) is not str:
        if permissive:
            return str(s)
        raise ValueError(f"{fname} only accepts strings but found {type(s)}")
    return s


def asInt(s: Any, ctx: Any = None) -> Optional[Lit]:
    s = _scalar(s)
    return Lit(int(float(s))) if not _none_or_empty(s) else None


def asDecimal(s: Any, ctx: Any = None) -> Optional[Lit]:
    s = _scalar(s)
    if _none_or_empty(s):
        return None
    return Lit(float(s), datatype=XSD_DECIMAL)


def _as_native_dt(s: Any) -> Any:
    """Parquet-native inputs: the reference only ever sees strings
    (CSV/JSON), but our sources read Arrow timestamp/date columns as
    datetime objects — accept them directly."""
    return s if isinstance(s, (_dt.datetime, _dt.date)) else None


def asDateTime(s: Any, ctx: Any = None) -> Optional[Lit]:
    s = _scalar(s)
    nat = _as_native_dt(s)
    if nat is not None:
        if not isinstance(nat, _dt.datetime):
            nat = _dt.datetime(nat.year, nat.month, nat.day)
        return Lit(nat.isoformat(), datatype=XSD_DATETIME)
    if _none_or_empty(s) or type(s) is not str:
        return None
    dt = parse_datetime(s)
    return Lit(dt.isoformat(), datatype=XSD_DATETIME) if dt else None


def asDate(s: Any, ctx: Any = None) -> Optional[Lit]:
    s = _scalar(s)
    nat = _as_native_dt(s)
    if nat is not None:
        if isinstance(nat, _dt.datetime):
            nat = nat.date()
        return Lit(nat.isoformat(), datatype=XSD_DATE)
    if _none_or_empty(s) or type(s) is not str:
        return None
    dt = parse_datetime(s)
    return Lit(dt.date().isoformat(), datatype=XSD_DATE) if dt else None


def asDateOrDatetime(s: Any, ctx: Any = None) -> Optional[Lit]:
    s = _scalar(s)
    nat = _as_native_dt(s)
    if nat is not None:
        if isinstance(nat, _dt.datetime) and nat.time() != _dt.time(0, 0):
            return Lit(nat.isoformat(), datatype=XSD_DATETIME)
        if isinstance(nat, _dt.datetime):
            nat = nat.date()
        return Lit(nat.isoformat(), datatype=XSD_DATE)
    if _none_or_empty(s) or type(s) is not str:
        return None
    if re.fullmatch(r"[12]\d{3}", s):
        return Lit(f"{s}-01-01", datatype=XSD_DATE)
    dt = parse_datetime(s)
    if not dt:
        return None
    if dt.time() == _dt.time(0, 0):
        return Lit(dt.date().isoformat(), datatype=XSD_DATE)
    return Lit(dt.isoformat(), datatype=XSD_DATETIME)


def _fold(v: Any) -> Any:
    return v.lower() if type(v) is str else v


def asBoolean(s: Any, ctx: Any = None, *args: Any) -> Lit:
    s = _scalar(s)
    if s is None:
        return Lit(False, datatype=XSD_BOOLEAN)
    if args:
        return Lit(_fold(s) in [_fold(a) for a in args], datatype=XSD_BOOLEAN)
    return Lit(_fold(s) in ["yes", "true", "ok", "1", 1, 1.0],
               datatype=XSD_BOOLEAN)


def trim(s: Any, ctx: Any = None) -> str:
    return _string_check(s, "trim").strip()


def toLower(s: Any, ctx: Any = None) -> str:
    return _string_check(s, "toLower").lower()


def toUpper(s: Any, ctx: Any = None) -> str:
    return _string_check(s, "toUpper").upper()


def slug(s: Any, ctx: Any = None) -> str:
    s = _string_check(s, "slug", permissive=True)
    return "-".join(s.lower().split()).replace("%", "_").replace("/", "_") \
        .replace("[", "_").replace("]", "_")


def splitComma(s: Any, ctx: Any = None) -> list[str]:
    return re.split(r"\s*,\s*", _string_check(s, "splitComma"))


def split(s: Any, ctx: Any, reg: str) -> list[str]:
    return re.split(reg, _string_check(s, "split"))


_EXPR_CACHE: dict[str, Any] = {}


def expr(s: Any, ctx: Any = None, expression: str = "") -> Any:
    """Arbitrary Python expression; ``x`` is bound to the (unwrapped) value."""
    code = _EXPR_CACHE.get(expression)
    if code is None:
        code = compile(expression, "<expr>", "eval")
        _EXPR_CACHE[expression] = code
    return eval(code, {}, {"x": _scalar(s), "state": ctx})


def sha1_b32(*parts: str) -> str:
    """SHA-1 over UTF-8 parts, base32hex-encoded (uri_expand/hash encoding)."""
    h = hashlib.sha1()
    for p in parts:
        h.update(bytes(p, "UTF-8"))
    return base64.b32hexencode(h.digest()).decode("UTF-8")


def hash(arg: Any, ctx: Any = None, *keys: Any) -> str:  # noqa: A001
    arg = _scalar(arg)
    h = hashlib.sha1()
    if arg:
        h.update(bytes(str(arg), "UTF-8"))
    for key in keys:
        h.update(bytes(str(_scalar(key)), "UTF-8"))
    return base64.b32hexencode(h.digest()).decode("UTF-8")


def sha256(arg: Any, ctx: Any = None, *keys: Any) -> Optional[str]:
    """Hex sha256 of the value (+ optional extra parts) — used for the
    per-row content-digest invariant (BASELINE.json input_hint)."""
    arg = _scalar(arg)
    if arg is None:
        return None
    h = hashlib.sha256()
    h.update(bytes(str(arg), "UTF-8"))
    for key in keys:
        h.update(bytes(str(_scalar(key)), "UTF-8"))
    return h.hexdigest()


def length(s: Any, ctx: Any = None) -> int:
    """Character length of the value (scale-pipeline convenience)."""
    s = _scalar(s)
    return len(str(s)) if s is not None else 0


def now(_: Any, ctx: Any = None) -> Lit:
    """Job-level timestamp (deterministic: injected at spec compile)."""
    ts = getattr(ctx, "job_time", None) if ctx is not None else None
    if ts is None:
        ts = _dt.datetime.now().isoformat()
    return Lit(ts, datatype=XSD_DATETIME)


def to_entries(data: Any, ctx: Any = None) -> list[dict[str, Any]]:
    data = _scalar(data)
    if not isinstance(data, dict):
        raise ValueError(f"to_entries expecting a dict but found {data}")
    return [{"$key": k, "$value": v} for k, v in data.items()
            if not str(k).startswith("$")]


def asInt3(s: Any, ctx: Any = None) -> int:
    """Test helper (reference function.py:64-66)."""
    return int(str(_scalar(s))) * 3


for _name, _fn in [
    ("asInt", asInt), ("asDecimal", asDecimal), ("asDate", asDate),
    ("asDateTime", asDateTime), ("asDateOrDatetime", asDateOrDatetime),
    ("asBoolean", asBoolean), ("trim", trim), ("toLower", toLower),
    ("toUpper", toUpper), ("slug", slug), ("splitComma", splitComma),
    ("split", split), ("expr", expr), ("hash", hash), ("now", now),
    ("to_entries", to_entries), ("asInt3", asInt3), ("sha256", sha256),
    ("length", length),
]:
    register(_name, _fn)
