"""EventFlux built-in scalar function registry → Spark Catalyst expressions.

Reference inventory: 70+ functions under
``/root/reference/src/core/executor/function/`` (registry
``builtin_wrapper.rs``; catalog ``feat/builtin_functions/README.md:95-265``).
Every mapping below is a JVM-side built-in (whole-stage codegen) — no Python
in the hot path. Semantics notes:

- ``position/locate/instr`` are 1-based in the reference, same as Spark.
- numeric widening INT→LONG→FLOAT→DOUBLE (``value.rs:270-274``) matches
  Spark's implicit casts.
- ``default(x, d)``/``ifnull`` → ``coalesce``; ``nullif`` is native.
- ``instanceOf*`` type checks are compile-time constants under Spark's static
  typing; exposed for API parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["SCALAR_FUNCTIONS", "fn"]


def _sign(c: Column) -> Column:
    return F.signum(c)


def _truncate(c: Column) -> Column:
    # reference trunc: toward zero (Rust f64::trunc)
    return F.when(c >= 0, F.floor(c)).otherwise(F.ceil(c)).cast("double")


_INTERVAL_KW = {
    "YEAR": "years", "MONTH": "months", "WEEK": "weeks", "DAY": "days",
    "HOUR": "hours", "MINUTE": "mins", "SECOND": "secs",
}


def _date_add(unit: str, n, ts: Column) -> Column:
    """dateAdd(unit, n, ts) — interval arithmetic on the timestamp column
    (reference date_functions.rs dateAdd)."""
    kw = _INTERVAL_KW[unit.upper().rstrip("S")]
    n = n if isinstance(n, Column) else F.lit(n)
    return ts.cast("timestamp") + F.make_interval(**{kw: n})


def _instance_of(type_name: str):
    def check(c: Column) -> Column:
        # static schema → constant; kept as an expression for API parity
        return F.lit(True) & c.cast("string").isNotNull() | F.lit(False)

    return check


SCALAR_FUNCTIONS: dict[str, callable] = {
    # --- math (math_functions.rs) ---
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": F.round,
    "trunc": _truncate,
    "sign": _sign,
    "mod": lambda a, b: a % b,
    "maximum": F.greatest,
    "minimum": F.least,
    "sqrt": F.sqrt,
    "power": F.pow,
    "pow": F.pow,
    "exp": F.exp,
    "ln": F.log,
    "log": F.log,
    "log10": F.log10,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    # --- string (string_functions.rs) ---
    "length": F.length,
    "upper": F.upper,
    "lower": F.lower,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "substring": F.substring,
    "substr": F.substring,
    "left": lambda c, n: F.substring(c, 1, n),
    "right": lambda c, n: F.substring(c, -n, n),
    "lpad": F.lpad,
    "rpad": F.rpad,
    "reverse": F.reverse,
    "repeat": F.repeat,
    "concat": F.concat,
    "replace": lambda c, a, b: F.regexp_replace(c, F.lit(a), F.lit(b)),
    "position": F.locate,
    "locate": F.locate,
    "instr": lambda c, s: F.locate(s, c),
    "like": lambda c, pat: c.like(pat),
    "ascii": F.ascii,
    "chr": F.chr,
    "char": F.chr,
    # --- date/time (date_functions.rs) ---
    "now": F.current_timestamp,
    "eventTimestamp": lambda ts: ts,
    "formatDate": F.date_format,
    "parseDate": F.to_timestamp,
    "dateAdd": lambda unit, n, ts: _date_add(unit, n, ts),
    # --- conversion / null handling ---
    "cast": lambda c, t: c.cast(t),
    "convert": lambda c, t: c.try_cast(t) if hasattr(c, "try_cast") else c.cast(t),
    "nullif": F.nullif,
    "default": F.coalesce,
    "ifnull": F.coalesce,
    "coalesce": F.coalesce,
    # --- utility ---
    "uuid": lambda: F.expr("uuid()"),
    # --- type checks (instance_of_checkers.rs) — constants under static types
    "instanceOfBoolean": _instance_of("boolean"),
    "instanceOfString": _instance_of("string"),
    "instanceOfInteger": _instance_of("int"),
    "instanceOfLong": _instance_of("long"),
    "instanceOfFloat": _instance_of("float"),
    "instanceOfDouble": _instance_of("double"),
}


def fn(name: str, *args) -> Column:
    """Look up an EventFlux builtin by name and apply it."""
    return SCALAR_FUNCTIONS[name](*args)
