"""User extension factories: scalar functions, attribute aggregators, and
window processors registered at runtime by name, usable from the SQL
dialect.

≙ reference ``EventFluxManager::add_scalar_function_factory`` /
``add_window_factory`` / ``add_attribute_aggregator_factory``
(``src/core/eventflux_manager.rs:263-348``), exercised by
``tests/stateful_udf.rs`` and ``tests/dynamic_ext_integration.rs``.
Spark-first mapping:

- a **scalar function** registers as an Arrow-vectorized pandas UDF
  (``spark.udf.register``) — per-batch ``pd.Series -> pd.Series``;
- an **attribute aggregator** registers as a grouped-aggregate pandas UDF —
  ``(pd.Series, ...) -> scalar`` per group; usable in GROUP BY selects and
  recognized by the dialect's aggregate detector. State lives per group in
  the UDF invocation — the reference's per-group aggregator instance.
  Order-sensitive aggregators (EMA, first/last-weighted) must take an
  explicit order column and sort inside: Spark does not guarantee row order
  within a shuffled group.
- a **window processor** registers as a DataFrame transform
  ``factory(df, params, partition_key) -> DataFrame``: it receives the
  source stream (data columns + ``__seq`` arrival order + ``__ts`` event
  time) and returns the window's retained contents with those columns
  preserved — the dialect's ``WINDOW('<name>', params...)`` dispatches to
  it when the kind is not built in, exactly like the reference's
  WindowProcessorFactory lookup. Streaming twins are composed from
  ``applyInPandasWithState`` the same way (see ``streaming/ratelimit.py``
  for the pattern).
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

_SCALARS: dict[str, str] = {}
_AGGREGATORS: dict[str, str] = {}
_WINDOWS: dict[str, Callable] = {}


def add_scalar_function_factory(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> None:
    """Register ``fn(pd.Series, ...) -> pd.Series`` as a vectorized scalar
    usable anywhere the dialect accepts an expression."""
    spark.udf.register(name, pandas_udf(fn, return_type))
    _SCALARS[name.lower()] = return_type


def add_attribute_aggregator_factory(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> None:
    """Register ``fn(pd.Series, ...) -> scalar`` as a grouped aggregate.
    The dialect then treats ``name(...)`` in a SELECT as an aggregation
    (GROUP BY compiles around it like any built-in)."""
    from pyspark.sql.functions import PandasUDFType

    udaf = pandas_udf(fn, return_type, functionType=PandasUDFType.GROUPED_AGG)
    spark.udf.register(name, udaf)
    _AGGREGATORS[name.lower()] = return_type


def add_window_factory(name: str, factory: Callable) -> None:
    """Register ``factory(df, params, partition_key) -> DataFrame`` as a
    window kind for ``WINDOW('<name>', params...)``."""
    _WINDOWS[name.lower()] = factory


def get_window_factory(name: str) -> Callable | None:
    return _WINDOWS.get(name.lower())


def matches_registered_aggregator(expr: str) -> bool:
    """True when the expression calls any registered attribute aggregator —
    the dialect's extension hook next to its built-in aggregate regex."""
    return any(
        re.search(rf"\b{re.escape(n)}\s*\(", expr, re.IGNORECASE)
        for n in _AGGREGATORS
    )


def registered() -> dict[str, list[str]]:
    return {
        "scalar": sorted(_SCALARS),
        "aggregator": sorted(_AGGREGATORS),
        "window": sorted(_WINDOWS),
    }


# -- reference-shaped ready-made extensions (used by tests and gates) --------


def ema_aggregator(alpha: float) -> Callable:
    """Exponential moving average over arrival order: the canonical
    order-sensitive custom aggregator (``y_i = a·x_i + (1-a)·y_{i-1}``).
    Takes (values, order) series; sorts by order inside the group, then
    evaluates the closed form with vectorized numpy."""
    import numpy as np

    def ema(v: pd.Series, o: pd.Series) -> float:
        x = v.to_numpy(dtype="float64")[np.argsort(o.to_numpy(), kind="stable")]
        n = len(x)
        if n == 0:
            return float("nan")
        w = alpha * (1.0 - alpha) ** np.arange(n - 1, -1, -1, dtype="float64")
        w[0] = (1.0 - alpha) ** (n - 1)  # y_1 = x_1 seeds the recursion
        return float((w * x).sum())

    return ema


def median_aggregator() -> Callable:
    def median(v: pd.Series) -> float:
        return float(v.median())

    return median
