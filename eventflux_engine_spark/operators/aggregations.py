"""Aggregation operators.

Reference aggregator registry (add/remove/reset incremental accumulators):
``/root/reference/src/core/query/selector/attribute/aggregator/mod.rs``
(registry names at ``:1885-2060``). Spark's hash aggregate does partial
(map-side) + final aggregation automatically — the declarative mapping below
keeps everything inside whole-stage codegen.

Also provides the salted two-phase aggregation used to break hot-key skew
(SURVEY.md §7.1 ``skew.py`` role): at 10^12-turn scale a handful of hot
conversations would otherwise pin single reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["AGGREGATORS", "make_agg", "group_agg", "salted_group_agg"]


def _count_all(col: Column) -> Column:
    return F.count(F.lit(1))


#: EventFlux aggregator name → Column builder (``aggregator/mod.rs``):
#: sum:172 avg:557 count:813 distinctCount:1117 min/max:1396
#: minForever/maxForever:1981,1999 stdDev:1536 first:1660 last:1768.
#: minForever/maxForever never retract — over a bounded batch they equal
#: min/max over all history, which is what the batch column computes; the
#: streaming engine realizes them as running aggregates in update mode.
AGGREGATORS: dict[str, callable] = {
    "sum": F.sum,
    "avg": F.avg,
    "count": _count_all,
    "countCol": F.count,
    "distinctCount": F.count_distinct,
    "approxDistinctCount": F.approx_count_distinct,
    "min": F.min,
    "max": F.max,
    "minForever": F.min,
    "maxForever": F.max,
    "stdDev": F.stddev_pop,
    "first": F.first,
    "last": F.last,
}


def make_agg(fn_name: str, col: str, alias: str) -> Column:
    return AGGREGATORS[fn_name](F.col(col)).alias(alias)


def group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    having: Column | None = None,
) -> DataFrame:
    """GROUP BY + optional HAVING.

    ≙ reference SelectProcessor group-by path
    (``select_processor.rs:339-340,449-487``) + HAVING (``:473-505``).
    WHERE-before-agg vs HAVING-after-agg placement is Catalyst's job
    (PushDownPredicate) — callers just filter before/after.
    """
    out = df.groupBy(*keys).agg(*aggs)
    if having is not None:
        out = out.filter(having)
    return out


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed keys.

    Phase 1 aggregates on ``keys + salt`` (spreads a hot key over
    ``salt_buckets`` reducers), phase 2 re-aggregates partials on ``keys``.
    Algebraic aggregates only (sum/count here; avg = sum/count at call site).
    Salt is derived from a deterministic column when given (stable plans for
    tests), else a hash of a uniform-ish column.

    Reference contrast: the reference's PARTITION construct isolates per-key
    state but has no skew remedy (SURVEY.md §4 "Partitioning / shuffle").
    """
    salt_col = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.floor(F.rand(seed=42) * salt_buckets)
    ).alias("_salt")

    partial_aggs = [F.sum(F.col(c)).alias(f"_p_{a}") for a, c in sum_cols.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("_p_cnt"))

    partial = df.select(*df.columns, salt_col).groupBy(*keys, "_salt").agg(*partial_aggs)

    final_aggs = [F.sum(F.col(f"_p_{a}")).alias(a) for a in sum_cols]
    if count_alias:
        final_aggs.append(F.sum("_p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
