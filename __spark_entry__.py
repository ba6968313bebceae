"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-conversation 5-minute tumbling
turn counts + tool-call counts — SURVEY.md §7.2) at sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 via eventflux_engine_spark.plans.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eventflux_engine_spark.plans import oracle_sql_map, queries_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries_map()["tumbling_turn_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
