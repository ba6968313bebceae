"""Output control: ORDER BY / LIMIT / OFFSET and output-rate limiting.

Reference: per-chunk sort ``order_by_event_comparator.rs:1-64`` applied at
``select_processor.rs:531-535``; LIMIT/OFFSET ``select_processor.rs:377-419``;
OUTPUT [ALL|FIRST|LAST] EVERY n rate limiting
``src/query_api/execution/query/output/ratelimit/*.rs`` (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["order_limit_offset", "output_first_every", "output_last_every"]


def order_limit_offset(
    df: DataFrame,
    order_by: list[Column],
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET.

    OFFSET is realized with ``offset()`` (Spark ≥3.4 supports it natively
    after a sort) — keeps the TakeOrderedAndProject physical operator, which
    never materializes a global sort.
    """
    out = df.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def _every_n(df: DataFrame, n: int, keys: list[str], order_cols: list[str], pick_last: bool) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    out = df.withColumn("_rn", F.row_number().over(w))
    keep = (F.col("_rn") % n == 0) if pick_last else (F.col("_rn") % n == 1)
    return out.filter(keep).drop("_rn")


def output_first_every(df: DataFrame, n: int, keys: list[str], order_cols: list[str]) -> DataFrame:
    """OUTPUT FIRST EVERY n EVENTS — keep the first event of each n-event
    block per key (throttle/sample semantics,
    ``ratelimit/*.rs`` + ``select_processor.rs:30-38``)."""
    return _every_n(df, n, keys, order_cols, pick_last=False)


def output_last_every(df: DataFrame, n: int, keys: list[str], order_cols: list[str]) -> DataFrame:
    """OUTPUT LAST EVERY n EVENTS — keep the last event of each n-event block."""
    return _every_n(df, n, keys, order_cols, pick_last=True)
