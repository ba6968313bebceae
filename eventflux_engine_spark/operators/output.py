"""Output control: ORDER BY / LIMIT / OFFSET and output-rate limiting.

Reference: per-chunk sort ``order_by_event_comparator.rs:1-64`` applied at
``select_processor.rs:531-535``; LIMIT/OFFSET ``select_processor.rs:377-419``;
OUTPUT [ALL|FIRST|LAST] EVERY n rate limiting
``src/query_api/execution/query/output/ratelimit/*.rs`` (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "order_limit_offset",
    "output_first_every",
    "output_last_every",
    "output_all_every",
    "output_every_time",
    "output_snapshot_agg",
]


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
    # FIRST uses the 0-based position so n=1 keeps every event
    # (EVERY 1 emits immediately, output_rate_limit_comprehensive.rs:415)
    keep = (
        (F.col("_rn") % n == 0) if pick_last else ((F.col("_rn") - 1) % n == 0)
    )
    return out.filter(keep).drop("_rn")


def output_first_every(df: DataFrame, n: int, keys: list[str], order_cols: list[str]) -> DataFrame:
    """OUTPUT FIRST EVERY n EVENTS — keep the first event of each n-event
    block per key (throttle/sample semantics,
    ``ratelimit/*.rs`` + ``select_processor.rs:30-38``)."""
    return _every_n(df, n, keys, order_cols, pick_last=False)


def output_last_every(df: DataFrame, n: int, keys: list[str], order_cols: list[str]) -> DataFrame:
    """OUTPUT LAST EVERY n EVENTS — keep the last event of each n-event block."""
    return _every_n(df, n, keys, order_cols, pick_last=True)


def output_all_every(
    df: DataFrame, n: int, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """OUTPUT ALL EVERY n EVENTS (events_output_rate.rs, ALL behavior):
    events emit in complete n-blocks; a trailing partial block stays
    buffered — batch restatement keeps only rows of COMPLETE blocks."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    cnt_w = Window.partitionBy(*keys)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt_w))
    )
    return out.filter(F.col("_rn") <= F.floor(F.col("_n") / n) * n).drop("_rn", "_n")


def output_every_time(
    df: DataFrame,
    interval_ms: int,
    mode: str,  # FIRST | LAST | ALL
    ts_col: str,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """OUTPUT [ALL|FIRST|LAST] EVERY d TIME (time_output_rate.rs:9-17,
    converter.rs:406-412) — event-time restatement of the wall-clock timer
    (SURVEY §7.4 stance): the emission timeline buckets into d-wide windows
    aligned to the epoch; FIRST/LAST keep one event per non-empty bucket,
    ALL emits every buffered event at each tick (batch: passthrough)."""
    if mode == "ALL":
        return df
    bucket = F.floor(
        F.col(ts_col).cast("timestamp_ltz").cast("double") * 1000 / interval_ms
    )
    w = Window.partitionBy(*keys, bucket).orderBy(
        *(order_cols if mode == "FIRST" else [F.col(c).desc() for c in order_cols])
    )
    out = df.withColumn("_rn", F.row_number().over(w))
    return out.filter(F.col("_rn") == 1).drop("_rn")


def output_snapshot_agg(
    df: DataFrame,
    interval_ms: int,
    ts_col: str,
    keys: list[str],
    aggs: list[Column],
    start_ts,
    end_ts,
) -> DataFrame:
    """OUTPUT SNAPSHOT EVERY d (snapshot_output_rate.rs): every d the CURRENT
    aggregate state is emitted in full — restated on event time as: for each
    tick t in (start, end], the aggregate over all events with ts <= t.

    Plan: generate the (tiny) tick spine, range-join events to every tick at
    or after them, aggregate per (tick, keys). Tick count = horizon/d is
    small by construction (rate limiting implies coarse d); events fan out
    only to ticks they precede — at scale the same statement compiles to a
    cumulative windowed aggregate over pre-bucketed partials."""
    ticks = df.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_ts).cast("timestamp"),
                F.lit(end_ts).cast("timestamp"),
                F.expr(f"INTERVAL {interval_ms} MILLISECONDS"),
            )
        ).alias("tick")
    ).filter(F.col("tick") > F.lit(start_ts).cast("timestamp"))
    joined = df.join(
        F.broadcast(ticks),
        F.col(ts_col).cast("timestamp_ltz") <= F.col("tick").cast("timestamp_ltz"),
    )
    return joined.groupBy("tick", *keys).agg(*aggs)
