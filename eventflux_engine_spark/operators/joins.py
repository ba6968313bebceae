"""Join operators.

Reference joins (SURVEY.md §2.3) are a nested-loop theta join over buffered
sides (``/root/reference/src/core/query/input/stream/join/join_processor.rs:
18-146``) plus an indexed stream-table lookup
(``table_join_processor.rs:17-137``). We express the same SEMANTICS
declaratively and let Catalyst pick broadcast/hash/sort-merge:

- enrichment (stream-table) join → broadcast hash join on the dim key
- stream-stream join → time-bounded equi-join on the stream key
- ``IN <table>`` predicate → left-semi join
  (``src/core/executor/condition/in_expression_executor.rs:14-60``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "enrichment_join",
    "stream_stream_join",
    "in_table",
    "asof_join",
    "range_join_bucketed",
    "salted_join",
]


def enrichment_join(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-table (enrichment) join.

    ≙ reference TableJoinProcessor with compiled O(1) index lookup
    (``table_join_processor.rs:17-137``; LEFT OUTER null-padding ``:121-124``).
    Broadcasting the dimension removes the shuffle entirely — the Spark analog
    of the reference's per-event HashMap probe, and the only plan that
    survives a 100 TB fact side.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    time_bound: Column | None = None,
    how: str = "inner",
    emit_side: str = "all",
    left_arrival: Column | None = None,
    right_arrival: Column | None = None,
) -> DataFrame:
    """Stream-stream join on a shared key with an optional event-time bound.

    ≙ reference JoinProcessor (inner/left/right/full —
    ``join_input_stream.rs:12-19``) where each side buffers the window's
    live events. The batch form is a plain (broadcast/SMJ) equi-join + time
    predicate; the streaming form adds watermarks on both sides so state is
    evictable. Outer-join caveat: the reference pads immediately on miss and
    never retracts (``join_processor.rs:104-112``) — fixtures only use inputs
    where unmatched rows stay unmatched (FIXTURES.md F3).

    ``emit_side`` ≙ unidirectional ``EventTrigger::{Left,Right,All}``
    (``join_input_stream.rs:23-28``): with ``'left'``, only LEFT arrivals
    emit — a pair exists iff the left event arrived strictly AFTER the right
    one was buffered (and vice versa for ``'right'``). Restated on the
    arrival columns as an extra join predicate, so the plan stays a pure
    equi-join + filter.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    if time_bound is not None:
        cond = cond & time_bound
    if emit_side not in ("all", "left", "right"):
        raise ValueError(f"emit_side must be all|left|right, got {emit_side!r}")
    if emit_side != "all":
        if left_arrival is None or right_arrival is None:
            raise ValueError("unidirectional joins need arrival columns")
        cond = cond & (
            left_arrival > right_arrival
            if emit_side == "left"
            else right_arrival > left_arrival
        )
    return left.join(right, cond, how)


def in_table(
    stream: DataFrame, table: DataFrame, on: str | list[str], broadcast_table: bool = True
) -> DataFrame:
    """``WHERE x IN <table>`` membership predicate as a left-semi join.

    The membership table broadcasts by default (reference tables are small
    keyed relations probed per event — ``in_expression_executor.rs:14``);
    in-memory dims built via ``createDataFrame`` carry no stats, so Catalyst
    would otherwise fall back to a sort-merge semi join.
    """
    t = F.broadcast(table) if broadcast_table else table
    return stream.join(t, on=on, how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single most recent right row with
    ``right_ts <= left_ts`` per key (kdb/DuckDB ASOF semantics, equality
    included; LEFT flavor — unmatched left rows survive with a null match).

    The reference engine has no as-of operator and Spark has no native one
    either; the scalable formulation is NOT a per-row subquery or a range
    join. Both sides are tagged and UNIONed, shuffled ONCE on the key, and
    the match is a running last-non-null carry-forward over
    ``(ts, side)`` order — right rows sort before left rows at equal ts so
    ties match. Cost: one exchange + one in-partition sort, independent of
    how many right rows precede each left row (a range join explodes on
    exactly that). Skew follows the key distribution only — the same
    salting/AQE treatment as any keyed aggregation applies.

    Right rows must be unique per (key, ts) — dedupe upstream (the carried
    value among exact duplicates is otherwise tie-ordered arbitrarily).

    ``tolerance_seconds`` nulls out matches older than ``left_ts - tol``
    (the row stays, LEFT semantics). Returns all left columns plus a
    ``asof`` struct of the matched right row's non-key columns (null when
    no match / out of tolerance).
    """
    keys = [key] if isinstance(key, str) else list(key)
    rstruct = F.struct(*[F.col(c) for c in right.columns if c not in keys])
    r_t = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    rtype = r_t.schema["__r"].dataType
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l_t = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtype).alias("__r"),
        lstruct.alias("__l"),
    )
    ltype = l_t.schema["__l"].dataType
    r_t = r_t.withColumn("__l", F.lit(None).cast(ltype))
    u = l_t.unionByName(r_t.select(*l_t.columns))

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        lts = F.col("__ts").cast("timestamp_ltz").cast("double")
        rts = matched[right_ts].cast("timestamp_ltz").cast("double")
        matched = F.when(lts - rts <= float(tolerance_seconds), matched)
    return (
        u.withColumn("asof", matched)
        .filter(F.col("__side") == 1)
        .select(F.col("__l.*"), "asof")
    )


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    fact_epoch,
    start_col: str = "start_s",
    end_col: str = "end_s",
    bucket_s: int = 86400,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Interval (range) join: facts whose epoch-seconds fall in
    ``[start_col, end_col)`` of any interval row.

    Naive Spark executes a non-equi join as BroadcastNestedLoop — every
    fact probes every interval. This turns it into an EQUI-join: each
    interval explodes to the fixed-width time buckets it overlaps, facts
    compute their bucket with one ``floor(epoch / bucket_s)``, the join key
    is the bucket, and the exact ``[start, end)`` predicate evaluates as a
    post-join residual filter. Cost is |intervals| x avg-buckets-per-
    interval rows on the small side (broadcast by default) and zero
    expansion of the fact side — the only plan that survives a 100 TB fact
    table. For interval tables too large to broadcast, the same bucketed
    key shuffles both sides (set ``broadcast_intervals=False``); pick
    ``bucket_s`` near the median interval length to bound the explode.
    """
    b_start = F.floor(F.col(start_col) / bucket_s).cast("bigint")
    # ceil(end / bucket_s) - 1 covers fractional end bounds: with the
    # previous floor((end - 1)/bucket_s), a fact in the floor-aligned last
    # bucket of a non-integer interval end could land in a bucket the
    # interval never generated — a silent false negative the residual
    # filter cannot repair (ADVICE r5). For integer ends the two forms are
    # identical, so gated results are unchanged.
    b_end = (F.ceil(F.col(end_col) / bucket_s) - 1).cast("bigint")
    # degenerate intervals (end <= start): Spark's sequence() defaults to
    # step -1 when start > stop, which would EXPLODE a descending bucket
    # list instead of producing nothing — emit an empty bucket array
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(b_start, b_end),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    f = facts.withColumn("__e", fact_epoch).withColumn(
        "__b", F.floor(F.col("__e") / bucket_s).cast("bigint")
    )
    return (
        f.join(iv, "__b")
        .filter((F.col("__e") >= F.col(start_col)) & (F.col("__e") < F.col(end_col)))
        .drop("__b", "__e")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffled equi-join: completes the skew toolkit next to
    ``salted_group_agg`` (aggregation) and the LSH bucket cap (pair
    generation).

    A shuffled join on a skewed key pins the hot key's entire fact mass on
    ONE reducer. Salting splits it: the fact side gets a deterministic salt
    in [0, salt_buckets) (from ``salt_source`` when given — stable plans —
    else a seeded uniform), the dim side is EXPLODED once per salt value
    (dim rows replicate xsalt_buckets, fact rows never replicate), and the
    join key becomes (key, salt) — the hot key now spreads over
    ``salt_buckets`` reducers. Results are identical to the unsalted join
    (oracle-gated); use when the dim side is too big to broadcast AND AQE's
    runtime skew split is unavailable (e.g. inside a cached/reused subplan
    or a stream-static join).

    Supported ``how``: inner / left / left_semi / left_anti — the flavors
    whose results are invariant under dim-side salt replication. A right or
    full join would emit every UNMATCHED dim row once per salt value
    (ADVICE r5), so those are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched dim rows "
            "would be emitted once per salt bucket (use inner/left/"
            "left_semi/left_anti)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    )
    f = facts.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return f.join(d, on=keys + ["__salt"], how=how).drop("__salt")


# -- Bloom-filter join pruning ----------------------------------------------
# The 100 TB scan-prune pattern native Spark only applies internally (its
# runtime bloom-filter rewrite is JVM-config-gated and opaque): build a
# Bloom filter over the dim side's join keys, fold it into ONE dense
# bit-array row, broadcast it, and prefilter the fact scan BEFORE the
# shuffle join — rows whose key cannot be in the dim side never enter the
# exchange. Bloom filters have no false negatives, so the pruned join's
# result is EXACTLY the plain join's (the gate's oracle is the plain
# semi-join); false positives only cost a little less pruning.
#
# Unlike the sketch gates, the ORACLE never computes this hash — the gate
# is result-invariance against the plain join — so the hash needs no
# cross-engine parity and can be the JVM-native seeded xxhash64 (no
# string md5/conv per probe: the bit test must be nearly free next to the
# scan it prunes — switching from md5 cut the sf1.0 probe from 10.6 s to
# scan-speed). 32 bits per BIGINT word (bit 63 never set — no
# sign-extension edge cases), registers mergeable by bitwise OR.

BLOOM_K = 4  # hash functions
BLOOM_WORDS = 2048  # 32-bit words -> m = 65536 bits


def _bloom_hashes(col: str) -> "list[Column]":
    """The k bit positions (0..m-1) of `col`'s key."""
    m = BLOOM_WORDS * 32
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m))
        for i in range(BLOOM_K)
    ]


def bloom_registers(dim: DataFrame, key: str, distinct: bool = True) -> DataFrame:
    """Sparse (word, bits) register rows for `dim`'s keys — the mergeable
    (bitwise-OR) core of the filter. A plain aggregation, so it also runs
    LIVE under Structured Streaming update mode (registers are monotone
    under OR — TestStreamingSketchMaintenance); ``distinct=False`` skips
    the set-dedup shuffle (OR is idempotent, so duplicates cannot change
    any register — required in streaming, where distinct+agg would chain
    two stateful aggregations)."""
    cells = F.array(
        *[
            F.struct(
                (h / 32).cast("int").alias("word"),
                (h % 32).cast("int").alias("bit"),
            )
            for h in _bloom_hashes(key)
        ]
    )
    keyed = dim.select(F.col(key))
    if distinct:
        keyed = keyed.distinct()
    return (
        keyed.select(F.explode(cells).alias("c"))
        .select(
            F.col("c.word").alias("word"),
            F.expr("shiftleft(cast(1 AS bigint), c.bit)").alias("v"),
        )
        .groupBy("word")
        .agg(F.bit_or("v").alias("bits"))
    )


def bloom_build(dim: DataFrame, key: str) -> DataFrame:
    """ONE dense row (`bloom`: array<bigint> of BLOOM_WORDS words) from the
    dim side's keys. Cost: a distinct on the (small) dim side, a k-cell
    posexplode, and a word-keyed bit_or that collapses map-side to at most
    BLOOM_WORDS rows per partition."""
    regs = bloom_registers(dim, key)
    dense = (
        dim.sparkSession.range(BLOOM_WORDS)
        .select(F.col("id").cast("int").alias("word"))
        .join(regs, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0)).alias("bits"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "bits"))),
            lambda s: s.bits,
        ).alias("bloom")
    )


def bloom_probe(facts: DataFrame, key: str, bloom_row: DataFrame) -> DataFrame:
    """Prefilter `facts` to rows whose key MIGHT be in the built set: the
    broadcast 1-row cross join keeps the check a narrow Catalyst
    expression over the fact scan — no shuffle, no per-row Python. (SQL
    text because the Python shiftright wrapper only takes literal shift
    amounts; the SQL function shifts by any expression.)"""
    m = BLOOM_WORDS * 32
    conds = []
    for i in range(BLOOM_K):
        h = f"pmod(xxhash64({key}, {i}), {m})"
        conds.append(
            f"((shiftright(element_at(bloom, cast({h} div 32 AS int) + 1), "
            f"cast({h} % 32 AS int)) & 1) = 1)"
        )
    probed = facts.crossJoin(F.broadcast(bloom_row))
    return probed.filter(F.expr(" AND ".join(conds))).drop("bloom")


def bloom_prune_join(
    facts: DataFrame, dim: DataFrame, key: str, how: str = "left_semi"
) -> DataFrame:
    """`facts JOIN dim ON key`, with the fact side Bloom-pruned before the
    join. No false negatives -> result is bit-identical to the plain
    join; the filter runs at the scan, so at 100 TB the exchange only
    carries surviving rows.

    Supported ``how``: inner and left-semi only — outer joins must KEEP
    unmatched fact rows and an anti join must RETURN them, while the Bloom
    prefilter drops exactly those rows (ADVICE r5)."""
    allowed = {"inner", "leftsemi", "semi"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"bloom_prune_join does not support how={how!r}: the Bloom "
            "prefilter drops the unmatched fact rows an outer join must "
            "keep and an anti join must return (use inner/left_semi)"
        )
    return bloom_probe(facts, key, bloom_build(dim, key)).join(
        dim, on=key, how=how
    )
