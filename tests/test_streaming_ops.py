"""Streaming operator tests: update-mode GROUP BY emission contract,
watermarked stream-stream join, stream-static enrichment."""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.datamodel import (
    TRANSCRIPT_SCHEMA,
    tools_dim_df,
    transcripts_df,
)
from eventflux_engine_spark.streaming import chunked_feed, stream_from_dir
from eventflux_engine_spark.streaming import pipelines as P

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = f"/tmp/efs_sops_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def feed(spark, tmpdir):
    t = transcripts_df(spark, SF)
    feed_dir = os.path.join(tmpdir, "feed")
    chunked_feed(t, feed_dir, 3, ["ts", "conv_id", "turn_idx"])
    return t, feed_dir


def _drain(df, name, mode):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    return name


class TestUpdateModeGroupBy:
    def test_running_agg_emits_per_batch_and_converges(self, spark, feed):
        # ≙ reference GROUP BY emission contract: one running row per touched
        # group per chunk (select_processor.rs:483-529) = update output mode.
        # Memory sink keeps all updates; the LAST update per key must equal
        # the batch aggregate.
        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        agg = P.group_agg_update_stream(
            stream, ["role"], [F.count(F.lit(1)).alias("n")]
        )
        name = _drain(agg, "upd_out", "update")
        updates = spark.sql(f"SELECT * FROM {name}").toPandas()
        # multiple micro-batches → more update rows than final groups
        assert len(updates) > updates["role"].nunique()
        final = updates.groupby("role")["n"].max()
        want = t.groupBy("role").count().toPandas().set_index("role")["count"]
        assert final.sort_index().tolist() == want.sort_index().tolist()


class TestStreamingJoins:
    def test_watermarked_stream_stream_join_matches_batch(self, spark, feed):
        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        users = stream.filter(F.col("role") == "user").select(
            F.col("conv_id"), F.col("turn_idx").alias("u_turn"), F.col("ts").alias("u_ts")
        )
        asst = stream.filter(F.col("role") == "assistant").select(
            F.col("conv_id").alias("a_conv"),
            F.col("turn_idx").alias("a_turn"),
            F.col("ts").alias("a_ts"),
        )
        out = P.stream_stream_join(
            users,
            asst,
            left_key="conv_id",
            right_key="a_conv",
            left_ts="u_ts",
            right_ts="a_ts",
            max_delta_s=7200,
            watermark="1 hour",
        ).select("conv_id", "u_turn", "a_turn")
        name = _drain(out, "ssj_out", "append")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()

        a = t.filter(F.col("role") == "user").select(
            "conv_id", F.col("turn_idx").alias("u_turn"), F.col("ts").alias("u_ts")
        )
        b = t.filter(F.col("role") == "assistant").select(
            F.col("conv_id").alias("b_conv"),
            F.col("turn_idx").alias("a_turn"),
            F.col("ts").alias("b_ts"),
        )
        want = (
            a.join(
                b,
                (a.conv_id == b.b_conv)
                & (b.b_ts > a.u_ts)
                & (b.b_ts.cast("timestamp") <= a.u_ts.cast("timestamp") + F.expr("INTERVAL 7200 SECONDS")),
            )
            .select("conv_id", "u_turn", "a_turn")
            .toPandas()
        )
        key = ["conv_id", "u_turn", "a_turn"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            want.sort_values(key).reset_index(drop=True),
        )

    def test_stream_static_enrichment(self, spark, feed):
        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        dim = tools_dim_df(spark)
        out = P.enrichment_join_stream(
            stream.filter(F.col("tool") != ""), dim, on="tool", how="left"
        ).select("conv_id", "turn_idx", "tool", "category")
        name = _drain(out, "enr_out", "append")
        got = spark.sql(f"SELECT * FROM {name}")
        want = (
            t.filter(F.col("tool") != "")
            .join(dim, "tool", "left")
            .select("conv_id", "turn_idx", "tool", "category")
        )
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0


class TestAsofStream:
    """Streaming twin of operators.joins.asof_join: per-key last-right-value
    carry via applyInPandasWithState, O(1) state per key."""

    def _feeds(self, spark, tmpdir, trades, quotes, boundaries=()):
        """Write both feeds chunked at the SAME time boundaries — the
        documented condition for streaming == batch: every micro-batch pair
        covers one time range, so all right rows preceding a left event land
        in its batch or earlier. (Quantile chunking per feed — chunked_feed —
        breaks this: the two feeds' row-count quantiles fall at different
        times, which is exactly the realtime-divergence case below.)"""
        tdir, qdir = os.path.join(tmpdir, "t"), os.path.join(tmpdir, "q")
        os.makedirs(tdir), os.makedirs(qdir)
        tpdf = spark.createDataFrame(
            trades, "sym string, ts timestamp, qty int"
        ).toPandas()
        qpdf = spark.createDataFrame(
            quotes, "sym string, ts timestamp, px double"
        ).toPandas()
        cuts = [pd.Timestamp.min, *map(pd.Timestamp, boundaries), pd.Timestamp.max]
        for i in range(len(cuts) - 1):
            for pdf_, d in ((tpdf, tdir), (qpdf, qdir)):
                chunk = pdf_[(pdf_["ts"] >= cuts[i]) & (pdf_["ts"] < cuts[i + 1])]
                chunk.to_parquet(
                    os.path.join(d, f"chunk_{i:04d}.parquet"),
                    index=False, coerce_timestamps="us",
                    allow_truncated_timestamps=True,
                )
        left = stream_from_dir(spark, tdir, "sym string, ts timestamp, qty int")
        right = stream_from_dir(spark, qdir, "sym string, ts timestamp, px double")
        return left, right

    def test_matches_batch_when_feed_is_time_ordered(self, spark, tmpdir):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        quotes = [
            ("A", base + dt.timedelta(minutes=m), 100.0 + m) for m in range(0, 60, 5)
        ] + [("B", base + dt.timedelta(minutes=2), 50.0)]
        trades = [
            ("A", base + dt.timedelta(minutes=m, seconds=30), m) for m in range(0, 60, 7)
        ] + [("B", base + dt.timedelta(minutes=40), 99), ("C", base, 1)]
        left, right = self._feeds(
            spark, tmpdir, trades, quotes,
            boundaries=(base + dt.timedelta(minutes=20), base + dt.timedelta(minutes=40)),
        )
        out = P.asof_stream(left, right, key="sym", value_col="px")
        name = _drain(out, "asof_out", "append")
        got = spark.sql(f"SELECT sym, qty, asof_px FROM {name}").toPandas()

        from eventflux_engine_spark.operators.joins import asof_join

        want = (
            asof_join(
                spark.createDataFrame(trades, "sym string, ts timestamp, qty int"),
                spark.createDataFrame(quotes, "sym string, ts timestamp, px double"),
                key="sym",
            )
            .select("sym", "qty", F.col("asof.px").alias("asof_px"))
            .toPandas()
        )
        key = ["sym", "qty"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            want.sort_values(key).reset_index(drop=True),
        )

    def test_tolerance_and_tie_semantics(self, spark, tmpdir):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        quotes = [("A", base, 10.0), ("A", base + dt.timedelta(minutes=10), 20.0)]
        trades = [
            ("A", base + dt.timedelta(minutes=10), 1),   # tie -> 20.0
            ("A", base + dt.timedelta(minutes=30), 2),   # 20 min stale -> null
        ]
        left, right = self._feeds(spark, tmpdir, trades, quotes)
        out = P.asof_stream(
            left, right, key="sym", value_col="px", tolerance_seconds=900
        )
        name = _drain(out, "asof_tol", "append")
        got = {
            r["qty"]: r["asof_px"]
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got[1] == 20.0
        assert got[2] is None

    def test_realtime_divergence_is_processing_order(self, spark, tmpdir):
        # a right row arriving in a LATER chunk than a left event it
        # time-precedes cannot retro-match — the documented realtime
        # semantics (batch would match it)
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        tdir, qdir = os.path.join(tmpdir, "t"), os.path.join(tmpdir, "q")
        trades = spark.createDataFrame(
            [("A", base + dt.timedelta(minutes=5), 1)],
            "sym string, ts timestamp, qty int",
        )
        quotes = spark.createDataFrame(
            [("A", base, 10.0)], "sym string, ts timestamp, px double"
        )
        chunked_feed(trades, tdir, 1, ["ts"])
        os.makedirs(qdir)
        left = stream_from_dir(spark, tdir, "sym string, ts timestamp, qty int")
        right = stream_from_dir(spark, qdir, "sym string, ts timestamp, px double")
        out = P.asof_stream(left, right, key="sym", value_col="px")
        q = out.writeStream.format("memory").queryName("asof_rt").outputMode("append").start()
        q.processAllAvailable()  # batch 1: trade only — quote not yet arrived
        quotes.coalesce(1).write.mode("append").parquet(qdir)
        q.processAllAvailable()  # batch 2: late quote — no retro-match
        q.stop()
        rows = spark.sql("SELECT * FROM asof_rt").collect()
        assert len(rows) == 1 and rows[0]["asof_px"] is None


class TestStreamingSketchMaintenance:
    """The sketches are live-maintainable: their register builds are plain
    streaming aggregations, so update-mode emission keeps the register
    table current per micro-batch and the FINAL state equals the batch
    sketch — the 'daily sketches arrive from a stream' shape. Registers
    are monotone under their merge op (max for HLL ranks, cumulative sum
    for CMS counts), so max-over-updates reads the final state out of the
    memory sink's update history."""

    def test_hll_registers_stream_match_batch(self, spark, feed):
        from eventflux_engine_spark.operators.approx import hll_registers

        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        name = _drain(
            hll_registers(stream, "conv_id", ["role"]), "hll_live", "update"
        )
        updates = spark.sql(f"SELECT * FROM {name}").toPandas()
        assert len(updates) > 0
        final = (
            updates.groupby(["role", "j"])["reg"].max().sort_index()
        )
        batch = (
            hll_registers(t, "conv_id", ["role"])
            .toPandas()
            .set_index(["role", "j"])["reg"]
            .sort_index()
        )
        assert final.equals(batch)

    def test_cms_registers_stream_match_batch(self, spark, feed):
        from eventflux_engine_spark.operators.approx import cms_registers

        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        name = _drain(
            cms_registers(stream, "conv_id", ["role"]), "cms_live", "update"
        )
        updates = spark.sql(f"SELECT * FROM {name}").toPandas()
        final = (
            updates.groupby(["role", "i", "j"])["cnt"].max().sort_index()
        )
        batch = (
            cms_registers(t, "conv_id", ["role"])
            .toPandas()
            .set_index(["role", "i", "j"])["cnt"]
            .sort_index()
        )
        assert final.equals(batch)

    def test_bloom_registers_stream_match_batch(self, spark, feed):
        from eventflux_engine_spark.operators.joins import bloom_registers

        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        # distinct=False: OR is idempotent, and streaming cannot chain
        # distinct + agg (two stateful operators)
        name = _drain(
            bloom_registers(stream, "conv_id", distinct=False),
            "bloom_live",
            "update",
        )
        updates = spark.sql(f"SELECT * FROM {name}").toPandas()
        # setting bits only ever increases the (non-negative) word value,
        # so max-over-updates reads the final register state
        final = updates.groupby("word")["bits"].max().sort_index()
        batch = (
            bloom_registers(t, "conv_id")
            .toPandas()
            .set_index("word")["bits"]
            .sort_index()
        )
        assert final.equals(batch)

    def test_hist_registers_stream_match_batch(self, spark, feed):
        from eventflux_engine_spark.operators.approx import hist_registers

        t, feed_dir = feed
        stream = stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA)
        expr = "length(text)"  # integer value column available in the feed
        name = _drain(
            hist_registers(stream, expr, ["role"]), "hist_live", "update"
        )
        updates = spark.sql(f"SELECT * FROM {name}").toPandas()
        final = updates.groupby(["role", "lb"])["cnt"].max().sort_index()
        batch = (
            hist_registers(t, expr, ["role"])
            .toPandas()
            .set_index(["role", "lb"])["cnt"]
            .sort_index()
        )
        assert final.equals(batch)


class TestGapfillStream:
    def test_matches_batch_minus_open_buckets(self, spark, tmpdir):
        import os

        from pyspark.sql import functions as F

        from eventflux_engine_spark.plans.registry_ext import (
            q_events_gapfill_locf,
        )
        from eventflux_engine_spark.streaming import chunked_feed, stream_from_dir
        from eventflux_engine_spark.streaming.pipelines import gapfill_stream

        ev = (
            spark.read.parquet(f"{SF}/events.parquet")
            .filter(F.col("user_id") % 10 == 0)
            .select("user_id", "ts", "value")
        )
        feed_dir = os.path.join(tmpdir, "evfeed")
        chunked_feed(ev, feed_dir, 4, ["ts", "user_id"])
        stream = stream_from_dir(
            spark, feed_dir, "user_id bigint, ts timestamp, value double"
        )
        name = _drain(gapfill_stream(stream), "gapfill_live", "append")
        got = {
            (r.user_id, r.hour_epoch): (r.cents_filled, r.is_gap)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = q_events_gapfill_locf(spark, SF).collect()
        # streaming never closes each key's final bucket
        last = {}
        for r in batch:
            last[r.user_id] = max(last.get(r.user_id, 0), r.hour_epoch)
        expected = {
            (r.user_id, r.hour_epoch): (r.cents_filled, r.is_gap)
            for r in batch
            if r.hour_epoch < last[r.user_id]
        }
        assert len(got) == len(expected) > 0
        assert got == expected

    def test_gap_rows_carry_last_sum(self, spark, tmpdir):
        import os

        import pandas as pd

        from eventflux_engine_spark.streaming import chunked_feed, stream_from_dir
        from eventflux_engine_spark.streaming.pipelines import gapfill_stream

        pdf = pd.DataFrame(
            {
                "user_id": [5, 5, 5, 5],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:10",
                        "2024-01-01 00:40",  # hour 0: 1.00 + 2.00
                        "2024-01-01 03:05",  # hours 1-2 missing
                        "2024-01-01 04:00",  # closes hour 3
                    ]
                ),
                "value": [1.00, 2.00, 7.00, 9.00],
            }
        )
        df = spark.createDataFrame(pdf)
        feed_dir = os.path.join(tmpdir, "hand")
        chunked_feed(df, feed_dir, 2, ["ts", "user_id"])
        stream = stream_from_dir(
            spark, feed_dir, "user_id bigint, ts timestamp, value double"
        )
        name = _drain(gapfill_stream(stream), "gapfill_hand", "append")
        rows = sorted(
            (r.hour_epoch, r.cents_filled, r.is_gap)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        h0 = rows[0][0]
        hs = 3600
        assert rows == [
            (h0, 300, 0),  # hour 0 closed with its own sum
            (h0 + hs, 300, 1),  # gap carries last sum
            (h0 + 2 * hs, 300, 1),
            (h0 + 3 * hs, 700, 0),  # hour 3 closed by the hour-4 arrival
        ]  # hour 4 never closes -> not emitted
