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
