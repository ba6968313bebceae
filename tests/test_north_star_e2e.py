"""The north_rule sentence as ONE test: the transcript CEP pipeline
(pattern NFA + session windows + tumbling counts) runs as a single
streaming application over an event-time-ordered conv feed with
watermarks, lands in idempotent exactly-once parquet sinks with
per-partition lineage + metrics, is STOPPED mid-stream and resumed from
checkpoint — and the resumed run's total output matches the batch
execution of the same queries row for row.
"""

from __future__ import annotations

import datetime
import os
import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.cep import PatternSpec, Step, match_pattern_batch
from eventflux_engine_spark.cep.streaming import match_pattern_stream
from eventflux_engine_spark.datamodel import TRANSCRIPT_SCHEMA, transcripts_df
from eventflux_engine_spark.streaming import chunked_feed, stream_from_dir
from eventflux_engine_spark.streaming import pipelines as P
from eventflux_engine_spark.streaming.sink import ExactlyOnceParquetSink

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = f"/tmp/efs_ns_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _flagged(df):
    return df.withColumn("is_user", F.col("role") == "user").withColumn(
        "is_assistant", F.col("role") == "assistant"
    )


def _sorted(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            pdf[c] = s.dt.tz_localize(None) if s.dt.tz is not None else s
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


SPEC = PatternSpec(
    steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
    within=pd.Timedelta(minutes=30),
)


class TestNorthStarEndToEnd:
    def test_pipeline_resumes_exactly_once_with_batch_parity(self, spark, tmpdir):
        t = transcripts_df(spark, SF)
        sentinel = spark.createDataFrame(
            [("__sentinel__", 0, "user", "", "", datetime.datetime(2024, 6, 1))],
            schema=t.schema,
        )
        chunks = chunked_feed(
            t.unionByName(sentinel),
            os.path.join(tmpdir, "staging"),
            4,
            ["ts", "conv_id", "turn_idx"],
        )
        feed_dir = os.path.join(tmpdir, "feed")
        os.makedirs(feed_dir)

        sinks = {
            name: ExactlyOnceParquetSink(os.path.join(tmpdir, f"table_{name}"))
            for name in ("pattern", "session", "tumbling")
        }
        ckpt = {name: os.path.join(tmpdir, f"ckpt_{name}") for name in sinks}

        def run_app():
            """One 'spark-submit' of the app: three queries over the feed."""
            stream = _flagged(stream_from_dir(spark, feed_dir, TRANSCRIPT_SCHEMA))
            outs = {
                "pattern": match_pattern_stream(
                    stream, SPEC, watermark_delay="10 minutes"
                ),
                "session": P.session_stream(
                    stream, "30 minutes", ["conv_id"],
                    [F.count(F.lit(1)).alias("n_turns")],
                ),
                "tumbling": P.tumbling_stream(
                    stream, "5 minutes", ["conv_id"],
                    [
                        F.count(F.lit(1)).alias("turns"),
                        F.count(F.when(F.col("tool") != "", 1)).alias("tool_calls"),
                    ],
                ),
            }
            qs = [
                df.writeStream.foreachBatch(sinks[name].foreach_batch())
                .option("checkpointLocation", ckpt[name])
                .outputMode("append")
                .start()
                for name, df in outs.items()
            ]
            for q in qs:
                q.processAllAvailable()
            for q in qs:
                q.stop()

        # phase 1: half the stream arrives, app runs, then "crashes" (stop)
        for c in chunks[:2]:
            shutil.copy(c, feed_dir)
        run_app()
        mid_counts = {n: s.read(spark).count() for n, s in sinks.items()}

        # phase 2: rest of the stream (sentinel last) + restart from ckpt
        for c in chunks[2:]:
            shutil.copy(c, feed_dir)
        run_app()

        # -- batch parity (exactly-once: a duplicated or lost row fails the
        # full-frame compare, not just a count) --
        not_sentinel = F.col("conv_id") != "__sentinel__"
        got_pat = (
            sinks["pattern"].read(spark).filter(not_sentinel)
            .select("conv_id", "e1_turn_idx", "e2_turn_idx").toPandas()
        )
        want_pat = (
            match_pattern_batch(_flagged(t), SPEC)
            .select("conv_id", "e1_turn_idx", "e2_turn_idx").toPandas()
        )
        pd.testing.assert_frame_equal(_sorted(got_pat), _sorted(want_pat))

        got_ses = (
            sinks["session"].read(spark).filter(not_sentinel)
            .select("conv_id", "n_turns", "session_start").toPandas()
        )
        want_ses = (
            t.groupBy(F.session_window("ts", "30 minutes").alias("w"), "conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .select("conv_id", "n_turns", F.col("w.start").alias("session_start"))
            .toPandas()
        )
        pd.testing.assert_frame_equal(_sorted(got_ses), _sorted(want_ses))

        got_tum = (
            sinks["tumbling"].read(spark).filter(not_sentinel)
            .select("conv_id", "turns", "tool_calls", "window_start").toPandas()
        )
        want_tum = (
            t.groupBy(F.window("ts", "5 minutes").alias("w"), "conv_id")
            .agg(
                F.count(F.lit(1)).alias("turns"),
                F.count(F.when(F.col("tool") != "", 1)).alias("tool_calls"),
            )
            .select(
                "conv_id", "turns", "tool_calls", F.col("w.start").alias("window_start")
            )
            .toPandas()
        )
        pd.testing.assert_frame_equal(_sorted(got_tum), _sorted(want_tum))

        # -- the restart actually continued (phase 1 emitted a strict subset)
        assert any(
            mid_counts[n] < sinks[n].read(spark).count() for n in sinks
        )
        assert all(mid_counts[n] > 0 for n in ("tumbling",))

        # -- per-partition lineage + metrics in every commit marker,
        # epochs strictly increasing across the restart --
        for name, sink in sinks.items():
            commits = sink.commits()
            assert commits, name
            epochs = [c["epoch_id"] for c in commits]
            assert epochs == sorted(set(epochs))  # no duplicate epoch commits
            for c in commits:
                assert "partitions" in c and "duration_s" in c
                assert c["rows"] == sum(p["rows"] for p in c["partitions"])
            # commit-marker row totals == what the table actually serves
            assert sum(c["rows"] for c in commits) == sink.read(spark).count()
