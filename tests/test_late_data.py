"""Late/out-of-order data semantics for the streaming NFA.

FIXTURES.md watermark contract: rows later than event-time order but inside
the watermark delay must be processed EXACTLY as if they had arrived in
order (buffered ordered replay); rows beyond the delay are dropped by every
engine under test.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.cep import PatternSpec, Step, match_pattern_batch
from eventflux_engine_spark.cep.streaming import match_pattern_stream
from eventflux_engine_spark.datamodel import synth_transcripts

SPEC = PatternSpec(
    steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
    within=pd.Timedelta(minutes=30),
)


@pytest.fixture()
def tmpdir():
    d = f"/tmp/efs_late_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _flags(df):
    return df.withColumn("is_user", F.col("role") == "user").withColumn(
        "is_assistant", F.col("role") == "assistant"
    )


def test_out_of_order_within_watermark_matches_batch(spark, tmpdir):
    t = synth_transcripts(spark, 2000, 64).toPandas()
    t = t.sort_values(["ts", "conv_id", "turn_idx"]).reset_index(drop=True)

    # displace every 50th event into the NEXT chunk: it arrives out of order
    # but within the 30-minute watermark delay (chunks span ~20 minutes)
    n_chunks = 5
    bounds = [round(i * len(t) / n_chunks) for i in range(n_chunks + 1)]
    chunks = [t.iloc[bounds[i]: bounds[i + 1]].copy() for i in range(n_chunks)]
    # pick the displaced rows from the ORIGINAL chunk contents first, then
    # move them — otherwise a row prepended to chunk i+1 would be picked
    # again and cascade past the watermark
    lates = [chunks[i].iloc[::50] for i in range(n_chunks - 1)]
    for i, late in enumerate(lates):
        chunks[i] = chunks[i].drop(late.index)
        chunks[i + 1] = pd.concat([late, chunks[i + 1]])

    # sentinel far in the future flushes every buffered group at the end
    sentinel = pd.DataFrame(
        [{
            "conv_id": "__sentinel__", "turn_idx": 0, "role": "user",
            "text": "", "tool": "", "ts": t["ts"].max() + pd.Timedelta(days=30),
        }]
    )
    chunks.append(sentinel)

    feed = os.path.join(tmpdir, "feed")
    os.makedirs(feed)
    for i, c in enumerate(chunks):
        c = c.assign(turn_idx=c["turn_idx"].astype("int32"))
        c.to_parquet(
            os.path.join(feed, f"c{i:03d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    schema = spark.createDataFrame(t).schema
    stream = _flags(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    out = match_pattern_stream(stream, SPEC, watermark_delay="30 minutes")
    q = out.writeStream.format("memory").queryName("late_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM late_out")
        .filter(F.col("conv_id") != "__sentinel__")
        .toPandas()
    )
    want = match_pattern_batch(_flags(spark.createDataFrame(t)), SPEC).toPandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
    )


def test_too_late_rows_are_dropped(spark, tmpdir):
    t = synth_transcripts(spark, 1000, 32).toPandas()
    t = t.sort_values(["ts", "conv_id", "turn_idx"]).reset_index(drop=True)

    # one event withheld until after the watermark has passed it by far:
    # ship it in the last chunk after a sentinel already advanced the clock
    victim = t.iloc[[len(t) // 3]]
    rest = t.drop(victim.index)
    half = len(rest) // 2
    sentinel = pd.DataFrame(
        [{
            "conv_id": "__sentinel__", "turn_idx": 0, "role": "user",
            "text": "", "tool": "", "ts": t["ts"].max() + pd.Timedelta(days=30),
        }]
    )
    chunks = [rest.iloc[:half], rest.iloc[half:], sentinel, victim]

    feed = os.path.join(tmpdir, "feed")
    os.makedirs(feed)
    for i, c in enumerate(chunks):
        c = c.assign(turn_idx=c["turn_idx"].astype("int32"))
        c.to_parquet(
            os.path.join(feed, f"c{i:03d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    schema = spark.createDataFrame(t).schema
    stream = _flags(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    out = match_pattern_stream(stream, SPEC, watermark_delay="30 minutes")
    q = out.writeStream.format("memory").queryName("drop_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM drop_out")
        .filter(F.col("conv_id") != "__sentinel__")
        .toPandas()
    )
    # semantics: identical to a batch run over the data WITHOUT the too-late
    # row (it must be dropped, not applied retroactively)
    want = match_pattern_batch(_flags(spark.createDataFrame(rest)), SPEC).toPandas()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
    )
