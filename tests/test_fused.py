"""Parity: fused single-pass pipeline vs independently composed operators."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.cep import PatternSpec, Step, match_pattern_batch
from eventflux_engine_spark.cep.fused import fused_transcript_pipeline
from eventflux_engine_spark.datamodel import synth_transcripts_bucketed


@pytest.fixture(scope="module")
def flagged(spark):
    t = synth_transcripts_bucketed(spark, 100_000, 200, partitions=8)
    return t.withColumn("is_user", F.col("role") == "user").withColumn(
        "is_assistant", F.col("role") == "assistant"
    )


SPEC = PatternSpec(
    steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
    within=pd.Timedelta(minutes=30),
)


def test_fused_matches_composed_operators(spark, flagged):
    fused = fused_transcript_pipeline(flagged, SPEC, input_sorted=True).toPandas()
    fused = fused.sort_values("conv_id").reset_index(drop=True)

    t = flagged
    composed = (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count(F.when(F.col("tool") != "", 1)).alias("tool_calls"),
        )
        .join(
            match_pattern_batch(t, SPEC)
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_matches")),
            "conv_id",
            "left",
        )
        .join(
            t.groupBy(
                F.session_window(F.col("ts").cast("timestamp"), "30 minutes"),
                "conv_id",
            )
            .agg(F.lit(1))
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_sessions")),
            "conv_id",
            "left",
        )
        .join(
            t.groupBy(F.window(F.col("ts").cast("timestamp"), "5 minutes"), "conv_id")
            .agg(F.lit(1))
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_windows")),
            "conv_id",
            "left",
        )
        .fillna(0, ["n_matches"])
        .select("conv_id", "n_turns", "n_matches", "n_sessions", "n_windows", "tool_calls")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fused.astype({c: "int64" for c in fused.columns if c != "conv_id"}),
        composed.astype({c: "int64" for c in composed.columns if c != "conv_id"}),
    )


def test_input_sorted_parity_with_shuffled_path(spark, flagged):
    a = match_pattern_batch(flagged, SPEC, input_sorted=True).count()
    b = match_pattern_batch(flagged, SPEC).count()
    assert a == b and a > 0


def test_session_boundary_gap_matches_session_window(spark):
    """Boundary semantics, settled empirically (ADVICE r1 suggested >= —
    Spark itself refutes it): an event arriving EXACTLY gap after the
    previous one still MERGES into the session in F.session_window
    (inclusive bound), so the fused sessionizer's strict `gap > gap_s` is
    the correct parity rule. This test pins both engines to that behavior
    with an exact-1800s gap."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # c1: gaps 1799s then exactly 1800s — BOTH merge (inclusive bound)
        ("c1", 0, "user", "a", "", base),
        ("c1", 1, "assistant", "b", "", base + datetime.timedelta(seconds=1799)),
        ("c1", 2, "user", "c", "", base + datetime.timedelta(seconds=1799 + 1800)),
        # c2: gap 1801s (> gap) — new session
        ("c2", 0, "user", "d", "", base),
        ("c2", 1, "user", "e", "", base + datetime.timedelta(seconds=1801)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    flagged = t.withColumn("is_user", F.col("role") == "user").withColumn(
        "is_assistant", F.col("role") == "assistant"
    )
    fused = (
        fused_transcript_pipeline(flagged, SPEC, session_gap_s=1800)
        .select("conv_id", "n_sessions")
        .toPandas()
        .set_index("conv_id")["n_sessions"]
        .to_dict()
    )
    native = (
        t.groupBy(F.session_window("ts", "30 minutes"), "conv_id")
        .agg(F.lit(1))
        .groupBy("conv_id")
        .count()
        .toPandas()
        .set_index("conv_id")["count"]
        .to_dict()
    )
    assert fused == {k: int(v) for k, v in native.items()}
    assert fused == {"c1": 1, "c2": 2}
