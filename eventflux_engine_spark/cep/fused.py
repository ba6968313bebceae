"""Fused single-pass transcript CEP pipeline over bucketed input.

The north-star metric job (BASELINE.json): pattern-match + session-window
agg + tumbling turn counts over conversation transcripts. When the input is
stored bucketed by ``conv_id`` and sorted by ``(conv_id, ts, turn_idx)``
(the Iceberg ``bucket(conv_id)`` + sorted-files layout — emulated by
``synth_transcripts_bucketed``), every keyed computation becomes map-side:

- sequence pattern matches  → vectorized searchsorted chains
- session windows (gap g)   → one boolean diff over the sorted ts array
- tumbling windows          → epoch bucketing + unique-pair counting
- per-conv aggregates       → ``np.add.reduceat`` over conv boundaries

One pass, zero shuffle (only the final tiny per-conv rollup exchanges).
This is the plan a 10^12-turn deployment runs: the expensive exchange is
paid ONCE at write time (bucketed storage), every query after that is
embarrassingly parallel. Parity with the composed operators
(match_pattern_batch + session_window + window aggs) is pytest-enforced.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .nfa import match_linear_block
from .spec import PatternSpec

OUT_SCHEMA = (
    "conv_id string, n_turns long, n_matches long, n_sessions long, "
    "n_windows long, tool_calls long"
)


def _process_block(
    pdf: pd.DataFrame, spec: PatternSpec, gap_s: int, window_s: int
) -> pd.DataFrame:
    keys = pdf[spec.key_col].to_numpy()
    ts_ns = pd.to_datetime(pdf[spec.ts_col]).astype("int64").to_numpy()
    # whole-second truncation is safe for tumbling-window bucketing
    # (floor(floor(x)/w) == floor(x/w) for positive w) but NOT for session
    # gaps: a 1800.2 s gap straddling a second boundary truncates to 1800
    # and misses the break (9/15000 convs at sf1.0 — caught by scale
    # evidence, invisible at sf0.01). Gaps compare at full ns precision.
    ts_s = ts_ns // 1_000_000_000
    convs, codes = np.unique(keys, return_index=False), None
    codes = np.searchsorted(convs, keys)  # keys sorted → codes monotone
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])

    n_turns = np.add.reduceat(np.ones(len(pdf), dtype=np.int64), starts)
    tool_calls = np.add.reduceat(
        (pdf["tool"].to_numpy() != "").astype(np.int64), starts
    )

    # sessions: new session at conv start or gap > gap_s. Boundary semantics
    # verified empirically against F.session_window (test_fused boundary
    # test): an event arriving EXACTLY gap_s after the previous one EXTENDS
    # the session in Spark (inclusive merge), so strict > is the parity rule.
    new_conv = np.r_[True, codes[1:] != codes[:-1]]
    gap_ns = np.r_[0, ts_ns[1:] - ts_ns[:-1]]
    new_session = new_conv | (gap_ns > gap_s * 1_000_000_000)
    n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)

    # tumbling windows: distinct (conv, bucket) — sorted, so count transitions
    bucket = ts_s // window_s
    new_window = new_conv | np.r_[False, bucket[1:] != bucket[:-1]]
    n_windows = np.add.reduceat(new_window.astype(np.int64), starts)

    # pattern matches per conv
    matches = match_linear_block(pdf, spec)
    n_matches = np.zeros(len(starts), dtype=np.int64)
    if len(matches):
        mcodes = np.searchsorted(convs, matches["conv_id"].to_numpy())
        np.add.at(n_matches, mcodes, 1)

    return pd.DataFrame(
        {
            "conv_id": convs,
            "n_turns": n_turns,
            "n_matches": n_matches,
            "n_sessions": n_sessions,
            "n_windows": n_windows,
            "tool_calls": tool_calls,
        }
    )


def fused_transcript_pipeline(
    df: DataFrame,
    spec: PatternSpec,
    session_gap_s: int = 1800,
    window_s: int = 300,
    input_sorted: bool = False,
) -> DataFrame:
    """Per-conversation CEP rollup: one row per conv with turn count,
    pattern-match count, session count, non-empty tumbling-window count and
    tool-call count. ``input_sorted`` as in :func:`match_pattern_batch` —
    default False (repartition+sort) because a plain ``spark.read`` of even
    bucketed storage can split a key's files across tasks; pass True only
    for input that comes through ``read_bucket_sorted`` /
    ``synth_transcripts_bucketed``, which guarantee per-partition key
    integrity and sort order."""
    assert spec.is_linear, "fused pipeline supports linear patterns"
    needed = sorted(
        {spec.key_col, "turn_idx", spec.ts_col, "tool", *spec.order_cols}
        | {s.flag_col for s in spec.steps}
    )
    pruned = df.select(*needed)
    if not input_sorted:
        pruned = pruned.repartition(spec.key_col).sortWithinPartitions(
            spec.key_col, *spec.order_cols
        )
    key_col = spec.key_col

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in pdfs:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            keys = pdf[key_col].to_numpy()
            nz = (keys != keys[-1]).nonzero()[0]
            boundary = int(nz.max() + 1) if len(nz) else 0
            head, carry = pdf.iloc[:boundary], pdf.iloc[boundary:]
            if len(head):
                yield _process_block(head, spec, session_gap_s, window_s)
        if carry is not None and len(carry):
            yield _process_block(carry, spec, session_gap_s, window_s)

    return pruned.mapInPandas(run, schema=OUT_SCHEMA)
