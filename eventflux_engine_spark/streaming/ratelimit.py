"""Streaming OUTPUT rate limiting — the live-pipeline twin of
``operators/output.py``'s batch restatement.

≙ reference output rate limiters running INSIDE the pipeline
(``src/query_api/execution/query/output/ratelimit/*.rs`` wired at
``select_processor.rs:30-38``; behavior pinned by
``tests/output_rate_limit_comprehensive.rs``):

- ``FIRST EVERY n EVENTS`` — emit the first event of every n-event block
  (0-based position ``% n == 0``; EVERY 1 emits everything).
- ``LAST EVERY n EVENTS`` — emit the n-th event of every block as it
  arrives; a trailing partial block never emits.
- ``ALL EVERY n EVENTS`` — buffer, release complete n-blocks; the trailing
  partial block stays buffered.
- ``FIRST/LAST EVERY d TIME`` — one event per epoch-aligned d-wide bucket
  of event time (SURVEY §7.4 stance: event time restates the reference's
  wall-clock timer). LAST holds a pending candidate until a later bucket
  (or the flush sentinel) closes the bucket.
- ``ALL EVERY d TIME`` — every buffered event emits at the tick: content
  equals passthrough, so the stream passes through unchanged.

One global ``applyInPandasWithState`` group holds the counters — the rate
limiter is a per-QUERY serial point in the reference too
(``stream_junction.rs`` ordered dispatch); sharded per-key rate limiting
falls out of adding real keys to the groupBy.
"""

from __future__ import annotations

import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

_STATE_SCHEMA = "count bigint, bucket bigint, pending string, buffered string"


def _pack(pdf: pd.DataFrame) -> str:
    return "" if pdf is None or len(pdf) == 0 else pdf.to_json(
        orient="split", date_unit="ns", date_format="epoch"
    )


def _unpack(blob: str, like: pd.DataFrame) -> pd.DataFrame:
    if not blob:
        return like.iloc[0:0]
    pdf = pd.read_json(io.StringIO(blob), orient="split", convert_dates=False)
    return pdf.astype(like.dtypes.to_dict())


def output_rate_stream(
    stream: DataFrame,
    mode: str,
    value: int,
    unit: str,
    sentinel_seq: int = 10**9,
) -> DataFrame:
    """Apply OUTPUT [ALL|FIRST|LAST] EVERY <n> EVENTS / <d> TIME to a
    streaming DataFrame carrying ``__seq`` (arrival order) and ``__ts``
    (event time). Emitted rows keep the input schema. The far-future flush
    sentinel (``__seq >= sentinel_seq``) advances time buckets and flushes
    pending LAST candidates without being counted or withheld."""
    if unit == "TIME" and mode == "ALL":
        return stream  # tick releases the full buffer — content ≡ passthrough

    schema = stream.schema

    def fn(key, pdfs, state):
        if state.exists:
            count, bucket, pending, buffered = state.get
        else:
            count, bucket, pending, buffered = 0, -1, "", ""
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.drop(columns="__g").sort_values("__seq", kind="stable")
            real = pdf[pdf["__seq"] < sentinel_seq]
            sent = pdf[pdf["__seq"] >= sentinel_seq]
            if unit == "EVENTS":
                if len(real):
                    pos = count + pd.RangeIndex(len(real))
                    if mode == "FIRST":
                        out = real[(pos % value) == 0]
                    elif mode == "LAST":
                        out = real[(pos % value) == (value - 1)]
                    else:  # ALL: release complete blocks, hold the remainder
                        held = _unpack(buffered, real)
                        pool = pd.concat([held, real], ignore_index=True)
                        n_full = (len(pool) // value) * value
                        out = pool.iloc[:n_full]
                        buffered = _pack(pool.iloc[n_full:])
                    count += len(real)
                    if len(out):
                        yield out
            else:  # TIME — epoch-aligned d-wide event-time buckets
                bkts = (
                    pdf["__ts"].astype("int64") // 1_000_000 // value
                ).astype("int64")
                if mode == "FIRST":
                    fresh = pdf[bkts > bucket]
                    if len(fresh):
                        out = fresh.groupby(
                            bkts[bkts > bucket], sort=True
                        ).head(1)
                        bucket = int(bkts.max())
                        yield out
                else:  # LAST: hold each bucket's candidate until it closes
                    pool = pd.concat(
                        [_unpack(pending, pdf), pdf], ignore_index=True
                    )
                    pb = (
                        pool["__ts"].astype("int64") // 1_000_000 // value
                    ).astype("int64")
                    tails = pool.groupby(pb, sort=True).tail(1)
                    closed = tails[pb[tails.index] < pb.max()]
                    pending = _pack(tails[pb[tails.index] == pb.max()])
                    if len(closed):
                        yield closed
            del sent  # sentinel rows only advance buckets / flush state
        state.update((count, bucket, pending, buffered))

    return (
        stream.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandasWithState(
            fn, schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
