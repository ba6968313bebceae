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


# -- OUTPUT SNAPSHOT EVERY d over aggregating queries, streaming ------------

_SNAP_STATE = "hw bigint, next_tick bigint, accs string, buf string"


def snapshot_agg_stream(
    stream: DataFrame,
    keys: list[str],
    parsed: list[tuple[str, str]],
    aliases: list[str],
    out_schema: str,
    interval_ms: int,
    start_ms: int,
    n_ticks: int,
    sentinel_seq: int = 10**9,
) -> DataFrame:
    """Streaming ``OUTPUT SNAPSHOT EVERY d`` over an aggregating query
    (``snapshot_output_rate.rs``: every d the FULL current aggregate state
    emits). Event-time restatement identical to the batch operator
    (``operators/output.py:output_snapshot_agg``): for tick t in
    (start, start + n_ticks*d], emit per-key aggregates over all events
    with ts <= t; a key appears once it has >= 1 event at or before the
    tick.

    The limiter is ONE ``applyInPandasWithState`` group — the reference's
    snapshot limiter is a per-query serial point too (scheduler timer +
    full-state walk, serialized through ``stream_junction.rs`` dispatch).
    Ticks become due as the high-water event time passes them (the app
    feed is arrival-ordered on its logical clock, the same assumption
    ``output_rate_stream``'s TIME buckets make); the far-future flush
    sentinel drives every remaining tick due at end-of-stream. Running
    accumulators fold buffered events per due tick, so each event is
    touched once — state holds per-key partials plus the not-yet-due
    buffer, never the full history.

    ``parsed``: list of (fn, argcol) with fn in count/sum/avg/min/max; the
    arg expressions are pre-projected to columns ``_a{i}`` by the caller
    (Catalyst evaluates them; pandas only folds numbers)."""
    gcols = list(keys)

    def fn(key, pdfs, state):
        if state.exists:
            hw, next_tick, accs_blob, buf_blob = state.get
        else:
            hw, next_tick, accs_blob, buf_blob = -(1 << 62), 1, "", ""
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.drop(columns="__g").sort_values("__seq", kind="stable")
            hw = max(hw, int(pdf["__ts"].astype("int64").max() // 1_000_000))
            real = pdf[pdf["__seq"] < sentinel_seq].drop(columns="__seq")
            proto = real.iloc[0:0]
            buf = pd.concat(
                [_unpack(buf_blob, proto), real], ignore_index=True
            )
            accs = _unpack(accs_blob, _accs_proto(proto, gcols, parsed))
            outs = []
            while (
                next_tick <= n_ticks
                and start_ms + next_tick * interval_ms <= hw
            ):
                t_ms = start_ms + next_tick * interval_ms
                ts_ms = buf["__ts"].astype("int64") // 1_000_000
                due = buf[ts_ms <= t_ms]
                buf = buf[ts_ms > t_ms]
                if len(due):
                    accs = _fold(accs, due, gcols, parsed)
                if len(accs):
                    emit = accs[gcols].copy() if gcols else pd.DataFrame(
                        index=accs.index
                    )
                    emit.insert(0, "__tick", t_ms)
                    for i, (afn, _arg) in enumerate(parsed):
                        if afn == "count":
                            emit[aliases[i]] = accs[f"_c{i}"].astype("int64")
                        elif afn == "sum":
                            emit[aliases[i]] = accs[f"_s{i}"]
                        elif afn == "avg":
                            emit[aliases[i]] = accs[f"_s{i}"] / accs[f"_c{i}"]
                        elif afn == "min":
                            emit[aliases[i]] = accs[f"_m{i}"]
                        else:
                            emit[aliases[i]] = accs[f"_x{i}"]
                    outs.append(emit)
                next_tick += 1
            if outs:
                yield pd.concat(outs, ignore_index=True)
            buf_blob, accs_blob = _pack(buf), _pack(accs)
        state.update((hw, next_tick, accs_blob, buf_blob))

    return (
        stream.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandasWithState(
            fn, out_schema, _SNAP_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


def _accs_proto(proto: pd.DataFrame, gcols: list[str], parsed) -> pd.DataFrame:
    cols: dict = {k: proto[k] for k in gcols}
    for i, (afn, _arg) in enumerate(parsed):
        if afn == "count":
            cols[f"_c{i}"] = pd.Series(dtype="int64")
        elif afn == "sum":
            cols[f"_s{i}"] = pd.Series(dtype="float64")
        elif afn == "avg":
            cols[f"_s{i}"] = pd.Series(dtype="float64")
            cols[f"_c{i}"] = pd.Series(dtype="int64")
        elif afn == "min":
            cols[f"_m{i}"] = pd.Series(dtype="float64")
        else:
            cols[f"_x{i}"] = pd.Series(dtype="float64")
    return pd.DataFrame(cols)


def _fold(accs: pd.DataFrame, due: pd.DataFrame, gcols, parsed) -> pd.DataFrame:
    """Fold a block of newly-due events into the running per-key partials."""
    # per-key partials of the due block
    g = due.groupby(gcols, sort=False, dropna=False) if gcols else None
    parts: dict = {}
    for i, (afn, _arg) in enumerate(parsed):
        col = due[f"_a{i}"]
        if afn == "count":
            parts[f"_c{i}"] = (
                g[f"_a{i}"].count() if g is not None else pd.Series(
                    [col.count()]
                )
            )
        elif afn in ("sum", "avg"):
            parts[f"_s{i}"] = (
                g[f"_a{i}"].sum() if g is not None else pd.Series([col.sum()])
            )
            if afn == "avg":
                parts[f"_c{i}"] = (
                    g[f"_a{i}"].count()
                    if g is not None
                    else pd.Series([col.count()])
                )
        elif afn == "min":
            parts[f"_m{i}"] = (
                g[f"_a{i}"].min() if g is not None else pd.Series([col.min()])
            )
        else:
            parts[f"_x{i}"] = (
                g[f"_a{i}"].max() if g is not None else pd.Series([col.max()])
            )
    block = pd.DataFrame(parts).reset_index()
    if not gcols:
        block = block.drop(columns="index", errors="ignore")
    merged = pd.concat([accs, block], ignore_index=True)
    g2 = merged.groupby(gcols, sort=False, dropna=False) if gcols else merged
    out: dict = {}
    for i, (afn, _arg) in enumerate(parsed):
        if afn == "count":
            out[f"_c{i}"] = (
                g2[f"_c{i}"].sum() if gcols else pd.Series(
                    [merged[f"_c{i}"].sum()]
                )
            )
        elif afn in ("sum", "avg"):
            out[f"_s{i}"] = (
                g2[f"_s{i}"].sum() if gcols else pd.Series(
                    [merged[f"_s{i}"].sum()]
                )
            )
            if afn == "avg":
                out[f"_c{i}"] = (
                    g2[f"_c{i}"].sum() if gcols else pd.Series(
                        [merged[f"_c{i}"].sum()]
                    )
                )
        elif afn == "min":
            out[f"_m{i}"] = (
                g2[f"_m{i}"].min() if gcols else pd.Series(
                    [merged[f"_m{i}"].min()]
                )
            )
        else:
            out[f"_x{i}"] = (
                g2[f"_x{i}"].max() if gcols else pd.Series(
                    [merged[f"_x{i}"].max()]
                )
            )
    res = pd.DataFrame(out).reset_index()
    if not gcols:
        res = res.drop(columns="index", errors="ignore")
    return res
