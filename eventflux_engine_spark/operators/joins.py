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

__all__ = ["enrichment_join", "stream_stream_join", "in_table"]


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
