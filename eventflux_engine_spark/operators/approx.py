"""Approximate operators for unbounded cardinalities.

≙ reference ``lossyCounting(ε)`` window (``window/mod.rs:1654-1740``) —
re-expressed distributed AND vectorized: per partition, each Arrow batch is
reduced with ``value_counts()`` (one pandas pass, no per-row Python), the
per-batch counts merge into the bounded summary, and pruning runs at batch
boundaries. Deferring the prune from per-row to per-batch only RETAINS MORE
items, so the classic Manku-Motwani guarantees still hold:

- ``min_count``  = observed count  ≤ true count
- ``max_count``  = count + delta   ≥ true count (delta = bucket index at
  insertion − 1 bounds what could have been pruned earlier)
- output is a SUPERSET of items with true frequency ≥ support·N and never
  contains an item below (support − ε)·N — pytest-verified vs exact counts.

The total row count N is carried in the per-partition summaries (``part_n``)
— there is NO extra pass over the input; the single ``mapInPandas`` scan is
the only job that touches the data. Partials are persisted (≈1/ε rows per
partition) so the N-rollup and the item-merge branches share one scan.

Scale: one narrow pass + a tiny summary shuffle — the whole point at 100 TB
where exact token counting would shuffle billions of distinct keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lossy_counting_heavy_hitters(
    df: DataFrame, col: str, support: float, epsilon: float | None = None
) -> DataFrame:
    """Items whose frequency is ≥ ``support`` fraction of all rows (approx).

    Output: (item, min_count, max_count) — true count is within the range.
    """
    if epsilon is None:
        epsilon = support / 10.0
    bucket_width = max(int(1 / epsilon), 1)

    def per_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        counts = pd.Series(dtype="int64")
        deltas = pd.Series(dtype="int64")
        n = 0
        for pdf in pdfs:
            vc = pdf[col].value_counts()  # vectorized batch reduction
            if len(vc) == 0:
                continue
            new = vc.index.difference(counts.index)
            if len(new):
                # items first seen in this batch: delta = bucket_at_entry - 1
                deltas = pd.concat(
                    [deltas, pd.Series(n // bucket_width, index=new, dtype="int64")]
                )
            counts = counts.add(vc, fill_value=0).astype("int64")
            n += int(vc.sum())
            # prune at the batch boundary: drop items that could not reach
            # the current bucket even with their full error allowance
            keep = (counts + deltas.reindex(counts.index)) > (n // bucket_width)
            counts = counts[keep]
            deltas = deltas.reindex(counts.index)
        summary = pd.DataFrame(
            {
                "item": counts.index.astype(str),
                "cnt": counts.to_numpy(),
                "delta": deltas.to_numpy(),
                "pid": pid,
                "part_n": n,
            }
        )
        # marker row guarantees this partition's part_n reaches the N rollup
        # even when every item was pruned (item=NULL is filtered from merge)
        marker = pd.DataFrame(
            {"item": [None], "cnt": [0], "delta": [0], "pid": [pid], "part_n": [n]}
        )
        yield pd.concat([summary, marker], ignore_index=True)

    partials = df.select(F.col(col).alias(col)).mapInPandas(
        per_partition, schema="item string, cnt long, delta long, pid int, part_n long"
    )
    # summaries are tiny (~1/ε per partition): persist so the two consumers
    # below (item merge + N rollup) trigger exactly one input scan
    partials = partials.persist()
    totals = (
        partials.groupBy("pid")
        .agg(F.first("part_n").alias("pn"))
        .agg(F.sum("pn").alias("n_total"))
    )
    merged = (
        partials.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("min_count"), F.sum("delta").alias("err"))
    )
    out = (
        merged.crossJoin(F.broadcast(totals))
        .withColumn("max_count", F.col("min_count") + F.col("err"))
        .filter(F.col("max_count") >= support * F.col("n_total"))
    )
    return out.select("item", "min_count", "max_count")
