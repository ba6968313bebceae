"""Approximate operators for unbounded cardinalities.

≙ reference ``lossyCounting(ε)`` window (``window/mod.rs:1654-1740``) —
re-expressed distributed: classic Manku-Motwani lossy counting runs per
partition (bounded memory ~1/ε entries regardless of stream length), partial
summaries merge by summing counts and adding per-partition error bounds.
Guarantee: returns a SUPERSET of items with true frequency ≥ support·N and
never an item below (support − ε)·N — pytest-verified against exact counts.

Scale: one narrow pass + a tiny summary shuffle — the whole point at 100 TB
where exact token counting would shuffle billions of distinct keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
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
        counts: dict[str, int] = {}
        deltas: dict[str, int] = {}
        n = 0
        bucket = 1
        for pdf in pdfs:
            for item in pdf[col]:
                n += 1
                if item in counts:
                    counts[item] += 1
                else:
                    counts[item] = 1
                    deltas[item] = bucket - 1
                if n % bucket_width == 0:
                    bucket += 1
                    for k in [k for k, c in counts.items() if c + deltas[k] <= bucket - 1]:
                        del counts[k]
                        del deltas[k]
        yield pd.DataFrame(
            {
                "item": list(counts),
                "cnt": [counts[k] for k in counts],
                "delta": [deltas[k] for k in counts],
                "part_n": n,
            }
        )

    partials = df.select(F.col(col).alias(col)).mapInPandas(
        per_partition, schema="item string, cnt long, delta long, part_n long"
    )
    n_total = df.count()  # one extra cheap action; counts merge by sum below
    merged = partials.groupBy("item").agg(
        F.sum("cnt").alias("min_count"), F.sum("delta").alias("err")
    )
    out = merged.withColumn("max_count", F.col("min_count") + F.col("err")).filter(
        F.col("max_count") >= support * n_total
    )
    return out.select("item", "min_count", "max_count")
