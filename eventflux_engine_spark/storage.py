"""Bucketed, time-partitioned transcript storage.

The 100 TB layout (SURVEY §7.1, north_star): an Iceberg table partitioned by
``days(ts)`` + ``bucket(N, conv_id)``, files sorted by ``(conv_id, ts)``.
Iceberg jars are absent in this sandbox, so the same layout is realized as
hive-partitioned parquet — the three properties that matter are identical:

1. **partition pruning**: time filters prune day directories at plan time
   (visible as ``PartitionFilters`` in explain);
2. **bucket/key integrity**: a conversation lives wholly inside one bucket →
   keyed operators (NFA, sessionization) can read with ``input_sorted=True``
   and skip the exchange entirely;
3. **write-once shuffle**: the expensive repartition+sort is paid at write
   time, amortized over every later query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def bucket_of(conv_col, n_buckets: int = N_BUCKETS):
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets))


def write_transcripts(
    df: DataFrame, path: str, n_buckets: int = N_BUCKETS, ts_col: str = "ts"
) -> None:
    """Write day-partitioned, conv-bucketed, (conv, ts)-sorted transcripts."""
    out = df.withColumn("day", F.to_date(F.col(ts_col))).withColumn(
        "bucket", bucket_of(F.col("conv_id"), n_buckets).cast("int")
    )
    (
        out.repartition("day", "bucket")
        .sortWithinPartitions("conv_id", ts_col, "turn_idx")
        .write.mode("overwrite")
        .partitionBy("day", "bucket")
        .parquet(path)
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_bucket_sorted(spark: SparkSession, path: str, bucket: int) -> DataFrame:
    """Read one bucket with rows re-sorted to the bucketed-input contract.

    Within a bucket every conversation is complete; the per-file sort order
    is (conv_id, ts) but day-partition boundaries interleave files, so a
    cheap in-partition sort restores the contract without a shuffle when
    the caller coalesces per bucket.
    """
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket") == bucket)
        .coalesce(1)
        .sortWithinPartitions("conv_id", "ts", "turn_idx")
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int = N_BUCKETS,
    bucket_col: str = "conv_id",
    sort_cols: tuple = ("conv_id", "ts"),
    path: str | None = None,
) -> None:
    """Native Spark bucketed table — the ``bucket(conv_id)`` Iceberg layout
    expressed so CATALYST knows it.

    ``write_transcripts`` realizes the physical layout (hive dirs) but the
    optimizer cannot see that a directory is hash-complete; a catalog
    bucketed table carries the bucketing spec in metadata, so downstream
    ``groupBy(bucket_col)`` aggregations and joins between co-bucketed
    tables plan with NO Exchange — the output distribution is satisfied by
    the scan itself. This is the mechanism that makes "pay the shuffle once
    at write time" literal: TestNativeBucketedTables asserts the
    exchange-free plans. ``sortBy`` additionally records per-file
    (conv_id, ts) order — the streaming/NFA ``input_sorted`` contract.
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


# -- Z-order (Morton) clustering key -----------------------------------------
# The multi-dimensional layout primitive behind Delta/Iceberg's
# OPTIMIZE ZORDER: interleaving the bits of two dimension keys yields a
# 1-D sort key whose contiguous ranges cover LOCALIZED rectangles of the
# (a, b) space, so min/max file statistics prune scans on EITHER
# dimension after a single re-sort. Pure integer shift-and-add — the
# identical expression runs in Spark SQL (`div`) and DuckDB (`//`), so
# the layout key (and every per-range statistic) is value-hash exact.


def morton_sql(a: str, b: str, bits: int = 16, engine_div: str = "div") -> str:
    """Interleaved Morton code of two non-negative ints (a even bits, b
    odd bits). `engine_div` is 'div' for Spark SQL, '//' for DuckDB."""
    d = engine_div
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) {d} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({b}) {d} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def morton_col(a: str, b: str, bits: int = 16):
    from pyspark.sql import functions as F

    return F.expr(morton_sql(a, b, bits)).cast("bigint")
