"""Table backends: bounded FIFO cache + JDBC external store.

≙ reference ``src/core/table/cache_table.rs:20`` (``CacheTable``: a VecDeque
with ``max_size``; insert appends and evicts the OLDEST rows beyond
capacity) and ``src/core/table/jdbc_table.rs:18`` (``JdbcTable`` over an
external SQL store, driven through compiled WHERE/SET clauses), with tests
``tests/cache_table.rs`` / ``tests/jdbc_table.rs``. Spark-first restatement:

- **cache retention** — "the last ``max_size`` rows by arrival order" is a
  ``TakeOrderedAndProject`` (per-partition top-N partials merged once),
  never a global sort. Eviction-on-insert is equivalent to read-time
  retention whenever no DELETE interleaves (deletes fall back to the exact
  replay in ``sql/app.py``): a row in the final top-N was never the oldest
  over capacity at any insert, so it was never evicted.
- **JDBC tables** read through Spark's ``jdbc`` datasource — predicate
  pushdown reaches the store, and a 1000-executor scan partitions on
  ``partitionColumn`` bounds exactly like any production JDBC dim. The
  sandbox driver is the Derby embedded engine bundled with pyspark's jars;
  any production driver is the same two options (``url``, ``driver``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: store rows pre-exist every stream event: their synthetic arrival seqs sit
#: far below the app's non-negative event seqs
_STORE_SEQ_BASE = -(2**41)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def cache_retention(
    df: DataFrame, max_size: int, order_cols: tuple[str, ...] = ("__seq",)
) -> DataFrame:
    """Keep the most recent ``max_size`` rows by ``order_cols`` — the
    read-time form of CacheTable's evict-oldest-on-insert. Plans as
    TakeOrderedAndProject: each partition keeps at most ``max_size`` rows,
    one merge, no shuffle of the full table."""
    if max_size < 0:
        raise ValueError(f"cache table max_size must be >= 0: {max_size}")
    return df.orderBy(*[F.col(c).desc() for c in order_cols]).limit(max_size)


def jdbc_reader(spark: SparkSession, options: dict):
    url, dbtable = options["url"], options["dbtable"]
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("driver", options.get("driver", DERBY_DRIVER))
    )
    # production scan partitioning: WITH ('partition_column'='id',
    # 'num_partitions'='32', 'lower_bound'=.., 'upper_bound'=..)
    if "partition_column" in options:
        r = (
            r.option("partitionColumn", options["partition_column"])
            .option("numPartitions", options.get("num_partitions", "8"))
            .option("lowerBound", options["lower_bound"])
            .option("upperBound", options["upper_bound"])
        )
    return r


def jdbc_read(
    spark: SparkSession, options: dict, columns: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Current store contents as a DataFrame. With ``columns`` (the DDL
    schema), casts each declared column and stamps the synthetic arrival
    metadata: store rows carry negative ``__seq`` (they precede every stream
    event) ordered deterministically by the declared columns, ``__ts`` at
    epoch."""
    df = jdbc_reader(spark, options).load()
    if columns is None:
        return df
    casted = df.select(*[F.col(c).cast(t).alias(c) for c, t in columns])
    w = Window.orderBy(*[c for c, _ in columns])
    return casted.withColumn(
        "__seq", (F.row_number().over(w) + F.lit(_STORE_SEQ_BASE)).cast("bigint")
    ).withColumn("__ts", F.to_timestamp(F.lit("1970-01-01 00:00:00")))


def jdbc_write(df: DataFrame, options: dict, mode: str = "overwrite") -> None:
    """Write a table state back to the store (``flush_table``). Overwrite is
    the final-state contract; append is the streaming-epoch contract."""
    (
        df.write.format("jdbc")
        .option("url", options["url"])
        .option("dbtable", options["dbtable"])
        .option("driver", options.get("driver", DERBY_DRIVER))
        .mode(mode)
        .save()
    )
