"""HyperLogLog sketch tests: accuracy, mergeability, determinism, plan shape.

The gate (events_hll_distinct) proves value-exactness vs DuckDB; these tests
prove the SKETCH properties the gate can't: the estimate is actually close
to the truth at real cardinalities, and register merge is exactly union.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.operators.approx import (
    HLL_M,
    HLL_R,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    # 50_000 distinct ids, each duplicated 3x (duplicates must not move the
    # estimate at all - the sketch sees sets, not bags)
    base = spark.range(0, 50_000).select(
        F.concat(F.lit("user-"), F.col("id").cast("string")).alias("uid")
    )
    return base.unionAll(base).unionAll(base)


class TestHLLAccuracy:
    def test_relative_error_within_3_sigma(self, spark, ids_df):
        regs = hll_registers(ids_df, "uid")
        est = hll_estimate(regs, []).collect()[0]
        # standard error 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
        assert abs(est.est_q - 50_000) / 50_000 < 0.195
        assert est.occupied <= HLL_M

    def test_duplicates_do_not_move_estimate(self, spark, ids_df):
        distinct = ids_df.distinct()
        e1 = hll_estimate(hll_registers(ids_df, "uid"), []).collect()[0].est_q
        e2 = hll_estimate(hll_registers(distinct, "uid"), []).collect()[0].est_q
        assert e1 == e2

    def test_small_cardinality_occupied_equals_distinct(self, spark):
        # below m distinct values with distinct register indexes, occupied
        # tracks cardinality closely; estimate stays within 3 sigma too
        df = spark.range(0, 40).select(F.col("id").cast("string").alias("uid"))
        est = hll_estimate(hll_registers(df, "uid"), []).collect()[0]
        assert est.occupied <= 40
        assert est.est_q > 0


class TestHLLMerge:
    def test_merge_of_halves_equals_whole(self, spark):
        whole = spark.range(0, 20_000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid")
        )
        lo = whole.filter(F.col("uid") < "u1")  # lexicographic split
        hi = whole.filter(F.col("uid") >= "u1")
        direct = hll_registers(whole, "uid")
        merged = (
            hll_registers(lo, "uid")
            .unionByName(hll_registers(hi, "uid"))
            .groupBy("j")
            .agg(F.max("reg").alias("reg"))
        )
        assert direct.orderBy("j").collect() == merged.orderBy("j").collect()

    def test_overlapping_merge_counts_union_not_sum(self, spark):
        a = spark.range(0, 10_000).select(F.col("id").cast("string").alias("uid"))
        b = spark.range(5_000, 15_000).select(
            F.col("id").cast("string").alias("uid")
        )
        merged = (
            hll_registers(a, "uid")
            .unionByName(hll_registers(b, "uid"))
            .groupBy("j")
            .agg(F.max("reg").alias("reg"))
        )
        est = hll_estimate(merged, []).collect()[0].est_q
        # union is 15k; a sum-like merge would read ~20k. 3 sigma = 19.5%
        assert abs(est - 15_000) / 15_000 < 0.195

    def test_register_bounds(self, spark, ids_df):
        regs = hll_registers(ids_df, "uid").collect()
        assert all(0 <= r.j < HLL_M for r in regs)
        assert all(1 <= r.reg <= HLL_R + 1 for r in regs)


class TestHLLPlan:
    def test_single_full_data_shuffle_with_partial_agg(self, spark, ids_df):
        plan = hll_registers(ids_df, "uid")._jdf.queryExecution().executedPlan().toString()
        # map-side partial max before the one exchange: two HashAggregates
        # around a single Exchange, no sort-based fallback on the hot path
        assert plan.count("Exchange") == 1
        assert plan.count("HashAggregate") >= 2
