"""Count-Min sketch tests: overestimate guarantee, error bound,
mergeability, plan shape.

The gate (events_cms_topk) proves value-exactness vs DuckDB; these tests
prove the SKETCH properties the gate can't: estimates never undercount,
the eps*N overestimate bound holds at real stream lengths, and register
merge (element-wise sum) is exactly the sketch of the union.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.operators.approx import (
    CMS_D,
    CMS_W,
    cms_lookup,
    cms_registers,
)


@pytest.fixture(scope="module")
def stream_df(spark):
    # deterministic skewed stream: key k in 0..999, key k repeated
    # (1000 - k) // 10 + 1 times -> N = sum = ~50_000 updates
    return (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            F.explode(
                F.sequence(F.lit(1), ((F.lit(1000) - F.col("id")) / 10).cast("int") + 1)
            ).alias("rep"),
        )
        .select(F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"))
    )


class TestCMSAccuracy:
    def test_never_undercounts_and_bound(self, spark, stream_df):
        exact = stream_df.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
        regs = cms_registers(stream_df, "key")
        est = cms_lookup(regs, exact.select("key"), "key")
        joined = est.join(exact, "key").collect()
        n = stream_df.count()
        assert len(joined) == 1000
        # CMS guarantee: est >= exact for every key; and with w=512,
        # E[overshoot per row] = N/w, min over d=4 rows stays well under
        # the Markov 3*e*N/w tail at this N for ALL keys
        bound = 3 * 3 * n // CMS_W  # 3 * e * N / w, integer-safe
        for r in joined:
            assert r.est_cnt >= r.c, r
            assert r.est_cnt - r.c <= bound, r

    def test_exact_on_sparse_stream(self, spark):
        # far fewer keys than cells -> collisions are unlikely enough that
        # at least the min-over-rows is exact for every key (d=4 rows
        # would ALL need a collision on the same key to inflate)
        df = spark.range(0, 50).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("key")
        )
        df3 = df.unionAll(df).unionAll(df)
        est = cms_lookup(cms_registers(df3, "key"), df.select("key"), "key")
        assert all(r.est_cnt == 3 for r in est.collect())


class TestCMSMerge:
    def test_merge_of_halves_equals_whole(self, spark, stream_df):
        lo = stream_df.filter(F.col("key") < "k5")
        hi = stream_df.filter(F.col("key") >= "k5")
        direct = cms_registers(stream_df, "key")
        merged = (
            cms_registers(lo, "key")
            .unionByName(cms_registers(hi, "key"))
            .groupBy("i", "j")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_merged_estimates_are_sums(self, spark):
        # counts are additive across merged sketches (unlike HLL's union):
        # the same key in both halves reads the SUM of its counts
        a = spark.range(0, 2000).select(
            (F.col("id") % 10).cast("string").alias("key")
        )
        b = spark.range(0, 1000).select(
            (F.col("id") % 10).cast("string").alias("key")
        )
        merged = (
            cms_registers(a, "key")
            .unionByName(cms_registers(b, "key"))
            .groupBy("i", "j")
            .agg(F.sum("cnt").alias("cnt"))
        )
        items = a.select("key").distinct()
        est = cms_lookup(merged, items, "key").collect()
        assert all(r.est_cnt == 300 for r in est)  # 200 + 100 per key

    def test_register_bounds(self, spark, stream_df):
        regs = cms_registers(stream_df, "key").collect()
        assert all(0 <= r.i < CMS_D for r in regs)
        assert all(0 <= r.j < CMS_W for r in regs)
        assert all(r.cnt >= 1 for r in regs)
        assert sum(r.cnt for r in regs if r.i == 0) == stream_df.count()


class TestCMSPlan:
    def test_single_full_data_shuffle_with_partial_agg(self, spark, stream_df):
        plan = (
            cms_registers(stream_df, "key")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # map-side partial count before the one exchange
        assert plan.count("Exchange") == 1
        assert plan.count("HashAggregate") >= 2

    def test_lookup_broadcasts_probes(self, spark, stream_df):
        regs = cms_registers(stream_df, "key")
        items = stream_df.select("key").distinct().limit(5)
        plan = (
            cms_lookup(regs, items, "key")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
