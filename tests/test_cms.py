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


class TestQuantileHistogram:
    """Integer quantile histogram: bound, mergeability, bucket math."""

    def _vals(self, spark, n=20000):
        from pyspark.sql import functions as F

        # deterministic long-tailed values: v = (7i mod 9973)^2 mod 99991
        return spark.range(0, n).select(
            F.lit("g").alias("g"),
            (((F.col("id") * 7) % 9973) * ((F.col("id") * 7) % 9973) % 99991)
            .cast("bigint")
            .alias("v"),
        )

    def test_estimates_within_sub_bucket_bound(self, spark):
        import math

        from eventflux_engine_spark.operators.approx import (
            hist_quantiles,
            hist_registers,
        )

        vals = self._vals(spark)
        regs = hist_registers(vals, "v", ["g"])
        qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
        est = {r.q: r.est for r in hist_quantiles(regs, qs, ["g"]).collect()}
        data = sorted(r.v for r in vals.collect())
        n = len(data)
        for q, num, den in qs:
            t = (num * n + den - 1) // den
            exact = data[t - 1]
            lo = 1 << (exact.bit_length() - 1) if exact > 0 else 0
            # estimate is the lower bound of exact's sub-bucket: within
            # lo/8 below exact, never above it by more than the bucket
            assert est[q] <= exact
            assert exact - est[q] <= math.ceil(lo / 8), (q, est[q], exact)

    def test_registers_merge_by_sum(self, spark):
        from pyspark.sql import functions as F

        from eventflux_engine_spark.operators.approx import hist_registers

        vals = self._vals(spark)
        lo = vals.filter(F.col("v") < 5000)
        hi = vals.filter(F.col("v") >= 5000)
        whole = hist_registers(vals, "v", ["g"])
        merged = (
            hist_registers(lo, "v", ["g"])
            .unionByName(hist_registers(hi, "v", ["g"]))
            .groupBy("g", "lb")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        )

    def test_bucket_bounds_and_zero(self, spark):
        from eventflux_engine_spark.operators.approx import (
            HIST_SUB,
            hist_registers,
        )

        vals = self._vals(spark, 5000)
        regs = hist_registers(vals, "v", ["g"]).collect()
        for r in regs:
            if r.lb == 0:
                continue
            lo = 1 << (int(r.lb).bit_length() - 1)
            # every key is a valid sub-bucket lower bound of its octave
            assert (r.lb - lo) * HIST_SUB % lo == 0, r.lb
        assert hist_registers(
            spark.range(1).select(F.lit("g").alias("g"), F.lit(0).alias("v")),
            "v",
            ["g"],
        ).collect()[0].lb == 0

    def test_register_build_single_shuffle(self, spark):
        from eventflux_engine_spark.operators.approx import hist_registers

        plan = (
            hist_registers(self._vals(spark), "v", ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1
        assert plan.count("HashAggregate") >= 2
