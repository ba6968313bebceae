"""Bucketed storage (partition pruning, key integrity) and skew handling."""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark import storage
from eventflux_engine_spark.cep import PatternSpec, Step, match_pattern_batch
from eventflux_engine_spark.datamodel import synth_transcripts, transcripts_df
from eventflux_engine_spark.operators.aggregations import salted_group_agg

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = f"/tmp/efs_store_{uuid.uuid4().hex[:8]}"
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestBucketedStorage:
    def test_roundtrip_and_partition_pruning(self, spark, tmpdir):
        t = transcripts_df(spark, SF)
        path = os.path.join(tmpdir, "transcripts")
        storage.write_transcripts(t, path)

        back = storage.read_transcripts(spark, path)
        assert back.count() == t.count()

        # day filter must reach PartitionFilters (pruned scan, no data read
        # from other days) — the Iceberg days(ts) analog
        pruned = back.filter(F.col("day") == "2024-01-05")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]
        want = t.filter(F.to_date("ts") == "2024-01-05").count()
        assert pruned.count() == want

    def test_bucket_key_integrity(self, spark, tmpdir):
        t = transcripts_df(spark, SF)
        path = os.path.join(tmpdir, "transcripts")
        storage.write_transcripts(t, path)
        back = storage.read_transcripts(spark, path)
        # each conv maps to exactly one bucket (bucket integrity — a hot
        # conversation can never straddle buckets)
        multi = (
            back.groupBy("conv_id")
            .agg(F.count_distinct("bucket").alias("nb"))
            .filter(F.col("nb") > 1)
            .count()
        )
        assert multi == 0

    def test_pattern_over_bucket_zero_shuffle(self, spark, tmpdir):
        t = transcripts_df(spark, SF)
        path = os.path.join(tmpdir, "transcripts")
        storage.write_transcripts(t, path)
        spec = PatternSpec(
            steps=(Step("e1", "is_user"), Step("e2", "is_assistant")),
            within=pd.Timedelta(hours=12),
        )

        def flags(df):
            return df.withColumn("is_user", F.col("role") == "user").withColumn(
                "is_assistant", F.col("role") == "assistant"
            )

        per_bucket = []
        for b in range(storage.N_BUCKETS):
            df = flags(storage.read_bucket_sorted(spark, path, b))
            out = match_pattern_batch(df, spec, input_sorted=True)
            # zero-shuffle plan: no Exchange between scan and the matcher
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan.split("MapInPandas")[-1]
            per_bucket.append(out)
        got = per_bucket[0]
        for o in per_bucket[1:]:
            got = got.unionByName(o)
        want = match_pattern_batch(flags(t), spec)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0


class TestSkew:
    def test_salted_agg_equals_naive_on_hot_key(self, spark):
        # 30% of 200k rows land on conv000000 — the salted plan must return
        # byte-identical aggregates while spreading the hot key
        t = synth_transcripts(spark, 200_000, 1000, hot_conv_pct=30).withColumn(
            "text_len", F.length("text").cast("bigint")
        )
        naive = (
            t.groupBy("conv_id")
            .agg(F.sum("text_len").alias("sum_len"), F.count(F.lit(1)).alias("n"))
        )
        salted = salted_group_agg(
            t, ["conv_id"], {"sum_len": "text_len"}, count_alias="n",
            salt_buckets=16, salt_source="turn_idx",
        )
        assert salted.exceptAll(naive).count() == 0
        assert naive.exceptAll(salted).count() == 0
        hot = salted.filter(F.col("conv_id") == "conv000000").collect()[0]
        assert hot["n"] > 50_000  # the hot key really is hot


class TestPlanShapes:
    def test_q5_star_join_all_broadcast_single_shuffle(self, spark):
        """The 5-way star join must broadcast every dimension into the
        lineitem fact scan: 5 BroadcastHashJoins, zero SortMergeJoins, and
        exactly ONE hash exchange (the final per-nation aggregation). This
        is the plan that survives a 100 TB fact table."""
        from eventflux_engine_spark.plans import QUERIES

        df = QUERIES["tpch_q5_local_supplier_volume"].fn(spark, SF)
        df.count()  # materialize so AQE finalizes the physical plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 5
        assert "SortMergeJoin" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan


class TestNativeBucketedTables:
    """Catalog-backed bucketBy tables: the optimizer-visible form of the
    bucket(conv_id) layout. The claims in BENCH/BASELINE.md ("pay the
    shuffle once at write time; queries are embarrassingly parallel across
    buckets") are pinned here as PLAN SHAPES: no Exchange in a keyed agg
    over one bucketed table, none on either side of a co-bucketed join."""

    @pytest.fixture()
    def bucketed_pair(self, spark, tmpdir):
        t = transcripts_df(spark, SF)
        storage.write_bucketed_table(
            t, "tb_left", n_buckets=8, path=os.path.join(tmpdir, "l")
        )
        agg = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
        storage.write_bucketed_table(
            agg, "tb_right", n_buckets=8, sort_cols=("conv_id",),
            path=os.path.join(tmpdir, "r"),
        )
        yield "tb_left", "tb_right"
        spark.sql("DROP TABLE IF EXISTS tb_left")
        spark.sql("DROP TABLE IF EXISTS tb_right")

    def test_keyed_agg_over_bucketed_table_has_no_exchange(
        self, spark, bucketed_pair
    ):
        left, _ = bucketed_pair
        plan = (
            spark.table(left)
            .groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # bucketing satisfies the distribution

    def test_co_bucketed_join_has_no_exchange(self, spark, bucketed_pair):
        left, right = bucketed_pair
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                spark.table(left)
                .join(spark.table(right), "conv_id")
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-distributed

    def test_bucketed_table_values_roundtrip(self, spark, bucketed_pair):
        left, _ = bucketed_pair
        t = transcripts_df(spark, SF)
        assert spark.table(left).count() == t.count()
        a = spark.table(left).agg(F.sum(F.crc32(F.col("text")))).first()[0]
        b = t.agg(F.sum(F.crc32(F.col("text")))).first()[0]
        assert a == b  # per-turn text integrity through the bucketed write


class TestSaltedJoin:
    def test_identical_to_plain_join_under_heavy_skew(self, spark):
        from eventflux_engine_spark.operators.joins import salted_join

        # 50% of facts on ONE key
        facts = spark.range(10_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("fact_id"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        salted = (
            salted_join(facts, dim, on="k", salt_source="fact_id")
            .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        )
        plain = (
            facts.join(dim, "k")
            .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        )
        key = lambda r: (r["k"], r["n"], r["sw"])  # noqa: E731
        assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))

    def test_outer_rows_survive(self, spark):
        from eventflux_engine_spark.operators.joins import salted_join

        facts = spark.range(10).select(F.col("id").alias("k"))
        dim = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("w"))
        out = salted_join(facts, dim, on="k", how="left").collect()
        assert len(out) == 10
        assert sum(1 for r in out if r["w"] is None) == 5

    def test_fact_side_never_replicates(self, spark):
        from eventflux_engine_spark.operators.joins import salted_join

        facts = spark.range(1000).select((F.col("id") % 10).alias("k"),
                                         F.col("id").alias("fact_id"))
        dim = spark.range(10).select(F.col("id").alias("k"))
        assert salted_join(facts, dim, on="k", salt_source="fact_id").count() == 1000


class TestBloomPruneJoin:
    """Bloom-filter join pruning: no false negatives (result invariance),
    bounded false positives, mergeable registers, scan-side filter plan."""

    def _sets(self, spark):
        from pyspark.sql import functions as F

        dim = spark.range(0, 2000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("k")
        )
        fact = spark.range(0, 20000).select(
            F.concat(F.lit("u"), (F.col("id") % 7000).cast("string")).alias("k"),
            F.col("id").alias("v"),
        )
        return dim, fact

    def test_pruned_semi_join_equals_plain(self, spark):
        from eventflux_engine_spark.operators.joins import bloom_prune_join

        dim, fact = self._sets(spark)
        plain = sorted(map(tuple, fact.join(dim, "k", "left_semi").collect()))
        pruned = sorted(map(tuple, bloom_prune_join(fact, dim, "k").collect()))
        assert pruned == plain
        assert len(plain) == 6000  # keys u0..u1999 hit by id%7000 in 3 ranges

    def test_false_positive_rate_bounded(self, spark):
        from pyspark.sql import functions as F

        from eventflux_engine_spark.operators.joins import (
            BLOOM_K,
            BLOOM_WORDS,
            bloom_build,
            bloom_probe,
        )

        dim, _ = self._sets(spark)
        disjoint = spark.range(0, 10_000).select(
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("k")
        )
        fp = bloom_probe(disjoint, "k", bloom_build(dim, "k")).count()
        # theoretical (1 - e^(-kn/m))^k ~ 1.7e-4 at n=2000, m=65536, k=4;
        # 1% is a 50x margin over the expectation
        assert fp <= 100, fp
        assert BLOOM_K == 4 and BLOOM_WORDS == 2048  # doc'd geometry

    def test_registers_merge_by_bit_or(self, spark):
        from pyspark.sql import functions as F

        from eventflux_engine_spark.operators.joins import bloom_build

        dim, _ = self._sets(spark)
        lo = dim.filter(F.col("k") < "u1")
        hi = dim.filter(F.col("k") >= "u1")
        whole = bloom_build(dim, "k").collect()[0].bloom
        blo = bloom_build(lo, "k").collect()[0].bloom
        bhi = bloom_build(hi, "k").collect()[0].bloom
        assert [a | b for a, b in zip(blo, bhi)] == list(whole)

    def test_probe_plan_stays_at_scan(self, spark):
        from eventflux_engine_spark.operators.joins import (
            bloom_build,
            bloom_probe,
        )

        dim, fact = self._sets(spark)
        plan = (
            bloom_probe(fact, "k", bloom_build(dim, "k"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the fact side must not be shuffled or sort-merge-joined: the
        # bit test rides a broadcast 1-row nested loop onto the scan; the
        # ONE key exchange in the plan is the dim-side distinct inside the
        # register build, never the fact side
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" in plan
        assert plan.count("Exchange hashpartitioning(k") == 1
