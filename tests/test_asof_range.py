"""as-of join + bucketed range join: semantics and plan-shape tests.

Neither operator exists in the reference engine (no counterpart file) or in
native Spark; these are the training-data/event-analytics staples SURVEY §2
scopes in as first-class additions. Semantics pinned here row-by-row on
hand-built frames; the sf-scale value oracle lives in the registry gates
``events_asof_attribution`` (vs DuckDB's native ASOF LEFT JOIN) and
``events_range_join_campaigns``.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.operators.joins import asof_join, range_join_bucketed


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("A", _ts("2024-01-01 10:10:00"), 102.0),
            ("B", _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:03:00"), 10),  # matches 10:00 quote
            ("A", _ts("2024-01-01 10:05:00"), 20),  # equal ts -> matches 10:05
            ("A", _ts("2024-01-01 09:59:00"), 30),  # before any quote -> null
            ("B", _ts("2024-01-01 11:00:00"), 40),  # matches 10:02
            ("C", _ts("2024-01-01 10:00:00"), 50),  # key absent -> null
        ],
        "sym string, ts timestamp, qty int",
    )


class TestAsofJoin:
    def test_most_recent_prior_match_per_key(self, spark, quotes, trades):
        out = {
            (r["sym"], r["qty"]): r["asof"]["px"] if r["asof"] else None
            for r in asof_join(trades, quotes, key="sym").collect()
        }
        assert out == {
            ("A", 10): 100.0,
            ("A", 20): 101.0,  # ties (right_ts == left_ts) match
            ("A", 30): None,  # left row survives unmatched (LEFT flavor)
            ("B", 40): 50.0,
            ("C", 50): None,
        }

    def test_tolerance_nulls_stale_matches_but_keeps_row(
        self, spark, quotes, trades
    ):
        out = {
            (r["sym"], r["qty"]): r["asof"]["px"] if r["asof"] else None
            for r in asof_join(
                trades, quotes, key="sym", tolerance_seconds=240
            ).collect()
        }
        # B's only quote is 58 min old -> outside 4-min tolerance -> null,
        # but the trade row itself is still emitted.
        assert out[("B", 40)] is None
        assert out[("A", 10)] == 100.0  # 3 min old, inside
        assert len(out) == 5

    def test_all_left_columns_survive(self, spark, quotes, trades):
        cols = asof_join(trades, quotes, key="sym").columns
        assert cols == ["sym", "ts", "qty", "asof"]

    def test_composite_key(self, spark):
        left = spark.createDataFrame(
            [("A", 1, _ts("2024-01-01 00:10:00"))], "k1 string, k2 int, ts timestamp"
        )
        right = spark.createDataFrame(
            [
                ("A", 1, _ts("2024-01-01 00:00:00"), "hit"),
                ("A", 2, _ts("2024-01-01 00:09:00"), "wrong-k2"),
            ],
            "k1 string, k2 int, ts timestamp, tag string",
        )
        rows = asof_join(left, right, key=["k1", "k2"]).collect()
        assert rows[0]["asof"]["tag"] == "hit"

    def test_plan_has_no_join_node(self, spark, quotes, trades):
        """The scale contract: one exchange + window, never a join (a range
        join would expand |left| x |right-per-key| before picking max)."""
        plan = asof_join(trades, quotes, key="sym")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "Window" in plan
        assert plan.count("Exchange") <= 2  # union shuffle only (+AQE read)


class TestRangeJoinBucketed:
    @pytest.fixture(scope="class")
    def facts(self, spark):
        base = 1_700_000_000
        return spark.createDataFrame(
            [(i, base + i * 3600) for i in range(100)], "fact_id int, e long"
        )

    @pytest.fixture(scope="class")
    def intervals(self, spark):
        base = 1_700_000_000
        return spark.createDataFrame(
            [
                # half-open [start, end): covers facts 0..23 (one day)
                (0, base, base + 86400),
                # crosses a bucket boundary mid-interval: facts 30..47
                (1, base + 30 * 3600, base + 48 * 3600),
                # empty interval matches nothing
                (2, base - 10 * 86400, base - 9 * 86400),
            ],
            "interval_id int, start_s long, end_s long",
        )

    def test_matches_exact_interval_membership(self, spark, facts, intervals):
        out = (
            range_join_bucketed(facts, intervals, F.col("e").cast("double"))
            .groupBy("interval_id")
            .agg(F.count(F.lit(1)).alias("n"), F.min("fact_id").alias("lo"),
                 F.max("fact_id").alias("hi"))
            .collect()
        )
        got = {r["interval_id"]: (r["n"], r["lo"], r["hi"]) for r in out}
        assert got == {0: (24, 0, 23), 1: (18, 30, 47)}

    def test_half_open_end_excluded(self, spark, intervals):
        base = 1_700_000_000
        edge = spark.createDataFrame(
            [(0, base + 86400), (1, base + 86399)], "fact_id int, e long"
        )
        rows = range_join_bucketed(
            edge, intervals, F.col("e").cast("double")
        ).collect()
        assert {r["fact_id"] for r in rows} == {1}

    def test_no_nested_loop_in_plan(self, spark, facts, intervals):
        """The point of the operator: the non-equi predicate must NOT
        execute as BroadcastNestedLoopJoin — bucket equi-key + residual."""
        plan = (
            range_join_bucketed(facts, intervals, F.col("e").cast("double"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan
        assert "BroadcastHashJoin" in plan

    def test_shuffle_mode_same_result(self, spark, facts, intervals):
        a = range_join_bucketed(
            facts, intervals, F.col("e").cast("double"), broadcast_intervals=True
        )
        b = range_join_bucketed(
            facts, intervals, F.col("e").cast("double"), broadcast_intervals=False
        )
        key = lambda r: (r["interval_id"], r["fact_id"])  # noqa: E731
        assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
