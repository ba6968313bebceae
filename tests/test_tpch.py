"""Plan-shape guards for the TPC-H-style analytic suite.

Correctness is oracle-gated (driver value-hash vs DuckDB); these tests pin
the SCALE properties instead — the physical plan each query must keep at
100 TB: dims broadcast into a single fact scan, scalar subqueries as
broadcast 1-row joins, anti/semi joins instead of row-at-a-time EXISTS, no
cartesian products, predicate pushdown reaching the parquet scan.
"""

from __future__ import annotations

import pytest

from eventflux_engine_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


class TestTpchPlanShapes:
    def test_q8_all_dims_broadcast_no_cartesian(self, spark):
        plan = _plan(spark, "tpch_q8_market_share")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        # single aggregation pair over one fact scan: partial + final
        assert plan.count("HashAggregate") == 2

    def test_q9_pushes_part_name_filter_to_dim(self, spark):
        plan = _plan(spark, "tpch_q9_product_profit")
        assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
        # the LIKE filter prunes the part dim BEFORE broadcast
        assert "widget" in plan

    def test_q11_scalar_total_is_broadcast_1row_join(self, spark):
        plan = _plan(spark, "tpch_q11_important_parts")
        # crossJoin(broadcast(1-row agg)) compiles to BroadcastNestedLoopJoin
        # — constant-size build side, NOT a data-scale cartesian
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q13_left_outer_keeps_zero_order_customers(self, spark):
        plan = _plan(spark, "tpch_q13_customer_distribution")
        assert "LeftOuter" in plan
        df = QUERIES["tpch_q13_customer_distribution"].fn(spark, SF)
        rows = {r["c_count"]: r["custdist"] for r in df.collect()}
        assert sum(rows.values()) == spark.read.parquet(
            f"{SF}/customer.parquet"
        ).count()  # every customer lands in exactly one bucket

    def test_q15_max_revenue_ties_kept(self, spark):
        plan = _plan(spark, "tpch_q15_top_supplier")
        # Catalyst pushes the ==max filter INTO the crossJoin, turning the
        # 1-row probe into an equi BroadcastHashJoin — accept either form
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        df = QUERIES["tpch_q15_top_supplier"].fn(spark, SF).collect()
        assert len(df) >= 1
        assert len({r["total_revenue"] for r in df}) == 1  # all tied at max

    def test_q17_threshold_side_reduced_before_join(self, spark):
        plan = _plan(spark, "tpch_q17_small_quantity_revenue")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q21_semi_join_and_no_forced_broadcast_on_per_order(self, spark):
        plan = _plan(spark, "tpch_q21_waiting_supplier")
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_q22_anti_join_not_exists(self, spark):
        plan = _plan(spark, "tpch_q22_idle_customers")
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan
        # the o_orderdate prune reaches the orders parquet scan
        assert "PushedFilters" in plan and "2000-01-01" in plan

    @pytest.mark.parametrize(
        "name",
        [
            "tpch_q8_market_share",
            "tpch_q9_product_profit",
            "tpch_q11_important_parts",
            "tpch_q13_customer_distribution",
            "tpch_q15_top_supplier",
            "tpch_q17_small_quantity_revenue",
            "tpch_q21_waiting_supplier",
            "tpch_q22_idle_customers",
        ],
    )
    def test_runs_at_tiny_sf(self, spark, name):
        # smallest sf: schema stays stable and nothing throws even when
        # filters leave zero qualifying rows
        df = QUERIES[name].fn(spark, SF)
        assert df.count() >= 0
