"""Registry part 4: stream-driven table DML (UPDATE / DELETE / UPSERT)
final-state queries — the batch-MERGE scale forms of the reference's table
mutation processors (``application.rs:218-486``; ``src/core/query/output/
{update,delete,upsert}_table_processor.rs``).

Each gate computes the FINAL table state after a bounded mutation stream has
been applied, which is exactly what the oracle can recompute independently.

Imported by ``plans`` for its side effects (query registration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table
from ..operators import dml as DML
from .registry import register


@register(
    "dml_upsert_last_writer",
    """
    WITH base AS (
      SELECT c_custkey AS id, round(c_acctbal, 2) AS val FROM customer
      WHERE c_custkey <= 750
    ), upd AS (
      SELECT o_custkey AS id, round(o_totalprice, 2) AS val,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderkey DESC) AS rn
      FROM orders
    ), last AS (SELECT id, val FROM upd WHERE rn = 1)
    SELECT b.id, b.val FROM base b ANTI JOIN last l ON b.id = l.id
    UNION ALL
    SELECT id, val FROM last
    """,
    doc="UPSERT INTO table ... ON cond (upsert_table_processor.rs:14-19): "
    "final state after replaying every order as an upsert of its customer's "
    "balance — last writer per key wins; computed as per-key top-1 + "
    "anti-join + union (equi-joins only, one shuffle on the key)",
)
def q_dml_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 750)
        .select(
            F.col("c_custkey").alias("id"), F.round("c_acctbal", 2).alias("val")
        )
    )
    upd = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("id"),
        F.round("o_totalprice", 2).alias("val"),
        F.col("o_orderkey").alias("ord"),
    )
    return DML.merge_upsert(base, upd, ["id"], "ord")


@register(
    "dml_update_additive",
    """
    SELECT c.c_custkey, c.c_name,
           round(c.c_acctbal + coalesce(d.delta, 0.0), 2) AS balance
    FROM customer c
    LEFT JOIN (SELECT o_custkey, sum(o_totalprice) AS delta
               FROM orders GROUP BY o_custkey) d
      ON d.o_custkey = c.c_custkey
    """,
    doc="stream-driven UPDATE table SET bal = bal + x WHERE key match "
    "(update_table_processor.rs): additive SET commutes, so the replay "
    "collapses to one pre-aggregated delta join — map-side partials, a "
    "single shuffle, no per-event loop",
)
def q_dml_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    deltas = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    out = DML.merge_update_additive(
        cust.select("c_custkey", "c_name", F.col("c_acctbal").alias("balance")),
        deltas,
        ["c_custkey"],
        "balance",
        "o_totalprice",
    )
    return out.select("c_custkey", "c_name", F.round("balance", 2).alias("balance"))


@register(
    "dml_delete_stream_antijoin",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    ANTI JOIN (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'F') d
      ON d.o_custkey = c.c_custkey
    """,
    doc="DELETE FROM table USING stream WHERE cond "
    "(delete_table_processor.rs): survivors after deleting every customer "
    "hit by a finished order — one left-anti equi-join, broadcast-able key "
    "set, no per-event loop",
)
def q_dml_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    dels = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return DML.merge_delete(cust.select("c_custkey", "c_name"), dels, ["c_custkey"])
