"""Stream-driven table DML as deterministic batch MERGE plans.

≙ reference table mutation processors
(``src/core/query/output/update_table_processor.rs``,
``delete_table_processor.rs``, ``upsert_table_processor.rs:14-19`` — each
stream event updates/deletes/upserts matching table rows) re-expressed the
way an Iceberg/Delta MERGE does it at scale: the event stream is reduced to
ONE deterministic mutation set per key, then applied with equi-joins.

Why the batch forms are equivalent to event-at-a-time replay:

- **upsert (last-writer-wins)**: replaying upserts keyed by an equality
  condition leaves, per key, exactly the LAST event's values — matched keys
  replaced, unmatched inserted. ``merge_upsert`` computes the same with a
  per-key row_number + anti-join + union.
- **additive update**: ``SET val = val + delta`` replayed per event sums the
  deltas — commutative, so a pre-aggregated ``sum(delta)`` join applies them
  all at once (map-side partial agg, one shuffle).
- **delete**: a row is gone iff ANY event matched it — an anti-join against
  the distinct matching key set.

Every function returns a plain DataFrame plan: broadcast-able mutation sides,
no driver loops — the same statement at 100 TB is one MERGE job. The SQL
statement surface (UPDATE/DELETE/UPSERT in the EventFlux dialect) compiles to
event-at-a-time replay in ``sql/app.py`` (AppRunner fixture semantics) and is
pytest-matched against these batch forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    table: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """UPSERT (update-or-insert, ≙ upsert_table_processor.rs:14-19):
    last update per key (by ``order_col``, ties broken by the column itself
    being unique) replaces the matching table row or inserts a new one.

    ``updates`` must carry the full table schema plus ``order_col``.
    Plan: per-key top-1 as a ``max_by`` HASH AGGREGATION (map-side partials
    combine before the shuffle — skew-safe and cheaper than a window sort:
    a hot key reduces to one partial per map task), then a left-anti
    equi-join + union; AQE broadcasts the smaller side.
    """
    val_cols = [c for c in updates.columns if c not in (*keys, order_col)]
    last = updates.groupBy(*keys).agg(
        *[
            F.max_by(c, F.col(order_col)).alias(c)
            for c in val_cols
        ]
    )
    survivors = table.join(last.select(*keys), keys, "left_anti")
    return survivors.unionByName(last.select(*table.columns))


def merge_update_additive(
    table: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    val_col: str,
    delta_col: str,
) -> DataFrame:
    """Additive UPDATE (``SET val = val + delta`` per matching event,
    ≙ update_table_processor.rs): deltas pre-aggregate per key (commutative),
    then ONE equi-join applies the total. Unmatched rows pass through.
    """
    agg = deltas.groupBy(*keys).agg(F.sum(delta_col).alias("__delta"))
    out = table.join(agg, keys, "left")
    return out.withColumn(
        val_col, F.col(val_col) + F.coalesce(F.col("__delta"), F.lit(0.0))
    ).drop("__delta")


def merge_delete(table: DataFrame, deletes: DataFrame, keys: list[str]) -> DataFrame:
    """Stream-driven DELETE (≙ delete_table_processor.rs): drop every table
    row whose key appears in the delete stream — a single left-anti equi-join
    (the distinct is implicit in anti-join semantics)."""
    return table.join(deletes.select(*keys), keys, "left_anti")
