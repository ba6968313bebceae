"""Batch executor for pattern specs: grouped-pandas NFA per key.

One shuffle on ``key_col``; each group's events replay in ``(ts, turn_idx)``
order through the shared transition core. Linear EVERY patterns take the
vectorized ``searchsorted`` fast path. At 100 TB the shuffle is the cost —
it's the same hash partitioning the windowed aggregations use, so co-grouped
stages reuse the exchange; hot-key caps are handled upstream (skew doc in
BENCH/BASELINE.md).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .nfa import match_linear_vectorized, run_nfa
from .spec import PatternSpec


def output_schema(spec: PatternSpec, input_schema: T.StructType) -> T.StructType:
    by_name = {f.name: f.dataType for f in input_schema.fields}
    fields = [T.StructField("conv_id", by_name.get(spec.key_col, T.StringType()))]
    for s in spec.steps:
        fields.append(T.StructField(f"{s.name}_turn_idx", by_name.get("turn_idx", T.IntegerType())))
        fields.append(T.StructField(f"{s.name}_ts", by_name.get(spec.ts_col, T.TimestampType())))
        if s.max_count > 1:
            fields.append(T.StructField(f"{s.name}_count", T.IntegerType()))
        for c in s.emit:
            fields.append(T.StructField(f"{s.name}_{c}", by_name[c]))
    return T.StructType(fields)


def match_pattern_batch(df: DataFrame, spec: PatternSpec) -> DataFrame:
    """Run the pattern over a bounded DataFrame.

    Input must already carry the boolean ``flag_col`` per step (evaluate
    predicates as Catalyst expressions first — only the inherently
    sequential NFA runs in pandas).
    """
    schema = output_schema(spec, df.schema)
    col_order = [f.name for f in schema.fields]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        if spec.is_linear:
            out = match_linear_vectorized(pdf, spec)
        else:
            rows, _, _ = run_nfa(pdf, spec)
            out = pd.DataFrame(rows)
        if out.empty:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in col_order})
        return out[col_order]

    needed = {spec.key_col, "turn_idx", spec.ts_col}
    needed.update(s.flag_col for s in spec.steps)
    for s in spec.steps:
        needed.update(s.emit)
    needed.update(spec.order_cols)
    pruned = df.select(*sorted(needed))  # column pruning before the shuffle

    return pruned.groupBy(spec.key_col).applyInPandas(apply, schema=schema)
