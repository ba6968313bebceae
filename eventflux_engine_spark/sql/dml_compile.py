"""Compile commuting SQL DML statements into distributed MERGE plans.

≙ reference table mutation processors (``update_table_processor.rs``,
``delete_table_processor.rs``, ``upsert_table_processor.rs:14-19`` driven by
``application.rs:218-486``). The dialect's UPDATE/DELETE/UPSERT statements
replay events against the table under a single global arrival order; at
scale that replay is a driver-side loop (O(events × table rows)). This
module detects the COMMUTING mutation classes and compiles them to the
equi-join / hash-agg MERGE plans of ``operators/dml.py`` — with the arrival
order preserved exactly through ``__seq`` residual predicates:

- **DELETE**: a row is gone iff ANY delete event with ``seq > row.seq``
  matched it → one left-anti join with a ``__s.__seq > __t.__seq`` residual.
- **additive UPDATE** (``SET col = col ± event_expr``): deltas commute →
  per-row sum over matching later events (hash agg, map-side partials).
- **replacement UPDATE** (``SET col = event_expr``): last matching later
  event wins per row → ``max_by(value, seq)`` hash agg.
- **last-writer UPSERT** (equality condition on table keys, event-only
  SELECT): per key the last event's values replace/insert — with the
  insert-vs-update decision replayed exactly from the first upsert's seq
  against the key's earliest table insert.

Anything else (conditions over mutated columns, table-referencing SET
values, multiple upserts, OR'd conditions) returns ``None`` and falls back
to the event-at-a-time replay in ``sql/app.py`` — which doubles as the
parity oracle in tests.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUAL_RE = re.compile(r"\b(\w+)\.(\w+)\b")
_BARE_RE = re.compile(r"(?<![.\w])(?!__[ts]\b)([a-zA-Z_]\w*)\b(?!\s*\()(?!\s*\.)")
_SQL_WORDS = {
    "AND", "OR", "NOT", "TRUE", "FALSE", "NULL", "IS", "IN", "LIKE",
    "BETWEEN", "CASE", "WHEN", "THEN", "ELSE", "END", "DISTINCT",
    # keyword operands that _BARE_RE would otherwise qualify into __s.X
    # (they never take a call-paren, so the (?!\s*\() guard misses them):
    # CAST targets, sort direction, INTERVAL units
    "AS", "ASC", "DESC", "INTERVAL", "ESCAPE",
    "INT", "INTEGER", "BIGINT", "LONG", "SMALLINT", "TINYINT",
    "FLOAT", "REAL", "DOUBLE", "DECIMAL", "STRING", "VARCHAR", "CHAR",
    "BOOLEAN", "DATE", "TIMESTAMP", "BINARY",
    "YEAR", "YEARS", "MONTH", "MONTHS", "DAY", "DAYS", "HOUR", "HOURS",
    "MINUTE", "MINUTES", "SECOND", "SECONDS", "MILLISECOND", "MILLISECONDS",
}


def mask_literals(expr: str) -> tuple[str, dict[str, str]]:
    """Replace ``'...'`` string literals with inert placeholders so that
    identifier / keyword rewriting can never touch words INSIDE a literal
    (``label = 'new label'`` must survive). Placeholders start with a digit
    wrapped in NULs — no identifier regex can match them."""
    lits: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        key = f"\x00{len(lits)}\x00"
        lits[key] = m.group(0)
        return key

    return re.sub(r"'(?:[^']|'')*'", repl, expr), lits


def restore_literals(s: str, lits: dict[str, str]) -> str:
    for k, v in lits.items():
        s = s.replace(k, v)
    return s


def rewrite(expr: str, d, table_cols: list[str], prefer_event: bool = False) -> str:
    """Rewrite a dialect DML expression into a Spark SQL expression over the
    join aliases ``__t`` (table) / ``__s`` (driving stream). Qualified refs
    resolve by name; bare names prefer the table column except when
    ``prefer_event`` (UPSERT SELECT items read the stream event)."""
    masked, lits = mask_literals(expr)
    src_names = {d.source} | ({d.source_alias} if d.source_alias else set())

    def sub_q(m: re.Match) -> str:
        qual, col = m.group(1), m.group(2)
        if qual == d.table:
            return f"__t.{col}"
        if qual in src_names:
            return f"__s.{col}"
        raise ValueError(f"unknown qualifier {qual!r} in {expr!r}")

    s = _QUAL_RE.sub(sub_q, masked)

    def sub_b(m: re.Match) -> str:
        w = m.group(1)
        # a real column wins over a keyword homonym (a table column named
        # `day` must still resolve); only non-columns fall through to the
        # keyword pass-through
        if not prefer_event and w in table_cols:
            return f"__t.{w}"
        if w.upper() in _SQL_WORDS:
            return w
        return f"__s.{w}"

    s = _BARE_RE.sub(sub_b, s)
    return restore_literals(s, lits)


def _split_eq_conjuncts(cond: str) -> list[tuple[str, str]] | None:
    """Split a pure equality-AND condition into (lhs, rhs) conjunct pairs;
    None when the condition has OR/NOT, non-equality comparisons, or
    parenthesized structure."""
    masked, lits = mask_literals(cond)
    if re.search(r"\bOR\b|\bNOT\b", masked, re.IGNORECASE) or "(" in masked:
        return None
    out = []
    for part in re.split(r"\bAND\b", masked, flags=re.IGNORECASE):
        m = re.match(r"^\s*([^<>!=]+?)\s*=\s*([^<>!=]+?)\s*$", part)
        if not m:
            return None
        out.append(
            (restore_literals(m.group(1), lits), restore_literals(m.group(2), lits))
        )
    return out


def _classify_update(d, table_cols: list[str]) -> list[tuple[str, str, str]] | None:
    """Classify every SET item of an UPDATE as ('add', col, delta_sql) or
    ('set', col, value_sql) with event-only value expressions; None when any
    item doesn't commute."""
    items = []
    for col, expr in d.set_items:
        masked, lits = mask_literals(expr)
        m = re.match(
            rf"^\s*(?:{re.escape(d.table)}\s*\.\s*)?{re.escape(col)}\s*([+-])\s*(.+)$",
            masked,
            re.DOTALL,
        )
        if m:
            delta = rewrite(restore_literals(m.group(2), lits), d, table_cols)
            if "__t." in delta:
                return None
            items.append(("add", col, f"-({delta})" if m.group(1) == "-" else delta))
            continue
        value = rewrite(expr, d, table_cols)
        if "__t." in value:
            return None
        items.append(("set", col, value))
    return items


def _mutated_columns(stmts) -> set[str]:
    return {col for d in stmts if d.kind == "update" for col, _ in d.set_items}


def compiled_table_plan(app, name: str, stack: frozenset) -> DataFrame | None:
    """Build the table's final state as ONE Spark plan, or None when any
    statement targeting it falls outside the commuting classes."""
    sd = app.streams[name]
    stmts = [d for d in app.dml if d.table == name]
    cache_max = (
        int(sd.options.get("max_size", "0"))
        if sd.options.get("backend") == "cache"
        else None
    )
    if not stmts and cache_max is None and sd.options.get("backend") != "jdbc":
        return None
    cols = [c for c, _ in sd.columns]
    types = dict(sd.columns)

    if cache_max is not None and any(d.kind in ("delete", "upsert") for d in stmts):
        # eviction interleaves with membership changes — only the exact
        # replay reproduces cache_table.rs; updates are membership- and
        # order-preserving, so they stay on the compiled path
        return None

    if any(d.kind == "upsert" for d in stmts):
        if len(stmts) != 1:
            return None
        return _upsert_plan(app, name, stmts[0], cols, types, stack)

    updates = [d for d in stmts if d.kind == "update"]
    deletes = [d for d in stmts if d.kind == "delete"]
    classified = []
    col_writers: dict[str, list] = {}
    for d in updates:
        items = _classify_update(d, cols)
        if items is None:
            return None
        classified.append((d, items))
        for kind, col, _ in items:
            col_writers.setdefault(col, []).append(kind)
    # two statements writing one column only commute when both are additive
    for col, kinds in col_writers.items():
        if len(kinds) > 1 and set(kinds) != {"add"}:
            return None
    # conditions must not read columns any update mutates (the replay
    # evaluates conditions against EVOLVING values; the compiled plan
    # against base/final values)
    mutated = _mutated_columns(updates)
    for d in stmts:
        cond = rewrite(d.condition, d, cols)
        if any(f"__t.{c}" in cond for c in mutated):
            return None

    t = _adds_df(app, name, cols, types, stack)
    if cache_max is not None:
        # retention BEFORE updates: membership is append-only here, so the
        # final rows are exactly the last max_size adds (TakeOrdered, no
        # full sort) — and evicted rows never pay the update joins
        from ..operators.tables import cache_retention

        t = cache_retention(t, cache_max)
    for d, items in classified:
        t = _apply_update(app, t, d, items, cols, types, stack)
    for d in deletes:
        t = _apply_delete(app, t, d, cols, stack)
    return t


def _adds_df(app, name: str, cols: list[str], types: dict, stack: frozenset) -> DataFrame:
    """All rows ever added to the table (sent rows + INSERT INTO emissions),
    each carrying its arrival ``__seq`` — plan-level union, no collection."""
    df = app._base_df(name)
    for q in app.queries:
        if q.target == name:
            df = df.unionByName(
                app._run_query(q, stack | {name}).select(*cols, "__seq", "__ts")
            )
    return df.select(
        *[F.col(c).cast(types[c]).alias(c) for c in cols], "__seq", "__ts"
    )


def _apply_update(app, t: DataFrame, d, items, cols, types, stack) -> DataFrame:
    s = app.stream_df(d.source, stack | {d.table})
    cond = F.expr(rewrite(d.condition, d, cols)) & (
        F.col("__s.__seq") > F.col("__t.__seq")
    )
    j = t.alias("__t").join(s.alias("__s"), cond, "left")
    aggs = []
    for i, (kind, col, val_sql) in enumerate(items):
        if kind == "add":
            aggs.append(F.sum(F.expr(val_sql)).alias(f"__m{i}"))
        else:  # replacement: last matching later event wins per row
            aggs.append(
                F.max_by(F.expr(val_sql), F.col("__s.__seq")).alias(f"__m{i}")
            )
            aggs.append(F.max(F.col("__s.__seq")).alias(f"__m{i}_seq"))
    g = j.groupBy(
        *[F.col(f"__t.{c}") for c in cols],
        F.col("__t.__seq").alias("__seq"),
        F.col("__t.__ts").alias("__ts"),
    ).agg(*aggs)
    out = g
    for i, (kind, col, _) in enumerate(items):
        if kind == "add":
            new = F.col(col) + F.coalesce(F.col(f"__m{i}"), F.lit(0))
        else:
            new = F.when(
                F.col(f"__m{i}_seq").isNotNull(), F.col(f"__m{i}")
            ).otherwise(F.col(col))
        out = out.withColumn(col, new.cast(types[col]))
    return out.select(*cols, "__seq", "__ts")


def _apply_delete(app, t: DataFrame, d, cols, stack) -> DataFrame:
    s = app.stream_df(d.source, stack | {d.table})
    cond = F.expr(rewrite(d.condition, d, cols)) & (
        F.col("__s.__seq") > F.col("__t.__seq")
    )
    return t.alias("__t").join(s.alias("__s"), cond, "left_anti")


def _upsert_plan(app, name, d, cols, types, stack) -> DataFrame | None:
    eq = _split_eq_conjuncts(d.condition)
    if eq is None or len(d.select_items) != len(cols):
        return None
    keys: list[str] = []
    key_exprs: list[str] = []
    for lhs, rhs in eq:
        lt, rt = rewrite(lhs, d, cols), rewrite(rhs, d, cols)
        for a, b in ((lt, rt), (rt, lt)):
            m = re.match(r"^\s*__t\.(\w+)\s*$", a)
            if m and "__t." not in b:
                keys.append(m.group(1))
                key_exprs.append(b)
                break
        else:
            return None
    sel = [rewrite(e, d, cols, prefer_event=True) for e, _ in d.select_items]
    if any("__t." in x for x in sel):
        return None
    # an inserted row must keep matching the condition afterwards: the
    # SELECT value for each key column has to be the condition's event expr
    for k, kx in zip(keys, key_exprs):
        if k in cols and sel[cols.index(k)].replace(" ", "") != kx.replace(" ", ""):
            return None

    adds = _adds_df(app, name, cols, types, stack)
    s = app.stream_df(d.source, stack | {name}).alias("__s")
    ev = s.select(
        *[F.expr(kx).alias(f"__k{i}") for i, kx in enumerate(key_exprs)],
        *[F.expr(x).cast(types[c]).alias(f"__v_{c}") for x, c in zip(sel, cols)],
        F.col("__seq"),
        F.col("__ts"),
    )
    agg = ev.groupBy(*[f"__k{i}" for i in range(len(keys))]).agg(
        *[F.max_by(f"__v_{c}", "__seq").alias(f"__v_{c}") for c in cols],
        F.min("__seq").alias("__first_seq"),
        F.max("__seq").alias("__last_seq"),
        F.min_by("__ts", "__seq").alias("__first_ts"),
    )

    ta, aa = adds.alias("__t"), agg.alias("__a")
    cond = reduce(
        lambda x, y: x & y,
        [
            F.col(f"__t.{k}") == F.col(f"__a.__k{i}")
            for i, k in enumerate(keys)
        ],
    )
    replaced = ta.join(aa, cond, "left").select(
        *[
            F.when(
                F.col("__a.__last_seq") > F.col("__t.__seq"),
                F.col(f"__a.__v_{c}"),
            )
            .otherwise(F.col(f"__t.{c}"))
            .alias(c)
            for c in cols
        ],
        F.col("__t.__seq").alias("__seq"),
        F.col("__t.__ts").alias("__ts"),
    )
    # insert iff the key had no table row yet when its FIRST upsert arrived
    min_add = adds.groupBy(*keys).agg(F.min("__seq").alias("__min_add"))
    ma = min_add.alias("__m")
    icond = reduce(
        lambda x, y: x & y,
        [
            F.col(f"__a.__k{i}") == F.col(f"__m.{k}")
            for i, k in enumerate(keys)
        ],
    )
    inserts = (
        aa.join(ma, icond, "left")
        .filter(
            F.col("__m.__min_add").isNull()
            | (F.col("__m.__min_add") > F.col("__a.__first_seq"))
        )
        .select(
            *[F.col(f"__a.__v_{c}").alias(c) for c in cols],
            F.col("__a.__first_seq").alias("__seq"),
            F.col("__a.__first_ts").alias("__ts"),
        )
    )
    return replaced.unionByName(inserts)
