"""EventFluxApp — the AppRunner-equivalent runtime for the SQL dialect.

≙ reference lifecycle (SURVEY.md §3.1): ``EventFluxManager::
create_eventflux_app_runtime_from_string`` + AppRunner test harness
(``tests/common/mod.rs:31``): parse a multi-statement app, ``send()`` events
into input streams, collect a target stream's output rows.

Execution model here: each ``send`` stamps a global arrival sequence (the
analog of the reference's single-threaded arrival order); ``run(target)``
materializes the dataflow bottom-up — every INSERT INTO query compiles to
Spark SQL over temp views (standard clauses) or to the keyed-NFA pattern
matcher (``FROM PATTERN``), with EventFlux window specs mapped to
``window()``/``session_window()``/length-window formulations.

Deliberate batch-semantics deltas from the push engine (documented, asserted
in tests): non-windowed GROUP BY yields final aggregates (the reference
emits per-chunk running updates — Spark's update output mode in streaming);
windowed aggregates yield one row per closed window.
"""

from __future__ import annotations

import datetime
import re
import threading
import warnings
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cep import PatternSpec, Step, match_pattern_batch
from .compiler import (
    AggregationDef,
    DmlDef,
    PatternDef,
    QueryDef,
    StreamDef,
    parse_aggregation,
    parse_create,
    parse_delete,
    parse_insert,
    parse_trigger,
    parse_update,
    parse_upsert,
    split_statements,
)

_AGG_RE = re.compile(
    r"\b(COUNT|SUM|AVG|MIN|MAX|STDDEV|STDDEV_POP|COUNT_DISTINCT|FIRST|LAST)\s*\(",
    re.IGNORECASE,
)


def _is_agg_expr(e: str) -> bool:
    """Built-in aggregate OR a user attribute aggregator registered through
    the extension factory surface (functions/extensions.py ≙
    eventflux_manager.rs:283-288 add_attribute_aggregator_factory)."""
    if _AGG_RE.search(e):
        return True
    from ..functions import extensions as ext

    return ext.matches_registered_aggregator(e)


_EREF_RE = re.compile(r"\b(e\d+)\.(\w+)")
_EPOCH = datetime.datetime(2024, 1, 1)


def _sql_literal(text: str):
    """Evaluate a SQL literal from an on-demand INSERT VALUES list."""
    t = text.strip()
    if re.fullmatch(r"'(?:[^']|'')*'", t):
        return t[1:-1].replace("''", "'")
    u = t.upper()
    if u == "NULL":
        return None
    if u in ("TRUE", "FALSE"):
        return u == "TRUE"
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t)
    if re.fullmatch(r"[+-]?\d*\.\d+(?:[eE][+-]?\d+)?", t):
        return float(t)
    raise ValueError(f"unsupported literal in on-demand INSERT: {text!r}")


class EventFluxApp:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.streams: dict[str, StreamDef] = {}
        self.queries: list[QueryDef] = []
        self.dml: list[DmlDef] = []
        self.aggregations: dict[str, AggregationDef] = {}
        self._rows: dict[str, list[tuple]] = {}
        #: final table states after DML replay / on-demand mutation
        self._table_final: dict[str, list[dict]] = {}
        self._dml_cache: dict[int, dict] = {}
        #: test hook — force event-at-a-time DML replay (the parity oracle)
        #: even when the statements compile to MERGE plans
        self._force_dml_replay = False
        self._seq = 0
        # concurrent senders serialize on the junction lock: each send()
        # call is atomic, so one caller's batch lands contiguously in the
        # global arrival order (stream_junction.rs concurrent-publisher
        # contract; exercised by the app_runner_stress.rs-style pytest)
        self._send_lock = threading.Lock()

    # -- DDL / DML registration ------------------------------------------

    def execute(self, sql: str) -> "EventFluxApp":
        # PARTITION WITH (...) BEGIN ... END blocks contain ';' — lift them
        # out before statement splitting (partition/parser.rs:14 analog)
        partition_blocks = []

        def _capture(m: re.Match) -> str:
            partition_blocks.append((m.group(1), m.group(2)))
            return ""

        sql = re.sub(
            r"PARTITION\s+WITH\s*\(([^)]*)\)\s*BEGIN(.*?)END\s*;?",
            _capture,
            sql,
            flags=re.IGNORECASE | re.DOTALL,
        )
        for keys_text, body in partition_blocks:
            pkeys = {}
            for item in keys_text.split(","):
                km = re.match(r"\s*(\w+)\s+OF\s+(\w+)\s*", item, re.IGNORECASE)
                pkeys[km.group(2)] = km.group(1)
            for stmt in split_statements(body):
                q = parse_insert(stmt)
                q.partition_keys.update(pkeys)
                self.queries.append(q)
                if q.target not in self.streams:
                    self.streams[q.target] = StreamDef(q.target, [])
                    self._rows.setdefault(q.target, [])
        for stmt in split_statements(sql):
            head = stmt.split(None, 1)[0].upper()
            if head == "CREATE" and re.match(r"CREATE\s+TRIGGER", stmt, re.IGNORECASE):
                d = parse_trigger(stmt)
                self.streams[d.name] = d
                self._rows.setdefault(d.name, [])
            elif head == "CREATE" and re.match(
                r"CREATE\s+AGGREGATION", stmt, re.IGNORECASE
            ):
                a = parse_aggregation(stmt)
                self.aggregations[a.name] = a
            elif head == "CREATE":
                d = parse_create(stmt)
                self.streams[d.name] = d
                self._rows.setdefault(d.name, [])
            elif head == "INSERT":
                q = parse_insert(stmt)
                self.queries.append(q)
                if q.target not in self.streams:
                    # INSERT INTO auto-creates the output stream
                    # (GRAMMAR.md "Dynamic Output Streams")
                    self.streams[q.target] = StreamDef(q.target, [])
                    self._rows.setdefault(q.target, [])
            elif head == "UPDATE":
                self.dml.append(parse_update(stmt))
            elif head == "DELETE":
                self.dml.append(parse_delete(stmt))
            elif head == "UPSERT":
                self.dml.append(parse_upsert(stmt))
            else:
                raise ValueError(f"unsupported statement: {stmt[:60]}")
        for d in self.dml:
            if d.table not in self.streams or not self.streams[d.table].is_table:
                raise ValueError(f"{d.kind.upper()} target {d.table} is not a TABLE")
        return self

    # -- data ingestion ----------------------------------------------------

    def send(self, stream: str, rows: list[tuple], ts: list[Any] | None = None) -> None:
        """Append events; arrival order == global send order (the reference
        stamps wall-clock on arrival, input_handler.rs:65 — we stamp a
        deterministic 1-second-per-event clock unless ``ts`` is given)."""
        sd = self.streams[stream]
        with self._send_lock:
            for i, r in enumerate(rows):
                if len(r) != len(sd.columns):
                    raise ValueError(
                        f"{stream} expects {len(sd.columns)} cols, got {r}"
                    )
                t = ts[i] if ts else _EPOCH + datetime.timedelta(seconds=self._seq)
                self._rows[stream].append((*r, self._seq, t))
                self._seq += 1

    # -- evaluation ---------------------------------------------------------

    def _base_df(self, name: str) -> DataFrame:
        sd = self.streams[name]
        schema = ", ".join(f"{c} {t}" for c, t in sd.columns)
        schema = (schema + ", " if schema else "") + "__seq bigint, __ts timestamp"
        rows = self._rows[name]
        if sd.trigger is not None:
            # deterministic tick generation over the app's logical clock:
            # 'start' fires once at epoch; EVERY d fires after each interval
            # up to the last arrival (trigger_runtime.rs:13 analog)
            if sd.trigger == "start":
                ticks = [_EPOCH]
            elif isinstance(sd.trigger, tuple) and sd.trigger[0] == "cron":
                # arbitrary 6-field cron (sql/cron.py ≙ trigger_runtime.rs:47)
                ticks = sd.trigger[1].ticks(
                    _EPOCH, _EPOCH + datetime.timedelta(seconds=self._seq)
                )
            else:
                step = datetime.timedelta(milliseconds=int(sd.trigger))
                end = _EPOCH + datetime.timedelta(seconds=self._seq)
                ticks, t = [], _EPOCH + step
                while t <= end:
                    ticks.append(t)
                    t += step
            rows = [(t, 10_000_000 + i, t) for i, t in enumerate(ticks)]
        base = self.spark.createDataFrame(rows, schema)
        if sd.is_table and sd.options.get("backend") == "jdbc":
            # pre-existing store contents arrive BEFORE every stream event
            # (negative __seq) — jdbc_table.rs:18 read path via Spark's jdbc
            # datasource (pushdown + partitioned scans at scale)
            from ..operators.tables import jdbc_read

            base = jdbc_read(self.spark, sd.options, sd.columns).unionByName(base)
        return base

    def stream_df(self, name: str, _stack: frozenset = frozenset()) -> DataFrame:
        """Materialize a stream: sent rows + every query targeting it.
        A TABLE with DML statements materializes as its final replayed
        state (mutations applied in arrival order)."""
        if name in _stack:
            raise ValueError(f"cyclic stream dependency through {name}")
        if self.streams[name].is_table and (
            name in self._table_final
            or any(d.table == name for d in self.dml)
            or self.streams[name].options.get("backend")
        ):
            return self._table_df(name, _stack)
        df = self._base_df(name)
        for q in self.queries:
            if q.target == name:
                out = self._run_query(q, _stack | {name})
                df = df.unionByName(out) if self.streams[name].columns else out
        return df

    # -- table DML replay ---------------------------------------------------
    #
    # ≙ reference table mutation processors ({update,delete,upsert}_table_
    # processor.rs): every arriving source-stream event mutates the table
    # under the app's single global arrival order. This replay is the
    # AppRunner fixture analog (bounded data, like run()'s collect) — the
    # distributed form of the same semantics is operators/dml.py's MERGE
    # plans, oracle-gated as dml_upsert_last_writer / dml_update_additive /
    # dml_delete_stream_antijoin.

    def _compiled_table_plan(
        self, name: str, _stack: frozenset = frozenset()
    ) -> "DataFrame | None":
        """Distributed MERGE plan for the table's final state when every DML
        statement targeting it is a commuting class (sql/dml_compile.py) —
        the scale path: no driver replay, no per-event loops. None when the
        state was already materialized (on-demand mutation) or a statement
        doesn't commute (→ event-at-a-time replay)."""
        if name in self._table_final or self._force_dml_replay:
            return None
        from . import dml_compile

        return dml_compile.compiled_table_plan(self, name, _stack)

    def _table_state(self, name: str, _stack: frozenset = frozenset()) -> list[dict]:
        if name in self._table_final:
            return self._table_final[name]
        plan = self._compiled_table_plan(name, _stack)
        if plan is not None:
            try:
                state = [r.asDict() for r in plan.orderBy("__seq").collect()]
            except Exception as exc:  # analysis failure in a rewritten expr
                # (e.g. an expression shape mask_literals/rewrite mangled):
                # the event-at-a-time replay is the parity oracle — fall
                # back to it rather than erroring the whole app
                warnings.warn(
                    f"compiled DML plan for table {name!r} failed analysis "
                    f"({exc.__class__.__name__}); falling back to "
                    f"event-at-a-time replay (O(events) driver loop)",
                    RuntimeWarning, stacklevel=2,
                )
                plan = None
            if plan is not None:
                self._table_final[name] = state
                return state
        sd = self.streams[name]
        if any(d.table == name for d in self.dml) and not self._force_dml_replay:
            # reachable only when compiled_table_plan declined (a statement
            # outside the commuting classes): surface the O(events x rows)
            # path so users don't ship it unknowingly at scale
            warnings.warn(
                f"DML on table {name!r} falls outside the commuting classes "
                "(sql/dml_compile.py) - using the event-at-a-time driver "
                "replay, which does not scale past test-sized inputs",
                RuntimeWarning, stacklevel=2,
            )
        cols = [c for c, _ in sd.columns]
        events: list[tuple[int, str, object, object]] = []  # (seq, kind, dml, payload)
        if sd.options.get("backend") == "jdbc":
            # store contents pre-exist every event (negative __seq)
            from ..operators.tables import jdbc_read

            for r in jdbc_read(self.spark, sd.options, sd.columns).collect():
                rec = r.asDict()
                events.append((rec["__seq"], "add", None, rec))
        # adds: sent rows + INSERT INTO <table> query emissions
        for r in self._rows[name]:
            row = dict(zip(cols, r[:-2]))
            events.append((r[-2], "add", None, {**row, "__seq": r[-2], "__ts": r[-1]}))
        for q in self.queries:
            if q.target == name:
                out = self._run_query(q, _stack | {name}).toPandas()
                for rec in out.to_dict("records"):
                    events.append(
                        (int(rec["__seq"]), "add", None,
                         {**{c: rec[c] for c in cols}, "__seq": int(rec["__seq"]),
                          "__ts": rec["__ts"]})
                    )
        # mutations: each DML statement driven by its source stream's rows
        for d in self.dml:
            if d.table != name:
                continue
            src = (
                self.stream_df(d.source, _stack | {name})
                .orderBy("__seq")
                .toPandas()
            )
            for rec in src.to_dict("records"):
                events.append((int(rec["__seq"]), d.kind, d, rec))
        events.sort(key=lambda e: e[0])

        # cache backend (cache_table.rs:20): bounded FIFO — every insert
        # beyond capacity evicts the OLDEST surviving row
        max_size = (
            int(sd.options.get("max_size", "0"))
            if sd.options.get("backend") == "cache"
            else None
        )
        state: list[dict] = []
        for seq, kind, d, payload in events:
            if kind == "add":
                state.append(payload)
            else:
                self._apply_mutation(state, d, payload, cols, seq)
            if max_size is not None and len(state) > max_size:
                del state[: len(state) - max_size]
        self._table_final[name] = state
        return state

    def _dml_compiled(self, d: DmlDef, cols: list[str]) -> dict:
        """Per-statement compiled callables (cached — the replay loop calls
        this once per EVENT, the regex compilation must not repeat)."""
        key = id(d)
        if key not in self._dml_cache:
            self._dml_cache[key] = {
                "cond": self._compile_dml_expr(d.condition, d, cols),
                "setters": [
                    (col, self._compile_dml_expr(expr, d, cols))
                    for col, expr in d.set_items
                ],
                "select": [
                    self._compile_dml_expr(expr, d, cols, prefer_event=True)
                    for expr, _ in d.select_items
                ],
            }
        return self._dml_cache[key]

    def _apply_mutation(
        self, state: list[dict], d: DmlDef, event: dict, cols: list[str], seq: int
    ) -> None:
        compiled = self._dml_compiled(d, cols)
        cond = compiled["cond"]
        if d.kind == "update":
            for row in state:
                if cond(row, event):
                    new = {col: fn(row, event) for col, fn in compiled["setters"]}
                    row.update(new)
        elif d.kind == "delete":
            state[:] = [row for row in state if not cond(row, event)]
        elif d.kind == "upsert":
            vals = [fn({}, event) for fn in compiled["select"]]
            if len(vals) != len(cols):
                raise ValueError(
                    f"UPSERT INTO {d.table}: SELECT yields {len(vals)} values, "
                    f"table has {len(cols)} columns"
                )
            new_row = dict(zip(cols, vals))
            matched = False
            for row in state:
                if cond(row, event):
                    row.update(new_row)
                    matched = True
            if not matched:
                state.append(
                    {**new_row, "__seq": seq, "__ts": event.get("__ts")}
                )

    def _compile_dml_expr(
        self, expr: str, d: DmlDef, table_cols: list[str], prefer_event: bool = False
    ):
        """Compile a DML condition / SET / SELECT expression into a python
        callable over (table row dict, event dict). Qualified refs resolve by
        name (table vs source/alias); bare names prefer the table column —
        except UPSERT SELECT items (``prefer_event``), whose values come from
        the driving stream event."""
        from .dml_compile import mask_literals, restore_literals

        src_names = {d.source}
        if d.source_alias:
            src_names.add(d.source_alias)

        def sub_qualified(m: re.Match) -> str:
            qual, col = m.group(1), m.group(2)
            if qual == d.table:
                return f"__t[{col!r}]"
            if qual in src_names:
                return f"__e[{col!r}]"
            raise ValueError(f"unknown qualifier {qual!r} in {expr!r}")

        # mask '...' string literals first so keyword/identifier rewriting
        # can never touch words inside them (ADVICE r2: multi-word literals)
        py, lits = mask_literals(expr)
        py = re.sub(r"\b(\w+)\.(\w+)\b", sub_qualified, py)
        py = re.sub(r"(?<![<>!=])=(?!=)", "==", py)
        py = re.sub(r"\bAND\b", "and", py, flags=re.IGNORECASE)
        py = re.sub(r"\bOR\b", "or", py, flags=re.IGNORECASE)
        py = re.sub(r"\bNOT\b", "not", py, flags=re.IGNORECASE)

        def sub_bare(m: re.Match) -> str:
            w = m.group(1)
            if w in ("and", "or", "not", "__t", "__e", "True", "False", "None"):
                return w
            if not prefer_event and w in table_cols:
                return f"__t[{w!r}]"
            return f"__e[{w!r}]"

        # the quote lookahead skips the col names inside already-substituted
        # __t['col'] / __e['col'] forms (string literals are masked out)
        py = re.sub(r"\b(?!__[te]\b)([a-zA-Z_]\w*)\b(?!\s*\(|')", sub_bare, py)
        py = restore_literals(py, lits)
        code = compile(py, "<dml-expr>", "eval")

        def fn(row: dict, event: dict):
            return eval(code, {"__builtins__": {}}, {"__t": row, "__e": event})

        return fn

    @staticmethod
    def _py(v):
        """pandas/numpy scalar → plain python (createDataFrame strictness)."""
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        return v.item() if hasattr(v, "item") else v

    def _table_df(self, name: str, _stack: frozenset = frozenset()) -> DataFrame:
        plan = self._compiled_table_plan(name, _stack)
        if plan is not None:
            return plan
        cols = [c for c, _ in self.streams[name].columns]
        schema = ", ".join(f"{c} {t}" for c, t in self.streams[name].columns)
        schema += ", __seq bigint, __ts timestamp"
        state = self._table_state(name, _stack)
        rows = [
            tuple(self._py(r.get(c)) for c in cols)
            + (self._py(r["__seq"]), self._py(r["__ts"]))
            for r in state
        ]
        return self.spark.createDataFrame(rows, schema)

    def table(self, name: str) -> list[tuple]:
        """Final table state (insertion order) after all DML replay —
        ≙ reference Table::find over the whole store."""
        cols = [c for c, _ in self.streams[name].columns]
        return [tuple(r.get(c) for c in cols) for r in self._table_state(name)]

    def flush_table(self, name: str) -> None:
        """Write a JDBC-backed table's final state back to its store
        (jdbc_table.rs write path; overwrite = final-state contract)."""
        sd = self.streams[name]
        if sd.options.get("backend") != "jdbc":
            raise ValueError(f"table {name!r} has no jdbc backend to flush to")
        from ..operators.tables import jdbc_write

        jdbc_write(self._table_df(name).select(*[c for c, _ in sd.columns]), sd.options)

    # -- incremental aggregation queries --------------------------------------

    def query_aggregation(
        self,
        name: str,
        per: str,
        within: "tuple | None" = None,
    ) -> list[tuple]:
        """``query_aggregation(agg_id, within, per)``
        (≙ eventflux_app_runtime.rs:982) over a CREATE AGGREGATION cascade.
        Returns (keys..., bucket_start, aggs...) rows ordered by
        (keys, bucket_start). Exceeds the reference, whose runtime ignores
        ``within`` (aggregation_runtime.rs:61) — here it is a real
        bucket-range filter."""
        from ..operators.incremental import IncrementalAggregation

        a = self.aggregations[name]
        src = self.stream_df(a.source)
        inc = IncrementalAggregation(
            src, "__ts", a.group_cols, a.aggs, a.durations
        )
        out = inc.query(per, within)
        return [
            tuple(r)
            for r in out.orderBy(*a.group_cols, "bucket_start").collect()
        ]

    # -- on-demand (store) queries -------------------------------------------
    #
    # ≙ reference on_demand_query.rs:17-28 / store.rs:5 — SELECT / UPDATE /
    # DELETE against a table's CURRENT state, outside any stream query.

    def on_demand(self, sql: str) -> list[tuple] | int:
        """Run an on-demand store query (≙ OnDemandQueryType,
        on_demand_query.rs:17-28). SELECT returns rows; UPDATE / DELETE /
        UPDATE OR INSERT mutate the table state in place and return the
        affected-row count (an UPDATE OR INSERT that matches nothing
        inserts one row built from its SET items,
        on_demand_query.rs:132-150 update_or_insert_by)."""
        stmt = sql.strip().rstrip(";")
        head = stmt.split(None, 1)[0].upper()
        upsert = bool(
            re.match(r"UPDATE\s+OR\s+INSERT\b", stmt, re.IGNORECASE)
        )
        if head == "INSERT" and not upsert:
            # OnDemandQueryType::Insert: append one literal row to the store
            m = re.match(
                r"INSERT\s+INTO\s+(\w+)\s+VALUES\s*\((.*)\)\s*$",
                stmt, re.IGNORECASE | re.DOTALL,
            )
            if m is None:
                raise ValueError(
                    "on-demand INSERT must be 'INSERT INTO <table> "
                    f"VALUES (v, ...)': {stmt[:80]!r}"
                )
            table, vals_text = m.groups()
            if table not in self.streams:
                raise ValueError(f"unknown table {table!r} in on-demand statement")
            from .compiler import _split_top

            cols = [c for c, _ in self.streams[table].columns]
            vals = [v.strip() for v in _split_top(vals_text)]
            if len(vals) != len(cols):
                raise ValueError(
                    f"{table} expects {len(cols)} values, got {len(vals)}"
                )
            row = {c: _sql_literal(v) for c, v in zip(cols, vals)}
            state = self._table_state(table)
            row.update(
                {
                    "__seq": self._seq,
                    "__ts": _EPOCH + datetime.timedelta(seconds=self._seq),
                }
            )
            self._seq += 1
            state.append(row)
            return 1
        if upsert:
            m = re.match(
                r"UPDATE\s+OR\s+INSERT\s+INTO\s+(\w+)\s+SET\s+(.*?)"
                r"(?:\s+WHERE\s+(.*))?$",
                stmt, re.IGNORECASE | re.DOTALL,
            )
            if m is None:
                raise ValueError(
                    "on-demand UPDATE OR INSERT must be 'UPDATE OR INSERT "
                    "INTO <table> SET col = expr[, ...] [WHERE <cond>]': "
                    f"{stmt[:80]!r}"
                )
            table, set_text, cond_text = m.groups()
            d = DmlDef("update", table, "__none__", (cond_text or "").strip())
            from .compiler import _split_top

            for item in _split_top(set_text):
                am = re.match(r"([\w.]+)\s*=\s*(.+)$", item.strip(), re.DOTALL)
                if am is None:
                    raise ValueError(
                        f"bad SET item in on-demand UPDATE OR INSERT: {item!r}"
                    )
                d.set_items.append(
                    (am.group(1).split(".")[-1], am.group(2).strip())
                )
            if table not in self.streams:
                raise ValueError(f"unknown table {table!r} in on-demand statement")
            cols = [c for c, _ in self.streams[table].columns]
            state = self._table_state(table)
            cond = (
                self._compile_dml_expr(d.condition, d, cols)
                if d.condition
                else (lambda row, event: True)
            )
            setters = [
                (col, self._compile_dml_expr(expr, d, cols))
                for col, expr in d.set_items
            ]
            n = 0
            for row in state:
                if cond(row, {}):
                    row.update({col: fn(row, {}) for col, fn in setters})
                    n += 1
            if n == 0:
                # miss → insert: the new row is built from the SET items
                # over a null-initialized row (upsert_table_processor.rs
                # miss branch semantics, applied store-side)
                row = {c: None for c in cols}
                row.update(
                    {
                        "__seq": self._seq,
                        "__ts": _EPOCH + datetime.timedelta(seconds=self._seq),
                    }
                )
                row.update({col: fn(row, {}) for col, fn in setters})
                self._seq += 1
                state.append(row)
                n = 1
            return n
        if head == "SELECT":
            tables = {d.table for d in self.dml} | {
                n for n, s in self.streams.items() if s.is_table
            }
            for t in tables:
                self._table_df(t).createOrReplaceTempView(t)
            out = self.spark.sql(stmt)
            cols = [c for c in out.columns if not c.startswith("__")]
            return [tuple(r) for r in out.select(*cols).collect()]
        if head == "UPDATE":
            m = re.match(
                r"UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
                stmt, re.IGNORECASE | re.DOTALL,
            )
            if m is None:
                raise ValueError(
                    "on-demand UPDATE must be 'UPDATE <table> SET col = expr"
                    f"[, ...] [WHERE <cond>]': {stmt[:80]!r}"
                )
            table, set_text, cond_text = m.groups()
            d = DmlDef("update", table, "__none__", (cond_text or "").strip())
            from .compiler import _split_top

            for item in _split_top(set_text):
                am = re.match(r"([\w.]+)\s*=\s*(.+)$", item.strip(), re.DOTALL)
                if am is None:
                    raise ValueError(f"bad SET item in on-demand UPDATE: {item!r}")
                d.set_items.append((am.group(1).split(".")[-1], am.group(2).strip()))
        elif head == "DELETE":
            m = re.match(
                r"DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?$",
                stmt, re.IGNORECASE | re.DOTALL,
            )
            if m is None:
                raise ValueError(
                    "on-demand DELETE must be 'DELETE FROM <table> "
                    f"[WHERE <cond>]': {stmt[:80]!r}"
                )
            table, cond_text = m.groups()
            d = DmlDef("delete", table, "__none__", (cond_text or "").strip())
        else:
            raise ValueError(f"unsupported on-demand statement: {stmt[:60]}")
        if table not in self.streams:
            raise ValueError(f"unknown table {table!r} in on-demand statement")
        cols = [c for c, _ in self.streams[table].columns]
        state = self._table_state(table)
        # WHERE-less statement = full-table mutation (reference store.rs
        # accepts the same shape)
        cond = (
            self._compile_dml_expr(d.condition, d, cols)
            if d.condition
            else (lambda row, event: True)
        )
        n_before = len(state)
        if d.kind == "delete":
            state[:] = [row for row in state if not cond(row, {})]
            return n_before - len(state)
        setters = [
            (col, self._compile_dml_expr(expr, d, cols)) for col, expr in d.set_items
        ]
        n = 0
        for row in state:
            if cond(row, {}):
                row.update({col: fn(row, {}) for col, fn in setters})
                n += 1
        return n

    def run(self, target: str) -> list[tuple]:
        """Collect the target stream's rows in emission order (AppRunner
        ``shutdown()`` analog)."""
        df = self.stream_df(target)
        cols = [c for c, _ in self.streams[target].columns] or [
            c for c in df.columns if not c.startswith("__")
        ]
        return [tuple(r) for r in df.orderBy("__seq").select(*cols).collect()]

    # -- streaming execution --------------------------------------------------

    def run_streaming(
        self,
        target: str,
        watermark: str = "10 seconds",
        n_chunks: int = 3,
    ) -> list[tuple]:
        """Execute the single query targeting ``target`` as a REAL
        Structured Streaming job: sent rows feed a chunked file stream (plus
        a far-future flush sentinel), the query runs with watermarks, output
        drains from a memory sink.

        Supported terminal shapes: row-level filter/projection (incl.
        stream-table enrichment joins — bound table broadcast per
        micro-batch — and stream-STREAM INNER joins: each input gets its own
        chunked feed and Spark's symmetric join state buffers both sides
        across micro-batches), windowed aggregation (tumbling/sliding/
        session + GROUP BY), non-windowed GROUP BY (running agg,
        complete-mode drain), and patterns — including MULTI-stream
        patterns (step streams union into one watermarked feed tagged
        __src; every secondary feed carries its own far-future sentinel
        because a union's watermark is the min across inputs). INSERT INTO chains compile into ONE
        streaming plan: row-level intermediate stages apply in-plan
        (junction fan-through, stream_junction.rs analog).
        ≙ the reference's actual runtime mode (runtime.start() + sources,
        eventflux_app_runtime.rs:674) — the batch ``run()`` is its replay
        twin; parity between the two is pytest-asserted.
        """
        import os
        import shutil
        import tempfile

        qs = [q for q in self.queries if q.target == target]
        if len(qs) != 1:
            raise ValueError("run_streaming supports exactly one query per target")
        q = qs[0]
        # chained queries (junction composition, stream_junction.rs): walk
        # back through INSERT INTO chains — every intermediate stage must be
        # row-level (filter/projection) and is applied as a transformation
        # on the SAME streaming DataFrame; only the head stream is fed
        prelude: list[QueryDef] = []
        agg_stages: list[QueryDef] = []
        head = q.pattern.steps[0].stream if q.pattern else q.source
        while True:
            ups = [u for u in self.queries if u.target == head]
            if not ups:
                break
            if len(ups) != 1:
                raise ValueError(
                    f"run_streaming chains need exactly one query into {head}"
                )
            u = ups[0]
            if self._rows.get(head):
                raise ValueError(
                    f"stream {head} is both sent-to and query-fed; streaming "
                    "chains support one producer"
                )
            u_agg = bool(u.group_by) or any(
                _is_agg_expr(e) for e, _ in u.select_items
            )
            if u.pattern or u.window or u.joins or (
                u_agg and u.output_rate is not None
            ):
                raise ValueError(
                    "streaming chain intermediates must be row-level "
                    "filter/projection or a non-windowed GROUP BY "
                    f"aggregation (stage into {head} is not)"
                )
            if u_agg:
                # ONE aggregating intermediate per chain (stream_junction.rs
                # chains arbitrary queries; the Spark restatement runs the
                # running aggregation update-mode in-plan and drains the
                # final state — so everything downstream must be row-level
                # and a second aggregation over update-mode re-emissions
                # would double-count)
                if agg_stages:
                    raise ValueError(
                        "streaming chains support one aggregating "
                        "intermediate stage"
                    )
                agg_stages.append(u)
            prelude.insert(0, u)
            head = u.source
        source = head
        if agg_stages:
            terminal_agg = bool(q.group_by) or any(
                _is_agg_expr(e) for e, _ in q.select_items
            )
            if (
                q.pattern or q.window or q.joins or terminal_agg
                or q.output_rate is not None
            ):
                raise ValueError(
                    "a streaming chain with an aggregating intermediate "
                    "needs a row-level terminal query (filter/projection)"
                )

        sd = self.streams[source]
        base = self._base_df(source).toPandas()
        # type-correct neutral values: the sentinel only advances the
        # watermark; it is excluded from results by __seq >= 10^9 (row-level/
        # pattern) or by its never-closing far-future window (aggregates).
        # Outer stream-stream joins need NON-NULL string values: Spark
        # pushes isnotnull(join_key) below the watermark node and a
        # null-keyed sentinel would be dropped at the scan (matching is
        # prevented by the WITHIN bound — sentinel timestamps sit days
        # apart across feeds, years from data).
        outer_join = any(
            h != "inner" and not self.streams[s].is_table
            for h, s, _, _ in q.joins
        )
        defaults = {"string": "\x00sentinel" if outer_join else None,
                    "int": 0, "bigint": 0, "float": 0.0,
                    "double": 0.0, "boolean": False,
                    "timestamp": _EPOCH}
        sentinel_vals = {c: defaults.get(t) for c, t in sd.columns}
        sentinel = pd.DataFrame(
            [{**sentinel_vals, "__seq": 10**9,
              "__ts": _EPOCH + datetime.timedelta(days=3650)}]
        )
        feed_dir = tempfile.mkdtemp(prefix="efs_sqlstream_")
        join_feed_dirs: list[str] = []
        try:
            if len(base) == 0:
                raise ValueError("run_streaming needs at least one sent event")
            chunks = max(1, min(n_chunks, len(base)))
            bounds = [round(i * len(base) / chunks) for i in range(chunks + 1)]
            parts = [base.iloc[bounds[i]: bounds[i + 1]] for i in range(chunks)]
            # merge the sentinel into the last chunk so pandas keeps the real
            # rows' column dtypes (a lone all-default chunk mis-infers types),
            # then restore exact dtypes (concat promotes int32 → int64)
            parts[-1] = pd.concat([parts[-1], sentinel], ignore_index=True).astype(
                base.dtypes.to_dict()
            )
            for i, c in enumerate(parts):
                c.to_parquet(
                    os.path.join(feed_dir, f"c{i:03d}.parquet"), index=False,
                    coerce_timestamps="us", allow_truncated_timestamps=True,
                )
            schema = self._base_df(source).schema
            stream = (
                self.spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed_dir)
            )
            # apply chained stages on the same streaming plan — the junction
            # between stages is an in-plan projection (stream_junction.rs
            # fan-through analog); an aggregating stage becomes an in-plan
            # running aggregation whose update-mode state feeds the rest of
            # the chain (drained complete — final state == batch replay)
            chain_agg_applied = False
            for u in prelude:
                if u in agg_stages:
                    ukeys = [
                        g.strip()
                        for g in (u.group_by or "").split(",")
                        if g.strip()
                    ]
                    uaggs = [
                        F.expr(e).alias(a) if a else F.expr(e)
                        for e, a in u.select_items
                        if _is_agg_expr(e)
                    ]
                    # no event-time operator follows (terminal is row-level,
                    # complete-mode drain) — the sentinel can drop here
                    s2 = stream.filter(F.col("__seq") < 10**9)
                    if u.where:
                        s2 = s2.filter(F.expr(u.where))
                    stream = s2.groupBy(*ukeys).agg(*uaggs).select(
                        *[F.col(a or e) for e, a in u.select_items]
                    )
                    chain_agg_applied = True
                    continue
                s2 = stream
                if u.where:
                    # pre-agg: the watermark sentinel must SURVIVE stage
                    # predicates or downstream event-time operators never
                    # flush; post-agg the sentinel is already gone
                    s2 = s2.filter(
                        F.expr(u.where)
                        if chain_agg_applied
                        else F.expr(u.where) | (F.col("__seq") >= 10**9)
                    )
                stream = s2.selectExpr(
                    *[f"{e} AS {a}" if a else e for e, a in u.select_items],
                    *([] if chain_agg_applied else ["__seq", "__ts"]),
                )

            name = f"__sqlstream_{target.lower()}"
            is_agg = bool(q.group_by) or any(
                _is_agg_expr(e) for e, _ in q.select_items
            )
            snapshot = (
                q.output_rate is not None and q.output_rate[0] == "SNAPSHOT"
            )
            if q.output_rate is not None and not snapshot and (
                q.pattern is not None or is_agg
            ):
                raise ValueError(
                    "streaming OUTPUT rate limiting supports row-level "
                    "FIRST/LAST/ALL EVERY n EVENTS / d TIME queries and "
                    "OUTPUT SNAPSHOT over aggregating queries"
                )
            if agg_stages:
                # terminal consumer of an aggregating intermediate: plain
                # filter/projection over the running aggregation's state;
                # complete-mode drain returns the FINAL state — exactly what
                # batch run() computes for agg -> INSERT INTO S -> row-level
                out = stream
                if q.where:
                    out = out.filter(F.expr(q.where))
                out = out.selectExpr(
                    *[f"{e} AS {a}" if a else e for e, a in q.select_items]
                )
                mode = "complete"
            elif snapshot:
                # OUTPUT SNAPSHOT EVERY d over a live aggregating query
                # (snapshot_output_rate.rs): per-tick full-state emission as
                # a stateful op; identical event-time restatement to the
                # batch operator, so batch/streaming rows match
                if q.pattern is not None or not is_agg or (
                    q.window is not None and q.window.kind != "tumbling"
                ):
                    raise ValueError(
                        "streaming OUTPUT SNAPSHOT supports non-windowed or "
                        "tumbling-windowed aggregating queries"
                    )
                from ..operators.output import _parse_simple_agg
                from ..streaming.ratelimit import snapshot_agg_stream

                keys = [
                    g.strip() for g in (q.group_by or "").split(",") if g.strip()
                ]
                # tumbling window → the bucket start joins the state key
                # (same partials-over-buckets decomposition as the batch
                # operator; VERDICT r4 #5)
                wb_expr = None
                if q.window is not None:
                    wms = int(q.window.params[0])
                    wb_expr = F.floor(
                        F.col("__ts").cast("timestamp_ltz").cast("double")
                        * 1000.0
                        / F.lit(float(wms))
                    ).cast("bigint").alias("__wb")
                agg_items = [
                    (e, a or e) for e, a in q.select_items if _is_agg_expr(e)
                ]
                parsed = [_parse_simple_agg(e) for e, _ in agg_items]
                if any(p is None for p in parsed):
                    raise ValueError(
                        "streaming SNAPSHOT needs decomposable aggregates "
                        "(count/sum/avg/min/max)"
                    )
                aliases = [a for _, a in agg_items]
                src_f = (
                    stream.filter(
                        F.expr(q.where) | (F.col("__seq") >= 10**9)
                    )
                    if q.where
                    else stream
                )
                proj = src_f.select(
                    *([wb_expr] if wb_expr is not None else []),
                    *keys,
                    *[
                        (
                            F.lit(1.0)
                            if fn == "count" and arg == "*"
                            else F.expr(arg).cast("double")
                        ).alias(f"_a{i}")
                        for i, (fn, arg) in enumerate(parsed)
                    ],
                    "__seq", "__ts",
                )
                state_keys = (["__wb"] if wb_expr is not None else []) + keys
                interval_ms = q.output_rate[1]
                end = _EPOCH + datetime.timedelta(seconds=max(self._seq, 1))
                start_ms = int(
                    _EPOCH.replace(
                        tzinfo=datetime.timezone.utc
                    ).timestamp() * 1000
                )
                n_ticks = int(
                    (end - _EPOCH).total_seconds() * 1000 // interval_ms
                )
                ktypes = dict(self.streams[q.source].columns)
                out_schema = ", ".join(
                    ["__tick bigint"]
                    + (["__wb bigint"] if wb_expr is not None else [])
                    + [f"{k} {ktypes[k]}" for k in keys]
                    + [
                        f"`{a}` " + (
                            "bigint" if parsed[i][0] == "count" else "double"
                        )
                        for i, a in enumerate(aliases)
                    ]
                )
                snap = snapshot_agg_stream(
                    proj, state_keys, parsed, aliases, out_schema,
                    interval_ms, start_ms, n_ticks,
                )
                # final projection in select-item order, cast to the target
                # stream's declared types (batch sum(int) is BIGINT etc.)
                ttypes = dict(self.streams[target].columns)
                tcols = [c for c, _ in self.streams[target].columns]
                sel = [F.col("__tick")] + (
                    [F.col("__wb")] if wb_expr is not None else []
                )
                for (e, a), c in zip(q.select_items, tcols):
                    src_col = (a or e) if _is_agg_expr(e) else e
                    sel.append(F.col(src_col).cast(ttypes[c]).alias(c))
                out = snap.select(*sel)
                mode = "append"
            elif q.pattern is not None:
                # multi-stream patterns: union every step stream into one
                # unified-schema feed tagged with __src (the batch path's
                # construction, streaming twin) — each secondary feed gets
                # its OWN far-future sentinel because the union's watermark
                # is the MIN across inputs
                p_streams = list(
                    dict.fromkeys(
                        [s.stream for s in q.pattern.steps]
                        + ([q.pattern.absent[0]] if q.pattern.absent else [])
                    )
                )
                all_cols: dict[str, str] = {}
                for s in p_streams:
                    for c, t in self.streams[s].columns:
                        if c in all_cols and all_cols[c] != t:
                            raise ValueError(
                                f"column {c} type conflict across pattern streams"
                            )
                        all_cols[c] = t

                def _unify(df, s):
                    have = {x for x, _ in self.streams[s].columns}
                    proj = [F.lit(s).alias("__src")]
                    for c, t in all_cols.items():
                        proj.append(
                            (F.col(c) if c in have else F.lit(None).cast(t)).alias(c)
                        )
                    return df.select(*proj, "__seq", "__ts")

                ustream = _unify(stream, source)
                for k, s in enumerate(x for x in p_streams if x != source):
                    ps, pdir = self._mk_stream_feed(
                        s, n_chunks, sentinel_seq=10**9 + 1 + k
                    )
                    join_feed_dirs.append(pdir)
                    ustream = ustream.unionByName(_unify(ps, s))
                if q.pattern.absent is not None:
                    out = self._compile_absent_stream(q, ustream, watermark)
                else:
                    out = self._compile_pattern_stream(q, ustream, watermark)
                mode = "append"
            elif q.window is not None and q.window.kind == "time":
                # live time(d) window: stateful trailing-d buffer on the
                # app's logical clock; sentinel flushes the final retained
                # set (same final-state contract as the batch restatement)
                from ..streaming import pipelines as P

                w = q.window
                src_f = (
                    stream.filter(
                        F.expr(q.where) | (F.col("__seq") >= 10**9)
                    )
                    if q.where
                    else stream
                )
                retained = P.time_window_stream(src_f, int(w.params[0]))
                keys = [
                    g.strip() for g in (q.group_by or "").split(",") if g.strip()
                ]
                if is_agg:
                    aggs = [
                        F.expr(e).alias(a) if a else F.expr(e)
                        for e, a in q.select_items
                        if _is_agg_expr(e)
                    ]
                    out = P.group_agg_update_stream(retained, keys, aggs).select(
                        *[F.col(a or e) for e, a in q.select_items]
                    )
                    mode = "complete"
                else:
                    items = [
                        f"{e} AS {a}" if a else e for e, a in q.select_items
                    ]
                    out = retained.selectExpr(*items, "__seq")
                    mode = "append"
            elif q.window is not None and q.window.kind == "sort":
                # live sort(N, attr) window (sort_window_processor.rs:25):
                # stateful top-N comparator retention; the sentinel flushes
                # the FINAL retained set, which the final-state drain
                # consumes — both the passthrough and aggregate forms
                from ..streaming import pipelines as P

                w = q.window
                attr_spec = str(w.params[1]).split()
                attr = attr_spec[0]
                asc = not (
                    len(attr_spec) > 1 and attr_spec[1].lower() == "desc"
                )
                src_f = (
                    stream.filter(
                        F.expr(q.where) | (F.col("__seq") >= 10**9)
                    )
                    if q.where
                    else stream
                )
                retained = P.sort_window_stream(
                    src_f, int(w.params[0]), attr, asc
                )
                keys = [
                    g.strip() for g in (q.group_by or "").split(",") if g.strip()
                ]
                if is_agg:
                    aggs = [
                        F.expr(e).alias(a) if a else F.expr(e)
                        for e, a in q.select_items
                        if _is_agg_expr(e)
                    ]
                    out = P.group_agg_update_stream(retained, keys, aggs).select(
                        *[F.col(a or e) for e, a in q.select_items]
                    )
                    mode = "complete"
                else:
                    items = [
                        f"{e} AS {a}" if a else e for e, a in q.select_items
                    ]
                    out = retained.selectExpr(*items, "__seq")
                    mode = "append"
            elif q.window is not None and is_agg:
                from ..streaming import pipelines as P

                w = q.window
                aggs = [
                    F.expr(e).alias(a) if a else F.expr(e)
                    for e, a in q.select_items
                    if _is_agg_expr(e)
                ]
                keys = [g.strip() for g in (q.group_by or "").split(",") if g.strip()]
                if q.where:
                    # the flush sentinel must SURVIVE the predicate (its
                    # neutral values need not satisfy it) or the watermark
                    # never advances and no window ever emits; the
                    # sentinel's own far-future window never closes, so it
                    # stays invisible in the output
                    stream = stream.filter(
                        F.expr(q.where) | (F.col("__seq") >= 10**9)
                    )
                if w.kind == "tumbling":
                    out = P.tumbling_stream(
                        stream, f"{w.params[0]} milliseconds", keys, aggs,
                        ts_col="__ts", watermark=watermark,
                    )
                elif w.kind == "sliding":
                    out = P.sliding_stream(
                        stream, f"{w.params[0]} milliseconds",
                        f"{w.params[1]} milliseconds", keys, aggs,
                        ts_col="__ts", watermark=watermark,
                    )
                elif w.kind == "session":
                    out = P.session_stream(
                        stream, f"{w.params[0]} milliseconds", keys, aggs,
                        ts_col="__ts", watermark=watermark,
                    )
                elif w.kind == "cron":
                    # live cron(expr) window: the deterministic event-time
                    # restatement of the reference's wall-clock cron ticks
                    # (window/mod.rs:1742) — each event buckets to the NEXT
                    # tick of the schedule, computed Catalyst-side against
                    # the literal tick spine (events past the last tick
                    # stay buffered/unemitted, as in batch); running
                    # complete-mode aggregation per bucket
                    from .cron import Cron

                    cron = Cron(str(w.params[0]))
                    horizon = _EPOCH + datetime.timedelta(
                        seconds=self._seq + 61
                    )
                    cticks = cron.ticks(_EPOCH, horizon)
                    if not cticks:
                        raise ValueError(
                            f"cron {w.params[0]!r} fires nowhere in the "
                            "app horizon"
                        )
                    ticks_us = [
                        int(
                            t.replace(
                                tzinfo=datetime.timezone.utc
                            ).timestamp() * 1_000_000
                        )
                        for t in cticks
                    ]
                    ev_us = F.unix_micros(F.col("__ts").cast("timestamp"))
                    arr = F.array(
                        *[F.lit(t).cast("bigint") for t in ticks_us]
                    )
                    bucket = F.array_min(
                        F.filter(arr, lambda t: t >= ev_us)
                    )
                    out = (
                        stream.withColumn("__cron_bucket", bucket)
                        .filter(F.col("__cron_bucket").isNotNull())
                        .groupBy("__cron_bucket", *keys)
                        .agg(*aggs)
                    )
                elif w.kind == "lengthBatch":
                    # tumbling count window as a stateful op: emit + reset
                    # every N events; the feed's far-future sentinel row
                    # flushes the partial tail batch (no timer needed)
                    agg_items = [
                        (e, a) for e, a in q.select_items if _is_agg_expr(e)
                    ]
                    am = re.match(
                        r"\s*(SUM|AVG|MIN|MAX|COUNT)\s*\(\s*(\w+)\s*\)\s*$",
                        agg_items[0][0],
                        re.IGNORECASE,
                    ) if len(agg_items) == 1 and not keys else None
                    if am is None:
                        raise ValueError(
                            "streaming WINDOW('lengthBatch') supports a "
                            "single un-keyed SUM/AVG/MIN/MAX/COUNT aggregate"
                        )
                    src_f = (
                        stream.filter(
                            F.expr(q.where) | (F.col("__seq") >= 10**9)
                        ) if q.where else stream
                    )
                    out_name = agg_items[0][1] or "agg"
                    out = P.length_batch_stream(
                        src_f, int(w.params[0]), am.group(1).lower(),
                        am.group(2), out_name,
                    )
                    decl = dict(self.streams[target].columns)
                    if out_name in decl:
                        out = out.withColumn(
                            out_name, F.col(out_name).cast(decl[out_name])
                        )
                    out = out.withColumnRenamed("batch_id", "__seq")
                    mode = "append"
                elif w.kind == "length":
                    # per-arrival sliding count window as a stateful op; the
                    # drain keeps only the final emission to honor run()'s
                    # final-state contract (last N events' aggregate)
                    agg_items = [
                        (e, a) for e, a in q.select_items if _is_agg_expr(e)
                    ]
                    am = re.match(
                        r"\s*(SUM|AVG|MIN|MAX|COUNT)\s*\(\s*(\w+)\s*\)\s*$",
                        agg_items[0][0],
                        re.IGNORECASE,
                    ) if len(agg_items) == 1 and not keys else None
                    if am is None:
                        raise ValueError(
                            "streaming WINDOW('length') supports a single "
                            "un-keyed SUM/AVG/MIN/MAX/COUNT aggregate"
                        )
                    src_f = (
                        stream.filter(F.expr(q.where)) if q.where else stream
                    ).filter(F.col("__seq") < 10**9)
                    out_name = agg_items[0][1] or "agg"
                    out = P.length_window_stream(
                        src_f, int(w.params[0]), am.group(1).lower(),
                        am.group(2), out_name,
                    )
                    # cast the double emission to the declared target type
                    decl = dict(self.streams[target].columns)
                    if out_name in decl:
                        out = out.withColumn(
                            out_name, F.col(out_name).cast(decl[out_name])
                        )
                    qh = (
                        out.writeStream.format("memory").queryName(
                            f"__sqlstream_{target.lower()}"
                        ).outputMode("append").start()
                    )
                    qh.processAllAvailable()
                    qh.stop()
                    res = self.spark.sql(
                        f"SELECT * FROM __sqlstream_{target.lower()}"
                    ).orderBy("__seq").drop("__seq")
                    rows = [tuple(r) for r in res.collect()]
                    return rows[-1:]
                else:
                    raise ValueError(f"streaming WINDOW('{w.kind}') unsupported")
                if w.kind != "lengthBatch":
                    # time windows: strip window bounds; count windows keep
                    # their __seq (= batch id) for the ordered drain
                    out = out.select(*(keys + [a for a in
                        [c for c in out.columns if c not in keys
                         and not c.startswith(("window_", "session_", "__"))]]))
                # cron buckets re-aggregate as events arrive (no watermark
                # closes them) → complete-mode final state, like the
                # non-windowed running aggregation
                mode = "complete" if w.kind == "cron" else "append"
            elif not is_agg:
                stream_partners = [
                    j for j in q.joins if not self.streams[j[1]].is_table
                ]
                has_outer = any(j[0] != "inner" for j in stream_partners)
                if stream_partners and not has_outer:
                    # the driver sentinel must not join real partner rows
                    # (its neutral key values could collide); no event-time
                    # operator follows, so dropping it pre-join is safe
                    out = stream.filter(F.col("__seq") < 10**9).alias(q.source)
                else:
                    # outer joins keep the sentinel: the global watermark is
                    # the MIN across inputs, so the main feed must advance
                    # too or pads never flush (the join condition excludes
                    # sentinels from matching; pads are filtered post-join)
                    out = stream.alias(q.source)
                outer_projected = False
                for how, sname, cond, _trig in q.joins:
                    if self.streams[sname].is_table:
                        # stream-table enrichment joins: the bound table
                        # state broadcasts into every micro-batch (≙
                        # TableJoinProcessor's per-event compiled probe,
                        # table_join_processor.rs:17-137)
                        static = self.stream_df(sname).drop("__seq", "__ts")
                        out = out.join(
                            F.broadcast(static.alias(sname)), F.expr(cond), how
                        )
                        continue
                    # STREAM partner: second chunked file feed, real
                    # micro-batch stream-stream join (join_processor.rs's
                    # two live buffers ≙ Spark's symmetric join state).
                    # INNER emits eagerly per match — no watermark needed to
                    # flush. LEFT/RIGHT/FULL need an event-time bound (ON
                    # ... WITHIN d) so Spark can expire join state and emit
                    # the unmatched pads the reference's live outer joins
                    # produce (join_processor.rs:104-112).
                    within_ms = q.join_within.get(sname)
                    if how != "inner" and within_ms is None:
                        raise ValueError(
                            "streaming outer stream-stream joins need an "
                            "event-time bound: JOIN ... ON cond WITHIN d"
                        )
                    if how != "inner":
                        if len(q.joins) != 1:
                            raise ValueError(
                                "streaming outer stream-stream joins "
                                "support a single join"
                            )
                        out = self._join_outer_stream(
                            out, q, how, sname, cond, within_ms,
                            n_chunks, join_feed_dirs, watermark,
                        )
                        outer_projected = True
                        continue
                    pstream, pdir = self._mk_stream_feed(sname, n_chunks)
                    join_feed_dirs.append(pdir)
                    partner = (
                        pstream.filter(F.col("__seq") < 10**9)
                        .drop("__seq", "__ts")
                        .alias(sname)
                    )
                    if within_ms is not None:
                        us = within_ms * 1000
                        # keep the partner event time for the bound, under a
                        # name the SELECT items can't collide with
                        partner = (
                            pstream.filter(F.col("__seq") < 10**9)
                            .drop("__seq")
                            .withColumnRenamed("__ts", "__pts")
                            .alias(sname)
                        )
                        out = out.join(
                            partner,
                            F.expr(cond)
                            & (
                                F.abs(
                                    F.unix_micros("__ts")
                                    - F.unix_micros("__pts")
                                )
                                <= F.lit(us)
                            ),
                            how,
                        ).drop("__pts")
                        continue
                    out = out.join(partner, F.expr(cond), how)
                if not outer_projected:
                    # (an outer stream join already applied WHERE + the item
                    # projection — qualified refs must resolve before the
                    # pad-filter projection loses the join aliases)
                    if q.where:
                        out = out.filter(F.expr(q.where))
                    items = [
                        f"{e} AS {a}" if a else e for e, a in q.select_items
                    ]
                    if q.output_rate is not None:
                        # OUTPUT rate limiting runs INSIDE the live pipeline
                        # (ratelimit/*.rs at select_processor.rs:30-38) — a
                        # stateful counter / event-time bucket operator, not
                        # a post-hoc batch filter
                        from ..streaming.ratelimit import output_rate_stream

                        out = out.selectExpr(*items, "__seq", "__ts")
                        if stream_partners:
                            # the INNER join dropped the sentinels pre-join
                            # (neutral keys could match real rows), so the
                            # limiter gets its flush event from a dedicated
                            # one-row far-future feed unioned AFTER the join
                            # — the join+limiter composition the reference
                            # runs (select_processor.rs:30-38 applies the
                            # limiter downstream of any input)
                            out = out.unionByName(
                                self._mk_flush_feed(
                                    out.schema, join_feed_dirs, n_chunks
                                )
                            )
                        out = output_rate_stream(out, *q.output_rate).drop(
                            "__ts"
                        )
                    else:
                        out = out.selectExpr(*items, "__seq")
                elif q.output_rate is not None:
                    # outer join: sentinels flow THROUGH the join (their
                    # far-future pads both advance the limiter's buckets and
                    # flush pending state; __seq >= 10^9 keeps them uncounted)
                    from ..streaming.ratelimit import output_rate_stream

                    out = output_rate_stream(out, *q.output_rate)
                if outer_projected:
                    out = out.drop("__ts")
                mode = "append"
            else:
                # non-windowed GROUP BY: running aggregation. The reference
                # emits one row per touched group per chunk (update mode);
                # the drained FINAL state is what batch run() returns, so the
                # memory sink runs in complete mode (state fully rewritten
                # per trigger — same final rows, select_processor.rs:483-529)
                from ..streaming import pipelines as P

                keys = [g.strip() for g in (q.group_by or "").split(",") if g.strip()]
                aggs = [
                    F.expr(e).alias(a) if a else F.expr(e)
                    for e, a in q.select_items
                    if _is_agg_expr(e)
                ]
                src_f = stream.filter(F.expr(q.where)) if q.where else stream
                out = P.group_agg_update_stream(src_f, keys, aggs)
                sel = [
                    F.col(a or e) for e, a in q.select_items
                ]
                out = out.select(*sel)
                mode = "complete"

            qh = (
                out.writeStream.format("memory").queryName(name)
                .outputMode(mode).start()
            )
            qh.processAllAvailable()
            qh.stop()
            res = self.spark.sql(f"SELECT * FROM {name}")
            # drop sentinel artifacts (null-keyed rows / sentinel seq)
            if "__tick" in res.columns:
                # SNAPSHOT emission order: (tick[, window bucket], keys) —
                # matches the batch operator's row_number ordering
                rest = [c for c in res.columns if c != "__tick"]
                res = res.orderBy("__tick", *rest).drop("__tick", "__wb")
            elif "__seq" in res.columns:
                res = res.filter(F.col("__seq") < 10**9).orderBy("__seq").drop("__seq")
            else:
                first_out = res.columns[0]
                res = res.filter(F.col(first_out).isNotNull()).orderBy(*res.columns)
            return [tuple(r) for r in res.collect()]
        finally:
            shutil.rmtree(feed_dir, ignore_errors=True)
            for d in join_feed_dirs:
                shutil.rmtree(d, ignore_errors=True)

    def _join_outer_stream(
        self,
        out: DataFrame,
        q,
        how: str,
        sname: str,
        cond: str,
        within_ms: int,
        n_chunks: int,
        join_feed_dirs: list,
        watermark: str,
    ) -> DataFrame:
        """Streaming LEFT/RIGHT/FULL stream-stream join with an event-time
        bound (``ON cond WITHIN d``): both sides carry watermarks, the bound
        becomes the range condition Spark's symmetric join state needs to
        expire buffered rows, and unmatched rows surface as live null-pads
        once the watermark passes — the reference's outer-join emission
        (``join_processor.rs:104-112``, ``tests/app_runner_joins.rs:28-43``).

        Returns the FULLY projected stream (select items + ``__seq`` +
        ``__ts``, both coalesced across sides so pads keep an event time for
        a downstream rate limiter): the pad filter must run while the join
        aliases are still resolvable, so WHERE and the item projection
        happen here, not in the caller."""
        if within_ms >= 6 * 86_400_000:
            # sentinel timestamps sit 7 days apart so the bound itself keeps
            # them from ever matching (see below)
            raise ValueError(
                "streaming outer-join WITHIN bounds must be under 6 days"
            )
        # partner feed carries its own far-future sentinel: pads flush only
        # when BOTH sides' watermarks advance past the bound. The sentinel
        # must carry NON-NULL join-key strings: Spark pushes isnotnull(key)
        # below the partner's watermark node for outer joins, and a
        # null-keyed sentinel would be filtered at the scan — its watermark
        # contribution silently lost (observed: pads never flush). Matching
        # is instead prevented by the time bound: the two sentinels sit 7
        # days apart (offset derived from sentinel_seq), real rows ~10
        # years away.
        pstream, pdir = self._mk_stream_feed(
            sname, n_chunks, sentinel_seq=10**9 + 7,
            sentinel_strings="\x00sentinel",
        )
        join_feed_dirs.append(pdir)
        main = out.withWatermark("__ts", watermark)
        partner = (
            pstream.withColumnRenamed("__seq", "__pseq")
            .withColumnRenamed("__ts", "__pts")
            .withWatermark("__pts", watermark)
            .alias(sname)
        )
        # the canonical range form Spark's state-cleanup analyzer
        # recognizes (plain interval arithmetic on the two event-time
        # columns — wrapping them in unix_micros would defeat detection)
        bound = F.expr(
            f"__pts >= __ts - INTERVAL {within_ms} MILLISECONDS AND "
            f"__pts <= __ts + INTERVAL {within_ms} MILLISECONDS"
        )
        # NO sentinel-exclusion conjuncts here and NO in-plan pad filter:
        # any deterministic single-side predicate (like __seq < 10^9) gets
        # pushed below that side's watermark node, hiding the sentinel from
        # watermark tracking. Sentinel pads are dropped at the drain instead
        # (__seq >= 10^9 after the coalesce below).
        j = main.join(partner, F.expr(cond) & bound, how)
        if q.where:
            # the OR-guard keeps sentinel pads alive for a downstream rate
            # limiter's flush; it references BOTH sides' seq columns, so it
            # cannot be pushed below either watermark node (single-side
            # deterministic predicates would be). Sentinel rows still never
            # reach results — the drain filters __seq >= 10^9.
            j = j.filter(
                F.expr(q.where)
                | (F.col("__seq") >= 10**9)
                | (F.col("__pseq") >= 10**9)
            )
        items = [f"{e} AS {a}" if a else e for e, a in q.select_items]
        return j.selectExpr(
            *items,
            "coalesce(__seq, __pseq) AS __seq",
            "coalesce(__ts, __pts) AS __ts",
        )

    def _mk_flush_feed(
        self, schema, feed_dirs: list, n_chunks: int = 3
    ) -> DataFrame:
        """One-row far-future flush stream with the given schema (data
        columns neutral-valued, ``__seq`` = 10**9): the rate limiter's
        sentinel-as-data flush event for pipelines whose real feeds dropped
        their sentinels (the post-INNER-join composition — neutral sentinel
        keys could match real partner rows, so the join sides filter them
        and the flush re-enters downstream).

        The flush row must arrive strictly AFTER every real chunk (each
        file source advances one file per trigger, concurrently), so the
        feed leads with ``n_chunks`` empty prefix files — the flush file is
        only consumed once every real feed is exhausted."""
        import os
        import tempfile

        from pyspark.sql import types as T

        # type-correct NEUTRAL values (not NULLs): the limiter's packed
        # state round-trips through pandas astype, and a NaN in an integer
        # column would break the int cast
        def neutral(dt):
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                return 0
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return 0.0
            if isinstance(dt, T.BooleanType):
                return False
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                return _EPOCH
            if isinstance(dt, T.StringType):
                # a concrete value keeps the pandas->parquet dtype stable
                # (an all-None object column writes as a null/INT32 column
                # the file stream's string schema then rejects)
                return "\x00flush"
            return None

        vals = []
        for f in schema.fields:
            if f.name == "__seq":
                vals.append(10**9)
            elif f.name == "__ts":
                vals.append(_EPOCH + datetime.timedelta(days=3650))
            else:
                vals.append(neutral(f.dataType))
        d = tempfile.mkdtemp(prefix="efs_sqlflush_")
        feed_dirs.append(d)
        pdf = self.spark.createDataFrame([tuple(vals)], schema).toPandas()
        for i in range(n_chunks):
            pdf.iloc[0:0].to_parquet(
                os.path.join(d, f"c{i:03d}.parquet"), index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )
        pdf.to_parquet(
            os.path.join(d, f"c{n_chunks:03d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    def _mk_stream_feed(
        self,
        sname: str,
        n_chunks: int,
        sentinel_seq=None,
        sentinel_strings: str | None = None,
    ):
        """Materialize a stream's sent rows as a chunked parquet feed and
        open it as a file stream — a secondary input of a stream-stream
        join or multi-stream pattern (each input is its own micro-batch
        source, the AppRunner multi-stream send() analog).

        ``sentinel_seq``: when set, a far-future sentinel row is appended
        (with that __seq) — required whenever the feed joins an event-time
        operator, because a union's/join's watermark is the MIN across
        inputs and a sentinel-less input would hold it back forever. The
        sentinel's timestamp is offset by ``sentinel_seq - 10**9`` days
        beyond the base far-future point, so every feed's sentinel is
        temporally distinct (outer-join time bounds then exclude
        sentinel-sentinel matches structurally).

        ``sentinel_strings``: value for the sentinel's string columns
        (default NULL). Outer joins need NON-NULL values here — Spark
        pushes ``isnotnull(join_key)`` below the watermark node, and a
        null-keyed sentinel would be dropped at the scan, silently losing
        its watermark contribution."""
        import os
        import tempfile

        base = self._base_df(sname).toPandas()
        if len(base) == 0 and sentinel_seq is None:
            # an empty JOIN partner must behave like the batch path (INNER
            # join over no partner rows = empty result, join_processor.rs
            # buffers nothing) — feed a sentinel-only stream; the caller
            # filters __seq >= 10**9 before joining, so the partner side is
            # empty and the join correctly yields zero rows
            sentinel_seq = 2 * 10**9
        if sentinel_seq is not None:
            defaults = {"string": sentinel_strings, "int": 0, "bigint": 0,
                        "float": 0.0, "double": 0.0, "boolean": False,
                        "timestamp": _EPOCH}
            vals = {c: defaults.get(t) for c, t in self.streams[sname].columns}
            # per-feed distinct far-future ts (offset capped for the
            # 2*10**9 empty-partner sentinel)
            off = min(max(sentinel_seq - 10**9, 0), 30)
            sent = pd.DataFrame(
                [{**vals, "__seq": sentinel_seq,
                  "__ts": _EPOCH + datetime.timedelta(days=3650 + off)}]
            )
            base = pd.concat([base, sent], ignore_index=True).astype(
                base.dtypes.to_dict()
            )
        d = tempfile.mkdtemp(prefix=f"efs_sqljoin_{sname.lower()}_")
        chunks = max(1, min(n_chunks, len(base)))
        bounds = [round(i * len(base) / chunks) for i in range(chunks + 1)]
        for i in range(chunks):
            base.iloc[bounds[i]: bounds[i + 1]].to_parquet(
                os.path.join(d, f"c{i:03d}.parquet"), index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )
        schema = self._base_df(sname).schema
        stream = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        return stream, d

    def _compile_absent_stream(self, q: QueryDef, ustream, watermark: str):
        """Live ``PATTERN (e1=S[c] -> NOT S2[c2] FOR d)`` (VERDICT r4 #6):
        the state timeout in :func:`cep.streaming.match_absent_stream` plays
        the reference's designed-but-never-built TimerWheel
        (``PATTERN_PROCESSING.md:34-38``) — triggers emit once the watermark
        proves the absent window empty. Flags/selects mirror the batch
        ``_run_absent_pattern`` so streaming rows equal the replay."""
        from ..cep.streaming import match_absent_stream

        p = q.pattern
        if len(p.steps) != 1:
            raise ValueError(
                "absent patterns support one trigger step: "
                "PATTERN (e1=S[cond] -> NOT S2[cond] FOR d)"
            )
        trig = p.steps[0]
        ab_stream, ab_cond, for_ms = p.absent
        if q.partition_keys:
            key_cols = set(q.partition_keys.values())
            if len(key_cols) != 1:
                raise ValueError(
                    "pattern PARTITION keys must share one column name"
                )
            key_expr = F.col(next(iter(key_cols))).cast("string")
        else:
            key_expr = F.lit("__global__")
        trig_flag = (F.col("__src") == trig.stream) & (F.col("__seq") < 10**9)
        if trig.condition:
            trig_flag = trig_flag & F.expr(trig.condition)
        ab_flag = (F.col("__src") == ab_stream) & (F.col("__seq") < 10**9)
        if ab_cond:
            ab_flag = ab_flag & F.expr(ab_cond)
        df = (
            ustream.withColumn("conv_id", key_expr)
            .withColumn("turn_idx", F.col("__seq").cast("int"))
            .withColumn("ts", F.col("__ts"))
            .withColumn("__is_trig", trig_flag)
            .withColumn("__is_abs", ab_flag)
        )
        select_plan, referenced, agg_emits, index_emits = _pattern_select_plan(
            q.select_items, p.steps
        )
        if any(agg_emits.values()) or any(index_emits.values()):
            raise ValueError(
                "absent patterns support plain e1.col select items"
            )
        emit = tuple(sorted({"turn_idx", *referenced[trig.alias]}))
        out = match_absent_stream(
            df, "__is_trig", "__is_abs",
            pd.Timedelta(milliseconds=for_ms),
            emit_cols=emit, watermark_delay=watermark,
        )
        for c in emit:
            out = out.withColumnRenamed(c, f"{trig.alias}_{c}")
        out = out.withColumnRenamed("ts", f"{trig.alias}_ts")
        return out.select(
            *[F.col(src).alias(o) for src, o in select_plan],
            F.col(f"{trig.alias}_turn_idx").cast("bigint").alias("__seq"),
        )

    def _compile_pattern_stream(self, q: QueryDef, stream, watermark: str):
        from ..cep.streaming import match_pattern_stream

        p = q.pattern
        # PARTITION WITH (key OF Stream) → per-key NFA instances: the key
        # column becomes the applyInPandasWithState grouping key, so every
        # partition gets its own pattern state (the batch path's key_expr
        # construction; watermark stays GLOBAL — sentinels still flush every
        # key's pending state)
        if q.partition_keys:
            key_cols = set(q.partition_keys.values())
            if len(key_cols) != 1:
                raise ValueError(
                    "pattern PARTITION keys must share one column name, got "
                    f"{sorted(key_cols)}"
                )
            key_expr = F.col(next(iter(key_cols))).cast("string")
        else:
            key_expr = F.lit("__global__")
        df = stream.withColumn("conv_id", key_expr).withColumn(
            "turn_idx", F.col("__seq").cast("int")
        ).withColumn("ts", F.col("__ts"))
        select_plan, referenced, agg_emits, index_emits = _pattern_select_plan(
            q.select_items, p.steps
        )
        steps = []
        data_cols = {c for c in df.columns if not c.startswith("__")} - {
            "conv_id", "turn_idx", "ts"
        }
        for sdef in p.steps:
            flag = f"__is_{sdef.alias}"
            cond = F.lit(True)
            cross = None
            if sdef.condition:
                if _EREF_RE.search(sdef.condition):
                    # cross-step refs (e2[x > e1.x]) compile to a closure
                    # evaluated inside the (shared batch/streaming) NFA
                    # replay core — same contract as the batch path
                    cross = _compile_cross_pred(sdef.condition)
                    for em in _EREF_RE.finditer(sdef.condition):
                        if em.group(1) != sdef.alias:
                            referenced[em.group(1)].add(em.group(2))
                    for bare in re.finditer(
                        r"\b(?<!\.)(\w+)\b", _EREF_RE.sub(" ", sdef.condition)
                    ):
                        if bare.group(1) in data_cols:
                            referenced[sdef.alias].add(bare.group(1))
                else:
                    cond = F.expr(sdef.condition)
            if "__src" in df.columns:
                cond = cond & (F.col("__src") == sdef.stream)
            df = df.withColumn(flag, cond & F.col("__seq").isNotNull() & (F.col("__seq") < 10**9))
            steps.append((sdef, flag, cross))
        # Steps are constructed AFTER the condition scan: a later step's
        # cross-ref (e2[x > e1.x]) extends e1's emit set, so building e1's
        # Step eagerly would drop the referenced column
        steps = [
            Step(
                sdef.alias, flag, sdef.min_count, sdef.max_count,
                cross_pred=cross,
                emit=tuple(sorted(referenced[sdef.alias])),
                agg_emit=tuple(sorted(agg_emits[sdef.alias])),
                index_emit=tuple(
                    sorted(index_emits[sdef.alias], key=lambda t: (str(t[0]), t[1]))
                ),
            )
            for sdef, flag, cross in steps
        ]
        spec = PatternSpec(
            steps=tuple(steps),
            within=pd.Timedelta(milliseconds=p.within_ms) if p.within_ms else None,
            every=p.every,
        )
        m = match_pattern_stream(df, spec, watermark_delay=watermark)
        last = spec.steps[-1].name
        return m.select(
            *[F.col(src).alias(o) for src, o in select_plan],
            F.col(f"{last}_turn_idx").cast("bigint").alias("__seq"),
        )

    # -- query compilation ----------------------------------------------------

    def _run_query(self, q: QueryDef, stack: frozenset) -> DataFrame:
        if q.pattern is not None:
            return self._run_pattern_query(q, stack)
        if q.output_rate is not None and q.output_rate[0] == "SNAPSHOT":
            return self._run_snapshot_query(q, stack)
        return self._run_select_query(q, stack)

    def _run_snapshot_query(self, q: QueryDef, stack: frozenset) -> DataFrame:
        """OUTPUT SNAPSHOT EVERY d (snapshot_output_rate.rs): every d ticks
        emit the FULL current aggregate state — restated on the app's event
        clock as per-tick cumulative aggregates (operators/output.py)."""
        from ..operators import output as OUT

        if not (q.group_by or any(_AGG_RE.search(e) for e, _ in q.select_items)):
            raise ValueError("OUTPUT SNAPSHOT requires an aggregating query")
        if q.window is not None and q.window.kind != "tumbling":
            raise ValueError(
                "OUTPUT SNAPSHOT supports non-windowed or tumbling-windowed "
                "aggregating queries"
            )
        df = self.stream_df(q.source, stack | {q.target})
        if q.where:
            df = df.filter(F.expr(q.where))
        keys = [g.strip() for g in (q.group_by or "").split(",") if g.strip()]
        if q.window is not None:
            # SNAPSHOT over a tumbling window = the window bucket joins the
            # aggregation key (partials-over-buckets decomposition, VERDICT
            # r4 #5): at tick t the full per-(bucket, keys) state over
            # events with ts <= t emits — closed buckets show final values,
            # the open bucket its partial state
            wms = int(q.window.params[0])
            df = df.withColumn(
                "__wb",
                F.floor(
                    F.col("__ts").cast("timestamp_ltz").cast("double")
                    * 1000.0
                    / F.lit(float(wms))
                ).cast("bigint"),
            )
            keys = ["__wb"] + keys
        aggs = [(e, a or e) for e, a in q.select_items if _AGG_RE.search(e)]
        interval_ms = q.output_rate[1]
        end = _EPOCH + datetime.timedelta(seconds=max(self._seq, 1))
        out = OUT.output_snapshot_agg(
            df, interval_ms, "__ts", keys, aggs, _EPOCH, end
        )
        sel = [F.col(a or e) for e, a in q.select_items]
        order = [F.col("tick")] + [F.col(k) for k in keys]
        return out.select(
            *sel,
            F.row_number().over(Window.orderBy(*order)).alias("__seq"),
            F.col("tick").cast("timestamp").alias("__ts"),
        )

    def _run_absent_pattern(self, q: QueryDef, stack: frozenset) -> DataFrame:
        """``PATTERN (e1=S[cond] -> NOT S2[cond2] FOR d)``: emit each
        trigger event with NO matching absent-stream event in
        ``(trigger.ts, trigger.ts + d]``. The reference only DESIGNED this
        (``PATTERN_PROCESSING.md:34-38`` — "NOT A FOR duration, requires
        TimerWheel"); the execution is ``cep.batch.match_absent_batch``'s
        single-exchange vectorized probe."""
        p: PatternDef = q.pattern
        if len(p.steps) != 1:
            raise ValueError(
                "absent patterns support one trigger step: "
                "PATTERN (e1=S[cond] -> NOT S2[cond] FOR d)"
            )
        from ..cep.batch import match_absent_batch

        trig = p.steps[0]
        ab_stream, ab_cond, for_ms = p.absent
        streams = [trig.stream, ab_stream]
        all_cols: dict[str, str] = {}
        for s in dict.fromkeys(streams):
            for c, t in self.streams[s].columns:
                if c in all_cols and all_cols[c] != t:
                    raise ValueError(
                        f"column {c} type conflict across pattern streams"
                    )
                all_cols[c] = t
        union = None
        for s in dict.fromkeys(streams):
            df = self.stream_df(s, stack)
            have = {x for x, _ in self.streams[s].columns}
            proj = [F.lit(s).alias("__src")]
            proj += [
                (F.col(c) if c in have else F.lit(None).cast(t)).alias(c)
                for c, t in all_cols.items()
            ]
            proj += [F.col("__seq"), F.col("__ts")]
            part = df.select(*proj)
            union = part if union is None else union.unionByName(part)

        if q.partition_keys:
            key_cols = set(q.partition_keys.values())
            if len(key_cols) != 1:
                raise ValueError(
                    "pattern PARTITION keys must share one column name"
                )
            key_expr = F.col(next(iter(key_cols))).cast("string")
        else:
            key_expr = F.lit("__global__")
        trig_flag = F.col("__src") == trig.stream
        if trig.condition:
            trig_flag = trig_flag & F.expr(trig.condition)
        ab_flag = F.col("__src") == ab_stream
        if ab_cond:
            ab_flag = ab_flag & F.expr(ab_cond)
        union = (
            union.withColumn("conv_id", key_expr)
            .withColumn("turn_idx", F.col("__seq").cast("int"))
            .withColumn("ts", F.col("__ts"))
            .withColumn("__is_trig", trig_flag)
            .withColumn("__is_abs", ab_flag)
        )

        select_plan, referenced, agg_emits, index_emits = _pattern_select_plan(
            q.select_items, p.steps
        )
        if any(agg_emits.values()) or any(index_emits.values()):
            raise ValueError(
                "absent patterns support plain e1.col select items"
            )
        emit = tuple(sorted({"turn_idx", *referenced[trig.alias]}))
        out = match_absent_batch(
            union, "__is_trig", "__is_abs",
            pd.Timedelta(milliseconds=for_ms),
            order_cols=("ts", "turn_idx"), emit_cols=emit,
        )
        # the matcher emits trigger columns under their plain names; the
        # select plan expects alias-qualified ones
        for c in emit:
            out = out.withColumnRenamed(c, f"{trig.alias}_{c}")
        out = out.withColumnRenamed("ts", f"{trig.alias}_ts")
        out_cols = [F.col(src).alias(o) for src, o in select_plan]
        return out.select(
            *out_cols,
            F.col(f"{trig.alias}_turn_idx").cast("bigint").alias("__seq"),
            F.col(f"{trig.alias}_ts").alias("__ts"),
        )

    def _register(self, name: str, stack: frozenset) -> None:
        self.stream_df(name, stack).createOrReplaceTempView(name)

    def _run_select_query(self, q: QueryDef, stack: frozenset) -> DataFrame:
        self._register(q.source, stack)
        for _, s, _, _ in q.joins:
            self._register(s, stack)

        is_agg = bool(q.group_by) or any(
            _is_agg_expr(e) for e, _ in q.select_items
        )
        items = [f"{e} AS {a}" if a else e for e, a in q.select_items]
        pkey = q.partition_keys.get(q.source)  # PARTITION WITH key, if any

        src = q.source
        where = f" WHERE {q.where}" if q.where else ""
        group = ""
        # named/shared window: FROM <window-stream> inherits its definition
        # (window_runtime.rs shared-buffer semantics — every reader sees the
        # same windowed contents)
        window = q.window
        sdef = self.streams.get(q.source)
        if window is None and sdef is not None and sdef.shared_window is not None:
            window = sdef.shared_window
        if window is not None:
            w = window
            if w.kind == "tumbling":
                win = f"window(__ts, '{w.params[0]} milliseconds')"
            elif w.kind == "sliding":
                win = (
                    f"window(__ts, '{w.params[0]} milliseconds',"
                    f" '{w.params[1]} milliseconds')"
                )
            elif w.kind == "session":
                win = f"session_window(__ts, '{w.params[0]} milliseconds')"
            elif w.kind == "externalTimeBatch":
                # externalTimeBatch(ts_attr, d) (reference window/mod.rs
                # externalTimeBatch): tumbling batches keyed on a DATA
                # timestamp column instead of arrival time
                attr, d = w.params[0], w.params[1]
                win = f"window(cast({attr} AS timestamp), '{d} milliseconds')"
            elif w.kind == "externalTime":
                # externalTime(ts_attr, d): sliding expiry driven by the
                # data timestamp — final retained set = events within d of
                # the max surviving data time (same restatement as
                # WINDOW('time') but on the declared attribute)
                attr, d_ms = w.params[0], w.params[1]
                src = (
                    f"(SELECT * FROM {q.source}{where}"
                    + (" AND " if where else " WHERE ")
                    + f"unix_micros(cast({attr} AS timestamp_ltz)) > "
                    f"(SELECT max(unix_micros(cast({attr} AS timestamp_ltz)))"
                    f" FROM {q.source}{where}) - {d_ms * 1000})"
                )
                where = ""
                win = None
            elif w.kind == "cron":
                # cron window (window/mod.rs:1742): the buffered batch emits
                # at every cron tick — batch restatement: each event belongs
                # to the NEXT tick of the schedule (sql/cron.py); events
                # after the final tick stay buffered (unemitted)
                from .cron import Cron

                cron = Cron(str(w.params[0]))
                horizon = _EPOCH + datetime.timedelta(seconds=self._seq + 61)
                ticks = [(t,) for t in cron.ticks(_EPOCH, horizon)]
                if not ticks:
                    raise ValueError(
                        f"cron {w.params[0]!r} fires nowhere in the app horizon"
                    )
                self.spark.createDataFrame(
                    ticks, "tick timestamp"
                ).createOrReplaceTempView("__cron_ticks")
                src = (
                    f"(SELECT *, (SELECT min(tick) FROM __cron_ticks"
                    f" WHERE tick >= __ts) AS __cron_bucket FROM {q.source})"
                )
                bucket_ok = "__cron_bucket IS NOT NULL"
                where = (
                    f" WHERE ({q.where}) AND {bucket_ok}"
                    if q.where
                    else f" WHERE {bucket_ok}"
                )
                win = "__cron_bucket"
            elif w.kind == "lengthBatch":
                # tumbling count window (window/mod.rs:645-963): consecutive
                # batches of N per arrival order (partial tail included),
                # aggregated per batch — row_number bucketing, one window
                # pass + hash agg
                n = w.params[0]
                part = f"PARTITION BY {pkey} " if pkey else ""
                src = (
                    f"(SELECT *, cast(floor((row_number() OVER ({part}ORDER BY"
                    f" __seq) - 1) / {n}) AS INT) AS __batch"
                    f" FROM {q.source}{where})"
                )
                where = ""
                win = "__batch"
            elif w.kind == "sort":
                # sort(N, 'attr [asc|desc]') — keep the N best events under
                # the comparator, evict the worst
                # (sort_window_processor.rs:25); final retained set == batch
                # top-K via row_number, __seq tiebreak keeps it deterministic
                n = w.params[0]
                attr_spec = str(w.params[1]).split()
                attr = attr_spec[0]
                direction = (
                    "DESC"
                    if len(attr_spec) > 1 and attr_spec[1].lower() == "desc"
                    else "ASC"
                )
                part = f"PARTITION BY {pkey} " if pkey else ""
                src = (
                    f"(SELECT * FROM (SELECT *, row_number() OVER ({part}"
                    f"ORDER BY {attr} {direction}, __seq) AS __rk"
                    f" FROM {q.source}{where}) WHERE __rk <= {n})"
                )
                where = ""
                win = None
            elif w.kind == "time":
                # time(d) sliding window (reference window/mod.rs time
                # window: events expire d after arrival). On the app's
                # deterministic logical clock the FINAL retained set — what
                # run()'s final-state drain sees, same contract as
                # WINDOW('length') — is every event within d of the LAST
                # arrival; a scalar-subquery max anchors the bound
                d_ms = w.params[0]
                src = (
                    f"(SELECT * FROM {q.source}{where}"
                    + (" AND " if where else " WHERE ")
                    + f"unix_micros(cast(__ts AS timestamp_ltz)) > "
                    f"(SELECT max(unix_micros(cast(__ts AS timestamp_ltz)))"
                    f" FROM {q.source}{where}) - {d_ms * 1000})"
                )
                where = ""
                win = None
            elif w.kind == "length" and not is_agg:
                # passthrough length window → Current+Expired changelog
                # (app_runner_windows.rs:25-45 contract)
                return self._length_changelog(q, w.params[0])
            elif w.kind == "length":
                n = w.params[0]
                part = f"PARTITION BY {pkey} " if pkey else ""
                src = (
                    f"(SELECT * FROM (SELECT *, row_number() OVER ({part}ORDER BY"
                    f" __seq DESC) AS __rn FROM {q.source}{where}) WHERE __rn <= {n})"
                )
                where = ""
                win = None
            else:
                # user window factory (functions/extensions.py ≙
                # eventflux_manager.rs:272-278 add_window_factory +
                # WindowProcessorFactory lookup): the factory transforms the
                # source stream into the window's retained contents
                from ..functions import extensions as ext

                factory = ext.get_window_factory(w.kind)
                if factory is None:
                    raise ValueError(
                        f"WINDOW('{w.kind}') unsupported in the SQL layer — "
                        "use the DataFrame operators (operators/windows.py) "
                        "or register an extension via add_window_factory"
                    )
                src_df = self.spark.table(q.source)
                if q.where:
                    # filter precedes the window, as in the reference chain
                    src_df = src_df.filter(F.expr(q.where))
                    where = ""
                wdf = factory(src_df, list(w.params), pkey)
                view = f"__extwin_{q.target.lower()}"
                wdf.createOrReplaceTempView(view)
                src = view
                win = None
                if q.group_by:
                    group = f" GROUP BY {q.group_by}"
                    if pkey:
                        group += f", {pkey}"
            if win is not None:
                if not is_agg:
                    raise ValueError("time windows require aggregation in SQL layer")
                group = f" GROUP BY {win}"
                if q.group_by:
                    group += f", {q.group_by}"
                if pkey:
                    group += f", {pkey}"
        elif q.group_by:
            group = f" GROUP BY {q.group_by}"
            if pkey:
                group += f", {pkey}"
        elif pkey and is_agg:
            # PARTITION WITH around a bare aggregate = per-key aggregation
            # (reference partition/mod.rs:9 per-key query instances; note:
            # the reference's own partition_sum test leaks state across keys
            # — tests/app_runner_partitions.rs:64-71 asserts [1,3,6] — we
            # implement the DOCUMENTED per-key isolation instead)
            group = f" GROUP BY {pkey}"

        carry_seq = not is_agg
        sel = ", ".join(items)
        if carry_seq:
            # emission seq follows the DRIVING side: right-unidirectional
            # joins emit on right arrivals (join_input_stream.rs:23-28)
            driver = q.source
            for _, s, _, trig in q.joins:
                if trig == "right":
                    driver = s
            seq_src = f"{driver}.__seq" if q.joins else "__seq"
            sel += f", {seq_src} AS __seq, "
            seq_ts = f"{driver}.__ts" if q.joins else "__ts"
            sel += f"{seq_ts} AS __ts"

        join_parts = []
        for how, s, cond, trig in q.joins:
            if s in q.join_within:
                # event-time bound (ON ... WITHIN d): identical predicate in
                # batch and streaming so the two modes stay row-identical
                us = q.join_within[s] * 1000
                cond = (
                    f"({cond}) AND abs(unix_micros({q.source}.__ts) - "
                    f"unix_micros({s}.__ts)) <= {us}"
                )
            if trig == "left":
                # only LEFT arrivals emit: the left event must arrive after
                # the right one was buffered
                cond = f"({cond}) AND {q.source}.__seq > {s}.__seq"
            elif trig == "right":
                cond = f"({cond}) AND {s}.__seq > {q.source}.__seq"
            join_parts.append(
                f" {how.upper().replace('_', ' ')} JOIN {s} ON {cond}"
            )
        join_sql = "".join(join_parts)
        sql = f"SELECT {sel} FROM {src}{join_sql}{where}{group}"
        if q.having:
            sql += f" HAVING {q.having}"
        if q.order_by:
            sql += f" ORDER BY {q.order_by}"
        if q.limit is not None:
            sql += f" LIMIT {q.limit}"
        if q.offset is not None:
            sql += f" OFFSET {q.offset}"
        out = self.spark.sql(sql)

        if not carry_seq:
            # aggregates get fresh emission seqs in deterministic group order
            out = out.withColumn(
                "__seq",
                F.row_number().over(Window.orderBy(*out.columns)) + F.lit(self._seq),
            ).withColumn("__ts", F.lit(_EPOCH).cast("timestamp"))
        elif q.order_by:
            # ORDER BY defines the emission order of the output chunk
            # (order_by_event_comparator.rs applied at select_processor.rs:531)
            order_cols = []
            for item in q.order_by.split(","):
                item = item.strip()
                if item.upper().endswith(" DESC"):
                    order_cols.append(F.expr(item[:-5].strip()).desc())
                else:
                    order_cols.append(F.expr(re.sub(r"\s+ASC$", "", item, flags=re.IGNORECASE)))
            out = out.drop("__seq").withColumn(
                "__seq", F.row_number().over(Window.orderBy(*order_cols))
            )
        if q.output_rate is not None:
            mode, value, unit = q.output_rate
            if unit == "EVENTS":
                out = out.withColumn(
                    "__rn", F.row_number().over(Window.orderBy("__seq"))
                )
                if mode == "ALL":
                    # complete n-blocks only; trailing partial block stays
                    # buffered (events_output_rate.rs ALL behavior)
                    total = out.withColumn(
                        "__n", F.count(F.lit(1)).over(Window.partitionBy())
                    )
                    out = total.filter(
                        F.col("__rn") <= F.floor(F.col("__n") / value) * value
                    ).drop("__rn", "__n")
                else:
                    # FIRST via 0-based position: EVERY 1 emits every event
                    keep = (
                        ((F.col("__rn") - 1) % value == 0)
                        if mode == "FIRST"
                        else (F.col("__rn") % value == 0)
                    )
                    out = out.filter(keep).drop("__rn")
            else:  # TIME (time_output_rate.rs): d-wide buckets of event time
                if mode != "ALL":
                    bucket = F.floor(
                        F.col("__ts").cast("timestamp_ltz").cast("double")
                        * 1000 / value
                    )
                    order = (
                        F.col("__seq").asc() if mode == "FIRST" else F.col("__seq").desc()
                    )
                    out = out.withColumn(
                        "__rn", F.row_number().over(Window.partitionBy(bucket).orderBy(order))
                    ).filter(F.col("__rn") == 1).drop("__rn")
                # ALL EVERY d TIME: every buffered event emits at the next
                # tick — batch restatement is a passthrough
        return out

    def _length_changelog(self, q: QueryDef, n: int) -> DataFrame:
        """WINDOW('length', N) passthrough: emit Current rows plus Expired
        eviction records, expired-before-current within an arrival."""
        from ..operators.windows import length_window_changelog

        df = self.stream_df(q.source)
        if q.where:
            df = df.filter(F.expr(q.where))
        pkey = q.partition_keys.get(q.source)
        out = length_window_changelog(
            df, n, order_cols=["__seq"], keys=[pkey] if pkey else None
        )
        items = [
            F.expr(e).alias(a) if a else F.expr(e) for e, a in q.select_items
        ]
        return out.select(
            *items, F.col("emit_seq").alias("__seq"), F.col("__ts")
        )

    # -- pattern queries ---------------------------------------------------

    def _run_pattern_query(self, q: QueryDef, stack: frozenset) -> DataFrame:
        p: PatternDef = q.pattern
        if p.absent is not None:
            return self._run_absent_pattern(q, stack)
        stream_names = [s.stream for s in p.steps]
        all_cols: dict[str, str] = {}
        for s in dict.fromkeys(stream_names):
            for c, t in self.streams[s].columns:
                if c in all_cols and all_cols[c] != t:
                    raise ValueError(f"column {c} type conflict across pattern streams")
                all_cols[c] = t

        union = None
        for s in dict.fromkeys(stream_names):
            df = self.stream_df(s, stack)
            proj = [F.lit(s).alias("__src")]
            for c, t in all_cols.items():
                proj.append(
                    (F.col(c) if c in [x for x, _ in self.streams[s].columns]
                     else F.lit(None).cast(t)).alias(c)
                )
            proj += [F.col("__seq"), F.col("__ts")]
            part = df.select(*proj)
            union = part if union is None else union.unionByName(part)

        # PARTITION WITH (key OF Stream) → per-key NFA instances; without a
        # partition the pattern is global (single key). The reference's
        # patterns are global by default; PARTITION wraps them per key
        # (partition/parser.rs:14, app_runner_partitions.rs).
        if q.partition_keys:
            key_cols = set(q.partition_keys.values())
            if len(key_cols) != 1:
                raise ValueError(
                    "pattern PARTITION keys must share one column name, got "
                    f"{sorted(key_cols)}"
                )
            key_expr = F.col(next(iter(key_cols))).cast("string")
        else:
            key_expr = F.lit("__global__")
        union = (
            union.withColumn("conv_id", key_expr)
            .withColumn("turn_idx", F.col("__seq").cast("int"))
            .withColumn("ts", F.col("__ts"))
        )

        select_plan, referenced, agg_emits, index_emits = _pattern_select_plan(
            q.select_items, p.steps
        )

        steps = []
        for sdef in p.steps:
            flag = f"__is_{sdef.alias}"
            cond_expr = F.col("__src") == sdef.stream
            cross = None
            if sdef.condition:
                if _EREF_RE.search(sdef.condition):
                    cross = _compile_cross_pred(sdef.condition)
                    for em in _EREF_RE.finditer(sdef.condition):
                        if em.group(1) != sdef.alias:
                            referenced[em.group(1)].add(em.group(2))
                    for bare in re.finditer(r"\b(?<!\.)(\w+)\b", _EREF_RE.sub(" ", sdef.condition)):
                        if bare.group(1) in all_cols:
                            referenced[sdef.alias].add(bare.group(1))
                else:
                    cond_expr = cond_expr & F.expr(sdef.condition)
            union = union.withColumn(flag, cond_expr)
            steps.append((sdef, flag, cross))

        spec = PatternSpec(
            steps=tuple(
                Step(
                    sdef.alias,
                    flag,
                    sdef.min_count,
                    sdef.max_count,
                    cross_pred=cross,
                    emit=tuple(sorted(referenced[sdef.alias])),
                    agg_emit=tuple(sorted(agg_emits[sdef.alias])),
                    index_emit=tuple(
                        sorted(index_emits[sdef.alias], key=lambda t: (str(t[0]), t[1]))
                    ),
                )
                for sdef, flag, cross in steps
            ),
            within=pd.Timedelta(milliseconds=p.within_ms) if p.within_ms else None,
            every=p.every,
        )
        m = match_pattern_batch(union, spec)
        out_cols = [F.col(src).alias(out) for src, out in select_plan]
        last = spec.steps[-1].name
        return m.select(
            *out_cols,
            F.col(f"{last}_turn_idx").cast("bigint").alias("__seq"),
            F.col(f"{last}_ts").alias("__ts"),
        )


def _pattern_select_plan(select_items, steps):
    """Parse a pattern SELECT list shared by the batch and streaming
    compilers. Supports ``alias.col``/``Stream.col``, indexed chain access
    ``alias[i].col`` / ``alias[last].col``
    (indexed_variable_executor.rs:67) and collection aggregates
    ``count(e1)`` / ``sum|min|max|avg(e1.col)``
    (collection_aggregation_executor.rs:141-696).

    Returns (select_plan [(emitted column, output name)], referenced,
    agg_emits, index_emits) — the three dicts keyed by step alias and
    mutable (the batch compiler adds cross-predicate references later).
    """
    referenced: dict[str, set] = {s.alias: set() for s in steps}
    agg_emits: dict[str, set] = {s.alias: set() for s in steps}
    index_emits: dict[str, set] = {s.alias: set() for s in steps}
    stream_to_alias: dict[str, str] = {}
    for s in steps:
        stream_to_alias.setdefault(s.stream, s.alias)

    def map_ref(name: str, col: str) -> tuple[str, str]:
        if name in referenced:
            return name, col
        if name in stream_to_alias:
            return stream_to_alias[name], col
        raise ValueError(f"unknown pattern reference {name}.{col}")

    select_plan: list[tuple[str, str]] = []
    for expr, alias in select_items:
        expr = expr.strip()
        im = re.fullmatch(r"(\w+)\[(\d+|last)\]\.(\w+)", expr, re.IGNORECASE)
        if im:
            a, _ = map_ref(im.group(1), im.group(3))
            idx = im.group(2).lower()
            idx = idx if idx == "last" else int(idx)
            c = im.group(3)
            index_emits[a].add((idx, c))
            select_plan.append((f"{a}_at{idx}_{c}", alias or f"{a}_at{idx}_{c}"))
            continue
        am = re.fullmatch(
            r"(count|sum|min|max|avg)\s*\(\s*(\w+)(?:\.(\w+))?\s*\)",
            expr,
            re.IGNORECASE,
        )
        if am and (am.group(2) in referenced or am.group(2) in stream_to_alias):
            fn = am.group(1).lower()
            c = am.group(3)
            if c is None:
                if fn != "count":
                    raise ValueError(f"collection {fn} needs a column: {expr!r}")
                c = "turn_idx"
            a, c = map_ref(am.group(2), c)
            agg_emits[a].add((fn, c))
            select_plan.append((f"{a}_{fn}_{c}", alias or f"{fn}_{a}"))
            continue
        rm = re.fullmatch(r"(\w+)\.(\w+)", expr)
        if not rm:
            raise ValueError(
                "pattern SELECT supports alias.col, alias[i].col, and "
                f"collection aggregates, got {expr!r}"
            )
        a, c = map_ref(rm.group(1), rm.group(2))
        referenced[a].add(c)
        select_plan.append((f"{a}_{c}", alias or c))
    return select_plan, referenced, agg_emits, index_emits


def _compile_cross_pred(condition: str):
    """Translate an EventFlux step condition with cross-step refs
    (``e2[price > e1.price]``) into a python predicate over
    (candidate event dict, matched steps dict)."""
    expr = condition
    expr = _EREF_RE.sub(lambda m: f"__m['{m.group(1)}'][-1]['{m.group(2)}']", expr)
    expr = re.sub(r"(?<![<>!=])=(?!=)", "==", expr)
    expr = re.sub(r"\bAND\b", "and", expr, flags=re.IGNORECASE)
    expr = re.sub(r"\bOR\b", "or", expr, flags=re.IGNORECASE)
    expr = re.sub(r"\bNOT\b", "not", expr, flags=re.IGNORECASE)
    expr = re.sub(r"\b(?!and\b|or\b|not\b|__m\b)([a-zA-Z_]\w*)\b(?!\s*\(|')", r"__ev['\1']", expr)
    expr = expr.replace("__ev['__m']", "__m")
    code = compile(expr, "<pattern-condition>", "eval")

    def pred(ev: dict, matched: dict) -> bool:
        return bool(eval(code, {"__builtins__": {}}, {"__ev": ev, "__m": matched}))

    return pred
