"""Simulate the driver's verify pass: entry() smoke + queries() vs
oracle_sql() value-hash comparison, like CORRECTNESS_r{N}.json.

Usage: python tools/simulate_driver.py [--materialize] [sf_dir] [query_name ...]

--materialize evaluates each oracle's top-level CTEs as temp tables in
declaration order instead of one statement. Same SQL text, same results —
but linear evaluation: DuckDB 1.0 inlines a CTE at every reference site
(the MATERIALIZED keyword parses but is not honored), so an oracle whose
CTE chain references upstream stages more than once re-computes — and at
large scale re-SPILLS — the whole upstream pipeline per reference. Used
for the self-audit scale runs (sf1.0/sf3.0); the real driver runs the
single-statement oracles at sf0.01 where inlining is harmless.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb


def value_hash(pdf) -> str:
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(4)
    rows = sorted(tuple(map(str, r)) for r in pdf.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def split_top_ctes(sql: str):
    """Split ``WITH a AS (...), b AS (...) SELECT ...`` into
    ([(name, body), ...], final_select). Paren/quote-aware scan over our
    own generated SQL (no comments, no dollar-quoting); nested WITHs stay
    inside their body. Returns (None, sql) for non-WITH statements."""
    s = sql.strip()
    if s[:4].upper() != "WITH":
        return None, sql
    i, n, ctes = 4, len(s), []
    while True:
        while i < n and (s[i].isspace() or s[i] == ","):
            i += 1
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        name = s[i:j]
        k = j
        while s[k].isspace():
            k += 1
        cols = None
        if s[k] == "(":  # optional column-alias list: name(c1, c2, ...) AS (...)
            k2 = s.index(")", k)
            cols = s[k + 1 : k2]
            k = k2 + 1
            while s[k].isspace():
                k += 1
        assert s[k : k + 2].upper() == "AS", f"expected AS after CTE {name!r}"
        k += 2
        while s[k].isspace():
            k += 1
        if s[k : k + 12].upper() == "MATERIALIZED":
            k += 12
            while s[k].isspace():
                k += 1
        assert s[k] == "(", f"expected ( for CTE {name!r}"
        depth, k, in_str = 1, k + 1, False
        body_start = k
        while depth:
            c = s[k]
            if in_str:
                if c == "'":
                    in_str = False  # '' escape re-enters on next quote
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        body = s[body_start : k - 1]
        if cols is not None:
            body = f'SELECT * FROM ({body}) AS "{name}"({cols})'
        ctes.append((name, body))
        while k < n and s[k].isspace():
            k += 1
        if k < n and s[k] == ",":
            i = k + 1
            continue
        return ctes, s[k:]


def run_oracle_materialized(con, sql: str):
    ctes, final = split_top_ctes(sql)
    if ctes is None:
        return con.execute(final).fetchdf()
    made = []
    try:
        for name, body in ctes:
            con.execute(f'CREATE TEMP TABLE "{name}" AS {body}')
            made.append(name)
        return con.execute(final).fetchdf()
    finally:
        for name in reversed(made):
            con.execute(f'DROP TABLE IF EXISTS "{name}"')


def main() -> int:
    materialize = "--materialize" in sys.argv
    if materialize:
        sys.argv.remove("--materialize")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from eventflux_engine_spark.session import get_spark

    spark = get_spark()

    df = entry_mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
    assert n > 0

    con = duckdb.connect()
    # large-sf runs: keep the oracle in RAM (the box has 128 GiB) and give
    # any residual spill a roomy temp dir — the default .tmp alongside a
    # concurrently-spilling Spark job can exhaust the disk
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/root/repo/.tmp/duckdb'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    if len(sys.argv) > 2:
        qs = {k: v for k, v in qs.items() if k in sys.argv[2:]}
    oracles = entry_mod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)", flush=True)
            continue
        t0 = time.time()
        if materialize:
            odf = run_oracle_materialized(con, oracles[name])
        else:
            odf = con.execute(oracles[name]).fetchdf()
        t_oracle = time.time() - t0
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = value_hash(sdf) == value_hash(odf)
        status = "MATCH" if (cols_ok and rows_ok and hash_ok) else "MISMATCH"
        if status == "MISMATCH":
            bad.append(name)
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} "
            f"cols_ok={cols_ok} hash_ok={hash_ok} "
            f"spark={t_spark:.1f}s oracle={t_oracle:.1f}s",
            flush=True,
        )
    print(f"\n{len(qs) - len(bad)}/{len(qs)} matched")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
