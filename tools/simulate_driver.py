"""Simulate the driver's verify pass: entry() smoke + queries() vs
oracle_sql() value-hash comparison, like CORRECTNESS_r{N}.json.

Usage: python tools/simulate_driver.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

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


def main() -> int:
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
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        hash_ok = value_hash(sdf) == value_hash(odf)
        status = "MATCH" if (cols_ok and rows_ok and hash_ok) else "MISMATCH"
        if status == "MISMATCH":
            bad.append(name)
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} "
            f"cols_ok={cols_ok} hash_ok={hash_ok}"
        )
    print(f"\n{len(qs) - len(bad)}/{len(qs)} matched")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
