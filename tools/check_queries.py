"""Dev loop: run every registry query against its DuckDB oracle.

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import traceback

from eventflux_engine_spark.plans import QUERIES
from eventflux_engine_spark.session import get_spark
from eventflux_engine_spark.testing import duckdb_con, assert_matches_oracle


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or list(QUERIES)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb_con(sf_dir)
    failures = []
    for name in names:
        spec = QUERIES[name]
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"OK   {name}: rows-only check, {n} rows")
                continue
            assert_matches_oracle(df, con, spec.oracle, name)
            print(f"OK   {name}")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {e}")
            traceback.print_exc(limit=3)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
