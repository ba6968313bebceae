"""Golden-output gate: every registry query vs its DuckDB oracle.

Mirrors the reference's AppRunner golden-output idiom
(``/root/reference/tests/common/mod.rs:31``): same input, exact row parity,
order-insensitive. This is the same comparison the driver performs at
sf=0.01; run here at sf=0.001 for speed.
"""

from __future__ import annotations

import pytest

from eventflux_engine_spark.plans import QUERIES
from eventflux_engine_spark.testing import duckdb_con, assert_matches_oracle

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_TINY)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_TINY)
    if spec.oracle is None:
        assert df.count() >= 0
        assert len(df.columns) > 0
    else:
        assert_matches_oracle(df, con, spec.oracle, name)
