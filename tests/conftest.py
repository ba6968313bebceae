from __future__ import annotations

import sys
from pathlib import Path

import pytest

try:  # reproducible property tests: same examples every run (VERDICT r2 #1)
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("repro", derandomize=True, deadline=None)
    _hyp_settings.load_profile("repro")
except ImportError:  # pragma: no cover
    pass

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from eventflux_engine_spark.session import get_spark  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="pytest")
    yield s


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return SF_TINY
