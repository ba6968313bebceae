"""Property-based verification (hypothesis) for the pure-Python kernels:
PNG codec round-trips over arbitrary images (both interlace methods, all
four pixel shapes), Morton interleave against a bit-twiddling reference,
and the quantile-histogram bucket function's order/bound invariants.

These run WITHOUT Spark — they pin the per-record kernels the Spark
operators batch over, so the search space is cheap to explore.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eventflux_engine_spark.multimodal import (
    _png_encode,
    _png_encode_palette,
    parse_png,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 2**32 - 1), st.booleans())
def test_png_gray8_roundtrip_any_image(hw, seed, interlace):
    h, w = hw
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(parse_png(_png_encode(img, interlace=interlace)), img)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**32 - 1), st.booleans())
def test_png_rgb_and_gray16_roundtrip_any_image(hw, seed, interlace):
    h, w = hw
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    assert np.array_equal(parse_png(_png_encode(rgb, interlace=interlace)), rgb)
    assert np.array_equal(parse_png(_png_encode(g16, interlace=interlace)), g16)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(2, 256), st.integers(0, 2**32 - 1), st.booleans())
def test_png_palette_roundtrip_any_palette_size(hw, k, seed, interlace):
    h, w = hw
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    idx = rng.integers(0, k, (h, w), dtype=np.uint8)
    got = parse_png(_png_encode_palette(idx, pal, interlace=interlace))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 65535))
def test_morton_interleave_matches_reference(a, b):
    import duckdb

    from eventflux_engine_spark.storage import morton_sql

    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    got = duckdb.sql(
        f"SELECT {morton_sql(str(a), str(b), 16, '//')}"
    ).fetchone()[0]
    assert got == z


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 40) - 1))
def test_hist_bucket_bound_and_monotone(v):
    import duckdb

    from eventflux_engine_spark.operators.approx import (
        HIST_SUB,
        hist_bucket_sql,
    )

    lb = duckdb.sql(f"SELECT {hist_bucket_sql(str(v), '//')}").fetchone()[0]
    # lower bound never exceeds the value, and the relative gap is within
    # one sub-bucket of the value's octave
    assert 0 <= lb <= v
    if v > 0:
        lo = 1 << (v.bit_length() - 1)
        assert v - lb <= lo // HIST_SUB + 1
        assert lb >= lo
