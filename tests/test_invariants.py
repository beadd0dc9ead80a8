"""BASELINE.json input_hint per-row invariants, end-to-end through the
flagship pipeline:

  "per-row invariant vs the reference: decoded-pixel allclose (PSNR>=40dB
   for lossy) + caption equality"

plus hypothesis property tests for the coordinate-math contract.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures, tile_math as tm
from versatiles_rs_spark.codecs import decode_image, psnr


class TestFlagshipRowInvariants:
    @pytest.fixture(scope="class")
    def encoded(self, spark):
        # the flagship's fused stage, png (lossless) and webp (REAL lossy
        # codec; engine default quality 90 = measured 40 dB floor)
        return {
            fmt: fixtures.images_with_tiles_df(
                spark, 60, size=16, zoom=6, partitions=2, target_fmt=fmt,
            ).collect()
            for fmt in ("png", "webp")
        }

    def test_caption_equality(self, encoded):
        for fmt, rows in encoded.items():
            for r in rows:
                i = int(r.image_id[3:])
                assert r.caption == fixtures._caption(i), (fmt, r.image_id)

    def test_decoded_pixel_psnr(self, encoded):
        for fmt, rows in encoded.items():
            for r in rows:
                i = int(r.image_id[3:])
                src_fmt = fixtures._FMTS[i % 3]  # generator cycles png/jpg/webp
                ref = fixtures.make_pixels(i, 16)  # the reference formula
                got = decode_image(bytes(r.bytes))
                p = psnr(ref, got)
                if fmt == "png" and src_fmt == "png":
                    assert p == float("inf"), f"lossless chain must be exact, got {p}"
                else:
                    # at least one lossy hop (source or target): >=40dB bound
                    assert p >= 40.0, f"{src_fmt}->{fmt} PSNR {p} < 40dB for {r.image_id}"

    def test_tile_assignment_matches_reference_formula(self, encoded):
        for r in encoded["png"]:
            x, y = tm.lonlat_to_tile(np.array([r.lon]), np.array([r.lat]), 6)
            assert (r.x, r.y) == (int(x[0]), int(y[0]))


def test_point_lookup_serve_analog(spark, tmp_path):
    from versatiles_rs_spark.sinks.writers import write_block_grouped
    from versatiles_rs_spark.sources.containers import get_tile

    tiles = (
        fixtures.images_with_tiles_df(spark, 200, size=16, zoom=4, partitions=2, skew=False)
        .groupBy("z", "x", "y")
        .agg(F.min("bytes").alias("bytes"))
    )
    path = str(tmp_path / "serve_tbl")
    write_block_grouped(tiles, path, block_size=8)
    table = spark.read.parquet(path)
    one = tiles.first()
    hit = get_tile(table, one.z, one.x, one.y)
    assert hit is not None and bytes(hit.bytes) == bytes(one.bytes)
    assert get_tile(table, 4, 9999, 9999) is None


# ---------------------------------------------------------------------------
# hypothesis property tests: the tile-math contract holds over the whole
# coordinate domain, not just the golden fixtures
# ---------------------------------------------------------------------------

LON = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
LAT = st.floats(min_value=-85.05112877980659, max_value=85.05112877980659, allow_nan=False)
ZOOM = st.integers(min_value=0, max_value=18)


@settings(max_examples=200, deadline=None)
@given(lon=LON, lat=LAT, z=ZOOM)
def test_tile_assignment_in_range(lon, lat, z):
    x, y = tm.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    assert 0 <= x[0] < 2**z and 0 <= y[0] < 2**z


@settings(max_examples=200, deadline=None)
@given(lon=LON, lat=LAT, z=st.integers(min_value=1, max_value=18))
def test_tile_geo_roundtrip_contains_point(lon, lat, z):
    """A point's assigned tile's geo bbox contains the point (up to the
    clamping at the anti-meridian / pole edges)."""
    x, y = tm.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    w, s, e, n = tm.tile_to_geo_bbox(z, x, y)
    if -180.0 < lon < 180.0 and abs(lat) < 85.0511287:
        assert w[0] - 1e-9 <= lon <= e[0] + 1e-9
        assert s[0] - 1e-9 <= lat <= n[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(z=st.integers(min_value=0, max_value=15), frac=st.tuples(
    st.floats(0, 0.999999), st.floats(0, 0.999999)
))
def test_hilbert_bijective(z, frac):
    x = np.array([int(frac[0] * 2**z)])
    y = np.array([int(frac[1] * 2**z)])
    h = tm.hilbert_index(np.array([z]), x, y)
    z2, x2, y2 = tm.hilbert_decode(h)
    assert (z2[0], x2[0], y2[0]) == (z, x[0], y[0])


@settings(max_examples=100, deadline=None)
@given(z=st.integers(min_value=1, max_value=18), frac=st.tuples(
    st.floats(0, 0.999999), st.floats(0, 0.999999)
))
def test_parent_contains_child(z, frac):
    x = int(frac[0] * 2**z)
    y = int(frac[1] * 2**z)
    pz, px, py = tm.parent(np.array([z]), np.array([x]), np.array([y]))
    assert pz[0] == z - 1 and px[0] == x >> 1 and py[0] == y >> 1


@settings(max_examples=100, deadline=None)
@given(z=st.integers(min_value=0, max_value=18), frac=st.tuples(
    st.floats(0, 0.999999), st.floats(0, 0.999999)
))
def test_flip_y_involution(z, frac):
    y = np.array([int(frac[1] * 2**z)])
    assert tm.flip_y(z, tm.flip_y(z, y))[0] == y[0]


@settings(max_examples=50, deadline=None)
@given(
    z=st.integers(min_value=0, max_value=10),
    box=st.tuples(
        st.floats(-179, 179), st.floats(-80, 80), st.floats(0.001, 30), st.floats(0.001, 30)
    ),
)
def test_geo_bbox_to_tile_bbox_covers_corners(z, box):
    """Every point of the geo box falls inside the computed tile bbox
    (the eps inset only excludes boundary-aligned bleed)."""
    x0, y0, w, h = box
    x1, y1 = min(x0 + w, 180.0), min(y0 + h, 85.0)
    tx0, ty0, tx1, ty1 = tm.geo_bbox_to_tile_bbox(z, x0, y0, x1, y1)
    cx, cy = tm.lonlat_to_tile(np.array([(x0 + x1) / 2]), np.array([(y0 + y1) / 2]), z)
    assert tx0 <= cx[0] <= tx1 and ty0 <= cy[0] <= ty1
