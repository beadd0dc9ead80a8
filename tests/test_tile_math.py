"""Golden tests for tile_math, transcribed from the reference's unit fixtures.

Citations per case; these define correctness (SURVEY.md §5.1).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from versatiles_rs_spark import tile_math as tm


# tile_coord.rs:242-249 — (z5, x3, y4) <-> geo
def test_tile_to_geo_golden():
    lon, lat = tm.tile_to_lonlat(5, 3, 4)
    assert float(lon) == -146.25
    assert float(lat) == pytest.approx(79.17133464081945, abs=1e-12)


def test_tile_geo_bbox_golden():
    # tile_coord.rs:244-249: geo bbox of (5,3,4) =
    # [-146.25, 76.84081641443098, -135.0, 79.17133464081945]
    w, s, e, n = tm.tile_to_geo_bbox(5, 3, 4)
    assert float(w) == -146.25
    assert float(s) == pytest.approx(76.84081641443098, abs=1e-12)
    assert float(e) == -135.0
    assert float(n) == pytest.approx(79.17133464081945, abs=1e-12)


def test_geo_to_tile_roundtrip_golden():
    x, y = tm.lonlat_to_tile(-146.25, 79.17133464081945, 5)
    assert (int(x), int(y)) == (3, 4)


def test_geo_to_tile_clamping():
    # tile_coord.rs:75-79 — clamp to [0, 2^z - 1] before floor
    x, y = tm.lonlat_to_tile(180.0, -90.0, 3)
    assert (int(x), int(y)) == (7, 7)
    x, y = tm.lonlat_to_tile(-180.0, 90.0, 3)
    assert (int(x), int(y)) == (0, 0)


def test_geo_bbox_to_tile_bbox_golden():
    # tile_bbox/constructors.rs:562-566
    assert tm.geo_bbox_to_tile_bbox(9, 8.0653, 51.3563, 12.3528, 52.2564) == (267, 168, 273, 170)


def test_geo_bbox_degenerate_not_empty():
    # constructors.rs:570-578 — degenerate boxes still hit one tile
    bb = tm.geo_bbox_to_tile_bbox(0, 8.0, 51.0, 8.000001, 51.0)
    assert tm.count_tiles(*bb) == 1
    bb = tm.geo_bbox_to_tile_bbox(14, -132.000001, -40.0, -132.0, -40.0)
    assert tm.count_tiles(*bb) == 1


def test_bbox_pyramid_golden_strings():
    # tile_bbox_pyramid.rs:439-453
    pyr = tm.bbox_pyramid(0, 8, (8.0653, 51.3563, 12.3528, 52.2564))
    assert tm.pyramid_strings(pyr) == [
        "0:[0,0,0,0]",
        "1:[1,0,1,0]",
        "2:[2,1,2,1]",
        "3:[4,2,4,2]",
        "4:[8,5,8,5]",
        "5:[16,10,17,10]",
        "6:[33,21,34,21]",
        "7:[66,42,68,42]",
        "8:[133,84,136,85]",
    ]


@pytest.mark.parametrize(
    "args,expected",
    [
        # tile_bbox/constructors.rs:552-560
        ((5, 12, 5, 12), 1),
        ((5, 12, 7, 15), 12),
        ((5, 12, 5, 15), 4),
        ((5, 15, 7, 15), 3),
    ],
)
def test_count_tiles(args, expected):
    assert tm.count_tiles(*args) == expected


@pytest.mark.parametrize(
    "zxy,expected",
    [
        # tile_hilbert_index.rs:183-190
        ((1, 1, 1), 3),
        ((0, 0, 0), 0),
        ((2, 2, 2), 13),
        ((3, 5, 3), 73),
        ((3, 7, 7), 63),
        ((31, 0, 0), 1537228672809129301),
        ((31, (1 << 31) - 1, (1 << 31) - 1), 4611686018427387903),
    ],
)
def test_hilbert_golden(zxy, expected):
    z, x, y = zxy
    assert int(tm.hilbert_index(z, x, y)) == expected


def test_hilbert_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    z = rng.integers(0, 12, size=500)
    x = rng.integers(0, 1 << 12, size=500) % (1 << z)
    y = rng.integers(0, 1 << 12, size=500) % (1 << z)
    vec = tm.hilbert_index(z, x, y)
    for i in range(500):
        assert int(tm.hilbert_index(int(z[i]), int(x[i]), int(y[i]))) == int(vec[i])


@settings(max_examples=200, deadline=None)
@given(
    z=st.integers(min_value=0, max_value=20),
    xf=st.floats(min_value=0, max_value=1, exclude_max=True),
    yf=st.floats(min_value=0, max_value=1, exclude_max=True),
)
def test_hilbert_roundtrip(z, xf, yf):
    # tile_hilbert_index.rs:212-226 round-trip property
    n = 1 << z
    x, y = int(xf * n), int(yf * n)
    idx = int(tm.hilbert_index(z, x, y))
    assert tm.hilbert_decode(idx) == (z, x, y)


def test_hilbert_decode_vectorized():
    idx = tm.hilbert_index(np.full(64, 6), np.arange(64) % 8, np.arange(64) // 8)
    z, x, y = tm.hilbert_decode(idx)
    assert (z == 6).all()
    assert (x == np.arange(64) % 8).all()
    assert (y == np.arange(64) // 8).all()


def test_hilbert_strictly_increasing_with_zoom():
    # "indices remain strictly increasing with zoom" (tile_hilbert_index.rs:70-72)
    assert int(tm.hilbert_index(3, 0, 0)) > int(tm.hilbert_index(2, 3, 3))


def test_sort_index():
    # tile_coord.rs:110-114: offset (4^z-1)/3 + size*y + x
    assert int(tm.sort_index(0, 0, 0)) == 0
    assert int(tm.sort_index(1, 0, 0)) == 1
    assert int(tm.sort_index(1, 1, 1)) == 4
    assert int(tm.sort_index(2, 0, 0)) == 5


def test_flip_y_and_parent():
    assert int(tm.flip_y(3, 2)) == 5  # y -> 2^z - 1 - y (tile_coord.rs:179-181)
    z, x, y = tm.parent(4, 7, 9)
    assert (int(z), int(x), int(y)) == (3, 3, 4)


def test_as_level():
    # tile_coord.rs:138-157
    x, y = tm.as_level(3, 5, 2, 5)
    assert (int(x), int(y)) == (20, 8)
    x, y = tm.as_level(3, 5, 2, 1)
    assert (int(x), int(y)) == (1, 0)


def test_bbox_algebra():
    assert tm.bbox_intersect((0, 0, 4, 4), (2, 2, 8, 8)) == (2, 2, 4, 4)
    assert tm.bbox_intersect((0, 0, 1, 1), (3, 3, 4, 4)) is None
    assert tm.bbox_include((0, 0, 1, 1), (3, 3, 4, 4)) == (0, 0, 4, 4)


def test_block_coord():
    bx, by = tm.block_coord(513, 255, 256)
    assert (int(bx), int(by)) == (2, 0)


def test_quadkey_ordering_is_depth_first():
    # quadkey preserves quadtree locality: children of the same parent are adjacent
    k = tm.quadkey(np.array([2, 2, 2, 2]), np.array([0, 1, 0, 1]), np.array([0, 0, 1, 1]))
    assert list(k) == [0, 1, 2, 3]
