"""Tile outline union: golden shapes, orientation, holes, geo conversion."""

import numpy as np
import pytest

from versatiles_rs_spark import tile_math as tm
from versatiles_rs_spark.outline import (
    ring_signed_area,
    tile_outline_feature,
    tile_outline_geo,
    tile_outline_rings,
)


def ring_set(ring):
    return set(ring[:-1])


def test_single_tile_square():
    rings = tile_outline_rings([3], [5])
    assert len(rings) == 1
    assert ring_set(rings[0]) == {(3, 5), (4, 5), (4, 6), (3, 6)}
    assert rings[0][0] == rings[0][-1] and len(rings[0]) == 5


def test_adjacent_tiles_merge_into_rectangle():
    # reference: adjacent_coords_merge_into_single_polygon (tile_outline tests)
    rings = tile_outline_rings([2, 3], [1, 1])
    assert len(rings) == 1
    assert ring_set(rings[0]) == {(2, 1), (4, 1), (4, 2), (2, 2)}


def test_l_shape_has_six_corners():
    rings = tile_outline_rings([0, 1, 0], [0, 0, 1])
    assert len(rings) == 1
    assert len(rings[0]) - 1 == 6


def test_donut_produces_hole_ring():
    # 3x3 block with center removed
    xs, ys = zip(*[(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)])
    rings = tile_outline_rings(list(xs), list(ys))
    assert len(rings) == 2
    areas = sorted(ring_signed_area(r) for r in rings)
    assert areas[0] == -1.0 and areas[1] == 9.0  # hole CW, outer CCW (y-down)


def test_disjoint_tiles_two_rings():
    rings = tile_outline_rings([0, 5], [0, 5])
    assert len(rings) == 2
    assert all(ring_signed_area(r) > 0 for r in rings)


def test_diagonal_pinch_stays_two_rings():
    """Tiles touching only at a corner must not fuse into one self-touching
    ring traversal error."""
    rings = tile_outline_rings([0, 1], [0, 1])
    assert len(rings) == 2
    assert {frozenset(ring_set(r)) for r in rings} == {
        frozenset({(0, 0), (1, 0), (1, 1), (0, 1)}),
        frozenset({(1, 1), (2, 1), (2, 2), (1, 2)}),
    }


def test_geo_conversion_matches_tile_corners():
    geo = tile_outline_geo(4, [3], [5])
    (w, s, e, n) = tm.tile_to_geo_bbox(4, np.array([3]), np.array([5]))
    lons = {round(p[0], 9) for p in geo[0]}
    lats = {round(p[1], 9) for p in geo[0]}
    assert lons == {round(float(w[0]), 9), round(float(e[0]), 9)}
    assert lats == {round(float(s[0]), 9), round(float(n[0]), 9)}


def test_feature_with_hole_is_polygon_with_two_rings():
    xs, ys = zip(*[(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)])
    feat = tile_outline_feature(6, list(xs), list(ys))
    assert feat["geometry"]["type"] == "Polygon"
    assert len(feat["geometry"]["coordinates"]) == 2  # outer + hole


def test_feature_multipolygon_for_disjoint():
    feat = tile_outline_feature(6, [0, 5], [0, 5])
    assert feat["geometry"]["type"] == "MultiPolygon"
    assert len(feat["geometry"]["coordinates"]) == 2


def test_large_random_set_closes_all_rings():
    rng = np.random.default_rng(3)
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 12, (80, 2))}
    xs, ys = zip(*pts)
    rings = tile_outline_rings(list(xs), list(ys))
    total = sum(ring_signed_area(r) for r in rings)
    assert total == float(len(pts))  # outer areas minus holes == tile count
    for r in rings:
        assert r[0] == r[-1]


def test_distributed_boundary_edges_parity(spark):
    """groupBy edge-cancellation (Spark) must yield the same rings as the
    local neighbor-test path, including donuts and diagonal pinch points."""
    import pandas as pd

    from versatiles_rs_spark.outline import (
        boundary_edges_df,
        rings_from_edges,
        tile_outline_rings,
    )

    # donut (3x3 minus center) + diagonal-pinch pair + isolated tile
    tiles = [(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)]
    tiles += [(5, 5), (6, 6), (9, 0)]
    df = spark.createDataFrame(pd.DataFrame(tiles, columns=["x", "y"]), "x long, y long")
    edges = [((r.sx, r.sy), (r.ex, r.ey)) for r in boundary_edges_df(df).collect()]
    got = sorted(
        (tuple(sorted(ring)), len(ring)) for ring in rings_from_edges(edges)
    )
    want = sorted(
        (tuple(sorted(ring)), len(ring))
        for ring in tile_outline_rings([t[0] for t in tiles], [t[1] for t in tiles])
    )
    # 5 rings: donut outer + donut hole + 2 pinch-separated outers + isolated
    assert got == want and len(got) == 5


def test_registry_edge_set_chains_to_closed_rings(spark):
    """The registry's tile_outline query emits the distributed boundary-edge
    set (SQL-oracled by the driver); this keeps the end-to-end check that
    the edge set over a REAL table still chains into closed, consistently
    oriented rings — the driver-side tail the oracle can't express."""
    from versatiles_rs_spark.outline import ring_signed_area, rings_from_edges
    from versatiles_rs_spark.queries import REGISTRY

    edges = REGISTRY["tile_outline"].fn(spark, "/root/testdata/sf0.001").collect()
    rings = rings_from_edges([((r.sx, r.sy), (r.ex, r.ey)) for r in edges])
    assert rings and all(r[0] == r[-1] for r in rings)
    # covered area equals the distinct z=5 tile count (outer minus holes)
    from versatiles_rs_spark.queries import _events_with_tiles

    n_tiles = (
        _events_with_tiles(spark, "/root/testdata/sf0.001", 5)
        .select("x", "y").distinct().count()
    )
    assert sum(ring_signed_area(r) for r in rings) == float(n_tiles)
