"""DEM contours (operators/contours.py): analytic plane/cone geometry,
saddle handling, exact chaining, and the fused Spark pass + simplify
composition."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.contours import (
    chain_segments,
    contour_segments,
    dem_contours,
)


def test_plane_contour_is_a_straight_open_line():
    y, x = np.mgrid[0:20, 0:20]
    h = x.astype(np.float64)  # z = x
    lines = chain_segments(contour_segments(h, 7.25))
    assert len(lines) == 1
    pts, closed = lines[0]
    assert not closed
    assert all(abs(px - 7.25) < 1e-12 for px, _ in pts)  # vertical line x=7.25
    ys = sorted(py for _, py in pts)
    assert ys[0] == 0.0 and ys[-1] == 19.0 and len(pts) == 20


def test_cone_contour_is_a_closed_ring_of_right_radius():
    y, x = np.mgrid[0:41, 0:41]
    h = -np.hypot(x - 20.0, y - 20.0)  # cone peaked at center
    lines = chain_segments(contour_segments(h, -8.0))
    assert len(lines) == 1
    pts, closed = lines[0]
    assert closed and len(pts) > 20
    r = np.hypot(np.array([p[0] for p in pts]) - 20, np.array([p[1] for p in pts]) - 20)
    assert abs(r - 8.0).max() < 0.5  # within a cell of the true circle


def test_saddle_cells_produce_two_segments():
    h = np.array([[1.0, 0.0], [0.0, 1.0]])  # case 5 in a single cell
    assert len(contour_segments(h, 0.5)) == 2
    h10 = np.array([[0.0, 1.0], [1.0, 0.0]])  # case 10
    assert len(contour_segments(h10, 0.5)) == 2


def test_dem_contours_spark_and_simplify_composition(spark):
    from versatiles_rs_spark.codecs import encode_dem, encode_image
    from versatiles_rs_spark.functions.simplify import simplify_lines

    y, x = np.mgrid[0:32, 0:32]
    h = x.astype(np.float64)  # plane: contours are straight lines
    pdf = pd.DataFrame(
        {"z": [2], "x": [0], "y": [0],
         "bytes": [encode_image(encode_dem(h, "terrarium"), "png")], "fmt": ["png"]}
    )
    df = spark.createDataFrame(pdf, schema="z int, x long, y long, bytes binary, fmt string")
    lines = dem_contours(df, levels=[5.0, 20.0], schema="terrarium")
    rows = lines.collect()
    assert {r.level for r in rows} == {5.0, 20.0}
    for r in rows:
        assert not r.closed
        assert max(abs(px - r.level) for px in r.xs) < 0.01  # terrarium quantization
    # composition: a straight contour simplifies to its 2 endpoints
    with_ids = lines.select(
        F.monotonically_increasing_id().alias("line_id"), "xs", "ys"
    )
    kept = simplify_lines(with_ids, eps=0.05)
    per_line = {r.line_id: r["count"] for r in kept.groupBy("line_id").count().collect()}
    assert set(per_line.values()) == {2}


def test_contour_stats_matches_global_brute_force(spark):
    """Border-exact crossing statistics: the distributed strip-join plan
    must equal a numpy evaluation over the whole zoom-1 mosaic, edge by
    edge — any misowned or dropped tile-boundary edge flips a count."""
    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.fixtures import dem_value
    from versatiles_rs_spark.operators.contours import contour_stats

    levels = [32, 64, 96, 128, 160, 192]
    n = 512
    g = np.arange(n, dtype=np.int64)
    v = dem_value(g[None, :], g[:, None])

    expected = {}
    # horizontal edges (west pixel owns), vertical edges (north pixel owns)
    for e0, e1, ox, oy in (
        (v[:, :-1], v[:, 1:], g[None, :-1], g[:, None] * np.ones((1, n - 1), np.int64)),
        (v[:-1, :], v[1:, :], g[None, :] * np.ones((n - 1, 1), np.int64), g[:-1, None]),
    ):
        lo, hi = np.minimum(e0, e1), np.maximum(e0, e1)
        tx, ty = (np.broadcast_to(ox, lo.shape) // 256, np.broadcast_to(oy, lo.shape) // 256)
        for lv in levels:
            cross = (lo < lv) & (lv <= hi)
            for t in range(4):
                m = cross & (tx == t % 2) & (ty == t // 2)
                if not m.any():
                    continue
                key = (t % 2, t // 2, lv)
                add = (
                    int(m.sum()),
                    int((lv - lo[m]).sum()),
                    int((hi[m] - lo[m]).sum()),
                )
                cur = expected.get(key, (0, 0, 0))
                expected[key] = tuple(a + b for a, b in zip(cur, add))

    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=4)
    got = {
        (r.x, r.y, r.level): (r.n_cross, r.num_sum, r.span_sum)
        for r in contour_stats(tiles, levels=levels, tile_size=256).collect()
    }
    assert got == expected
