"""Raster kernel golden tests (values transcribed from the reference) and
Spark-level pyramid/overscale round trips."""

import numpy as np
import pytest

from versatiles_rs_spark.codecs import decode_image, encode_image, psnr
from versatiles_rs_spark.fixtures import make_pixels
from versatiles_rs_spark.operators.raster import (
    downscale2_kernel,
    flatten_kernel,
    levels_kernel,
    mosaic4_kernel,
    overscale_kernel,
)


@pytest.mark.parametrize(
    "color_in,b,c,g,color_out",
    [
        # raster_levels.rs:110-123 golden table
        ([102, 119], 0.0, 1.0, 1.0, [102, 119]),
        ([102, 119, 136], 0.0, 1.0, 1.0, [102, 119, 136]),
        ([102, 119, 136, 153], 0.0, 1.0, 1.0, [102, 119, 136, 153]),
        ([102], 20.0, 1.1, 0.9, [129]),
        ([102, 119], 20.0, 1.1, 0.9, [129, 119]),
        ([102, 119, 136], 20.0, 1.1, 0.9, [129, 147, 165]),
        ([102, 119, 136, 153], 20.0, 1.1, 0.9, [129, 147, 165, 153]),
        ([51, 119, 170], 0.0, 1.0, 1.0, [51, 119, 170]),
        ([51, 119, 170], -100.0, 1.0, 1.0, [0, 19, 70]),
        ([51, 119, 170], 100.0, 1.0, 1.0, [151, 219, 255]),
        ([51, 119, 170], 0.0, 0.5, 1.0, [89, 123, 149]),
        ([51, 119, 170], 0.0, 2.0, 1.0, [0, 111, 213]),
        ([51, 119, 170], 0.0, 1.0, 0.5, [114, 174, 208]),
        ([51, 119, 170], 0.0, 1.0, 2.0, [10, 56, 113]),
    ],
)
def test_levels_golden(color_in, b, c, g, color_out):
    img = np.array([[color_in]], dtype=np.uint8)
    out = levels_kernel(img, b, c, g)
    assert out[0, 0].tolist() == color_out


def test_flatten_endpoints():
    # operation.rs:394-414: alpha=255 -> color verbatim; alpha=0 -> background
    img = np.zeros((1, 2, 4), dtype=np.uint8)
    img[0, 0] = [10, 20, 30, 255]
    img[0, 1] = [10, 20, 30, 0]
    out = flatten_kernel(img, (200, 100, 50))
    assert out[0, 0].tolist() == [10, 20, 30]
    assert out[0, 1].tolist() == [200, 100, 50]


def test_flatten_integer_math():
    # (p*a + c*(255-a) + 127) / 255 with a=128, p=100, c=0
    img = np.array([[[100, 100, 100, 128]]], dtype=np.uint8)
    out = flatten_kernel(img, (0, 0, 0))
    assert out[0, 0, 0] == (100 * 128 + 0 + 127) // 255


def test_downscale_box():
    img = np.array(
        [[[0], [10]], [[20], [30]]], dtype=np.uint8
    )  # 2x2x1 -> mean 15
    out = downscale2_kernel(img)
    assert out.shape == (1, 1, 1)
    assert out[0, 0, 0] == 15  # (0+10+20+30+2)//4


def test_overscale_then_downscale_is_identityish():
    img = make_pixels(5, 64)
    child = overscale_kernel(img, 1, 0, 2)
    assert child.shape == img.shape
    # downscaling the upscaled child recovers the crop exactly (NN + box)
    rec = downscale2_kernel(child)
    assert (rec == img[0:32, 32:64]).all()


def test_mosaic4():
    kids = {q: make_pixels(i, 64) for i, q in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)])}
    out = mosaic4_kernel(kids, 64)
    assert out.shape == (64, 64, 3)
    assert (out[:32, :32] == downscale2_kernel(kids[(0, 0)])).all()
    assert (out[32:, 32:] == downscale2_kernel(kids[(1, 1)])).all()


def test_mosaic_partial_children():
    out = mosaic4_kernel({(0, 0): make_pixels(1, 64)}, 64)
    assert (out[32:, :] == 0).all()  # missing quadrants transparent/zero


# ---------------------------------------------------------------------------
# Spark-level integration
# ---------------------------------------------------------------------------


def test_pyramid_rollup_spark(spark):
    """Encode a 4x4 block of z=2 tiles and roll up to z=0; verify parent
    pixels equal the independently-computed mosaic chain + PSNR bound."""
    import pandas as pd

    from versatiles_rs_spark.operators.raster import build_pyramid

    rows = []
    imgs = {}
    for x in range(4):
        for y in range(4):
            img = make_pixels(x * 4 + y, 64)
            imgs[(x, y)] = img
            rows.append((2, x, y, encode_image(img, "png"), "png"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "bytes", "fmt"]),
        schema="z int, x long, y long, bytes binary, fmt string",
    )
    levels = build_pyramid(df, z_max=2, z_min=0, tile_size=64)
    l1 = {(r.x, r.y): decode_image(bytes(r.bytes)) for r in levels[1].collect()}
    assert set(l1) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    expect = mosaic4_kernel(
        {(qx, qy): imgs[(qx, qy)] for qx in range(2) for qy in range(2)}, 64
    )
    assert (l1[(0, 0)] == expect).all()
    l0 = levels[0].collect()
    assert len(l0) == 1
    root = decode_image(bytes(l0[0].bytes))
    expect_root = mosaic4_kernel({(qx, qy): l1[(qx, qy)] for qx in range(2) for qy in range(2)}, 64)
    assert psnr(root, expect_root) == float("inf")  # png -> exact


def test_raster_levels_spark(spark):
    import pandas as pd

    from versatiles_rs_spark.operators.raster import raster_levels

    img = make_pixels(9, 32)
    df = spark.createDataFrame(
        pd.DataFrame([(8, 0, 0, encode_image(img, "png"), "png")], columns=["z", "x", "y", "bytes", "fmt"]),
        schema="z int, x long, y long, bytes binary, fmt string",
    )
    out = raster_levels(df, brightness=20.0, contrast=1.1, gamma=0.9).collect()[0]
    got = decode_image(bytes(out.bytes))
    assert (got == levels_kernel(img, 20.0, 1.1, 0.9)).all()


def test_raster_overscale_spark(spark):
    import pandas as pd

    from versatiles_rs_spark.operators.raster import raster_overscale

    img = make_pixels(3, 64)
    df = spark.createDataFrame(
        pd.DataFrame([(3, 2, 5, encode_image(img, "png"), "png")], columns=["z", "x", "y", "bytes", "fmt"]),
        schema="z int, x long, y long, bytes binary, fmt string",
    )
    out = raster_overscale(df, from_zoom=3, to_zoom=4).collect()
    assert len(out) == 4
    coords = {(r.z, r.x, r.y) for r in out}
    assert coords == {(4, 4, 10), (4, 5, 10), (4, 4, 11), (4, 5, 11)}
    child = next(r for r in out if (r.x, r.y) == (5, 10))
    assert (decode_image(bytes(child.bytes)) == overscale_kernel(img, 1, 0, 2)).all()


# ---------------------------------------------------------------------------
# zonal statistics
# ---------------------------------------------------------------------------


def test_zonal_stats_matches_bruteforce(spark):
    import numpy as np

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_stats

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)  # 1024px world
    # zones: inside one tile, straddling tiles, full-world, and 1px
    zdefs = [
        (0, 10, 10, 60, 40),
        (1, 200, 200, 400, 300),    # crosses the 256 boundary
        (2, 0, 0, 1024, 1024),      # whole world
        (3, 511, 511, 512, 512),    # single pixel
        (4, 700, 100, 1000, 900),   # multi-tile both axes
    ]
    import pandas as pd

    zones = spark.createDataFrame(
        pd.DataFrame(zdefs, columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    got = {
        r.zone_id: (r.n_px, r.sum_val, r.min_val, r.max_val)
        for r in zonal_stats(tiles, zones, tile_size=256).collect()
    }
    for zid, x0, y0, x1, y1 in zdefs:
        gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        v = fixtures.zonal_value(gx, gy).astype(np.int64)
        assert got[zid] == (v.size, int(v.sum()), int(v.min()), int(v.max())), zid
    # closed form for the single pixel: (7*511 + 13*511) % 251
    assert got[3] == (1, (20 * 511) % 251, (20 * 511) % 251, (20 * 511) % 251)


def test_zonal_stats_payload_never_in_shuffle(spark):
    import pandas as pd

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_stats

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    zones = spark.createDataFrame(
        pd.DataFrame([(0, 0, 0, 100, 100)], columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    plan = (
        zonal_stats(tiles, zones, tile_size=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes#" not in line, f"payload in shuffle: {line.strip()[:140]}"


def test_zonal_stats_zone_guard(spark):
    import pytest as _pytest

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators import raster as R

    tiles = fixtures.zonal_raster_df(spark, zoom=1, partitions=2)
    zones = spark.range(5).selectExpr(
        "id AS zone_id", "0 AS x0", "0 AS y0", "10 AS x1", "10 AS y1"
    )
    old = R._ZONAL_MAX_ZONES
    R._ZONAL_MAX_ZONES = 3
    try:
        with _pytest.raises(ValueError, match="guard"):
            R.zonal_stats(tiles, zones)
    finally:
        R._ZONAL_MAX_ZONES = old


def test_rasterize_polygons_pixels_match_bruteforce(spark):
    """Burned PNG content parity vs a per-pixel numpy oracle: a triangle, a
    rect with a hole (even-odd), and an overlapping rect (max-value burn);
    unclosed rings accepted."""
    import numpy as np

    from versatiles_rs_spark.codecs import decode_image
    from versatiles_rs_spark.joins.pip import points_in_polygon_multi
    from versatiles_rs_spark.operators.raster import rasterize_polygons

    ts = 16
    tri = [[3.0, 2.0], [29.0, 5.0], [10.0, 27.0]]
    rect_hole = [
        [[8.0, 8.0], [40.0, 8.0], [40.0, 40.0], [8.0, 40.0]],
        [[16.0, 16.0], [24.0, 16.0], [24.0, 24.0], [16.0, 24.0]],  # hole
    ]
    rect2 = [[20.0, 20.0], [36.0, 20.0], [36.0, 30.0], [20.0, 30.0]]
    polys = [(0, 90, [tri]), (1, 120, rect_hole), (2, 200, [rect2])]

    out = rasterize_polygons(polys, tile_size=ts, spark=spark).collect()
    assert {(r.x, r.y) for r in out} == {
        (x, y) for x in range(0, 3) for y in range(0, 3)
    }

    def close(r):
        a = np.asarray(r, float)
        return a if (a[0] == a[-1]).all() else np.vstack([a, a[:1]])

    for r in out:
        img = decode_image(bytes(r.bytes))[..., 0]
        ii, jj = np.meshgrid(np.arange(ts), np.arange(ts))
        cx = r.x * ts + ii.ravel() + 0.5
        cy = r.y * ts + jj.ravel() + 0.5
        want = np.zeros(ts * ts, dtype=np.uint8)
        for _, val, rings in polys:
            inside = points_in_polygon_multi(cx, cy, [close(g) for g in rings])
            want = np.maximum(want, np.where(inside, np.uint8(val), np.uint8(0)))
        assert (img.ravel() == want).all(), (r.x, r.y)
        assert r.n_covered == int((want > 0).sum())
    # hole actually punched: the hole's interior pixels are NOT value-120
    mid = [t for t in out if (t.x, t.y) == (1, 1)][0]
    img = decode_image(bytes(mid.bytes))[..., 0]
    assert img[4, 4] != 120  # global px (20.5, 20.5) sits in the hole (owned by rect2)


def test_incremental_pyramid_equals_full_rebuild(spark):
    """Dirty-propagation refresh (incremental_pyramid_update): change 3 of
    16 base tiles, propagate; every level's merged table (delta overriding
    the old level) must equal a full rebuild of the new base BYTE-exactly,
    and each delta must touch only the changed tiles' ancestors."""
    import pandas as pd

    from versatiles_rs_spark.operators.raster import (
        build_pyramid,
        incremental_pyramid_update,
    )

    def base_df(bump):
        rows = []
        for x in range(4):
            for y in range(4):
                seed = x * 4 + y + (100 if (x, y) in bump else 0)
                rows.append((2, x, y, encode_image(make_pixels(seed, 64), "png"), "png"))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["z", "x", "y", "bytes", "fmt"]),
            schema="z int, x long, y long, bytes binary, fmt string",
        )

    changed_keys = {(0, 0), (3, 2), (3, 3)}
    v1, v2 = base_df(set()), base_df(changed_keys)
    old_levels = {z: df.cache() for z, df in build_pyramid(v1, z_max=2, z_min=0).items()}
    full_v2 = build_pyramid(v2, z_max=2, z_min=0)

    changed = v2.join(
        spark.createDataFrame(
            pd.DataFrame(sorted(changed_keys), columns=["x", "y"]),
            schema="x long, y long",
        ),
        on=["x", "y"],
        how="left_semi",
    )
    deltas = incremental_pyramid_update(old_levels, changed, z_max=2, z_min=0)

    # deltas touch exactly the ancestors: z2 3 tiles -> z1 {(0,0),(1,1)} -> z0 root
    assert {(r.x, r.y) for r in deltas[1].select("x", "y").collect()} == {(0, 0), (1, 1)}
    assert deltas[0].count() == 1

    for z in (2, 1, 0):
        keys = deltas[z].select("z", "x", "y")
        merged = deltas[z].unionByName(
            old_levels[z].join(keys, on=["z", "x", "y"], how="left_anti")
        )
        got = {(r.x, r.y): bytes(r.bytes) for r in merged.collect()}
        want = {(r.x, r.y): bytes(r.bytes) for r in full_v2[z].collect()}
        assert got == want, f"level {z} diverged"


def test_hillshade_and_slope_kernels():
    """gdaldem-parity properties: flat terrain -> uniform cos(zenith)
    illumination and zero slope; an inclined plane matches the closed-form
    slope/illumination; flipping the sun 180 degrees darkens a lit slope."""
    import numpy as np

    from versatiles_rs_spark.operators.raster import hillshade_kernel, slope_kernel

    flat = np.full((16, 16), 100.0)
    sh = hillshade_kernel(flat, azimuth_deg=315, altitude_deg=45)
    assert sh.shape == (14, 14)
    assert (sh == int(np.cos(np.deg2rad(45)) * 255)).all()
    assert (slope_kernel(flat) == 0).all()

    g = 0.5  # dz/dx
    y, x = np.mgrid[0:16, 0:16]
    plane = g * x.astype(np.float64)
    s = slope_kernel(plane)
    assert np.allclose(s, np.rad2deg(np.arctan(g)))
    # closed form for a pure-x gradient: aspect = atan2(0, -g) = pi
    zen = np.deg2rad(45.0)
    az = np.deg2rad(360.0 - 315.0 + 90.0)
    slope = np.arctan(g)
    want = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - np.pi)
    sh = hillshade_kernel(plane, azimuth_deg=315, altitude_deg=45)
    assert (sh == int(np.clip(want * 255, 0, 255))).all()
    # the same slope lit from the opposite azimuth is darker
    dark = hillshade_kernel(plane, azimuth_deg=135, altitude_deg=45)
    assert dark.mean() < sh.mean()


def test_dem_hillshade_spark(spark):
    """Encoded DEM tiles -> hillshade tiles through the fused pass: a
    uniform inclined plane yields one uniform illumination value that
    matches the kernel run directly on the decoded heights."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.codecs import decode_image, encode_dem, encode_image
    from versatiles_rs_spark.operators.raster import dem_hillshade, hillshade_kernel

    y, x = np.mgrid[0:32, 0:32]
    heights = 10.0 + 0.25 * x + 0.25 * y
    dem_rgb = encode_dem(heights, schema="terrarium")
    pdf = pd.DataFrame(
        {"z": [3], "x": [1], "y": [2], "bytes": [encode_image(dem_rgb, "png")],
         "fmt": ["png"]}
    )
    df = spark.createDataFrame(pdf, schema="z int, x long, y long, bytes binary, fmt string")
    out = dem_hillshade(df, schema="terrarium").collect()
    assert len(out) == 1 and out[0].fmt == "png"
    img = decode_image(bytes(out[0].bytes))
    # terrarium quantizes to 1/256 m — the decoded plane is uniform enough
    # that every interior pixel shades identically
    want = hillshade_kernel(heights)
    assert img.shape[0] == 30 and (img[:, :, 0] == img[:, :, 1]).all()
    assert np.abs(img[:, :, 0].astype(int) - want.astype(int)).max() <= 1


def test_raster_crosstab_matches_global_brute_force(spark):
    """Tabulate Area parity: the distributed 2-D bincount over PNG tiles
    must equal a numpy cross-tab of the closed-form class surfaces."""
    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.fixtures import dem_value, landcover_value
    from versatiles_rs_spark.operators.raster import raster_crosstab

    n = 512
    g = np.arange(n, dtype=np.int64)
    a = dem_value(g[None, :], g[:, None]) // 32
    b = landcover_value(g[None, :], g[:, None])
    expected = {}
    for ca, cb in zip(a.ravel(), b.ravel()):
        expected[(int(ca), int(cb))] = expected.get((int(ca), int(cb)), 0) + 1

    tiles = fixtures.class_raster_df(spark, zoom=1, partitions=4)
    got = {
        (r.class_a, r.class_b): r.n_px
        for r in raster_crosstab(tiles, band_a=0, band_b=1, quant_a=32).collect()
    }
    assert got == expected
    assert sum(got.values()) == n * n  # every pixel counted exactly once


def test_zonal_percentiles_matches_bruteforce(spark):
    """Histogram-inversion percentiles == numpy sort nearest-rank; mode ==
    smallest among max-count values. Zones cover in-tile, straddling,
    whole-world and 1px cases."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_percentiles

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    zdefs = [
        (0, 10, 10, 60, 40),
        (1, 200, 200, 400, 300),
        (2, 0, 0, 1024, 1024),
        (3, 511, 511, 512, 512),
        (4, 700, 100, 1000, 900),
    ]
    zones = spark.createDataFrame(
        pd.DataFrame(zdefs, columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    got = {
        r.zone_id: (r.n_px, r.mode_val, r.p25, r.p50, r.p75)
        for r in zonal_percentiles(tiles, zones, tile_size=256).collect()
    }
    for zid, x0, y0, x1, y1 in zdefs:
        gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        v = np.sort(fixtures.zonal_value(gx, gy).astype(np.int64).ravel())
        n = v.size
        pick = lambda p: int(v[(p * n + 99) // 100 - 1])  # nearest-rank (1-based)
        counts = np.bincount(v)
        mode = int(np.nonzero(counts == counts.max())[0][0])
        assert got[zid] == (n, mode, pick(25), pick(50), pick(75)), zid


def test_zonal_percentiles_mode_tie_smallest(spark):
    """A zone whose values are a perfect tie across classes must report
    the smallest value as mode; p100 equals the max; p1 equals the min."""
    import pandas as pd

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_percentiles

    tiles = fixtures.zonal_raster_df(spark, zoom=1, partitions=2)
    # 251 divides 251*2=502-wide row band? keep it simple: whole world at
    # zoom 1 is 512x512; (7gx+13gy)%251 hits every residue — near-uniform
    # but with exact ties only where counts collide; assert p1/p100 law.
    zones = spark.createDataFrame(
        pd.DataFrame([(0, 0, 0, 512, 512)], columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    r = zonal_percentiles(tiles, zones, percentiles=(1, 100), tile_size=256).collect()[0]
    import numpy as np

    gx, gy = np.meshgrid(np.arange(512), np.arange(512))
    v = fixtures.zonal_value(gx, gy).astype(np.int64).ravel()
    assert r.p100 == int(v.max()) and r.p1 <= int(np.percentile(v, 1.5))
    counts = np.bincount(v)
    assert r.mode_val == int(np.nonzero(counts == counts.max())[0][0])


def test_zonal_correlation_matches_bruteforce(spark):
    import math

    import numpy as np
    import pandas as pd

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_correlation

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    zdefs = [
        (0, 10, 10, 60, 40),
        (1, 200, 200, 400, 300),   # crosses the 256 tile boundary
        (2, 700, 100, 1000, 900),  # multi-tile both axes
        (3, 511, 511, 512, 512),   # single pixel -> zero variance -> NULL r
    ]
    zones = spark.createDataFrame(
        pd.DataFrame(zdefs, columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    got = {
        r.zone_id: r.asDict()
        for r in zonal_correlation(
            tiles, zones, fixtures.dem_value, tile_size=256
        ).collect()
    }
    for zid, x0, y0, x1, y1 in zdefs:
        gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        a = fixtures.zonal_value(gx, gy).astype(np.int64)
        b = fixtures.dem_value(gx, gy).astype(np.int64)
        n = a.size
        sa, sb = int(a.sum()), int(b.sum())
        sab, sa2, sb2 = int((a * b).sum()), int((a * a).sum()), int((b * b).sum())
        g = got[zid]
        assert (g["n_px"], g["sum_a"], g["sum_b"], g["sum_ab"], g["sum_a2"],
                g["sum_b2"]) == (n, sa, sb, sab, sa2, sb2), zid
        cov, va, vb = n * sab - sa * sb, n * sa2 - sa * sa, n * sb2 - sb * sb
        assert (g["cov_n"], g["var_a_n"], g["var_b_n"]) == (cov, va, vb), zid
        if va > 0 and vb > 0:
            assert g["r_6"] == round(cov / math.sqrt(float(va) * float(vb)), 6), zid
        else:
            assert g["r_6"] is None, zid


def test_zonal_correlation_payload_never_in_shuffle(spark):
    import pandas as pd

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import zonal_correlation

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    zones = spark.createDataFrame(
        pd.DataFrame([(0, 0, 0, 100, 100)], columns=["zone_id", "x0", "y0", "x1", "y1"])
    )
    plan = (
        zonal_correlation(tiles, zones, fixtures.dem_value, tile_size=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes#" not in line, f"payload in shuffle: {line.strip()[:140]}"


def test_tile_ssim_identity_is_one_and_degradation_orders(spark):
    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import tile_ssim

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    ident = tile_ssim(tiles, lambda a: a).toPandas()
    assert (ident["ssim_6"] == 1.0).all()
    q17 = tile_ssim(tiles, lambda a: (a // 17) * 17).toPandas()
    q64 = tile_ssim(tiles, lambda a: (a // 64) * 64).toPandas()
    assert (q17["ssim_6"] < 1.0).all()
    # coarser quantization strictly hurts every tile
    m17 = q17.set_index(["x", "y"])["ssim_6"]
    m64 = q64.set_index(["x", "y"])["ssim_6"]
    assert (m64 < m17).all()


def test_tile_ssim_matches_formula_bruteforce(spark):
    import numpy as np

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import tile_ssim

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    got = {
        (r.x, r.y): r
        for r in tile_ssim(tiles, lambda a: (a // 17) * 17).collect()
    }
    c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
    for (x, y), r in got.items():
        gx, gy = np.meshgrid(
            np.arange(x * 256, (x + 1) * 256), np.arange(y * 256, (y + 1) * 256)
        )
        a = fixtures.zonal_value(gx, gy).astype(np.float64)
        b = (a.astype(np.int64) // 17 * 17).astype(np.float64)
        mu_a, mu_b = a.mean(), b.mean()
        va = (a * a).mean() - mu_a * mu_a
        vb = (b * b).mean() - mu_b * mu_b
        cov = (a * b).mean() - mu_a * mu_b
        want = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
            (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
        )
        assert abs(r.ssim_6 - want) < 2e-6, (x, y)


def test_tile_ssim_payload_never_in_shuffle(spark):
    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.operators.raster import tile_ssim

    tiles = fixtures.zonal_raster_df(spark, zoom=2, partitions=4)
    plan = (
        tile_ssim(tiles, lambda a: a)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes#" not in line, f"payload in shuffle: {line.strip()[:140]}"


def test_mdow_hillshade_kernel_laws():
    """MDOW pixel kernel (gdaldem -multidirectional): flat terrain gets
    the uniform cos(zenith) value (weights always sum to 2 exactly, so
    no flat special case is needed); a plane is the manual four-lamp
    blend; output bounded."""
    import numpy as np

    from versatiles_rs_spark.operators.raster import (
        hillshade_kernel,
        mdow_hillshade_kernel,
    )

    flat = np.full((16, 16), 100.0)
    sh = mdow_hillshade_kernel(flat, altitude_deg=45)
    assert sh.shape == (14, 14)
    assert (sh == int(np.cos(np.deg2rad(45)) * 255)).all()

    y, x = np.mgrid[0:16, 0:16]
    plane = 0.5 * x.astype(np.float64)
    # manual blend: aspect of a +x gradient is atan2(0, -0.5) = pi
    zen = np.deg2rad(45.0)
    slope = np.arctan(0.5)
    acc = 0.0
    for az_deg in (225.0, 270.0, 315.0, 360.0):
        az = np.deg2rad(360.0 - az_deg + 90.0)
        s = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(az - np.pi)
        acc += np.sin(az - np.pi) ** 2 * max(s, 0.0)
    want = int(np.clip(acc / 2.0 * 255.0, 0, 255))
    got = mdow_hillshade_kernel(plane, altitude_deg=45)
    assert (got == want).all()
    # the blend is not the single-lamp render (plane is lit differently)
    single = hillshade_kernel(plane, azimuth_deg=315, altitude_deg=45)
    assert got.max() <= 255 and not (got == single).all()


def test_tile_value_hist_and_entropy_laws(spark):
    """Histogram op parity + exact-entropy laws: the fixture histogram
    matches numpy bincount per tile; a constant tile scores entropy 0 and
    a perfectly uniform 256-value tile scores EXACTLY 8 * 2^20 (both logs
    hit exact powers of two, so the fixed-point floor is lossless)."""
    import numpy as np

    from versatiles_rs_spark import fixtures
    from versatiles_rs_spark.codecs import encode_png
    from versatiles_rs_spark.fixtures import dem_value
    from versatiles_rs_spark.operators.raster import tile_value_hist
    from versatiles_rs_spark.udfs import log2_fp_stages
    from pyspark.sql import functions as F

    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=2)
    got = {
        (r["x"], r["y"], r["v"]): r["c"] for r in tile_value_hist(tiles).collect()
    }
    for tx in range(2):
        for ty in range(2):
            gx = np.arange(tx * 256, (tx + 1) * 256, dtype=np.int64)
            gy = np.arange(ty * 256, (ty + 1) * 256, dtype=np.int64)
            counts = np.bincount(dem_value(gx[None, :], gy[:, None]).ravel())
            for v in np.nonzero(counts)[0]:
                assert got[(tx, ty, int(v))] == int(counts[v])

    def entropy_fp(img):
        arr = np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)
        df = spark.createDataFrame(
            [(0, 0, bytes(encode_png(arr)))], "x long, y long, bytes binary"
        )
        cur = tile_value_hist(df)
        for name, expr in log2_fp_stages(20, x_col="c"):
            cur = cur.withColumn(name, F.expr(expr))
        agg = cur.groupBy("x", "y").agg(
            F.sum("c").alias("n_px"), F.sum(F.col("c") * F.col("lg")).alias("term")
        )
        for name, expr in log2_fp_stages(20, x_col="n_px"):
            agg = agg.withColumn(name, F.expr(expr))
        return agg.select(
            (F.col("lg") - F.expr("term div n_px")).alias("e")
        ).collect()[0]["e"]

    assert entropy_fp(np.full((256, 256), 7, dtype=np.int64)) == 0
    uniform = np.arange(65536, dtype=np.int64).reshape(256, 256) % 256
    assert entropy_fp(uniform) == 8 * (1 << 20)
