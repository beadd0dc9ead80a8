"""Moran's I + LISA (functions/moran.py) and marker clustering
(functions/clusters.py): numpy reference parity, closed-form weight
constants vs brute-force weight matrices, quadrant semantics, cluster
pyramid invariants, plan gates."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.clusters import marker_cluster_pyramid
from versatiles_rs_spark.functions.moran import grid_constants, local_moran, morans_i


def _grid(points, zoom):
    dim = 1 << zoom
    grid = np.zeros((dim, dim), dtype=np.int64)
    for lon, lat in points:
        xf = dim * (lon / 360.0 + 0.5)
        yf = dim * (
            0.5 - 0.5 * math.log(math.tan(lat * math.pi / 360.0 + math.pi / 4.0)) / math.pi
        )
        grid[min(max(int(math.floor(xf)), 0), dim - 1),
             min(max(int(math.floor(yf)), 0), dim - 1)] += 1
    return grid


def _brute_moran(grid):
    """Textbook O(n^2)-free dense reference: explicit queen-weight loops."""
    dim = grid.shape[0]
    n = dim * dim
    x = grid.astype(np.float64)
    xbar = x.sum() / n
    dev = x - xbar
    num = 0.0
    s0 = 0
    for i in range(dim):
        for j in range(dim):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == 0 and dj == 0:
                        continue
                    ii, jj = i + di, j + dj
                    if 0 <= ii < dim and 0 <= jj < dim:
                        s0 += 1
                        num += dev[i, j] * dev[ii, jj]
    den = (dev * dev).sum()
    return (n / s0) * num / den, s0


def _rng_points(seed=7, n=400):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    # plant a multi-cell hot blob (sigma ~ a zoom-4 cell) so neighboring
    # cells are jointly dense and I is decisively positive
    k = min(120, n // 2)
    lon[:k] = np.clip(rng.normal(10.0, 14.0, k), -179, 179)
    lat[:k] = np.clip(rng.normal(20.0, 9.0, k), -80, 80)
    return list(zip(lon.tolist(), lat.tolist()))


def _points_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(pts, columns=["lon", "lat"]), schema="lon double, lat double"
    )


def test_grid_constants_match_brute_weights():
    for zoom in (1, 2, 3):
        dim = 1 << zoom
        g = grid_constants(zoom)
        deg = np.zeros((dim, dim), dtype=np.int64)
        for i in range(dim):
            for j in range(dim):
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        if (di or dj) and 0 <= i + di < dim and 0 <= j + dj < dim:
                            deg[i, j] += 1
        assert g["s0"] == deg.sum()
        assert g["s1"] == 2 * deg.sum()
        assert g["s2"] == int((4 * deg.astype(np.int64) ** 2).sum())


def test_global_moran_matches_numpy_reference(spark):
    zoom = 4
    pts = _rng_points()
    row = morans_i(_points_df(spark, pts), zoom=zoom).collect()[0]
    ref_i, ref_s0 = _brute_moran(_grid(pts, zoom))
    assert row.s0 == ref_s0
    assert abs(row.i - ref_i) < 1e-6
    assert row.i > 0.05  # planted blob -> clustered
    g = grid_constants(zoom)
    # row.i is rounded to 6 places but z was computed from the unrounded i
    assert abs(row.z - (row.i - g["e_i"]) / math.sqrt(g["var_i"])) < 2e-5


def test_local_moran_matches_numpy_reference(spark):
    zoom = 4
    pts = _rng_points(seed=11)
    rows = {(r.x, r.y): r for r in local_moran(_points_df(spark, pts), zoom=zoom).collect()}
    grid = _grid(pts, zoom)
    dim = 1 << zoom
    n = dim * dim
    xbar = grid.sum() / n
    m2 = ((grid.astype(np.float64) - xbar) ** 2).sum() / n  # empties included
    # m2 over the full grid: occupied dev^2 + empty count * xbar^2
    occ = grid[grid > 0]
    m2 = (((occ - xbar) ** 2).sum() + (n - len(occ)) * xbar * xbar) / n
    seen = 0
    for i in range(dim):
        for j in range(dim):
            if grid[i, j] == 0:
                continue
            lag = deg = 0
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if (di or dj) and 0 <= i + di < dim and 0 <= j + dj < dim:
                        lag += int(grid[i + di, j + dj])
                        deg += 1
            r = rows[(i, j)]
            seen += 1
            assert r.cnt == grid[i, j] and r.lag == lag and r.deg == deg
            ref_ii = (grid[i, j] - xbar) * (lag - deg * xbar) / m2
            assert abs(r.ii - ref_ii) < 1e-5
            zdev = grid[i, j] - xbar
            ldev = lag - deg * xbar
            want = (
                "HH" if zdev > 0 and ldev > 0
                else "LL" if zdev < 0 and ldev < 0
                else "HL" if zdev > 0 and ldev < 0
                else "LH" if zdev < 0 and ldev > 0
                else "NS"
            )
            assert r.quad == want, (i, j)
    assert seen == len(rows)


def test_lisa_quadrants_on_planted_surface(spark):
    # hot blob cells should be HH; a lone far-away point is a low-lag cell
    pts = _rng_points(seed=3)
    df = local_moran(_points_df(spark, pts), zoom=4).toPandas()
    hot = df.sort_values("cnt", ascending=False).iloc[0]
    assert hot.quad == "HH" and hot.ii > 0


def test_marker_cluster_pyramid_invariants(spark):
    pts = _rng_points(seed=5, n=300)
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, lon, lat) for i, (lon, lat) in enumerate(pts)],
            columns=["id", "lon", "lat"],
        ),
        schema="id long, lon double, lat double",
    )
    out = marker_cluster_pyramid(df, id_col="id", min_zoom=2, max_zoom=6).toPandas()
    for z, grp in out.groupby("z"):
        # every zoom partitions all the points
        assert grp.n_points.sum() == 300
    # parent count = sum of child counts; parent id = min of child ids
    kids = out[out.z == 6]
    parents = out[out.z == 5].set_index(["x", "y"])
    agg = kids.assign(px=kids.x // 2, py=kids.y // 2).groupby(["px", "py"]).agg(
        n=("n_points", "sum"), cid=("cluster_id", "min")
    )
    for (px, py), row in agg.iterrows():
        p = parents.loc[(px, py)]
        assert p.n_points == row.n and p.cluster_id == row.cid
    # centroid is the quantized weighted mean (floor-division contract)
    one = kids.sort_values("n_points", ascending=False).iloc[0]
    members = [
        (i, lon, lat)
        for i, (lon, lat) in enumerate(pts)
        if _grid([(lon, lat)], 6)[int(one.x), int(one.y)] == 1
    ]
    assert len(members) == one.n_points
    sx = sum(math.floor((lon + 180.0) * 1e7) for _, lon, _ in members)
    sy = sum(math.floor((lat + 90.0) * 1e7) for _, _, lat in members)
    assert one.lon == (sx // len(members)) / 1e7 - 180.0
    assert one.lat == (sy // len(members)) / 1e7 - 90.0
    assert one.cluster_id == min(i for i, _, _ in members)


def test_moran_plans_stay_jvm_side(spark):
    pts = _rng_points(seed=9, n=50)
    df = _points_df(spark, pts)
    for frame in (
        morans_i(df, zoom=4),
        local_moran(df, zoom=4),
        marker_cluster_pyramid(df.withColumn("id", F.monotonically_increasing_id()),
                               id_col="id", min_zoom=3, max_zoom=5),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bivariate_moran_matches_numpy_reference(spark):
    from versatiles_rs_spark.functions.moran import bivariate_morans_i

    zoom = 4
    # y = x shifted by one cell -> strong positive cross-autocorrelation
    ptsx = _rng_points(seed=21, n=300)
    ptsy = [(min(lon + 22.5, 179.0), lat) for lon, lat in ptsx]
    row = bivariate_morans_i(
        _points_df(spark, ptsx), _points_df(spark, ptsy), zoom=zoom
    ).collect()[0]
    gx, gy = _grid(ptsx, zoom), _grid(ptsy, zoom)
    dim = 1 << zoom
    n = dim * dim
    xbar, ybar = gx.sum() / n, gy.sum() / n
    num = 0.0
    s0 = 0
    for i in range(dim):
        for j in range(dim):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == 0 and dj == 0:
                        continue
                    ii, jj = i + di, j + dj
                    if 0 <= ii < dim and 0 <= jj < dim:
                        s0 += 1
                        num += (gx[i, j] - xbar) * (gy[ii, jj] - ybar)
    denx = ((gx - xbar) ** 2).sum()
    deny = ((gy - ybar) ** 2).sum()
    ref = (n / s0) * num / math.sqrt(denx * deny)
    assert abs(row.i_xy - ref) < 1e-6
    assert row.i_xy > 0.1  # adjacent-cell shift -> clustered cross-surface


def test_kde_heatmap_matches_numpy_convolution(spark):
    from versatiles_rs_spark.functions.kde import binomial_kernel, kde_heatmap

    zoom, radius = 4, 2
    pts = _rng_points(seed=31, n=250)
    out = {(r.x, r.y): r.density for r in kde_heatmap(
        _points_df(spark, pts), zoom=zoom, radius=radius
    ).collect()}
    grid = _grid(pts, zoom)
    w = np.array(binomial_kernel(radius), dtype=np.int64)
    kern = np.outer(w, w)
    dim = 1 << zoom
    ref = np.zeros((dim, dim), dtype=np.int64)
    for i in range(dim):
        for j in range(dim):
            if grid[i, j] == 0:
                continue
            for di in range(-radius, radius + 1):
                for dj in range(-radius, radius + 1):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < dim and 0 <= jj < dim:
                        ref[ii, jj] += grid[i, j] * kern[di + radius, dj + radius]
    for (x, y), d in out.items():
        assert ref[x, y] == d
    assert sum(out.values()) == int(ref.sum())
    assert len(out) == int((ref > 0).sum())


def test_stkde_matches_numpy_3d_convolution(spark):
    """stkde_heatmap == a dense 3-D numpy convolution: space clips to the
    grid, time bins spill one past the data range; absolute epoch bins."""
    from versatiles_rs_spark.functions.kde import binomial_kernel, stkde_heatmap

    zoom, radius, t_radius = 4, 2, 1
    bin_us = 86_400 * 1_000_000  # 1-day bins
    pts = _rng_points(seed=61, n=300)
    rng = np.random.default_rng(62)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    ts_us = base_us + rng.integers(0, 10 * 86_400, 300) * 1_000_000
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "lon": [p[0] for p in pts],
                "lat": [p[1] for p in pts],
                "ts": pd.to_datetime(ts_us, unit="us"),
            }
        ),
        schema="lon double, lat double, ts timestamp_ntz",
    )
    out = {
        (r.x, r.y, r.tbin): r.density
        for r in stkde_heatmap(
            df, zoom=zoom, bin_micros=bin_us, radius=radius, t_radius=t_radius
        ).collect()
    }

    dim = 1 << zoom
    t0 = base_us // bin_us
    nt = 10  # occupied day-bins t0 .. t0+9
    cube = np.zeros((dim, dim, nt + 2), dtype=np.int64)  # +1 spill each end
    for (lon, lat), us in zip(pts, ts_us.tolist()):
        xf = dim * (lon / 360.0 + 0.5)
        yf = dim * (
            0.5
            - 0.5 * math.log(math.tan(lat * math.pi / 360.0 + math.pi / 4.0)) / math.pi
        )
        x = min(max(int(math.floor(xf)), 0), dim - 1)
        y = min(max(int(math.floor(yf)), 0), dim - 1)
        cube[x, y, us // bin_us - t0 + 1] += 1
    w = np.array(binomial_kernel(radius), dtype=np.int64)
    wt = np.array(binomial_kernel(t_radius), dtype=np.int64)
    ref = np.zeros_like(cube)
    xs, ys, ts = np.nonzero(cube)
    for x, y, t in zip(xs, ys, ts):
        c = cube[x, y, t]
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                for dt in range(-t_radius, t_radius + 1):
                    xx, yy, tt = x + dx, y + dy, t + dt
                    if 0 <= xx < dim and 0 <= yy < dim and 0 <= tt < nt + 2:
                        ref[xx, yy, tt] += (
                            c * w[dx + radius] * w[dy + radius] * wt[dt + t_radius]
                        )
    assert len(out) == int((ref > 0).sum())
    for (x, y, tb), d in out.items():
        assert ref[x, y, tb - t0 + 1] == d
    # time spill: bins before the first / after the last occupied bin exist
    tbs = {tb for (_, _, tb) in out}
    assert min(tbs) == t0 - 1 and max(tbs) == t0 + nt


def test_kde_and_bivariate_plans_stay_jvm_side(spark):
    from versatiles_rs_spark.functions.kde import kde_heatmap
    from versatiles_rs_spark.functions.moran import bivariate_morans_i

    from versatiles_rs_spark.functions.kde import stkde_heatmap

    pts = _rng_points(seed=41, n=60)
    df = _points_df(spark, pts)
    df_t = df.withColumn("ts", F.to_timestamp(F.lit("2024-01-05 00:00:00")))
    for frame in (
        kde_heatmap(df, zoom=4),
        stkde_heatmap(df_t, zoom=4),
        bivariate_morans_i(df, df, zoom=4),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_heatmap_and_cluster_tile_payloads_decode(spark):
    """The serving compositions' MVT payloads round-trip: layer name,
    feature count, geometry type, and the value property survive decode
    (the oracle verifies the per-tile stats; this pins the bytes)."""
    import pandas as pd

    from versatiles_rs_spark.functions.clusters import marker_cluster_pyramid
    from versatiles_rs_spark.functions.kde import kde_heatmap
    from versatiles_rs_spark.vector_tile import (
        POINT,
        POLYGON,
        cells_to_choropleth_tiles,
        decode_tile_payload,
        points_to_vector_tiles,
    )

    pts = _rng_points(seed=51, n=200)
    df = _points_df(spark, pts)

    cells = kde_heatmap(df, zoom=6, radius=2)
    heat = cells_to_choropleth_tiles(
        cells.select("x", "y", "density"), cell_zoom=6, render_zoom=4,
        value_cols=("density",), layer="heat",
    ).collect()
    assert heat
    layers, _fmt = decode_tile_payload(bytes(heat[0].bytes))
    (layer,) = layers
    assert layer["name"] == "heat" and len(layer["features"]) == heat[0].n_features
    f = layer["features"][0]
    assert f["type"] == POLYGON and int(f["props"]["density"]) > 0

    bubbles = marker_cluster_pyramid(
        df.withColumn("id", F.monotonically_increasing_id()),
        id_col="id", min_zoom=8, max_zoom=8,
    )
    ctiles = points_to_vector_tiles(
        bubbles.select(
            F.col("cluster_id").alias("feature_id"), "lon", "lat",
            F.create_map(F.lit("n"), F.col("n_points").cast("string")).alias("props"),
        ),
        zoom=5, layer="clusters",
    ).collect()
    assert ctiles
    (clayer,), _fmt = decode_tile_payload(bytes(ctiles[0].bytes))
    assert clayer["name"] == "clusters"
    cf = clayer["features"][0]
    assert cf["type"] == POINT and int(cf["props"]["n"]) >= 1


def _brute_geary(grid):
    """Textbook Geary's C: explicit queen-weight difference loops."""
    dim = grid.shape[0]
    n = dim * dim
    x = grid.astype(np.float64)
    xbar = x.sum() / n
    num = 0.0
    s0 = 0
    for i in range(dim):
        for j in range(dim):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == 0 and dj == 0:
                        continue
                    ii, jj = i + di, j + dj
                    if 0 <= ii < dim and 0 <= jj < dim:
                        s0 += 1
                        num += (x[i, j] - x[ii, jj]) ** 2
    den = ((x - xbar) ** 2).sum()
    return (n - 1) * num / (2.0 * s0 * den), s0


def test_gearys_c_matches_numpy_reference(spark):
    from versatiles_rs_spark.functions.moran import gearys_c

    zoom = 4
    pts = _rng_points()
    row = gearys_c(_points_df(spark, pts), zoom=zoom).collect()[0]
    ref_c, ref_s0 = _brute_geary(_grid(pts, zoom))
    assert row.s0 == ref_s0
    assert abs(row.c - ref_c) < 1e-6
    assert row.c < 1.0  # planted blob -> clustered -> C below its E[C]=1
    assert row.z < 0.0
    # integer identity: sum_ij w_ij (x_i - x_j)^2 = 2*(B2 - A), exact
    g = _grid(pts, zoom).astype(np.int64)
    dim = g.shape[0]
    brute_num = 0
    for i in range(dim):
        for j in range(dim):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if (di or dj) and 0 <= i + di < dim and 0 <= j + dj < dim:
                        brute_num += int(g[i, j] - g[i + di, j + dj]) ** 2
    assert brute_num == 2 * (row.b2 - row.a)


def test_geary_plan_stays_jvm_side(spark):
    from versatiles_rs_spark.functions.moran import gearys_c

    df = gearys_c(_points_df(spark, _rng_points(n=50)), zoom=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_idw_fill_matches_numpy_reference(spark):
    from versatiles_rs_spark.functions.idw import OFFSETS, idw_fill

    # exact lcm weights: 40/d2 for every ring-2 offset
    assert sorted({w for _, _, w in OFFSETS}) == [5, 8, 10, 20, 40]
    assert all(w * (dx * dx + dy * dy) == 40 for dx, dy, w in OFFSETS)
    assert len(OFFSETS) == 24

    zoom = 4
    pts = _rng_points(n=300)
    rows = {(r.x, r.y): r for r in idw_fill(_points_df(spark, pts), zoom=zoom).collect()}
    g = _grid(pts, zoom)
    dim = g.shape[0]
    expected = {}
    for x in range(dim):
        for y in range(dim):
            if g[x, y] != 0:
                continue
            num = den = 0
            for dx, dy, w in OFFSETS:
                tx, ty = x + dx, y + dy
                if 0 <= tx < dim and 0 <= ty < dim and g[tx, ty] != 0:
                    num += w * int(g[tx, ty])
                    den += w
            if den:
                expected[(x, y)] = (num, den, num * 1000 // den)
    assert rows.keys() == expected.keys()
    for key, (num, den, est) in expected.items():
        r = rows[key]
        assert (r.num, r.den, r.est_milli) == (num, den, est)
    # occupied cells never appear
    occ = {(x, y) for x in range(dim) for y in range(dim) if g[x, y]}
    assert not (rows.keys() & occ)


def test_idw_plan_stays_jvm_side(spark):
    from versatiles_rs_spark.functions.idw import idw_fill

    df = idw_fill(_points_df(spark, _rng_points(n=60)), zoom=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
