"""Getis-Ord Gi* hotspots (functions/hotspots.py): numpy reference parity,
edge-cell weights, statistical direction, plan gates."""

import math

import numpy as np
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.hotspots import getis_ord_hotspots


def _brute_gi(points, zoom):
    """Dense-grid numpy reference of the statistic."""
    dim = 1 << zoom
    grid = np.zeros((dim, dim), dtype=np.int64)
    for lon, lat in points:
        xf = dim * (lon / 360.0 + 0.5)
        yf = dim * (
            0.5 - 0.5 * math.log(math.tan(lat * math.pi / 360.0 + math.pi / 4.0)) / math.pi
        )
        x = min(max(int(math.floor(xf)), 0), dim - 1)
        y = min(max(int(math.floor(yf)), 0), dim - 1)
        grid[x, y] += 1
    n = dim * dim
    tot = grid.sum()
    tot2 = (grid.astype(np.float64) ** 2).sum()
    xbar = tot / n
    s = math.sqrt(tot2 / n - xbar * xbar)
    out = {}
    for x in range(dim):
        for y in range(dim):
            if grid[x, y] == 0:
                continue
            x0, x1 = max(0, x - 1), min(dim - 1, x + 1)
            y0, y1 = max(0, y - 1), min(dim - 1, y + 1)
            nbr = int(grid[x0 : x1 + 1, y0 : y1 + 1].sum())
            wi = (x1 - x0 + 1) * (y1 - y0 + 1)
            gi = (nbr - xbar * wi) / (s * math.sqrt((n * wi - wi * wi) / (n - 1.0)))
            out[(x, y)] = (int(grid[x, y]), nbr, wi, round(gi, 6))
    return out


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "lon double, lat double"
    )


def test_numpy_parity_random_field(spark):
    rng = np.random.RandomState(11)
    pts = list(zip(rng.uniform(-170, 170, 400), rng.uniform(-80, 80, 400)))
    # plant a hotspot: 60 points in one small box
    pts += list(zip(rng.uniform(10, 11, 60), rng.uniform(10, 11, 60)))
    got = {
        (r["x"], r["y"]): (r["cnt"], r["nbr_sum"], r["wi"], r["gi"])
        for r in getis_ord_hotspots(_pts_df(spark, pts), zoom=4).collect()
    }
    want = _brute_gi(pts, 4)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) <= 1e-6, (k, got[k], want[k])
    # the planted box is the global maximum and clearly hot
    hot = max(got.items(), key=lambda kv: kv[1][3])
    assert hot[1][3] > 2.0


def test_edge_cells_reduced_weight(spark):
    # a point in each grid corner at zoom 2: wi must be 4 (2x2), not 9
    pts = [(-179.9, 84.0), (179.9, 84.0), (-179.9, -84.0), (179.9, -84.0)]
    rows = getis_ord_hotspots(_pts_df(spark, pts), zoom=2).collect()
    assert len(rows) == 4
    assert {r["wi"] for r in rows} == {4}
    assert {(r["x"], r["y"]) for r in rows} == {(0, 0), (3, 0), (0, 3), (3, 3)}


def test_cold_uniform_field_near_zero(spark):
    # one point per cell of the whole zoom-3 grid: every neighborhood is
    # exactly average, Gi* == 0 everywhere
    dim = 8
    pts = []
    for x in range(dim):
        for y in range(dim):
            lon = (x + 0.5) / dim * 360.0 - 180.0
            yf = (y + 0.5) / dim
            lat = math.degrees(2.0 * math.atan(math.exp((0.5 - yf) * 2.0 * math.pi)) - math.pi / 2.0)
            pts.append((lon, lat))
    rows = getis_ord_hotspots(_pts_df(spark, pts), zoom=3).collect()
    assert len(rows) == 64
    assert all(r["gi"] == 0.0 for r in rows)


def test_plan_gates(spark):
    df = _pts_df(spark, [(0.0, 0.0), (1.0, 1.0)])
    plan = (
        getis_ord_hotspots(df, zoom=4)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # global stats ride a broadcast, not a shuffle of the cell relation
    assert "BroadcastNestedLoopJoin" in plan


def test_choropleth_tiles_payload_roundtrip(spark):
    """cells_to_choropleth_tiles: exact square polygons, value props,
    deterministic bytes, parent-tile grouping."""
    from versatiles_rs_spark.vector_tile import (
        cells_to_choropleth_tiles,
        decode_vector_tile,
    )

    cells = spark.createDataFrame(
        [(0, 0, 1.5), (1, 0, -0.25), (5, 6, 3.125), (63, 63, 0.0)],
        "x long, y long, gi double",
    )
    tiles = cells_to_choropleth_tiles(cells, cell_zoom=6, render_zoom=4)
    rows = {(r["z"], r["x"], r["y"]): r for r in tiles.collect()}
    # cells (0,0),(1,0) -> tile (4,0,0); (5,6) -> (4,1,1); (63,63) -> (4,15,15)
    assert set(rows) == {(4, 0, 0), (4, 1, 1), (4, 15, 15)}
    assert rows[(4, 0, 0)]["n_features"] == 2
    layers = decode_vector_tile(bytes(rows[(4, 0, 0)]["bytes"]))
    assert len(layers) == 1 and layers[0]["name"] == "cells"
    feats = layers[0]["features"]
    assert len(feats) == 2
    # cell (0,0): 1024px square at origin (extent 4096, dz=2)
    f0 = feats[0]
    ring = f0["geometry"][0]
    assert set(ring[:4]) == {(0, 0), (1024, 0), (1024, 1024), (0, 1024)}
    assert f0["props"]["gi"] == "1.5"
    # cell (1,0) sits one cell east
    assert (2048, 0) in feats[1]["geometry"][0]
    # determinism: rebuilding yields identical bytes
    again = {
        (r["z"], r["x"], r["y"]): bytes(r["bytes"]) for r in tiles.collect()
    }
    assert again[(4, 0, 0)] == bytes(rows[(4, 0, 0)]["bytes"])


def test_choropleth_guard_rails(spark):
    from versatiles_rs_spark.vector_tile import cells_to_choropleth_tiles
    import pytest as _pytest

    cells = spark.createDataFrame([(0, 0, 1.0)], "x long, y long, gi double")
    with _pytest.raises(ValueError):
        cells_to_choropleth_tiles(cells, cell_zoom=4, render_zoom=6)
