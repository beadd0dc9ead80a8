"""Raster polygonize (operators/polygonize.py).

Ground truth for the edge set is the single-global-array extraction: the
whole mosaic as one numpy zone grid, neighbor known everywhere (so no
cancellation step is needed).  The distributed tile-local extraction +
groupBy cancellation must reproduce it exactly.  Ring chaining is
verified on closed-form zone layouts (donut -> Polygon with hole,
island -> MultiPolygon) plus the area-conservation invariant: a zone's
signed ring areas sum to its cell count."""
import numpy as np
import pandas as pd
import pytest

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.operators.polygonize import (
    polygonize_features,
    zone_boundary_edges,
)
from versatiles_rs_spark.outline import ring_signed_area


def global_zone_edges(z: np.ndarray) -> set:
    """Brute-force per-zone directed boundary edges over one global zone
    grid (cells (gx, gy) = (col, row))."""
    H, W = z.shape
    p = np.full((H + 2, W + 2), np.int64(-(1 << 62)), dtype=np.int64)
    p[1:-1, 1:-1] = z
    out = set()
    for r in range(H):
        for c in range(W):
            zv = int(z[r, c])
            for dr, dc, sxo, syo, exo, eyo in (
                (1, 0, 0, 1, 1, 1),
                (0, 1, 1, 1, 1, 0),
                (-1, 0, 1, 0, 0, 0),
                (0, -1, 0, 0, 0, 1),
            ):
                if p[1 + r + dr, 1 + c + dc] != zv:
                    out.add((zv, c + sxo, r + syo, c + exo, r + eyo))
    return out


def zones32(v: np.ndarray) -> np.ndarray:
    return v // 32


def test_spark_edges_match_global(spark):
    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=4)
    # lambda (pickled by value) — a test-module function can't import on workers
    got = {
        (int(r.zone), int(r.sx), int(r.sy), int(r.ex), int(r.ey))
        for r in zone_boundary_edges(tiles, lambda v: v // 32).collect()
    }
    gx = np.arange(512, dtype=np.int64)
    world = fixtures.dem_value(gx[None, :], gx[:, None])
    want = global_zone_edges(zones32(world))
    assert got == want
    assert len({z for z, *_ in got}) > 1  # several elevation bands exist


def _edges_df(z: np.ndarray) -> pd.DataFrame:
    rows = sorted(global_zone_edges(z))
    return pd.DataFrame(rows, columns=["zone", "sx", "sy", "ex", "ey"])


def test_features_donut_and_island():
    # zone 0 background, zone 1 annulus, zone 0 island inside it
    z = np.zeros((12, 12), dtype=np.int64)
    z[2:9, 3:10] = 1
    z[4:7, 5:8] = 0
    feats = {f["properties"]["zone"]: f for f in polygonize_features(_edges_df(z))}
    g1 = feats[1]["geometry"]
    assert g1["type"] == "Polygon" and len(g1["coordinates"]) == 2  # ring + hole
    g0 = feats[0]["geometry"]
    assert g0["type"] == "MultiPolygon" and len(g0["coordinates"]) == 2
    parts0 = sorted(len(p) for p in g0["coordinates"])
    assert parts0 == [1, 2]  # island solid, background carries the hole


def test_features_area_conservation():
    rng = np.random.default_rng(11)
    z = rng.integers(0, 3, size=(16, 16)).astype(np.int64)
    edges = _edges_df(z)
    feats = polygonize_features(edges)
    for f in feats:
        zone = f["properties"]["zone"]
        g = f["geometry"]
        polys = [g["coordinates"]] if g["type"] == "Polygon" else g["coordinates"]
        area = sum(
            ring_signed_area([tuple(p) for p in ring])
            for poly in polys
            for ring in poly
        )
        assert area == (z == zone).sum()


def test_diagonal_pinch_stays_two_rings():
    # two cells of the same zone touching only at a corner: the pinch
    # rule must keep them as two simple rings (one MultiPolygon)
    z = np.zeros((4, 4), dtype=np.int64)
    z[1, 1] = z[2, 2] = 7
    feats = {f["properties"]["zone"]: f for f in polygonize_features(_edges_df(z))}
    g = feats[7]["geometry"]
    assert g["type"] == "MultiPolygon" and len(g["coordinates"]) == 2


def test_relation_polygonize_matches_fn_polygonize(spark):
    """zone_edges_from_relation (pure-JVM rook joins) over the full cell
    relation == the tile-decode extraction for the same zones."""
    from versatiles_rs_spark.operators.polygonize import zone_edges_from_relation

    tiles = fixtures.dem_raster_df(spark, zoom=1, partitions=4)
    via_fn = {
        (int(r.zone), int(r.sx), int(r.sy), int(r.ex), int(r.ey))
        for r in zone_boundary_edges(tiles, lambda v: v // 32).collect()
    }
    gx = np.arange(512, dtype=np.int64)
    world = fixtures.dem_value(gx[None, :], gx[:, None]) // 32
    pdf = pd.DataFrame({"gx": np.tile(gx, 512), "gy": np.repeat(gx, 512)})
    pdf["zone"] = world[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()]
    cells = spark.createDataFrame(pdf)
    via_rel = {
        (int(r.zone), int(r.sx), int(r.sy), int(r.ex), int(r.ey))
        for r in zone_edges_from_relation(cells).collect()
    }
    assert via_rel == via_fn
