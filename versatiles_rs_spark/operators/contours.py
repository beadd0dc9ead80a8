"""Contour-line extraction from DEM tiles (gdal_contour analog).

Marching squares with linear edge interpolation, vectorized per case over
the whole grid (no per-pixel Python loop), then exact endpoint chaining
into polylines — exact because a cell edge shared by two neighboring
cells interpolates the crossing from the SAME two corner values with the
same expression, so the floats match bit-for-bit and chaining needs no
epsilon.

Saddle cells (diagonal corners above the level) disambiguate by the cell
center mean — the standard marching-squares rule.

The operator (`dem_contours`) is one fused Arrow pass per tile: decode
the DEM payload, march each requested level, emit one row per polyline
with xs/ys arrays in PIXEL coordinates (callers scale by tile extent).
Downstream composition: functions/simplify.py generalizes per zoom and
vector_tile.py encodes to MVT — DEM -> contours -> simplify -> MVT is the
terrain-vector pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..codecs import decode_image

# case -> list of (edge_a, edge_b) segments; edges: 0=AB top, 1=BC right,
# 2=CD bottom, 3=DA left; corner bits: A(x,y)=1, B(x+1,y)=2, C(x+1,y+1)=4,
# D(x,y+1)=8 set when the corner is above the level
_CASE_EDGES: dict[int, list[tuple[int, int]]] = {
    1: [(0, 3)], 14: [(0, 3)],
    2: [(0, 1)], 13: [(0, 1)],
    3: [(3, 1)], 12: [(3, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    6: [(0, 2)], 9: [(0, 2)],
    7: [(2, 3)], 8: [(2, 3)],
}


def _edge_points(edge: int, jj: np.ndarray, ii: np.ndarray, level: float,
                 za, zb, zc, zd) -> tuple[np.ndarray, np.ndarray]:
    """Interpolated crossing of `edge` for cells at (jj, ii)."""
    if edge == 0:  # AB: (j,i)-(j+1,i)
        t = (level - za) / (zb - za)
        return jj + t, ii.astype(np.float64)
    if edge == 1:  # BC: (j+1,i)-(j+1,i+1)
        t = (level - zb) / (zc - zb)
        return (jj + 1).astype(np.float64), ii + t
    if edge == 2:  # CD: (j,i+1)-(j+1,i+1)
        t = (level - zd) / (zc - zd)
        return jj + t, (ii + 1).astype(np.float64)
    t = (level - za) / (zd - za)  # DA: (j,i)-(j,i+1)
    return jj.astype(np.float64), ii + t


def contour_segments(h: np.ndarray, level: float) -> list[tuple[tuple, tuple]]:
    """All contour segments of `h` at `level` as ((x1,y1),(x2,y2)) pairs."""
    za = h[:-1, :-1]
    zb = h[:-1, 1:]
    zc = h[1:, 1:]
    zd = h[1:, :-1]
    case = (
        (za > level).astype(np.int8)
        | ((zb > level).astype(np.int8) << 1)
        | ((zc > level).astype(np.int8) << 2)
        | ((zd > level).astype(np.int8) << 3)
    )
    segs: list[tuple[tuple, tuple]] = []

    def emit(mask: np.ndarray, pairs: list[tuple[int, int]]) -> None:
        ii, jj = np.nonzero(mask)
        if not len(ii):
            return
        a, b, c, d = za[ii, jj], zb[ii, jj], zc[ii, jj], zd[ii, jj]
        for ea, eb in pairs:
            x1, y1 = _edge_points(ea, jj, ii, level, a, b, c, d)
            x2, y2 = _edge_points(eb, jj, ii, level, a, b, c, d)
            segs.extend(
                ((float(x1[k]), float(y1[k])), (float(x2[k]), float(y2[k])))
                for k in range(len(ii))
            )

    for k, pairs in _CASE_EDGES.items():
        emit(case == k, pairs)
    # saddles: split by the center mean (standard disambiguation)
    center = (za + zb + zc + zd) / 4.0
    emit((case == 5) & (center > level), [(0, 1), (2, 3)])
    emit((case == 5) & ~(center > level), [(0, 3), (1, 2)])
    emit((case == 10) & (center > level), [(0, 3), (1, 2)])
    emit((case == 10) & ~(center > level), [(0, 1), (2, 3)])
    return segs


def chain_segments(segs: list) -> list[tuple[list, bool]]:
    """Join segments end-to-end into polylines: [(points, closed)].
    Exact float endpoint matching (see module docstring)."""
    adj: dict[tuple, list[tuple]] = {}
    for p, q in segs:
        adj.setdefault(p, []).append(q)
        adj.setdefault(q, []).append(p)
    seen: set[frozenset] = set()
    out = []

    def take(p, q) -> bool:
        key = frozenset((p, q))
        if key in seen:
            return False
        seen.add(key)
        return True

    for start in list(adj):
        if len(adj[start]) != 1:
            continue  # walk open chains from their tips first
        for nxt in adj[start]:
            if not take(start, nxt):
                continue
            line = [start, nxt]
            cur, prev = nxt, start
            while True:
                ext = [n for n in adj[cur] if n != prev and take(cur, n)]
                if not ext:
                    break
                line.append(ext[0])
                prev, cur = cur, ext[0]
            out.append((line, False))
    for start in list(adj):  # remaining: closed rings
        for nxt in adj[start]:
            if not take(start, nxt):
                continue
            line = [start, nxt]
            cur, prev = nxt, start
            while True:
                ext = [n for n in adj[cur] if n != prev and take(cur, n)]
                if not ext:
                    break
                line.append(ext[0])
                prev, cur = cur, ext[0]
            out.append((line, line[0] == line[-1]))
    return out


def dem_contours(
    df: DataFrame,
    levels: list[float],
    schema: str = "mapbox",
    payload: str = "bytes",
) -> DataFrame:
    """DEM tile table -> contour polylines: (z, x, y, level, xs, ys,
    closed), pixel coordinates, one fused Arrow pass, no shuffle."""
    from ..codecs import decode_dem, decode_image

    out_schema = (
        "z int, x long, y long, level double, xs array<double>, "
        "ys array<double>, closed boolean"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                heights = decode_dem(
                    decode_image(bytes(r.bytes))[:, :, :3], schema=schema
                )
                for lv in levels:
                    for pts, closed in chain_segments(contour_segments(heights, lv)):
                        rows.append(
                            (r.z, r.x, r.y, float(lv),
                             [p[0] for p in pts], [p[1] for p in pts], closed)
                        )
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "level", "xs", "ys", "closed"]
            )

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Border-exact contour crossing statistics (cross-engine verifiable path)
# ---------------------------------------------------------------------------
# dem_contours above is the RENDER path: per-tile polylines (GDAL treats
# each raster independently too).  contour_stats below is the border-EXACT
# accounting path: every lattice edge of the GLOBAL mosaic — including the
# ones straddling tile boundaries — owned by its west/north pixel's tile,
# crossed against literal levels with exact integer interpolation sums, so
# a DuckDB oracle can verify the whole distributed plan by hash:
#
#   pass 1 (mapInPandas, no shuffle): each tile decodes ONCE, counts its
#     interior edge crossings per level (slim partial rows), and emits its
#     first column/row as an array<long> strip addressed to the west/north
#     neighbor plus its last column/row addressed to itself.
#   pass 2 (pure JVM): inner-join own-last with neighbor-first strips on
#     (x, y, dir) — global-border strips find no partner and drop —
#     explode(arrays_zip) to slim (lo, hi) rows, cross the literal level
#     list, groupBy.  union with interior partials, final sum.
#
# At 100 TB: payload decodes exactly once and never enters an Exchange;
# boundary traffic is 2*tile_size longs per tile (~4 KB) keyed by tile
# coordinate with <= 2 rows per join key — unskewable; output is bounded
# by tiles x levels.

def _level_partials(
    x: int, y: int, lo: np.ndarray, hi: np.ndarray, levels: list[int]
) -> list[list[int]]:
    """Slim per-level partial rows for a batch of edges given as parallel
    low/high endpoint arrays."""
    rows = []
    for lv in levels:
        cross = (lo < lv) & (lv <= hi)
        n = int(cross.sum())
        if n == 0:
            continue
        rows.append(
            [
                x,
                y,
                int(lv),
                n,
                int(lv) * n - int(lo[cross].sum()),
                int(hi[cross].sum() - lo[cross].sum()),
            ]
        )
    return rows


def contour_stats(
    tiles: DataFrame,
    levels: list[int],
    tile_size: int = 256,
    payload: str = "bytes",
    band: int = 0,
) -> DataFrame:
    """Per-(tile, level) marching-squares crossing statistics over a
    single-zoom tile table (x, y, bytes): n_cross edge crossings,
    num_sum = sum(L - lo) and span_sum = sum(hi - lo) — the exact integer
    pieces of every GDAL contour vertex's interpolation parameter.

    Every lattice edge is owned by the tile of its west/north pixel;
    edges to a nonexistent tile (global raster border) do not exist.
    Tiles with zero crossings at a level emit no row (contour lines do
    not cross flat tiles)."""
    ts = int(tile_size)
    lvls = sorted(int(v) for v in levels)
    if not lvls:
        raise ValueError("contour_stats: need at least one level")
    pay = payload

    p1_schema = (
        "x long, y long, level long, n_cross long, num_sum long, "
        "span_sum long, dir int, side int, vals array<long>"
    )

    def pass1(batches):
        for pdf in batches:
            agg_rows: list[list] = []
            strip_rows: list[list] = []
            for x, y, blob in zip(pdf["x"], pdf["y"], pdf[pay]):
                x, y = int(x), int(y)
                v = decode_image(bytes(blob))[..., band].astype(np.int64)
                # interior horizontal edges (west->east pairs) + vertical
                # (north->south pairs), both pixels in-tile
                e0 = np.concatenate([v[:, :-1].ravel(), v[:-1, :].ravel()])
                e1 = np.concatenate([v[:, 1:].ravel(), v[1:, :].ravel()])
                lo = np.minimum(e0, e1)
                hi = np.maximum(e0, e1)
                for row in _level_partials(x, y, lo, hi, lvls):
                    agg_rows.append(row + [-1, 0, None])
                # halo strips: dir 0 = horizontal edges across the east
                # tile border (columns), dir 1 = vertical across south
                # (rows); side 0 = own last line (owner), side 1 = own
                # first line addressed to the owning west/north neighbor
                pad = [0, 0, 0]  # n_cross, num_sum, span_sum placeholders
                strip_rows.append([x, y, 0] + pad + [0, 0, v[:, -1].tolist()])
                if x > 0:
                    strip_rows.append([x - 1, y, 0] + pad + [0, 1, v[:, 0].tolist()])
                strip_rows.append([x, y, 0] + pad + [1, 0, v[-1, :].tolist()])
                if y > 0:
                    strip_rows.append([x, y - 1, 0] + pad + [1, 1, v[0, :].tolist()])
            cols = [
                "x", "y", "level", "n_cross", "num_sum", "span_sum",
                "dir", "side", "vals",
            ]
            yield pd.DataFrame(agg_rows + strip_rows, columns=cols)

    p1 = tiles.mapInPandas(pass1, schema=p1_schema)
    # dir = -1 marks interior per-level partial rows; dir >= 0 marks strips
    interior = p1.filter(F.col("dir") == -1).select(
        "x", "y", "level", "n_cross", "num_sum", "span_sum"
    )
    strips = p1.filter(F.col("dir") >= 0).select("x", "y", "dir", "side", "vals")
    own = strips.filter(F.col("side") == 0).select("x", "y", "dir", F.col("vals").alias("a"))
    nbr = strips.filter(F.col("side") == 1).select("x", "y", "dir", F.col("vals").alias("b"))
    # boundary edges: own last line zipped with the neighbor's first line;
    # exploded rows are slim (two longs), bounded by 2*ts per tile
    pairs = own.join(nbr, on=["x", "y", "dir"])
    edge = pairs.select(
        "x",
        "y",
        F.explode(F.arrays_zip("a", "b")).alias("z"),
    ).select(
        "x",
        "y",
        F.least(F.col("z.a"), F.col("z.b")).alias("lo"),
        F.greatest(F.col("z.a"), F.col("z.b")).alias("hi"),
    )
    lv = F.explode(F.array(*[F.lit(v).cast("long") for v in lvls])).alias("level")
    boundary = (
        edge.select("x", "y", "lo", "hi", lv)
        .filter((F.col("lo") < F.col("level")) & (F.col("level") <= F.col("hi")))
        .groupBy("x", "y", "level")
        .agg(
            F.count("*").alias("n_cross"),
            F.sum(F.col("level") - F.col("lo")).alias("num_sum"),
            F.sum(F.col("hi") - F.col("lo")).alias("span_sum"),
        )
    )
    return (
        interior.unionByName(boundary)
        .groupBy("x", "y", "level")
        .agg(
            F.sum("n_cross").alias("n_cross"),
            F.sum("num_sum").alias("num_sum"),
            F.sum("span_sum").alias("span_sum"),
        )
    )
