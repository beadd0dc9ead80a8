"""Distributed horizon angles over tiled DEM rasters.

The GRASS `r.horizon` / gdaldem-shadow primitive (the reference repo has
no terrain analysis): for every cell p, the maximum elevation angle to
the terrain along a ray — here the westward ray (direction="W"; "E" by
mirror symmetry; N/S compose with the engine's swap_xy tile transform):

    horizon(p) = max(0, max over q west of p of (e_q - e_p) / (x_p - x_q))

made integer-exact as a FIXED-POINT angle: per candidate
q_angle = floor((e_q - e_p) * SCALE / d) with SCALE = 2^16.  floor is
monotone, so max-of-floors == floor-of-max — the quantized output is the
true horizon tangent at 2^-16 resolution, deterministic, and replayable
in SQL with pure integer division (shifted to keep numerators
non-negative, the CLAUDE.md div-parity rule).

Distributed shape (one payload pass + one slim merge pass):

  phase A (the only decode): each super-tile solves its LOCAL horizon by
    offset sweeps — for offset d, one whole-grid vector op relaxes every
    pair at that distance; O(G) sweeps of O(G^2), all numpy.  It also
    builds, per pixel row, the UPPER CONVEX HULL of its (x, elev)
    points: the classic horizon fact is that the maximizing candidate
    seen from any point further east lies on that hull (tangency), and
    since floor-quantization preserves max order, hull points are
    sufficient for the quantized result too.  Hull rows (slim longs) are
    re-keyed to every super-tile east of the emitter in the same row
    band — O(S) copies per hull row; at cluster scale replace the
    broadcast-east with a prefix-tree merge (hulls merge associatively),
    log2(S) rounds.
  phase B (slim): each super-tile merges: final = clip0(max(local, max
    over western hull points of the quantized tangent)) — per row an
    (n_cells x n_hull) outer compare; natural-terrain hulls are tens of
    points, so this is O(G * hull), not O(G^2).

Payload decodes exactly once; everything shuffled is (long) rows.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..codecs import decode_image

SCALE = 1 << 16
_REL = "sx long, sy long, axis int, gx long, gy long, e long, q long"


def local_horizon(e: np.ndarray) -> np.ndarray:
    """Westward quantized horizon within one grid: per cell the max of
    floor((e_q - e_p) * SCALE / d) over same-row cells d to the west;
    cells with no western candidate get the sentinel minimum.  Offset
    sweeps — one vector op per distance d."""
    G0, G1 = e.shape
    q = np.full((G0, G1), np.int64(-(1 << 62)), dtype=np.int64)
    for d in range(1, G1):
        cand = (e[:, :-d] - e[:, d:]) * SCALE // d
        np.maximum(q[:, d:], cand, out=q[:, d:])
    return q


def row_upper_hulls(e: np.ndarray, x0: int) -> list[tuple[int, int, int]]:
    """(gy_row_index, gx, elev) upper-convex-hull points per row of one
    segment grid (global x = x0 + column).  Monotone-chain upper hull on
    (x, e): keeps exactly the points that can be the horizon tangent
    from any cell further east."""
    out = []
    G0, G1 = e.shape
    for r in range(G0):
        hull: list[tuple[int, int]] = []
        row = e[r]
        for c in range(G1):
            x, y = x0 + c, int(row[c])
            while len(hull) >= 2:
                (x1, y1), (x2, y2) = hull[-2], hull[-1]
                # pop while (x2, y2) is under the (x1,y1)-(x,y) chord
                if (y2 - y1) * (x - x1) <= (y - y1) * (x2 - x1):
                    hull.pop()
                else:
                    break
            hull.append((x, y))
        out.extend((r, hx, hy) for hx, hy in hull)
    return out


def merge_hull(
    e_cells: np.ndarray, x_cells: np.ndarray, hx: np.ndarray, hy: np.ndarray
) -> np.ndarray:
    """Quantized horizon contribution of western hull points (hx, hy)
    for one row's cells at (x_cells, e_cells): max over points of
    floor((hy - e) * SCALE / (x - hx)).  Outer vectorized."""
    if len(hx) == 0:
        return np.full(len(x_cells), np.int64(-(1 << 62)), dtype=np.int64)
    d = x_cells[:, None] - hx[None, :]
    num = (hy[None, :] - e_cells[:, None]) * SCALE
    return (num // d).max(axis=1)


def horizon_angle(
    tiles: DataFrame,
    tile_size: int = 256,
    super_tiles: int = 1,
    direction: str = "W",
    payload: str = "bytes",
    band: int = 0,
) -> DataFrame:
    """(x, y, bytes) DEM tile table -> (gx, gy, horizon): the fixed-point
    horizon tangent max(0, floor(tan * 2^16)) for every cell along one
    of the four cardinal rays.  The kernel always looks WEST; "E"
    mirrors the x axis, "N"/"S" transpose the world (tile coordinates
    swapped at the relation level, grids transposed at decode) so
    columns become rows — coordinates un-transform on emission."""
    if direction not in ("W", "E", "N", "S"):
        raise ValueError("horizon_angle: direction must be W/E/N/S")
    ts, S = int(tile_size), int(super_tiles)
    G = S * ts
    flip = direction in ("E", "S")
    swap = direction in ("N", "S")
    axis_col = "y" if swap else "x"
    n_sx = (
        int(tiles.agg(F.max(axis_col)).collect()[0][0]) + 1 + S - 1
    ) // S  # super-tile columns in the (possibly transposed) world
    world_w = n_sx * G

    def keyed(t: DataFrame) -> DataFrame:
        xs = F.col("y" if swap else "x").cast("long")
        ys = F.col("x" if swap else "y").cast("long")
        if flip:  # mirror tiles so the kernel always looks west
            xs = F.lit(world_w // ts - 1) - xs
        return t.select(
            (xs / S).cast("long").alias("sx"),
            (ys / S).cast("long").alias("sy"),
            (xs * ts).alias("gx0"),
            (ys * ts).alias("gy0"),
            F.col(payload).alias("data"),
        )

    def phase_a(pdf: pd.DataFrame) -> pd.DataFrame:
        sx, sy = int(pdf["sx"].iloc[0]), int(pdf["sy"].iloc[0])
        ox, oy = sx * G, sy * G
        grid = np.full((G, G), -1, dtype=np.int64)
        for gx0, gy0, data in zip(pdf["gx0"], pdf["gy0"], pdf["data"]):
            v = decode_image(bytes(data))[..., band].astype(np.int64)
            if swap:
                v = v.T
            if flip:
                v = v[:, ::-1]
            r0, c0 = int(gy0) - oy, int(gx0) - ox
            grid[r0 : r0 + v.shape[0], c0 : c0 + v.shape[1]] = v
        q = local_horizon(grid)
        rr, cc = np.meshgrid(
            np.arange(G, dtype=np.int64), np.arange(G, dtype=np.int64),
            indexing="ij",
        )
        parts = [
            pd.DataFrame(
                {"sx": sx, "sy": sy, "axis": np.int32(0),
                 "gx": ox + cc.ravel(), "gy": oy + rr.ravel(),
                 "e": grid.ravel(), "q": q.ravel()}
            )
        ]
        hull = row_upper_hulls(grid, ox)
        if hull:
            hr = np.array([h[0] for h in hull], dtype=np.int64)
            hx = np.array([h[1] for h in hull], dtype=np.int64)
            hy = np.array([h[2] for h in hull], dtype=np.int64)
            for tsx in range(sx + 1, n_sx):
                parts.append(
                    pd.DataFrame(
                        {"sx": np.int64(tsx), "sy": np.int64(sy),
                         "axis": np.int32(1),
                         "gx": hx, "gy": oy + hr, "e": hy,
                         "q": np.int64(0)}
                    )
                )
        return pd.concat(parts, ignore_index=True)

    def phase_b(pdf: pd.DataFrame) -> pd.DataFrame:
        own = pdf[pdf["axis"] == 0]
        hull = pdf[pdf["axis"] == 1]
        gx = own["gx"].to_numpy()
        gy = own["gy"].to_numpy()
        e = own["e"].to_numpy()
        q = own["q"].to_numpy().copy()
        if len(hull):
            hgy = hull["gy"].to_numpy()
            hgx = hull["gx"].to_numpy()
            he = hull["e"].to_numpy()
            order = np.argsort(gy, kind="stable")
            horder = np.argsort(hgy, kind="stable")
            gy_s = gy[order]
            starts = np.searchsorted(gy_s, np.unique(gy_s))
            bounds = np.append(starts, len(gy_s))
            hgy_s = hgy[horder]
            for i, row_gy in enumerate(np.unique(gy_s)):
                sel = order[bounds[i] : bounds[i + 1]]
                h0 = np.searchsorted(hgy_s, row_gy, side="left")
                h1 = np.searchsorted(hgy_s, row_gy, side="right")
                hsel = horder[h0:h1]
                if len(hsel) == 0:
                    continue
                m = merge_hull(e[sel], gx[sel], hgx[hsel], he[hsel])
                q[sel] = np.maximum(q[sel], m)
        out_gx = gx if not flip else (world_w - 1) - gx
        return pd.DataFrame(
            {"gx": gy if swap else out_gx,
             "gy": out_gx if swap else gy,
             "horizon": np.maximum(q, np.int64(0))}
        )

    rel = (
        keyed(tiles)
        .groupBy("sx", "sy")
        .applyInPandas(phase_a, schema=_REL)
    )
    return rel.groupBy("sx", "sy").applyInPandas(
        phase_b, schema="gx long, gy long, horizon long"
    )
