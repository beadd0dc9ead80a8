"""Douglas-Peucker polyline simplification — per-zoom vector
generalization (the tippecanoe step the reference's repackaging pipeline
never needed, but any tile builder producing vectors from raw tracks
does: a z5 tile has no use for GPS-noise vertices).

Algorithm (Douglas & Peucker 1973): keep an interval's endpoints; find
the interior vertex farthest from the chord; if it exceeds eps, split
there and recurse.  The KEPT set is exactly the set of interval endpoints
ever created — the property the SQL oracle exploits: the registry query
replays the recursion as a DuckDB RECURSIVE CTE over (line, lo, hi)
intervals (two children per split via a 2-row cross join) and collects
DISTINCT interval endpoints.

100 TB shape: one Arrow pass (mapInPandas) over assembled lines; the
assembly itself is a JVM sort_array(collect_list(struct(ord, x, y))) —
one shuffle on the line key, no Python until the per-line kernel.
Tolerance ties to zoom the way tile pixels do: eps ~ tile_span(z) / 256.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask, iterative stack DP.  First-occurrence argmax on
    ties (matches SQL list_position); perpendicular chord distance with a
    euclidean fallback for degenerate (A == B) chords."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        px, py = xs[lo + 1 : hi], ys[lo + 1 : hi]
        dx, dy = bx - ax, by - ay
        denom = np.sqrt(dx * dx + dy * dy)
        if denom == 0.0:
            d = np.sqrt((px - ax) ** 2 + (py - ay) ** 2)
        else:
            d = np.abs(dx * (ay - py) - (ax - px) * dy) / denom
        mi = int(np.argmax(d))
        if d[mi] > eps:
            mid = lo + 1 + mi
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep


def simplify_lines(
    df: DataFrame,
    eps: float,
    line_col: str = "line_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(line_id, point_idx) kept vertices (1-based ordinals) per line.
    Input: one row per line with xs/ys double arrays (use
    sort_array(collect_list(struct(ord, x, y))) upstream to assemble)."""

    def kernel(batches):
        for pdf in batches:
            ids, idxs = [], []
            for lid, xs, ys in zip(pdf[line_col], pdf[xs_col], pdf[ys_col]):
                mask = dp_keep_mask(
                    np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64), eps
                )
                kept = np.nonzero(mask)[0] + 1  # 1-based, matches SQL lists
                ids.extend([lid] * len(kept))
                idxs.extend(kept.tolist())
            yield pd.DataFrame({line_col: ids, "point_idx": idxs})

    return df.mapInPandas(kernel, schema=f"{line_col} long, point_idx long")


def zoom_eps(z: int, px: float = 1.0) -> float:
    """Tolerance of `px` tile pixels at zoom z, in web-mercator degrees of
    longitude: 360 / 2^z / 256 per pixel."""
    return 360.0 / (1 << z) / 256.0 * px
