"""Exact Euclidean distance transform + allocation over a cell grid.

The GDAL `gdal_proximity.py` / ArcGIS Euclidean Distance + Euclidean
Allocation pair: for every cell of an n x n grid, the squared Euclidean
distance to the nearest feature cell and the id of that feature, with
the deterministic tie-break "smallest (d^2, src_id)".

Distributed shape — the separable two-pass EDT (Felzenszwalb & Huttenlocher
2004, "Distance Transforms of Sampled Functions", dt.pdf; also the shape of
Meijster et al. 2000) re-expressed as two grouped relational passes:

  pass 1 (groupBy feature COLUMN — features only, tiny):  for each
    occupied column x' the 1-D transform down the column:
      m(x', y) = min over features (x', fy, id) of  K*(y-fy)^2 + id
    computed exactly via sorted-neighbor lookup (nearest feature above /
    below — the only candidates in 1-D).  Emits slim (x', y, m) rows,
    restricted to |y - fy| <= max_dist when a horizon is set, so the
    emission is bounded by n_features * (2*max_dist + 1) — the 100 TB
    knob (ArcGIS `maxdist` semantics; cells beyond stay unreached).

  pass 2 (groupBy OUTPUT ROW y):  the lower envelope of the column
    parabolas f_a(x) = K*(x-a)^2 + m(a, y), evaluated at every integer
    x with EXACT INTEGER boundaries: the first x where parabola b beats
    parabola a is ceil((K*(b^2-a^2) + h_b - h_a) / (2K*(b-a))) — integer
    ceil division, no floats anywhere, so the winner at every cell is
    exact.  (At an exact tie the packed values are equal, so either
    winner yields the same (d^2, src).)  O(candidates + n) per row.

The packing K*d^2 + id (K > every id) makes the lexicographic
(d^2, id) argmin a plain integer min — the same trick as
operators/costdist.py's cost allocation — so ties are exact by
construction and the DuckDB oracle can replay the whole surface as
one min() aggregate.

Everything that ever shuffles is (long, long, long) rows; per-row
groups carry at most one candidate per occupied column.  Output is
either the per-cell relation or per-block aggregate partials (the
at-scale path: emit block partials inside the kernel, never n^2 rows).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _column_pass(pdf: pd.DataFrame, n: int, K: int, md2: int | None) -> pd.DataFrame:
    """1-D EDT down one feature column: exact packed min per y."""
    a = int(pdf["gx"].iloc[0])
    order = np.argsort(pdf["gy"].to_numpy(), kind="stable")
    fy = pdf["gy"].to_numpy()[order].astype(np.int64)
    fid = pdf["src_id"].to_numpy()[order].astype(np.int64)
    # collapse duplicate cells to the min id (fy sorted, stable order not
    # guaranteed by value — take explicit per-fy min)
    uniq, inv = np.unique(fy, return_inverse=True)
    best_id = np.full(uniq.shape, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(best_id, inv, fid)
    fy, fid = uniq, best_id

    ys = np.arange(n, dtype=np.int64)
    ins = np.searchsorted(fy, ys)
    INF = np.iinfo(np.int64).max
    # candidate below (fy[ins-1] <= y) and above (fy[ins] >= y)
    lo = np.clip(ins - 1, 0, fy.size - 1)
    hi = np.clip(ins, 0, fy.size - 1)
    d_lo = ys - fy[lo]
    d_hi = fy[hi] - ys
    p_lo = np.where(ins > 0, K * d_lo * d_lo + fid[lo], INF)
    p_hi = np.where(ins < fy.size, K * d_hi * d_hi + fid[hi], INF)
    m = np.minimum(p_lo, p_hi)
    if md2 is not None:
        keep = m // K <= md2
        ys, m = ys[keep], m[keep]
    return pd.DataFrame({"gx": np.full(ys.shape, a, dtype=np.int64), "gy": ys, "m": m})


def _envelope_row(a: np.ndarray, h: np.ndarray, n: int, K: int) -> np.ndarray:
    """Exact lower envelope of K-scaled integer parabolas, evaluated at
    x = 0..n-1.  `a` strictly ascending."""
    hull_a: list[int] = []
    hull_h: list[int] = []
    start: list[int] = []  # first x where hull[i] is the winner
    for aj, hj in zip(a.tolist(), h.tolist()):
        xs = 0
        while hull_a:
            a0, h0 = hull_a[-1], hull_h[-1]
            num = K * (aj * aj - a0 * a0) + hj - h0
            den = 2 * K * (aj - a0)
            xs = -(-num // den)  # ceil: first integer x where new <= old
            if xs <= start[-1]:
                hull_a.pop(); hull_h.pop(); start.pop()
                continue
            break
        if not hull_a:
            xs = 0
        hull_a.append(aj); hull_h.append(hj); start.append(xs)
    out = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    bounds = start + [n]
    for i in range(len(hull_a)):
        x0, x1 = max(bounds[i], 0), min(bounds[i + 1], n)
        if x0 >= x1:
            continue
        xs_arr = np.arange(x0, x1, dtype=np.int64)
        out[x0:x1] = K * (xs_arr - hull_a[i]) ** 2 + hull_h[i]
    return out


def euclidean_distance(
    feats: DataFrame,
    n: int,
    block: int | None = None,
    max_dist: int | None = None,
    K: int = 1 << 20,
) -> DataFrame:
    """Exact EDT + allocation of `feats` (gx, gy, src_id; 0 <= src_id < K,
    cells inside [0, n)^2) over the full n x n grid.

    block=None  -> per-cell relation (gx, gy, d2, src); unreached cells
                   (beyond max_dist, or no features at all) carry
                   d2 = -1, src = -1.
    block=B     -> per-block aggregates (bx, by, n_reached, n_unreached,
                   sum_d2, max_d2, sum_src) covering ALL (n/B)^2 blocks —
                   the at-scale output shape (partials are computed inside
                   the row kernel; n^2 cell rows never materialize).
    """
    if block is not None and n % block:
        raise ValueError("block must divide n")
    if K * n * n >= 1 << 62:
        raise ValueError("K * n^2 must stay below 2^62 (int64 packed values)")
    md2 = None if max_dist is None else int(max_dist) * int(max_dist)
    spark = feats.sparkSession
    feats = feats.select(
        F.col("gx").cast("long"), F.col("gy").cast("long"),
        F.col("src_id").cast("long"),
    )

    def col_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        return _column_pass(pdf, n, K, md2)

    cols = feats.groupBy("gx").applyInPandas(col_pass, schema="gx long, gy long, m long")

    B = block

    def row_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        y = int(pdf["gy"].iloc[0])
        order = np.argsort(pdf["gx"].to_numpy(), kind="stable")
        a = pdf["gx"].to_numpy()[order].astype(np.int64)
        h = pdf["m"].to_numpy()[order].astype(np.int64)
        D = _envelope_row(a, h, n, K)
        reached = (D // K <= md2) if md2 is not None else np.ones(n, dtype=bool)
        d2 = D // K
        src = D - d2 * K
        if B is None:
            return pd.DataFrame({
                "gx": np.arange(n, dtype=np.int64),
                "gy": np.full(n, y, dtype=np.int64),
                "d2": np.where(reached, d2, np.int64(-1)),
                "src": np.where(reached, src, np.int64(-1)),
            })
        bx = np.arange(n, dtype=np.int64) // B
        rows = []
        for b in np.unique(bx):
            msk = (bx == b) & reached
            cnt = int(msk.sum())
            rows.append([
                int(b), y // B, cnt,
                int(d2[msk].sum()) if cnt else 0,
                int(d2[msk].max()) if cnt else -1,
                int(src[msk].sum()) if cnt else 0,
            ])
        return pd.DataFrame(
            rows, columns=["bx", "by", "n_reached", "sum_d2", "max_d2", "sum_src"]
        )

    if B is None:
        cells = cols.groupBy("gy").applyInPandas(
            row_pass, schema="gx long, gy long, d2 long, src long"
        )
        # rows with no candidate anywhere: fill from the full grid
        universe = (
            spark.range(n).select(F.col("id").alias("gx"))
            .crossJoin(spark.range(n).select(F.col("id").alias("gy")))
        )
        return (
            universe.join(cells, ["gx", "gy"], "left")
            .select(
                "gx", "gy",
                F.coalesce("d2", F.lit(-1)).alias("d2"),
                F.coalesce("src", F.lit(-1)).alias("src"),
            )
        )

    partials = cols.groupBy("gy").applyInPandas(
        row_pass,
        schema="bx long, by long, n_reached long, sum_d2 long, max_d2 long, sum_src long",
    )
    agg = partials.groupBy("bx", "by").agg(
        F.sum("n_reached").alias("n_reached"),
        F.sum("sum_d2").alias("sum_d2"),
        F.max("max_d2").alias("max_d2"),
        F.sum("sum_src").alias("sum_src"),
    )
    nb = n // B
    universe = (
        spark.range(nb).select(F.col("id").alias("bx"))
        .crossJoin(spark.range(nb).select(F.col("id").alias("by")))
    )
    return universe.join(agg, ["bx", "by"], "left").select(
        "bx", "by",
        F.coalesce("n_reached", F.lit(0)).alias("n_reached"),
        (F.lit(B * B) - F.coalesce("n_reached", F.lit(0))).alias("n_unreached"),
        F.coalesce("sum_d2", F.lit(0)).alias("sum_d2"),
        F.coalesce("max_d2", F.lit(-1)).alias("max_d2"),
        F.coalesce("sum_src", F.lit(0)).alias("sum_src"),
    )
