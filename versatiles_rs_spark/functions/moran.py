"""Moran's I spatial autocorrelation (global + local/LISA) over the tile grid.

The other half of the classic spatial-statistics pair next to Getis-Ord Gi*
(functions/hotspots.py): Moran's I (Moran 1950; Cliff & Ord 1981) measures
whether a surface is clustered (+), dispersed (-), or random (~ -1/(n-1)),
and Anselin's local Moran (LISA, Anselin 1995) classifies each cell into
HH / LL / HL / LH quadrants — the standard "cluster and outlier analysis"
of GIS suites, here over the web-mercator zoom grid the engine already
speaks (queen 3x3 binary weights, no antimeridian wrap, empty cells are
real zeros — the same study-area convention as hotspots.py).

Determinism / cross-engine contract (the repo's integer-core rule): cell
values are event COUNTS, so every distributed aggregate is exact int64 —
    tot  = sum x_i            tot2 = sum x_i^2
    A    = sum_i x_i * (nbr_sum_i - x_i)   (= sum_ij w_ij x_i x_j)
    B    = sum_i x_i * deg_i               (= sum_ij w_ij x_i)
while every grid-shape constant has a closed form in the grid dim d:
    n  = d^2
    S0 = sum_ij w_ij            = (3d-2)^2 - d^2
    S1 = 2*S0                      (binary symmetric weights)
    S2 = 4 * sum_i deg_i^2      = 4*((9d-10)^2 - 2*(3d-2)^2 + d^2)
so E[I] = -1/(n-1) and the normality variance of I are PYTHON-computed
float literals inlined identically into the Spark plan and the DuckDB
oracle. The only engine-evaluated floats are one fixed expression over
exact integers (identical IEEE evaluation both sides), rounded to 6
places for the hash gate. LISA quadrant labels never touch a float at
all: sign(x_i - xbar) = sign(n*x_i - tot) and the lag sign likewise are
pure int64 comparisons (documented bound: points * n_cells < 2^63, i.e.
~10^12 points at zoom 6 — the north-rule scale — with 2^51 headroom).

100 TB shape: identical to hotspots.py — one slim (cell, count)
aggregation over the point table, a <=9-way explode on the AGGREGATED
cell relation, global sums ride a broadcast one-row cross join. Nothing
wider than the occupied-cell count ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hotspots import cell_counts, neighbor_contrib, wi_col


def grid_constants(zoom: int) -> dict:
    """Closed-form weight-matrix constants of the full 2^z x 2^z queen
    grid (see module docstring for the derivations)."""
    d = 1 << zoom
    n = d * d
    s0 = (3 * d - 2) ** 2 - d * d
    s1 = 2 * s0
    s2 = 4 * ((9 * d - 10) ** 2 - 2 * (3 * d - 2) ** 2 + d * d)
    e_i = -1.0 / (n - 1)
    # Var(I) under the normality assumption (Cliff & Ord 1981, eq. 1.39)
    var_i = (n * n * s1 - n * s2 + 3 * s0 * s0) / (
        (n * n - 1.0) * (s0 * s0)
    ) - e_i * e_i
    return {"d": d, "n": n, "s0": s0, "s1": s1, "s2": s2, "e_i": e_i, "var_i": var_i}


_cells = cell_counts  # shared point-to-cell aggregation (hotspots.py)


def _joined_cells(cells: DataFrame, zoom: int) -> DataFrame:
    """(x, y, cnt, nbr_sum, deg) for every occupied cell — nbr_sum is the
    3x3 block sum INCLUDING self (hotspots convention); deg excludes it."""
    dim = 1 << zoom
    return (
        cells.join(neighbor_contrib(cells, dim), on=["x", "y"])
        .withColumn("deg", wi_col(dim) - F.lit(1).cast("long"))
    )


def morans_i(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Global Moran's I of the event-count surface at `zoom`: ONE row
    (n_cells, s0, a, b, tot, tot2, i, e_i, z). z is the normality z-score
    — an affine function of i with Python-literal coefficients."""
    g = grid_constants(zoom)
    # cache before the cells ⋈ neighbor_contrib(cells) self-join: without it
    # the point scan + aggregation would run once per branch (hotspots.py:127
    # precedent; the planner does not reliably reuse the identical subtree)
    j = _joined_cells(_cells(points, lon_col, lat_col, zoom).cache(), zoom)
    agg = j.agg(
        F.sum(F.col("cnt") * (F.col("nbr_sum") - F.col("cnt"))).alias("a"),
        F.sum(F.col("cnt") * F.col("deg")).alias("b"),
        F.sum("cnt").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("tot2"),
    )
    n, ratio = float(g["n"]), float(g["n"]) / float(g["s0"])
    xbar = F.col("tot") / F.lit(n)
    num = F.col("a") - F.lit(2.0) * xbar * F.col("b") + xbar * xbar * F.lit(float(g["s0"]))
    den = F.col("tot2") - F.col("tot") * xbar
    i = F.when(den <= F.lit(0.0), F.lit(0.0)).otherwise(F.lit(ratio) * num / den)
    sd = g["var_i"] ** 0.5
    return agg.select(
        F.lit(g["n"]).cast("long").alias("n_cells"),
        F.lit(g["s0"]).cast("long").alias("s0"),
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("tot").cast("long").alias("tot"),
        F.col("tot2").cast("long").alias("tot2"),
        F.round(i, 6).alias("i"),
        F.round(F.lit(g["e_i"]), 6).alias("e_i"),
        F.round((i - F.lit(g["e_i"])) / F.lit(sd), 6).alias("z"),
    )


def bivariate_morans_i(
    points_x: DataFrame,
    points_y: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Bivariate Moran's I (Wartenberg 1985; GeoDa's cross-autocorrelation):
    does layer Y cluster AROUND layer X? One row with the exact-integer
    cross sums and

        I_xy = (n/S0) * sum_ij w_ij (x_i - xbar)(y_j - ybar)
               / sqrt(sum (x-xbar)^2 * sum (y-ybar)^2)

    over the full grid (empty cells are zeros in both layers). Same
    integer-core decomposition as the univariate statistic:
    A_xy = sum_i x_i*(ynbr_i - y_i), B_x = sum x_i deg_i, B_y = sum y_i deg_i
    are int64; the epilogue is one fixed float expression."""
    g = grid_constants(zoom)
    dim = 1 << zoom
    cx = _cells(points_x, lon_col, lat_col, zoom)
    cy = _cells(points_y, lon_col, lat_col, zoom).cache()
    jx = (
        cx.join(neighbor_contrib(cy, dim), on=["x", "y"], how="left")
        .join(cy.select("x", "y", F.col("cnt").alias("ycnt")), on=["x", "y"], how="left")
        .fillna(0, subset=["nbr_sum", "ycnt"])
        .withColumn("deg", wi_col(dim) - F.lit(1).cast("long"))
    )
    aggx = jx.agg(
        F.sum(F.col("cnt") * (F.col("nbr_sum") - F.col("ycnt"))).alias("axy"),
        F.sum(F.col("cnt") * F.col("deg")).alias("b_x"),
        F.sum("cnt").alias("totx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("totx2"),
    )
    aggy = (
        cy.withColumn("deg", wi_col(dim) - F.lit(1).cast("long"))
        .agg(
            F.sum(F.col("cnt") * F.col("deg")).alias("b_y"),
            F.sum("cnt").alias("toty"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("toty2"),
        )
    )
    n, ratio = float(g["n"]), float(g["n"]) / float(g["s0"])
    out = aggx.crossJoin(F.broadcast(aggy))
    xbar = F.col("totx") / F.lit(n)
    ybar = F.col("toty") / F.lit(n)
    num = (
        F.col("axy")
        - ybar * F.col("b_x")
        - xbar * F.col("b_y")
        + xbar * ybar * F.lit(float(g["s0"]))
    )
    denx = F.col("totx2") - F.col("totx") * xbar
    deny = F.col("toty2") - F.col("toty") * ybar
    i_xy = F.when(denx * deny <= F.lit(0.0), F.lit(0.0)).otherwise(
        F.lit(ratio) * num / F.sqrt(denx * deny)
    )
    return out.select(
        F.lit(g["n"]).cast("long").alias("n_cells"),
        F.col("axy").cast("long").alias("axy"),
        F.col("b_x").cast("long").alias("b_x"),
        F.col("b_y").cast("long").alias("b_y"),
        F.col("totx").cast("long").alias("totx"),
        F.col("toty").cast("long").alias("toty"),
        F.col("totx2").cast("long").alias("totx2"),
        F.col("toty2").cast("long").alias("toty2"),
        F.round(i_xy, 6).alias("i_xy"),
    )


def local_moran(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Anselin local Moran (LISA) per OCCUPIED cell: (x, y, cnt, lag, deg,
    ii, quad). lag = neighbor sum excluding self (exact int64); ii is the
    local statistic z_i * (sum_j w_ij z_j) / m2 rounded to 6; quad is the
    HH/LL/HL/LH/NS quadrant from pure-integer sign tests (empty cells take
    part in the statistic as zeros but emit no row, as in hotspots.py)."""
    g = grid_constants(zoom)
    cells = _cells(points, lon_col, lat_col, zoom).cache()
    stats = cells.agg(
        F.sum("cnt").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("tot2"),
    )
    j = _joined_cells(cells, zoom).crossJoin(F.broadcast(stats))
    n = float(g["n"])
    n_int = F.lit(g["n"]).cast("long")
    xbar = F.col("tot") / F.lit(n)
    m2 = (F.col("tot2") - F.col("tot") * xbar) / F.lit(n)
    lag = F.col("nbr_sum") - F.col("cnt")
    ii = F.when(m2 <= F.lit(0.0), F.lit(0.0)).otherwise(
        (F.col("cnt") - xbar) * (lag - F.col("deg") * xbar) / m2
    )
    zs = F.col("cnt") * n_int - F.col("tot")          # sign(x_i - xbar), exact
    ls = lag * n_int - F.col("deg") * F.col("tot")    # sign(lag_i - deg_i*xbar), exact
    quad = (
        F.when((zs > 0) & (ls > 0), F.lit("HH"))
        .when((zs < 0) & (ls < 0), F.lit("LL"))
        .when((zs > 0) & (ls < 0), F.lit("HL"))
        .when((zs < 0) & (ls > 0), F.lit("LH"))
        .otherwise(F.lit("NS"))
    )
    return j.select(
        "x",
        "y",
        "cnt",
        lag.cast("long").alias("lag"),
        F.col("deg").alias("deg"),
        F.round(ii, 6).alias("ii"),
        quad.alias("quad"),
    )


def gearys_c(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Global Geary's C (Geary 1954; Cliff & Ord 1981) of the event-count
    surface at `zoom` — the pairwise-difference complement of Moran's I
    (C < 1 clustered, C > 1 dispersed, E[C] = 1). ONE row
    (n_cells, s0, a, b2, tot, tot2, c, z).

    Integer core: with binary queen weights the numerator sum
        sum_ij w_ij (x_i - x_j)^2 = 2*B2 - 2*A,
        A  = sum_i x_i (nbr_sum_i - x_i)   (Moran's cross-product sum)
        B2 = sum_i x_i^2 deg_i
    so both distributed aggregates are exact int64 (empty cells drop out
    of every term: x_i = 0 annihilates them). The statistic
        C = (n-1) * (B2 - A) / (S0 * (tot2 - tot^2/n))
    is one fixed float expression over exact integers with Python-literal
    grid constants, identical on the DuckDB side. z uses the normality
    variance Var(C) = ((2*S1 + S2)(n-1) - 4*S0^2) / (2*(n+1)*S0^2)
    (Cliff & Ord 1981 eq. 1.43), sign convention z = (C - 1)/sd.

    100 TB shape: identical to morans_i — slim (cell, count) agg, <=9-way
    explode on the aggregated cell relation, one-row epilogue. Documented
    bound: max_cell_count^2 * 8 < 2^63 (cnt^2*deg), i.e. ~10^9 points in
    one cell before overflow — raise `zoom` long before that."""
    g = grid_constants(zoom)
    j = _joined_cells(_cells(points, lon_col, lat_col, zoom).cache(), zoom)
    agg = j.agg(
        F.sum(F.col("cnt") * (F.col("nbr_sum") - F.col("cnt"))).alias("a"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("deg")).alias("b2"),
        F.sum("cnt").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("tot2"),
    )
    n = float(g["n"])
    nm1, s0 = float(g["n"] - 1), float(g["s0"])
    var_c = ((2.0 * g["s1"] + g["s2"]) * (g["n"] - 1) - 4.0 * g["s0"] ** 2) / (
        2.0 * (g["n"] + 1) * g["s0"] ** 2
    )
    sd = var_c ** 0.5
    den = F.col("tot2") - F.col("tot") * (F.col("tot") / F.lit(n))
    c = F.when(den <= F.lit(0.0), F.lit(1.0)).otherwise(
        F.lit(nm1) * (F.col("b2") - F.col("a")) / (F.lit(s0) * den)
    )
    return agg.select(
        F.lit(g["n"]).cast("long").alias("n_cells"),
        F.lit(g["s0"]).cast("long").alias("s0"),
        F.col("a").cast("long").alias("a"),
        F.col("b2").cast("long").alias("b2"),
        F.col("tot").cast("long").alias("tot"),
        F.col("tot2").cast("long").alias("tot2"),
        F.round(c, 6).alias("c"),
        F.round((c - F.lit(1.0)) / F.lit(sd), 6).alias("z"),
    )
