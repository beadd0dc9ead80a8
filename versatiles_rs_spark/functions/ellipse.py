"""Directional distribution (standard deviational ellipse) per group.

The classic ArcGIS "Directional Distribution (Standard Deviational
Ellipse)" / CrimeStat SDE statistic (Lefever 1926; Yuill 1971): for each
point group, the mean center plus the 1-sigma ellipse of the point
cloud — axis lengths and orientation from the eigendecomposition of the
2x2 coordinate covariance matrix. The GIS question it answers: "which
way does this phenomenon spread?" (disease clusters, crime corridors,
storm tracks, species ranges).

Determinism / cross-engine contract (the repo's integer-core rule):
coordinates quantize to int64 grid units (floor((lon+180)*scale) — the
micro-degree pattern of clusters.py/ripley.py; quantization is PART of
the statistic, like micro7 in ripley_k). The distributed aggregates are
five EXACT sums: n, Sx, Sy (int64 — bound n*3.6e6 < 2^63 at the default
scale, i.e. exact past 10^12 points) and Sxx, Syy, Sxy as Spark
DECIMAL(38,0) sums, which DuckDB mirrors as HUGEINT — both engines cast
those exact integers to DOUBLE bit-identically (verified: BigDecimal
.doubleValue and hugeint->double are both correctly rounded; parity
pinned in tests). The n-scaled central moments

    P = n*Sxx - Sx^2    Q = n*Syy - Sy^2    R = n*Sxy - Sx*Sy

are computed in exact 128-bit integer arithmetic on BOTH engines, so the
float epilogue starts from bit-identical doubles. Bound: n^2 * extent^2
< 10^38 — at the default scale (1e4 units/degree, ~11 m) that is n <
2.7e12 points per group even for globe-spanning clouds.

The epilogue is TRIG-FREE so no libm-divergence risk ever enters the
hash: eigenvalues need only +-*/ and sqrt (IEEE-exact), and the
orientation is reported as the UNIT MAJOR-AXIS EIGENVECTOR (ex, ey)
instead of an atan2 angle — (cov, lam1 - varx) normalized, which is
already sign-canonical because lam1 >= varx always (ey >= 0; the cov=0
branch picks the axis-aligned unit vector). Callers wanting degrees
compute atan2(ey, ex) client-side.

100 TB shape: ONE slim aggregation over the point table (six exact
sums per group), one row per group out — no explode, no second shuffle,
nothing wider than 6 numbers ever moves. Skewed groups are irrelevant:
partial aggregation (map-side combine) reduces every partition to one
row per group before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10_000  # grid units per degree (~11 m): n < 2.7e12 exact


def std_dev_ellipse(
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    group_col: str | None = None,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """One row per group: mean center (exact floor-div reconstruction),
    sigma1/sigma2 axis half-lengths in degrees (sqrt(2*lambda) — the
    ArcGIS 1-sigma ellipse), and the unit major-axis eigenvector."""
    x = F.floor((F.col(lon_col) + F.lit(180.0)) * F.lit(float(scale))).cast("long")
    y = F.floor((F.col(lat_col) + F.lit(90.0)) * F.lit(float(scale))).cast("long")
    gcols = [group_col] if group_col else []
    dec = "decimal(38,0)"
    agg = (
        points.select(*gcols, x.alias("qx"), y.alias("qy"))
        .groupBy(*gcols)
        .agg(
            F.count("*").alias("n_points"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum((F.col("qx") * F.col("qx")).cast(dec)).alias("sxx"),
            F.sum((F.col("qy") * F.col("qy")).cast(dec)).alias("syy"),
            F.sum((F.col("qx") * F.col("qy")).cast(dec)).alias("sxy"),
        )
    )
    n = F.col("n_points")
    nd = n.cast(dec)
    # exact 128-bit central moments, then the verified-bit-identical cast
    p = (nd * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)).cast("double")
    q = (nd * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)).cast("double")
    r = (nd * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)).cast("double")
    n2 = n.cast("double") * n.cast("double")
    out = agg.select(
        *gcols,
        "n_points",
        # mean center: exact int64 floor division (non-negative => Spark
        # div == DuckDB //), float reconstruction (clusters.py pattern)
        (
            F.expr("sx div n_points").cast("double") / F.lit(float(scale))
            - F.lit(180.0)
        ).alias("lon_c"),
        (
            F.expr("sy div n_points").cast("double") / F.lit(float(scale))
            - F.lit(90.0)
        ).alias("lat_c"),
        (p / n2).alias("varx"),
        (q / n2).alias("vary"),
        (r / n2).alias("cov"),
    )
    disc = F.sqrt(
        (F.col("varx") - F.col("vary")) * (F.col("varx") - F.col("vary"))
        + F.lit(4.0) * F.col("cov") * F.col("cov")
    )
    lam1 = (F.col("varx") + F.col("vary") + disc) / F.lit(2.0)
    lam2 = (F.col("varx") + F.col("vary") - disc) / F.lit(2.0)
    out = out.withColumns(
        {
            "lam1": lam1,
            # clamp tiny negative float residue on degenerate clouds
            "lam2": F.greatest(lam2, F.lit(0.0)),
        }
    )
    # major-axis eigenvector (cov, lam1 - varx); lam1 >= varx always so
    # ey >= 0 (sign-canonical). cov == 0 -> axis-aligned unit vector.
    ex_raw = F.col("cov")
    ey_raw = F.col("lam1") - F.col("varx")
    norm = F.sqrt(ex_raw * ex_raw + ey_raw * ey_raw)
    axis_aligned = F.col("cov") == F.lit(0.0)
    sc = F.lit(float(DEFAULT_SCALE if scale is None else scale))
    return out.select(
        *gcols,
        "n_points",
        "lon_c",
        "lat_c",
        F.round(F.sqrt(F.lit(2.0) * F.col("lam1")) / sc, 6).alias("sigma1_deg"),
        F.round(F.sqrt(F.lit(2.0) * F.col("lam2")) / sc, 6).alias("sigma2_deg"),
        F.round(
            F.when(
                axis_aligned,
                F.when(F.col("varx") >= F.col("vary"), F.lit(1.0)).otherwise(
                    F.lit(0.0)
                ),
            ).otherwise(ex_raw / norm),
            6,
        ).alias("ex"),
        F.round(
            F.when(
                axis_aligned,
                F.when(F.col("varx") >= F.col("vary"), F.lit(0.0)).otherwise(
                    F.lit(1.0)
                ),
            ).otherwise(ey_raw / norm),
            6,
        ).alias("ey"),
    )
