"""Empirical semivariogram: binned spatial autocorrelation of a field.

The foundational geostatistics statistic (Matheron 1963; GSLIB `gamv`,
ArcGIS Geostatistical Analyst, gstat::variogram): for lag-distance bins
h_b, the semivariance

    gamma(h_b) = (1 / (2 * N_b)) * sum_{(i,j): d_ij in bin b} (v_i - v_j)^2

describes how quickly a surface decorrelates with distance — the input
that sizes kriging weights and the honest companion to functions/idw.py
(IDW interpolates; the variogram says at what range interpolation is even
justified).

Engine shape (the repo's integer-core pair-statistic pattern, shared with
functions/ripley.py):
- coordinates quantize ONCE to int64 micro-degrees shifted non-negative;
  values arrive as integers (the caller picks the quantization — cents,
  micro-units — so every squared difference is exact int64);
- UNORDERED candidate pairs (id < id') from the 3x3 neighbor-cell
  equi-join with cell side = max lag: only (id, sx, sy, v) int64 rows
  shuffle, pair count is density-bounded, never n^2;
- |delta| clamps at 2*cell before squaring (overflow-proof on rows a
  hash join has matched on one key only — ripley.py lesson);
- lag bins are EQUAL-WIDTH in true distance but assigned with no sqrt:
  bin b covers d in (b*w, (b+1)*w], decided by comparing exact d^2
  against the squared thresholds ((b+1)*w)^2 — a fixed sum of CASE
  comparisons against integer literals, bit-identical in DuckDB;
- gamma is reported in milli-units via non-negative floor division
  (sum_sq * 500 div n_pairs == sum_sq * 1000 / (2 N)), never a float
  quotient (round-half-tie rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000_000  # micro7 (ripley.py / clusters.py convention)
_LON_OFF = 180 * SCALE
_LAT_OFF = 90 * SCALE


def empirical_variogram(
    points: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str = "v",
    max_lag_deg: float = 1.0,
    n_bins: int = 8,
) -> DataFrame:
    """One row per non-empty lag bin: (lag_bin, n_pairs, sum_sq, gamma_milli).

    lag_bin b covers true distance (b*w, (b+1)*w] with w = max_lag/n_bins
    (bin 0 also admits exact-zero distance: coincident points carry real
    nugget information).  `value_col` must already be an integer column;
    `id_col` unique per point.  max_lag*SCALE must divide by n_bins
    exactly (asserted) so the squared thresholds are integers."""
    lag = int(round(max_lag_deg * SCALE))
    if lag % n_bins:
        raise ValueError(f"max_lag {lag} not divisible by n_bins {n_bins}")
    w = lag // n_bins
    cell = lag
    pts = points.select(
        F.col(id_col).alias("id"),
        (F.floor(F.col(lon_col) * F.lit(1e7)).cast("long") + F.lit(_LON_OFF)).alias("sx"),
        (F.floor(F.col(lat_col) * F.lit(1e7)).cast("long") + F.lit(_LAT_OFF)).alias("sy"),
        F.col(value_col).cast("long").alias("v"),
    )
    cells = pts.select(
        "id", "sx", "sy", "v",
        F.expr(f"sx div {cell}").alias("cx"),
        F.expr(f"sy div {cell}").alias("cy"),
    )
    probes = cells.select(
        "id", "sx", "sy", "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + F.lit(dx)).alias("kx"),
                        (F.col("cy") + F.lit(dy)).alias("ky"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("id", "sx", "sy", "v", F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"))
    cand = probes.join(
        cells.select(
            F.col("id").alias("qid"),
            F.col("sx").alias("qx"),
            F.col("sy").alias("qy"),
            F.col("v").alias("qv"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        ),
        on=["kx", "ky"],
    ).filter(F.col("id") < F.col("qid"))  # unordered pairs, once each
    adx = F.least(F.abs(F.col("sx") - F.col("qx")), F.lit(2 * cell))
    ady = F.least(F.abs(F.col("sy") - F.col("qy")), F.lit(2 * cell))
    dv = F.col("v") - F.col("qv")
    pairs = cand.select(
        (adx * adx + ady * ady).alias("d2"),
        (dv * dv).alias("sq"),
    ).filter(F.col("d2") <= F.lit(lag * lag))
    # bin = number of squared thresholds strictly below d2 (no sqrt)
    bin_expr = sum(
        [
            F.when(F.col("d2") > F.lit((w * (b + 1)) ** 2), F.lit(1)).otherwise(F.lit(0))
            for b in range(n_bins - 1)
        ],
        F.lit(0),
    )
    return (
        pairs.select(bin_expr.alias("lag_bin"), "sq")
        .groupBy("lag_bin")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("sq").cast("long").alias("sum_sq"),
        )
        .select(
            "lag_bin",
            "n_pairs",
            "sum_sq",
            F.expr("(sum_sq * 500) div n_pairs").alias("gamma_milli"),
        )
    )


def variogram_bin_sql(d2_sql: str, w: int, n_bins: int) -> str:
    """The identical no-sqrt bin rule as SQL (oracle side)."""
    terms = " + ".join(
        f"(CASE WHEN ({d2_sql}) > {(w * (b + 1)) ** 2} THEN 1 ELSE 0 END)"
        for b in range(n_bins - 1)
    )
    return f"({terms})"
