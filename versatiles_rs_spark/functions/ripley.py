"""Ripley's K point-pattern analysis over integer micro-degree cells.

Ripley's K (Ripley 1976; Dixon 2002) is the classic multi-scale point
pattern statistic: K(r) = A/(n(n-1)) * sum_{i != j} 1[d_ij <= r] compares
the observed pair density inside radius r against complete spatial
randomness, where K(r) ~ pi r^2 (the L-transform L(r) = sqrt(K/pi) - r is
~0 under CSR, > 0 clustered, < 0 dispersed at that scale). It complements
the grid statistics (Gi*, Moran, Geary — functions/hotspots.py, moran.py)
by being grid-free: distances are point-to-point, so it detects clustering
at radii smaller than any single cell.

Engine shape (the repo's integer-core rule):
- coordinates quantize ONCE to int64 micro-degrees (floor(deg * 1e7),
  the same quantization as functions/clusters.py), shifted non-negative so
  Spark's `div` and DuckDB's `//` agree (CLAUDE.md round-half-tie lesson);
- candidate pairs come from a 3x3 neighbor-cell equi-join with cell side
  = max(radii), so every pair within the largest radius is found exactly
  once per direction (ordered pairs, i != j) and nothing outside ~2 cells
  is ever compared — the 100 TB shape: only (id, sx, sy) int64 triples
  shuffle, the pair count is bounded by density x area, never n^2;
- squared distances are exact int64 (operands bounded by 2 cell sides,
  far under the 2^63 ceiling), so every per-radius pair COUNT is exact
  integer cross-engine;
- the float epilogue (K, L) is one fixed expression over exact integers
  with Python-literal area/pi constants, identical in the DuckDB oracle.

This is the naive (uncorrected) estimator: no edge correction at the
study-area boundary, on both engines identically — the standard choice
when the window is much larger than max(radii), as here (360 x 170 deg
window, radii <= 1 deg).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10_000_000  # micro7: 1e7 steps per degree (clusters.py convention)
_LON_OFF = 180 * SCALE
_LAT_OFF = 90 * SCALE


def ripley_k(
    points: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radii_deg: tuple = (0.25, 0.5, 1.0),
    area_deg2: float = 360.0 * 170.0,
) -> DataFrame:
    """One row per radius: (r_deg, n, n_pairs, k, l).

    n_pairs counts ORDERED pairs i != j with integer d^2 <= r^2 (each
    unordered pair twice — the textbook double-sum). k is the naive
    estimator area * n_pairs / (n*(n-1)); l = sqrt(k/pi) - r. `id_col`
    must be unique per point (distinct ids at zero distance are a real
    pair; a self-match is not).
    """
    radii = [int(round(r * SCALE)) for r in radii_deg]
    cell = max(radii)
    pts = points.select(
        F.col(id_col).alias("id"),
        (F.floor(F.col(lon_col) * F.lit(1e7)).cast("long") + F.lit(_LON_OFF)).alias("sx"),
        (F.floor(F.col(lat_col) * F.lit(1e7)).cast("long") + F.lit(_LAT_OFF)).alias("sy"),
    )
    cells = pts.select(
        "id", "sx", "sy",
        F.expr(f"sx div {cell}").alias("cx"),
        F.expr(f"sy div {cell}").alias("cy"),
    )
    # each point probes its 9-cell neighborhood; candidates arrive via a
    # slim (kx, ky) equi-join — int64 columns only, no payload, no n^2
    probes = cells.select(
        "id", "sx", "sy",
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
    ).select("id", "sx", "sy", F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"))
    cand = probes.join(
        cells.select(
            F.col("id").alias("qid"),
            F.col("sx").alias("qx"),
            F.col("sy").alias("qy"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        ),
        on=["kx", "ky"],
    ).filter(F.col("id") != F.col("qid"))
    # clamp |delta| at 2*cell BEFORE squaring: a legitimate neighbor-cell
    # pair is always under that bound, and the clamp makes the squared sum
    # overflow-proof no matter which join key the engine hashes on first
    # (DuckDB hash-joins one equality and post-filters the other, so the
    # raw delta of a not-yet-filtered row can span the whole coordinate
    # range; a clamped miss lands at 4*cell^2 > cell^2 and filters out)
    adx = F.least(F.abs(F.col("sx") - F.col("qx")), F.lit(2 * cell))
    ady = F.least(F.abs(F.col("sy") - F.col("qy")), F.lit(2 * cell))
    pairs = cand.select((adx * adx + ady * ady).alias("d2")).filter(
        F.col("d2") <= F.lit(cell * cell)
    )
    agg = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("d2") <= F.lit(r * r), F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"np{i}")
            for i, r in enumerate(radii)
        ]
    )
    nn = pts.agg(F.count("*").cast("long").alias("n"))
    row = agg.crossJoin(F.broadcast(nn))
    out_structs = []
    for i, r in enumerate(radii):
        r_deg = float(radii_deg[i])
        k = F.lit(float(area_deg2)) * F.col(f"np{i}") / (
            F.col("n") * (F.col("n") - F.lit(1))
        )
        l = F.sqrt(k / F.lit(math.pi)) - F.lit(r_deg)
        out_structs.append(
            F.struct(
                F.lit(r_deg).alias("r_deg"),
                F.col("n").alias("n"),
                F.col(f"np{i}").alias("n_pairs"),
                F.round(k, 6).alias("k"),
                F.round(l, 6).alias("l"),
            )
        )
    return row.select(F.explode(F.array(*out_structs)).alias("s")).select(
        "s.r_deg", "s.n", "s.n_pairs", "s.k", "s.l"
    )


def quadrat_test(
    fields: dict,
    zoom: int = 5,
) -> DataFrame:
    """Quadrat analysis / index-of-dispersion CSR test (Greig-Smith 1952;
    Diggle 2003 ch.2): partition the study window into the 2^z x 2^z tile
    grid, count points per quadrat, and compare the variance/mean ratio
    against 1 (CSR): VMR < 1 dispersed (regular), > 1 clustered. The
    cheapest of the point-pattern tests — ONE slim aggregation per field:

        chi2 = sum_over_ALL_m_cells (n_i - nbar)^2 / nbar
             = (tot2 - tot^2/m) / (tot/m)          (empties enter as zeros)
        VMR  = chi2 / (m - 1)
        z    = (chi2 - (m-1)) / sqrt(2*(m-1))      (chi^2 normal approx)

    `fields` maps a label to a (points_df, lon_col, lat_col) tuple — pass
    several derivations to compare their dispersion in one relation (the
    registry query contrasts the lattice vs the scatter hash field).
    tot/tot2 are exact int64; m is a closed-form literal; the epilogue is
    one fixed float expression (morans_i conventions).
    """
    from .hotspots import cell_counts

    m = float((1 << zoom) * (1 << zoom))
    sd = (2.0 * (m - 1.0)) ** 0.5
    outs = []
    for label, (df, lon_col, lat_col) in sorted(fields.items()):
        agg = cell_counts(df, lon_col, lat_col, zoom).agg(
            F.sum("cnt").alias("tot"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("tot2"),
            F.count("*").alias("occupied"),
        )
        chi2 = (
            F.col("tot2") - F.col("tot") * (F.col("tot") / F.lit(m))
        ) / (F.col("tot") / F.lit(m))
        outs.append(
            agg.select(
                F.lit(label).alias("field"),
                F.lit(int(m)).cast("long").alias("m"),
                F.col("tot").cast("long").alias("tot"),
                F.col("tot2").cast("long").alias("tot2"),
                F.col("occupied").cast("long").alias("occupied"),
                F.round(chi2 / F.lit(m - 1.0), 6).alias("vmr"),
                F.round((chi2 - F.lit(m - 1.0)) / F.lit(sd), 6).alias("z"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def g_function(
    points: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radii_deg: tuple = (0.25, 0.5, 1.0),
    area_deg2: float = 360.0 * 170.0,
) -> DataFrame:
    """Nearest-neighbour distance distribution G(r) — the companion of
    Ripley's K (Diggle 2003): G(r) = fraction of points whose nearest
    neighbour lies within r. Under CSR G(r) = 1 - exp(-lambda pi r^2);
    G above that curve = clustering, below = inhibition. Evaluating G
    only AT the fixed radii keeps the computation exact AND bounded: the
    3x3 cell join (cell side = max radius) covers every candidate within
    max(r), so "has a neighbour within r" is decided exactly for every
    point — no unbounded ring widening, unlike a full NN-distance query.

    Integer core: per-radius counts are DISTINCT point ids with >= 1
    neighbour at d^2 <= r^2 (the ripley_k quantization/join/clamp);
    G = count/n is one int/int division, the CSR reference curve is a
    fixed float expression of n with Python literals. One row per radius:
    (r_deg, n, n_with_nbr, g, g_csr).
    """
    import math as _math

    radii = [int(round(r * SCALE)) for r in radii_deg]
    cell = max(radii)
    pts = points.select(
        F.col(id_col).alias("id"),
        (F.floor(F.col(lon_col) * F.lit(1e7)).cast("long") + F.lit(_LON_OFF)).alias("sx"),
        (F.floor(F.col(lat_col) * F.lit(1e7)).cast("long") + F.lit(_LAT_OFF)).alias("sy"),
    )
    cells = pts.select(
        "id", "sx", "sy",
        F.expr(f"sx div {cell}").alias("cx"),
        F.expr(f"sy div {cell}").alias("cy"),
    )
    probes = cells.select(
        "id", "sx", "sy",
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
    ).select("id", "sx", "sy", F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"))
    cand = probes.join(
        cells.select(
            F.col("id").alias("qid"),
            F.col("sx").alias("qx"),
            F.col("sy").alias("qy"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        ),
        on=["kx", "ky"],
    ).filter(F.col("id") != F.col("qid"))
    adx = F.least(F.abs(F.col("sx") - F.col("qx")), F.lit(2 * cell))
    ady = F.least(F.abs(F.col("sy") - F.col("qy")), F.lit(2 * cell))
    # min d^2 per point (exact within the covered max radius)
    mind = (
        cand.select("id", (adx * adx + ady * ady).alias("d2"))
        .filter(F.col("d2") <= F.lit(cell * cell))
        .groupBy("id")
        .agg(F.min("d2").alias("mind2"))
    )
    agg = mind.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("mind2") <= F.lit(r * r), F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"nw{i}")
            for i, r in enumerate(radii)
        ]
    )
    nn = pts.agg(F.count("*").cast("long").alias("n"))
    row = agg.crossJoin(F.broadcast(nn))
    out_structs = []
    for i, r in enumerate(radii):
        r_deg = float(radii_deg[i])
        lam_pi_r2 = F.col("n") / F.lit(float(area_deg2)) * F.lit(_math.pi * r_deg * r_deg)
        out_structs.append(
            F.struct(
                F.lit(r_deg).alias("r_deg"),
                F.col("n").alias("n"),
                F.col(f"nw{i}").alias("n_with_nbr"),
                F.round(F.col(f"nw{i}") / F.col("n"), 6).alias("g"),
                F.round(F.lit(1.0) - F.exp(-lam_pi_r2), 6).alias("g_csr"),
            )
        )
    return row.select(F.explode(F.array(*out_structs)).alias("s")).select(
        "s.r_deg", "s.n", "s.n_with_nbr", "s.g", "s.g_csr"
    )
