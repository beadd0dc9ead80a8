"""Landscape ecology class metrics (FRAGSTATS) over a zone raster.

The FRAGSTATS class-level core set (McGarigal & Marks 1995; ArcGIS
Patch Analyst, R landscapemetrics::lsm_c_*): per cover class, how much
of the landscape it occupies and how fragmented it is —

    NP     number of patches (4-connected regions of the class)
    CA     class area (cells)
    PLAND  proportion of landscape, ppm
    LPI    largest patch index (largest patch / landscape), ppm
    MPS    mean patch size, milli-cells (CA * 1000 div NP)
    TE     total edge: cell sides where the class meets a DIFFERENT
           class, plus its share of the landscape boundary (FRAGSTATS
           "count boundary" convention — a patch hugging the map edge
           has real perimeter there)
    ED     edge density (TE / landscape area), ppm

Distributed shape — everything derives from the run-length SEGMENT
relation of operators/regions.py (never per-cell joins):

  * patches come from region_group's contracted labeling (a giant
    uniform region costs its run count, not its cell count);
  * vertical edges are the adjacent-row segment overlap join with
    DIFFERENT values (the complement of region_group's equal-value
    adjacency) — overlap length = shared sides, credited to BOTH
    classes;
  * horizontal edges are run boundaries within a row (maximal runs
    guarantee the values differ): one side each;
  * boundary edges read directly off first/last rows and x0/x1 == grid
    edge.

All counts exact int64; derived ratios use `div` on non-negative
operands (round-half-tie rule).  The oracle extends the shared
region-CTE chain with the identical overlap/boundary arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.regions import region_group, region_segments


def class_metrics(cells: DataFrame, n: int, value_col: str = "v") -> DataFrame:
    """FRAGSTATS class metrics for a complete (gx, gy, v) cell relation
    on an n x n grid.  One row per class:
    (v, n_patches, class_cells, largest, total_edge, pland_ppm, lpi_ppm,
    mps_milli, ed_ppm)."""
    lab = region_group(cells, n, value_col, return_segments=True).cache()
    patches = lab.groupBy("v", "region").agg(F.sum("len").alias("cells"))
    cls = patches.groupBy("v").agg(
        F.count("*").cast("long").alias("n_patches"),
        F.sum("cells").cast("long").alias("class_cells"),
        F.max("cells").cast("long").alias("largest"),
    )
    a, b = lab.alias("a"), lab.alias("b")
    vert = a.join(
        b,
        (F.col("b.gy") == F.col("a.gy") + 1)
        & (F.col("b.x0") <= F.col("a.x1"))
        & (F.col("a.x0") <= F.col("b.x1"))
        & (F.col("a.v") != F.col("b.v")),
    ).select(
        F.col("a.v").alias("va"),
        F.col("b.v").alias("vb"),
        (
            F.least(F.col("a.x1"), F.col("b.x1"))
            - F.greatest(F.col("a.x0"), F.col("b.x0"))
            + F.lit(1)
        ).alias("e"),
    )
    horiz = a.join(
        b,
        (F.col("b.gy") == F.col("a.gy")) & (F.col("b.x0") == F.col("a.x1") + 1),
    ).select(F.col("a.v").alias("va"), F.col("b.v").alias("vb"), F.lit(1).alias("e"))
    both = vert.unionByName(horiz)
    internal = both.select(F.col("va").alias("v"), "e").unionByName(
        both.select(F.col("vb").alias("v"), "e")
    )
    border = (
        lab.filter(F.col("gy") == 0).select("v", F.col("len").alias("e"))
        .unionByName(
            lab.filter(F.col("gy") == n - 1).select("v", F.col("len").alias("e"))
        )
        .unionByName(
            lab.filter(F.col("x0") == 0).select("v", F.lit(1).alias("e"))
        )
        .unionByName(
            lab.filter(F.col("x1") == n - 1).select("v", F.lit(1).alias("e"))
        )
    )
    te = (
        internal.unionByName(border)
        .groupBy("v")
        .agg(F.sum("e").cast("long").alias("total_edge"))
    )
    area = n * n
    return (
        cls.join(te, "v")
        .select(
            "v",
            "n_patches",
            "class_cells",
            "largest",
            "total_edge",
            F.expr(f"(class_cells * 1000000) div {area}").alias("pland_ppm"),
            F.expr(f"(largest * 1000000) div {area}").alias("lpi_ppm"),
            F.expr("(class_cells * 1000) div n_patches").alias("mps_milli"),
            F.expr(f"(total_edge * 1000000) div {area}").alias("ed_ppm"),
        )
    )


def join_counts(cells: DataFrame, n: int, value_col: str = "v") -> DataFrame:
    """Cliff-Ord join-count statistics: categorical spatial
    autocorrelation on the rook lattice (Cliff & Ord 1981; PySAL
    esda.Join_Counts; the BB/BW/WW test generalized to k classes).

    For every observed unordered class pair (va <= vb): the exact number
    of adjacent cell pairs ("joins") carrying those classes, and the
    expectation under the nonfree-sampling null
        E[J_rr] = J * n_r * (n_r - 1) / (N * (N - 1))
        E[J_rs] = 2 * J * n_r * n_s / (N * (N - 1))      (r != s)
    as an exact ppm floor quotient (J = 2n(n-1) rook joins on the full
    n x n lattice, closed form because the cell relation is complete).
    Observed >> expected for (r, r) pairs = positive autocorrelation of
    class r.

    Distributed shape — all three join families read the run-length
    SEGMENT relation (never cells): same-class horizontal joins are
    Σ(len - 1) per run (zero joins beyond the run's own row count),
    different-class horizontal joins are run boundaries, vertical joins
    are the adjacent-row overlap lengths for EVERY value combination.
    Only (v, count) longs shuffle.  Pairs with zero observed joins are
    not emitted (the relation is the observed-join support)."""
    segs = region_segments(cells, n, value_col).localCheckpoint()
    hs = segs.filter(F.col("len") > 1).select(
        F.col("v").alias("va"), F.col("v").alias("vb"),
        (F.col("len") - 1).alias("e"),
    )
    a, b = segs.alias("a"), segs.alias("b")
    hd = a.join(
        b, (F.col("b.gy") == F.col("a.gy")) & (F.col("b.x0") == F.col("a.x1") + 1)
    ).select(
        F.least(F.col("a.v"), F.col("b.v")).alias("va"),
        F.greatest(F.col("a.v"), F.col("b.v")).alias("vb"),
        F.lit(1).alias("e"),
    )
    vt = a.join(
        b,
        (F.col("b.gy") == F.col("a.gy") + 1)
        & (F.col("b.x0") <= F.col("a.x1"))
        & (F.col("a.x0") <= F.col("b.x1")),
    ).select(
        F.least(F.col("a.v"), F.col("b.v")).alias("va"),
        F.greatest(F.col("a.v"), F.col("b.v")).alias("vb"),
        (
            F.least(F.col("a.x1"), F.col("b.x1"))
            - F.greatest(F.col("a.x0"), F.col("b.x0"))
            + F.lit(1)
        ).alias("e"),
    )
    obs = (
        hs.unionByName(hd).unionByName(vt)
        .groupBy("va", "vb")
        .agg(F.sum("e").cast("long").alias("n_joins"))
    )
    cls = segs.groupBy("v").agg(F.sum("len").cast("long").alias("n_r"))
    big_n = n * n
    j_tot = 2 * n * (n - 1)
    denom = big_n * (big_n - 1)
    out = (
        obs.join(cls.select(F.col("v").alias("va"), F.col("n_r").alias("na")), "va")
        .join(cls.select(F.col("v").alias("vb"), F.col("n_r").alias("nb")), "vb")
        .select(
            "va", "vb", "n_joins",
            F.expr(
                f"CASE WHEN va = vb THEN ({j_tot} * na * (na - 1) * 1000000) div {denom} "
                f"ELSE (2 * {j_tot} * na * nb * 1000000) div {denom} END"
            ).alias("expected_ppm"),
        )
    )
    return out


def shannon_diversity(cells: DataFrame, n: int, value_col: str = "v") -> DataFrame:
    """Landscape-level Shannon diversity (FRAGSTATS SHDI) + evenness
    (SHEI), exactly, in fixed-point log2 units: with class cell counts
    n_i over the complete N = n*n lattice,

        SHDI = log2(N) - (Σ n_i * log2(n_i)) / N      (log2 form of
        -Σ p ln p, unit-scaled)  ->  shdi_fp in 2^-20 log2 units via
        udfs.log2_fp_stages (bit-by-bit mantissa squaring, float-free)
        and floor divisions on non-negative ints;
        SHEI = SHDI / log2(n_classes), reported as exact ppm.

    Both engines run the IDENTICAL staged-column algorithm, so the
    result is bit-deterministic — no libm entropy.  One row:
    (n_classes, n_cells, shdi_fp, shei_ppm)."""
    from ..udfs import log2_fp_stages

    big_n = n * n
    log2_n_fp = (big_n.bit_length() - 1) * (1 << 20)
    if big_n & (big_n - 1):
        raise ValueError("n*n must be a power of two for the closed-form log2(N)")
    cls = cells.groupBy(value_col).agg(F.count("*").cast("long").alias("x"))
    st = cls
    for name, expr in log2_fp_stages(20):
        st = st.withColumn(name, F.expr(expr))
    agg = st.select((F.col("x") * F.col("lg")).alias("t")).agg(
        F.count("*").cast("long").alias("n_classes"),
        F.expr(f"{log2_n_fp} - (sum(t) div {big_n})").alias("shdi_fp"),
    )
    # second staging pass: log2(n_classes) on the one-row aggregate
    st2 = agg.withColumnRenamed("n_classes", "x")
    for name, expr in log2_fp_stages(20):
        st2 = st2.withColumn(name, F.expr(expr))
    return st2.select(
        F.col("x").alias("n_classes"),
        F.lit(big_n).cast("long").alias("n_cells"),
        "shdi_fp",
        F.expr(
            "CASE WHEN lg > 0 THEN (shdi_fp * 1000000) div lg ELSE 0 END"
        ).alias("shei_ppm"),
    )
