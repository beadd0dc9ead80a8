"""Co-location pattern mining — participation index over typed points.

Shekhar & Huang 2001 (the spatial-data-mining classic): which feature
TYPES occur near each other more than their own abundance explains? For
a type pair (A, B) and neighbor radius r,

    pr(A->B) = |{a in A : some b in B within r}| / |A|
    PI(A, B) = min(pr(A->B), pr(B->A))

— the participation index, the standard interestingness measure for
co-location rules ("ATMs co-locate with convenience stores"). Here over
the typed event layer (click/view/purchase/signup/error).

Engine shape (the repo's integer-core rule): coordinates quantize once
to int64 micro-degrees (the functions/ripley.py machinery: cell side =
r, 3x3 neighbor-cell equi-join, |delta| clamped before squaring so d^2
is overflow-proof under any join-key order); "has a neighbor" is a
DISTINCT count of instance ids per ordered type pair — exact int64; the
ratios are non-negative floor quotients at milli precision (no float
compares; CLAUDE.md half-tie rule). 100 TB shape: only (id, type-code,
sx, sy) ever shuffles; pair volume is density-bounded by the cell join,
never |A| x |B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ripley import SCALE, _LAT_OFF, _LON_OFF


def colocation_pairs(
    points: DataFrame,
    id_col: str = "id",
    type_col: str = "type",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius_deg: float = 1.0,
) -> DataFrame:
    """(type_a, type_b, n_a, n_b, a_with_b, b_with_a, pi_milli) for every
    unordered type pair (type_a < type_b) with at least one cross-type
    neighbor pair within `radius_deg`. a_with_b = distinct A instances
    having >= 1 B neighbor; pi_milli = min of the two milli-precision
    participation ratios (exact floor division)."""
    cell = int(round(radius_deg * SCALE))
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(type_col).cast("string").alias("t"),
        (F.floor(F.col(lon_col) * F.lit(1e7)).cast("long") + F.lit(_LON_OFF)).alias("sx"),
        (F.floor(F.col(lat_col) * F.lit(1e7)).cast("long") + F.lit(_LAT_OFF)).alias("sy"),
    )
    cells = pts.select(
        "id", "t", "sx", "sy",
        F.expr(f"sx div {cell}").alias("cx"),
        F.expr(f"sy div {cell}").alias("cy"),
    ).cache()
    probes = cells.select(
        "id", "t", "sx", "sy",
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
    ).select("id", "t", "sx", "sy", F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"))
    cand = probes.join(
        cells.select(
            F.col("id").alias("qid"),
            F.col("t").alias("qt"),
            F.col("sx").alias("qx"),
            F.col("sy").alias("qy"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        ),
        on=["kx", "ky"],
    ).filter(F.col("t") != F.col("qt"))
    adx = F.least(F.abs(F.col("sx") - F.col("qx")), F.lit(2 * cell))
    ady = F.least(F.abs(F.col("sy") - F.col("qy")), F.lit(2 * cell))
    near = cand.filter(adx * adx + ady * ady <= F.lit(cell * cell))
    # distinct "instance of T1 that has a T2 neighbor" per ORDERED pair
    part = (
        near.select("t", "qt", "id")
        .distinct()
        .groupBy("t", "qt")
        .agg(F.count("*").cast("long").alias("with_nbr"))
    )
    sizes = cells.groupBy("t").agg(F.count("*").cast("long").alias("n"))
    ab = part.filter(F.col("t") < F.col("qt")).select(
        F.col("t").alias("type_a"),
        F.col("qt").alias("type_b"),
        F.col("with_nbr").alias("a_with_b"),
    )
    ba = part.filter(F.col("t") > F.col("qt")).select(
        F.col("qt").alias("type_a"),
        F.col("t").alias("type_b"),
        F.col("with_nbr").alias("b_with_a"),
    )
    # inner join: the neighbor relation is symmetric, so (A,B) exists
    # iff (B,A) exists — both sides present or neither
    out = (
        ab.join(ba, on=["type_a", "type_b"])
        .join(sizes.select(F.col("t").alias("type_a"), F.col("n").alias("n_a")), on="type_a")
        .join(sizes.select(F.col("t").alias("type_b"), F.col("n").alias("n_b")), on="type_b")
    )
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "a_with_b",
        "b_with_a",
        F.least(
            F.expr("(a_with_b * 1000) div n_a"),
            F.expr("(b_with_a * 1000) div n_b"),
        ).cast("long").alias("pi_milli"),
    )


def cross_k(
    points: DataFrame,
    id_col: str = "id",
    type_col: str = "type",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radii_deg: tuple = (0.25, 0.5, 1.0),
    area_deg2: float = 360.0 * 170.0,
) -> DataFrame:
    """Bivariate (cross-type) Ripley's K — the distance-profile companion
    of the participation index: K_AB(r) = area/(n_A*n_B) * #{(a,b) pairs
    within r}. Under independence K_AB ~ pi r^2 (L_AB ~ 0); above =
    attraction between the types at that scale, below = repulsion
    (Dixon 2002). One row per (type pair, radius), type_a < type_b (the
    statistic is symmetric, each unordered cross pair counted once).

    Same engine shape as ripley_k/colocation_pairs: micro7 cell join with
    cell side = max(radii), clamped int64 d^2, exact per-radius integer
    counts, literal-constant float epilogue."""
    import math as _math

    radii = [int(round(r * SCALE)) for r in radii_deg]
    cell = max(radii)
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(type_col).cast("string").alias("t"),
        (F.floor(F.col(lon_col) * F.lit(1e7)).cast("long") + F.lit(_LON_OFF)).alias("sx"),
        (F.floor(F.col(lat_col) * F.lit(1e7)).cast("long") + F.lit(_LAT_OFF)).alias("sy"),
    )
    cells = pts.select(
        "id", "t", "sx", "sy",
        F.expr(f"sx div {cell}").alias("cx"),
        F.expr(f"sy div {cell}").alias("cy"),
    ).cache()
    probes = cells.select(
        "id", "t", "sx", "sy",
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
    ).select("id", "t", "sx", "sy", F.col("k.kx").alias("kx"), F.col("k.ky").alias("ky"))
    cand = probes.join(
        cells.select(
            F.col("t").alias("qt"),
            F.col("sx").alias("qx"),
            F.col("sy").alias("qy"),
            F.col("cx").alias("kx"),
            F.col("cy").alias("ky"),
        ),
        on=["kx", "ky"],
    ).filter(F.col("t") < F.col("qt"))  # one direction = each cross pair once
    adx = F.least(F.abs(F.col("sx") - F.col("qx")), F.lit(2 * cell))
    ady = F.least(F.abs(F.col("sy") - F.col("qy")), F.lit(2 * cell))
    pairs = cand.select(
        F.col("t").alias("type_a"),
        F.col("qt").alias("type_b"),
        (adx * adx + ady * ady).alias("d2"),
    ).filter(F.col("d2") <= F.lit(cell * cell))
    agg = pairs.groupBy("type_a", "type_b").agg(
        *[
            F.sum(F.when(F.col("d2") <= F.lit(r * r), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"np{i}")
            for i, r in enumerate(radii)
        ]
    )
    sizes = cells.groupBy("t").agg(F.count("*").cast("long").alias("n"))
    j = agg.join(
        sizes.select(F.col("t").alias("type_a"), F.col("n").alias("n_a")), on="type_a"
    ).join(
        sizes.select(F.col("t").alias("type_b"), F.col("n").alias("n_b")), on="type_b"
    )
    out_structs = []
    for i, r in enumerate(radii):
        r_deg = float(radii_deg[i])
        k = F.lit(float(area_deg2)) * F.col(f"np{i}") / (F.col("n_a") * F.col("n_b"))
        out_structs.append(
            F.struct(
                F.lit(r_deg).alias("r_deg"),
                F.col(f"np{i}").alias("n_pairs"),
                F.round(k, 6).alias("k_ab"),
                F.round(F.sqrt(k / F.lit(_math.pi)) - F.lit(r_deg), 6).alias("l_ab"),
            )
        )
    return j.select(
        "type_a", "type_b", "n_a", "n_b",
        F.explode(F.array(*out_structs)).alias("s"),
    ).select("type_a", "type_b", "n_a", "n_b", "s.r_deg", "s.n_pairs", "s.k_ab", "s.l_ab")
