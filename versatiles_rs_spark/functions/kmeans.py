"""Fixed-round Lloyd k-means over integer coordinates.

The reproducible-pipeline variant of k-means (Lloyd 1957/1982; Spark
MLlib KMeans is the float/random cousin): deterministic FIXED lattice
seeds, a FIXED round count, integer centroids by floor division — every
quantity int64, so the result is bit-identical across engines and runs
(the property MLlib's random init + float means cannot give, and the
one that matters for oracle-gated data pipelines: cluster ids that mean
the same thing on every rerun).

Per round, entirely relational and in ONE Catalyst DAG (no driver loop):
  1. assignment: points join the (broadcast, <= k rows) centroid table;
     the argmin over candidates is min(packed) with packed =
     d2 * k_pad + cid — d2 ties break toward the smaller cluster id,
     deterministically (the map_match rank-encoding trick, k_pad a
     power of two above k);
  2. update: unpack cid, one map-combined groupBy -> new centroids
     cx = Σx div n, cy = Σy div n.

The points relation is cached (referenced once per round); each round
adds one shuffle keyed by the point id (argmin) and one by cid (update)
— nothing but (id, x, y) / (cid, sums) longs in any exchange.  Empty
clusters drop from the table and stay dropped (inner-join semantics,
mirrored in the oracle).

Overflow contract: max(d2) * k_pad < 2^63 (world-scale milli-degree
coordinates leave ~6 orders of headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lloyd_kmeans(
    points: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    k_pad: int = 16,
) -> DataFrame:
    """Run `rounds` Lloyd rounds from the deterministic `seeds`
    (cid, cx, cy) over `points` (id, x, y).  Returns the final centroid
    table (cid, n_points, cx, cy), cid ascending ids of surviving
    clusters."""
    pts = points.select(
        F.col("id").cast("long").alias("id"),
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    ).cache()
    cent = seeds.select("cid", "cx", "cy")
    # Overflow/decoding contract: cid is decoded as packed % k_pad, so any
    # cid >= k_pad would silently alias onto cluster cid - k_pad.
    max_cid = cent.agg(F.max("cid")).first()[0]
    if max_cid is not None and int(max_cid) >= int(k_pad):
        raise ValueError(
            f"lloyd_kmeans: max seed cid {max_cid} >= k_pad {k_pad}; "
            "raise k_pad to the next power of two above the cluster count"
        )
    for _ in range(int(rounds)):
        j = pts.join(F.broadcast(cent)).select(
            "id", "x", "y",
            (
                (
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                    + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
                ) * F.lit(int(k_pad))
                + F.col("cid")
            ).alias("packed"),
        )
        assign = j.groupBy("id", "x", "y").agg(
            F.pmod(F.min("packed"), F.lit(int(k_pad))).alias("cid")
        )
        cent = assign.groupBy("cid").agg(
            F.expr("sum(x) div count(*)").alias("cx"),
            F.expr("sum(y) div count(*)").alias("cy"),
        )
    final = pts.join(F.broadcast(cent)).select(
        "id",
        (
            (
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
            ) * F.lit(int(k_pad))
            + F.col("cid")
        ).alias("packed"),
    ).groupBy("id").agg(F.pmod(F.min("packed"), F.lit(int(k_pad))).alias("cid"))
    return (
        final.groupBy("cid")
        .agg(F.count("*").cast("long").alias("n_points"))
        .join(cent, "cid")
        .select("cid", "n_points", "cx", "cy")
    )


def kmeans_round_sql(prev_cent: str, k_pad: int = 16) -> str:
    """One oracle round (assignment + update) from centroid CTE
    `prev_cent` over MATERIALIZED `pts` — identical packed-argmin and
    floor-division arithmetic."""
    return f"""
      SELECT cid,
        CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS cx,
        CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS cy
      FROM (
        SELECT p.id, p.x, p.y,
          min(((p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy))
              * {k_pad} + c.cid) % {k_pad} AS cid
        FROM pts p CROSS JOIN {prev_cent} c
        GROUP BY 1, 2, 3
      ) GROUP BY cid
    """


def simplified_silhouette(
    points: DataFrame,
    centroids: DataFrame,
    k_pad: int = 16,
    scale: int = 10**9,
) -> DataFrame:
    """Per-cluster simplified silhouette (Hruschka et al. 2004) of a
    centroid table over integer points — the O(n*k) scale-safe variant
    of Rousseeuw's silhouette: a(i) = distance to the OWN (nearest)
    centroid, b(i) = distance to the second-nearest centroid, s(i) =
    (b - a) / max(a, b).  Exact silhouette is O(n^2) pairwise and dead
    at corpus scale; the centroid form needs one broadcast join.

    Cross-engine determinism: per point the k packed candidates
    (d2 * k_pad + cid — the lloyd_kmeans rank encoding) have distinct
    cids, so the TWO smallest of the sorted candidate list are exactly
    (own a2, best-other b2), integers.  The float epilogue is then one
    IEEE op per step on exactly-representable ints (sqrt, sqrt, sub,
    greatest, div, mul, floor) — bit-identical in Spark, numpy and
    DuckDB.  Because own = argmin, a <= b and s is in [0, 1); the
    quantized sq = floor(s * scale) is a non-negative int64, so the
    per-cluster sums are order-free and the mean is ONE division.

    Plan shape: points x broadcast(k centroids) -> slim (id, packed)
    longs; one groupBy(id) (exactly k rows per key — unskewable) via
    sort_array(collect_list); one groupBy(cid) over (cid, sq).  Nothing
    wider than two longs in any Exchange.

    Output: (cid, n_points, sum_silq, mean_sil) with mean_sil =
    (sum_silq / n_points) / scale replayed literally by the oracle."""
    pts = points.select(
        F.col("id").cast("long").alias("id"),
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    # cache: the guard count and the broadcast both consume the (tiny)
    # centroid relation — without it a lloyd_kmeans input DAG re-runs twice
    cent = centroids.select("cid", "cx", "cy").cache()
    if cent.count() < 2:
        raise ValueError("simplified_silhouette needs >= 2 centroids")
    # packed % k_pad decoding only holds when every cid < k_pad
    max_cid = int(cent.agg(F.max("cid")).first()[0])
    if max_cid >= int(k_pad):
        raise ValueError(
            f"simplified_silhouette: max centroid cid {max_cid} >= k_pad "
            f"{k_pad}; raise k_pad (power of two) above the cluster count"
        )
    cand = pts.join(F.broadcast(cent)).select(
        "id",
        (
            (
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
            ) * F.lit(int(k_pad))
            + F.col("cid")
        ).alias("packed"),
    )
    two = (
        cand.groupBy("id")
        .agg(F.sort_array(F.collect_list("packed")).alias("arr"))
        .select(
            "id",
            F.col("arr")[0].alias("m1"),
            F.col("arr")[1].alias("m2"),
        )
    )
    a = F.sqrt(F.expr(f"CAST(m1 div {int(k_pad)} AS DOUBLE)"))
    b = F.sqrt(F.expr(f"CAST(m2 div {int(k_pad)} AS DOUBLE)"))
    sil = F.when(F.greatest(a, b) == F.lit(0.0), F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    per_point = two.select(
        F.pmod("m1", F.lit(int(k_pad))).alias("cid"),
        F.floor(sil * F.lit(float(scale))).cast("long").alias("sq"),
    )
    return per_point.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("sq").alias("sum_silq"),
        F.expr(f"CAST(sum(sq) AS DOUBLE) / count(*) / {float(scale):.17e}").alias(
            "mean_sil"
        ),
    )
