"""k-nearest-neighbor joins: brute-force baseline + cell k-ring scale path.

Target behavior from BASELINE.json north rule ("kNN via H3 k-ring
expansion"). Without an H3 library in this environment, the hierarchical
cell index is the engine's own web-mercator tile grid (tile_math / quadkey) —
same k-ring expansion semantics: explode ring cells around each query,
equi-join on cell, window top-k, widen ring if under-filled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..udfs import tile_x_expr, tile_y_expr


def _dist2(lon, lat, qlon, qlat):
    return (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat)


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Exact kNN: broadcast queries x points, window top-k.

    Deterministic tie-break on id_col. Correct at any scale where
    |queries| is broadcastable; the cell-pruned variant below avoids the
    full cross product.
    """
    d = points.crossJoin(F.broadcast(queries))
    dist = _dist2(F.col(lon), F.col(lat), F.col("qlon"), F.col("qlat"))
    w = Window.partitionBy("query_id").orderBy(dist.asc(), F.col(id_col).asc())
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )


def knn_cell_adaptive(
    points: DataFrame,
    queries: DataFrame,
    k: int = 3,
    cell_zoom: int = 5,
    id_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
    max_ring: int = 64,
) -> DataFrame:
    """Cell k-ring kNN with driver-side ring widening.

    Correctness rule: a rank-k hit found inside ring r is only PROVEN global
    if its distance fits within the ring's guaranteed-covered radius
    (r * cell_width in degrees, the min distance to any un-searched cell);
    otherwise the query re-runs at ring*2. This terminates with exact kNN for
    every query (verified against brute force in pytest) while touching only
    O(k)-ish candidates for dense regions — the reference's level-iteration
    pattern (SURVEY.md §2.6) applied to search radius.
    """
    # the query side is broadcast-scale by contract (same assumption as
    # knn_bruteforce), so unresolved ids are tracked driver-side: one tiny
    # collect up front + ONE stats job per ring — the previous formulation
    # paid stats + isEmpty (two full passes) per iteration
    unresolved = {r.query_id for r in queries.select("query_id").collect()}
    remaining = queries
    done_parts: list[DataFrame] = []
    ring = 1
    while ring <= max_ring:
        # cache: the per-ring result feeds BOTH the proof-bound stats job and
        # the final output — without it the cell join recomputes at collect
        res = knn_cell_pruned(
            points, remaining, k=k, cell_zoom=cell_zoom, ring=ring,
            id_col=id_col, lon=lon, lat=lat,
        ).cache()
        # guaranteed covered radius around the query point: >= ring cells in
        # every direction. In longitude a cell is cell_w degrees; in latitude
        # mercator cells span cell_w * cos(lat) degrees (gudermannian
        # derivative), so bound with cos at the most poleward latitude the
        # block can reach — conservative for every cell in the block.
        cell_w = 360.0 / (1 << cell_zoom)
        edge_lat = F.least(F.lit(85.0), F.abs(F.col("qlat")) + F.lit(ring * cell_w))
        safe_deg = F.lit(ring * cell_w) * F.cos(F.radians(edge_lat))
        pts_d = points.select(
            F.col(id_col), F.col(lon).alias("_plon"), F.col(lat).alias("_plat")
        )
        scored = (
            res.join(pts_d, on=id_col)
            .join(remaining.select("query_id", "qlon", "qlat"), on="query_id")
            .withColumn("_d2", _dist2(F.col("_plon"), F.col("_plat"), F.col("qlon"), F.col("qlat")))
            .withColumn("_safe", safe_deg * safe_deg)
        )
        stats = scored.groupBy("query_id").agg(
            F.count("*").alias("_n"),
            F.max("_d2").alias("_maxd"),
            F.min("_safe").alias("_safe"),
        )
        ok = {r.query_id for r in stats.filter(
            (F.col("_n") >= k) & (F.col("_maxd") <= F.col("_safe"))
        ).select("query_id").collect()}
        if ok:
            # accepted rows are <= |queries| * k (query side is
            # broadcast-scale by contract): materialize them eagerly so the
            # heavyweight per-ring cache can be released immediately instead
            # of accumulating across rings
            done_parts.append(
                res.filter(F.col("query_id").isin(list(ok)))
                .select("query_id", "rank", id_col)
                .localCheckpoint(eager=True)
            )
            unresolved -= ok
        res.unpersist()
        if not unresolved:
            break
        remaining = queries.filter(F.col("query_id").isin(list(unresolved)))
        ring *= 2
    if unresolved:
        # rings exhausted: final pass at max_ring without the proof bound —
        # the documented non-proof fallback (was dead behind a while/else
        # raise; every normal loop exit raised before reaching it)
        done_parts.append(
            knn_cell_pruned(points, remaining, k=k, cell_zoom=cell_zoom, ring=max_ring,
                            id_col=id_col, lon=lon, lat=lat)
        )
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def knn_cell_pruned(
    points: DataFrame,
    queries: DataFrame,
    k: int = 3,
    cell_zoom: int = 5,
    ring: int = 1,
    id_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Cell k-ring kNN: candidates limited to the (2*ring+1)^2 cells around
    each query's cell; equi-join on cell then window top-k.

    This is the scale path: the join is a shuffle hash join on cell ids, so
    only points sharing a ring cell are compared. `ring` must be sized so the
    true k neighbors fall inside it (verified against knn_bruteforce in
    pytest); production use re-runs under-filled queries with ring*2
    (driver-side loop, same pattern as the reference's level iteration).
    """
    pts = points.withColumn("cx", tile_x_expr(F.col(lon), F.lit(cell_zoom))).withColumn(
        "cy", tile_y_expr(F.col(lat), F.lit(cell_zoom))
    )
    q = queries.withColumn("qcx", tile_x_expr(F.col("qlon"), F.lit(cell_zoom))).withColumn(
        "qcy", tile_y_expr(F.col("qlat"), F.lit(cell_zoom))
    )
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets])
    n = F.lit(1 << cell_zoom)
    qx = q.withColumn("o", F.explode(off)).select(
        "query_id",
        "qlon",
        "qlat",
        F.pmod(F.col("qcx") + F.col("o.dx"), n).alias("cx"),
        (F.col("qcy") + F.col("o.dy")).alias("cy"),
    ).filter((F.col("cy") >= 0) & (F.col("cy") < n))
    cand = pts.join(qx, on=["cx", "cy"])
    dist = _dist2(F.col(lon), F.col(lat), F.col("qlon"), F.col("qlat"))
    w = Window.partitionBy("query_id").orderBy(dist.asc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )


def knn_hex_kring(
    points: DataFrame,
    queries: DataFrame,
    k: int = 3,
    res: int = 1,
    ring: int = 2,
    nfaces: int = 3,
    id_col: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """kNN via HEXAGONAL k-ring expansion — the north rule's "H3 k-ring"
    layout on the engine's own aperture-7 icosahedral index (hex7.py).

    Same scale shape as knn_cell_pruned: points get one Arrow-batched cell
    assignment, queries explode to nfaces * (3*ring^2+3*ring+1) probe
    cells — the kring in each of the query's top-`nfaces` icosahedron-face
    lattices, which is what keeps the candidate set complete across face
    edges (a cross-edge neighbor lives in ITS face's lattice; projecting
    the query there lands within ring distance of it). The candidate join
    is a shuffle hash equi-join on the bigint cell id; a query-partitioned
    window takes the top-k. Fixed-ring APPROXIMATE variant: exactness
    requires the true neighbors inside the ring (parity vs brute force
    pytest-checked at the registry's res/ring); knn_cell_adaptive remains
    the proof-carrying exact path.
    """
    from ..hex7 import hex7_cell_udf, hex7_kring_udf
    from ..udfs import single_eval

    pts = points.withColumn(
        "hcell", single_eval(hex7_cell_udf(res)(F.col(lon), F.col(lat)))
    )
    qx = queries.withColumn(
        "hcell",
        F.explode(hex7_kring_udf(res, ring, nfaces)(F.col("qlon"), F.col("qlat"))),
    )
    cand = pts.join(qx, on="hcell")
    dist = _dist2(F.col(lon), F.col(lat), F.col("qlon"), F.col("qlat"))
    w = Window.partitionBy("query_id").orderBy(dist.asc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )
