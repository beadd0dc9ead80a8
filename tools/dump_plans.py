"""Regenerate PLANS.md: formatted physical plans of key queries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "tile_assign": "Tile math entirely inside WholeStageCodegen (no Python); single hash-agg exchange; parquet scan prunes to (event_id, value).",
    "bbox_filter": "Geo bbox compiled at plan time to x/y ranges; filter sits directly on the scan with column pruning.",
    "property_join_inner": "Dims broadcast (BroadcastHashJoin); no shuffle of the fact side.",
    "knn_events": "Queries broadcast; rank window partitioned by query_id (no global sort).",
    "pyramid_rollup": "One base aggregation reused by all levels; per-level regroups are map-side partial + final pairs.",
    "decontaminate": "Benchmark grams DISTINCTed then broadcast (eval suites are small); training text never shuffles. Token arrays are materialized behind a single_eval Generate barrier (_tk attribute) — without it projection collapse re-inlines split() into the per-index n-gram lambda (opt log #9).",
    "caption_dedup": "Pure-JVM image+caption dedup: pigeonhole phash pair join, iterative connected components over slim (long,long) edges, md5 caption keys computed map-side; no Exchange carries text or captions — only ids, flags, and the 32-char cap_key.",
    "ann_pq": "IVFPQ: two MapInPandas stages (vector encode, query LUT) emit slim rows — embeddings never appear in any Exchange; the candidate join keys on ivf_list and moves (id, pq_code, lut) only; ADC scoring is 8 shift/mask/element_at JVM lookups under the rank window.",
    "lm_score": "Trigram LM: tokens behind a Generate barrier, gram strings hashed map-side (no text in Exchanges), the hashed trigram table cached (InMemoryTableScan) across its two count aggs + scoring join.",
    "heavy_hitters": "Misra-Gries candidates via one MapInPandas pass; exact recount is a broadcast LEFT SEMI — the corpus is never hash-shuffled for the join; only the candidate counts reach the rank window.",
    "fence_dwell": "PIP x sessionize with ZERO Python: crossing-number flag is inlined column algebra, one per-user window Exchange drives both the lag and the running visit sum.",
    "poly_metrics": "Shoelace area/perimeter/centroid as transform/aggregate folds — scan -> project only, no Exchange, no Python.",
    "morans_i": "Global Moran's I: slim cell agg -> bounded neighbor Generate on the AGGREGATED relation -> one-row final agg; every exchange carries (long, long, long); zero Python.",
    "lisa_clusters": "Local Moran/LISA: same cell+contrib join, broadcast one-row global stats (BroadcastNestedLoopJoin of a single row), quadrant CASE is integer sign tests; zero Python.",
    "kde_heatmap": "Binomial KDE: 25-struct explode on aggregated cells, integer weight multiply inside the same stage, one re-aggregation exchange; zero Python, zero float.",
    "cluster_markers": "Marker pyramid: ONE point-level exchange (base-zoom agg); each parent level re-aggregates the slim occupied-cell relation; centroids are int64 sums + div.",
    "gearys_c": "Geary's C: the morans_i cell+contrib shape with the pairwise-difference integer sums (A, B2); one-row float epilogue; zero Python.",
    "idw_fill": "IDW gap fill: 24-struct explode on aggregated cells with exact lcm integer weights, one re-aggregation exchange + LEFT ANTI against occupied; zero Python, zero float.",
    "ripley_k": "Ripley's K: micro7 quantization in the scan projection, 9-key explode equi-join on cell ids (no cartesian), clamped int64 d^2, conditional-count one-row agg + broadcast n; zero Python.",
    "colocation": "Co-location PI: the ripley cell join with a type column; DISTINCT participation agg on (type, type, id) — only ids and type strings in any Exchange.",
    "traj_similarity": "Trajectory Jaccard: distinct (user, cell) projection, inverted-index self-join on the packed cell long, slim (ua, ub) count agg; integer threshold — no float compares.",
    "flow_accum": "Two-phase D8 flow accumulation, phase-B plan (phase A + the border-graph Jacobi run eagerly): tile payload crosses exactly ONE Exchange (the super-tile groupBy); halo strips cached (InMemoryTableScan); inflow rows are slim longs unioned in.",
    "stream_tiles": "Stream network -> MVT: the channel-pixel relation checkpointed once, choropleth render is repartition + sortWithinPartitions + ONE mapInPandas (no per-group machinery), per-tile peak agg joins the slim stats only — no payload in the join.",
    "viewshed": "R3 viewshed: ONE MapInPandas (decode + window clip, blobs reduced to window sub-rectangles) -> ONE FlatMapGroupsInPandas per observer; the only Exchange moves clipped window bytes, never the tile payload.",
    "basin_polygons": "Relational polygonize of flow-trace basins: the doubling output joins big labels, then FOUR rook shuffled hash joins on slim (gx, gy) keys — zero Python nodes below the checkpointed label relation, no cartesian.",
    "cost_distance": "Border-Jacobi Dijkstra, emit-all pass (rounds run eagerly): the group re-reads cached tile bytes (InMemoryTableScan-equivalent localCheckpoint) and unions slim halo longs; dist emerges from one FlatMapGroupsInPandas.",
    "horizon_angle": "Hull-merge horizon, phase-B plan: both stages are FlatMapGroupsInPandas over slim (long) rows — the DEM payload was consumed in phase A\'s single decode; the band filter sits on the final projection.",
    "euclidean_distance": "Separable EDT: two FlatMapGroupsInPandas passes over (long, long, long) rows — per feature COLUMN then per output ROW; block partials emitted inside the row kernel so the n^2 cell surface never exists as a relation; final agg + full-universe left join.",
    "region_group": "Run-length contraction: two JVM windows produce segments, adjacency is a shuffled hash equi-join on (gy+1, value) with the interval overlap as residual, the contracted graph collapses on the driver (guarded union-find) and rejoins as a broadcast — zero Python nodes.",
    "seg_intersections": "Layer x layer crossings: bbox cell fan-out via two Generate explodes, ONE packed-cell shuffled hash join (no broadcast, no cartesian), canonical-cell + orientation-sign filters inline in the join projection; all JVM.",
    "dissolve_area": "Union area by zone: distinct x-corner lead window -> strip-cover join -> islands-and-gaps windows -> integer area folds; every Exchange carries (long) zone keys and corners; zero Python.",
    "map_match": "Windowed HMM Viterbi as ONE static DAG: cell-fanout candidate join, T-1 unrolled slim self-joins keyed by trajectory id with map-combined groupBy argbest (unique positional-rank totals), arithmetic path decode joining the cached candidate relation — zero Python, all joins broadcast at gate scale.",
    "variogram": "Empirical semivariogram: micro7 quantization in the scan projection, 9-key explode equi-join (unordered pairs once), clamped int64 d^2 + squared-threshold CASE bins, one slim groupBy; zero Python, zero float.",
    "landscape_metrics": "FRAGSTATS class metrics: run-length segments (two JVM windows), region labels via the guarded driver union-find broadcast, different-value overlap + run-boundary + border edge arms unioned into one slim groupBy; zero Python nodes.",
    "od_balance": "Fixed-point Furness: 2*rounds WINDOW half-steps (partitioned by the balanced axis — linear lineage, no self-join lineage duplication), broadcast growth-factor targets from the cached seed; only (o, d, w) longs in any Exchange.",
    "central_features": "Integer-weighted Weiszfeld: 6 unrolled rounds, each one broadcast center join + map-combined int64 sums; the row-wise IEEE weight floor is the only float, inside the projection; zero Python.",
    "kmeans_cells": "Fixed-round Lloyd: per round one broadcast centroid join, packed-argmin groupBy(point) then map-combined groupBy(cid); points cached (InMemoryTableScan) across rounds; zero Python.",
    "cell_triangles": "Degree-ordered triangle count: movement edges deduped, oriented by (deg, id), the oriented relation cached across its three join references; wedge + closing joins are shuffled hash equi-joins on longs; 3-arm corner explode feeds the final slim agg.",
    "warp_tiles": "Affine warp: output-tile lattice explodes to its bounded input-tile set, ONE payload-carrying Exchange into applyInPandas (pixels must move, as in the overview roll-up), int64 bilinear inside the kernel, stats out.",
    "tile_ssim": "SSIM audit: one MapInPandas (decode + degrade + integer moments), no payload in any Exchange, literal-constant float epilogue in the final projection.",
    "zonal_correlation": "Two-surface zonal moments: zones broadcast via SparkContext, one MapInPandas decode+surface pass emitting slim partials, associative combine, exact cov/var numerators + guarded float epilogue.",
    "contact_pairs": "Space-time contacts: DISTINCT packed-slot projection, inverted-index self-join on one long, slim pair counts; zero Python.",
    "join_counts": "Cliff-Ord join counts: within-run closed form + boundary + overlap joins off the segment relation, class totals joined twice (broadcast), exact ppm expectation quotient; zero Python.",
    "hillshade": "Horn hillshade stats: the slope_aspect halo-exchange shape — one MapInPandas decode pass, ~3 KB strips in the single slim shuffle (<= 9 rows/key), payload never in an Exchange; IEEE epilogue inside the kernel.",
    "silhouette_cells": "Simplified silhouette: points x BROADCAST centroid join, groupBy(id) sort_array/collect_list (exactly k rows per key), sqrt/div epilogue in the projection, slim (cid, sq) final agg; zero Python.",
    "ngram_jaccard": "PPJoin exact-Jaccard: shingles map-side (text never shuffles), doc-frequency prefix ranking (one slim window), prefix-gram equi-join on rare keys, JVM array_intersect verify, member re-expansion broadcast-guarded; prefix relation cached across the self-join.",
}


def main():
    from versatiles_rs_spark import queries as Q
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    sections = []
    for name, note in NOTES.items():
        df = Q.REGISTRY[name].fn(spark, sf)
        df.count()  # finalize the AQE plan
        plan = df._jdf.queryExecution().explainString(mode)
        head = plan.split("\n\n")[0]
        scan = "\n".join(
            l for l in plan.splitlines() if "PushedFilters" in l or "ReadSchema" in l
        )
        sections.append(
            f"## {name}\n\n{note}\n\n```\n{head}\n```\n\nScan details:\n```\n{scan.strip()}\n```\n"
        )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write(
            "# PLANS — physical plans of key queries (explain formatted, executed under AQE)\n\n"
            "Snapshots regenerated by tools/dump_plans.py; the properties annotated here are\n"
            "pinned as assertions in tests/test_plan_quality.py so they cannot silently regress.\n\n"
            + "\n".join(sections)
        )
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
