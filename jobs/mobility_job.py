"""Mobility-analytics ETL job — the movement counterpart of terrain_job:
synthesize (or in production, ingest) a GPS fix stream and a road layer,
map-match trajectory windows, build and balance the OD matrix, extract
the contact graph, and publish a visit-density choropleth container —
ONE COMMIT PER STAGE (sinks/checkpoint.py), so a killed run resumes
after the last committed stage.

Stages (each a LevelCheckpointer commit; every committed relation is
SLIM — ids, cells, counts; no payload until the export render):
  1 fixes    — deterministic GPS fixes (n_users x n_fixes, 10-min
               cadence; derived_lon/lat scatter — the input_hint shape
               for a fix table)
  2 segments — road-segment layer (orders-style derivation)
  3 matched  — HMM map matching of each user's first 6-fix window
               (joins/map_match: unrolled Viterbi, pure JVM)
  4 od       — OD matrix between zoom-6 cells from consecutive fixes
  5 balanced — fixed-point Furness balancing to growth-factor targets
               (functions/balance)
  6 contacts — space-time contact graph (joins/trajectory.contact_pairs)
  7 export   — per-cell visit counts rendered as an MVT choropleth
               .mbtiles (servable as-is)

    spark-submit --py-files dist/versatiles_rs_spark.zip \
        jobs/mobility_job.py --n-users 500 --n-fixes 64 --out /data/mob

Prints one JSON metrics line (per-stage wall seconds + graph stats).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, n_users: int, n_fixes: int, n_segs: int, out: str, zoom: int = 6):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.balance import furness_balance
    from versatiles_rs_spark.joins.map_match import candidate_segments, map_match
    from versatiles_rs_spark.joins.trajectory import contact_pairs
    from versatiles_rs_spark.sinks.checkpoint import LevelCheckpointer
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles
    from versatiles_rs_spark.udfs import (
        derived_lat_expr,
        derived_lon_expr,
        tile_x_expr,
        tile_y_expr,
    )
    from versatiles_rs_spark.vector_tile import cells_to_choropleth_tiles

    ck = LevelCheckpointer(spark, out + "/stages", job_id="mobility")
    stage_s: dict[str, float] = {}
    stats: dict = {"n_users": n_users, "n_fixes": n_fixes, "n_segs": n_segs}

    def timed(name, level, build):
        t0 = time.time()
        committed = ck.is_committed(level)
        df = ck.checkpoint(level, None if committed else build(), payload=None)
        stage_s[name] = round(time.time() - t0, 2)
        stats[f"{name}_resumed"] = committed
        return df

    # 1 fixes: (uid, k, us, lon, lat, px, py) — 10-minute cadence
    def build_fixes():
        base_us = 1_704_067_200_000_000  # 2024-01-01 UTC, exact microseconds
        u = spark.range(n_users).select(F.col("id").alias("uid"))
        k = spark.range(n_fixes).select(F.col("id").alias("k"))
        key = F.col("uid") * 1024 + F.col("k")
        lon, lat = derived_lon_expr(key), derived_lat_expr(key)
        return u.crossJoin(k).select(
            "uid", "k",
            (F.lit(base_us) + F.col("k") * F.lit(600_000_000)).alias("us"),
            lon.alias("lon"), lat.alias("lat"),
            (F.floor(lon * 1000).cast("long") + 200000).alias("px"),
            (F.floor(lat * 1000).cast("long") + 200000).alias("py"),
        )

    fixes = timed("fixes", 1, build_fixes)
    stats["fix_rows"] = fixes.count()

    # 2 segments (orders-style derivation, self-contained)
    def build_segments():
        s = spark.range(n_segs).select((F.col("id") + 1).alias("sid"))
        skey = F.col("sid") * 13 + 5
        sx = F.floor(derived_lon_expr(skey) * 1000).cast("long") + 200000
        sy = F.floor(derived_lat_expr(skey) * 1000).cast("long") + 200000
        return s.select(
            "sid", sx.alias("x1"), sy.alias("y1"),
            (sx + (F.col("sid") * 3571 % 4001) - 2000).alias("x2"),
            (sy + (F.col("sid") * 28657 % 4001) - 2000).alias("y2"),
        )

    segs = timed("segments", 2, build_segments)

    # 3 map matching: first 6 fixes per user
    def build_matched():
        win = fixes.filter(F.col("k") < 6).select(
            "uid", (F.col("k") + 1).alias("step"), "px", "py"
        )
        cand = candidate_segments(win, segs, dist=8000, cell=8000, k=4)
        return map_match(cand, n_steps=6, k=4, switch_penalty=10_000_000)

    matched = timed("matched", 3, build_matched)
    stats["matched_users"] = matched.select("user_id").distinct().count()

    # 4 OD matrix between zoom cells (consecutive fixes)
    def build_od():
        c = fixes.select(
            "uid", "k",
            tile_x_expr(F.col("lon"), F.lit(zoom)).alias("cx"),
            tile_y_expr(F.col("lat"), F.lit(zoom)).alias("cy"),
        )
        a = c.alias("a")
        b = c.select(
            F.col("uid").alias("b_uid"), (F.col("k") - 1).alias("b_k"),
            F.col("cx").alias("dx"), F.col("cy").alias("dy"),
        ).alias("b")
        trips = a.join(
            b, (F.col("a.uid") == F.col("b_uid")) & (F.col("a.k") == F.col("b_k"))
        )
        return (
            trips.select(
                (F.col("a.cx") * 64 + F.col("a.cy")).alias("o"),
                (F.col("dx") * 64 + F.col("dy")).alias("d"),
            )
            .groupBy("o", "d")
            .agg(F.count("*").cast("long").alias("w"))
        )

    od = timed("od", 4, build_od)
    stats["od_pairs"] = od.count()

    # 5 Furness balancing to growth-factor targets
    def build_balanced():
        seed = od.cache()
        rt = seed.groupBy("o").agg(
            F.expr("(sum(w) * (100 + (o % 7) * 10)) div 100").alias("t")
        )
        ct = seed.groupBy("d").agg(
            F.expr("(sum(w) * (100 + (d % 5) * 15)) div 100").alias("t")
        )
        return furness_balance(seed, rt, ct, rounds=3)

    balanced = timed("balanced", 5, build_balanced)
    stats["balanced_mass_milli"] = balanced.agg(F.sum("w_milli")).collect()[0][0]

    # 6 contact graph
    def build_contacts():
        pts = fixes.select(
            F.col("uid").alias("user_id"),
            F.expr("CAST(us div 1000000 AS TIMESTAMP)").alias("ts"),
            "lon", "lat",
        )
        return contact_pairs(
            pts, zoom=4, bucket_seconds=86400, min_contacts=2, cell_cap=500
        )

    contacts = timed("contacts", 6, build_contacts)
    stats["contact_pairs"] = contacts.count()

    # 7 export: visit-density choropleth container
    t0 = time.time()
    mbt = os.path.join(out, "visits.mbtiles")
    if not os.path.exists(mbt + ".done"):
        cells = (
            fixes.select(
                tile_x_expr(F.col("lon"), F.lit(zoom + 8)).alias("x"),
                tile_y_expr(F.col("lat"), F.lit(zoom + 8)).alias("y"),
            )
            .groupBy("x", "y")
            .agg(F.count("*").cast("long").alias("visits"))
        )
        mvt = cells_to_choropleth_tiles(
            cells, cell_zoom=zoom + 8, render_zoom=zoom,
            value_cols=("visits",), layer="visits",
        )
        n = write_mbtiles(
            mvt.select("z", "x", "y", "bytes"), mbt, {"format": "pbf"}
        )
        with open(mbt + ".done", "w") as f:
            f.write(str(n))
        stats["exported_tiles"] = n
        stats["export_resumed"] = False
    else:
        stats["exported_tiles"] = int(open(mbt + ".done").read())
        stats["export_resumed"] = True
    stage_s["export"] = round(time.time() - t0, 2)

    stats["stage_s"] = stage_s
    stats["total_s"] = round(sum(stage_s.values()), 2)
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mobility_job")
    ap.add_argument("--n-users", type=int, default=500)
    ap.add_argument("--n-fixes", type=int, default=64)
    ap.add_argument("--n-segs", type=int, default=15000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--zoom", type=int, default=6)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="mobility_job", master=args.master)
    stats = run(spark, args.n_users, args.n_fixes, args.n_segs, args.out, args.zoom)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
