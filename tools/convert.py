"""`versatiles convert IN OUT` analog — the primary ETL entry point (§3.1).

IN:  a parquet tile table, a {z}/{x}/{y}.ext directory tree, or a .vpl file
     (VersaTiles Pipeline Language — parsed by plans/vpl.py).
OUT: parquet tile table (default Hilbert order = pmtiles layout; --layout
     block = versatiles 256-block layout) or a directory tree (--layout dir).

Converter options mirror versatiles_container converter.rs: --bbox + --zoom
pruning (pushed into the scan), --flip-y / --swap-xy, --recompress.

    python tools/convert.py IN OUT [--min-zoom A --max-zoom B]
        [--bbox w,s,e,n --bbox-zoom Z] [--flip-y] [--swap-xy]
        [--layout hilbert|block|dir] [--format png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--min-zoom", type=int)
    ap.add_argument("--max-zoom", type=int)
    ap.add_argument("--bbox", help="w,s,e,n in degrees")
    ap.add_argument("--bbox-zoom", type=int, help="zoom at which to compile the bbox")
    ap.add_argument("--flip-y", action="store_true")
    ap.add_argument("--swap-xy", action="store_true")
    ap.add_argument("--format", help="re-encode payloads to this format "
                    "(pass-through tags like svg/topojson are never re-encoded "
                    "— tile_format.rs:104-121 semantics)")
    ap.add_argument("--quality", default="85")
    ap.add_argument("--layout", choices=["hilbert", "block", "dir"], default="hilbert")
    ap.add_argument(
        "--dedup",
        action="store_true",
        help="collapse duplicate (z,x,y) rows to one tile (deterministic min payload) "
        "— from_stacked first-wins semantics for non-unique sources",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from versatiles_rs_spark.operators.filter import filter_geo_bbox, filter_zoom
    from versatiles_rs_spark.operators.raster import raster_format
    from versatiles_rs_spark.operators.transform import flip_y_df, swap_xy_df
    from versatiles_rs_spark.session import get_spark
    from versatiles_rs_spark.sinks.writers import (
        export_directory_tree,
        write_block_grouped,
        write_hilbert_sorted,
    )
    from versatiles_rs_spark.sources.containers import read_directory_tree, tilejson_for

    spark = get_spark(app_name="convert", master=args.master)
    t0 = time.time()

    # resolve source (container_registry.rs:168 analog: dispatch on shape)
    if args.src.endswith(".vpl"):
        from versatiles_rs_spark.plans.vpl import run_vpl

        with open(args.src) as f:
            df = run_vpl(spark, f.read())
    elif args.src.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import read_mbtiles

        df = read_mbtiles(spark, args.src)
    elif args.src.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import read_pmtiles

        df = read_pmtiles(spark, args.src)
    elif args.src.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles import read_versatiles

        df = read_versatiles(spark, args.src)
    elif args.src.endswith(".tar"):
        from versatiles_rs_spark.sources.tar import read_tar

        df = read_tar(spark, args.src)
    elif os.path.exists(os.path.join(args.src, "meta", "HEAD")):
        # snapshot table (e.g. a refresh_job level): publish the CURRENT
        # merged view — newest _v wins per tile
        from versatiles_rs_spark.sinks.snapshots import SnapshotTable

        df = SnapshotTable(spark, args.src).read_merged(["z", "x", "y"])
    elif os.path.isdir(args.src) and not any(
        name.endswith(".parquet") for name in os.listdir(args.src)
    ):
        df = read_directory_tree(spark, args.src)
    else:
        df = spark.read.parquet(args.src)

    if args.min_zoom is not None or args.max_zoom is not None:
        df = filter_zoom(df, args.min_zoom, args.max_zoom)
    if args.bbox:
        if args.bbox_zoom is None:
            ap.error("--bbox requires --bbox-zoom")
        w, s, e, n = (float(v) for v in args.bbox.split(","))
        df = filter_geo_bbox(df, (w, s, e, n), zoom=args.bbox_zoom)
    if args.flip_y:
        df = flip_y_df(df)
    if args.swap_xy:
        df = swap_xy_df(df)
    # pass-through payload formats (tile_format.rs:77-80,104-121): the tag
    # travels in the container header, the bytes are untouched — re-encoding
    # only applies to raster formats the codecs understand
    _PASS_THROUGH = {"svg", "topojson", "geojson", "json", "bin", "mvt", "pbf"}
    if args.format and args.format not in _PASS_THROUGH:
        df = raster_format(df, target_fmt=args.format, quality=args.quality)
    if args.dedup:
        from pyspark.sql import functions as F

        fmt_col = (
            [F.min("fmt").alias("fmt")] if "fmt" in df.columns else []
        )
        df = df.groupBy("z", "x", "y").agg(F.min("bytes").alias("bytes"), *fmt_col)

    if args.dst.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import write_mbtiles

        write_mbtiles(df, args.dst)
        out_df = df
    elif args.dst.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import write_pmtiles

        write_pmtiles(df, args.dst, tile_type=args.format or "png")
        out_df = df
    elif args.dst.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles import write_versatiles

        write_versatiles(df, args.dst, tile_type=args.format or "png")
        out_df = df
    elif args.dst.endswith(".tar"):
        from versatiles_rs_spark.sources.tar import write_tar

        write_tar(df, args.dst)
        out_df = df
    elif args.layout == "hilbert":
        write_hilbert_sorted(df, args.dst)
        out_df = spark.read.parquet(args.dst)
    elif args.layout == "block":
        write_block_grouped(df, args.dst)
        out_df = spark.read.parquet(args.dst)
    else:
        n_files = export_directory_tree(df, args.dst)
        out_df = df
    tj = tilejson_for(out_df)
    print(
        json.dumps(
            {
                "job": "convert",
                "src": args.src,
                "dst": args.dst,
                "layout": args.layout,
                "n_tiles": out_df.count(),
                "minzoom": tj["minzoom"],
                "maxzoom": tj["maxzoom"],
                "sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
