"""`versatiles probe` analog: inspect a tile table.

Prints TileJSON-style metadata + per-zoom size statistics (the probe
`measure_tile_sizes` dev tool, /root/reference/versatiles/src/tools/
dev_tools/measure_tile_sizes.rs:36).

    python tools/probe.py /path/to/tile_table_or_levels_dir
    python tools/probe.py tiles.{versatiles,pmtiles,mbtiles,tar}   # containers
    python tools/probe.py http(s)://.../tiles.pmtiles              # remote
    python tools/probe.py /path/to/snapshot_table                  # meta/HEAD dir:
        prints the commit history (op, commit_id, lineage rows/bytes) and
        reads the CURRENT snapshot for the tile stats
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1]
    from pyspark.sql import functions as F

    from versatiles_rs_spark.session import get_spark
    from versatiles_rs_spark.sources.containers import tilejson_for

    spark = get_spark(app_name="probe", master="local[8]", shuffle_partitions=8)
    header = None
    if path.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles import (
            read_versatiles,
            read_versatiles_header,
            read_versatiles_metadata,
        )

        header = dict(read_versatiles_header(path), metadata=read_versatiles_metadata(path))
        df = read_versatiles(spark, path)
    elif path.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import (
            read_pmtiles,
            read_pmtiles_header,
            read_pmtiles_metadata,
        )

        header = dict(read_pmtiles_header(path), metadata=read_pmtiles_metadata(path))
        df = read_pmtiles(spark, path)
    elif path.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import read_mbtiles

        df = read_mbtiles(spark, path)
    elif path.endswith(".tar"):
        from versatiles_rs_spark.sources.tar import read_tar

        df = read_tar(spark, path)
    elif os.path.exists(os.path.join(path, "meta", "HEAD")):
        from versatiles_rs_spark.sinks.snapshots import SnapshotTable

        t = SnapshotTable(spark, path)
        header = {
            "current_version": t.current_version(),
            "history": [
                {"version": s.version, "op": s.operation, "commit_id": s.commit_id,
                 **s.summary}
                for s in t.history()
            ],
        }
        df = t.read()
    else:
        df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    payload = "bytes" if "bytes" in df.columns else None
    tj = tilejson_for(df)
    sizes = None
    if payload:
        sizes = [
            r.asDict()
            for r in (
                df.groupBy("z")
                .agg(
                    F.count("*").alias("n_tiles"),
                    F.sum(F.length(payload)).alias("total_bytes"),
                    F.min(F.length(payload)).alias("min_bytes"),
                    F.max(F.length(payload)).alias("max_bytes"),
                    F.round(F.avg(F.length(payload)), 1).alias("avg_bytes"),
                )
                .orderBy("z")
                .collect()
            )
        ]
    out = {"tilejson": tj, "size_stats": sizes}
    if header is not None:
        out["container"] = header
    print(json.dumps(out, indent=2, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
