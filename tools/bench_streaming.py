"""Per-micro-batch commit latency for the exactly-once snapshot sink.

VERDICT r3 item 8: the streaming path (streaming/analytics.py ->
streaming/snapshot_sink.py) has correctness tests (batch parity, resume,
replayed-batchId dedup) but no recorded latency. This bench stages the sf
events table as N parquet chunk files, replays them as a file stream
(maxFilesPerTrigger=1 => one micro-batch per chunk), runs the watermarked
windowed cell-count aggregation, and commits each micro-batch through the
batchId-idempotent SnapshotTable sink. Latency comes from Spark's own
StreamingQueryProgress (durationMs.triggerExecution = full batch wall
including the foreachBatch commit; durationMs.addBatch = the sink-side
portion), reported as p50/p95 across batches.

Usage:
    python tools/bench_streaming.py [--batches 16] [--sf-dir /root/testdata/sf0.1]
                                    [--update-bench-md]

Prints one JSON line:
    {"metric": "snapshot-sink micro-batch commit latency", "batches": N,
     "p50_ms": ..., "p95_ms": ..., "addbatch_p50_ms": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pctl(xs: list[float], p: float) -> float:
    """Nearest-rank percentile (deterministic, no interpolation)."""
    xs = sorted(xs)
    i = max(0, min(len(xs) - 1, int(round(p / 100.0 * (len(xs) - 1)))))
    return xs[i]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--zoom", type=int, default=6)
    ap.add_argument("--window", default="6 hours")
    ap.add_argument("--watermark", default="12 hours")
    ap.add_argument("--update-bench-md", action="store_true")
    ap.add_argument(
        "--shuffle-partitions", type=int, default=8,
        help="state-store partition count — the latency knob: micro-batch "
        "state is tiny per window, so fewer partitions cut per-batch task "
        "overhead (a throughput-oriented batch job wants cores*1-4; a "
        "latency-oriented stream wants just enough for its state volume)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from versatiles_rs_spark.session import get_spark
    from versatiles_rs_spark.sinks.snapshots import SnapshotTable
    from versatiles_rs_spark.streaming.analytics import (
        stream_counts_to_snapshot,
        stream_window_cell_counts,
    )
    from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=args.shuffle_partitions
    )
    work = tempfile.mkdtemp(prefix="bench_stream_")
    stage = os.path.join(work, "stage")
    try:
        # Stage: one parquet file per intended micro-batch, event-time ordered
        # so the watermark advances monotonically like a live feed (late data
        # within a chunk still exercises the state store).
        ev = (
            spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
            .select(
                "event_id",
                "ts",
                derived_lon_expr(F.col("event_id")).alias("lon"),
                derived_lat_expr(F.col("event_id")).alias("lat"),
            )
        )
        n_rows = ev.count()
        (
            ev.repartitionByRange(args.batches, "ts")
            .write.mode("overwrite")
            .parquet(stage)
        )
        schema = ev.schema

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        counts = stream_window_cell_counts(
            stream, zoom=args.zoom, window=args.window, watermark=args.watermark
        )
        table = SnapshotTable(spark, os.path.join(work, "snap"), stat_cols=["win_us"])
        q = stream_counts_to_snapshot(
            counts, table, os.path.join(work, "ckpt"), trigger_available_now=True
        )
        q.awaitTermination()

        prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
        trig = [float(p["durationMs"]["triggerExecution"]) for p in prog]
        addb = [float(p["durationMs"].get("addBatch", 0)) for p in prog]
        rows_in = sum(int(p["numInputRows"]) for p in prog)
        committed = table.current_version()
        result = {
            "metric": "snapshot-sink micro-batch commit latency (windowed cell counts, exactly-once)",
            "unit": "ms",
            "batches": len(trig),
            "rows": rows_in,
            "p50_ms": round(pctl(trig, 50), 1),
            "p95_ms": round(pctl(trig, 95), 1),
            "max_ms": round(max(trig), 1),
            "addbatch_p50_ms": round(pctl(addb, 50), 1),
            "addbatch_p95_ms": round(pctl(addb, 95), 1),
            "snapshots_committed": committed + 1 if committed is not None else 0,
            "sf_dir": args.sf_dir,
            "cpus": int(cpus),
        }
        assert rows_in == n_rows, (rows_in, n_rows)
        print(json.dumps(result))
        if args.update_bench_md:
            _update_bench_md(result)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


def _update_bench_md(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md")
    marker = "## Streaming: snapshot-sink micro-batch commit latency"
    body = (
        f"{marker}\n\n"
        f"`python tools/bench_streaming.py` — sf events table replayed as a\n"
        f"{result['batches']}-file stream (maxFilesPerTrigger=1), watermarked windowed\n"
        f"cell counts committed exactly-once per micro-batch into a SnapshotTable\n"
        f"(one atomic snapshot per batch, batchId-idempotent).\n\n"
        f"| metric | value |\n|---|---|\n"
        f"| micro-batches | {result['batches']} ({result['rows']:,} rows) |\n"
        f"| trigger p50 / p95 / max | {result['p50_ms']:.0f} / {result['p95_ms']:.0f} / {result['max_ms']:.0f} ms |\n"
        f"| sink commit (addBatch) p50 / p95 | {result['addbatch_p50_ms']:.0f} / {result['addbatch_p95_ms']:.0f} ms |\n"
        f"| snapshots committed | {result['snapshots_committed']} |\n"
        f"| cores | {result['cpus']} |\n"
    )
    text = open(path).read()
    if marker in text:
        head, _, rest = text.partition(marker)
        nxt = rest.find("\n## ")
        text = head + body + (rest[nxt + 1:] if nxt >= 0 else "")
    else:
        text = text.rstrip() + "\n\n" + body
    open(path, "w").write(text)
    print(f"# BENCH.md updated: {marker}", file=sys.stderr)


if __name__ == "__main__":
    main()
