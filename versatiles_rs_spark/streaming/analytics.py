"""Streaming spatial analytics — windowed cell counts feeding Gi* surfaces.

The streaming half of the hotspot family: a point stream is aggregated
into per-event-time-window tile-cell counts (watermarked, so late points
fold in until the watermark passes and the window seals), committed
exactly-once into a SnapshotTable via the batchId-idempotent foreachBatch
sink, and any committed window can then be scored with the SAME
`getis_ord_from_counts` statistic the batch query uses — streaming and
batch share one code path for the math, so the streamed surface is
bit-identical to a batch run over the same points (pytest-pinned).

Shape: the only stateful streaming operator is the windowed count (Spark
manages it in the state store, keyed by (window, x, y) — slim longs);
Gi* itself is stateless batch work over the tiny counts relation, run on
demand per window. This is the standard lambda-free pattern: stream the
cheap exact aggregation, defer the statistic to read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.snapshots import SnapshotTable
from ..udfs import tile_x_expr, tile_y_expr


def stream_window_cell_counts(
    stream: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    zoom: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window cell counts of a point stream:
    (win_start, win_end, x, y, cnt). Append-mode compatible — a window's
    rows emit once, after the watermark passes its end.

    TIMESTAMP_NTZ event time is cast to TIMESTAMP (session tz is pinned
    to UTC in session.get_spark, so the wall time is preserved) — Spark's
    watermark operator only accepts the tz-aware type."""
    stream = stream.withColumn("_evt", F.col(ts_col).cast("timestamp"))
    ts_col = "_evt"
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("x"),
            tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("y"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            # epoch-micros long twin of win_start: parquet long footers
            # carry real min/max (INT96 timestamp footers don't), so this
            # is the column the snapshot zone maps prune on
            F.unix_micros(F.col("win.start")).alias("win_us"),
            "x",
            "y",
            "cnt",
        )
    )


def stream_counts_to_snapshot(
    counts: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    query_name: str = "cell_counts",
    trigger_available_now: bool = True,
):
    """Commit the windowed counts into a SnapshotTable exactly once per
    micro-batch (snapshot_sink's batchId-idempotent foreachBatch). Returns
    the StreamingQuery."""
    from .snapshot_sink import snapshot_sink

    writer = (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(snapshot_sink(table, query_name))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _window_cells(table: SnapshotTable, win_start) -> DataFrame:
    """One committed window's (x, y, cnt) slice: zone-map pruned on the
    epoch-long `win_us` twin (timestamp columns carry no parquet footer
    min/max under INT96). The ONE definition of the window read — every
    per-window statistic must go through it so they can never silently
    read different windows."""
    import calendar

    us = calendar.timegm(win_start.timetuple()) * 1_000_000 + win_start.microsecond
    return (
        table.read(prune={"win_us": us})
        .filter(F.col("win_us") == F.lit(us))
        .select("x", "y", "cnt")
    )


def window_hotspots(
    table: SnapshotTable,
    win_start,
    zoom: int = 6,
) -> DataFrame:
    """Gi* surface of one committed window, scored with the shared batch
    statistic (functions/hotspots.getis_ord_from_counts)."""
    from ..functions.hotspots import getis_ord_from_counts

    return getis_ord_from_counts(_window_cells(table, win_start), zoom)


def window_heatmap(
    table: SnapshotTable,
    win_start,
    zoom: int = 6,
    radius: int = 2,
) -> DataFrame:
    """KDE heat surface of one committed window — same snapshot slice as
    window_hotspots, scored with the shared batch convolution
    (functions/kde.kde_from_counts), so the streamed heat layer is
    bit-identical to a batch run over the same points."""
    from ..functions.kde import kde_from_counts

    return kde_from_counts(_window_cells(table, win_start), zoom, radius)
