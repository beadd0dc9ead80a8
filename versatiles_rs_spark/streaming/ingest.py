"""Structured Streaming tile ingestion.

The reference's dataflow is bounded pull-based streams (tile_stream.rs:61 —
no watermarks or event time); incremental ingestion is target behavior
beyond parity (SURVEY.md §2.9). Two entry points:

- `stream_tile_assign`: readStream -> derive (z,x,y) with the SAME JVM column
  expressions as the batch path (one code path for tile math) -> optional
  watermark + per-window per-tile counts. Works over any streaming source;
  tests drive it with the `rate` source and file sources.
- `stream_to_tile_table`: append tiles into a parquet/Iceberg tile table with
  `Trigger.AvailableNow` semantics — the incremental-ingest analog of the
  converter ETL, checkpointed by Spark's own WAL (complementing the
  level-checkpoint protocol in sinks/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import derived_lat_expr, derived_lon_expr, with_tile_columns


def stream_tile_assign(
    stream: DataFrame,
    zoom: int = 8,
    key_col: str = "value",
    ts_col: str = "timestamp",
    watermark: str = "10 seconds",
    window_len: str = "10 seconds",
) -> DataFrame:
    """Event stream -> watermarked per-window per-tile counts.

    Input needs an int64 key column (lon/lat derived deterministically, same
    contract as the batch queries) and an event-time column. Late rows beyond
    the watermark are dropped by Spark; the aggregation state is bounded.
    """
    pts = stream.withColumn("lon", derived_lon_expr(F.col(key_col))).withColumn(
        "lat", derived_lat_expr(F.col(key_col))
    )
    tiled = with_tile_columns(pts, "lon", "lat", zoom=zoom)
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), "z", "x", "y")
        .agg(F.count("*").alias("n_points"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "z",
            "x",
            "y",
            "n_points",
        )
    )


def stream_to_tile_table(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    zoom: int = 8,
    key_col: str = "value",
):
    """Incrementally append tile-assigned rows to a parquet tile table.

    Returns the StreamingQuery; callers use Trigger.AvailableNow (tests) or a
    processing-time trigger (continuous ingest). Exactly-once via Spark's
    streaming checkpoint + file-sink manifest.
    """
    pts = stream.withColumn("lon", derived_lon_expr(F.col(key_col))).withColumn(
        "lat", derived_lat_expr(F.col(key_col))
    )
    tiled = with_tile_columns(pts, "lon", "lat", zoom=zoom)
    return (
        tiled.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_session_stats(
    stream: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization via Spark's native session_window —
    the streaming twin of functions/sessions.py's batch sessionize (same
    gap semantics: fixes closer than `gap` merge into one session, the
    window seals when the watermark passes its end).

    Per sealed session: (user, session_start, session_end, n_fixes).
    State is Spark's built-in session-window store keyed by the entity —
    slim (entity, window bounds, count) per open session, merged
    incrementally; this is the one stateful streaming shape the family
    didn't yet cover (windowed counts: analytics.py; dedup + running
    totals: stateful.py; exactly-once commits: snapshot_sink.py).

    TIMESTAMP_NTZ event time casts to TIMESTAMP like
    stream_window_cell_counts (session tz pinned UTC)."""
    s = stream.withColumn("_evt", F.col(ts_col).cast("timestamp"))
    return (
        s.withWatermark("_evt", watermark)
        .groupBy(
            F.col(entity_col).alias("user"),
            F.session_window(F.col("_evt"), gap).alias("win"),
        )
        .agg(F.count("*").cast("long").alias("n_fixes"))
        .select(
            "user",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_fixes",
        )
    )
