"""Structured Streaming ingestion: tile assignment parity with the batch
path, watermarked windowed aggregation, AvailableNow file ingest."""

import time

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.streaming.ingest import stream_tile_assign, stream_to_tile_table
from versatiles_rs_spark.udfs import derived_lat_expr, derived_lon_expr, with_tile_columns


def _wait(cond, timeout=60, step=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(step)
    return False


def test_stream_to_tile_table_matches_batch(spark, tmp_path):
    # file source: write a batch of int64 keys, ingest via AvailableNow
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.range(0, 5000).withColumnRenamed("id", "value").write.parquet(src)

    stream = spark.readStream.schema("value long").parquet(src)
    q = stream_to_tile_table(stream, out, ck, zoom=8)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = with_tile_columns(
        spark.range(0, 5000)
        .withColumnRenamed("id", "value")
        .withColumn("lon", derived_lon_expr(F.col("value")))
        .withColumn("lat", derived_lat_expr(F.col("value"))),
        "lon",
        "lat",
        zoom=8,
    )
    # exact parity: streaming and batch tile assignment agree row-for-row
    assert got.count() == 5000
    diff = got.select("value", "z", "x", "y").exceptAll(batch.select("value", "z", "x", "y"))
    assert diff.count() == 0

    # resume: re-running the same AvailableNow query ingests nothing new
    q2 = stream_to_tile_table(spark.readStream.schema("value long").parquet(src), out, ck, zoom=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 5000


def test_windowed_tile_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    rows = spark.range(0, 2000).select(
        F.col("id").alias("value"),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, id % 30)"
        ).alias("timestamp"),
    )
    rows.write.parquet(src)
    stream = spark.readStream.schema("value long, timestamp timestamp").parquet(src)
    agg = stream_tile_assign(stream, zoom=4, watermark="10 seconds", window_len="10 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tile_counts")
    # append mode emits only watermark-closed windows: data spans 3 windows
    # (0-10, 10-20, 20-30); after the single AvailableNow batch the watermark
    # is max_event_time - 10s = 00:00:19, so exactly the first window closed
    assert [str(r.win_start) for r in got.select("win_start").distinct().collect()] == [
        "2026-01-01 00:00:00"
    ]
    # per-tile totals within a closed window match the batch computation
    batch = with_tile_columns(
        rows.withColumn("lon", derived_lon_expr(F.col("value"))).withColumn(
            "lat", derived_lat_expr(F.col("value"))
        ),
        "lon",
        "lat",
        zoom=4,
    ).filter(F.col("timestamp") < "2026-01-01 00:00:10")
    w0 = got.filter(F.col("win_start") == "2026-01-01 00:00:00")
    assert w0.agg(F.sum("n_points")).first()[0] == batch.count()


def test_stream_session_windows_match_batch(spark, tmp_path):
    """stream_session_stats: sealed streaming sessions == the same
    session_window computed in one batch pass (one code path for the gap
    semantics), and only watermark-sealed sessions emit in append mode."""
    from versatiles_rs_spark.streaming.ingest import stream_session_stats

    src = str(tmp_path / "ssrc")
    # 3 users; user 0: two bursts separated by > gap (2 sessions);
    # users 1-2: one burst each; a late straggler at the very end keeps
    # the final sessions unsealed
    rows = spark.createDataFrame(
        [
            (0, "2026-01-01 00:00:00"), (0, "2026-01-01 00:00:30"),
            (0, "2026-01-01 01:00:00"), (0, "2026-01-01 01:00:10"),
            (1, "2026-01-01 00:05:00"),
            (2, "2026-01-01 00:10:00"), (2, "2026-01-01 00:10:05"),
            (9, "2026-01-01 09:00:00"),  # advances the watermark far out
        ],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    rows.write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        stream_session_stats(stream, gap="10 minutes", watermark="30 minutes")
        .writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.user, str(r.session_start)): r.n_fixes
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    # watermark = 09:00 - 30min = 08:30 -> every earlier session sealed
    want = {
        (0, "2026-01-01 00:00:00"): 2,
        (0, "2026-01-01 01:00:00"): 2,
        (1, "2026-01-01 00:05:00"): 1,
        (2, "2026-01-01 00:10:00"): 2,
    }
    assert got == want
    # batch parity: the identical session_window expression over the file
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
    )
    b = {
        (r.user_id, str(r["session_window"].start)): r.n
        for r in batch.collect()
        if r.user_id != 9
    }
    assert b == {k: v for k, v in want.items()}
