"""Streaming hotspots (streaming/analytics.py): windowed cell counts ->
snapshot commits -> per-window Gi* parity with the batch statistic."""

import datetime

from pyspark.sql import functions as F

from versatiles_rs_spark.functions.hotspots import getis_ord_hotspots
from versatiles_rs_spark.sinks.snapshots import SnapshotTable
from versatiles_rs_spark.streaming.analytics import (
    stream_counts_to_snapshot,
    stream_window_cell_counts,
    window_hotspots,
)

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _mk_points(spark, path):
    """3 hours of points; hour 1 concentrates into one hot box."""
    rows = []
    k = 0
    for h in range(3):
        for i in range(40):
            k += 1
            lon = -150.0 + (k * 37 % 300)
            lat = -70.0 + (k * 53 % 140)
            rows.append((float(lon), float(lat), T0 + datetime.timedelta(hours=h, seconds=i)))
        if h == 1:
            for i in range(30):
                rows.append((20.0 + i * 0.01, 20.0 + i * 0.01,
                             T0 + datetime.timedelta(hours=1, minutes=30, seconds=i)))
    df = spark.createDataFrame(rows, "lon double, lat double, ts timestamp_ntz")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df


def test_streamed_window_gi_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pts")
    batch_pts = _mk_points(spark, src)

    stream = (
        spark.readStream.schema("lon double, lat double, ts timestamp_ntz")
        .parquet(src)
    )
    counts = stream_window_cell_counts(stream, zoom=5, window="1 hour",
                                       watermark="0 seconds")
    table = SnapshotTable(spark, str(tmp_path / "tbl"), stat_cols=["win_start"])
    q = stream_counts_to_snapshot(counts, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    stored = table.read()
    wins = [r["win_start"] for r in stored.select("win_start").distinct().collect()]
    # availableNow + watermark: all sealed windows committed exactly once
    assert len(wins) >= 2
    for w in sorted(wins):
        streamed = {
            (r["x"], r["y"]): (r["cnt"], r["nbr_sum"], r["wi"], r["gi"])
            for r in window_hotspots(table, w, zoom=5).collect()
        }
        w_end = w + datetime.timedelta(hours=1)
        batch = {
            (r["x"], r["y"]): (r["cnt"], r["nbr_sum"], r["wi"], r["gi"])
            for r in getis_ord_hotspots(
                batch_pts.filter((F.col("ts") >= F.lit(w)) & (F.col("ts") < F.lit(w_end))),
                zoom=5,
            ).collect()
        }
        assert streamed == batch, w
    # the hour-1 hot box is the global gi max across all windows
    best = None
    for w in wins:
        for r in window_hotspots(table, w, zoom=5).collect():
            if best is None or r["gi"] > best[0]:
                best = (r["gi"], w)
    assert best[1].hour == 1 and best[0] > 2.0


def test_win_us_zone_map_prunes_files(spark, tmp_path):
    """Epoch-long window stats must actually prune (INT96 timestamp
    footers carry no min/max — code-review r3 session-4 finding)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["win_us"])
    for h in (0, 1):
        t.commit_append(
            spark.createDataFrame(
                [(h * 3_600_000_000, 1, 1, 5)], "win_us long, x long, y long, cnt long"
            ).coalesce(1),
            commit_id=f"w{h}",
        )
    all_files = t.plan_files()
    pruned = t.plan_files(prune={"win_us": 3_600_000_000})
    assert len(all_files) == 2 and len(pruned) == 1


def test_timestamp_stat_col_commit_survives_micros_writer(spark, tmp_path):
    """A TIMESTAMP stat column must not crash the commit when the parquet
    writer emits MICROS footers (datetime min/max -> JSON)."""
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["win_start"])
        t.commit_append(
            spark.createDataFrame(
                [(T0, 1, 1, 5)], "win_start timestamp, x long, y long, cnt long"
            ).coalesce(1),
            commit_id="c0",
        )
        # stats recorded as iso strings; datetime prune bounds normalize
        assert t.plan_files(prune={"win_start": T0}) == t.plan_files()
        later = T0 + datetime.timedelta(days=1)
        assert t.plan_files(prune={"win_start": later}) == []
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)


def test_streamed_window_heatmap_matches_batch(spark, tmp_path):
    """The windowed KDE heat surface shares the batch convolution code
    path: streamed-window density == batch density over the same points,
    and the hour-1 hot box carries the global density max."""
    from versatiles_rs_spark.functions.kde import kde_heatmap
    from versatiles_rs_spark.streaming.analytics import window_heatmap

    src = str(tmp_path / "pts")
    batch_pts = _mk_points(spark, src)

    stream = (
        spark.readStream.schema("lon double, lat double, ts timestamp_ntz")
        .parquet(src)
    )
    counts = stream_window_cell_counts(stream, zoom=5, window="1 hour",
                                       watermark="0 seconds")
    table = SnapshotTable(spark, str(tmp_path / "tbl"), stat_cols=["win_start"])
    q = stream_counts_to_snapshot(counts, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    wins = sorted(
        r["win_start"]
        for r in table.read().select("win_start").distinct().collect()
    )
    assert len(wins) >= 2
    best = None
    for w in wins:
        streamed = {
            (r["x"], r["y"]): r["density"]
            for r in window_heatmap(table, w, zoom=5, radius=2).collect()
        }
        w_end = w + datetime.timedelta(hours=1)
        batch = {
            (r["x"], r["y"]): r["density"]
            for r in kde_heatmap(
                batch_pts.filter((F.col("ts") >= F.lit(w)) & (F.col("ts") < F.lit(w_end))),
                zoom=5, radius=2,
            ).collect()
        }
        assert streamed == batch, w
        m = max(streamed.values())
        if best is None or m > best[0]:
            best = (m, w)
    assert best[1].hour == 1  # the planted hot box dominates the heat layer
