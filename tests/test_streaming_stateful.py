"""applyInPandasWithState operators: cross-batch dedup, running totals."""

import os

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.streaming.stateful import stream_dedup, stream_tile_totals


def _write_batches(spark, src, batches):
    """One parquet FILE per batch so maxFilesPerTrigger=1 forces N
    micro-batches in arrival order (lexicographic file names)."""
    os.makedirs(src, exist_ok=True)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows)
        pq.write_table(pa.Table.from_pandas(pdf), os.path.join(src, f"batch_{i}.parquet"))


def test_stream_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batches(
        spark,
        src,
        [
            # batch 0: two distinct texts, one in-batch duplicate
            {"doc_id": [1, 2, 3], "text": ["aaa", "bbb", "aaa"]},
            # batch 1: all duplicates of batch 0 + one new text
            {"doc_id": [4, 5, 6], "text": ["aaa", "bbb", "ccc"]},
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.text: r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # first occurrence only, min id within the first batch it appeared
    assert got == {"aaa": 1, "bbb": 2, "ccc": 6}


def test_stream_tile_totals_accumulate(spark, tmp_path):
    src = str(tmp_path / "tsrc")
    _write_batches(
        spark,
        src,
        [
            {"value": list(range(0, 500))},
            {"value": list(range(0, 500))},  # same keys again -> totals double
        ],
    )
    stream = (
        spark.readStream.schema("value long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_tile_totals(stream, zoom=4)
        .writeStream.format("memory")
        .queryName("totals_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM totals_out")
    # the last update per tile is exactly 2x the first batch's count
    last = (
        out.groupBy("z", "x", "y").agg(F.max("total").alias("final"), F.min("total").alias("first"))
    )
    bad = last.filter(F.col("final") != 2 * F.col("first")).count()
    assert bad == 0
    assert last.agg(F.sum("final")).first()[0] == 1000


def test_stream_sessions_match_batch_operator(spark, tmp_path):
    """Events streamed in timestamp-ordered micro-batches must converge to
    exactly the batch sessionize() rollup."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.sessions import sessionize
    from versatiles_rs_spark.streaming.stateful import stream_sessions

    rng = np.random.RandomState(5)
    n = 600
    pdf = pd.DataFrame(
        {
            "user_id": rng.randint(0, 12, n),
            "ts": pd.to_datetime(
                np.sort(rng.randint(0, 3_000_000, n)), unit="s"
            ).astype("datetime64[us]"),
        }
    ).drop_duplicates(["user_id", "ts"])
    # 3 batches in global time order (sessions straddle batch boundaries)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    cuts = np.array_split(pdf, 3)
    src = str(tmp_path / "sess_src")
    _write_batches(spark, src, [c.reset_index(drop=True) for c in cuts])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessions(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # final value per session = the largest emitted update (n_events and
    # end_us are monotone within a session; start_us constant)
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.start_us, r.end_us)
        for r in spark.sql(
            """SELECT user_id, session_seq, max(n_events) AS n_events,
                      min(start_us) AS start_us, max(end_us) AS end_us
               FROM sessions_out GROUP BY 1, 2"""
        ).collect()
    }

    batch = sessionize(
        spark.createDataFrame(pdf), ts_col="ts", by=("user_id",), gap_seconds=1800
    )
    exp = {
        (r.user_id, r.session_seq): (r.n_events, r.start_us, r.end_us)
        for r in batch.withColumn(
            "us",
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', ts)"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .collect()
    }
    assert got == exp


def test_stream_sessions_late_event_extends_not_reopens(spark, tmp_path):
    """An event arriving in a later batch with an EARLIER timestamp extends
    the open session (end never moves backwards) — the documented
    arrival-order semantics."""
    import pandas as pd

    from versatiles_rs_spark.streaming.stateful import stream_sessions

    src = str(tmp_path / "late_src")
    _write_batches(
        spark,
        src,
        [
            {"user_id": [1, 1],
             "ts": pd.to_datetime([1000, 2000], unit="s").astype("datetime64[us]")},
            # late: before the current last_us -> same session, end unchanged
            {"user_id": [1],
             "ts": pd.to_datetime([1500], unit="s").astype("datetime64[us]")},
        ],
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessions(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM late_out ORDER BY n_events DESC LIMIT 1"
    ).collect()
    r = rows[0]
    assert (r.session_seq, r.n_events) == (1, 3)
    assert r.end_us == 2000 * 1_000_000
