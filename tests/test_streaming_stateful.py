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
