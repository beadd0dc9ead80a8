"""Streaming -> SnapshotTable sink (streaming/snapshot_sink.py):
exactly-once micro-batch commits, backlog resume, replayed-batch dedup,
and the snapshot log as a downstream change feed."""

from pyspark.sql import functions as F

from versatiles_rs_spark.sinks.snapshots import SnapshotTable
from versatiles_rs_spark.streaming.snapshot_sink import (
    snapshot_sink,
    stream_to_snapshot_table,
)


def test_stream_commits_exactly_once_and_resumes(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    t = SnapshotTable(spark, str(tmp_path / "t"))
    spark.range(0, 100).write.parquet(src)

    stream = spark.readStream.schema("id long").parquet(src)
    q = stream_to_snapshot_table(stream, t, ck, query_name="ing")
    q.awaitTermination(120)
    assert t.read().count() == 100
    v1 = t.current_version()

    # drain again with the same checkpoint: backlog empty -> nothing commits
    q2 = stream_to_snapshot_table(
        spark.readStream.schema("id long").parquet(src), t, ck, query_name="ing"
    )
    q2.awaitTermination(120)
    assert t.current_version() == v1 and t.read().count() == 100

    # new backlog arrives -> exactly the delta lands, atomically
    spark.range(100, 130).write.mode("append").parquet(src)
    q3 = stream_to_snapshot_table(
        spark.readStream.schema("id long").parquet(src), t, ck, query_name="ing"
    )
    q3.awaitTermination(120)
    assert t.read().count() == 130
    # the snapshot log doubles as the change feed for downstream consumers
    assert sorted(r.id for r in t.changes(v1).collect()) == list(range(100, 130))


def test_replayed_batch_is_deduplicated(spark, tmp_path):
    """foreachBatch's failure contract: the same batchId may be delivered
    twice; the commit-id idempotence must swallow the replay."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    sink = snapshot_sink(t, "q")
    df = spark.range(0, 10)
    sink(df, 0)
    sink(df, 0)  # replay after a simulated failure
    sink(df, 1)
    assert t.read().count() == 20  # batches 0 and 1 exactly once each
    assert [s.commit_id for s in t.history()] == ["q-batch0", "q-batch1"]
