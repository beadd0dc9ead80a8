"""Snapshot-versioned tables (sinks/snapshots.py): atomic publish, time
travel, incremental changes, idempotent resume, and conflict detection."""

import json
import os

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.sinks.snapshots import SnapshotConflict, SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 10)


def test_append_time_travel_and_changes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5), commit_id="batch0")
    t.commit_append(_df(spark, 5, 8), commit_id="batch1")
    t.commit_append(_df(spark, 8, 10), commit_id="batch2")
    assert t.current_version() == 2
    assert t.read().count() == 10
    assert sorted(r.id for r in t.read(version=0).collect()) == list(range(5))
    assert sorted(r.id for r in t.read(version=1).collect()) == list(range(8))
    # incremental consumption: only the files added after v0
    assert sorted(r.id for r in t.changes(0).collect()) == list(range(5, 10))
    assert sorted(r.id for r in t.changes(0, 1).collect()) == list(range(5, 8))
    assert t.changes(2).count() == 0
    ops = [(s.version, s.operation, s.commit_id) for s in t.history()]
    assert ops == [(0, "append", "batch0"), (1, "append", "batch1"), (2, "append", "batch2")]


def test_overwrite_resets_file_list(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5), commit_id="a")
    t.commit_overwrite(_df(spark, 100, 103), commit_id="b")
    assert sorted(r.id for r in t.read().collect()) == [100, 101, 102]
    assert sorted(r.id for r in t.read(version=0).collect()) == list(range(5))  # still there


def test_idempotent_commit_is_resume(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.commit_append(_df(spark, 0, 5), commit_id="level3")
    s2 = t.commit_append(_df(spark, 0, 5), commit_id="level3")  # re-run after restart
    assert (s1.version, s2.version) == (0, 0)
    assert t.current_version() == 0 and t.read().count() == 5


def test_crash_before_head_swap_keeps_readers_on_old_version(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 5), commit_id="a")
    # simulate: writer died after writing v1.json but before the HEAD swap
    fake = {"version": 1, "parent": 0, "operation": "append", "commit_id": "dead",
            "files": ["/nonexistent.parquet"], "summary": {}}
    with open(os.path.join(str(tmp_path / "t"), "meta", "v1.json"), "w") as f:
        json.dump(fake, f)
    assert t.current_version() == 0
    assert t.read().count() == 5  # HEAD never moved; partial commit invisible
    # and the next writer from the same parent hits the conflict, not corruption
    with pytest.raises(SnapshotConflict):
        t.commit_append(_df(spark, 5, 6), commit_id="next")


def test_snapshot_changes_registry_query(spark, sf_dir):
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["snapshot_changes"].fn(spark, sf_dir)
    rows = {r.event_type: r.n for r in df.collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r.event_type: r.n
        for r in ev.filter(F.col("event_id") % 3 != 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == want
