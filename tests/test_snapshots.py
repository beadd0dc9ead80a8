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


def test_zone_map_pruning(spark, tmp_path):
    """Per-file min/max from parquet footers prune the planned file set;
    pruned reads stay correct and files without stats are never pruned."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["z", "x"])
    for z in (4, 5, 6):
        t.commit_append(
            spark.range(10).select(
                F.lit(z).alias("z"), F.col("id").alias("x"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            commit_id=f"z{z}",
        )
    all_files = t.plan_files()
    assert len(all_files) == 3
    planned = t.plan_files(prune={"z": 5})
    assert len(planned) == 1
    got = t.read(prune={"z": 5}).filter(F.col("z") == 5)
    assert got.count() == 10
    assert sorted(r.x for r in got.collect()) == list(range(10))
    # range prune + conservative keep
    assert len(t.plan_files(prune={"z": (5, 6)})) == 2
    assert len(t.plan_files(prune={"x": (3, 4)})) == 3  # every file overlaps x 0-9
    assert len(t.plan_files(prune={"z": 9})) == 0
    assert t.read(prune={"z": 9}).count() == 0  # empty relation, no error
    assert len(t.plan_files(prune={"unstatted_col": 1})) == 3  # never prune blind


def test_vacuum_retention(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, 0, 5).coalesce(1), commit_id="a")
    t.commit_overwrite(_df(spark, 5, 9).coalesce(1), commit_id="b")
    t.commit_append(_df(spark, 9, 12).coalesce(1), commit_id="c")
    v0_files = t.snapshot(0).files
    stats = t.vacuum(retain_last=2)
    assert stats == {"expired_snapshots": 1, "deleted_files": 1}
    assert all(not os.path.exists(f) for f in v0_files)  # v0-only data gone
    assert sorted(r.id for r in t.read().collect()) == list(range(5, 12))
    assert sorted(r.id for r in t.read(version=1).collect()) == list(range(5, 9))
    with pytest.raises(FileNotFoundError):
        t.read(version=0)  # expired: outside the retention window
    assert [s.version for s in t.history()] == [1, 2]
    assert t.find_commit("a") is None  # resume window == retention window
    # vacuum is idempotent
    assert t.vacuum(retain_last=2) == {"expired_snapshots": 0, "deleted_files": 0}


def test_compact_is_logical_noop_and_vacuumable(spark, tmp_path):
    """Compaction rewrites many small files into few, changes() reports no
    phantom rows across it, appends after it keep flowing, and vacuum
    reclaims the replaced small files."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit_append(_df(spark, i * 5, i * 5 + 5).repartition(4), commit_id=f"b{i}")
    assert len(t.snapshot().files) >= 8  # many small files (AQE may merge some)
    pre_files = set(t.snapshot().files)

    snap = t.compact(n_files=2)
    assert snap.operation == "compact" and len(snap.files) <= 2
    assert sorted(r.id for r in t.read().collect()) == list(range(20))
    # change feed across the compaction: nothing new
    assert t.changes(snap.parent).count() == 0
    # append post-compaction: only the append shows in the feed
    t.commit_append(_df(spark, 20, 23).coalesce(1), commit_id="b4")
    assert sorted(r.id for r in t.changes(snap.parent).collect()) == [20, 21, 22]
    # feed spanning appends AND the compaction still reports only real rows
    assert sorted(r.id for r in t.changes(1).collect()) == list(range(10, 23))

    # vacuum down to the post-compaction suffix reclaims the small files
    t.vacuum(retain_last=2)
    assert all(not os.path.exists(f) for f in pre_files)
    assert sorted(r.id for r in t.read().collect()) == list(range(23))


def test_commit_lineage_metrics(spark, tmp_path):
    """Every commit records rows/bytes lineage from footers alone."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s = t.commit_append(_df(spark, 0, 7).coalesce(1), commit_id="a")
    assert s.summary["added_rows"] == 7 and s.summary["added_bytes"] > 0
    s2 = t.commit_append(_df(spark, 7, 10).coalesce(1), commit_id="b")
    assert s2.summary["added_rows"] == 3


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check: random append/overwrite/compact/vacuum sequences
    mirrored against a plain-python model; after every op, read() at every
    retained version and the change feed from every retained version must
    match the model exactly."""
    import numpy as np

    rng = np.random.default_rng(91)
    for trial in range(3):
        t = SnapshotTable(spark, str(tmp_path / f"m{trial}"))
        model: list[dict] = []  # per version: {"rows": set, "op": str}
        next_id = 0
        expired_below = 0
        for step in range(8):
            op = rng.choice(["append", "append", "overwrite", "compact", "vacuum"])
            if op in ("append", "overwrite") or not model:
                k = int(rng.integers(1, 5))
                lo, next_id = next_id, next_id + k
                rows = set(range(lo, next_id))
                df = _df(spark, lo, next_id).coalesce(1)
                if op == "overwrite" or not model:
                    t.commit_overwrite(df, commit_id=f"s{step}")
                    model.append({"rows": rows, "op": "overwrite", "delta": rows})
                else:
                    t.commit_append(df, commit_id=f"s{step}")
                    model.append(
                        {"rows": model[-1]["rows"] | rows, "op": "append", "delta": rows}
                    )
            elif op == "compact":
                t.compact(n_files=1)
                model.append(
                    {"rows": model[-1]["rows"], "op": "compact", "delta": set()}
                )
            else:  # vacuum
                keep = int(rng.integers(1, 3))
                t.vacuum(retain_last=keep)
                expired_below = max(expired_below, len(model) - keep)

            head = len(model) - 1
            assert t.current_version() == head
            for v in range(expired_below, head + 1):
                got = {r.id for r in t.read(version=v).collect()}
                assert got == model[v]["rows"], (trial, step, v)
            for v in range(expired_below, head + 1):
                feed = {r.id for r in t.changes(v).collect()}
                want = set()
                for m in model[v + 1 : head + 1]:
                    if m["op"] == "overwrite":
                        want = set(m["delta"])
                    elif m["op"] == "append":
                        want |= m["delta"]
                assert feed == want, (trial, step, v)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appends may add columns; merge_schema=True reads the union (older
    rows null), the default read keeps the fast single-schema plan."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 3).coalesce(1), commit_id="a")
    t.commit_append(
        _df(spark, 3, 5).withColumn("lang", F.lit("en")).coalesce(1), commit_id="b"
    )
    merged = t.read(merge_schema=True)
    assert set(merged.columns) == {"id", "v", "lang"}
    got = {r.id: r.lang for r in merged.collect()}
    assert got == {0: None, 1: None, 2: None, 3: "en", 4: "en"}
    assert merged.count() == 5
