"""Sink contracts: Hilbert-ordered write (PMTiles invariant), block layout,
directory export, and the north-rule checkpoint/resume protocol including the
killed-job scenario."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark import fixtures
from versatiles_rs_spark.codecs import decode_image
from versatiles_rs_spark.sinks.checkpoint import (
    LevelCheckpointer,
    build_pyramid_resumable,
    partition_lineage,
)
from versatiles_rs_spark.sinks.writers import (
    export_directory_tree,
    verify_hilbert_monotonic,
    write_block_grouped,
    write_hilbert_sorted,
)


@pytest.fixture(scope="module")
def tiles(spark):
    """Small deterministic tile table at z=4 (aggregated so (z,x,y) unique)."""
    df = fixtures.images_with_tiles_df(spark, 400, size=16, zoom=4, partitions=4, skew=False)
    return (
        df.groupBy("z", "x", "y")
        .agg(F.min("bytes").alias("bytes"))
        .withColumn("fmt", F.lit("png"))
    )


def test_hilbert_sorted_write_monotonic(spark, tiles, tmp_path):
    path = str(tmp_path / "hilbert_tiles")
    write_hilbert_sorted(tiles, path, n_files=4)
    assert verify_hilbert_monotonic(spark, path)
    # same rows, same coords
    assert spark.read.parquet(path).count() == tiles.count()


def test_hilbert_violation_detected(spark, tmp_path):
    # an unsorted write must FAIL the invariant check
    df = spark.createDataFrame(
        [(1, 1, 1, 3), (1, 0, 0, 0), (1, 1, 0, 1)], "z int, x long, y long, hilbert long"
    ).coalesce(1)
    path = str(tmp_path / "unsorted")
    df.write.parquet(path)
    assert not verify_hilbert_monotonic(spark, path)


def test_block_grouped_layout(spark, tiles, tmp_path):
    path = str(tmp_path / "blocks")
    write_block_grouped(tiles, path, block_size=8)
    back = spark.read.parquet(path)
    assert back.count() == tiles.count()
    # partition pruning: a (z, block) predicate must prune to the block dirs
    pruned = back.filter((F.col("z") == 4) & (F.col("block_x") == 0))
    assert pruned.count() == tiles.filter(F.col("x") < 8).count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "block_x" not in plan.split("PushedFilters")[0]


def test_directory_export(spark, tiles, tmp_path):
    root = str(tmp_path / "tree")
    n = export_directory_tree(tiles, root)
    assert n == tiles.count()
    one = tiles.limit(1).collect()[0]
    p = os.path.join(root, str(one.z), str(one.x), f"{one.y}.png")
    assert os.path.exists(p)
    assert decode_image(open(p, "rb").read()).shape == (16, 16, 3)


def test_partition_lineage_totals(spark, tiles):
    lin = partition_lineage(tiles).toPandas()
    assert lin["n_rows"].sum() == tiles.count()
    assert (lin["z_min"] == 4).all() and (lin["z_max"] == 4).all()
    assert lin["payload_bytes"].sum() > 0


class TestCheckpointResume:
    def test_full_build_commits_all_levels(self, spark, tiles, tmp_path):
        base = str(tmp_path / "pyr_full")
        levels = build_pyramid_resumable(spark, tiles, base, z_max=4, z_min=2, tile_size=16)
        ck = LevelCheckpointer(spark, base)
        assert ck.committed_levels() == [2, 3, 4]
        for z in (2, 3, 4):
            m = ck.metrics(z)
            assert m["n_rows"] == levels[z].count()
            assert m["n_partitions"] >= 1
            assert m["partitions"][0]["n_rows"] >= 1

    def test_killed_job_resumes_from_last_level(self, spark, tiles, tmp_path, monkeypatch):
        base = str(tmp_path / "pyr_resume")

        # run 1: "killed" after committing z=4 and z=3 — simulate by raising
        # inside the overview builder on the second roll-up
        from versatiles_rs_spark.operators import raster as rmod

        calls = {"n": 0}
        orig = rmod.build_overview_level

        def dying(*a, **k):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated kill")
            return orig(*a, **k)

        # build_pyramid_resumable imports build_overview_level at call time,
        # so patching the source module is sufficient
        monkeypatch.setattr(rmod, "build_overview_level", dying)
        with pytest.raises(RuntimeError, match="simulated kill"):
            build_pyramid_resumable(spark, tiles, base, z_max=4, z_min=2, tile_size=16)

        ck = LevelCheckpointer(spark, base)
        assert ck.committed_levels() == [3, 4]  # z=2 never committed
        commit_time_z3 = ck.metrics(3)["committed_unix"]

        # run 2: resume — committed levels must NOT be recomputed
        monkeypatch.setattr(rmod, "build_overview_level", orig)
        levels = build_pyramid_resumable(spark, tiles, base, z_max=4, z_min=2, tile_size=16)
        assert ck.committed_levels() == [2, 3, 4]
        assert ck.metrics(3)["committed_unix"] == commit_time_z3  # untouched
        # resumed output is correct: z2 parents cover exactly the z3 coords
        z3 = levels[3].select((F.col("x") / 2).cast("long").alias("px"),
                              (F.col("y") / 2).cast("long").alias("py")).distinct()
        z2 = levels[2].select("x", "y")
        assert z3.count() == z2.count()

    def test_rerun_is_idempotent(self, spark, tiles, tmp_path):
        base = str(tmp_path / "pyr_idem")
        build_pyramid_resumable(spark, tiles, base, z_max=4, z_min=3, tile_size=16)
        ck = LevelCheckpointer(spark, base)
        t3 = ck.metrics(3)["committed_unix"]
        again = build_pyramid_resumable(spark, tiles, base, z_max=4, z_min=3, tile_size=16)
        assert ck.metrics(3)["committed_unix"] == t3
        assert again[3].count() == ck.metrics(3)["n_rows"]


class TestCurationJobResume:
    def test_stagewise_commit_and_resume(self, spark, tmp_path):
        """curation_job: killed after the dedup stage resumes without
        recomputing committed stages; funnel output identical to a clean
        end-to-end run."""
        import json
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
        import curation_job

        clean = str(tmp_path / "clean")
        _, m_clean = curation_job.run(spark, 400, clean, n_shards=4)

        # "killed" run: commit stages 1-2 then die before the gate stage —
        # simulate by running fully and deleting stage 3+4 commits
        resumed = str(tmp_path / "resumed")
        curation_job.run(spark, 400, resumed, n_shards=4)
        import shutil

        for lvl in (3, 4):
            shutil.rmtree(os.path.join(resumed, "stages", f"level={lvl}"))
        with open(os.path.join(resumed, "stages", "level=2", "_metrics.json")) as f:
            committed_at = json.load(f)["committed_unix"]

        _, m_resumed = curation_job.run(spark, 400, resumed, n_shards=4)
        assert m_resumed == m_clean
        assert m_clean["n_visual_keepers"] == 100  # one keeper per group of 4
        assert 0 < m_clean["n_exported"] <= m_clean["n_visual_keepers"]
        # committed stage untouched by the resume
        with open(os.path.join(resumed, "stages", "level=2", "_metrics.json")) as f:
            assert json.load(f)["committed_unix"] == committed_at
        # export is laid out by shard
        shards = [
            d for d in os.listdir(os.path.join(resumed, "stages", "level=4"))
            if d.startswith("shard=")
        ]
        assert 1 <= len(shards) <= 4
