"""Ordered tile-table writers: Hilbert (PMTiles) order, block grouping,
directory export.

Parity (/root/reference/versatiles_container/src/container/):
- pmtiles/writer.rs:103,111-113,201-206 — strict Hilbert order, asserts ids
  strictly increasing within the output;
- versatiles/writer.rs:17,165 — any order but 256x256-tile block grouping;
- directory/writer.rs:6-19,105 — {z}/{x}/{y}.ext file tree.

Spark strategy: ordering contracts become `repartitionByRange(sort_key)` +
`sortWithinPartitions(sort_key)` before the write — range partitioning makes
files globally ordered AND each file internally ordered, which is exactly the
PMTiles writer's invariant (and what an Iceberg sort order would declare).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..udfs import block_expr, with_hilbert


def write_hilbert_sorted(
    df: DataFrame, path: str, n_files: int | None = None, z="z", x="x", y="y"
) -> None:
    """Write tiles in strict global Hilbert order (PMTiles contract).

    repartitionByRange gives non-overlapping hilbert ranges per file;
    sortWithinPartitions orders rows inside each file. At 100 TB this is one
    range-exchange — the same cost the reference pays with its Push/Pop
    re-buffer cache, but distributed and spillable.
    """
    out = with_hilbert(df, z, x, y)
    n = n_files or out.sparkSession.sparkContext.defaultParallelism
    out = out.repartitionByRange(n, "hilbert").sortWithinPartitions("hilbert")
    out.write.mode("overwrite").parquet(path)


def verify_hilbert_monotonic(spark: SparkSession, path: str) -> bool:
    """Check the PMTiles invariant on written output: ids strictly increasing
    within every file, and file ranges non-overlapping (pmtiles/writer.rs:201-206).
    Distributed: per-file min/max/sortedness via input_file_name grouping."""
    df = (
        spark.read.parquet(path)
        .withColumn("file", F.input_file_name())
        # physical row position: monotonically_increasing_id is increasing
        # within each scan partition, i.e. within each file's row order —
        # ordering the window by it checks the order AS WRITTEN (ordering by
        # hilbert itself would vacuously pass)
        .withColumn("seq", F.monotonically_increasing_id())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("file").orderBy("seq")
    per_file = (
        df.withColumn("prev", F.lag("hilbert").over(w))
        .groupBy("file")
        .agg(
            F.sum(F.when(F.col("prev") >= F.col("hilbert"), 1).otherwise(0)).alias("violations"),
            F.min("hilbert").alias("lo"),
            F.max("hilbert").alias("hi"),
        )
    )
    rows = per_file.orderBy("lo").collect()
    if any(r.violations > 0 for r in rows):
        return False
    return all(rows[i].hi < rows[i + 1].lo for i in range(len(rows) - 1))


def write_block_grouped(
    df: DataFrame, path: str, block_size: int = 256, z="z", x="x", y="y"
) -> None:
    """Versatiles-style block layout: partition output by (z, block_x,
    block_y) with block = tile coordinate >> 8 (256x256 tile blocks,
    versatiles/writer.rs:165). Partition-pruned point lookups come free."""
    out = (
        df.withColumn("block_x", block_expr(F.col(x), block_size))
        .withColumn("block_y", block_expr(F.col(y), block_size))
    )
    out.write.mode("overwrite").partitionBy(z, "block_x", "block_y").parquet(path)


def export_directory_tree(
    df: DataFrame, root: str, payload: str = "bytes", fmt_col: str = "fmt"
) -> int:
    """Edge-export utility: write each tile as {root}/{z}/{x}/{y}.{ext}
    (directory/writer.rs:6-19). foreachPartition file writer — an export tool,
    not the analytical sink; returns number of files written."""
    counter = df.sparkSession.sparkContext.accumulator(0)

    def write_part(rows):
        n = 0
        for r in rows:
            d = os.path.join(root, str(r[0]), str(r[1]))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r[2]}.{r[3]}"), "wb") as f:
                f.write(bytes(r[4]))
            n += 1
        counter.add(n)

    df.select("z", "x", "y", fmt_col, payload).foreachPartition(write_part)
    return counter.value
