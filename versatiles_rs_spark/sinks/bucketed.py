"""Bucketed table writes: pay the shuffle once, join free forever.

At 100 TB the dominant recurring cost of the curation pipelines is
re-shuffling the same corpus on the same key for every join/agg (doc_id,
image id, tile key).  Hive-style bucketing amortizes it: `bucketBy(n, key)`
hash-partitions the data into a fixed bucket layout AT WRITE TIME and
records it in the catalog; every later equi-join or aggregation on the
bucket key reads co-located buckets and plans ZERO Exchange (pinned by
tests/test_bucketed.py).  `sortBy` additionally pre-sorts within buckets,
removing the Sort below a sort-merge join.

Rules of thumb encoded here:
- bucket count is a layout contract: both join sides must share it (or be
  integer multiples, Spark 3.1+ bucket coalescing);
- pick n_buckets so one bucket ~ 100-500 MB at target scale;
- bucketing requires saveAsTable (the catalog carries the layout — a bare
  parquet path loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write `df` as a bucketed (optionally bucket-sorted) catalog table
    and return the catalog-backed relation (whose scan carries the bucket
    layout — use THIS, not spark.read.parquet, for the free joins)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
    return df.sparkSession.table(table_name)
