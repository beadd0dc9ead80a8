"""Aspect-ratio bucketing for image-model training batches.

Multi-aspect training (public method: NovelAI aspect bucketing, adopted by
SDXL — Podell et al. 2023, appendix on multi-aspect finetuning) requires
every batch to hold images of ONE target resolution: each image maps to the
bucket whose aspect ratio is closest to its own, then per-bucket batches are
formed in a deterministic shuffle order.  This module does both Spark-first:

- bucket choice is a pure-JVM argmin over a literal bucket table — per
  bucket the distance |w/h - bw/bh| is compared as `abs(w*bh - h*bw) / bh`
  (the common 1/h factor drops out).  Numerator is exact integer math
  (< 2^26); the single double division of two exactly-representable ints is
  correctly rounded on every IEEE-754 engine, so Spark and DuckDB order
  buckets identically and the assignment hash-verifies cross-engine.  Ties
  break on bucket index.
- batch ids come from a row_number window partitioned by (bucket, shard)
  where shard = wds_key(id, epoch) % n_shards (sinks/webdataset.py's
  SQL-replayable epoch key).  Sub-sharding the window keeps partitions
  bounded at corpus scale — a window partitioned by bucket alone has ~20
  partitions for 10^12 rows — and matches how distributed loaders consume
  batches anyway (each reader owns whole shards; batches never straddle a
  shard boundary).

100 TB shape: one shuffle total (the window exchange on the slim
(bucket, shard, key) triple — image bytes are never in this plan);
everything else folds into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sinks.webdataset import wds_key_expr, wds_key_sql

# SDXL-style multiple-of-64 bucket table, area ~= 1024^2 (transpose-symmetric)
SDXL_BUCKETS: list[tuple[int, int]] = [
    (512, 2048), (576, 1792), (640, 1600), (704, 1472), (768, 1344),
    (832, 1248), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1248, 832), (1344, 768), (1472, 704), (1600, 640),
    (1792, 576), (2048, 512),
]


def assign_aspect_buckets(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Add (bucket_idx, bucket_w, bucket_h): the closest-aspect bucket.
    Pure JVM: an array_min over per-bucket (score, idx, w, h) structs —
    struct ordering gives argmin with index tiebreak, no UDF, no shuffle."""
    buckets = buckets or SDXL_BUCKETS
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    entries = [
        F.struct(
            (F.abs(w * F.lit(bh) - h * F.lit(bw)).cast("double") / F.lit(float(bh))).alias("s"),
            F.lit(i).alias("i"),
            F.lit(bw).alias("bw"),
            F.lit(bh).alias("bh"),
        )
        for i, (bw, bh) in enumerate(buckets)
    ]
    best = F.array_min(F.array(*entries))
    return (
        df.withColumn("_b", best)
        .withColumn("bucket_idx", F.col("_b.i"))
        .withColumn("bucket_w", F.col("_b.bw"))
        .withColumn("bucket_h", F.col("_b.bh"))
        .drop("_b")
    )


def bucket_batches(
    df: DataFrame,
    id_col: str,
    batch_size: int,
    n_shards: int = 64,
    epoch: int = 0,
) -> DataFrame:
    """Add (shard, batch_idx, batch_pos) within each (bucket_idx, shard):
    deterministic epoch order (wds_key), integer `div`/`%` batch math (no
    floats — offsets can't round).  Requires `bucket_idx` (see
    assign_aspect_buckets).  The trailing partial batch per (bucket, shard)
    keeps its batch_idx; loaders drop or pad it by policy."""
    keyed = df.withColumn("wds_key", wds_key_expr(id_col, epoch)).withColumn(
        "shard", F.pmod(F.col("wds_key"), F.lit(n_shards)).cast("int")
    )
    win = Window.partitionBy("bucket_idx", "shard").orderBy("wds_key", id_col)
    rn = F.row_number().over(win) - F.lit(1)
    return (
        keyed.withColumn("_rn", rn)
        .withColumn("batch_idx", F.expr(f"_rn div {batch_size}").cast("int"))
        .withColumn("batch_pos", F.pmod(F.col("_rn"), F.lit(batch_size)).cast("int"))
        .drop("_rn")
    )


def aspect_buckets_oracle_sql(
    dims_cte: str,
    batch_size: int,
    n_shards: int,
    epoch: int,
    buckets: list[tuple[int, int]] | None = None,
) -> str:
    """DuckDB replay of assign_aspect_buckets + bucket_batches over a CTE
    `dims(image_id, w, h)` supplied by the caller — identical score
    division, identical key arithmetic, identical windows."""
    buckets = buckets or SDXL_BUCKETS
    vals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh) in enumerate(buckets))
    key = wds_key_sql("image_id", epoch, div="//")
    return f"""
    WITH {dims_cte},
    buckets(i, bw, bh) AS (VALUES {vals}),
    scored AS (
      SELECT d.image_id, d.w, d.h, b.i, b.bw, b.bh,
             abs(d.w * b.bh - d.h * b.bw) / CAST(b.bh AS DOUBLE) AS s,
             row_number() OVER (PARTITION BY d.image_id ORDER BY
               abs(d.w * b.bh - d.h * b.bw) / CAST(b.bh AS DOUBLE), b.i) AS rk
      FROM dims d CROSS JOIN buckets b
    ),
    assigned AS (
      SELECT image_id, w, h, i AS bucket_idx, bw AS bucket_w, bh AS bucket_h,
             {key} AS wds_key,
             CAST({key} % {n_shards} AS INTEGER) AS shard
      FROM scored WHERE rk = 1
    ),
    numbered AS (
      SELECT *, row_number() OVER (
        PARTITION BY bucket_idx, shard ORDER BY wds_key, image_id) - 1 AS rn
      FROM assigned
    )
    SELECT image_id, w, h, bucket_idx, bucket_w, bucket_h, wds_key, shard,
           CAST(rn // {batch_size} AS INTEGER) AS batch_idx,
           CAST(rn % {batch_size} AS INTEGER) AS batch_pos
    FROM numbered
    """
