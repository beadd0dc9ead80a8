"""Approximate nearest-neighbor search over embedding columns.

- Brute-force cosine top-k: built-in higher-order functions (zip_with +
  aggregate) in float64 — JVM-side, exact, the correctness baseline.
- LSH-bucketed (random hyperplane signs): candidates limited to same-bucket
  vectors via equi-join; recall measured against brute force in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ann_bruteforce_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, window rank.

    queries: (query_id, qv). Self-matches (query_id == id) excluded.
    """
    d = vectors.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col("query_id"))
    cos = cosine_expr(F.col(vec_col), F.col("qv"))
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col(id_col).asc())
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"))
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket = sign-bit signature; candidates are
    same-bucket (plus all 1-bit-flip neighbor buckets of the query, for
    recall); exact cosine re-rank inside the bucket join.

    The scale path: the vectors side shuffles once on the bucket id; queries
    explode to nbits+1 probe buckets — a standard multi-probe LSH layout.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    planes = _hyperplanes(dim, nbits)

    @pandas_udf(LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        return pd.Series(
            (signs.astype(np.uint64) << np.arange(nbits, dtype=np.uint64)).sum(axis=1).astype(np.int64)
        )

    v = vectors.withColumn("bucket", bucket_udf(F.col(vec_col)))
    q = queries.withColumn("qbucket", bucket_udf(F.col("qv")))
    # multi-probe: query bucket + all 1-bit flips
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(nbits)],
    )
    qp = q.withColumn("bucket", F.explode(probes))
    cand = v.join(qp, on="bucket").filter(F.col(id_col) != F.col("query_id"))
    cos = cosine_expr(F.col(vec_col), F.col("qv"))
    w = Window.partitionBy("query_id").orderBy(cos.desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"))
    )
