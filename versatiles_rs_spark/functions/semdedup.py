"""Semantic deduplication over an embedding column (SemDeDup).

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the embeddings with a
coarse k-means quantizer, call two items semantic duplicates when their
cosine similarity inside a shared cluster exceeds eps, and keep exactly one
representative per duplicate group — the paper's best-performing policy
keeps the item with the LOWEST cosine similarity to its cluster centroid
(the least prototypical example survives).

Spark-first shape (every stage bounded at corpus scale):

1. assignment — ONE Arrow-batched kernel emits (cluster id, centroid cosine)
   per vector; the cluster id feeds joins/groupBys so it crosses a
   `single_eval` barrier (udfs.py — the r3 UDF-join-key lesson).
2. within-cluster pairs — `cosine_pairs_blocked(key_col="sem_list")`: block
   GEMM restricted to same-cluster block pairs. The corpus-level N^2 becomes
   sum(|c|^2) over clusters, the exact reduction the paper relies on
   (they run k=50k clusters at web scale; nlist scales with corpus size).
3. duplicate groups — `connected_components` (alternating large-star/
   small-star, slim (long,long) shuffles only).
4. representative — one window per component ordered (cent_cos ASC, id ASC);
   rank 1 is the keeper. Singletons (never in a pair) are their own keepers.

No vector bytes move after step 2's packed blocks; steps 3-4 shuffle only
(long, long, double) rows.

The registry variant uses the deterministic pseudo-random quantizer
(`_ivf_centroids` — splitmix/Box-Muller, same stream as ann_ivf) so the
whole pipeline replays in DuckDB SQL (queries.py::semantic_dedup oracle);
`train_ivf_centroids` supplies data-adaptive clusters for production use,
parity-tested in pytest.

Reference analog: none — beyond-reference training-data op (project brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import _ivf_centroids, cosine_pairs_blocked
from .graph import connected_components


def semantic_dedup(
    vectors: DataFrame,
    eps: float = 0.35,
    nlist: int = 16,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    block_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sem_list, sem_cluster, cluster_size, is_keeper) for every row.

    `sem_list` = coarse k-means cluster (first-argmax centroid dot, the same
    tie rule as ann_ivf_topk and its SQL oracle); `sem_cluster` = connected
    component of the within-cluster eps-similarity graph (min reachable id;
    singletons label themselves); `is_keeper` = SemDeDup representative
    (lowest centroid cosine, then lowest id, per component).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..udfs import single_eval

    C = centroids if centroids is not None else _ivf_centroids(dim, nlist)
    CT = C.T.copy()

    out_t = StructType(
        [StructField("sem_list", LongType()), StructField("cent_cos", DoubleType())]
    )

    @pandas_udf(out_t)
    def assign_udf(vecs: pd.Series) -> pd.DataFrame:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = m @ CT
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-300)
        return pd.DataFrame(
            {
                "sem_list": np.argmax(d, axis=1).astype(np.int64),
                "cent_cos": d.max(axis=1) / norms,
            }
        )

    # deliberately NOT cached: `assigned` evaluates exactly twice (the pairs
    # branch is localCheckpointed inside connected_components; the label
    # branch runs once in the final action), and a cache would pin the full
    # vector column in executor memory at corpus scale to save one cheap
    # assignment pass — measured a wash at bench scale
    assigned = (
        vectors.select(id_col, vec_col)
        .withColumn("_a", single_eval(assign_udf(F.col(vec_col))))
        .select(id_col, vec_col, "_a.sem_list", "_a.cent_cos")
    )

    pairs = cosine_pairs_blocked(
        assigned,
        threshold=eps,
        id_col=id_col,
        vec_col=vec_col,
        block_size=block_size,
        key_col="sem_list",
    )
    comp = connected_components(pairs)

    labeled = (
        assigned.drop(vec_col)
        .join(comp, assigned[id_col] == comp["id"], "left")
        .select(
            id_col,
            "sem_list",
            "cent_cos",
            F.coalesce(F.col("component"), F.col(id_col)).alias("sem_cluster"),
        )
    )
    w = Window.partitionBy("sem_cluster").orderBy(
        F.col("cent_cos").asc(), F.col(id_col).asc()
    )
    ws = Window.partitionBy("sem_cluster")
    return labeled.select(
        id_col,
        "sem_list",
        "sem_cluster",
        F.count("*").over(ws).alias("cluster_size"),
        (F.row_number().over(w) == 1).cast("int").alias("is_keeper"),
    )
