"""Distributed PCA: top principal component by fixed-point power iteration.

The embedding-space structure probe (Halko et al. 2011 randomized
methods are the industrial cousins; MLlib computeSVD the float/random
one): the dominant direction of an embedding corpus drives whitening,
anisotropy diagnostics (Ethayarajh 2019 — contextual embeddings are
strongly anisotropic), and the all-but-the-top post-processing step
(Mu & Viswanath 2018) that improves retrieval — the natural companion
to the ANN/semdedup stack.

Determinism contract (the repo's fixed-point pattern): embeddings
quantize ONCE to q' = floor(e * 127) + 127 in [0, 254]; per-dimension
means use floor division of NON-NEGATIVE sums; each power round is

    dot_i = Σ_d x[i,d] * v[d]          (int64)
    w_d   = Σ_i x[i,d] * dot_i         (int64, order-free)
    v'_d  = sign(w_d) * (|w_d| * V_SCALE div max_d |w_d|)

— every division on non-negative operands, so Spark `div` == DuckDB
`//` and the whole iteration is bit-identical cross-engine.  V_SCALE =
4096 keeps |w| * V_SCALE < 2^63 up to ~10^5 rows x 64 dims per the
bound |w| <= 254 * (254 * 4096 * dims) * n (callers beyond that lower
V_SCALE or sub-sample — the direction, not the magnitude, is the
output).

Engine shape (train_ivf_centroids pattern): the 64-vector lives on the
DRIVER; each round is ONE mapInPandas pass over the cached quantized
embeddings emitting 64-long partial X^T(Xv) rows (vectors never
explode to long form, nothing but (d, partial) crosses a shuffle), a
64-row collect, and an exact python-int rescale.  The DuckDB oracle
unrolls the identical rounds relationally (long-form x, MATERIALIZED
per round)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_OFF = 127
V_SCALE = 4096


def pca_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_dims: int = 64,
    rounds: int = 4,
) -> DataFrame:
    """Top principal direction of `emb` as (d, v) rows — v the
    fixed-point component in [-V_SCALE, V_SCALE]."""
    spark = emb.sparkSession
    quant = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda e: (F.floor(e * 127) + Q_OFF).cast("long"),
        ).alias("q"),
    ).cache()
    n = quant.count()

    def dim_partials(arrs):
        """Yield per-batch column sums of q (for the mean)."""
        for pdf in arrs:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            s = x.sum(axis=0)
            yield pd.DataFrame({"d": np.arange(n_dims), "s": s})

    sums = (
        quant.mapInPandas(dim_partials, schema="d long, s long")
        .groupBy("d").agg(F.sum("s").alias("s"))
        .orderBy("d")
        .collect()
    )
    mean = np.array([int(r["s"]) // n for r in sums], dtype=np.int64)

    v = np.full(n_dims, 1024, dtype=np.int64)
    for _ in range(int(rounds)):
        bc = spark.sparkContext.broadcast((mean, v))

        def round_partials(arrs):
            m, vv = bc.value
            for pdf in arrs:
                if not len(pdf):
                    continue
                x = np.stack(pdf["q"].to_numpy()).astype(np.int64) - m[None, :]
                dot = x @ vv
                w = x.T @ dot
                yield pd.DataFrame({"d": np.arange(n_dims), "w": w})

        rows = (
            quant.mapInPandas(round_partials, schema="d long, w long")
            .groupBy("d").agg(F.sum("w").alias("w"))
            .orderBy("d")
            .collect()
        )
        w = np.array([int(r["w"]) for r in rows], dtype=object)
        m_abs = max(abs(int(x)) for x in w)
        m_abs = max(m_abs, 1)
        v = np.array(
            [
                (1 if int(x) >= 0 else -1) * (abs(int(x)) * V_SCALE // m_abs)
                for x in w
            ],
            dtype=np.int64,
        )
    out = pd.DataFrame({"d": np.arange(n_dims, dtype=np.int64), "v": v})
    return spark.createDataFrame(out)


def pca_round_ctes(k: int, prev_v: str) -> str:
    """One oracle round as a CTE chain over MATERIALIZED long-form `xc`
    (id, d, x): identical dot / w / max-abs rescale arithmetic.  w{k}
    is referenced by both m{k} and v{k} -> MATERIALIZED (CTE-inlining
    lesson)."""
    return f"""dot{k} AS MATERIALIZED (
      SELECT xc.id, CAST(sum(xc.x * pv.v) AS BIGINT) AS dot
      FROM xc JOIN {prev_v} pv ON pv.d = xc.d GROUP BY xc.id
    ), w{k} AS MATERIALIZED (
      SELECT xc.d, CAST(sum(xc.x * dt.dot) AS BIGINT) AS w
      FROM xc JOIN dot{k} dt ON dt.id = xc.id GROUP BY xc.d
    ), m{k} AS MATERIALIZED (
      SELECT greatest(max(abs(w)), 1) AS m FROM w{k}
    ), v{k} AS MATERIALIZED (
      SELECT d, CASE WHEN w >= 0 THEN 1 ELSE -1 END
                * ((abs(w) * {V_SCALE}) // m) AS v
      FROM w{k} CROSS JOIN m{k}
    )"""
