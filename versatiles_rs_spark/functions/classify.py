"""Nearest-class-centroid classification over an embedding corpus.

The Rocchio / nearest-centroid classifier (Manning et al. IR ch.14;
sklearn NearestCentroid) run as a corpus diagnostic: how separable are
the labels in embedding space?  The confusion matrix it produces is the
standard first look at label quality before training on a curated set —
a companion to the CLIP-score gate and semdedup (bad labels show up as
off-diagonal mass).

Determinism contract (the repo's fixed-point pattern, shared with
functions/pca.py): embeddings quantize once to q' = floor(e*127) + 127
in [0, 254]; class centroids are per-dimension floor means of
NON-NEGATIVE sums; assignment is the packed integer argmin
d2 * 16 + label (ties to the smaller label — kmeans' trick; d2 <=
64516 * dims stays far under the pack headroom), so every engine and
every rerun produces the same matrix bit-for-bit.

Engine shape: two driver-coordinated passes in the train_ivf_centroids
pattern — (1) one mapInPandas pass emits per-(label, d) partial sums
(collect = n_classes x dims longs), (2) centroids broadcast back, one
mapInPandas pass computes all squared distances vectorized and emits
only (label, pred) pairs; the confusion matrix is one slim groupBy.
Embeddings never explode to long form and never cross a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_OFF = 127


def centroid_confusion(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    n_dims: int = 64,
) -> DataFrame:
    """Leave-nothing-out nearest-centroid confusion matrix:
    (label, pred, n) with pred = argmin_class ||q - c_class||^2, ties
    to the smaller class id."""
    spark = emb.sparkSession
    quant = emb.select(
        F.col(label_col).cast("long").alias("label"),
        F.transform(
            F.col(vec_col),
            lambda e: (F.floor(e.cast("double") * F.lit(127.0)) + Q_OFF).cast("long"),
        ).alias("q"),
    ).cache()

    def sum_partials(arrs):
        for pdf in arrs:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            lab = pdf["label"].to_numpy()
            out = {"label": [], "d": [], "s": [], "n": []}
            for lv in np.unique(lab):
                sel = x[lab == lv]
                out["label"] += [int(lv)] * x.shape[1]
                out["d"] += list(range(x.shape[1]))
                out["s"] += [int(t) for t in sel.sum(axis=0)]
                out["n"] += [sel.shape[0]] * x.shape[1]
            yield pd.DataFrame(out)

    sums = (
        quant.mapInPandas(sum_partials, schema="label long, d long, s long, n long")
        .groupBy("label", "d")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    labels = sorted({int(r["label"]) for r in sums})
    cents = {
        lv: np.zeros(n_dims, dtype=np.int64) for lv in labels
    }
    for r in sums:
        cents[int(r["label"])][int(r["d"])] = int(r["s"]) // int(r["n"])
    cmat = np.stack([cents[lv] for lv in labels])  # (n_classes, dims)
    lab_arr = np.array(labels, dtype=np.int64)
    bc = spark.sparkContext.broadcast((cmat, lab_arr))

    def assign(arrs):
        cm, la = bc.value
        for pdf in arrs:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            diff = x[:, None, :] - cm[None, :, :]
            d2 = (diff * diff).sum(axis=2)
            packed = d2 * 16 + la[None, :]
            pred = la[np.argmin(packed, axis=1)]
            yield pd.DataFrame(
                {"label": pdf["label"].to_numpy(), "pred": pred}
            )

    pairs = quant.mapInPandas(assign, schema="label long, pred long")
    return pairs.groupBy("label", "pred").agg(
        F.count("*").cast("long").alias("n")
    )
