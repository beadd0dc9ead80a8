"""Exact distributed heavy hitters / top-k frequent values.

The scale problem: "top-10 most frequent captions/domains/keys" over 10^12
rows with key cardinality near row count.  A plain groupBy().count() +
orderBy shuffles one row PER DISTINCT KEY — at near-unique cardinality
that is a full-data shuffle to rank values of which all but k are noise.

Two-stage exact algorithm (Misra-Gries candidates + exact recount):

1. Per-partition Misra-Gries summary (capacity c counters) inside ONE
   mapInPandas pass — the weighted-MG reduction over a partition's
   value_counts: subtract the (c+1)-largest count from all, keep positive.
   MG guarantee: any value with partition count > n_p/c survives, so any
   value with GLOBAL count > N/c survives in at least one partition.
2. Exact recount restricted to the candidate union (<= c x partitions
   values, broadcast semi join — the corpus never shuffles), then top-k.

Exactness: with capacity >= N/f_k (f_k = k-th true frequency) the
candidate set provably contains the true top-k, and stage 2 counts are
exact — so the result is EXACT, not approximate, while stage 1 memory is
a fixed c counters per task and the only shuffles carry candidate keys.
(Misra & Gries 1982; the two-phase exact pattern per Cormode &
Hadjieleftheriou, VLDB 2008 survey.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_summary(counts: pd.Series, capacity: int) -> pd.Series:
    """Weighted Misra-Gries reduction of exact (value -> count) to at most
    `capacity` counters: subtract the (capacity+1)-th largest count from
    every counter and drop the non-positive."""
    if len(counts) <= capacity:
        return counts
    counts = counts.sort_values(ascending=False, kind="stable")
    thresh = counts.iloc[capacity]
    kept = counts.iloc[:capacity] - thresh
    return kept[kept > 0]


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """(value, n, rank) for the exact top-k most frequent values of `col`,
    rank 1..k, ties broken by value ascending.  Exact whenever
    capacity >= N / f_k (see module docstring); at corpus scale pick
    capacity ~ 10-100x k — stage-1 memory is capacity counters per task."""
    vals = df.select(F.col(col).alias("value")).filter(F.col("value").isNotNull())

    def summarize(batches):
        acc: pd.Series | None = None
        for pdf in batches:
            c = pdf["value"].value_counts()
            acc = c if acc is None else acc.add(c, fill_value=0)
            acc = _mg_summary(acc, capacity)
        if acc is not None and len(acc):
            yield pd.DataFrame({"value": acc.index})

    cands = (
        vals.mapInPandas(summarize, schema=f"value {df.schema[col].dataType.simpleString()}")
        .distinct()
    )
    exact = (
        vals.join(F.broadcast(cands), on="value", how="left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("value", "n", "rank")
    )
