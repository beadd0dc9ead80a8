"""Benchmark decontamination — word-n-gram overlap between a training
corpus and an evaluation/benchmark set.

The standard contamination check in training-data pipelines (popularized by
GPT-3's 13-gram filter): a training document is contaminated if it shares
word n-grams with any benchmark document. The pipeline shape matters more
than the arithmetic at 100 TB:

- benchmark n-grams: the benchmark set is small by nature (eval suites are
  thousands of documents, not billions) — tokenize, n-gram, DISTINCT, and
  BROADCAST it. The contamination join is then map-side: every training
  partition probes the broadcast hash relation locally; training text never
  shuffles, no exchange is keyed on a string.
- training n-grams: generated map-side with split + transform/slice (pure
  JVM, stays in WholeStageCodegen); the only shuffle in the whole plan is
  the final slim (doc_id, counts) aggregation.
- the join key is the n-gram STRING (bounded: n words). Hashing it first
  would save bytes but break cross-engine replay for zero distribution
  benefit once the small side is broadcast.

Output is per-training-document: distinct n-grams, how many hit the
benchmark set, and the contaminated fraction — the caller picks the
threshold (GPT-3 dropped on any hit; fraction supports softer policies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_ngrams(df: DataFrame, text_col: str, n: int, out_col: str) -> DataFrame:
    """Append `out_col` = distinct word-n-gram strings of lower(text), split
    on non-alnum — map-side, no UDF. The token array goes through a
    single_eval Generate barrier first: projection collapse otherwise
    inlines the split() back into the per-index slice lambda, re-splitting
    the string once per n-gram (measured 7x on the gram stage)."""
    from ..udfs import single_eval

    toks = f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')"
    # guarded CASE: Spark's sequence(1, 0) is DESCENDING ([1, 0]), so the
    # short-doc branch must never reach sequence at all
    return df.withColumn("_tk", single_eval(F.expr(toks))).withColumn(
        out_col,
        F.expr(
            f"CASE WHEN size(_tk) >= {n} THEN"
            f" array_distinct(transform(sequence(1, size(_tk) - {n - 1}),"
            f" i -> array_join(slice(_tk, i, {n}), ' ')))"
            f" ELSE cast(array() AS array<string>) END"
        ),
    ).drop("_tk")


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-training-doc benchmark overlap: (id, n_grams, n_hits, frac).

    Docs shorter than n words have zero n-grams and report frac 0.0 (they
    cannot carry a benchmark passage). frac is rounded to 6 places so the
    float is hash-stable across engines.
    """
    bench_grams = (
        _with_ngrams(bench, text_col, n, "gs")
        .select(F.explode("gs").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # explode_outer keeps zero-n-gram docs (count(gram) sees only non-null);
    # one scan of train, one slim partially-aggregated shuffle on doc id
    grams = _with_ngrams(train, text_col, n, "gs").select(
        F.col(id_col), F.explode_outer("gs").alias("gram")
    )
    per_doc = (
        grams.join(F.broadcast(bench_grams), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        )
    )
    return per_doc.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(
            F.when(F.col("n_grams") > 0, F.col("n_hits") / F.col("n_grams")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("contaminated_frac"),
    )
