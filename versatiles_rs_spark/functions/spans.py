"""Duplicate token-span detection (substring-level dedup).

The third granularity of text dedup after whole-document (exact_dedup) and
near-document (minhash/simhash): find the EXACT REGIONS of text that occur
more than once in the corpus, the target of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499 — their
ExactSubstr tool uses a suffix array; the scalable distributed analog is
Rabin-Karp-style fingerprinted token windows, the approach of CCNet/
RefinedWeb-style pipelines).

A document position starts a duplicated window when its `width`-token
window fingerprint appears >= min_count times corpus-wide; overlapping and
adjacent (gap <= width) duplicated windows merge into maximal spans.

Plan shape (pure JVM end to end — no Python anywhere):

1. tokenize + per-token 31-bit polynomial char code, map-side higher-order
   functions (split/filter/transform/aggregate) — document text NEVER
   leaves the scan task;
2. per-position 62-bit window fingerprint (two independent 31-bit
   polynomial folds over the token codes, hi*2^31+lo) — explode produces
   slim (wkey:long, doc:long, pos:int) rows, the ONLY thing shuffled;
3. corpus-wide fingerprint counts (partial-agg'd groupBy) -> the >=min_count
   key set; LEFT SEMI join marks duplicated positions (no pair enumeration,
   so a boilerplate string duplicated a billion times costs its row count,
   not its row count squared);
4. islands-and-gaps merge per document (lag + running-sum window, the
   sessionize shape) -> maximal spans.

Fingerprint collisions: 62-bit keys; corpus-wide collision expectation at
10^12 windows is ~10^24/2^63 ~= 1e5 spurious window matches across the
whole corpus — vanishingly sparse, and each costs one false span, never a
wrong join explosion. The DuckDB oracle replays the identical folds
(list_reduce with a prepended 0 accumulator == Spark aggregate), so both
engines agree bit-for-bit including any collision.

Reference analog: none — beyond-reference training-data op (project brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = 2_147_483_648  # 2^31


def _codes_expr(text_col: str) -> str:
    """tokens -> 31-bit polynomial char codes, one fold per token (SQL
    expression, replayed verbatim by the DuckDB oracle)."""
    toks = f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')"
    return (
        f"transform({toks}, t -> aggregate("
        f"transform(sequence(1, length(t)), i -> cast(ascii(substring(t, i, 1)) as bigint)), "
        f"cast(0 as bigint), (acc, c) -> (acc * 131 + c) % {_M}))"
    )


def _window_key_expr(width: int) -> str:
    """62-bit window fingerprint at position p (0-based) over `codes`."""
    fold = lambda mult: (
        f"aggregate(slice(codes, p + 1, {width}), cast(0 as bigint), "
        f"(acc, c) -> (acc * {mult} + c) % {_M})"
    )
    return f"({fold(1009)} * cast({_M} as bigint) + {fold(2003)})"


def duplicate_spans(
    docs: DataFrame,
    width: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, span_start, span_end, n_dup_windows) — maximal token spans
    whose every covered `width`-window fingerprint repeats >= min_count
    times corpus-wide. span_start/span_end are 0-based token indices
    (inclusive); n_dup_windows counts the duplicated window starts merged
    into the span."""
    # single_eval Generate barrier: without it projection collapse inlines
    # the whole polynomial fold back into every per-window slice lambda
    # (the window stage references `codes` twice per position)
    from ..udfs import single_eval

    codes = docs.select(
        F.col(id_col), single_eval(F.expr(_codes_expr(text_col))).alias("codes")
    )
    wins = (
        codes.filter(F.expr(f"size(codes) >= {width}"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(codes) - {width}), "
                    f"p -> struct(p as pos, {_window_key_expr(width)} as wkey))"
                )
            ).alias("w"),
        )
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.wkey").alias("wkey"))
    )
    dup_keys = (
        wins.groupBy("wkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("wkey")
    )
    marked = wins.join(dup_keys, on="wkey", how="left_semi")

    w_doc = Window.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn(
        "new_island",
        F.when(
            F.col("pos") - F.lag("pos").over(w_doc) > F.lit(width), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("new_island").over(w_doc))
    return islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(width - 1)).alias("span_end"),
        F.count("*").alias("n_dup_windows"),
    ).drop("island")
