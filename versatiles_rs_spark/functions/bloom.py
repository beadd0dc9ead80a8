"""Bloom-filter membership prefilter — broadcast-scale set probes at 100 TB.

The repo's membership joins broadcast the small side as its raw keys
(functions/decontam.py benchmark grams, functions/corpus.py blocklists).
That shape caps out when the "small" side stops being small: a benchmark
union of ~100M distinct 13-grams at ~40 bytes each is multi-GB as a
broadcast hash relation, while ~10 bits/key of Bloom bitmap is ~125 MB —
comfortably broadcastable. A Bloom filter answers "definitely absent"
exactly and "present" probabilistically, so the exact verification join
afterwards only carries the (FP-thin) surviving rows: results stay exact,
but the shuffle/broadcast-probe volume drops by the filter's rejection
rate. This is the standard scale move (Spark itself injects runtime bloom
filters for join pruning; here it is a first-class, deterministic,
cross-engine-replayable operator).

Engineering shape (all plan, no driver state):
- hashes: two 31-bit polynomial folds of the key's codepoints (multipliers
  1009/2003 — the same fold family as functions/spans.py), combined by
  Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*(2*h2+1)) % m_bits.
  Integer-only, identical in Spark and DuckDB BIGINT (no wraparound — the
  fold reduces mod 2^31 every step).
- bitmap: positions -> 32-bit words (bit_or per word index) -> ONE row
  holding a dense array<long>. 32-bit words keep `1 << bit` off the sign
  bit in both engines. The single row reaches the probe side through a
  broadcast nested-loop cross join — the bitmap is never collected.
- probe: element_at + shiftleft + bitwiseAND, k terms unrolled — pure JVM
  column algebra. The codepoint array and the two folds each sit behind a
  `single_eval` Generate barrier (lambda-CSE: projection collapse would
  otherwise re-inline the fold once per position term — see CLAUDE.md).
- false positives are a measured, deterministic property here: the
  `bloom_decontam` registry query reports per-doc bloom hits AND exact
  hits side by side, and its DuckDB oracle replays every bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..udfs import single_eval

_M31 = 2_147_483_648


def _codes_expr(col: str) -> str:
    """Codepoint list of a string column as array<bigint> (ASCII fold
    domain — matches the oracle's ascii(substr(...)) replay)."""
    return (
        f"transform(sequence(1, length({col})),"
        f" i -> cast(ascii(substring({col}, i, 1)) as bigint))"
    )


def _fold_expr(codes_col: str, mult: int) -> str:
    """31-bit polynomial fold over a codepoint array (spans.py family)."""
    return (
        f"aggregate({codes_col}, cast(0 as bigint),"
        f" (acc, c) -> (acc * {mult} + c) % {_M31})"
    )


def _with_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Append `_h1`/`_h2` fold columns for `key_col`, barriered so each
    fold evaluates once per row no matter how many position terms read it.
    NULL keys fold to NULL (callers treat NULL probes as non-members)."""
    d = df.withColumn("_codes", single_eval(F.expr(_codes_expr(key_col))))
    d = d.withColumn(
        "_h",
        single_eval(
            F.struct(
                F.expr(_fold_expr("_codes", 1009)).alias("h1"),
                F.expr(_fold_expr("_codes", 2003)).alias("h2"),
            )
        ),
    )
    return d.withColumn("_h1", F.col("_h.h1")).withColumn("_h2", F.col("_h.h2")).drop(
        "_codes", "_h"
    )


def _position(i: int, m_bits: int) -> Column:
    """i-th probe position from the (_h1, _h2) double hash."""
    return (F.col("_h1") + F.lit(i) * (F.lit(2) * F.col("_h2") + F.lit(1))) % F.lit(
        m_bits
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_words: int = 4096, k: int = 5
) -> DataFrame:
    """Build the filter: ONE row, `bits` = array<long> of `m_words` 32-bit
    words covering m_bits = 32*m_words positions.

    Distributed end to end: per-key positions explode map-side, one slim
    (word, or-bits) aggregation, then a single-row map-fill projection.
    At 10 bits/key the words relation is ~m_bits/32 rows — trivial next to
    the key set that produced it."""
    m_bits = 32 * m_words
    hashed = _with_hashes(keys.select(F.col(key_col)), key_col)
    pos = hashed.select(
        F.explode(F.array(*[_position(i, m_bits) for i in range(k)])).alias("pos")
    )
    words = pos.distinct().select(
        F.expr("pos div 32").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("wb"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "wb"))).alias("mp")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(m_words - 1).cast("long")),
            lambda i: F.coalesce(F.element_at("mp", i), F.lit(0).cast("long")),
        ).alias("bits")
    )


def with_bloom_hit(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_words: int = 4096,
    k: int = 5,
    out: str = "bloom_hit",
) -> DataFrame:
    """Append `out` = true iff all k probe bits for `key_col` are set.

    The one-row bitmap arrives via broadcast cross join (no collect, no
    literal rebuild per batch); the k probe terms are unrolled JVM
    expressions. NULL keys probe to false."""
    m_bits = 32 * m_words
    d = _with_hashes(df.crossJoin(F.broadcast(bitmap)), key_col)
    hit = F.lit(True)
    for i in range(k):
        p = _position(i, m_bits)
        # word index = pos >> 5 (pos div 32; pos is non-negative), 1-based
        word = F.element_at(
            "bits", (F.shiftright(p.cast("long"), 5) + F.lit(1)).cast("int")
        )
        # F.shiftleft only takes a literal shift in the Python API —
        # call_function reaches the SQL overload with a column bit count
        hit = hit & (
            word.bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 32).cast("int")
                )
            )
            != 0
        )
    return d.withColumn(out, F.coalesce(hit, F.lit(False))).drop("bits", "_h1", "_h2")


def bloom_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_words: int | None = None,
    k: int = 5,
    bits_per_key: int = 10,
) -> DataFrame:
    """Decontamination with a Bloom prefilter: per training doc,
    (n_grams, n_bloom = grams passing the filter, n_exact = grams truly in
    the benchmark set). n_bloom - n_exact is the filter's false-positive
    count — deterministic, surfaced per row, never silently dropped.

    Scale story vs functions/decontam.py: the exact verification join only
    sees bloom-surviving grams, so at a benchmark-gram scale where the raw
    string broadcast stops fitting, the bitmap (32 bits/word dense array)
    still broadcasts and the expensive exact join shrinks by the filter's
    rejection rate. Training text still never shuffles: grams are
    generated map-side (decontam._with_ngrams) and both membership tests
    happen before the slim per-doc aggregation."""
    from .decontam import _with_ngrams

    bench_grams = (
        _with_ngrams(bench, text_col, n, "gs")
        .select(F.explode("gs").alias("gram"))
        .distinct()
        .cache()  # consumed twice: bitmap build + exact verify join
    )
    if m_words is None:
        # size the filter to the key set (classic m = bits_per_key * n):
        # one count job over the slim distinct-gram relation — the same
        # count is replayed inside the SQL oracle so both engines derive
        # the identical bit width
        m_words = max(1, (bits_per_key * bench_grams.count() + 31) // 32)
    bitmap = bloom_bitmap(bench_grams, "gram", m_words, k)
    grams = _with_ngrams(train, text_col, n, "gs").select(
        F.col(id_col), F.explode_outer("gs").alias("gram")
    )
    probed = with_bloom_hit(grams, "gram", bitmap, m_words, k, out="bh")
    # the exact verify join sees ONLY bloom survivors (no false negatives,
    # so the result is identical to verifying everything) — this is the
    # operator's whole point: the expensive membership join runs over the
    # FP-thin survivor stream, not the full gram stream. No broadcast hint:
    # at test scale AQE broadcasts anyway; at the benchmark-gram scale
    # where the raw strings stop broadcasting, Catalyst keeps it a shuffle
    # join of two already-thin relations.
    survivors = probed.filter(F.col("bh")).select(id_col, "gram")
    exact = (
        survivors.join(bench_grams.withColumn("_ex", F.lit(1)), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("gram").cast("long").alias("n_bloom"),
            F.sum(F.when(F.col("_ex").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_exact"),
        )
    )
    totals = probed.groupBy(id_col).agg(F.count("gram").alias("n_grams"))
    return (
        totals.join(exact, on=id_col, how="left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_bloom", F.lit(0).cast("long")).alias("n_bloom"),
            F.coalesce("n_exact", F.lit(0).cast("long")).alias("n_exact"),
        )
    )
