"""Self-trained n-gram LM quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
language model; the cheap self-contained variant used here trains add-one
smoothed n-gram counts on the corpus ITSELF and scores each document by
its mean trigram log-likelihood — documents full of rare/garbled
constructions score low, fluent boilerplate scores high (useful at both
tails: drop gibberish, downweight templated spam).

score(doc) = mean over trigram positions of
             ln( (C(w1 w2 w3) + 1) / (C(w1 w2 .) + V) )

with C(.) corpus counts and V the corpus vocabulary size.

100 TB shape: tokenization and n-gram construction are map-side JVM
(split / transform / explode behind a single_eval barrier — the lambda-CSE
lesson, CLAUDE.md); the gram STRINGS are dropped map-side in favour of
xxhash64 keys, so no text ever enters a shuffle (plan-gated).  The hashed
trigram table is cached once and reused for the two count aggregations and
the scoring join (the self-join-over-UDF-output lesson); count tables stay
as shuffle joins — at corpus scale the gram model does not fit a
broadcast, and AQE will still broadcast it when it does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import single_eval


def ngram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
    cache: bool = True,
) -> DataFrame:
    """(id, n_trigrams, avg_logp) per document with >= 3 tokens; avg_logp
    rounded to `round_to` (cross-engine float stability).  Higher = more
    typical of the corpus."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda w: w != "")
    base = df.select(F.col(id_col), single_eval(toks).alias("w")).filter(F.size("w") >= 3)
    tri = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 2),
                lambda i: F.struct(
                    F.xxhash64(
                        F.concat_ws(
                            " ",
                            F.element_at("w", i),
                            F.element_at("w", i + 1),
                            F.element_at("w", i + 2),
                        )
                    ).alias("tri_h"),
                    F.xxhash64(
                        F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1))
                    ).alias("ctx_h"),
                ),
            )
        ).alias("g"),
    ).select(id_col, "g.tri_h", "g.ctx_h")
    if cache:
        tri = tri.cache()

    tri_counts = tri.groupBy("tri_h").agg(F.count(F.lit(1)).alias("c_tri"))
    ctx_counts = tri.groupBy("ctx_h").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab = base.select(F.explode("w").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )

    logp = F.log((F.col("c_tri") + F.lit(1.0)) / (F.col("c_ctx") + F.col("v")))
    return (
        tri.join(tri_counts, on="tri_h")
        .join(ctx_counts, on="ctx_h")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(logp), round_to).alias("avg_logp"),
        )
    )
