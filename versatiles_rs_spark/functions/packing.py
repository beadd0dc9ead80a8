"""Sequence packing — concat-and-chunk document packing for pretraining.

The dominant packing scheme in LLM pretraining pipelines: concatenate
documents in a fixed order and cut the token stream every `capacity`
tokens; each chunk becomes one training sequence. A document maps to the
half-open token span [start, start + n_tokens), which overlaps chunks
floor(start/C) .. floor((end-1)/C).

Scale shape: a GLOBAL concatenation order would force a single-partition
window (the classic distributed-cumsum trap). Pipelines don't need one —
chunks are independent training rows, so packing runs per SHARD: documents
are hash-bucketed into `shards` groups, ordered within the shard by the
document id, and cumsummed with a window PARTITIONED by shard. One shuffle,
parallelism = shards, chunk ids are (shard, chunk_seq) pairs. Deterministic:
shard = pmod(id, shards), order = id — no rand(), replayable in ANSI SQL.

Two outputs:
- pack_spans:  per document — its shard, token span, first/last chunk.
- pack_chunks: per chunk — document count and the exact number of tokens
  the chunk takes from each overlap (boundary documents are split across
  chunks, as concat-and-chunk training does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_spans(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    capacity: int = 2048,
    shards: int = 8,
) -> DataFrame:
    """Assign each document its token span within its shard's stream:
    (id, shard, start_tok, n_tokens, first_chunk, last_chunk)."""
    c = int(capacity)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col).cast("long")
    out = (
        df.select(F.col(id_col), toks.alias("n_tokens"))
        .withColumn("shard", F.pmod(F.col(id_col), F.lit(int(shards))).cast("int"))
        .withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    # integer `div`, not float division: token offsets at corpus scale
    # exceed 2^53 and would round under IEEE division
    return out.select(
        id_col,
        "shard",
        "start_tok",
        "n_tokens",
        F.expr(f"start_tok div {c}").alias("first_chunk"),
        # empty docs occupy no chunk span; pin them to first_chunk so the
        # span is never inverted
        F.greatest(
            F.expr(f"(start_tok + n_tokens - 1) div {c}"),
            F.expr(f"start_tok div {c}"),
        ).alias("last_chunk"),
    )


def pack_chunks(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    capacity: int = 2048,
    shards: int = 8,
) -> DataFrame:
    """Chunk-level roll-up: (shard, chunk, n_docs, n_tokens) where n_tokens
    is the exact token count the chunk holds (== capacity except each
    shard's tail chunk). Explodes each doc over its (usually 1-2) chunks —
    the explode factor is 1 + n_tokens/capacity, tiny by construction."""
    c = int(capacity)
    spans = pack_spans(df, token_col, id_col=id_col, capacity=c, shards=shards)
    ex = spans.filter(F.col("n_tokens") > 0).withColumn(
        "chunk", F.explode(F.sequence("first_chunk", "last_chunk"))
    )
    start = F.col("start_tok")
    end = F.col("start_tok") + F.col("n_tokens")
    lo = F.greatest(start, F.col("chunk") * c)
    hi = F.least(end, (F.col("chunk") + 1) * c)
    return (
        ex.withColumn("took", (hi - lo).cast("long"))
        .groupBy("shard", "chunk")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("took").alias("n_tokens"),
        )
    )
