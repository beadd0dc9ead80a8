"""Geohash cells, n-gram decontamination, concat-and-chunk packing —
published vectors and pure-python brute-force oracles."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.cells import geohash_expr
from versatiles_rs_spark.functions.decontam import ngram_contamination
from versatiles_rs_spark.functions.packing import pack_chunks, pack_spans


def test_geohash_published_vectors(spark):
    # canonical vectors from the public geohash spec/wikipedia
    cases = [
        (57.64911, 10.40744, 11, "u4pruydqqvj"),
        (42.6, -5.6, 5, "ezs42"),
        (-25.382708, -49.265506, 8, "6gkzwgjz"),
        (90.0, 180.0, 6, "zzzzzz"),  # clamp at the +edge
        (-90.0, -180.0, 6, "000000"),
    ]
    pdf = pd.DataFrame(
        {"i": range(len(cases)), "lat": [c[0] for c in cases], "lon": [c[1] for c in cases]}
    )
    df = spark.createDataFrame(pdf)
    for prec in sorted({c[2] for c in cases}):
        got = {
            r.i: r.gh
            for r in df.withColumn("gh", geohash_expr(F.col("lon"), F.col("lat"), prec)).collect()
        }
        for i, (_, _, p, exp) in enumerate(cases):
            if p == prec:
                assert got[i] == exp, (i, got[i], exp)


def test_geohash_no_python_in_plan(spark):
    df = spark.range(10).select(
        (F.col("id") * 0.1).alias("lon"), (F.col("id") * 0.05).alias("lat")
    )
    plan = (
        df.withColumn("gh", geohash_expr(F.col("lon"), F.col("lat"), 6))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


def _brute_ngrams(text, n=3):
    toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontamination_matches_bruteforce(spark):
    train = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "pack my box with five dozen liquor jugs",
        2: "short one",          # fewer than n words -> 0 grams, frac 0
        3: "the quick brown fox ate a benchmark sentence verbatim",
        4: "",
    }
    bench = {
        100: "the quick brown fox jumps high",
        101: "a benchmark sentence verbatim appears here",
    }
    tdf = spark.createDataFrame(pd.DataFrame({"doc_id": list(train), "text": list(train.values())}))
    bdf = spark.createDataFrame(pd.DataFrame({"doc_id": list(bench), "text": list(bench.values())}))
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated_frac)
        for r in ngram_contamination(tdf, bdf, n=3).collect()
    }
    bgrams = set().union(*[_brute_ngrams(t) for t in bench.values()])
    for d, t in train.items():
        gs = _brute_ngrams(t)
        hits = len(gs & bgrams)
        frac = round(hits / len(gs), 6) if gs else 0.0
        assert got[d] == (len(gs), hits, frac), (d, got[d])
    # doc 3 shares "a benchmark sentence" + "benchmark sentence verbatim"
    assert got[3][1] >= 2


def test_decontamination_bench_side_broadcast(spark):
    tdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(50), "text": ["alpha beta gamma delta"] * 50})
    )
    bdf = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]}))
    plan = (
        ngram_contamination(tdf, bdf, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # training grams must never shuffle


def _brute_pack(docs, capacity, shards):
    """docs: [(id, n_tokens)] -> {(shard, chunk): (n_docs, n_tokens)}"""
    out = {}
    for s in range(shards):
        mine = sorted((i, t) for i, t in docs if i % shards == s)
        pos = 0
        for _i, t in mine:
            if t <= 0:
                continue
            start, end = pos, pos + t
            pos = end
            for c in range(start // capacity, (end - 1) // capacity + 1):
                took = min(end, (c + 1) * capacity) - max(start, c * capacity)
                nd, nt = out.get((s, c), (0, 0))
                out[(s, c)] = (nd + 1, nt + took)
    return out


def test_pack_chunks_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    n = 300
    toks = rng.randint(0, 900, n)
    toks[5] = 0          # empty doc
    toks[17] = 5000      # bigger than capacity: spans many chunks alone
    pdf = pd.DataFrame({"doc_id": np.arange(n), "n_tokens": toks})
    got = {
        (r.shard, r.chunk): (r.n_docs, r.n_tokens)
        for r in pack_chunks(
            spark.createDataFrame(pdf), token_col="n_tokens", capacity=512, shards=4
        ).collect()
    }
    exp = _brute_pack(list(zip(pdf.doc_id, pdf.n_tokens)), capacity=512, shards=4)
    assert got == exp


def test_pack_spans_capacity_invariants(spark):
    pdf = pd.DataFrame({"doc_id": np.arange(100), "n_tokens": np.full(100, 300)})
    df = spark.createDataFrame(pdf)
    chunks = pack_chunks(df, token_col="n_tokens", capacity=1000, shards=2).collect()
    # every chunk except each shard's last holds exactly `capacity` tokens
    by_shard = {}
    for r in chunks:
        by_shard.setdefault(r.shard, []).append((r.chunk, r.n_tokens))
    for s, rows in by_shard.items():
        rows.sort()
        assert all(t == 1000 for _, t in rows[:-1])
        assert sum(t for _, t in rows) == 300 * 50  # conservation of tokens
    spans = pack_spans(df, token_col="n_tokens", capacity=1000, shards=2).collect()
    assert all(r.first_chunk <= r.last_chunk for r in spans)


def test_pack_window_is_per_shard(spark):
    # the cumsum window must partition by shard: with 1 shard the plan has a
    # single-partition window (the trap); with k shards it must not
    df = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens"))
    plan = (
        pack_spans(df, token_col="n_tokens", capacity=100, shards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
