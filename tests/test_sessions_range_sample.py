"""Sessionization, bucketized range join, deterministic sampling —
pure-python brute-force oracles."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.sessions import (
    _SAMPLE_ADD,
    _SAMPLE_MOD,
    _SAMPLE_MULT,
    deterministic_sample,
    sessionize,
    stratified_sample,
)
from versatiles_rs_spark.joins.range_join import range_join


def _brute_sessions(rows, gap):
    """rows: list of (user, ts) -> {(user, ts_index): session_seq}"""
    out = {}
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        seq = 0
        prev = None
        for t in sorted(ts):
            if prev is None or t - prev > gap:
                seq += 1
            out[(u, t)] = seq
            prev = t
    return out


def test_sessionize_numeric_matches_bruteforce(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "user_id": rng.randint(0, 8, 400),
            "ts": rng.randint(0, 100_000, 400),
        }
    ).drop_duplicates(["user_id", "ts"])
    exp = _brute_sessions(list(zip(pdf.user_id, pdf.ts)), gap=600)
    got = sessionize(
        spark.createDataFrame(pdf), ts_col="ts", by=("user_id",), gap_seconds=600
    ).collect()
    assert {(r.user_id, r.ts): r.session_seq for r in got} == exp


def test_sessionize_timestamp_gap_semantics(spark):
    # gaps of exactly gap_seconds do NOT split; gap_seconds + 1us does
    base = pd.Timestamp("2024-01-01")
    ts = [base, base + pd.Timedelta(seconds=60), base + pd.Timedelta(seconds=120, microseconds=1)]
    pdf = pd.DataFrame({"user_id": [1, 1, 1], "ts": ts})
    got = sorted(
        (r.ts, r.session_seq)
        for r in sessionize(
            spark.createDataFrame(pdf), ts_col="ts", by=("user_id",), gap_seconds=60
        ).collect()
    )
    assert [s for _, s in got] == [1, 1, 2]


def test_range_join_matches_bruteforce(spark):
    rng = np.random.RandomState(11)
    pts = pd.DataFrame({"pid": np.arange(300), "t": rng.randint(0, 5000, 300)})
    starts = rng.randint(0, 5000, 60)
    # widths from zero-length to many-bucket spans
    iv = pd.DataFrame(
        {"iid": np.arange(60), "lo": starts, "hi": starts + rng.randint(0, 900, 60)}
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            point_ts="t",
            start_col="lo",
            end_col="hi",
            bucket_seconds=250,
        ).collect()
    }
    exp = {
        (int(p.pid), int(i.iid))
        for _, p in pts.iterrows()
        for _, i in iv.iterrows()
        if i.lo <= p.t <= i.hi
    }
    assert got == exp


def test_range_join_no_duplicate_candidates(spark):
    # an interval spanning many buckets must match a contained point ONCE
    pts = spark.createDataFrame(pd.DataFrame({"pid": [0], "t": [500]}))
    iv = spark.createDataFrame(pd.DataFrame({"iid": [0], "lo": [0], "hi": [10_000]}))
    rows = range_join(pts, iv, "t", "lo", "hi", bucket_seconds=100).collect()
    assert len(rows) == 1


def _gate(key, frac):
    return (key * _SAMPLE_MULT + _SAMPLE_ADD) % _SAMPLE_MOD < int(frac * _SAMPLE_MOD)


def test_deterministic_sample_exact_and_stable(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    kept1 = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    kept2 = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert kept1 == kept2 == {k for k in range(10_000) if _gate(k, 0.3)}
    assert abs(len(kept1) / 10_000 - 0.3) < 0.02


def test_stratified_sample_exact(spark):
    pdf = pd.DataFrame(
        {"doc_id": np.arange(6000), "lang": np.tile(["en", "es", "xx"], 2000)}
    )
    fr = {"en": 0.5, "es": 0.25}
    got = {
        r.doc_id
        for r in stratified_sample(
            spark.createDataFrame(pdf), "doc_id", "lang", fr, default_fraction=0.1
        ).collect()
    }
    exp = {
        int(r.doc_id)
        for _, r in pdf.iterrows()
        if _gate(int(r.doc_id), fr.get(r.lang, 0.1))
    }
    assert got == exp


def test_stratified_gate_is_scan_level(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    plan = (
        stratified_sample(df, "doc_id", "lang", {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure filter: no shuffle introduced


def test_tfidf_topk_matches_bruteforce(spark):
    import re
    from collections import Counter

    from versatiles_rs_spark.functions.text import tfidf_topk

    docs = {
        0: "spark shuffle spark join window",
        1: "join join window scan",
        2: "spark scan scan unique",
    }
    pdf = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.doc_freq)
        for r in tfidf_topk(spark.createDataFrame(pdf), k=2).collect()
    }
    # brute force
    toks = {d: re.split(r"[^a-z]+", t.lower()) for d, t in docs.items()}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    dfreq = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    n = len(docs)
    exp = {}
    for d, ws in toks.items():
        tf = Counter(ws)
        scored = sorted(
            ((t, c, dfreq[t], c * (n + 1) / (dfreq[t] + 1)) for t, c in tf.items()),
            key=lambda x: (-x[3], x[0]),
        )
        for i, (t, c, df_, _) in enumerate(scored[:2], start=1):
            exp[(d, i)] = (t, c, df_)
    assert got == exp
