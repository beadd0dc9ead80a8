"""Brute-force parity + plan gates for the corpus curation family:
repetition_metrics (Gopher filters), pii_redact, domain_cap."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.corpus import domain_cap
from versatiles_rs_spark.functions.sessions import (
    _SAMPLE_ADD,
    _SAMPLE_MOD,
    _SAMPLE_MULT,
)
from versatiles_rs_spark.functions.text import pii_redact, repetition_metrics


def _brute_repetition(text: str) -> dict:
    words = [w for w in text.split(" ") if w]
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    n = len(words)
    top_w = max(Counter(words).values()) if words else 0
    top_b = max(Counter(bigrams).values()) if bigrams else 0
    return {
        "n_words": n,
        "n_unique": len(set(words)),
        "top_word_count": top_w,
        "top_bigram_count": top_b,
        "keep": 5 * top_w <= n and 5 * top_b <= max(n - 1, 1),
    }


REP_CASES = [
    ("a b c d e f g h i j", True),            # unique words
    ("spam spam spam spam a", False),          # word-dominated
    ("x y x y x y x y z q", False),            # bigram-dominated
    ("", None),                                # empty text
    ("one", None),                             # single word
    ("a  b", None),                            # double space -> empty token
    ("p q r s t p q u v w x y z a b", None),  # mild repetition
]


def test_repetition_metrics_matches_bruteforce(spark):
    rows = [(i, t) for i, (t, _) in enumerate(REP_CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    for i, (t, expect_keep) in enumerate(REP_CASES):
        want = _brute_repetition(t)
        g = got[i]
        for k, v in want.items():
            assert g[k] == v, (i, t, k, g, want)
        if expect_keep is not None:
            assert g["keep"] == expect_keep, (i, t)


def test_repetition_metrics_no_shuffle_no_python(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


PII_CASES = [
    ("mail me at a.b-c_d@ex-1.co and x@y.io now", 2, 0),
    ("call +1-555-0123 or 44-201-9999 today", 0, 2),
    ("user@sub.domain.example.com / +421-123-4567", 1, 1),
    ("no pii here at all", 0, 0),
    ("almost@an email @ nowhere.x", 0, 0),  # 1-char TLD, bare @ -> no match
]


def test_pii_redact_counts_and_masking(spark):
    rows = [(i, t) for i, (t, _, _) in enumerate(PII_CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    for i, (t, n_em, n_ph) in enumerate(PII_CASES):
        assert got[i]["n_emails"] == n_em, (t, got[i])
        assert got[i]["n_phones"] == n_ph, (t, got[i])
        red = got[i]["redacted"]
        if n_em:
            assert "<EMAIL>" in red and "@" not in red, red
        if n_ph:
            assert "<PHONE>" in red
    # masking is idempotent: redacting redacted text changes nothing
    red_df = pii_redact(df).select("doc_id", F.col("redacted").alias("text"))
    twice = {r["doc_id"]: r["redacted"] for r in pii_redact(red_df).collect()}
    assert twice == {r["doc_id"]: r["redacted"] for r in got.values()}


def test_pii_redact_stays_jvm(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id long, text string")
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def _brute_domain_cap(rows, cap, blocklist):
    out = []
    by_dom: dict = {}
    for doc_id, dom in rows:
        if dom in blocklist:
            continue
        by_dom.setdefault(dom, []).append(doc_id)
    for dom, ids in by_dom.items():
        ids.sort(key=lambda i: ((i * _SAMPLE_MULT + _SAMPLE_ADD) % _SAMPLE_MOD, i))
        out.extend((i, dom, rk + 1) for rk, i in enumerate(ids[:cap]))
    return sorted(out)


def test_domain_cap_matches_bruteforce(spark):
    rows = [(i, f"d{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"], r["rk"])
        for r in domain_cap(df, cap=7, blocklist=["d2"]).collect()
    )
    assert got == _brute_domain_cap(rows, 7, {"d2"})
    # every surviving domain is exactly at the cap; blocked domain absent
    doms = Counter(d for _, d, _ in got)
    assert set(doms) == {"d0", "d1", "d3", "d4"} and set(doms.values()) == {7}


def test_domain_cap_under_cap_keeps_all(spark):
    rows = [(i, "only") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = domain_cap(df, cap=100).collect()
    assert len(got) == 5 and {r["rk"] for r in got} == {1, 2, 3, 4, 5}


def test_domain_cap_blocklist_is_broadcast_anti(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, source string")
    plan = (
        domain_cap(df, cap=1, blocklist=["b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# ---------------------------------------------------------------------------
# duplicate_spans (functions/spans.py)
# ---------------------------------------------------------------------------


def _brute_spans(texts: dict[int, str], width: int, min_count: int = 2):
    """Python oracle: window token-tuples (exact strings, no hashing),
    corpus-wide counts, islands merge."""
    toks = {
        d: [t for t in __import__("re").split(r"[^a-z0-9]+", txt.lower()) if t]
        for d, txt in texts.items()
    }
    wins = {}  # (doc,pos) -> tuple
    from collections import Counter

    counts = Counter()
    for d, tk in toks.items():
        for p in range(len(tk) - width + 1):
            w = tuple(tk[p : p + width])
            wins[(d, p)] = w
            counts[w] += 1
    marked = sorted((d, p) for (d, p), w in wins.items() if counts[w] >= min_count)
    spans = []
    for d in sorted(set(d for d, _ in marked)):
        ps = [p for dd, p in marked if dd == d]
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev > width:
                spans.append((d, start, prev + width - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        spans.append((d, start, prev + width - 1, n))
    return sorted(spans)


def test_duplicate_spans_matches_bruteforce(spark):
    """Planted structure: a boilerplate sentence shared by 3 docs, a
    partial overlap, an intra-doc repeat, and unique text — spans must
    match the exact-string brute force (hash fidelity + merge logic)."""
    from versatiles_rs_spark.functions.spans import duplicate_spans

    boiler = "all rights reserved contact us at example dot com for details"
    texts = {
        0: f"unique alpha opening words here. {boiler} trailing unique tail zero",
        1: f"different beginning text for doc one {boiler} and another ending",
        2: f"{boiler}",  # exactly the boilerplate
        3: "totally unrelated content with no repeats at all whatsoever okay",
        4: "repeat me now please kind sir. repeat me now please kind sir. done",
        5: "short",  # below width -> no windows
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    width = 4
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_dup_windows)
        for r in duplicate_spans(df, width=width).collect()
    )
    assert got == _brute_spans(texts, width)
    assert any(d == 4 for d, *_ in got)  # intra-doc repeat detected


def test_duplicate_spans_pure_jvm_slim_shuffle(spark):
    """No Python evaluation anywhere; document text appears in no Exchange
    (only (wkey, doc_id, pos) longs shuffle)."""
    from versatiles_rs_spark.functions.spans import duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    plan = duplicate_spans(df, width=4)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan
    import re

    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "text" not in ex, ex


def test_caption_frequency_cap_matches_bruteforce(spark):
    from versatiles_rs_spark.functions.corpus import caption_frequency_cap

    # 3 normalized-equal spellings of one caption + distinct singletons
    rows = [(i, "A  Red--Car!") for i in range(6)] + [
        (10 + i, f"unique caption {i}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "image_id long, caption string")
    out = {r.image_id: r for r in caption_frequency_cap(df, cap=2).collect()}
    assert len(out) == 10
    dup_keys = {out[i].cap_key for i in range(6)}
    assert len(dup_keys) == 1  # normalization collapses punctuation/case/spacing
    assert sum(out[i].keep for i in range(6)) == 2  # capped at 2
    assert all(out[i].n_caption == 6 for i in range(6))
    # kept pair = lowest affine-hash ids (deterministic pick)
    order = sorted(range(6), key=lambda i: ((i * _SAMPLE_MULT + _SAMPLE_ADD) % _SAMPLE_MOD, i))
    assert {i for i in range(6) if out[i].keep} == set(order[:2])
    for i in range(4):
        assert out[10 + i].keep == 1 and out[10 + i].n_caption == 1


def test_caption_frequency_cap_single_exchange_no_text_shuffled(spark):
    import re

    from versatiles_rs_spark.functions.corpus import caption_frequency_cap

    df = spark.createDataFrame([(1, "x"), (2, "x")], "image_id long, caption string")
    plan = caption_frequency_cap(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "caption#" not in ex, ex
