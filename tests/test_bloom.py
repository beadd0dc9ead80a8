"""Bloom prefilter (functions/bloom.py): membership guarantees, brute-force
hash parity, adaptive sizing, and plan gates (JVM-only probe, broadcast
bitmap, no text in any exchange)."""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.bloom import (
    _M31,
    bloom_bitmap,
    bloom_contamination,
    with_bloom_hit,
)

KEYS = ["alpha", "beta", "gamma", "delta-7", "the quick fox", "z"]


def _fold(s: str, mult: int) -> int:
    acc = 0
    for ch in s:
        acc = (acc * mult + ord(ch)) % _M31
    return acc


def _brute_positions(s: str, m_bits: int, k: int = 5) -> list[int]:
    h1, h2 = _fold(s, 1009), _fold(s, 2003)
    return [(h1 + i * (2 * h2 + 1)) % m_bits for i in range(k)]


def _brute_member(s: str, keys: list[str], m_bits: int, k: int = 5) -> bool:
    bits = set()
    for kk in keys:
        bits.update(_brute_positions(kk, m_bits, k))
    return all(p in bits for p in _brute_positions(s, m_bits, k))


@pytest.fixture(scope="module")
def bitmap(spark):
    keys = spark.createDataFrame([(s,) for s in KEYS], "gram string")
    return bloom_bitmap(keys, "gram", m_words=8, k=5).cache()


def test_no_false_negatives_and_brute_parity(spark, bitmap):
    # every inserted key must hit; non-members must match the brute-force
    # bit-set simulation exactly (the filter is deterministic, so FP or
    # not-FP is a fixed, checkable property per probe string)
    probes = KEYS + ["epsilon", "zeta", "eta9", "omega omega", ""]
    df = spark.createDataFrame([(s,) for s in probes], "gram string")
    got = {
        r["gram"]: r["hit"]
        for r in with_bloom_hit(df, "gram", bitmap, m_words=8, k=5, out="hit").collect()
    }
    for s in probes:
        assert got[s] == _brute_member(s, KEYS, 8 * 32), s


def test_null_probe_is_false(spark, bitmap):
    df = spark.createDataFrame([(None,), ("alpha",)], "gram string")
    rows = with_bloom_hit(df, "gram", bitmap, m_words=8, k=5).collect()
    assert {r["gram"]: r["bloom_hit"] for r in rows} == {None: False, "alpha": True}


def test_bitmap_words_match_brute(spark, bitmap):
    bits = bitmap.collect()[0]["bits"]
    assert len(bits) == 8
    want = [0] * 8
    for s in KEYS:
        for p in _brute_positions(s, 8 * 32):
            want[p // 32] |= 1 << (p % 32)
    assert bits == want


def test_contamination_counts(spark):
    # planted corpus: doc 0 is the benchmark; doc 1 shares a 3-gram run,
    # doc 2 shares nothing; n_bloom >= n_exact always (no false negatives)
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "said the quick brown fox to nobody"),
        (2, "completely different words in this one here"),
        (3, "xx"),  # < 3 tokens -> zero grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # signature is (train, bench) — train first
    out = bloom_contamination(
        docs.filter("doc_id <> 0"), docs.filter("doc_id = 0"), m_words=64, k=5
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_bloom"], r["n_exact"]) for r in out.collect()}
    assert got[1][0] == 5  # 7 tokens -> 5 distinct 3-grams
    assert got[1][2] == 2  # "the quick brown", "quick brown fox"
    assert got[2][2] == 0
    assert got[3] == (0, 0, 0)
    for ng, nb, ne in got.values():
        assert 0 <= ne <= nb <= ng


def test_adaptive_sizing_no_false_negatives(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    out = bloom_contamination(train, bench, bits_per_key=10).cache()
    bad = out.filter(F.col("n_bloom") < F.col("n_exact")).count()
    assert bad == 0
    # and the filter actually filters: bloom-rejected grams dominate
    tot = out.agg(F.sum("n_grams").alias("g"), F.sum("n_bloom").alias("b")).collect()[0]
    assert tot["b"] < tot["g"] * 0.5


def test_plan_gates(spark, bitmap):
    df = spark.createDataFrame([(s,) for s in KEYS], "gram string")
    plan = (
        with_bloom_hit(df, "gram", bitmap, m_words=8, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # probe side is pure JVM: no Python evaluation anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the one-row bitmap reaches the probe via broadcast, not shuffle
    assert "BroadcastNestedLoopJoin" in plan
    # the only exchanges are the bitmap build's slim pos/word aggregations —
    # no shuffle ever carries the probe key strings
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "gram#" not in m.group(1), m.group(0)


def test_exact_join_sees_only_survivors(spark, sf_dir):
    # the verify join's input must be filtered to bloom hits — the whole
    # point of the operator (code-review r3 session-4 finding)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    out = bloom_contamination(
        docs.filter("doc_id % 17 <> 0"), docs.filter("doc_id % 17 = 0"),
        bits_per_key=10,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the optimizer inlines bh's defining expression into the Filter, so
    # look for the probe bit test (element_at on the bitmap) in a Filter
    # feeding the gram equi-join
    assert any(
        "Filter" in line and "element_at(bits#" in line
        for line in plan.splitlines()
    ), "exact verify join is not restricted to bloom survivors"
