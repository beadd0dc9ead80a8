"""n-gram LM quality scoring (functions/lm.py): semantic direction
(corpus-typical text outranks gibberish), short-doc exclusion, numpy
reference parity, and the no-text-in-shuffle plan gate."""

import math

import numpy as np
import pandas as pd
import re

from versatiles_rs_spark.functions.lm import ngram_logprob_score


def _np_reference(texts):
    """Exact add-one trigram LM replay in plain python."""
    toks = {i: [w for w in re.split(r"[^a-z]+", t.lower()) if w] for i, t in texts}
    toks = {i: w for i, w in toks.items() if len(w) >= 3}
    tri, ctx, vocab = {}, {}, set()
    for w in toks.values():
        vocab.update(w)
        for j in range(len(w) - 2):
            t3, c2 = " ".join(w[j : j + 3]), " ".join(w[j : j + 2])
            tri[t3] = tri.get(t3, 0) + 1
            ctx[c2] = ctx.get(c2, 0) + 1
    v = len(vocab)
    out = {}
    for i, w in toks.items():
        lps = [
            math.log((tri[" ".join(w[j : j + 3])] + 1.0) / (ctx[" ".join(w[j : j + 2])] + v))
            for j in range(len(w) - 2)
        ]
        out[i] = (len(lps), round(sum(lps) / len(lps), 4))
    return out


def test_lm_score_matches_reference_and_direction(spark):
    texts = [
        (1, "the cat sat on the mat and the cat ran to the mat"),
        (2, "the dog sat on the mat and the dog ran to the mat"),
        (3, "zq xv jk wq pz lr tn bg mk dp"),  # gibberish: every trigram unique
        (4, "to be"),  # < 3 tokens: excluded
    ]
    df = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    got = {r.doc_id: (r.n_trigrams, r.avg_logp) for r in ngram_logprob_score(df).collect()}
    assert got == _np_reference(texts)
    assert 4 not in got
    # corpus-typical documents outrank the gibberish one
    assert got[1][1] > got[3][1] and got[2][1] > got[3][1]


def test_lm_score_plan_no_text_in_shuffle(spark, sf_dir):
    """Gram strings are hashed map-side: no Exchange may carry text, tri,
    or ctx columns; the token array stays behind the Generate barrier."""
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["lm_score"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line and " tri" not in line and "ctx#" not in line, line
    assert "InMemoryTableScan" in plan  # hashed trigram table cached across consumers
