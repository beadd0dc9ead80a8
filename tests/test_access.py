"""2SFCA accessibility + Huff market share (functions/access.py).
Ground truth: python pair loops with exact integer arithmetic."""
import numpy as np


def brute(demand, supply, radius, scale=1_000_000):
    r2 = radius * radius
    pairs = [
        (pid, sid, cap)
        for pid, px, py in demand
        for sid, sx, sy, cap in supply
        if (px - sx) ** 2 + (py - sy) ** 2 <= r2
    ]
    dcnt = {}
    for _, sid, _c in pairs:
        dcnt[sid] = dcnt.get(sid, 0) + 1
    ratio = {sid: cap * scale // dcnt[sid]
             for _, sid, cap in pairs}
    out = {}
    for pid, sid, _c in pairs:
        n, a = out.get(pid, (0, 0))
        out[pid] = (n + 1, a + ratio[sid])
    return out


def test_two_step_fca_matches_bruteforce(spark):
    from versatiles_rs_spark.functions.access import two_step_fca

    rng = np.random.default_rng(71)
    demand = [(i, int(rng.integers(0, 400)), int(rng.integers(0, 400)))
              for i in range(120)]
    supply = [(i, int(rng.integers(0, 400)), int(rng.integers(0, 400)),
               int(rng.integers(1, 30))) for i in range(15)]
    d = spark.createDataFrame(demand, "pid long, px long, py long")
    s = spark.createDataFrame(supply, "sid long, sx long, sy long, capacity long")
    got = {r["pid"]: (r["n_supply"], r["access"])
           for r in two_step_fca(d, s, radius=60).collect()}
    assert got == brute(demand, supply, 60)


def test_two_step_fca_semantics(spark):
    from versatiles_rs_spark.functions.access import two_step_fca

    # one crowded site (cap 10, 2 demanders) and one private site
    # (cap 10, 1 demander): the solo demander scores higher
    demand = [(1, 0, 0), (2, 10, 0), (3, 100, 0)]
    supply = [(1, 5, 0, 10), (2, 101, 0, 10)]
    d = spark.createDataFrame(demand, "pid long, px long, py long")
    s = spark.createDataFrame(supply, "sid long, sx long, sy long, capacity long")
    got = {r["pid"]: (r["n_supply"], r["access"])
           for r in two_step_fca(d, s, radius=20).collect()}
    assert got == {1: (1, 5_000_000), 2: (1, 5_000_000), 3: (1, 10_000_000)}
    # exact-radius boundary is inclusive
    got = {r["pid"]: r["n_supply"]
           for r in two_step_fca(
               spark.createDataFrame([(1, 20, 0)], "pid long, px long, py long"),
               spark.createDataFrame([(1, 0, 0, 1)],
                                     "sid long, sx long, sy long, capacity long"),
               radius=20).collect()}
    assert got == {1: 1}


def test_two_step_fca_plan_one_pair_join(spark):
    from versatiles_rs_spark.functions.access import two_step_fca

    d = spark.createDataFrame([(1, 0, 0)], "pid long, px long, py long")
    s = spark.createDataFrame([(1, 5, 0, 10)],
                              "sid long, sx long, sy long, capacity long")
    plan = two_step_fca(d, s, radius=20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def brute_huff(demand, supply, radius, scale=10**12, prob_scale=1000):
    r2 = radius * radius
    w = {
        (pid, sid): att * scale // ((px - sx) ** 2 + (py - sy) ** 2 + 1)
        for pid, px, py in demand
        for sid, sx, sy, att in supply
        if (px - sx) ** 2 + (py - sy) ** 2 <= r2
    }
    w = {k: v for k, v in w.items() if v > 0}
    den = {}
    for (pid, _), v in w.items():
        den[pid] = den.get(pid, 0) + v
    out = {}
    for (pid, sid), v in w.items():
        n, m = out.get(sid, (0, 0))
        out[sid] = (n + 1, m + v * prob_scale // den[pid])
    return out


def test_huff_matches_bruteforce(spark):
    from versatiles_rs_spark.functions.access import huff_market_share

    rng = np.random.default_rng(73)
    demand = [(i, int(rng.integers(0, 400)), int(rng.integers(0, 400)))
              for i in range(150)]
    supply = [(i, int(rng.integers(0, 400)), int(rng.integers(0, 400)),
               int(rng.integers(1, 30))) for i in range(12)]
    d = spark.createDataFrame(demand, "pid long, px long, py long")
    s = spark.createDataFrame(supply, "sid long, sx long, sy long, attract long")
    got = {r["sid"]: (r["n_reached"], r["demand_milli"])
           for r in huff_market_share(d, s, radius=60).collect()}
    assert got == brute_huff(demand, supply, 60)


def test_huff_semantics(spark):
    from versatiles_rs_spark.functions.access import huff_market_share

    # equidistant demander between equal stores: exact 50/50 split;
    # a second demander sits AT store 1 -> all-but-floor-residue there
    demand = [(1, 10, 0), (2, 0, 0)]
    supply = [(1, 0, 0, 7), (2, 20, 0, 7)]
    d = spark.createDataFrame(demand, "pid long, px long, py long")
    s = spark.createDataFrame(supply, "sid long, sx long, sy long, attract long")
    rows = {r["sid"]: r for r in huff_market_share(d, s, radius=25).collect()}
    # pid 1: w equal to both -> 500 milli each.  pid 2: d2=0 vs d2=400
    # -> w1 = 7e12, w2 = 7e12 // 401; p1 = 999 milli (floor), p2 = 0
    w1, w2 = 7 * 10**12, 7 * 10**12 // 401
    p1 = w1 * 1000 // (w1 + w2)
    p2 = w2 * 1000 // (w1 + w2)
    assert rows[1].demand_milli == 500 + p1
    assert rows[2].demand_milli == 500 + p2
    assert rows[1].n_reached == 2 and rows[2].n_reached == 2
    assert rows[1].expected == (500 + p1) / 1000.0
    # attractiveness doubles -> more than half the split at equal distance
    s2 = spark.createDataFrame(
        [(1, 0, 0, 14), (2, 20, 0, 7)],
        "sid long, sx long, sy long, attract long")
    rows = {r["sid"]: r.demand_milli
            for r in huff_market_share(
                d.filter("pid = 1"), s2, radius=25).collect()}
    assert rows[1] == 666 and rows[2] == 333  # 2:1 gravity split


def test_huff_plan_stays_jvm_side(spark):
    from versatiles_rs_spark.functions.access import huff_market_share

    d = spark.createDataFrame([(1, 0, 0)], "pid long, px long, py long")
    s = spark.createDataFrame([(1, 5, 0, 10)],
                              "sid long, sx long, sy long, attract long")
    plan = huff_market_share(d, s, radius=20)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
