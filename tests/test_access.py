"""2SFCA accessibility (functions/access.py).  Ground truth: python
pair loop with exact integer arithmetic."""
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
