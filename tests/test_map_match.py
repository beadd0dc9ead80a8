"""Map matching (joins/map_match.py): brute-force parity + semantics.

The engine runs an unrolled relational Viterbi; the reference here
enumerates ALL k^T candidate paths in numpy and picks the unique minimal
positional-rank total — two independent algorithms, one answer (the same
relationship the DuckDB oracle has to the registry query, replayed on
adversarial inputs the fixture tables don't produce)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from versatiles_rs_spark.joins.map_match import candidate_segments, map_match


def brute_best_paths(cand: pd.DataFrame, T: int, K: int, penalty: int):
    """Enumerate every candidate path per uid; return {uid: [(step, sid, emit)]}."""
    kt = K**T
    out = {}
    for uid, g in cand.groupby("uid"):
        per_step = {
            t: sorted(
                g[g["step"] == t][["rank", "sid", "emit"]].itertuples(index=False),
                key=lambda r: r.rank,
            )
            for t in range(1, T + 1)
        }
        if any(len(per_step[t]) == 0 for t in range(1, T + 1)):
            continue  # trajectory drops (inner-join semantics)
        best_total, best_path = None, None
        for combo in itertools.product(*[per_step[t] for t in range(1, T + 1)]):
            base = sum(c.emit for c in combo) + penalty * sum(
                1 for a, b in zip(combo, combo[1:]) if a.sid != b.sid
            )
            tie = sum(c.rank * K ** (T - t) for t, c in enumerate(combo, start=1))
            total = base * kt + tie
            if best_total is None or total < best_total:
                best_total, best_path = total, combo
        out[uid] = [
            (t, c.sid, c.emit) for t, c in enumerate(best_path, start=1)
        ]
    return out


def run_engine(spark, fixes_pdf, segs_pdf, dist, cell, k, T, penalty):
    fixes = spark.createDataFrame(fixes_pdf)
    segs = spark.createDataFrame(segs_pdf)
    cand = candidate_segments(fixes, segs, dist=dist, cell=cell, k=k)
    got = map_match(cand, n_steps=T, k=k, switch_penalty=penalty).toPandas()
    cand_pdf = cand.toPandas()
    return got, cand_pdf


def test_random_fuzz_parity(spark):
    rng = np.random.default_rng(7)
    T, K, dist, cell, penalty = 4, 3, 500, 500, 40_000
    n_users, n_segs = 12, 60
    fixes = pd.DataFrame(
        {
            "uid": np.repeat(np.arange(n_users), T),
            "step": np.tile(np.arange(1, T + 1), n_users),
            "px": rng.integers(2000, 6000, n_users * T),
            "py": rng.integers(2000, 6000, n_users * T),
        }
    )
    x1 = rng.integers(2000, 6000, n_segs)
    y1 = rng.integers(2000, 6000, n_segs)
    segs = pd.DataFrame(
        {
            "sid": np.arange(n_segs),
            "x1": x1,
            "y1": y1,
            "x2": x1 + rng.integers(-400, 400, n_segs),
            "y2": y1 + rng.integers(-400, 400, n_segs),
        }
    )
    got, cand = run_engine(spark, fixes, segs, dist, cell, K, T, penalty)
    want = brute_best_paths(cand, T, K, penalty)
    assert set(got["user_id"]) == set(want)
    for uid, path in want.items():
        rows = got[got["user_id"] == uid].sort_values("step")
        assert [tuple(r) for r in rows[["step", "sid", "emit"]].values] == [
            (t, s, e) for (t, s, e) in path
        ], f"uid {uid}"


def test_switch_penalty_keeps_weak_consistent_segment(spark):
    """Two parallel roads: road 0 is nearest at steps 1 and 3, road 1 at
    step 2 — but only by less than the switch penalty, so the decoded
    path stays on road 0 throughout."""
    T, K, penalty = 3, 2, 1_000_000
    # horizontal segments y=1000 (sid 0) and y=1060 (sid 1)
    segs = pd.DataFrame(
        {
            "sid": [0, 1],
            "x1": [1000, 1000],
            "y1": [1000, 1060],
            "x2": [9000, 9000],
            "y2": [1000, 1060],
        }
    )
    fixes = pd.DataFrame(
        {
            "uid": [1, 1, 1],
            "step": [1, 2, 3],
            "px": [2000, 3000, 4000],
            "py": [1010, 1055, 1010],  # step 2 sits nearer road 1
        }
    )
    got, _ = run_engine(spark, fixes, segs, 200, 500, K, T, penalty)
    got = got.sort_values("step")
    assert list(got["sid"]) == [0, 0, 0]
    # and with a negligible penalty the greedy nearest wins instead
    got2, _ = run_engine(spark, fixes, segs, 200, 500, K, T, 1)
    assert list(got2.sort_values("step")["sid"]) == [0, 1, 0]


def test_tie_breaks_to_lexicographic_rank_sequence(spark):
    """Equidistant segments at every step: all paths that never switch
    cost the same base, and the positional encoding must pick rank
    (0,0,...) — the smallest sid at every step."""
    T, K = 3, 2
    segs = pd.DataFrame(
        {
            "sid": [5, 2],
            "x1": [1000, 1000],
            "y1": [1000, 3000],
            "x2": [9000, 9000],
            "y2": [1000, 3000],
        }
    )
    fixes = pd.DataFrame(
        {
            "uid": [1] * T,
            "step": [1, 2, 3],
            "px": [2000, 3000, 4000],
            "py": [2000, 2000, 2000],  # exactly 1000 from both roads
        }
    )
    got, _ = run_engine(spark, fixes, segs, 1100, 1000, K, T, 10**6)
    # both non-switching paths tie on base cost; rank 0 = smallest sid (2)
    assert list(got.sort_values("step")["sid"]) == [2, 2, 2]


def test_user_missing_a_step_drops_entirely(spark):
    T, K = 3, 2
    segs = pd.DataFrame(
        {"sid": [0], "x1": [1000], "y1": [1000], "x2": [2000], "y2": [1000]}
    )
    fixes = pd.DataFrame(
        {
            "uid": [1, 1, 1, 2, 2, 2],
            "step": [1, 2, 3] * 2,
            "px": [1500, 1600, 1700, 1500, 99000, 1700],
            "py": [1100, 1100, 1100, 1100, 99000, 1100],
        }
    )
    got, _ = run_engine(spark, fixes, segs, 200, 500, K, T, 1000)
    assert set(got["user_id"]) == {1}
    assert len(got) == T


def test_emission_is_exact_floored_squared_distance(spark):
    """Perpendicular case exactness: point at (0-offset) from a diagonal
    segment — emit must equal floor(cross^2 / L) computed in python ints."""
    segs = pd.DataFrame(
        {"sid": [7], "x1": [1000], "y1": [1000], "x2": [1300], "y2": [1400]}
    )
    px, py = 1190, 1210
    fixes = pd.DataFrame({"uid": [1], "step": [1], "px": [px], "py": [py]})
    cand = candidate_segments(
        spark.createDataFrame(fixes), spark.createDataFrame(segs),
        dist=300, cell=500, k=1,
    ).toPandas()
    dx, dy, pax, pay = 300, 400, px - 1000, py - 1000
    want = (dx * pay - dy * pax) ** 2 // (dx * dx + dy * dy)
    assert list(cand["emit"]) == [want]


def test_contact_pairs_bruteforce_and_cap(spark):
    """contact_pairs (joins/trajectory.py): brute-force slot replay, the
    distinct-slot (not raw-fix) counting rule, and the hot-slot cap."""
    import pandas as pd

    from versatiles_rs_spark.joins.trajectory import contact_pairs

    rows = [
        # users 1,2 co-present in slot (lon 1.0, day 0) TWICE via repeated
        # fixes -> must count ONE contact for that slot
        (1, 1.05, 1.05, "2024-01-01 01:00:00"),
        (1, 1.05, 1.05, "2024-01-01 02:00:00"),
        (2, 1.06, 1.06, "2024-01-01 03:00:00"),
        # same pair, different day, same cell -> second contact
        (1, 1.05, 1.05, "2024-01-03 01:00:00"),
        (2, 1.06, 1.06, "2024-01-03 01:00:00"),
        # user 3 meets user 1 only once -> below min_contacts
        (3, 1.05, 1.05, "2024-01-01 04:00:00"),
        # crowd slot: users 4..9 all together twice (for the cap test)
        *[(u, 50.0, 50.0, d)
          for u in range(4, 10)
          for d in ("2024-02-01 00:00:00", "2024-02-02 00:00:00")],
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "lon", "lat", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    got = contact_pairs(df, zoom=4, bucket_seconds=86400, min_contacts=2).toPandas()
    pairs = {(int(r["user_a"]), int(r["user_b"])): int(r["n_contacts"])
             for _, r in got.iterrows()}
    assert pairs[(1, 2)] == 2
    assert (1, 3) not in pairs
    # the crowd of 6 yields all 15 pairs with 2 contacts each
    crowd = {k: v for k, v in pairs.items() if k[0] >= 4}
    assert len(crowd) == 15 and all(v == 2 for v in crowd.values())
    # cap = 5 drops the crowded slots entirely, keeping the 1-2 pair
    capped = contact_pairs(
        df, zoom=4, bucket_seconds=86400, min_contacts=2, cell_cap=5
    ).toPandas()
    cp = {(int(r["user_a"]), int(r["user_b"])) for _, r in capped.iterrows()}
    assert cp == {(1, 2)}
