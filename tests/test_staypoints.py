"""Stay-point detection (functions/sessions.py::staypoints): planted
stop/move trajectories, dwell/min_fixes thresholds, tie-break and
sequence determinism, brute-force parity on a synthesized trajectory."""

import datetime

from pyspark.sql import functions as F

from versatiles_rs_spark.functions.sessions import staypoints
from versatiles_rs_spark.tile_math import lonlat_to_tile

T0 = datetime.datetime(2024, 5, 1, 8, 0, 0)


def _mk(spark, rows):
    """rows: (event_id, user_id, minutes_offset, lon, lat)"""
    data = [
        (eid, uid, T0 + datetime.timedelta(minutes=m), float(lon), float(lat))
        for eid, uid, m, lon, lat in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )


def _stops(df, **kw):
    return [
        (
            r["user_id"], r["stay_seq"], r["cx"], r["cy"],
            r["n_fixes"], r["dwell_us"],
        )
        for r in staypoints(df, by=("user_id",), **kw)
        .orderBy("user_id", "stay_seq")
        .collect()
    ]


def test_planted_stops_and_moves(spark):
    # user 1: 3 fixes parked west (stop), 1 transit fix, 4 fixes parked
    # east (stop). user 2: alternates cells every fix -> no stop.
    rows = [
        (1, 1, 0, -90.0, 0.0),
        (2, 1, 5, -90.0, 0.0),
        (3, 1, 10, -90.0, 0.0),
        (4, 1, 15, 0.0, 40.0),
        (5, 1, 20, 90.0, 0.0),
        (6, 1, 25, 90.0, 0.0),
        (7, 1, 30, 90.0, 0.0),
        (8, 1, 35, 90.0, 0.0),
        (9, 2, 0, -90.0, 0.0),
        (10, 2, 5, 90.0, 0.0),
        (11, 2, 10, -90.0, 0.0),
    ]
    got = _stops(_mk(spark, rows), zoom=3, min_fixes=3)
    wx, wy = lonlat_to_tile(-90.0, 0.0, 3)
    ex, ey = lonlat_to_tile(90.0, 0.0, 3)
    assert got == [
        (1, 1, wx, wy, 3, 10 * 60_000_000),
        (1, 2, ex, ey, 4, 15 * 60_000_000),
    ]


def test_min_dwell_filters_short_stops(spark):
    # 3 fixes spanning only 2 minutes: passes min_fixes but not a
    # 5-minute dwell floor.
    rows = [(1, 1, 0, 10.0, 10.0), (2, 1, 1, 10.0, 10.0), (3, 1, 2, 10.0, 10.0)]
    assert _stops(_mk(spark, rows), zoom=3, min_fixes=3) != []
    assert (
        _stops(_mk(spark, rows), zoom=3, min_fixes=3, min_dwell_us=5 * 60_000_000)
        == []
    )


def test_revisit_is_a_new_stop(spark):
    # stop A, move away, return to the SAME cell: two distinct stops with
    # increasing stay_seq, not one merged run.
    rows = [
        (1, 1, 0, -90.0, 0.0),
        (2, 1, 5, -90.0, 0.0),
        (3, 1, 10, -90.0, 0.0),
        (4, 1, 15, 90.0, 0.0),
        (5, 1, 20, -90.0, 0.0),
        (6, 1, 25, -90.0, 0.0),
        (7, 1, 30, -90.0, 0.0),
    ]
    got = _stops(_mk(spark, rows), zoom=3, min_fixes=3)
    wx, wy = lonlat_to_tile(-90.0, 0.0, 3)
    assert [(g[0], g[1], g[2], g[3], g[4]) for g in got] == [
        (1, 1, wx, wy, 3),
        (1, 2, wx, wy, 3),
    ]


def test_tied_timestamps_resolve_by_event_id(spark):
    # 3 fixes at the identical timestamp in one cell: ordering falls back
    # to event_id, the run still forms, dwell is 0 (passes min_dwell 0).
    rows = [(3, 9, 0, 10.0, 10.0), (1, 9, 0, 10.0, 10.0), (2, 9, 0, 10.0, 10.0)]
    got = _stops(_mk(spark, rows), zoom=3, min_fixes=3)
    assert len(got) == 1 and got[0][4] == 3 and got[0][5] == 0


def test_bruteforce_parity(spark):
    # deterministic pseudo-random walk with planted dwells vs a pure
    # Python replay of the run semantics
    def lcg(s):
        return (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)

    rows, s = [], 42
    for uid in range(1, 6):
        t = 0
        for i in range(40):
            s = lcg(s)
            # dwell in a cell for 1-4 fixes
            lon = -170.0 + (s >> 8) % 340
            lat = -80.0 + (s >> 24) % 160
            for k in range((s >> 40) % 4 + 1):
                rows.append((uid * 1000 + len(rows), uid, t, lon, lat))
                t += 7
    df = _mk(spark, rows)
    got = _stops(df, zoom=6, min_fixes=2)

    # brute force
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, m, lon, lat in rows:
        by_user[uid].append((m * 60_000_000, eid, lon, lat))
    want = []
    for uid in sorted(by_user):
        fixes = sorted(by_user[uid])
        runs, cur = [], None
        for us, eid, lon, lat in fixes:
            c = lonlat_to_tile(lon, lat, 6)
            if cur and cur[0] == c:
                cur[1].append(us)
            else:
                cur = (c, [us])
                runs.append(cur)
        seq = 0
        for (cx, cy), uss in runs:
            if len(uss) >= 2:
                seq += 1
                want.append((uid, seq, cx, cy, len(uss), uss[-1] - uss[0]))
    assert got == want


def test_radius_of_gyration_bruteforce(spark):
    # exact parallel-axis moments vs a pure python replay, including the
    # single-fix (rg=0) and stationary-user edges
    from versatiles_rs_spark.functions.sessions import radius_of_gyration

    rows = [
        (1, 1, 0, -90.0, 0.0),
        (2, 1, 5, 90.0, 0.0),
        (3, 1, 10, 0.0, 40.0),
        (4, 2, 0, 10.0, 10.0),   # stationary: rg = 0
        (5, 2, 5, 10.0, 10.0),
        (6, 3, 0, -170.0, -70.0),  # single fix: rg = 0
    ]
    df = _mk(spark, rows)
    got = {
        r["user_id"]: (r["n_fixes"], r["mx_milli"], r["my_milli"], r["rg2_milli"])
        for r in radius_of_gyration(df, by=("user_id",), zoom=5).collect()
    }
    from collections import defaultdict

    pts = defaultdict(list)
    for _, uid, _, lon, lat in rows:
        cx, cy = lonlat_to_tile(lon, lat, 5)
        pts[uid].append((int(cx), int(cy)))
    want = {}
    for uid, cs in pts.items():
        n = len(cs)
        sx = sum(c[0] for c in cs)
        sy = sum(c[1] for c in cs)
        ssq = sum(c[0] ** 2 + c[1] ** 2 for c in cs)
        num = n * ssq - sx * sx - sy * sy
        want[uid] = (n, sx * 1000 // n, sy * 1000 // n, (num // n) * 1000 // n)
    assert got == want
    assert got[2][3] == 0 and got[3][3] == 0


def test_jump_length_histogram_bruteforce(spark):
    # power-of-two binning incl. the d2=0 bin and exact power boundaries
    # (d2=1,2,4) vs a python replay on the staypoints lcg walk
    from versatiles_rs_spark.functions.sessions import jump_length_histogram

    def lcg(s):
        return (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)

    rows, s = [], 7
    for uid in range(1, 5):
        t = 0
        for i in range(60):
            s = lcg(s)
            lon = -170.0 + (s >> 8) % 340
            lat = -80.0 + (s >> 24) % 160
            rows.append((uid * 1000 + i, uid, t, lon, lat))
            t += 3
        # planted exact-power displacements: same cell (d2=0) then a
        # +1-cell lon step at zoom 6 (cell width 360/64 = 5.625 deg)
        rows.append((uid * 1000 + 900, uid, t, 0.1, 0.1))
        rows.append((uid * 1000 + 901, uid, t + 3, 0.1, 0.1))      # d2=0
        rows.append((uid * 1000 + 902, uid, t + 6, 5.725, 0.1))    # d2=1
    df = _mk(spark, rows)
    got = {
        r["jump_bin"]: (r["n_jumps"], r["n_entities"], r["min_d2"], r["max_d2"])
        for r in jump_length_histogram(df, by=("user_id",), zoom=6).collect()
    }

    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, m, lon, lat in rows:
        by_user[uid].append((m * 60_000_000, eid, lon, lat))
    bins = defaultdict(list)
    for uid, fixes in by_user.items():
        fixes.sort()
        cells = [tuple(int(v) for v in lonlat_to_tile(lon, lat, 6))
                 for _, _, lon, lat in fixes]
        for a, b in zip(cells, cells[1:]):
            d2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
            bins[0 if d2 == 0 else d2.bit_length()].append((uid, d2))
    want = {
        b: (len(v), len({u for u, _ in v}), min(d for _, d in v),
            max(d for _, d in v))
        for b, v in bins.items()
    }
    assert got == want
    assert 0 in got and 1 in got  # planted d2=0 and d2=1 jumps present


def test_location_regularity_bruteforce(spark):
    # top-location share incl. the tie case (two cells with equal top
    # counts -> smallest (cx, cy) wins) vs a python replay
    from versatiles_rs_spark.functions.sessions import location_regularity

    rows = [
        # user 1: 3 fixes west, 2 east -> west anchor, share 600000 ppm
        (1, 1, 0, -90.0, 0.0),
        (2, 1, 5, -90.0, 0.0),
        (3, 1, 10, -90.0, 0.0),
        (4, 1, 15, 90.0, 0.0),
        (5, 1, 20, 90.0, 0.0),
        # user 2: exact 2-2 tie between east and west cells
        (6, 2, 0, -90.0, 0.0),
        (7, 2, 5, -90.0, 0.0),
        (8, 2, 10, 90.0, 0.0),
        (9, 2, 15, 90.0, 0.0),
    ]
    df = _mk(spark, rows)
    got = {
        r["user_id"]: (
            r["n_fixes"], r["n_cells"], r["top_cx"], r["top_cy"],
            r["top_n"], r["top_share_ppm"],
        )
        for r in location_regularity(df, by=("user_id",), zoom=3).collect()
    }
    wx, wy = (int(v) for v in lonlat_to_tile(-90.0, 0.0, 3))
    ex, ey = (int(v) for v in lonlat_to_tile(90.0, 0.0, 3))
    top2 = min((wx, wy), (ex, ey))  # tie -> smallest (cx, cy)
    assert got[1] == (5, 2, wx, wy, 3, 600000)
    assert got[2] == (4, 2, top2[0], top2[1], 2, 500000)


def test_visitation_gini_bruteforce(spark):
    # rank closed form vs the O(k^2) pairwise definition
    # G = sum_ij |n_i - n_j| / (2 k sum n), exact ppm floor
    from versatiles_rs_spark.functions.sessions import visitation_gini

    rows = [
        # user 1: uniform 2-2-2 over three cells -> Gini 0... wait,
        # rank form: (2*(1*2+2*2+3*2) - 4*6)/(3*6) = (24-24)/18 = 0
        (1, 1, 0, -150.0, 0.0), (2, 1, 5, -150.0, 0.0),
        (3, 1, 10, 0.0, 40.0), (4, 1, 15, 0.0, 40.0),
        (5, 1, 20, 150.0, 0.0), (6, 1, 25, 150.0, 0.0),
        # user 2: 1-1-6 concentration
        (7, 2, 0, -150.0, 0.0),
        (8, 2, 5, 0.0, 40.0),
        (9, 2, 10, 150.0, 0.0), (10, 2, 15, 150.0, 0.0),
        (11, 2, 20, 150.0, 0.0), (12, 2, 25, 150.0, 0.0),
        (13, 2, 30, 150.0, 0.0), (14, 2, 35, 150.0, 0.0),
    ]
    df = _mk(spark, rows)
    got = {
        r["user_id"]: (r["n_cells"], r["n_fixes"], r["gini_ppm"])
        for r in visitation_gini(df, by=("user_id",), zoom=3).collect()
    }
    from collections import Counter, defaultdict

    cells = defaultdict(Counter)
    for _, uid, _, lon, lat in rows:
        cells[uid][tuple(int(v) for v in lonlat_to_tile(lon, lat, 3))] += 1
    for uid, cnt in cells.items():
        ns = list(cnt.values())
        k, N = len(ns), sum(ns)
        num = sum(abs(a - b) for a in ns for b in ns)  # = 2*(2*sum i*n - (k+1)N)
        want_ppm = (num // 2 * 1000000) // (k * N) if num % 2 == 0 else None
        # pairwise sum is always even; cross-check the rank form directly
        srt = sorted(ns)
        rank_num = 2 * sum((i + 1) * n for i, n in enumerate(srt)) - (k + 1) * N
        assert num == 2 * rank_num
        assert got[uid] == (k, N, rank_num * 1000000 // (k * N))
    assert got[1][2] == 0  # uniform -> 0
    assert got[2][2] > 300000  # concentrated -> high
