"""Geofence crossings (joins/crossings.py): segment-intersection parity
with a numpy reference, touching-excluded semantics, edge explosion, and
the broadcast-join plan gate."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.joins.crossings import (
    fence_crossings,
    polygon_edges,
    segments,
)


def _np_crossings(segs, edges):
    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    out = set()
    for sid, x1, y1, x2, y2 in segs:
        for fid, ei, ex1, ey1, ex2, ey2 in edges:
            d1 = orient(x1, y1, x2, y2, ex1, ey1)
            d2 = orient(x1, y1, x2, y2, ex2, ey2)
            d3 = orient(ex1, ey1, ex2, ey2, x1, y1)
            d4 = orient(ex1, ey1, ex2, ey2, x2, y2)
            if d1 * d2 < 0 and d3 * d4 < 0:
                out.add((sid, fid, ei))
    return out


def test_crossings_match_numpy_reference(spark):
    rng = np.random.default_rng(13)
    n = 60
    pts = pd.DataFrame(
        {
            "uid": np.repeat(np.arange(6), 10),
            "ord": np.tile(np.arange(10), 6),
            "lon": rng.uniform(-4, 4, 6 * 10),
            "lat": rng.uniform(-4, 4, 6 * 10),
        }
    )
    df = spark.createDataFrame(pts, schema="uid long, ord long, lon double, lat double")
    segs = segments(df, "uid", "ord")
    fences = spark.createDataFrame(
        pd.DataFrame(
            [(0, [-1.0, 1.0, 1.0, -1.0], [-1.0, -1.0, 1.0, 1.0]),
             (1, [2.0, 3.5, 2.75], [0.0, 0.0, 2.0])],
            columns=["fence_id", "xs", "ys"],
        ),
        schema="fence_id int, xs array<double>, ys array<double>",
    )
    edges = polygon_edges(fences)
    assert edges.count() == 4 + 3  # ring closure included
    got = {
        (r.uid, r.ord, r.fence_id, r.edge_idx)
        for r in fence_crossings(segs, edges).collect()
    }
    seg_rows = [((r.uid, r.ord), r.x1, r.y1, r.x2, r.y2) for r in segs.collect()]
    edge_rows = [(r.fence_id, r.edge_idx, r.ex1, r.ey1, r.ex2, r.ey2)
                 for r in edges.collect()]
    ref = _np_crossings(seg_rows, edge_rows)
    got_ids = {((u, o), f, e) for (u, o, f, e) in got}
    assert got_ids == ref and len(ref) > 0


def test_touching_endpoint_is_not_a_crossing(spark):
    segs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, 1, 0.0, -1.0, 0.0, 0.0),   # ends ON the edge y=0: touch
                (1, 1, 0.0, -1.0, 0.0, 1.0),   # passes through: crossing
                (2, 1, 0.5, 0.5, 1.5, 1.5),    # entirely off the edge
            ],
            columns=["uid", "ord", "x1", "y1", "x2", "y2"],
        ),
        schema="uid long, ord long, x1 double, y1 double, x2 double, y2 double",
    )
    edges = spark.createDataFrame(
        pd.DataFrame([(0, 1, -1.0, 0.0, 1.0, 0.0)],
                     columns=["fence_id", "edge_idx", "ex1", "ey1", "ex2", "ey2"]),
        schema="fence_id int, edge_idx int, ex1 double, ey1 double, ex2 double, ey2 double",
    )
    got = [r.uid for r in fence_crossings(segs, edges).collect()]
    assert got == [1]


def test_crossings_plan_broadcast_edges_one_window_shuffle(spark, sf_dir):
    from versatiles_rs_spark.queries import REGISTRY

    df = REGISTRY["fence_crossings"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the lag window only
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# segment_intersections: large x large cell-bucketed layer join
# ---------------------------------------------------------------------------

def _seg_brute(A, B):
    """Exact integer proper-intersection over all pairs."""
    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    out = set()
    for aid, ax1, ay1, ax2, ay2 in A:
        for bid, bx1, by1, bx2, by2 in B:
            d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
            d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
            if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                    and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
                out.add((aid, bid))
    return out


def _seg_df(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, x1 long, y1 long, x2 long, y2 long"
    )


def test_segment_intersections_match_bruteforce(spark):
    import numpy as np
    from versatiles_rs_spark.joins.crossings import segment_intersections

    rng = np.random.default_rng(41)

    def mk(n, seed_off):
        rows = []
        for i in range(n):
            x, y = int(rng.integers(0, 300)), int(rng.integers(0, 300))
            dx, dy = int(rng.integers(-60, 61)), int(rng.integers(-60, 61))
            rows.append((i + seed_off, x, y, max(x + dx, 0), max(y + dy, 0)))
        return rows

    A, B = mk(60, 0), mk(60, 1000)
    got = {
        (r["a_id"], r["b_id"])
        for r in segment_intersections(
            _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=50
        ).collect()
    }
    assert got == _seg_brute(A, B)


def test_segment_intersections_once_per_pair_across_cells(spark):
    """A pair crossing inside a bbox that spans MANY cells must appear
    exactly once (canonical-cell dedup), and touches don't count."""
    from versatiles_rs_spark.joins.crossings import segment_intersections

    A = [(1, 0, 10, 100, 10)]           # long horizontal
    B = [(2, 50, 0, 50, 20),            # proper crossing
         (3, 0, 10, 0, 30),             # touches A's endpoint -> not counted
         (4, 60, 10, 90, 10)]           # collinear overlap -> d == 0, not counted
    rows = segment_intersections(
        _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=8
    ).collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [(1, 2)]


def test_segment_intersections_plan_equi_join_no_broadcast(spark):
    from versatiles_rs_spark.joins.crossings import segment_intersections

    A = [(1, 0, 0, 10, 10)]
    B = [(2, 0, 10, 10, 0)]
    plan = segment_intersections(
        _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# points_near_segments: ST_DWithin point x segment layer join
# ---------------------------------------------------------------------------

def _near_brute(P, S, dist):
    out = set()
    d2 = dist * dist
    for pid, px, py in P:
        for sid, x1, y1, x2, y2 in S:
            dx, dy = x2 - x1, y2 - y1
            pax, pay = px - x1, py - y1
            pbx, pby = px - x2, py - y2
            L = dx * dx + dy * dy
            t = pax * dx + pay * dy
            if L > 0 and 0 <= t <= L:
                cross = dx * pay - dy * pax
                ok = cross * cross <= d2 * L
            else:
                ok = min(pax * pax + pay * pay, pbx * pbx + pby * pby) <= d2
            if ok:
                out.add((pid, sid))
    return out


def test_points_near_segments_match_bruteforce(spark):
    import numpy as np
    from versatiles_rs_spark.joins.crossings import points_near_segments

    rng = np.random.default_rng(53)
    P = [(i, int(rng.integers(100, 500)), int(rng.integers(100, 500)))
         for i in range(80)]
    S = []
    for i in range(40):
        x, y = int(rng.integers(100, 500)), int(rng.integers(100, 500))
        S.append((i, x, y, x + int(rng.integers(-60, 61)),
                  y + int(rng.integers(-60, 61))))
    pdf = spark.createDataFrame(P, "pid long, px long, py long")
    sdf = spark.createDataFrame(S, "sid long, x1 long, y1 long, x2 long, y2 long")
    got = {
        (r["pid"], r["sid"])
        for r in points_near_segments(pdf, sdf, dist=30, cell=40).collect()
    }
    assert got == _near_brute(P, S, 30)


def test_points_near_segments_cases(spark):
    from versatiles_rs_spark.joins.crossings import points_near_segments

    S = [(1, 100, 100, 200, 100),   # horizontal segment
         (2, 300, 300, 300, 300)]   # degenerate (point) segment
    P = [
        (1, 150, 110),  # perpendicular case, d = 10 <= 10
        (2, 150, 111),  # perpendicular, d = 11 > 10
        (3, 210, 100),  # past the endpoint, d = 10 (endpoint case)
        (4, 208, 106),  # past the endpoint, d = 10 exactly (6-8-10)
        (5, 305, 300),  # degenerate segment, d = 5
        (6, 311, 300),  # degenerate, d = 11 > 10
    ]
    pdf = spark.createDataFrame(P, "pid long, px long, py long")
    sdf = spark.createDataFrame(S, "sid long, x1 long, y1 long, x2 long, y2 long")
    got = sorted(
        (r["pid"], r["sid"])
        for r in points_near_segments(pdf, sdf, dist=10, cell=64).collect()
    )
    assert got == [(1, 1), (3, 1), (4, 1), (5, 2)]
