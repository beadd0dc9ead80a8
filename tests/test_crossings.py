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
