"""Bucketized range (interval) join — points against intervals, no keys.

`points.ts BETWEEN intervals.start AND intervals.end` with no equi-key is a
cross join to Catalyst (BroadcastNestedLoopJoin): |P| x |I| comparisons. At
pipeline scale that is the classic silent killer. The standard fix is to
manufacture an equi-key: quantize time into buckets of width `w`, explode
each interval over the buckets it overlaps, map each point to its single
bucket, equi-join on the bucket, then apply the exact range predicate.

Cost model: shuffle rows = |P| + sum(ceil(len_i / w) + 1); each (point,
interval) candidate pair meets in EXACTLY one bucket (the point's), so no
dedup pass is needed. Pick `w` near the median interval length — smaller w
explodes intervals further, larger w admits more false candidates per
bucket. Skewed buckets (an interval storm) are plain equi-join skew: AQE
skew-join or joins/skew.py salting applies unchanged, which is the point
of reducing the problem to an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (start <= ts <= end, epoch-seconds columns). Columns from both sides
    are preserved; name collisions are the caller's to resolve upfront."""
    w = int(bucket_seconds)
    ivals = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col(start_col) / w).cast("long"),
                (F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bkt", (F.col(point_ts) / w).cast("long"))
    joined = pts.join(ivals, on="_bkt").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bkt")
