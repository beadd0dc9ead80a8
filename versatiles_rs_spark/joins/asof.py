"""Backward as-of join — "latest right row at-or-before each left row".

The canonical temporal enrichment in an event pipeline (attach the most
recent sensor reading / error / price to each observation). Spark has no
ASOF JOIN operator; the naive formulation is a range join
(l.ts >= r.ts, argmax per left row) whose candidate set is quadratic per
key. This implements it with the union-marker window trick instead:

    union(left, right tagged by a marker) ->
    one window partitionBy(keys) orderBy(ts, marker) ->
    last(value, ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT

100 TB shape: exactly ONE shuffle (hash by the join keys for the window
sort), shuffle rows are the slim projected columns, and no candidate
explosion — cost is sort-merge, not |L|x|R| per key. Skewed keys salt the
same way any window does (pre-split by time range per hot key).

Tie semantics (match DuckDB ASOF LEFT JOIN, which uses l.ts >= r.ts): a
right row at exactly the left timestamp matches; the marker sorts right
rows before left rows at equal ts. The right side must be unique per
(keys, ts) — enforce upstream (e.g. max_by a tiebreak column) or the match
at a tied timestamp is nondeterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus `prefix + c` for each right
    column in `right_cols` and `prefix + ts_col` (the matched right
    timestamp), taken from the latest right row with right.ts <= left.ts
    within the same `by` group; NULLs when no right row precedes."""
    by = list(by)
    right_cols = list(right_cols)
    carried = [ts_col] + right_cols  # right columns carried through the union
    left_only = [c for c in left.columns if c not in by + [ts_col]]

    # carried right columns travel as ONE struct so a legitimately-NULL right
    # field cannot tear column-wise to an older row under ignorenulls — the
    # fill is all-or-nothing per matched right row
    r_struct = F.struct(*[F.col(c).alias(c) for c in carried])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_u = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_u = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_u.unionByName(r_u).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *by,
        ts_col,
        *left_only,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in carried],
    )
