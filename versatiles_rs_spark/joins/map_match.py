"""HMM map matching: snap GPS fixes to a road-segment layer (windowed Viterbi).

The canonical mobility operator (Newson & Krumm 2009, "Hidden Markov Map
Matching Through Noise and Sparseness"; OSRM `match`, Valhalla Meili):
each GPS fix emits a set of candidate road segments, a hidden-state chain
picks the segment sequence minimizing emission cost (how far the fix sits
from the segment) plus transition cost (route discontinuity, here the
classic simplification: a flat penalty per segment switch), and the MAP
path is decoded per trajectory.

Spark-first shape — the whole Viterbi is ONE static relational DAG:

* Real deployments window long traces (OSRM/Valhalla match on bounded
  windows) so the step count T is a small plan-time constant.  That turns
  the DP into T-1 UNROLLED slim self-joins keyed by the trajectory id —
  Catalyst plans them as a single job (no per-round driver loop, no
  checkpoint barriers — the iterative-relational-overhead lesson does not
  apply because nothing is iterative at run time), and every exchange is
  keyed by the same column so shuffle reuse applies.
* Candidate generation is the expanded-bbox cell equi-join of
  joins/crossings.py::points_near_segments (segments fan out to the grid
  cells of their bbox grown by the search radius; a fix lives in exactly
  one cell, so each pair meets once).  Emission cost is the EXACT floored
  squared point-segment distance — int64 rational arithmetic, no floats
  (same CASE as crossings.py, with `div` on non-negative operands so
  Spark `div` == DuckDB `//`).
* Ties: Viterbi needs a unique optimum for cross-engine determinism.  The
  per-step candidate rank r_t (row_number over (emit, sid), 0-based,
  < K) is folded into the cost positionally:
      total = (sum emit + switches * penalty) * K^T  +  sum r_t * K^(T-t)
  Distinct candidate paths get distinct rank sequences, so totals are
  UNIQUE per trajectory and min() is the lexicographically-first optimum
  in both engines.  The tie part doubles as the DECODER: the winning rank
  sequence is recovered from `total % K^T` by pure base-K arithmetic and
  joined back to the (cached) candidate relation — no path arrays ride
  the DP shuffles.
* 100 TB shape: candidates are (id, step, rank, sid, emit) longs — fixes
  and segment geometry never enter the DP; the DP state is K rows per
  trajectory; every join/window is keyed by the trajectory id.  Skewed
  trajectory ids cannot occur (state is exactly <= K rows per id by
  construction).

Everything is JVM column algebra — zero Python in the plan (plan-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_segments(
    fixes: DataFrame,
    segs: DataFrame,
    dist: int,
    cell: int,
    k: int,
) -> DataFrame:
    """Top-`k` candidate segments per GPS fix with exact emission costs.

    `fixes`: (uid, step, px, py) — integer, non-negative coordinates
    (shift like joins/crossings.py so bucketing stays in div == //
    territory).  `segs`: (sid, x1, y1, x2, y2), integer.

    Returns (uid, step, rank, sid, emit) where emit = floor(d^2) of the
    exact point-segment distance and rank is the 0-based position under
    (emit ASC, sid ASC).  A fix is a candidate of a segment iff
    emit <= dist^2 (the FLOORED distance defines candidacy, so the cell
    fan-out expands by dist+1: floor(d^2) <= dist^2 admits true distances
    up to sqrt(dist^2 + 1) < dist + 1)."""
    pad = int(dist) + 1
    p = fixes.select(
        "uid", "step",
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        F.expr(f"px div {cell}").alias("cx"),
        F.expr(f"py div {cell}").alias("cy"),
    )
    s = segs.select(
        "sid",
        F.col("x1").cast("long").alias("sx1"), F.col("y1").cast("long").alias("sy1"),
        F.col("x2").cast("long").alias("sx2"), F.col("y2").cast("long").alias("sy2"),
        F.expr(f"(least(x1, x2) - {pad}) div {cell}").alias("cx0"),
        F.expr(f"(greatest(x1, x2) + {pad}) div {cell}").alias("cx1"),
        F.expr(f"(least(y1, y2) - {pad}) div {cell}").alias("cy0"),
        F.expr(f"(greatest(y1, y2) + {pad}) div {cell}").alias("cy1"),
    )
    se = s.select(
        "sid", "sx1", "sy1", "sx2", "sy2",
        F.explode(F.sequence("cx0", "cx1")).alias("cx"), "cy0", "cy1",
    ).select(
        "sid", "sx1", "sy1", "sx2", "sy2", "cx",
        F.explode(F.sequence("cy0", "cy1")).alias("cy"),
    )
    pairs = p.join(se, ["cx", "cy"]).select(
        "uid", "step", "sid",
        (F.col("sx2") - F.col("sx1")).alias("dx"),
        (F.col("sy2") - F.col("sy1")).alias("dy"),
        (F.col("px") - F.col("sx1")).alias("pax"),
        (F.col("py") - F.col("sy1")).alias("pay"),
        (F.col("px") - F.col("sx2")).alias("pbx"),
        (F.col("py") - F.col("sy2")).alias("pby"),
    )
    emit = F.expr(
        "CASE WHEN dx * dx + dy * dy > 0"
        "      AND pax * dx + pay * dy >= 0"
        "      AND pax * dx + pay * dy <= dx * dx + dy * dy"
        " THEN ((dx * pay - dy * pax) * (dx * pay - dy * pax))"
        "      div (dx * dx + dy * dy)"
        " ELSE least(pax * pax + pay * pay, pbx * pbx + pby * pby) END"
    )
    d2 = int(dist) * int(dist)
    cand = (
        pairs.select("uid", "step", "sid", emit.alias("emit"))
        .filter(F.col("emit") <= F.lit(d2))
    )
    w = Window.partitionBy("uid", "step").orderBy("emit", "sid")
    return (
        cand.withColumn("rank", F.row_number().over(w) - 1)
        .filter(F.col("rank") < F.lit(int(k)))
    )


def map_match(
    cand: DataFrame,
    n_steps: int,
    k: int,
    switch_penalty: int,
) -> DataFrame:
    """Viterbi-decode the candidate relation into the MAP segment path.

    `cand`: (uid, step, rank, sid, emit) from candidate_segments, steps
    1..n_steps.  Trajectories missing candidates at ANY step drop (the
    inner joins of the DP — identical semantics in the SQL oracle).

    Returns (user_id, step, sid, emit): one row per (trajectory, step) of
    the unique minimum-cost path (uniqueness via the positional rank
    encoding — module docstring).  int64 bound: callers keep
    (T * max_emit + (T-1) * switch_penalty) * k^T < 2^63."""
    T, K = int(n_steps), int(k)
    kt = K**T
    # the DP references the candidate relation T times and the decoder
    # joins it once more — materialize it once (signature-table rule)
    cand = cand.cache()

    def step_df(t: int) -> DataFrame:
        return cand.filter(F.col("step") == F.lit(t))

    dp = step_df(1).select(
        "uid",
        "sid",
        (F.col("emit") * F.lit(kt) + F.col("rank") * F.lit(K ** (T - 1))).alias("cost"),
    )
    for t in range(2, T + 1):
        c = step_df(t).select(
            F.col("uid").alias("c_uid"),
            F.col("sid").alias("c_sid"),
            F.col("rank").alias("c_rank"),
            F.col("emit").alias("c_emit"),
        )
        j = dp.join(c, dp["uid"] == c["c_uid"])
        cost = (
            F.col("cost")
            + (
                F.col("c_emit")
                + F.when(F.col("c_sid") != F.col("sid"), F.lit(int(switch_penalty))).otherwise(F.lit(0))
            )
            * F.lit(kt)
            + F.col("c_rank") * F.lit(K ** (T - t))
        )
        scored = j.select("uid", F.col("c_sid").alias("sid"), cost.alias("cost"))
        # totals are unique (rank encoding), so min() IS the deterministic
        # argbest — and groupBy.min gets a map-side partial combine that a
        # row_number window would not
        dp = scored.groupBy("uid", "sid").agg(F.min("cost").alias("cost"))
    best = dp.groupBy("uid").agg(F.min("cost").alias("total"))
    # decode the winning rank sequence from total % K^T (base-K digits,
    # most-significant digit = step 1), then join the candidates back
    decoded = best.select(
        "uid",
        F.explode(F.sequence(F.lit(1), F.lit(T))).alias("step"),
        (F.col("total") % F.lit(kt)).alias("tie"),
    ).select(
        "uid",
        "step",
        (
            F.expr(f"tie div element_at({_array_sql(K, T)}, step)") % F.lit(K)
        ).alias("rank"),
    )
    out = decoded.join(cand, ["uid", "step", "rank"])
    return out.select(
        F.col("uid").alias("user_id"), "step", "sid", "emit"
    )


def _array_sql(k: int, t: int) -> str:
    """SQL literal array of the positional weights K^(T-1) .. K^0."""
    return "array(" + ", ".join(str(k ** (t - i)) for i in range(1, t + 1)) + ")"
