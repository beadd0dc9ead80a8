"""Gap-based sessionization, deterministic hash sampling, and the
trajectory/mobility metric family (od_flows, staypoints,
radius_of_gyration, jump_length_histogram, location_regularity,
visitation_gini).

Staples of an event/training-data pipeline that the reference (a tile
toolbox) has no analog for, expressed as pure window/column plans —
every metric works on the integer web-mercator cell lattice so the SQL
oracle replays it bit-exactly, and every exchange carries longs only:

- sessionize: assign a session sequence number per entity, starting a new
  session whenever the gap to the previous event exceeds a threshold. ONE
  shuffle (window partitionBy the entity key); the lag + running-sum
  composition is the textbook formulation and stays entirely in
  WholeStageCodegen.

- deterministic_sample / stratified_sample: hash-gate rows by key so the
  sample is stable across runs, executors, and engines (no rand(), per the
  repo determinism rule). The hash is a 31-bit affine multiplicative hash
  chosen to be replayable bit-exactly in ANSI SQL with no 64-bit overflow —
  sampling decisions can therefore be audited by any SQL engine. Not a
  cryptographic hash: keys are ids, the goal is stable stratified decimation,
  not adversarial resistance.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SAMPLE_MULT = 2654435761  # Knuth golden-ratio multiplier (fits int64 math)
_SAMPLE_ADD = 1013904223
_SAMPLE_MOD = 2**31


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
    out: str = "session_seq",
) -> DataFrame:
    """Add a 1-based session sequence number per `by` group: a new session
    starts when the gap to the previous event exceeds `gap_seconds`."""
    by = list(by)
    # work in epoch MICROseconds for timestamps: the window order is then
    # total up to byte-identical timestamps (which cannot straddle a session
    # boundary — their gap is 0), so the assignment is deterministic across
    # engines; truncating to seconds first would let sub-second orderings
    # diverge at boundaries
    dtype = dict(df.dtypes)[ts_col]
    if dtype in ("timestamp", "timestamp_ntz"):
        kind = "TIMESTAMP_NTZ" if dtype == "timestamp_ntz" else "TIMESTAMP"
        tval = F.expr(
            f"timestampdiff(MICROSECOND, {kind} '1970-01-01 00:00:00', {ts_col})"
        )
        gap = int(gap_seconds) * 1_000_000
    else:
        tval = F.col(ts_col).cast("long")
        gap = int(gap_seconds)
    df = df.withColumn("_ts_v", tval)
    w = Window.partitionBy(*by).orderBy(F.col("_ts_v").asc())
    prev = F.lag("_ts_v").over(w)
    is_new = F.when(prev.isNull() | (F.col("_ts_v") - prev > gap), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(is_new).over(run)).drop("_ts_v")


def sample_gate(key, fraction: float):
    """Boolean column: keep `key` with probability ~`fraction`, decided by a
    31-bit affine hash of the key (deterministic, SQL-replayable:
    ((key * 2654435761 + 1013904223) % 2^31) < fraction * 2^31)."""
    h = F.pmod(key.cast("long") * F.lit(_SAMPLE_MULT) + F.lit(_SAMPLE_ADD), F.lit(_SAMPLE_MOD))
    return h < F.lit(int(fraction * _SAMPLE_MOD))


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Stable `fraction`-sample keyed on `key_col` (same rows every run)."""
    return df.filter(sample_gate(F.col(key_col), fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing of a
    corpus): rows in stratum s survive with fractions[s], everything else
    with `default_fraction`. The gate is a plain CASE over hash(key) —
    fully pushed into the scan, no shuffle, no rand()."""
    gate = None
    for value, frac in fractions.items():
        cond = (F.col(stratum_col) == value) & sample_gate(F.col(key_col), frac)
        gate = cond if gate is None else (gate | cond)
    rest = ~F.col(stratum_col).isin(list(fractions)) & sample_gate(
        F.col(key_col), default_fraction
    )
    return df.filter(gate | rest if gate is not None else rest)


def od_flows(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    id_col: str = "event_id",
    by: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
    zoom: int = 6,
):
    """Origin-destination flow matrix — the classic mobility-analytics
    aggregate: sessionize each user's event stream (gap rule), take the
    FIRST and LAST event's tile cell per session as the trip's origin and
    destination, and count trips and distinct users per (origin, dest)
    cell pair. Self-flows (origin == destination) are kept — they are the
    'stayed in the area' diagonal a flow matrix needs.

    Determinism: rows within a session are ordered by (epoch micros,
    id_col), so equal-timestamp endpoints resolve identically in Spark
    and the SQL oracle. All outputs are integer counts.

    Plan shape: sessionize's per-user window, one more window keyed
    (user, session) for the endpoint row_numbers, a self-join of the slim
    endpoint rows on (user, session), and the final flow groupBy — every
    exchange carries longs only; no payload, no text.
    """
    from ..udfs import tile_x_expr, tile_y_expr

    sess = sessionize(df, ts_col=ts_col, by=by, gap_seconds=gap_seconds)
    dtype = dict(df.dtypes)[ts_col]
    if dtype in ("timestamp", "timestamp_ntz"):
        kind = "TIMESTAMP_NTZ" if dtype == "timestamp_ntz" else "TIMESTAMP"
        us = F.expr(
            f"timestampdiff(MICROSECOND, {kind} '1970-01-01 00:00:00', {ts_col})"
        )
    else:
        us = F.col(ts_col).cast("long")
    by = list(by)
    slim = sess.select(
        *by,
        "session_seq",
        us.alias("_us"),
        F.col(id_col).alias("_id"),
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("_cx"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("_cy"),
    )
    w = Window.partitionBy(*by, "session_seq").orderBy(
        F.col("_us").asc(), F.col("_id").asc()
    )
    ranked = slim.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_rx", F.row_number().over(
            Window.partitionBy(*by, "session_seq").orderBy(
                F.col("_us").desc(), F.col("_id").desc()
            )
        )
    )
    origin = ranked.filter(F.col("_rn") == 1).select(
        *by, "session_seq", F.col("_cx").alias("o_x"), F.col("_cy").alias("o_y")
    )
    dest = ranked.filter(F.col("_rx") == 1).select(
        *by, "session_seq", F.col("_cx").alias("d_x"), F.col("_cy").alias("d_y")
    )
    trips = origin.join(dest, on=by + ["session_seq"])
    return (
        trips.groupBy("o_x", "o_y", "d_x", "d_y")
        .agg(
            F.count("*").alias("n_trips"),
            F.countDistinct(*by).cast("long").alias("n_users"),
        )
    )


def staypoints(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    id_col: str = "event_id",
    by: Sequence[str] = ("user_id",),
    zoom: int = 8,
    min_fixes: int = 3,
    min_dwell_us: int = 0,
):
    """Stay-point (stop/move) segmentation of entity trajectories — the
    Li et al. (2008) stop-detection staple of mobility pipelines,
    collapsed to its cheapest deterministic form: a STOP is a maximal run
    of consecutive fixes inside the SAME web-mercator tile cell at `zoom`
    (cell side bounds the roam radius, replacing the float
    distance-to-anchor test with an integer cell equality the SQL oracle
    replays bit-exactly) lasting >= min_fixes fixes and >= min_dwell_us
    microseconds.

    Output per qualifying stop: by-keys, stay_seq (1-based among the
    entity's qualifying stops, in time order), cx, cy, n_fixes, start_us,
    dwell_us (exact integer micros).

    Determinism: fixes are ordered by (epoch micros, id_col) — the same
    total order contract as od_flows.  Plan shape: ONE shuffle (the
    per-entity window; the run groupBy and the stay_seq window reuse the
    same partitioning), every exchanged column a long.  At 10^12 fixes
    the per-entity history is bounded (device streams), so no key is
    skewed beyond a device's own volume — same scale story as
    sessionize."""
    from ..udfs import tile_x_expr, tile_y_expr

    by = list(by)
    dtype = dict(df.dtypes)[ts_col]
    if dtype in ("timestamp", "timestamp_ntz"):
        kind = "TIMESTAMP_NTZ" if dtype == "timestamp_ntz" else "TIMESTAMP"
        us = F.expr(
            f"timestampdiff(MICROSECOND, {kind} '1970-01-01 00:00:00', {ts_col})"
        )
    else:
        us = F.col(ts_col).cast("long")
    slim = df.select(
        *by,
        us.alias("_us"),
        F.col(id_col).cast("long").alias("_id"),
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("cx"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("cy"),
    )
    w = Window.partitionBy(*by).orderBy(F.col("_us").asc(), F.col("_id").asc())
    run = Window.partitionBy(*by).orderBy(F.col("_us").asc(), F.col("_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    moved = (
        F.lag("cx").over(w).isNull()
        | (F.col("cx") != F.lag("cx").over(w))
        | (F.col("cy") != F.lag("cy").over(w))
    )
    runs = slim.withColumn("_run", F.sum(F.when(moved, 1).otherwise(0)).over(run))
    stops = (
        runs.groupBy(*by, "_run", "cx", "cy")
        .agg(
            F.count("*").alias("n_fixes"),
            F.min("_us").alias("start_us"),
            (F.max("_us") - F.min("_us")).alias("dwell_us"),
        )
        .filter(
            (F.col("n_fixes") >= int(min_fixes))
            & (F.col("dwell_us") >= int(min_dwell_us))
        )
    )
    seq = Window.partitionBy(*by).orderBy(F.col("start_us").asc())
    return stops.withColumn("stay_seq", F.row_number().over(seq)).select(
        *by, "stay_seq", "cx", "cy", "n_fixes", "start_us", "dwell_us"
    )


def radius_of_gyration(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    by: Sequence[str] = ("user_id",),
    zoom: int = 7,
):
    """Radius of gyration per entity — the Gonzalez/Hidalgo/Barabasi 2008
    mobility-range staple: rg^2 = E[|r - r_mean|^2] over an entity's
    visited positions, here on the integer web-mercator cell lattice at
    `zoom` so every moment is an exact int64 sum (same lattice trick as
    staypoints).

    By the parallel-axis identity, n^2 * rg^2 = n*Σ(cx^2+cy^2) - (Σcx)^2
    - (Σcy)^2 — a single non-negative int64 numerator (Cauchy-Schwarz),
    computed from ONE map-side-combined groupBy (no window, no second
    pass).  Output rg2_milli = ((num div n) * 1000) div n: two int64
    floor divisions on non-negative operands, which Spark `div` and
    DuckDB `//` resolve identically (round-half lesson: never float-round
    a quotient in an oracle-paired query), plus the exact milli-cell mean
    center (mx_milli, my_milli) and n_fixes.

    Overflow bound (documented per the PageRank-guard advice): cell
    coords < 2^zoom so Σ(cx^2+cy^2) <= n * 2^(2*zoom+1) and the numerator
    n*ssq <= n^2 * 2^(2*zoom+1) must stay under 2^63 — at the default
    zoom 7 that holds to n = 1.4e7 fixes PER ENTITY (device streams are
    bounded far below that); raising zoom costs head-room, asserted here
    rather than wrapped silently."""
    if 2 * zoom + 1 > 40:
        raise ValueError(
            f"zoom={zoom} leaves <2^11 per-entity fix head-room before "
            "n^2*2^(2z+1) overflows int64; use zoom <= 19 and mind the bound"
        )
    from ..udfs import tile_x_expr, tile_y_expr

    by = list(by)
    cx = tile_x_expr(F.col(lon_col), F.lit(zoom))
    cy = tile_y_expr(F.col(lat_col), F.lit(zoom))
    slim = df.select(*by, cx.alias("cx"), cy.alias("cy"))
    agg = slim.groupBy(*by).agg(
        F.count("*").alias("n_fixes"),
        F.sum("cx").alias("_sx"),
        F.sum("cy").alias("_sy"),
        F.sum(F.col("cx") * F.col("cx") + F.col("cy") * F.col("cy")).alias("_ssq"),
    )
    return agg.select(
        *by,
        "n_fixes",
        F.expr("_sx * 1000 div n_fixes").alias("mx_milli"),
        F.expr("_sy * 1000 div n_fixes").alias("my_milli"),
        F.expr(
            "((n_fixes * _ssq - _sx * _sx - _sy * _sy) div n_fixes) "
            "* 1000 div n_fixes"
        ).alias("rg2_milli"),
    )


def jump_length_histogram(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    id_col: str = "event_id",
    by: Sequence[str] = ("user_id",),
    zoom: int = 7,
):
    """Jump-length (displacement) distribution — the Brockmann et al.
    2006 scaling-law diagnostic of human mobility: the histogram of
    squared cell displacements between CONSECUTIVE fixes of the same
    entity, in power-of-two bins.

    The bin index is integer-exact: for d2 >= 1, length(bin(d2)) =
    floor(log2(d2)) + 1 in BOTH Spark and DuckDB (minimal binary string,
    verified semantics), sidestepping float log2's boundary ties at exact
    powers of two; d2 = 0 (same-cell consecutive fixes) gets bin 0.

    Plan: per-entity (micros, id) window for the lag pair (same single
    shuffle contract as staypoints — longs only), then a tiny groupBy on
    the bin id (distinct-entity count rides the same aggregation).  The
    histogram has <= 2*(zoom+1)+2 rows at any data scale, so the final
    exchange is constant-size at 100 TB."""
    from ..udfs import tile_x_expr, tile_y_expr

    by = list(by)
    dtype = dict(df.dtypes)[ts_col]
    if dtype in ("timestamp", "timestamp_ntz"):
        kind = "TIMESTAMP_NTZ" if dtype == "timestamp_ntz" else "TIMESTAMP"
        us = F.expr(
            f"timestampdiff(MICROSECOND, {kind} '1970-01-01 00:00:00', {ts_col})"
        )
    else:
        us = F.col(ts_col).cast("long")
    slim = df.select(
        *by,
        us.alias("_us"),
        F.col(id_col).cast("long").alias("_id"),
        tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("cx"),
        tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("cy"),
    )
    w = Window.partitionBy(*by).orderBy(F.col("_us").asc(), F.col("_id").asc())
    dx = F.col("cx") - F.lag("cx").over(w)
    dy = F.col("cy") - F.lag("cy").over(w)
    jumps = (
        slim.select(*by, (dx * dx + dy * dy).alias("d2"))
        .filter(F.col("d2").isNotNull())
    )
    bin_id = F.when(F.col("d2") == 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("d2")))
    ).cast("long")
    return (
        jumps.select(*by, "d2", bin_id.alias("jump_bin"))
        .groupBy("jump_bin")
        .agg(
            F.count("*").alias("n_jumps"),
            F.countDistinct(*by).cast("long").alias("n_entities"),
            F.min("d2").alias("min_d2"),
            F.max("d2").alias("max_d2"),
        )
    )


def location_regularity(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    by: Sequence[str] = ("user_id",),
    zoom: int = 7,
):
    """Mobility regularity per entity — the Song et al. 2010
    predictability input: the share of an entity's fixes spent at its
    single most-visited cell (home/work anchor), plus the visited-cell
    count.  High share = routine mover, low = explorer.

    Ties at the top count resolve to the smallest (cx, cy) — an explicit
    total order, never engine-dependent arbitrary pick.  top_share_ppm is
    an exact parts-per-million floor division on non-negative int64
    (top_n <= n_fixes <= 9.2e12 before top_n * 1e6 could overflow).

    Plan: groupBy(by, cell) visit counts (map-side combined — the heavy
    reduction happens before any shuffle), then ONE per-entity window
    pass computing rank, Σn and cell count together on the already-slim
    counts relation (<= visited-cell rows per entity, not fixes)."""
    from ..udfs import tile_x_expr, tile_y_expr

    by = list(by)
    counts = (
        df.select(
            *by,
            tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("cx"),
            tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("cy"),
        )
        .groupBy(*by, "cx", "cy")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(*by)
    rank = F.row_number().over(
        w.orderBy(F.col("n").desc(), F.col("cx").asc(), F.col("cy").asc())
    )
    return (
        counts.select(
            *by, "cx", "cy", "n",
            rank.alias("_rk"),
            F.sum("n").over(w).alias("n_fixes"),
            F.count("*").over(w).cast("long").alias("n_cells"),
        )
        .filter(F.col("_rk") == 1)
        .select(
            *by,
            "n_fixes",
            "n_cells",
            F.col("cx").alias("top_cx"),
            F.col("cy").alias("top_cy"),
            F.col("n").alias("top_n"),
            F.expr("n * 1000000 div n_fixes").alias("top_share_ppm"),
        )
    )


def visitation_gini(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    by: Sequence[str] = ("user_id",),
    zoom: int = 7,
):
    """Gini coefficient of an entity's visitation frequencies — the
    inequality companion to location_regularity's top-share: 0 = every
    visited cell equally often, ->1 = a single dominant anchor.  Used in
    mobility analysis as the full-distribution concentration measure
    (regularity only sees the top cell).

    Exactly rational via the rank closed form on ascending-sorted counts:
    G = (2*Σ i*n_(i) - (k+1)*N) / (k*N) with k visited cells and N = Σn —
    equal counts commute in the weighted sum, so any tie order yields the
    same value; ranks still use the explicit (n, cx, cy) order so the
    intermediate relation is deterministic too.  Emitted as exact ppm:
    numerator is non-negative (Chebyshev sum inequality), both operands
    int64-safe to ~3e9 fixes/entity * 1e6 cells (2Σi*n <= 2kN, * 1e6).

    Plan: the same map-combined visit-count groupBy as
    location_regularity, one per-entity rank window over the slim counts
    relation, one final groupBy — fixes never shuffle, cells do."""
    from ..udfs import tile_x_expr, tile_y_expr

    by = list(by)
    counts = (
        df.select(
            *by,
            tile_x_expr(F.col(lon_col), F.lit(zoom)).alias("cx"),
            tile_y_expr(F.col(lat_col), F.lit(zoom)).alias("cy"),
        )
        .groupBy(*by, "cx", "cy")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(*by).orderBy(
        F.col("n").asc(), F.col("cx").asc(), F.col("cy").asc()
    )
    ranked = counts.withColumn("_i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy(*by).agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("n").alias("n_fixes"),
        F.sum(F.col("_i") * F.col("n")).alias("_s"),
    )
    return agg.select(
        *by,
        "n_cells",
        "n_fixes",
        F.expr(
            "(2 * _s - (n_cells + 1) * n_fixes) * 1000000 "
            "div (n_cells * n_fixes)"
        ).alias("gini_ppm"),
    )
