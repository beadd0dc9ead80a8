"""Gap-based sessionization and deterministic hash sampling.

Two staples of an event/training-data pipeline that the reference (a tile
toolbox) has no analog for, expressed as pure window/column plans:

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
