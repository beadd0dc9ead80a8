"""Hot-cell skew handling: salted repartitioning for joins and grouped ops.

North rule: "salted repartitioning for hot-cell skew". The fixture generator
plants a hot cell holding ~20% of all rows (fixtures.HOT_LON/HOT_LAT) to make
this measurable. Two layers of defense:

1. AQE skew-join splitting (on by default in session.py) — handles skewed
   *shuffle* partitions transparently;
2. explicit salting (this module) — for cases AQE can't fix: a single hot
   *key* in a shuffle hash join, or a grouped-map (applyInPandas) operator
   where one group would swamp an executor.

Salting contract: big side gets salt = pmod(hash(row-unique col), n) so the
hot key spreads over n subkeys; small side is replicated n times with an
exploded salt column; the join key becomes (key, salt). Results are identical
to the unsalted join (verified in tests), cost is n-fold replication of the
small side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int, out: str = "salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a row-unique column (never
    rand(): reruns/retries must produce the same placement)."""
    return df.withColumn(out, F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts)).cast("int"))


def replicate_with_salts(df: DataFrame, n_salts: int, out: str = "salt") -> DataFrame:
    """Explode the (small) side once per salt value."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return df.withColumn(out, F.explode(salts))


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    big_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle equi-join with the hot-key pressure spread across n_salts
    subpartitions. Use when the small side is too big to broadcast AND a key
    is hot enough that AQE's split (which only splits the big side's
    partitions, not a single key's hash bucket) still leaves a straggler."""
    b = with_salt(big, big_unique_col, n_salts)
    s = replicate_with_salts(small, n_salts)
    joined = b.join(s, on=on + ["salt"], how=how)
    return joined.drop("salt")


def salted_grouped_agg(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    partial_aggs: list,
    final_aggs: list,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for grouped ops without map-side combine:
    groupBy(keys + salt).agg(partial) -> groupBy(keys).agg(final).

    Built-in hash aggregates already do this (partial aggregation); this
    helper exists for pandas/grouped-map pipelines where a hot group would
    otherwise land on one worker."""
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*keys, "salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
