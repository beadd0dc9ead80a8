"""Incremental tileset diff: the changed-tile set between two pyramid
versions.

The reference's convert pipeline always rewrites whole containers
(versatiles_container convert path); at 100 TB a pyramid refresh must be
incremental — re-encode and re-publish ONLY tiles whose content changed.
`tile_diff` computes that set:

100 TB shape: the payload is fingerprinted MAP-SIDE (xxhash64 — one pass,
no Python), so blob bytes never enter the join shuffle (CLAUDE.md dedup
lesson); the full-outer join then moves only (z, x, y, hash64) — ~28 bytes
per tile regardless of tile size.  Output is only the added / removed /
changed keys: the work-list for the incremental re-encode + the delta to
push to the serving layer.  Join both sides pre-bucketed by (z, x, y) (the
Hilbert/block sinks already write in that order) and the shuffle drops too.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_diff(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str] = ("z", "x", "y"),
    payload_col: str = "payload",
    fingerprint: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """(key..., change) for every tile whose content differs between `old`
    and `new`; change in ('added', 'removed', 'changed').  Unchanged tiles
    (same key, equal fingerprint) are dropped — the common case at refresh
    time, so the output is small even when the inputs are not.

    `fingerprint` maps the payload column to a comparable digest; default
    xxhash64 (pure JVM).  Pass F.md5 etc. when a cross-system-stable digest
    is needed.  Fingerprints are computed before the join on each side —
    the payload itself never shuffles."""
    fp = fingerprint or F.xxhash64
    keys = list(key)
    o = old.select(*keys, fp(F.col(payload_col)).alias("_h_old"))
    n = new.select(*keys, fp(F.col(payload_col)).alias("_h_new"))
    j = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )
