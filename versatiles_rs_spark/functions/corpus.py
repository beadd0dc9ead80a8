"""Corpus-level source/domain policies: blocklists and per-domain caps.

RefinedWeb/C4-style curation (public papers): drop documents from blocked
domains, then cap each surviving domain's contribution so a handful of
giant crawls can't dominate the training mix. Both policies are shaped for
10^12-row scale:

- the blocklist joins as a BROADCAST ANTI-join (blocklists are thousands
  of entries, never corpus-sized) — no shuffle of the corpus side;
- the cap is a row_number window over the domain key only — ONE shuffle of
  slim (id, domain) rows, ordered by the repo's deterministic 31-bit
  affine hash (functions/sessions.py) + id tiebreak so the kept subset is
  stable across runs and engines (no rand(), repo determinism rule).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sessions import _SAMPLE_ADD, _SAMPLE_MOD, _SAMPLE_MULT


def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    key_col: str = "doc_id",
    cap: int = 1000,
    blocklist: Iterable[str] | None = None,
) -> DataFrame:
    """Keep at most `cap` rows per domain (deterministic uniform pick),
    after removing blocked domains. Returns (key, domain, rk) with
    rk = the row's 1-based rank within its domain."""
    out = df.select(key_col, domain_col)
    if blocklist:
        bl = df.sparkSession.createDataFrame(
            [(d,) for d in sorted(set(blocklist))], f"{domain_col} string"
        )
        out = out.join(F.broadcast(bl), on=domain_col, how="left_anti")
    hk = F.pmod(
        F.col(key_col).cast("long") * F.lit(_SAMPLE_MULT) + F.lit(_SAMPLE_ADD),
        F.lit(_SAMPLE_MOD),
    )
    w = Window.partitionBy(domain_col).orderBy(hk.asc(), F.col(key_col).asc())
    return (
        out.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select(key_col, domain_col, "rk")
    )


def caption_frequency_cap(
    df: DataFrame,
    caption_col: str = "caption",
    key_col: str = "image_id",
    cap: int = 8,
) -> DataFrame:
    """LAION-style spam-caption curation: the same caption appearing on many
    images is boilerplate ("image may contain ...", SEO titles, watermark
    text), so keep at most `cap` images per normalized caption — a
    deterministic uniform pick via the repo's affine hash. Returns every row
    with (cap_key, n_caption, rk, keep) so downstream composes the flag.

    100 TB shape: captions never shuffle — the 32-char md5 of the normalized
    caption is computed map-side (same normalization as
    functions/phash.py::caption_aware_dedup, so the two stages share keys),
    and both windows ride ONE exchange on (id, cap_key) rows.
    """
    cap_key = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(caption_col)), "[^a-z0-9]+", " "))
    )
    out = df.select(F.col(key_col), cap_key.alias("cap_key"))
    hk = F.pmod(
        F.col(key_col).cast("long") * F.lit(_SAMPLE_MULT) + F.lit(_SAMPLE_ADD),
        F.lit(_SAMPLE_MOD),
    )
    w = Window.partitionBy("cap_key").orderBy(hk.asc(), F.col(key_col).asc())
    wc = Window.partitionBy("cap_key")
    return (
        out.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n_caption", F.count("*").over(wc))
        .withColumn("keep", (F.col("rk") <= cap).cast("int"))
    )
