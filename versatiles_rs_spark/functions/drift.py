"""Distribution drift between corpus slices: exact fixed-point KL divergence.

The training-data-ops monitoring primitive (data-mix drift between
crawl snapshots / pipeline stages; the metric behind "did the domain
mix shift after filtering?" dashboards and DoReMi-style mixture
tracking): for category counts n_i (slice A, total N) and m_i (slice
B, total M) over the SHARED support,

    KL(P_A || P_B) = (1/N) * Σ n_i (log2 n_i - log2 m_i)  - log2 N + log2 M

computed entirely in the repo's 2^-20 fixed-point log2
(udfs.log2_fp_stages — bit-by-bit mantissa squaring, no libm), so the
drift number is bit-deterministic cross-engine.  The one signed
intermediate (the Σ term can be negative) is handled by OFFSETTING the
final numerator positive before the single floor division — no
division ever sees a negative operand (round-half-tie rule).

Support restriction: categories must appear in BOTH slices (n_i, m_i
>= 1) — the standard smoothed-KL alternative changes the statistic;
restricting support keeps it exact and is stated in the output
(n_categories counts the shared support).

Shape: one conditional-count groupBy over the corpus (map-combined),
the log staging runs on the tiny per-category relation (pure JVM
column stages), one final one-row assembly.  Nothing but (key, counts)
ever shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import log2_fp_stages

K = 20
# |log2| of any count is < 2^6 = 64 units of 2^20; offsetting by 64*2^20
# makes the final numerator positive for any real input
_OFF = 64 * (1 << K)


def _with_lg(df: DataFrame, x_col: str, out: str) -> DataFrame:
    st = df.withColumn("x", F.col(x_col))
    for name, expr in log2_fp_stages(K):
        st = st.withColumn(name, F.expr(expr))
    keep = [c for c in df.columns] + [F.col("lg").alias(out)]
    return st.select(*keep)


def kl_drift(
    docs: DataFrame,
    category_col: str,
    split_expr,
) -> DataFrame:
    """KL(P_A || P_B) of the `category_col` distribution between the
    split_expr==True slice (A) and the rest (B), over the shared
    support.  One row: (n_categories, n_a, n_b, kl_fp) with kl_fp in
    2^-20 log2 units (bits)."""
    cnt = (
        docs.select(
            F.col(category_col).alias("key"),
            F.when(split_expr, 1).otherwise(0).alias("ia"),
        )
        .groupBy("key")
        .agg(
            F.sum("ia").cast("long").alias("na"),
            F.sum(F.lit(1) - F.col("ia")).cast("long").alias("nb"),
        )
        .filter((F.col("na") >= 1) & (F.col("nb") >= 1))
    )
    cnt = _with_lg(cnt, "na", "lga")
    cnt = _with_lg(cnt, "nb", "lgb")
    agg = cnt.agg(
        F.count("*").cast("long").alias("n_categories"),
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
        F.sum(F.col("na") * (F.col("lga") - F.col("lgb"))).alias("term"),
    )
    agg = _with_lg(agg, "n_a", "lg_na")
    agg = _with_lg(agg, "n_b", "lg_nb")
    return agg.select(
        "n_categories", "n_a", "n_b",
        F.expr(
            f"(term + n_a * (lg_nb - lg_na) + n_a * {_OFF}) div n_a - {_OFF}"
        ).alias("kl_fp"),
    )


def kl_ctes_sql(src: str, prefix: str, x_col: str, out: str, k: int = K) -> tuple[str, str]:
    """Oracle chain: staged log2 columns over CTE `src`, final CTE
    renames lg -> `out` and drops the stage columns (mirror of
    _with_lg)."""
    ctes, prev = [], src
    stages = log2_fp_stages(k, x_col=x_col, div="//")
    for i, (name, expr) in enumerate(stages):
        nm = f"{prefix}{i}"
        ctes.append(f"{nm} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = nm
    nm = f"{prefix}z"
    ctes.append(
        f"{nm} AS (SELECT * EXCLUDE (e2, p2, "
        + ", ".join(
            [f"m{j}" for j in range(0, k + 1)]
            + [f"f{j}" for j in range(0, k + 1)]
            + [f"s{j}" for j in range(1, k + 1)]
        )
        + f", lg), lg AS {out} FROM {prev})"
    )
    return ",\n    ".join(ctes), nm


ZIPF_K = 12  # fewer fractional bits than drift: the OLS cross-products
             # must survive * n * 1000 inside int64 (bound in zipf_fit)


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 256,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary head — the
    classic corpus health check (Zipf 1949; a natural-language corpus
    fits log f ~ -s * log r with s near 1; heavily duplicated or
    templated corpora bend the curve): OLS slope of (log2 rank,
    log2 freq) over the top `top_v` terms, EXACT in 2^-12 fixed-point
    log2.

    Tokenization matches tfidf_topk (lower + split on [^a-z]+) so the
    frequency table is the same relation cross-engine.  The head is
    TakeOrderedAndProject (orderBy.limit — no full-vocab sort shuffle);
    the rank window runs over `top_v` rows, a bounded constant.  The
    OLS numerator is signed (slopes are negative) — the division
    decomposes into sign * (abs * 1000 div den), den > 0 by
    construction.  int64 bound: (40 * 2^12)^2 * top_v * 1000 < 2^63
    up to top_v ~ 340.

    One row: (n_terms, num, den, slope_milli)."""
    from pyspark.sql import Window

    from ..udfs import log2_fp_stages

    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count("*").cast("long").alias("f"))
    head = freq.orderBy(F.col("f").desc(), F.col("term")).limit(int(top_v))
    ranked = head.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("f").desc(), F.col("term"))).cast("long"),
    )
    st = ranked.withColumn("x", F.col("r"))
    for name, expr in log2_fp_stages(ZIPF_K):
        st = st.withColumn(name, F.expr(expr))
    st = st.select("term", "f", "r", F.col("lg").alias("lr"))
    st = st.withColumn("x", F.col("f"))
    for name, expr in log2_fp_stages(ZIPF_K):
        st = st.withColumn(name, F.expr(expr))
    st = st.select("lr", F.col("lg").alias("lf"))
    agg = st.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("lr").alias("slr"),
        F.sum("lf").alias("slf"),
        F.sum(F.col("lr") * F.col("lf")).alias("slrlf"),
        F.sum(F.col("lr") * F.col("lr")).alias("slr2"),
    )
    return agg.select(
        "n_terms",
        F.expr("n_terms * slrlf - slr * slf").alias("num"),
        F.expr("n_terms * slr2 - slr * slr").alias("den"),
        # den = 0 only for a degenerate (<2 distinct-rank) head: NULL
        # slope, identically in the oracle
        F.expr(
            "CASE WHEN n_terms * slr2 - slr * slr > 0 THEN "
            "(CASE WHEN n_terms * slrlf - slr * slf >= 0 THEN 1 ELSE -1 END)"
            " * ((abs(n_terms * slrlf - slr * slf) * 1000)"
            "    div (n_terms * slr2 - slr * slr)) ELSE NULL END"
        ).alias("slope_milli"),
    )
