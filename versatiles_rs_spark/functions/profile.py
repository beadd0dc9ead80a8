"""Dataset profiling: exact/approx per-column statistics in ONE pass.

The standard first step of any curation pipeline (and of the reference's
`probe` tool for tile containers — tools/probe.py is the container-shaped
sibling of this tabular profiler): row count, null counts, distinct
cardinalities, min/max/mean, exact interpolated percentiles for numerics,
length stats for strings.  Output is long-format (col, stat, value) so the
profile of ANY table has one fixed schema.

100 TB shape: everything is a single `df.agg(...)` — one partial-aggregate
pass, one 1-row shuffle; no per-column jobs, no collect-and-loop.  Two cost
knobs for corpus scale, both flipped by `exact=False`:

- distinct counts become HLL sketches (`approx_count_distinct`, rsd 1.5%)
  instead of count(DISTINCT a), count(DISTINCT b), ... which Catalyst plans
  as an Expand (row multiplied by #distinct-aggs) + full-width shuffle;
- percentiles become `approx_percentile` (fixed-memory KLL-style digest)
  instead of `percentile`, whose exact implementation buffers every value
  of the group in executor memory — fine at test SF, not at 10^12 rows.

The exact path exists so the whole profile hash-verifies against DuckDB
(`profile_docs` in the registry); `round_to` pins cross-engine float
stability (mean/stddev are reduction-order sensitive — SKILL gotcha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric: list[str] | None = None,
    strings: list[str] | None = None,
    categorical: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.95),
    exact: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Long-format profile (col string, stat string, value double).

    numeric     -> count/nulls/n_distinct/min/max/mean/p{q} per column
    strings     -> nulls/len_min/len_max/len_avg per column
    categorical -> nulls/n_distinct per column
    Plus one ('*', 'rows', N) row.  All values are DOUBLE (stats over
    mixed-type columns unify); means/averages round to `round_to`.
    """
    numeric = numeric or []
    strings = strings or []
    categorical = categorical or []

    def nd(c):
        return (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd=0.015)
        )

    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    stats: list[tuple[str, str]] = [("*", "rows")]  # parallel to agg order

    def add(col: str, stat: str, expr) -> None:
        aggs.append(expr.alias(f"__{len(aggs)}"))
        stats.append((col, stat))

    for c in numeric:
        add(c, "count", F.count(F.col(c)))
        add(c, "nulls", F.count(F.lit(1)) - F.count(F.col(c)))
        add(c, "n_distinct", nd(c))
        add(c, "min", F.min(F.col(c)))
        add(c, "max", F.max(F.col(c)))
        add(c, "mean", F.round(F.avg(F.col(c)), round_to))
        for q in percentiles:
            p = (
                F.percentile(F.col(c), F.lit(q))
                if exact
                else F.expr(f"approx_percentile({c}, {q}, 10000)")
            )
            add(c, f"p{int(q * 100)}", F.round(p, round_to))
    for c in strings:
        ln = F.length(F.col(c))
        add(c, "nulls", F.count(F.lit(1)) - F.count(F.col(c)))
        add(c, "len_min", F.min(ln))
        add(c, "len_max", F.max(ln))
        add(c, "len_avg", F.round(F.avg(ln), round_to))
    for c in categorical:
        add(c, "nulls", F.count(F.lit(1)) - F.count(F.col(c)))
        add(c, "n_distinct", nd(c))

    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{col}', '{stat}', CAST(`{row.columns[i]}` AS DOUBLE)"
        for i, (col, stat) in enumerate(stats)
    )
    return row.selectExpr(
        f"stack({len(stats)}, {pairs}) AS (col, stat, value)"
    )
