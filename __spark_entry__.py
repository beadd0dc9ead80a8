"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship tile-assignment query on sf0.001.
queries()     -> every implemented operator (versatiles_rs_spark.queries.REGISTRY).
oracle_sql()  -> DuckDB-equivalent SQL per query (omitted for non-SQL ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from versatiles_rs_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: web-mercator tile assignment + per-tile aggregation."""
    return _q.REGISTRY["tile_assign"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
