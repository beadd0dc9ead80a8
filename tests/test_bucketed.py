"""Bucketed tables (sinks/bucketed.py): the write-once-shuffle layout must
make later joins and aggregations on the bucket key Exchange-free, and
stay correct."""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.sinks.bucketed import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _cleanup(spark, *names):
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_and_agg_are_exchange_free(spark, sf_dir, no_broadcast):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    try:
        a = write_bucketed(
            ev.select("event_id", "user_id", "value"),
            "bt_events_a", ["user_id"], 8, sort_cols=["user_id"],
        )
        b = write_bucketed(
            ev.groupBy("user_id").agg(F.sum("value").alias("total")),
            "bt_users_b", ["user_id"], 8, sort_cols=["user_id"],
        )
        joined = a.join(b, on="user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # both sides read co-located buckets
        # correctness identical to the un-bucketed join
        want = (
            ev.select("event_id", "user_id", "value")
            .join(ev.groupBy("user_id").agg(F.sum("value").alias("total")), on="user_id")
            .count()
        )
        assert joined.count() == want

        agg = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan  # agg on bucket key: no shuffle
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        _cleanup(spark, "bt_events_a", "bt_users_b")


def test_unbucketed_baseline_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the same join over plain parquet plans 2 Exchanges — the
    cost bucketing removes."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    plan = ev.join(agg, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
