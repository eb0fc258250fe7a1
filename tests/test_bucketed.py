"""Bucketed-table layout: the join/agg on the bucket key must plan ZERO
shuffles, and an equality filter must prune to one bucket."""

import pytest
from pyspark.sql import functions as F

from solarboat_data_pipeline_spark.plans.audit import (
    explain_string,
    shuffle_count,
)
from solarboat_data_pipeline_spark.sources import bucketed as bk

from tests.conftest import TESTDATA_ROOT


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    sf = f"{TESTDATA_ROOT}/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    bk.write_bucketed(
        orders, "t_orders_bkt", ["o_orderkey"], 8, path=str(root / "orders")
    )
    bk.write_bucketed(
        lineitem,
        "t_lineitem_bkt",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(root / "lineitem"),
    )
    yield "t_orders_bkt", "t_lineitem_bkt"
    bk.drop_bucketed(spark, "t_orders_bkt")
    bk.drop_bucketed(spark, "t_lineitem_bkt")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables, no_broadcast):
    t_orders, t_lineitem = bucketed_tables
    o = bk.read_bucketed(spark, t_orders)
    li = bk.read_bucketed(spark, t_lineitem)
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = explain_string(j)
    # the join itself must not shuffle either side; the only Exchange
    # allowed is the final tiny groupBy on o_orderstatus
    assert shuffle_count(plan) <= 1, plan
    assert "SortMergeJoin" in plan, plan

    # same result as the plain (shuffling) join
    o2 = spark.read.parquet(f"{TESTDATA_ROOT}/sf0.001/orders.parquet")
    li2 = spark.read.parquet(f"{TESTDATA_ROOT}/sf0.001/lineitem.parquet")
    expected = (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    got = {r["o_orderstatus"]: float(r["qty"]) for r in j.collect()}
    want = {r["o_orderstatus"]: float(r["qty"]) for r in expected.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    li = bk.read_bucketed(spark, t_lineitem)
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert shuffle_count(explain_string(agg)) == 0


def test_bucket_pruning_on_point_lookup(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    li = bk.read_bucketed(spark, t_lineitem)
    some_key = li.select("l_orderkey").first()[0]
    # a bare filter has no distribution requirement, so the planner turns
    # the bucketed scan off (autoBucketedScan) and with it bucket pruning;
    # force it on to assert the 1-of-N file pruning a point lookup gets
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = li.where(F.col("l_orderkey") == some_key)
        plan = explain_string(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )


def test_driver_bucketed_join_query_plan(spark, sf_dir):
    """The driver-visible k_bucketed_join query itself must plan the join
    with zero Exchange (the only allowed shuffle is the final tiny
    aggregate on c_mktsegment) and read bucket-pruned scans."""
    from solarboat_data_pipeline_spark.driver_queries import k_bucketed_join

    q = k_bucketed_join(spark, sf_dir)
    plan = explain_string(q)
    assert shuffle_count(plan) <= 1, plan
    assert "SortMergeJoin" in plan, plan
    assert "SelectedBucketsCount" in plan, plan
    assert q.count() > 0
