"""Bucketed-table co-located join: the 100 TB-scale strategy for the one
large×large join in the star schema (lineitem⋈orders on orderkey).

Writing both sides bucketed by the join key lets Catalyst plan the join
with NO shuffle exchange on either input — the property asserted here on
the physical plan, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.catalog import ensure_schemas


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    ensure_schemas(spark)
    spark.sql("DROP TABLE IF EXISTS silver.li_bucketed")
    spark.sql("DROP TABLE IF EXISTS silver.ord_bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("silver.li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("silver.ord_bucketed")
    )
    # disable auto-broadcast so the plan exercises the bucketed
    # (large x large) join path this strategy exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("silver.li_bucketed")
            .join(
                spark.table("silver.ord_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # correctness vs the plain join
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    want = {r["o_orderstatus"]: r["count"] for r in expected.collect()}
    assert got == want
    # plan shape: join consumes the bucketed scans directly — no exchange on
    # either join key (the only exchange is the post-join aggregation)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
