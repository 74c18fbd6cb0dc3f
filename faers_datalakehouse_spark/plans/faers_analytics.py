"""FAERS reporting analytics over the gold fact — the reference's report
suite re-expressed as composable DataFrame builders.

Parity: ``src/gold/analytics/fact_analytics.py:19-230`` computes nine report
aggregations plus a one-row summary over ``gold.fact_adverse_events`` and
saves each as a gold table. Here each report is a pure function
``(spark) -> DataFrame`` over the same fact (so callers can compose/limit
them), and ``generate_all`` persists the whole suite like the reference job.

Scale notes: every report is a single groupBy over the fact — one shuffle on
a low-cardinality key with map-side partials; the pct-of-total and
complexity reports use an unpartitioned window / self-aggregation over the
already-reduced group rows (bounded), never over the raw fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FATAL_SEVERITY = 7  # outcome_severity rank of DE (death)


def _fact(spark: SparkSession) -> DataFrame:
    return spark.table("gold.fact_adverse_events")


def top_drugs_by_events(spark: SparkSession, limit: int = 20) -> DataFrame:
    """Top drugs by adverse-event frequency (fact_analytics.py:27-44)."""
    return (
        _fact(spark)
        .groupBy("drug_name")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.countDistinct("primary_id").alias("unique_cases"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.sum(F.col("is_serious").cast("int")).alias("serious_count"),
            F.sum(
                (F.col("worst_outcome_severity") == FATAL_SEVERITY).cast("int")
            ).alias("fatal_count"),
        )
        .orderBy(F.desc("total_events"), F.asc("drug_name"))
        .limit(limit)
    )


def highest_risk_drugs(
    spark: SparkSession, min_events: int = 10, limit: int = 15
) -> DataFrame:
    """Highest-severity drugs above a significance floor
    (fact_analytics.py:46-60)."""
    return (
        _fact(spark)
        .groupBy("drug_name")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.max("worst_outcome_severity").alias("max_severity"),
        )
        .filter(F.col("total_events") >= min_events)
        .orderBy(F.desc("avg_severity"), F.asc("drug_name"))
        .limit(limit)
    )


def most_common_reactions(spark: SparkSession, limit: int = 25) -> DataFrame:
    """Reaction pattern analysis (fact_analytics.py:62-81)."""
    return (
        _fact(spark)
        .groupBy("reaction_pt", "reaction_category")
        .agg(
            F.count(F.lit(1)).alias("total_occurrences"),
            F.countDistinct("drug_name").alias("drugs_associated"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.sum(F.col("is_serious").cast("int")).alias("serious_count"),
        )
        .orderBy(F.desc("total_occurrences"), F.asc("reaction_pt"))
        .limit(limit)
    )


def age_group_analysis(spark: SparkSession) -> DataFrame:
    """Patient demographic insight by age band (fact_analytics.py:83-100)."""
    return (
        _fact(spark)
        .groupBy("age_group")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.countDistinct("primary_id").alias("unique_cases"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.avg("age_years").alias("avg_age"),
            F.sum(
                (F.col("worst_outcome_severity") == FATAL_SEVERITY).cast("int")
            ).alias("fatal_outcomes"),
        )
        .orderBy(F.desc("total_events"), F.asc("age_group"))
    )


def sex_analysis(spark: SparkSession) -> DataFrame:
    """Demographic split by sex (fact_analytics.py:102-114)."""
    return (
        _fact(spark)
        .groupBy("sex_desc")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.countDistinct("primary_id").alias("unique_cases"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.sum(F.col("is_serious").cast("int")).alias("serious_count"),
        )
        .orderBy("sex_desc")
    )


def reporting_source_analysis(spark: SparkSession) -> DataFrame:
    """Reporter source × regulatory priority (fact_analytics.py:116-130)."""
    return (
        _fact(spark)
        .groupBy("reporter_source_desc", "regulatory_priority")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.avg("reporter_reliability_score").alias("avg_reliability"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
        )
        .orderBy(F.desc("total_events"), "reporter_source_desc")
    )


def data_quality_distribution(spark: SparkSession) -> DataFrame:
    """Quality-tier share of the fact (fact_analytics.py:132-145).

    The pct-of-total window runs over the 3 reduced tier rows, not the fact.
    """
    by_tier = (
        _fact(spark)
        .groupBy("data_quality_tier")
        .agg(F.count(F.lit(1)).alias("record_count"))
    )
    w = Window.partitionBy()
    return by_tier.select(
        "data_quality_tier",
        "record_count",
        F.round(
            F.col("record_count") * 100.0 / F.sum("record_count").over(w), 2
        ).alias("percentage"),
    ).orderBy(F.desc("record_count"), "data_quality_tier")


def case_complexity_analysis(spark: SparkSession) -> DataFrame:
    """Case complexity by distinct drugs per report
    (fact_analytics.py:147-157; the reference derives complexity in the fact
    build — here it is a grain-level rollup so the fact stays pure)."""
    per_case = (
        _fact(spark)
        .groupBy("primary_id", "case_id")
        .agg(
            F.countDistinct("drug_name").alias("n_drugs"),
            F.countDistinct("reaction_pt").alias("n_reactions"),
            F.max("worst_outcome_severity").alias("worst_severity"),
        )
        .withColumn(
            "case_complexity",
            F.when(F.col("n_drugs") <= 1, "Simple")
            .when(F.col("n_drugs") <= 3, "Moderate")
            .otherwise("Complex"),
        )
    )
    return (
        per_case.groupBy("case_complexity")
        .agg(
            F.count(F.lit(1)).alias("case_count"),
            F.avg("n_drugs").alias("avg_drugs"),
            F.avg("n_reactions").alias("avg_reactions"),
            F.avg("worst_severity").alias("avg_worst_severity"),
        )
        .orderBy(F.desc("case_count"), "case_complexity")
    )


def yearly_trends(spark: SparkSession) -> DataFrame:
    """Temporal trend by event year (fact_analytics.py:159-175)."""
    return (
        _fact(spark)
        .filter(F.col("event_date").isNotNull())
        .groupBy(F.year("event_date").alias("event_year"))
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.countDistinct("primary_id").alias("unique_cases"),
            F.avg("worst_outcome_severity").alias("avg_severity"),
            F.sum(
                (F.col("worst_outcome_severity") == FATAL_SEVERITY).cast("int")
            ).alias("fatal_outcomes"),
        )
        .orderBy("event_year")
    )


def summary_insights(spark: SparkSession) -> DataFrame:
    """One-row global summary (fact_analytics.py:201-230)."""
    return _fact(spark).agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("primary_id").alias("total_cases"),
        F.countDistinct("drug_name").alias("total_drugs"),
        F.countDistinct("reaction_pt").alias("total_reactions"),
        F.avg("worst_outcome_severity").alias("avg_severity"),
        F.sum(F.col("is_serious").cast("int")).alias("serious_events"),
        F.sum(
            (F.col("worst_outcome_severity") == FATAL_SEVERITY).cast("int")
        ).alias("fatal_events"),
        F.sum((F.col("age_years") < 18).cast("int")).alias("pediatric_events"),
        F.sum((F.col("age_years") >= 65).cast("int")).alias("elderly_events"),
        F.sum(
            (F.col("reporter_source_desc") == "Health Professional").cast("int")
        ).alias("hp_reported_events"),
    )


ANALYTICS_REPORTS = {
    "analytics_top_drugs": top_drugs_by_events,
    "analytics_highest_risk_drugs": highest_risk_drugs,
    "analytics_common_reactions": most_common_reactions,
    "analytics_age_groups": age_group_analysis,
    "analytics_sex": sex_analysis,
    "analytics_reporting_sources": reporting_source_analysis,
    "analytics_data_quality": data_quality_distribution,
    "analytics_case_complexity": case_complexity_analysis,
    "analytics_yearly_trends": yearly_trends,
    "analytics_summary": summary_insights,
}


def generate_all(spark: SparkSession) -> None:
    """Persist the whole report suite under gold.* like the reference job."""
    for table, fn in ANALYTICS_REPORTS.items():
        fn(spark).write.mode("overwrite").option(
            "overwriteSchema", "true"
        ).saveAsTable(f"gold.{table}")
