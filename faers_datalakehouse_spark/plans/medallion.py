"""End-to-end medallion pipeline (Bronze → Silver → Gold) for FAERS-shaped
adverse-event data — the reference's full job DAG as a library.

Reference lifecycle parity (SURVEY.md §3):
- EP1 bronze: ``$``-CSV scan with an all-string schema + ingestion metadata,
  appended partitioned by ``_ingest_ts`` (``src/bronze/ingest_*.py``).
- EP2 silver: latest-partition incremental read → date/numeric
  standardization → domain decodes → bulk rename → audit columns →
  overwrite (``src/silver/silver_*.py``).
- EP3 gold: generated date dimension (Type 1), SCD2-maintained drug
  dimension, and the drug×reaction-grain fact with outcome severity rollup
  (``src/gold/**``).

Everything is deterministic under an injected ``ingest_ts``/``effective_date``
clock. Tables are plain ``saveAsTable`` (parquet) in whatever warehouse the
session points at; at cluster scale the same code runs over Delta/Iceberg by
changing the session's default format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.faers import (
    REPORT_SOURCE_DECODE,
    ROLE_DECODE,
    SEX_DECODE,
    age_in_years,
    country_region,
    outcome_description,
    outcome_severity,
    reaction_category,
    reaction_severity,
    route_category,
    weight_in_kg,
)
from ..functions.transforms import (
    age_group,
    decode_ladder,
    standardize_date,
    standardize_name,
)
from ..operators.scd2 import scd2_initial_load, scd2_merge
from ..sources.catalog import ensure_schemas, read_latest_partition, table_exists
from ..sources.ingest import add_ingestion_metadata, all_string_schema, read_csv_enforced
from .date_dim import build_date_dim

BRONZE_COLUMNS: dict[str, list[str]] = {
    "demographics": [
        "primaryid", "caseid", "event_dt", "age", "age_cod", "sex",
        "wt", "wt_cod", "occp_cod", "reporter_country",
    ],
    "drug_details": [
        "primaryid", "caseid", "drug_seq", "role_cod", "drugname", "route",
        "dose_vbm",
    ],
    "reactions": ["primaryid", "caseid", "pt", "drug_rec_act"],
    "outcomes": ["primaryid", "caseid", "outc_cod"],
}


def bronze_ingest(
    spark: SparkSession, name: str, src_path: str, ingest_ts: str
) -> None:
    """EP1: schema-enforced CSV → +audit columns → partitioned append."""
    schema = all_string_schema(BRONZE_COLUMNS[name])
    df = read_csv_enforced(spark, src_path, schema)
    df = add_ingestion_metadata(
        df, ingest_ts=F.lit(ingest_ts).cast("timestamp")
    )
    df.write.mode("append").partitionBy("_ingest_ts").saveAsTable(f"bronze.{name}")


def _with_audit(df: DataFrame, processed_ts: str) -> DataFrame:
    return df.withColumn("_processed_ts", F.lit(processed_ts).cast("timestamp"))


def silver_demographics(spark: SparkSession, processed_ts: str) -> None:
    raw = read_latest_partition(spark, "bronze.demographics")
    out = (
        raw.withColumn("event_date", standardize_date("event_dt"))
        .withColumn("age_years", F.round(age_in_years("age", "age_cod"), 2))
        .withColumn("age_group", age_group(F.round(age_in_years("age", "age_cod"))))
        .withColumn("weight_kg", F.round(weight_in_kg("wt", "wt_cod"), 2))
        .withColumn("sex_desc", decode_ladder("sex", SEX_DECODE))
        .withColumn("reporter_region", country_region("reporter_country"))
        .withColumnsRenamed({"primaryid": "primary_id", "caseid": "case_id"})
        .drop("event_dt", "age", "age_cod", "wt", "wt_cod", "_source_file")
    )
    _with_audit(out, processed_ts).write.mode("overwrite").saveAsTable(
        "silver.demographics"
    )


def silver_drug_details(spark: SparkSession, processed_ts: str) -> None:
    raw = read_latest_partition(spark, "bronze.drug_details")
    out = (
        raw.withColumn("drug_name", standardize_name("drugname"))
        .withColumn("role_desc", decode_ladder("role_cod", ROLE_DECODE))
        .withColumn("route_category", route_category("route"))
        .withColumn("drug_seq_num", F.col("drug_seq").cast("int"))
        .withColumnsRenamed({"primaryid": "primary_id", "caseid": "case_id"})
        .drop("drugname", "drug_seq", "_source_file")
    )
    _with_audit(out, processed_ts).write.mode("overwrite").saveAsTable(
        "silver.drug_details"
    )


def silver_reactions(spark: SparkSession, processed_ts: str) -> None:
    raw = read_latest_partition(spark, "bronze.reactions")
    out = (
        raw.withColumn("reaction_pt", F.initcap(F.trim("pt")))
        .withColumn("reaction_category", reaction_category("pt"))
        .withColumn("reaction_severity", reaction_severity("pt"))
        .withColumnsRenamed({"primaryid": "primary_id", "caseid": "case_id"})
        .drop("pt", "_source_file")
    )
    _with_audit(out, processed_ts).write.mode("overwrite").saveAsTable(
        "silver.reactions"
    )


def silver_outcomes(spark: SparkSession, processed_ts: str) -> None:
    raw = read_latest_partition(spark, "bronze.outcomes")
    out = (
        raw.withColumn("outcome_desc", outcome_description("outc_cod"))
        .withColumn("outcome_severity", outcome_severity("outc_cod"))
        .withColumnsRenamed({"primaryid": "primary_id", "caseid": "case_id"})
        .drop("_source_file")
    )
    _with_audit(out, processed_ts).write.mode("overwrite").saveAsTable(
        "silver.outcomes"
    )


DIM_DRUG_KEYS = ["drug_name"]
DIM_DRUG_TRACKED = ["role_desc", "route_category"]


def gold_dim_drug(spark: SparkSession, effective_date: str) -> None:
    """SCD2-maintained drug dimension off silver.drug_details."""
    # Deterministic one-row-per-key pick: dropDuplicates(keys) keeps an
    # arbitrary row when tracked columns differ across duplicates, making
    # the dimension flap run-to-run; rank by explicit attribute order.
    from pyspark.sql import Window

    pick = Window.partitionBy("drug_name").orderBy(
        "drug_seq_num", "role_desc", "route_category"
    )
    src = (
        spark.table("silver.drug_details")
        .select("drug_name", "role_desc", "route_category", "drug_seq_num")
        .withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "drug_seq_num")
    )
    if not table_exists(spark, "gold.dim_drug"):
        dim = scd2_initial_load(src, DIM_DRUG_KEYS, DIM_DRUG_TRACKED, effective_date)
    else:
        dim = scd2_merge(
            spark.table("gold.dim_drug"),
            src,
            DIM_DRUG_KEYS,
            DIM_DRUG_TRACKED,
            effective_date,
        )
    # Self-referencing overwrite needs a materialization break.
    dim.localCheckpoint(eager=True).write.mode("overwrite").option(
        "overwriteSchema", "true"
    ).saveAsTable("gold.dim_drug")


def gold_dim_date(spark: SparkSession) -> None:
    build_date_dim(spark).write.mode("overwrite").saveAsTable("gold.dim_date")


def gold_fact_adverse_events(spark: SparkSession) -> None:
    """Fact at drug×reaction grain per report, with worst-outcome rollup."""
    demo = spark.table("silver.demographics")
    drugs = spark.table("silver.drug_details")
    reactions = spark.table("silver.reactions")
    outcomes = spark.table("silver.outcomes")
    dim_date = spark.table("gold.dim_date").select(
        F.col("date_key").alias("event_date_key"), F.col("date_value")
    )
    worst = outcomes.groupBy("primary_id", "case_id").agg(
        F.max("outcome_severity").alias("worst_outcome_severity")
    )
    fact = (
        reactions.join(drugs, ["primary_id", "case_id"], "inner")
        .join(demo, ["primary_id", "case_id"], "inner")
        .join(F.broadcast(worst), ["primary_id", "case_id"], "left")
        .join(
            F.broadcast(dim_date),
            F.col("event_date") == F.col("date_value"),
            "left",
        )
        .select(
            "primary_id",
            "case_id",
            "drug_name",
            "drug_seq_num",
            "role_desc",
            "route_category",
            "reaction_pt",
            "reaction_category",
            "reaction_severity",
            "event_date",
            "event_date_key",
            "age_years",
            "age_group",
            "sex_desc",
            "weight_kg",
            "reporter_region",
            F.coalesce(F.col("worst_outcome_severity"), F.lit(0)).alias(
                "worst_outcome_severity"
            ),
            (F.coalesce(F.col("worst_outcome_severity"), F.lit(0)) >= 5).alias(
                "is_serious"
            ),
        )
    )
    fact.write.mode("overwrite").partitionBy("reporter_region").option(
        "overwriteSchema", "true"
    ).saveAsTable("gold.fact_adverse_events")


def run_pipeline(
    spark: SparkSession,
    sources: dict[str, str],
    ingest_ts: str,
    effective_date: str,
) -> None:
    """One full incremental run: bronze append → silver rebuild → gold merge."""
    ensure_schemas(spark)
    for name, path in sources.items():
        bronze_ingest(spark, name, path, ingest_ts)
    silver_demographics(spark, ingest_ts)
    silver_drug_details(spark, ingest_ts)
    silver_reactions(spark, ingest_ts)
    silver_outcomes(spark, ingest_ts)
    gold_dim_date(spark)
    gold_dim_drug(spark, effective_date)
    gold_fact_adverse_events(spark)
