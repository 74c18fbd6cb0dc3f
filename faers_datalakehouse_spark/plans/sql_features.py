"""Spark 4 SQL-surface features as first-class engine coverage:
session variables, EXECUTE IMMEDIATE, SQL scripting (BEGIN ... END),
and the Observation metrics API.

The reference drives its silver/gold layers through ``spark.sql`` over
temp views (S8 in SURVEY §2; e.g. `/root/reference` gold notebooks);
production SQL pipelines additionally lean on procedural SQL —
variables for parameterized thresholds, scripting for multi-statement
transactions of logic — and on query-attached metrics for data-quality
telemetry that costs NO extra pass. These entries prove each feature
end-to-end against plain-SQL oracles.

Determinism note (the repo-wide cross-engine float rule): the script's
threshold is an AVG over exact integer cents — one exactly-rounded IEEE
division of exact int64 sums — so Spark and DuckDB derive the identical
cutoff; everything downstream is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sql_scripting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statement SQL script (Spark 4 SQL scripting): declare a
    variable, derive a data-driven threshold (mean order value in exact
    cents), then report per-priority volume above the threshold. The
    script's LAST statement is its result — the whole block runs inside
    Spark's SQL scripting interpreter, not Python glue."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_script_v"
    )
    return spark.sql(
        """
BEGIN
  DECLARE cut BIGINT DEFAULT 0;
  SET cut = (
    SELECT CAST(avg(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders_script_v
  );
  SELECT o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_above,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents_above,
         cut AS cut_cents
  FROM orders_script_v
  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > cut
  GROUP BY o_orderpriority
  ORDER BY priority;
END
"""
    )


SQL_SCRIPTING_SQL = """
WITH cents AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), cut AS (
  SELECT CAST(avg(c) AS BIGINT) AS cut_cents FROM cents
)
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(c) AS BIGINT) AS cents_above,
       cut.cut_cents
FROM cents CROSS JOIN cut
WHERE c > cut.cut_cents
GROUP BY o_orderpriority, cut.cut_cents
ORDER BY priority
"""


def sql_variables_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE with USING parameters: a
    parameterized top-N report where the group column arrives through
    IDENTIFIER() — the safe dynamic-SQL idiom (no string splicing)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_vars_v"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE report_top INT DEFAULT 3")
    spark.sql("SET VAR report_top = 4")
    return spark.sql(
        """
EXECUTE IMMEDIATE
  'SELECT IDENTIFIER(?) AS grp,
          CAST(count(*) AS BIGINT) AS n
   FROM orders_vars_v
   GROUP BY grp ORDER BY n DESC, grp LIMIT report_top'
  USING 'o_orderstatus'
"""
    )


SQL_VARIABLES_SQL = """
SELECT o_orderstatus AS grp, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY n DESC, grp LIMIT 4
"""


def observed_quality_query(spark: SparkSession, sf_dir: str):
    """Observation-metered curation filter: keep documents above a
    length floor while a query-attached ``Observation`` records
    telemetry (rows seen, rows kept, chars kept) in the SAME pass — the
    zero-extra-scan data-quality pattern. Returns the filtered frame;
    ``observed_quality_metrics`` exposes the observation for tests."""
    from pyspark.sql import Observation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("curation")
    metered = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.col("n_chars") >= 200).cast("long")).alias("rows_kept"),
        F.sum(
            F.when(F.col("n_chars") >= 200, F.col("n_chars")).otherwise(0)
        ).alias("chars_kept"),
    )
    # deliberately NO global orderBy here: a global sort runs a
    # range-boundary SAMPLING pass that re-executes the observed subtree
    # and double-counts every metric (measured: rows_seen = 2x). Attach
    # observations above sorts, or skip the sort — the driver compare is
    # order-insensitive.
    out = metered.where(F.col("n_chars") >= 200).select(
        "doc_id", "source", "n_chars"
    )
    return out, obs


def observed_quality_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    df, _obs = observed_quality_query(spark, sf_dir)
    return df


OBSERVED_QUALITY_SQL = """
SELECT doc_id, source, n_chars
FROM documents WHERE n_chars >= 200
ORDER BY doc_id
"""


def pandas_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (``pyspark.pandas``): the pricing rollup
    written as idiomatic pandas — groupby/agg/reset_index — executing
    as the SAME distributed Catalyst plan underneath (``.to_spark()``
    hands back the lazily-built DataFrame; nothing collects). Measures
    are exact integer cents so the twin SQL hashes bit-for-bit.

    This is migration-surface coverage: a pandas-speaking user of the
    reference can keep their idioms and inherit the cluster execution
    model. The default-index advice is followed (``index_col`` set) so
    no monotonically-increasing-id stage sneaks into the plan."""
    import pyspark.pandas as ps

    li = ps.read_parquet(
        f"{sf_dir}/lineitem.parquet", index_col="l_orderkey"
    )
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["qty"] = li["l_quantity"].round().astype("int64")
    g = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(n=("cents", "count"), cents=("cents", "sum"), qty=("qty", "sum"))
        .reset_index()
    )
    out = g.to_spark()
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
        F.col("qty").cast("long").alias("qty"),
    ).orderBy("l_returnflag", "l_linestatus")


PANDAS_API_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
GROUP BY 1, 2
ORDER BY l_returnflag, l_linestatus
"""
