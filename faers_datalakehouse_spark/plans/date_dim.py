"""Generated date dimension.

Parity: the reference generates a Type-1 date dimension with
``explode(sequence(to_date(start), to_date(end), interval 1 day))`` plus ~30
derived calendar attributes (``src/gold/dims/dim_date.py:40-158``). This is
the reference's only generator/lateral operator.

Spark-first: ``sequence`` + ``explode`` materializes the row set with no input
table and no shuffle; every attribute is a codegen'd projection. An ~11k-row
dimension is broadcast-joined against facts for free.

Attributes are restricted to those with exact ANSI-SQL twins (DuckDB
``generate_series`` + date parts) so the dimension itself is
oracle-verifiable; day-of-week uses ISO numbering (Monday=1) to avoid the
Spark-vs-DuckDB ``dayofweek`` origin mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_START = "1995-01-01"
DEFAULT_END = "2030-12-31"


def build_date_dim(
    spark: SparkSession, start: str = DEFAULT_START, end: str = DEFAULT_END
) -> DataFrame:
    """One row per calendar day in [start, end], with derived attributes."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("interval 1 day"),
            )
        ).alias("date_value")
    )
    d = F.col("date_value")
    iso_dow = F.weekday(d) + F.lit(1)  # ISO: Monday=1 ... Sunday=7
    return days.select(
        (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).alias("date_key"),
        d,
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.concat(F.lit("Q"), F.quarter(d).cast("string")).alias("quarter_name"),
        F.month(d).alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).alias("day_of_month"),
        F.dayofyear(d).alias("day_of_year"),
        iso_dow.alias("iso_day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.weekofyear(d).alias("iso_week"),
        (iso_dow >= 6).alias("is_weekend"),
        (F.dayofmonth(d) == 1).alias("is_month_start"),
        (d == F.last_day(d)).alias("is_month_end"),
        F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        ((F.year(d) % 4 == 0) & ((F.year(d) % 100 != 0) | (F.year(d) % 400 == 0))).alias(
            "is_leap_year"
        ),
        F.when(F.month(d) >= 10, F.year(d) + 1).otherwise(F.year(d)).alias(
            "fiscal_year"
        ),
    )


DATE_DIM_ORACLE_SQL = """
SELECT
  CAST(year(d)*10000 + month(d)*100 + day(d) AS INTEGER) AS date_key,
  d                                                    AS date_value,
  CAST(year(d) AS INTEGER)                             AS year,
  CAST(quarter(d) AS INTEGER)                          AS quarter,
  'Q' || CAST(quarter(d) AS VARCHAR)                   AS quarter_name,
  CAST(month(d) AS INTEGER)                            AS month,
  strftime(d, '%B')                                    AS month_name,
  CAST(day(d) AS INTEGER)                              AS day_of_month,
  CAST(dayofyear(d) AS INTEGER)                        AS day_of_year,
  CAST(isodow(d) AS INTEGER)                           AS iso_day_of_week,
  strftime(d, '%A')                                    AS day_name,
  CAST(weekofyear(d) AS INTEGER)                       AS iso_week,
  isodow(d) >= 6                                       AS is_weekend,
  day(d) = 1                                           AS is_month_start,
  d = last_day(d)                                      AS is_month_end,
  CAST(day(last_day(d)) AS INTEGER)                    AS days_in_month,
  strftime(d, '%Y-%m')                                 AS year_month,
  (year(d) % 4 = 0 AND (year(d) % 100 <> 0 OR year(d) % 400 = 0)) AS is_leap_year,
  CAST(CASE WHEN month(d) >= 10 THEN year(d) + 1 ELSE year(d) END AS INTEGER)
                                                       AS fiscal_year
FROM (
  SELECT CAST(unnest(generate_series(DATE '{start}', DATE '{end}',
                                     INTERVAL 1 DAY)) AS DATE) AS d
)
"""


def date_dim_oracle(start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    return DATE_DIM_ORACLE_SQL.format(start=start, end=end)
