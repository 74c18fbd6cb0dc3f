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
        F.date_format(d, "MMM").alias("month_short_name"),
        F.dayofmonth(d).alias("day_of_month"),
        F.dayofyear(d).alias("day_of_year"),
        iso_dow.alias("iso_day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "EEE").alias("day_short_name"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(d, "yyyy-MM-dd").alias("date_string"),
        F.date_format(d, "yyyyMMdd").alias("date_string_compact"),
        (iso_dow >= 6).alias("is_weekend"),
        (iso_dow <= 5).alias("is_weekday"),
        (F.dayofmonth(d) == 1).alias("is_month_start"),
        (d == F.last_day(d)).alias("is_month_end"),
        ((F.month(d) == 1) & (F.dayofmonth(d) == 1)).alias("is_year_start"),
        ((F.month(d) == 12) & (F.dayofmonth(d) == 31)).alias("is_year_end"),
        F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        (((F.dayofmonth(d) - 1) / 7).cast("int") + 1).alias("week_of_month"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.concat(F.year(d).cast("string"), F.lit("-Q"), F.quarter(d).cast("string")).alias(
            "year_quarter"
        ),
        F.concat(
            F.year(d).cast("string"),
            F.lit("-W"),
            F.lpad(F.weekofyear(d).cast("string"), 2, "0"),
        ).alias("year_week"),
        ((F.year(d) % 4 == 0) & ((F.year(d) % 100 != 0) | (F.year(d) % 400 == 0))).alias(
            "is_leap_year"
        ),
        # Season + July-basis fiscal calendar + FAERS reporting period
        # (dim_date.py:109-156 parity).
        F.when(F.month(d).isin(12, 1, 2), "Winter")
        .when(F.month(d).isin(3, 4, 5), "Spring")
        .when(F.month(d).isin(6, 7, 8), "Summer")
        .otherwise("Fall")
        .alias("season"),
        F.when(F.month(d) >= 7, F.year(d) + 1).otherwise(F.year(d)).alias(
            "fiscal_year"
        ),
        F.when(F.month(d).between(7, 9), 1)
        .when(F.month(d).between(10, 12), 2)
        .when(F.month(d).between(1, 3), 3)
        .otherwise(4)
        .alias("fiscal_quarter"),
        F.when(F.year(d) < 2010, "Pre-2010")
        .when(F.year(d).between(2010, 2015), "2010-2015")
        .when(F.year(d).between(2016, 2020), "2016-2020")
        .otherwise("2021+")
        .alias("reporting_period"),
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
  strftime(d, '%b')                                    AS month_short_name,
  CAST(day(d) AS INTEGER)                              AS day_of_month,
  CAST(dayofyear(d) AS INTEGER)                        AS day_of_year,
  CAST(isodow(d) AS INTEGER)                           AS iso_day_of_week,
  strftime(d, '%A')                                    AS day_name,
  strftime(d, '%a')                                    AS day_short_name,
  CAST(weekofyear(d) AS INTEGER)                       AS iso_week,
  strftime(d, '%Y-%m-%d')                              AS date_string,
  strftime(d, '%Y%m%d')                                AS date_string_compact,
  isodow(d) >= 6                                       AS is_weekend,
  isodow(d) <= 5                                       AS is_weekday,
  day(d) = 1                                           AS is_month_start,
  d = last_day(d)                                      AS is_month_end,
  (month(d) = 1 AND day(d) = 1)                        AS is_year_start,
  (month(d) = 12 AND day(d) = 31)                      AS is_year_end,
  CAST(day(last_day(d)) AS INTEGER)                    AS days_in_month,
  CAST((day(d) - 1) // 7 + 1 AS INTEGER)               AS week_of_month,
  strftime(d, '%Y-%m')                                 AS year_month,
  CAST(year(d) AS VARCHAR) || '-Q' || CAST(quarter(d) AS VARCHAR) AS year_quarter,
  CAST(year(d) AS VARCHAR) || '-W' || lpad(CAST(weekofyear(d) AS VARCHAR), 2, '0')
                                                       AS year_week,
  (year(d) % 4 = 0 AND (year(d) % 100 <> 0 OR year(d) % 400 = 0)) AS is_leap_year,
  CASE WHEN month(d) IN (12, 1, 2) THEN 'Winter'
       WHEN month(d) IN (3, 4, 5) THEN 'Spring'
       WHEN month(d) IN (6, 7, 8) THEN 'Summer'
       ELSE 'Fall' END                                 AS season,
  CAST(CASE WHEN month(d) >= 7 THEN year(d) + 1 ELSE year(d) END AS INTEGER)
                                                       AS fiscal_year,
  CAST(CASE WHEN month(d) BETWEEN 7 AND 9 THEN 1
            WHEN month(d) BETWEEN 10 AND 12 THEN 2
            WHEN month(d) BETWEEN 1 AND 3 THEN 3
            ELSE 4 END AS INTEGER)                     AS fiscal_quarter,
  CASE WHEN year(d) < 2010 THEN 'Pre-2010'
       WHEN year(d) BETWEEN 2010 AND 2015 THEN '2010-2015'
       WHEN year(d) BETWEEN 2016 AND 2020 THEN '2016-2020'
       ELSE '2021+' END                                AS reporting_period
FROM (
  SELECT CAST(unnest(generate_series(DATE '{start}', DATE '{end}',
                                     INTERVAL 1 DAY)) AS DATE) AS d
)
"""


def date_dim_oracle(start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    return DATE_DIM_ORACLE_SQL.format(start=start, end=end)
