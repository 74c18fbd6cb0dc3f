"""Discrete-time survival table — the Kaplan-Meier risk table over user
tenure (Kaplan & Meier, JASA 1958): for each tenure day k, how many
users were still active ("at risk"), how many churned that day, and the
discrete hazard d_k / n_k. The retention curve every growth/activation
dashboard is built on, computed from raw events in two aggregates.

Churn definition: a user's tenure runs from their first to their last
observed event day; users whose last day is the corpus' final day are
CENSORED (still alive when observation stopped) and leave the risk set
without counting as churn — dropping censoring is the classic
retention-curve bug, and the census column makes it auditable.

Integer-exact: tenure is whole days; the at-risk count at tenure k is a
suffix sum over the tenure histogram (``n_k = sum of cohort sizes with
tenure >= k``), the hazard is one integer ppm division. The corpus end
day rides a 1-row broadcast aggregate derived in-plan (the
``decayed_activity`` anchor pattern — no eager count).

Scale shape (100 TB): events collapse to per-user (first, last) in ONE
map-side-combinable groupBy; the tenure histogram is a second
(tenure-domain-sized) aggregate; the suffix-sum window runs over the
tenure-day frame — bounded by the calendar, never by users.

No counterpart in the reference repo (analytics extension surface,
alongside ``cohort_retention`` / ``funnel_steps`` / ``window_funnel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.tables import read_events


def survival_table(
    events: DataFrame,
    actor_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """``(tenure_days, n_at_risk, n_churned, n_censored, hazard_ppm)``
    per observed tenure length, ordered by tenure."""
    per_user = events.groupBy(actor_col).agg(
        F.min(F.to_date(ts_col)).alias("_first"),
        F.max(F.to_date(ts_col)).alias("_last"),
    )
    end_day = events.agg(
        F.max(F.to_date(ts_col)).alias("_end")
    )  # 1-row broadcast, in-plan
    tenured = per_user.crossJoin(F.broadcast(end_day)).select(
        F.datediff("_last", "_first").cast("long").alias(
            "tenure_days"
        ),
        (F.col("_last") == F.col("_end")).cast("long").alias("_cens"),
    )
    hist = tenured.groupBy("tenure_days").agg(
        F.count(F.lit(1)).cast("long").alias("_exit"),
        F.sum("_cens").cast("long").alias("n_censored"),
    )
    # at-risk at tenure k = users whose tenure >= k: suffix sum over
    # the tenure-day frame (calendar-bounded)
    w_suffix = (
        Window.orderBy(F.col("tenure_days").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hist.withColumn(
            "n_at_risk", F.sum("_exit").over(w_suffix).cast("long")
        )
        .select(
            "tenure_days",
            "n_at_risk",
            (F.col("_exit") - F.col("n_censored")).alias("n_churned"),
            "n_censored",
            F.expr(
                "CAST((_exit - n_censored) * 1000000 div n_at_risk "
                "AS BIGINT)"
            ).alias("hazard_ppm"),
        )
        .orderBy("tenure_days")
    )


def survival_hazard_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User tenure risk table over the event stream (last-day users
    censored)."""
    return survival_table(read_events(spark, sf_dir), "user_id")


SURVIVAL_HAZARD_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS first_d,
         max(CAST(ts AS DATE)) AS last_d
  FROM events GROUP BY 1
),
end_day AS (SELECT max(CAST(ts AS DATE)) AS end_d FROM events),
tenured AS (
  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT)
           AS tenure_days,
         CASE WHEN last_d = end_d THEN 1 ELSE 0 END AS cens
  FROM per_user CROSS JOIN end_day
),
hist AS (
  SELECT tenure_days,
         CAST(count(*) AS BIGINT) AS exits,
         CAST(sum(cens) AS BIGINT) AS n_censored
  FROM tenured GROUP BY 1
),
risk AS (
  SELECT *,
         CAST(sum(exits) OVER (ORDER BY tenure_days DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
  FROM hist
)
SELECT tenure_days, n_at_risk,
       CAST(exits - n_censored AS BIGINT) AS n_churned,
       n_censored,
       CAST((exits - n_censored) * 1000000 // n_at_risk AS BIGINT)
         AS hazard_ppm
FROM risk
ORDER BY tenure_days
"""
