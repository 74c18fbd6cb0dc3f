"""Ordered-sequence pattern matching over event streams (ClickHouse
``sequenceMatch`` / funnel-with-order parity).

"Which users did A, then later B, then later C?" — subsequence
matching with arbitrary gaps, the ordered half of funnel analytics that
a plain per-step count (``funnel_steps``) cannot express: a user who
purchased BEFORE ever clicking must not count.

Scale shape: greedy-earliest matching is provably optimal for
subsequence existence (if any match exists, the one taking the
earliest valid event at every step exists too — exchange argument), so
a K-step pattern needs K keyed aggregations, each "min event time of
type s_k strictly after the step-(k-1) time": a filter + broadcast-free
equi-join on the user key + map-side-combinable min. No windows, no
per-user sequence materialization (collect_list ordering is undefined
and user streams can be arbitrarily long); every stage is a plain
hash-shuffle keyed by user. K is the pattern length — a constant.

Ties: multiple events of the wanted type at the same timestamp
collapse under min() — only the TIME advances matching, so the match
decision and all reported times stay deterministic. Timestamps compare
strictly (``>``): a same-timestamp follow-up does NOT satisfy "then
later" (document the convention; ClickHouse's (?1)(?2) is >= — using
strict > avoids double-counting simultaneous rows from one ingest
batch).

No counterpart in the reference (event-analytics extension surface).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seq_match(
    events: DataFrame,
    pattern: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Users whose event stream contains ``pattern`` as a strict
    time-ordered subsequence; one row per matching user with the
    greedy-earliest match times ``t1..tK`` and the whole-seconds span.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("ts"),
    )
    cur = (
        base.where(F.col("et") == pattern[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t1"))
    )
    for k, step in enumerate(pattern[1:], start=2):
        nxt = base.where(F.col("et") == step).select(
            F.col("u").alias("_nu"), F.col("ts").alias("_nts")
        )
        cur = (
            cur.join(nxt, cur["u"] == nxt["_nu"])
            .where(F.col("_nts") > F.col(f"t{k - 1}"))
            .groupBy("u", *[f"t{i}" for i in range(1, k)])
            .agg(F.min("_nts").alias(f"t{k}"))
        )
    k = len(pattern)
    span = F.expr(
        f"timestampdiff(SECOND, date_trunc('second', t1),"
        f" date_trunc('second', t{k}))"
    ).cast("long")
    return cur.select(
        F.col("u").alias(user_col),
        *[f"t{i}" for i in range(1, k + 1)],
        span.alias("span_s"),
    ).orderBy(user_col)


def seq_match_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: the click -> view -> purchase ordered funnel."""
    from ..sources.tables import read_events

    return seq_match(
        read_events(spark, sf_dir), ("click", "view", "purchase")
    )


SEQ_MATCH_SQL = """
WITH m1 AS (
  SELECT user_id AS u, min(ts) AS t1
  FROM events WHERE event_type = 'click' GROUP BY 1
), m2 AS (
  SELECT e.user_id AS u, m1.t1, min(e.ts) AS t2
  FROM events e JOIN m1 ON e.user_id = m1.u
  WHERE e.event_type = 'view' AND e.ts > m1.t1
  GROUP BY 1, 2
), m3 AS (
  SELECT e.user_id AS u, m2.t1, m2.t2, min(e.ts) AS t3
  FROM events e JOIN m2 ON e.user_id = m2.u
  WHERE e.event_type = 'purchase' AND e.ts > m2.t2
  GROUP BY 1, 2, 3
)
SELECT u AS user_id, t1, t2, t3,
       date_diff('second', date_trunc('second', t1),
                 date_trunc('second', t3)) AS span_s
FROM m3
ORDER BY user_id
"""
