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


def window_funnel(
    events: DataFrame,
    pattern: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-BOUNDED funnel (ClickHouse ``windowFunnel`` parity): per
    user, the maximum number of pattern steps completed within
    ``window_seconds`` of the chain's FIRST event, plus how many
    step-1 events start a complete chain.

    Matching anchors at EVERY step-1 event (the optimal chain's anchor
    need not be the earliest one), then extends greedily: with the
    anchor fixed, taking the earliest valid next event is optimal
    (exchange argument), so each extension is one forward as-of join
    (``operators.asof``, ``>=`` tie semantics — a same-timestamp
    follow-up counts, documented). Cost: K-1 forward as-of joins over
    the step-1 events — each a keyed union + window, no cross products;
    the final reduction is one groupBy(user).

    Returns ``(user, max_steps, n_complete, n_starts)``.
    """
    from .asof import as_of_join

    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("ts"),
    )
    cur = base.where(F.col("et") == pattern[0]).select(
        "u", F.col("ts").alias("t1")
    )
    for k, step in enumerate(pattern[1:], start=2):
        nxt = base.where(F.col("et") == step).select(
            "u", F.col("ts").alias(f"_s{k}")
        )
        cur = as_of_join(
            cur,
            nxt,
            on=["u"],
            left_ts=f"t{k - 1}",
            right_ts=f"_s{k}",
            right_cols=[],
            direction="forward",
            suffix=f"_m{k}",
        ).withColumnRenamed(f"_s{k}_m{k}", f"t{k}")
    k = len(pattern)
    horizon = F.col("t1") + F.expr(f"INTERVAL {int(window_seconds)} SECOND")
    steps = F.lit(1)
    reached = F.lit(True)
    for i in range(2, k + 1):
        reached = (
            reached
            & F.col(f"t{i}").isNotNull()
            & (F.col(f"t{i}") <= horizon)
        )
        steps = steps + reached.cast("int")
    per_anchor = cur.select(
        "u", steps.alias("steps")
    )
    return (
        per_anchor.groupBy("u")
        .agg(
            F.max("steps").alias("max_steps"),
            F.sum((F.col("steps") == k).cast("long")).alias("n_complete"),
            F.count(F.lit(1)).alias("n_starts"),
        )
        .select(
            F.col("u").alias(user_col),
            "max_steps",
            "n_complete",
            "n_starts",
        )
        .orderBy(user_col)
    )


def window_funnel_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: click -> view -> purchase within 2 hours."""
    from ..sources.tables import read_events

    return window_funnel(
        read_events(spark, sf_dir),
        ("click", "view", "purchase"),
        window_seconds=7200,
    )


WINDOW_FUNNEL_SQL = """
WITH anchors AS (
  SELECT user_id AS u, ts AS t1 FROM events WHERE event_type = 'click'
), chains AS (
  SELECT a.u, a.t1, v.t2, p.t3
  FROM anchors a
  LEFT JOIN LATERAL (
    SELECT min(ts) AS t2 FROM events e
    WHERE e.user_id = a.u AND e.event_type = 'view' AND e.ts >= a.t1
  ) v ON true
  LEFT JOIN LATERAL (
    SELECT min(ts) AS t3 FROM events e
    WHERE e.user_id = a.u AND e.event_type = 'purchase'
      AND v.t2 IS NOT NULL AND e.ts >= v.t2
  ) p ON true
), scored AS (
  SELECT u,
         1 + CAST(t2 IS NOT NULL
                  AND t2 <= t1 + INTERVAL 7200 SECOND AS INT)
           + CAST(t2 IS NOT NULL AND t2 <= t1 + INTERVAL 7200 SECOND
                  AND t3 IS NOT NULL
                  AND t3 <= t1 + INTERVAL 7200 SECOND AS INT) AS steps
  FROM chains
)
SELECT u AS user_id,
       CAST(max(steps) AS INT) AS max_steps,
       CAST(sum(CASE WHEN steps = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_complete,
       CAST(count(*) AS BIGINT) AS n_starts
FROM scored GROUP BY u
ORDER BY user_id
"""
