"""Market-basket co-occurrence mining: top item pairs by support + lift.

The classic distributed association primitive (the counting core of
Apriori/FP-growth's first two passes): which items co-occur in the same
basket more often than chance. Feeds recommenders ("customers also
bought"), substitution analysis, and — in corpus curation — co-citation
/ co-occurrence statistics over token or URL baskets.

Scale shape: the pair generation is a SELF-JOIN ON basket_id with
``item_a < item_b`` — quadratic only WITHIN a basket, and basket sizes
are bounded (TPC-H orders have ≤ 7 lineitems; retail baskets tens) so
the row growth is a small constant factor, never |items|².  The join is
a plain hash-partition on basket_id; the pair aggregation is one
map-side-combinable groupBy.  Item marginals are an |items|-sized frame
hash-joined back on each pair endpoint; the basket total is ONE row
cross-joined (broadcast) onto the pairs.  Top-N ships as
TakeOrderedAndProject — nothing corpus-sized reaches the driver.

Exactness: support counts are integers; lift is emitted in EXACT
milli-units — ``lift_milli = (pair_cnt * n_baskets * 1000) div
(cnt_a * cnt_b)`` — so the DuckDB twin (``basket_pairs_oracle_sql``)
matches bit-for-bit (the repo-wide cross-engine float rule).

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    baskets: DataFrame,
    top_n: int = 25,
    basket_col: str = "basket_id",
    item_col: str = "item",
) -> DataFrame:
    """Top-``top_n`` co-occurring item pairs over ``(basket, item)``
    rows: ``(item_a, item_b, pair_count, lift_milli)`` ordered by
    (pair_count desc, item_a, item_b) — a total order, so the limit is
    deterministic under ties."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = items.select("b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    marginals = items.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a, bb = items.alias("a"), items.alias("p")
    pairs = (
        a.join(
            bb,
            (F.col("a.b") == F.col("p.b"))
            & (F.col("a.item") < F.col("p.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("p.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    enriched = (
        pairs.join(
            marginals.select(
                F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")
            ),
            "item_a",
        )
        .join(
            marginals.select(
                F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.expr("(pair_count * n_baskets * 1000) div (cnt_a * cnt_b)")
            .cast("long")
            .alias("lift_milli"),
        )
    )
    return enriched.orderBy(
        F.desc("pair_count"), "item_a", "item_b"
    ).limit(top_n)


def basket_pairs_oracle_sql(
    baskets_sql: str, top_n: int = 25
) -> str:
    """DuckDB twin over any ``(basket_id, item)``-producing SQL."""
    return f"""
WITH items AS (SELECT DISTINCT basket_id AS b, item FROM ({baskets_sql})),
n AS (SELECT count(DISTINCT b) AS n_baskets FROM items),
marg AS (SELECT item, count(*) AS cnt FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, p.item AS item_b, count(*) AS pair_count
  FROM items a JOIN items p ON a.b = p.b AND a.item < p.item
  GROUP BY a.item, p.item
)
SELECT pairs.item_a, pairs.item_b,
       CAST(pair_count AS BIGINT) AS pair_count,
       CAST((pair_count * n.n_baskets * 1000)
            // (ma.cnt * mb.cnt) AS BIGINT) AS lift_milli
FROM pairs
JOIN marg ma ON pairs.item_a = ma.item
JOIN marg mb ON pairs.item_b = mb.item
CROSS JOIN n
ORDER BY pair_count DESC, pairs.item_a, pairs.item_b
LIMIT {top_n}
"""
