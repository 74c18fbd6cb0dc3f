"""Watermarked stream-stream joins (click -> purchase attribution).

The one Structured Streaming shape the events suite did not yet cover:
joining two UNBOUNDED inputs. Spark buffers both sides in state and uses
the combination of watermarks + a time-range join condition to know when
a buffered row can never match again and evict it — without the range
condition (or with unwatermarked inputs) the state grows forever, which
is the 100 TB-stream failure mode this module is shaped around. Inner
joins need the range condition for eviction; the left-outer variant
additionally needs it to know when to emit the unmatched (NULL-padded)
row. Reference is batch-only (streaming listed as a future enhancement,
reference README); semantics follow the Structured Streaming programming
guide's stream-stream join contract.

Tests drive both sides from a file source over the SAME events directory
(filtered to click/purchase) with ``availableNow`` + a parquet sink, and
pin equality to the batch join — the repo-wide streaming verification
pattern (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: every (click, purchase) pair for the
    same user where the purchase lands within ``horizon`` after the
    click — the classic last-mile attribution input. Returns
    ``(user_id, click_id, click_ts, purchase_id, purchase_ts,
    value_cents)``.

    Both sides are watermarked and the join carries the time-range
    condition, so each side's buffered state is bounded by
    ``watermark + horizon`` of data — the eviction contract that makes
    the join runnable on unbounded inputs. Works identically on batch
    frames (watermark is a no-op there), which is what the equality
    test pins.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "value_cents",
    )
