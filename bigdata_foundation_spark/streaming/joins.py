"""Stream-stream joins.

The canonical attribution shape: join a click stream against a
purchase stream on user with a bounded event-time interval. Both
sides carry watermarks, and the join condition bounds purchase time
to [click_ts, click_ts + horizon], so Spark can size the join state
buffers and evict rows once the watermark passes — without the time
bound, stream-stream join state grows forever (the 100 TB failure
mode).

Contract (tested): an availableNow replay of the streaming join over
a static events table equals the equivalent batch interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: every (click, purchase) pair for the
    same user where the purchase lands within ``horizon`` after the
    click. ``events`` may be a streaming or batch DataFrame with
    columns (event_id, ts, user_id, event_type, value); watermarks are
    only attached on the streaming path.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("_p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    return joined.select(
        "click_id",
        "user_id",
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )
