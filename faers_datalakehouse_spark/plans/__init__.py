from .analytics import (
    global_summary,
    json_extract_agg,
    latest_day_activity,
    pct_of_total,
    pricing_summary,
    sessionize,
    temporal_trend,
    topk_by_group,
    topk_parts,
)
from .date_dim import build_date_dim, date_dim_oracle
from .star import build_fact_sales, decode_ladders_demo

__all__ = [
    "build_date_dim",
    "build_fact_sales",
    "date_dim_oracle",
    "decode_ladders_demo",
    "global_summary",
    "json_extract_agg",
    "latest_day_activity",
    "pct_of_total",
    "pricing_summary",
    "sessionize",
    "temporal_trend",
    "topk_by_group",
    "topk_parts",
]
