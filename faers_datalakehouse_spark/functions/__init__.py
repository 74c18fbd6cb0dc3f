from .text import (
    doc_fingerprint,
    language_id,
    quality_score_cols,
    token_count,
)
from .transforms import (
    age_group,
    bucketize,
    decode_ladder,
    guarded_double,
    parse_dosage,
    row_hash,
    standardize_date,
    standardize_name,
    surrogate_key,
)

__all__ = [
    "age_group",
    "bucketize",
    "decode_ladder",
    "doc_fingerprint",
    "guarded_double",
    "language_id",
    "parse_dosage",
    "quality_score_cols",
    "row_hash",
    "standardize_date",
    "standardize_name",
    "surrogate_key",
    "token_count",
]
