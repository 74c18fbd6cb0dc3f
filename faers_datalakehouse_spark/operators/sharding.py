"""Rendezvous (highest-random-weight) sharding — the consistent-routing
primitive for distributing a corpus over N workers/shards such that
adding or removing a shard only moves the keys that hashed to it
(1/N of the corpus), unlike ``hash(key) % N`` which reshuffles ~all keys.

Weight = the repo's engine-portable md5-prefix int64 hash of
``"<key>:<shard>"``; each key routes to the shard with the maximum
weight (ties — impossible in practice at 60 bits, but defined anyway —
break toward the LOWER shard id via lexicographic struct max on
``(weight, -shard)``). Deterministic, stateless, bit-identical in the
DuckDB twin.

Scale shape: embarrassingly parallel — one projection computing an
``n_shards``-element array per row and its struct-max, no shuffle, no
state, no driver involvement; the optional shard histogram is one
|shards|-group map-side-combinable aggregate. This is exactly how the
op runs on a 1000-executor cluster: pure scan-side compute.

Reference: Thaler & Ravishankar 1998 (HRW hashing); used by Ceph/Riak
and most shard routers. No counterpart in the reference repo
(data-distribution extension surface, alongside ``shard_manifest`` /
``proportional_split`` which do size-balanced, non-consistent splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hash64


def rendezvous_shards(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """Route every row to its HRW shard: ``(doc_id, shard, hrw_hash)``
    ordered by key. ``hrw_hash`` is the winning weight (useful for
    debugging rebalances: after adding shard N+1, exactly the rows whose
    new weight exceeds their old one move)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    candidates = F.array(
        *[
            F.struct(
                _md5_hash64(
                    F.concat(
                        F.col(key_col).cast("string"), F.lit(f":{s}")
                    )
                ).alias("h"),
                F.lit(-s).alias("negs"),
            )
            for s in range(n_shards)
        ]
    )
    best = F.array_max(candidates)
    return df.select(
        F.col(key_col).alias("doc_id"),
        (-best["negs"]).cast("int").alias("shard"),
        best["h"].alias("hrw_hash"),
    ).orderBy("doc_id")


def rendezvous_oracle_sql(
    n_shards: int = 8, table: str = "documents", key_col: str = "doc_id"
) -> str:
    cands = ", ".join(
        f"{{'h': ('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{s}'),"
        f" 1, 15))::BIGINT, 'negs': CAST(-{s} AS BIGINT)}}"
        for s in range(n_shards)
    )
    return f"""
WITH scored AS (
  SELECT {key_col} AS doc_id,
         list_max([{cands}]) AS best
  FROM {table}
)
SELECT doc_id,
       CAST(-best.negs AS INT) AS shard,
       CAST(best.h AS BIGINT) AS hrw_hash
FROM scored
ORDER BY doc_id
"""
