"""Bloom-filter semi-join reduction (runtime filter pushdown by hand).

The classic 100-TB join problem: ``big JOIN small-ish`` where the join
key list is too large to broadcast as a hash table but the *bit set* of
its keys is not. A bloom filter built from the build side eliminates the
overwhelming majority of probe-side rows BEFORE the shuffle, so the
exchange moves only rows that can possibly match. Spark's own runtime
row-group filtering (``spark.sql.optimizer.runtime.bloomFilter``) does
this inside AQE when it fires; this operator makes the pattern explicit,
deterministic (md5-derived positions — reproducible across engines and
runs), and available to any plan shape, with the exact join kept as a
finishing step so results never change.

Scale shape:
- **build**: one narrow projection (k positions per key) + ``groupBy
  word`` with ``bit_or`` partial aggregation — the shuffle carries at
  most ``m/64`` rows regardless of build-side size;
- **state**: ``m/64`` longs collected to the driver (m = 2^20 bits ->
  16 K longs = 128 KB) — the bounded "broadcast-the-model" pattern used
  by the k-means assignment stage;
- **probe**: a pure whole-stage-codegen expression over an array
  literal — zero shuffle, zero join, evaluated inside the parquet scan
  stage so filter pushdown/column pruning are unaffected.

False positives pass the filter (and are removed by the finishing exact
join when ``exact=True``); false negatives are impossible — the property
tests pin both.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m: int, k: int) -> list[Column]:
    """k deterministic bit positions in [0, m) — salted md5, the repo's
    portable-hash idiom."""
    out = []
    for i in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(i), key)), 1, 8), 16, 10
        ).cast("long")
        out.append(F.pmod(h, F.lit(m)))
    return out


def bloom_build(df: DataFrame, key_col: str, m: int, k: int) -> list[int]:
    """Aggregate the build side into a dense ``m/64``-word bit array.
    Returns the words as a Python list (bounded driver state, KBs)."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, m, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * (m // 64)
    for r in words:
        dense[r["word"]] = r["bits"]
    return dense


def bloom_might_contain(
    key: Column, words: list[int], m: int, k: int
) -> Column:
    """Membership test as a pure expression: true iff all k bits are set.
    The word array rides in the plan as a literal (codegen'd lookup);
    no join, no shuffle."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for p in _positions(key, m, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # call_function: the Python shiftleft wrapper only accepts an int
        # literal shift; the SQL function takes a column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        # bit set <=> word & mask == mask (mask may be the sign bit;
        # compare masked value, never test > 0)
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


def sizing(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """Textbook bloom sizing: optimal (m, k) for ``n_keys`` at
    ``fp_rate`` (m rounded up to a multiple of 64)."""
    m = int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    fp_rate: float = 0.01,
    exact: bool = True,
    n_keys_hint: int | None = None,
) -> DataFrame:
    """``probe`` rows whose key appears in ``build`` — a LEFT SEMI join
    where the shuffle input is first cut down by a broadcast bloom
    filter. ``exact=True`` (default) finishes with the real semi-join, so
    the result is identical to ``probe.join(build, ..., "left_semi")``;
    ``exact=False`` keeps the ~``fp_rate`` false positives and skips the
    finishing shuffle entirely (the right trade when a downstream join
    re-checks the key anyway)."""
    build_key = build_key or probe_key
    keys = build.select(F.col(build_key).alias("_k")).distinct()
    if n_keys_hint is None:
        n_keys_hint = keys.count()  # scalar agg; one pass over build side
    m, k = sizing(max(n_keys_hint, 64), fp_rate)
    words = bloom_build(keys, "_k", m, k)
    filtered = probe.filter(
        bloom_might_contain(F.col(probe_key).cast("string"), words, m, k)
    )
    if not exact:
        return filtered
    return filtered.join(
        keys.withColumnRenamed("_k", build_key),
        on=filtered[probe_key] == F.col(build_key),
        how="left_semi",
    )
