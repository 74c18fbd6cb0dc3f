"""Bloom-filter semi-join reduction (runtime filter pushdown by hand).

The classic 100-TB join problem: ``big JOIN small-ish`` where the join
key list is too large to broadcast as a hash table but the *bit set* of
its keys is not. A bloom filter built from the build side eliminates the
overwhelming majority of probe-side rows BEFORE the shuffle, so the
exchange moves only rows that can possibly match. Spark's own runtime
row-group filtering (``spark.sql.optimizer.runtime.bloomFilter``) does
this inside AQE when it fires; this operator makes the pattern explicit,
deterministic (fixed-seed xxhash64 positions — reproducible across runs;
see ``_positions`` for why NOT the portable md5 idiom), and available to
any plan shape, with the exact join kept as a finishing step so results
never change.

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
    """k deterministic bit positions in [0, m) via double hashing
    (Kirsch & Mitzenmacher 2006: positions ``h1 + i*h2`` preserve the
    bloom false-positive guarantee with only two base hashes).

    Hash choice: native ``xxhash64`` (two salts), NOT the repo's portable
    md5 idiom — filter construction/probing is run-internal state that no
    oracle ever reproduces (exact mode's finishing join makes the result
    hash-independent), and md5's per-eval cost is 30-50x higher: Catalyst
    pushes the filter predicate back through any hash-projection
    (PushPredicateThroughProject) and FilterExec codegen does no common-
    subexpression elimination, so the base hashes ARE re-evaluated per
    position — measured 14 s vs 1.5 s over 600 K rows x 7 positions.
    Constrained to 32/31 bits so ANSI-mode arithmetic cannot overflow.
    The key's TYPE is part of the hash: build and probe must pass
    same-typed keys (enforced in ``bloom_semi_join``)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(1 << 32))
    # odd stride (arithmetic, not `|`: Python | on Columns is logical OR)
    # so positions hit all residues of the (64-multiple) m
    h2 = (
        F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(1 << 31))
        * F.lit(2)
        + F.lit(1)
    )
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_build(df: DataFrame, key_col: str, m: int, k: int) -> list[int]:
    """Aggregate the build side into a dense ``m/64``-word bit array.
    Returns the words as a Python list (bounded driver state, KBs)."""
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    # no cast: the hash is type-sensitive, and probe keys come in native-
    # typed too — casting one side silently empties the intersection
    key = F.col(key_col)
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


def _checks(positions: list[Column], arr: Column) -> Column:
    """AND of per-position bit tests against the word array ``arr``."""
    cond = F.lit(True)
    for p in positions:
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


def bloom_might_contain(
    key: Column, arr: Column, m: int, k: int
) -> Column:
    """Membership test as one self-contained expression over ``arr`` (an
    ``array<long>`` column or true array Literal of the filter words).
    Convenient for composing into arbitrary predicates; pass the same-
    typed key the filter was built from."""
    return _checks(_positions(key, m, k), arr)


def _long_array_literal(df: DataFrame, words: list[int]) -> Column:
    """A TRUE Catalyst ``array<long>`` Literal built JVM-side.

    Neither Python-side alternative is usable at this size:
    ``F.lit(list)`` desugars to CreateArray(thousands of Literals),
    re-materialized per row; a 1-row broadcast crossJoin binds the array
    as an attribute, but the join output row then memcpys all the words
    per probe row (measured ~23 us/row at 4.5 K words). A genuine
    Literal is a constant object the generated code references — zero
    per-row cost. The words cross py4j as ONE bulk byte buffer, not
    per-element calls."""
    import struct

    spark = df.sparkSession
    gw = spark.sparkContext._gateway
    jvm = gw.jvm
    n = len(words)
    # signed little-endian pack; bytearray converts to byte[] in one hop
    buf = bytearray(struct.pack(f"<{n}q", *words))
    bb = jvm.java.nio.ByteBuffer.wrap(buf)
    bb.order(jvm.java.nio.ByteOrder.LITTLE_ENDIAN)
    jarr = gw.new_array(jvm.long, n)
    bb.asLongBuffer().get(jarr)
    return Column(jvm.org.apache.spark.sql.functions.lit(jarr))


def bloom_apply(
    df: DataFrame, key: Column, words: list[int], m: int, k: int
) -> DataFrame:
    """``df`` filtered to rows whose ``key`` might be in the filter —
    a pure scan-stage filter over a constant array Literal: no join, no
    shuffle, no exchange at all. ``key`` must have the same data type as
    the build side's key (the hash is type-sensitive)."""
    arr = _long_array_literal(df, words)
    return df.filter(bloom_might_contain(key, arr, m, k))


def sizing(n_keys: int, fp_rate: float, max_k: int = 4) -> tuple[int, int]:
    """Bloom sizing for ``n_keys`` at ``fp_rate``, with ``k`` capped
    (m rounded up to a multiple of 64).

    The textbook optimum (k = log2(1/fp), ~6.6 at 1%) is wrong on this
    engine: the probe's generated code grows ~linearly in k, and past
    ~4 position tests the filter's generated method crosses the JVM
    JIT huge-method limit and runs INTERPRETED — measured over 600 K
    rows: 0.6 s at k=4 vs 3.0 s at k=5, a cliff, not a slope. So k is
    capped and m re-solved for the target fp at the capped k
    (``fp = (1 - e^(-kn/m))^k``): at 1% that is 10.5 bits/key vs the
    unconstrained 9.6 — a 9% larger filter for a 5x faster probe at
    any scale. For extreme fp targets (<~1e-4) the capped-k m grows
    quickly; raise ``max_k`` only with a measured probe benchmark."""
    k = max(1, min(int(round(math.log(1 / fp_rate, 2))), max_k))
    m = math.ceil(-k * n_keys / math.log(1.0 - fp_rate ** (1.0 / k)))
    m = ((m + 63) // 64) * 64
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
    p_type = dict(probe.dtypes)[probe_key]
    b_type = dict(build.dtypes)[build_key]
    if p_type != b_type:
        raise ValueError(
            f"key types must match (hash is type-sensitive): probe "
            f"{probe_key}:{p_type} vs build {build_key}:{b_type}"
        )
    # no distinct(): duplicate keys set the same bits (bit_or is
    # idempotent) and LEFT SEMI tolerates duplicates — skipping it saves
    # a full shuffle of the build side on both the build and finish paths
    keys = build.select(F.col(build_key).alias("_k"))
    if n_keys_hint is None:
        # row count, not distinct count: a conservative (over-)estimate
        # only makes the filter larger, never less correct
        n_keys_hint = keys.count()
    m, k = sizing(max(n_keys_hint, 64), fp_rate)
    words = bloom_build(keys, "_k", m, k)
    filtered = bloom_apply(probe, F.col(probe_key), words, m, k)
    if not exact:
        # a true LEFT SEMI never matches a NULL key, but a NULL probe key
        # hashes to a constant and can pass the bit test — filter it out
        # so exact=False diverges ONLY by the ~fp_rate false positives
        return filtered.filter(F.col(probe_key).isNotNull())
    # join against the "_k"-renamed frame: renaming back to build_key
    # would make the condition ambiguous when probe_key == build_key
    # (the common same-name case)
    return filtered.join(
        keys, on=filtered[probe_key] == keys["_k"], how="left_semi"
    )
