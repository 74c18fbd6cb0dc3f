"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- ``topk_neighbors_bruteforce`` — exact top-k cosine neighbors. The query set
  is broadcast against the corpus, the dot product runs as a JVM array kernel
  (``zip_with`` + ``aggregate``), and per-query top-k is a ranked window. At
  100 TB the corpus side stays partitioned and is scanned once per batch of
  queries — the right baseline, and embarrassingly parallel.
- ``lsh_bucketed_neighbors`` — random-hyperplane LSH: sign-bit signatures
  bucket the corpus; each query searches only its bucket (plus the exact
  kernel for ranking). Probabilistic recall, linear cost — the scale path.

Determinism for the oracle harness: embeddings are quantized to integers
(round(x*1000)) before the dot product, making scores exact integer sums that
any engine reproduces bit-for-bit; cosine then divides by exact-integer norms
with IEEE-rounded double ops (identical everywhere). Ranking ties break on
neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import fan_out

QUANT = 1000


def _quantized(col: Column) -> Column:
    return F.transform(col, lambda x: F.round(x * QUANT).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _dot_sql_text(a: str, b: str) -> str:
    """SQL text of ``_dot`` over two array-typed SQL fragments.

    Plan-construction fast path (guide §7.3): building a zip_with/aggregate
    lambda tree through py4j costs several bridge round-trips per node —
    ~1.3 s per 16-centroid/16-plane builder at dim=64, measured r12 — while
    ``F.expr`` on the equivalent SQL text is ONE bridge call and a JVM-side
    parse to the identical Catalyst expression (verified result- and
    type-identical by ``tests/test_sql_expr_parity.py``). Lambda variables
    are double-underscored to avoid capturing caller column names."""
    return (
        f"aggregate(zip_with({a}, {b}, (__x, __y) -> __x * __y), "
        f"CAST(0 AS BIGINT), (__acc, __v) -> __acc + __v)"
    )


def _long_array_sql_text(vals) -> str:
    """SQL text of ``F.lit([int, ...])`` — an array<bigint> literal."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _cosine(dot: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """Quantized cosine rounded to 6 dp — THE oracle-parity formula (the
    SQL twins restate it verbatim); one definition so quantization or
    rounding changes cannot drift between the five similarity kernels."""
    return F.round(
        dot.cast("double")
        / (F.sqrt(norm2_a.cast("double")) * F.sqrt(norm2_b.cast("double"))),
        6,
    )


def with_quantized_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    q = _quantized(F.col(emb_col))
    return df.withColumn("q_emb", q).withColumn("q_norm2", _dot(F.col("q_emb"), F.col("q_emb")))


def topk_neighbors_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector over the corpus."""
    c = with_quantized_norm(
        fan_out(corpus.select(id_col, emb_col), id_col), emb_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q_emb").alias("c_emb"),
        F.col("q_norm2").alias("c_norm2"),
    )
    q = with_quantized_norm(queries.select(id_col, emb_col), emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q_emb").alias("qq_emb"),
        F.col("q_norm2").alias("qq_norm2"),
    )
    dot = _dot(F.col("qq_emb"), F.col("c_emb"))
    cosine = _cosine(dot, F.col("qq_norm2"), F.col("c_norm2"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


ANN_TOPK_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings WHERE vec_id % {query_mod} = 0
),
c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS ce
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(q.qe, c.ce),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.qe, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.ce, x -> x*x)) AS DOUBLE))),
           6) AS cosine
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def cosine_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, self-join).

    VERIFICATION KERNEL ONLY — quadratic (O(n²) candidate rows). The default
    near-dup path callers should reach first is ``lsh_bucketed_neardup``,
    which blocks candidates into LSH buckets (linear + in-bucket pairs) and
    applies this same exact cosine inside each bucket.
    """
    e = with_quantized_norm(
        fan_out(corpus.select(id_col, emb_col), id_col), emb_col
    ).select(F.col(id_col).alias("id"), "q_emb", "q_norm2")
    a, b = e.alias("a"), e.alias("b")
    dot = _dot(F.col("a.q_emb"), F.col("b.q_emb"))
    cosine = _cosine(dot, F.col("a.q_norm2"), F.col("b.q_norm2"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


COSINE_NEARDUP_SQL_TEMPLATE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2]))
              AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(a.qe, x -> x*x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(b.qe, x -> x*x)) AS DOUBLE))),
         6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(
        CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2]))
             AS DOUBLE)
        / (sqrt(CAST(list_sum(list_transform(a.qe, x -> x*x)) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(b.qe, x -> x*x)) AS DOUBLE))),
        6) >= {threshold}
ORDER BY id_a, id_b
"""

# Fixed deterministic hyperplanes for the LSH path: plane p, dim d weight is
# derived from xxhash64-style integer mixing of (p, d) — no RNG dependency.


def _plane_mix(p: int, d: int) -> int:
    h = (p * 2654435761 + d * 40503) & 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 2246822519) & 0xFFFFFFFF
    h ^= h >> 13
    return h & 0xFFFF


def _plane_weight_int(p: int, d: int) -> int:
    """Integer hyperplane weight in [-65535, 65535] (2*mix - 65535).

    The projection sum(q_emb * w) stays in exact integer arithmetic, so the
    sign bit — and therefore the bucket id — is bit-identical across engines
    (a float projection could flip sign near 0 under a different summation
    order). Every LSH path in this module uses these integer planes; there
    is deliberately no float-plane variant.
    """
    return _plane_mix(p, d) * 2 - 65535


def lsh_bucketed_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN via random-hyperplane LSH bucketing + exact rescoring in-bucket.

    Signature = ``n_planes`` sign bits of fixed INTEGER hyperplane dot
    products over the quantized embedding (``_int_band_bucket``), built with
    ``zip_with``/``aggregate`` (JVM-side). Integer projections make the sign
    bit — and therefore the bucket id — bit-identical across engines (a float
    projection near 0 can flip sign under a different summation order), so
    this approximate path is still exactly oracle-reproducible
    (``ann_lsh_oracle_sql``). The query-corpus join is equi on the bucket id,
    so Catalyst plans a hash join keyed by bucket instead of a cross product.
    """
    c = with_quantized_norm(
        fan_out(corpus.select(id_col, emb_col), id_col), emb_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        _int_band_bucket("q_emb", 0, n_planes, dim).alias("bucket"),
        F.col("q_emb").alias("c_emb"),
        F.col("q_norm2").alias("c_norm2"),
    )
    q = with_quantized_norm(queries.select(id_col, emb_col), emb_col).select(
        F.col(id_col).alias("query_id"),
        _int_band_bucket("q_emb", 0, n_planes, dim).alias("bucket"),
        F.col("q_emb").alias("qq_emb"),
        F.col("q_norm2").alias("qq_norm2"),
    )
    dot = _dot(F.col("qq_emb"), F.col("c_emb"))
    cosine = _cosine(dot, F.col("qq_norm2"), F.col("c_norm2"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_topk_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into cells, search the query's cells.

    The inverted-file layout: ``n_cells`` centroids — a deterministic
    pseudo-random sample of the corpus (smallest md5-hash of the id, the
    same engine-portable hash as ``sampling._hash_bucket``; a hash-ordered
    pick is an unbiased sample, where lowest-id rows could be arbitrarily
    clustered if ids correlate with content). Every corpus vector is
    assigned to its nearest centroid by quantized dot product; each query
    probes its ``nprobe`` nearest cells and is scored exactly against their
    union. Assignment, probing, and ranking are exact integer/IEEE math, so
    the operator is oracle-reproducible at ANY nprobe despite being an
    approximation of brute force. Recall is monotone in nprobe: more probed
    cells can only add candidates (tested).

    Scale: assignment is a per-row kernel against ``n_cells`` broadcast
    centroids; the search join is equi on cell id (hash join, no cross
    product); the corpus is scanned once; a query costs nprobe/n_cells of
    the corpus. A corpus row lives in exactly one cell, so probed cells
    never produce duplicate candidates.
    """
    from .dedup import _md5_hash64

    cents_rows = (
        corpus.select(id_col, emb_col)
        .orderBy(_md5_hash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    cent_q = sorted(
        (int(r[id_col]), [int(round(x * QUANT)) for x in r[emb_col]])
        for r in cents_rows
    )

    def cells_of(emb: str, n: int) -> Column:
        """Array of the ``n`` nearest centroid ids (dot DESC, cid ASC ties)
        for the embedding column named ``emb``.

        Built as array_sort over (-dot, cid) structs: a chained
        when(d > best, ...) ladder would reference the running best twice
        per level — an exponential (2^n_cells) expression blow-up. The whole
        expression is ONE ``F.expr`` parse — n_cells × (array literal + two
        dot lambdas + struct) built through py4j measured ~1.3 s of driver
        time per call at 16×64 (r12, guide §7.3); the parse yields the
        identical Catalyst tree (``tests/test_sql_expr_parity.py``). The
        ``element_at(transform(array(<quantized>), __q -> ...), 1)`` shell
        is ``_let``: it binds the quantized array once so the n_cells dot
        products don't each re-quantize."""
        structs = ", ".join(
            f"named_struct('negdot', "
            f"-{_dot_sql_text('__q', _long_array_sql_text(cvec))}, "
            f"'cid', {int(cid)})"
            for cid, cvec in cent_q
        )
        quant = (
            f"transform(`{emb}`, __e -> "
            f"CAST(round(__e * {QUANT}, 0) AS BIGINT))"
        )
        return F.expr(
            f"element_at(transform(array({quant}), "
            f"__q -> transform(slice(array_sort(array({structs})), 1, {n}), "
            f"__s -> __s.cid)), 1)"
        )

    c = with_quantized_norm(
        fan_out(corpus.select(id_col, emb_col), id_col), emb_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(cells_of(emb_col, 1), 1).alias("cell"),
        F.col("q_emb").alias("c_emb"),
        F.col("q_norm2").alias("c_norm2"),
    )
    q = with_quantized_norm(queries.select(id_col, emb_col), emb_col).select(
        F.col(id_col).alias("query_id"),
        F.explode(cells_of(emb_col, nprobe)).alias("cell"),
        F.col("q_emb").alias("qq_emb"),
        F.col("q_norm2").alias("qq_norm2"),
    )
    dot = _dot(F.col("qq_emb"), F.col("c_emb"))
    cosine = _cosine(dot, F.col("qq_norm2"), F.col("c_norm2"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


IVF_TOPK_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cid, qe AS ce FROM q
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT, vec_id
  LIMIT {n_cells}
),
ranked_cells AS (
  SELECT v.vec_id, v.qe, c.cid,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_sum(list_transform(list_zip(v.qe, c.ce),
                                            p -> p[1] * p[2])) DESC,
                    c.cid ASC) AS rn
  FROM q v CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, qe, cid AS cell FROM ranked_cells WHERE rn = 1
),
probe AS (
  SELECT vec_id, qe, cid AS cell FROM ranked_cells
  WHERE rn <= {nprobe} AND vec_id % {query_mod} = 0
),
scored AS (
  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(qq.qe, cc.qe),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(qq.qe, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(cc.qe, x -> x*x)) AS DOUBLE))),
           6) AS cosine
  FROM probe qq JOIN assigned cc
    ON qq.cell = cc.cell AND qq.vec_id <> cc.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _int_band_bucket(emb_q: str, band: int, n_planes: int, dim: int) -> Column:
    """Bucket id for one LSH band: n_planes sign bits of exact integer
    projections of the quantized embedding onto fixed integer hyperplanes.
    ``emb_q`` is the SQL name of the quantized-embedding column — the whole
    bucket expression is built as ONE ``F.expr`` parse instead of
    n_planes × (literal + two lambdas + when) py4j constructions, which
    measured ~1.1 s of pure driver time per 16-plane band (r12, guide
    §7.3); the parsed tree is the identical Catalyst expression
    (``tests/test_sql_expr_parity.py``).

    Guards embedding length == dim inside the expression: zip_with pads a
    length mismatch with NULLs, NULLing every projection, and the sign
    test would then put EVERY vector in bucket 0 — silently degrading the
    blocked join to a full cross product (and diverging from the DuckDB
    oracle, whose list_sum skips NULLs). assert_true fails the job
    instead."""
    terms = []
    for i in range(n_planes):
        p = band * n_planes + i
        plane = _long_array_sql_text(
            _plane_weight_int(p, d) for d in range(dim)
        )
        terms.append(
            f"(CASE WHEN {_dot_sql_text(emb_q, plane)} >= 0 "
            f"THEN 1 ELSE 0 END) * {2 ** i}"
        )
    out = " + ".join(terms)
    guard = (
        f"assert_true(size({emb_q}) = {dim}, "
        f"'embedding length must equal dim={dim} for LSH planes')"
    )
    return F.expr(f"CASE WHEN isnull({guard}) THEN {out} END")


def lsh_bucketed_neardup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 10,
    n_bands: int = 2,
    dim: int = 64,
    materialize: bool = False,
) -> DataFrame:
    """DEFAULT embedding near-dup: LSH bucket blocking + exact in-bucket cosine.

    The scale path ``cosine_neardup_pairs`` is the verify kernel for:
    each vector gets ``n_bands`` (band, bucket) keys from deterministic
    integer hyperplanes; candidate pairs come from an equi-join on
    (band, bucket) — a hash join producing only in-bucket pairs, never the
    all-pairs cross product — then the exact quantized cosine filters at
    ``threshold`` and cross-band duplicates collapse via distinct.

    Cost: linear scan + Σ_bucket |bucket|² candidate pairs. Recall is
    probabilistic (a near-dup pair is found iff it shares ≥1 band bucket —
    ~(1 - (1-s^1)^bands) per-band collision for sign-bit similarity s), but
    every *emitted* pair is exact — precision 1.0 against the kernel. More
    bands → higher recall, same plan shape.

    Fully oracle-reproducible: bucket ids are exact integer arithmetic
    (see ``_plane_weight_int``), so DuckDB computes identical buckets.
    """
    e = with_quantized_norm(
        fan_out(corpus.select(id_col, emb_col), id_col), emb_col
    ).select(F.col(id_col).alias("id"), "q_emb", "q_norm2")
    banded = e.select(
        "id",
        "q_emb",
        "q_norm2",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _int_band_bucket("q_emb", b, n_planes, dim).alias(
                            "bucket"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "q_emb", "q_norm2", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if materialize:
        # Optionally persist the signature frame so both self-join sides
        # reuse it. Unlike MinHash (where the shingle subtree would inline
        # into 64 signature expressions — multiplicative blowup), the
        # recompute here is exactly 2× a cheap linear pass; at corpus scale
        # recomputing usually beats materializing the embedding payload, so
        # the default is off. The cache outlives this call — the CALLER owns
        # cleanup (`spark.catalog.clearCache()` or unpersist via the plan
        # cache manager) once the result is consumed.
        banded = banded.persist()
    a, b = banded.alias("a"), banded.alias("b")
    dot = _dot(F.col("a.q_emb"), F.col("b.q_emb"))
    cosine = _cosine(dot, F.col("a.q_norm2"), F.col("b.q_norm2"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
        .orderBy("id_a", "id_b")
    )


def _bucket_sql_expr(band: int, n_planes: int, dim: int, qe: str = "qe") -> str:
    """DuckDB expression computing ``_int_band_bucket`` for one band."""
    terms = []
    for i in range(n_planes):
        p = band * n_planes + i
        plane = "list_value(" + ",".join(
            str(_plane_weight_int(p, d)) for d in range(dim)
        ) + ")"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip({qe}, {plane}), "
            f"p -> p[1] * p[2])) >= 0 THEN {2 ** i} ELSE 0 END)"
        )
    return " + ".join(terms)


def ann_lsh_oracle_sql(
    query_mod: int,
    k: int,
    n_planes: int = 8,
    dim: int = 64,
    quant: int = QUANT,
) -> str:
    """DuckDB twin of ``lsh_bucketed_neighbors`` — identical integer buckets,
    identical quantized cosine, identical (cosine DESC, neighbor_id) ranking.
    """
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings
),
sig AS (
  SELECT vec_id, qe, {_bucket_sql_expr(0, n_planes, dim)} AS bucket FROM e
),
q AS (
  SELECT * FROM sig WHERE vec_id % {query_mod} = 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(q.qe, c.qe),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.qe, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.qe, x -> x*x)) AS DOUBLE))),
           6) AS cosine
  FROM q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def lsh_neardup_oracle_sql(
    threshold: float,
    n_planes: int = 10,
    n_bands: int = 2,
    dim: int = 64,
    quant: int = QUANT,
) -> str:
    """DuckDB twin of ``lsh_bucketed_neardup`` — identical integer buckets."""
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, qe, {b} AS band,"
        f" {_bucket_sql_expr(b, n_planes, dim)} AS bucket FROM e"
        for b in range(n_bands)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings
),
sig AS (
{band_selects}
),
scored AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1] * p[2]))
                AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(a.qe, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(b.qe, x -> x*x)) AS DOUBLE))),
           6) AS cosine
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM scored
WHERE cosine >= {threshold}
ORDER BY id_a, id_b
"""


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k of the IVF approximate path against the exact
    brute-force neighbors, per query: ``(query_id, n_exact, n_hits,
    recall_pct)``.

    An ANN index you can't measure is an ANN index you can't trust —
    every production vector store ships a recall harness; this is the
    engine-native one, and because both paths are integer-exact the
    recall numbers themselves are oracle-reproducible (recall_pct is an
    integer ``hits*100 div n_exact``). The exact side is the
    declared-quadratic verify kernel — this harness inherits its
    verify-only scale contract (sample queries, never the full corpus).
    """
    exact = topk_neighbors_bruteforce(
        corpus, queries, id_col=id_col, emb_col=emb_col, k=k
    ).select("query_id", "neighbor_id")
    approx = ivf_topk_neighbors(
        corpus, queries, id_col=id_col, emb_col=emb_col, k=k,
        n_cells=n_cells, nprobe=nprobe,
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hits",
            F.expr("(n_hits * 100) div n_exact").alias("recall_pct"),
        )
        .orderBy("query_id")
    )


ANN_RECALL_SQL_TEMPLATE = """
WITH exact AS (
  SELECT query_id, neighbor_id FROM ({exact_sql})
),
approx AS (
  SELECT query_id, neighbor_id, 1 AS hit FROM ({ivf_sql})
)
SELECT e.query_id,
       count(*) AS n_exact,
       CAST(COALESCE(sum(a.hit), 0) AS BIGINT) AS n_hits,
       (CAST(COALESCE(sum(a.hit), 0) AS BIGINT) * 100) // count(*)
         AS recall_pct
FROM exact e LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY e.query_id
ORDER BY query_id
"""
