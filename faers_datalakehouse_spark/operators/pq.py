"""Product quantization (PQ) for embedding compression + ADC search.

The third leg of the ANN stack (``operators/similarity.py`` has the
brute-force baseline, IVF cells, and LSH buckets): PQ attacks the
MEMORY side of 100 TB vector search. A 64-dim float vector is 256 bytes;
its PQ code here is ONE int64 — the vector is split into ``m_sub``
subvectors, each quantized to its nearest subspace centroid (a k-means
codebook per subspace), and the centroid indexes are packed into a
single integer. Search then runs over codes via **asymmetric distance
computation** (ADC, Jégou, Douze & Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): the query precomputes one
``k``-entry distance table per subspace, and a document's approximate
distance is the SUM of ``m_sub`` table lookups — no float math per
document, no decompression.

Everything stays in the repo's exact-integer regime so DuckDB reproduces
it bit-for-bit: codebooks come from the integer-exact Lloyd trainer
(``operators/kmeans.py`` — deterministic md5 seeds, integer rounding),
codes are exact argmins, and ADC tables/distances are exact int64. The
oracle unrolls one prefixed k-means CTE chain per subspace over the SAME
sliced input, re-derives the codes, and re-computes the ADC sum.

Scale shape: training collects k·dims integers per subspace (bounded
driver state); encoding is ONE codegen projection (codebooks are
expression literals — broadcast-the-model); ADC search is a projection
over the codes frame (tables are literals) + ``orderBy().limit()`` →
TakeOrderedAndProject. Nothing corpus-proportional ever reaches the
driver, and the only shuffle in search is the top-k reduction.

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import assign_expr, kmeans_ctes, train_centroids
from .parallelism import ensure_compute_parallelism
from .similarity import QUANT

CODE_BASE = 16  # codes packed base-16: requires k <= 16


def pq_train(
    emb: DataFrame,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[list[tuple[int, list[int]]]]:
    """One integer-exact k-means codebook per subspace:
    ``models[s] = [(cid, quantized centroid)]``. Bounded driver state
    (m_sub · k · d_sub integers)."""
    if dims % m_sub:
        raise ValueError(f"dims {dims} not divisible by m_sub {m_sub}")
    if k > CODE_BASE:
        raise ValueError(f"k must be <= {CODE_BASE} for base-16 packing")
    d_sub = dims // m_sub
    # the m_sub trainings are independent job chains; submit them from a
    # thread pool so their stages interleave on the cluster instead of
    # serializing m_sub · iters rounds of per-job latency (Spark's
    # scheduler is built for concurrent jobs; results are deterministic
    # regardless of submission order). Measured 17.5 s -> ~6 s at
    # m_sub=8, iters=2 on local[32].
    from concurrent.futures import ThreadPoolExecutor

    def _train_one(s: int):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(emb_col), s * d_sub + 1, d_sub).alias("embedding"),
        )
        return train_centroids(
            sub, k=k, iters=iters, id_col=id_col, emb_col="embedding"
        )

    with ThreadPoolExecutor(max_workers=m_sub) as pool:
        return list(pool.map(_train_one, range(m_sub)))


def _quantized_slice(emb_col: str, start: int, length: int):
    return F.transform(
        F.slice(F.col(emb_col), start, length),
        lambda x: F.round(x * QUANT).cast("long"),
    )


def pq_encode(
    emb: DataFrame,
    models: list[list[tuple[int, list[int]]]],
    dims: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """``(id_col, code)`` — each subspace's nearest-centroid index packed
    base-16 into one int64 (``code = Σ cid_s · 16^s``). One codegen
    projection; codebooks are expression literals."""
    m_sub = len(models)
    d_sub = dims // m_sub
    code = F.lit(0).cast("long")
    for s, model in enumerate(models):
        cid = assign_expr(model, _quantized_slice(emb_col, s * d_sub + 1, d_sub))
        code = code + cid.cast("long") * F.lit(CODE_BASE**s).cast("long")
    return ensure_compute_parallelism(emb).select(
        F.col(id_col), code.alias("code")
    )


def _adc_tables(
    models: list[list[tuple[int, list[int]]]], query: list[float]
) -> list[list[int]]:
    """Per-subspace ADC tables: exact int64 squared distance from the
    quantized query slice to every centroid, indexed by cid."""
    m_sub = len(models)
    d_sub = len(models[0][0][1])
    qq = [round(x * QUANT) for x in query]
    tables = []
    for s, model in enumerate(models):
        qs = qq[s * d_sub : (s + 1) * d_sub]
        table = [0] * len(model)
        for cid, cent in model:
            table[cid] = sum((a - b) * (a - b) for a, b in zip(qs, cent))
        tables.append(table)
    return tables


def pq_topk(
    codes: DataFrame,
    models: list[list[tuple[int, list[int]]]],
    query: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``topk`` ids by ADC distance over the codes frame:
    ``(id_col, adc_dist)``, ties broken by id. The per-document cost is
    ``m_sub`` literal-array lookups — the compressed-domain search that
    makes billion-vector scans RAM-resident."""
    tables = _adc_tables(models, query)
    dist = F.lit(0).cast("long")
    for s, table in enumerate(tables):
        cid_s = (F.col("code") / F.lit(CODE_BASE**s)).cast("long") % F.lit(
            CODE_BASE
        )
        dist = dist + F.element_at(
            F.lit(table), cid_s.cast("int") + F.lit(1)
        ).cast("long")
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def _subspace_ctes(
    m_sub: int,
    k: int,
    iters: int,
    dims: int,
    table: str,
    id_col: str,
    emb_col: str,
) -> tuple[str, str]:
    """(joined CTE text, codes CTE name): one prefixed k-means chain per
    subspace over the sliced embedding + a codes CTE packing the final
    assignments base-16."""
    d_sub = dims // m_sub
    chains = []
    for s in range(m_sub):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        chains.append(
            kmeans_ctes(
                k=k,
                iters=iters,
                dims=d_sub,
                table=table,
                id_col=id_col,
                emb_col=f"{emb_col}[{lo}:{hi}]",
                prefix=f"p{s}_",
            )
        )
    code_sum = " + ".join(
        f"p{s}_a{iters}.cid * {CODE_BASE**s}" for s in range(m_sub)
    )
    joins = f"p0_a{iters}" + "".join(
        f" JOIN p{s}_a{iters} USING ({id_col})" for s in range(1, m_sub)
    )
    codes = f"""codes AS (
  SELECT p0_a{iters}.{id_col}, CAST({code_sum} AS BIGINT) AS code
  FROM {joins}
)"""
    return ",\n".join(chains) + ",\n" + codes, "codes"


def pq_encode_oracle_sql(
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin of ``pq_encode``: per-subspace k-means chains +
    base-16 packing, bit-for-bit."""
    body, codes = _subspace_ctes(m_sub, k, iters, dims, table, id_col, emb_col)
    return f"""
WITH {body}
SELECT {id_col}, code FROM {codes}
ORDER BY {id_col}
"""


def pq_topk_oracle_sql(
    query: list[float],
    topk: int = 10,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin of ``pq_topk`` over the same training: re-derives the
    codebooks in SQL, builds the ADC tables from the DERIVED centroids
    and the quantized query literal, and sums the table lookups."""
    d_sub = dims // m_sub
    qq = [round(x * QUANT) for x in query]
    body, codes = _subspace_ctes(m_sub, k, iters, dims, table, id_col, emb_col)
    tables = []
    for s in range(m_sub):
        qs = qq[s * d_sub : (s + 1) * d_sub]
        qlist = "[" + ", ".join(str(v) for v in qs) + "]"
        tables.append(
            f"""t{s} AS (
  SELECT cid, list_sum(list_transform(range(1, {d_sub + 1}),
    j -> (cent[j] - ({qlist})[j]) * (cent[j] - ({qlist})[j]))) AS dist
  FROM p{s}_c{iters}
)"""
        )
    dist_sum = " + ".join(f"t{s}.dist" for s in range(m_sub))
    tjoins = "".join(
        f" JOIN t{s} ON t{s}.cid = (codes.code // {CODE_BASE**s}) % {CODE_BASE}"
        for s in range(m_sub)
    )
    return f"""
WITH {body},
{",".join(tables)}
SELECT codes.{id_col}, CAST({dist_sum} AS BIGINT) AS adc_dist
FROM codes{tjoins}
ORDER BY adc_dist, codes.{id_col}
LIMIT {topk}
"""
