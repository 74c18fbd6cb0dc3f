"""SemDeDup-style semantic deduplication (cluster-blocked exact cosine).

The technique from Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540): k-means the
embedding space, then look for near-duplicate pairs ONLY inside each
cluster — semantically close points land in the same cell, so the O(n²)
pair search collapses to O(Σ cluster_size²) while still catching the
paraphrase-level duplicates that token-hash dedup (MinHash/SimHash) misses.

Spark-first layout:
- blocking = ``kmeans_assign`` (exact-integer Lloyd, ``operators/kmeans.py``)
  — assignment is one codegen'd projection per round, centroids ride along
  as broadcast literals;
- the pair search is a hash **equi-join on cluster_id** with an ``id_a <
  id_b`` residual — never a cartesian; Catalyst plans a shuffled hash join
  keyed on the cluster, so each task sees one cluster's rows (the classic
  blocked self-join);
- the in-cluster similarity is the same exact quantized-integer cosine the
  verify kernel uses (``similarity.cosine_neardup_pairs``), so the whole
  pipeline — clustering included — is bit-reproducible in DuckDB.

At 100 TB: k scales with the corpus (SemDeDup used 110k clusters for LAION)
keeping clusters bounded; the equi-join shuffles each row once on its
cluster key, and AQE's skew splitting handles an oversized cell. The
quadratic term is per-cluster, which is exactly the knob k controls.

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import assign_expr, kmeans_ctes, train_centroids
from .parallelism import ensure_compute_parallelism
from .similarity import _cosine, _dot, with_quantized_norm


def semantic_neardup_pairs(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-duplicate pairs:
    ``(cluster_id, id_a, id_b, cosine)`` ordered by (id_a, id_b).

    Pairs crossing cluster boundaries are *not* reported — that recall loss
    is SemDeDup's deliberate trade for linearity, and callers wanting belt
    and braces union this with the hash-based ``minhash_lsh_pairs``.
    """
    # Train once on the driver (k·dims integers), then compute the cluster
    # id in the SAME pass that quantizes (the numpy Arrow kernel carries
    # q_emb/q_norm2 through as passthrough columns) — joining a separate
    # kmeans_assign frame back by id would shuffle the corpus on id once
    # per self-join side for an assignment derivable from the vector
    # already in hand.
    from .kmeans import assign_kernel_frame

    # ONE quantize pass + cache shared by the Lloyd rounds AND the
    # assignment kernel (r13): training previously quantized its own
    # copy of the corpus and the q_emb/q_norm2 projection below
    # re-scanned and re-quantized it a second time. Run-internal cache
    # (bench clearCache per run), kept until eviction — same policy as
    # the assignment frame below.
    emb = ensure_compute_parallelism(emb)
    qn = (
        with_quantized_norm(emb.select(id_col, emb_col), emb_col)
        .select(F.col(id_col).alias("id"), "q_emb", "q_norm2")
        .persist()
    )
    # id_col="id": the shared frame aliases the id; seeding hashes the
    # VALUES, so the seed set (and every centroid) is unchanged
    cents = train_centroids(
        emb, k=k, iters=iters, id_col="id", emb_col=emb_col,
        quantized=qn, qv_col="q_emb",
    )
    # Persist the assignment frame: BOTH self-join sides consume it, and
    # mapInPandas is opaque to Catalyst (no subtree reuse across the
    # broadcast build/probe sides), so unpersisted the quantize+assign
    # Arrow kernel ran TWICE over the corpus — the r12 before-plan shows
    # two MapInPandas nodes over two separate parquet scans (guide §5
    # "caching is worth it when a DataFrame is reused and recomputing is
    # expensive"). Run-internal cache, cleared by bench/clearCache like
    # the minhash and allpairs frames.
    e = assign_kernel_frame(
        qn, cents, id_col="id", qv_col="q_emb",
        passthrough=("q_emb", "q_norm2"),
    ).persist()
    a, b = e.alias("a"), e.alias("b")
    cosine = _cosine(
        _dot(F.col("a.q_emb"), F.col("b.q_emb")),
        F.col("a.q_norm2"),
        F.col("b.q_norm2"),
    )
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.cluster_id").alias("cluster_id"),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def semantic_neardup_oracle_sql(
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin: the shared k-means CTE chain, then the identical
    quantized-integer cosine over same-cluster pairs. ``a{iters}.qv`` IS the
    quantized vector, so norms/dots reuse it directly."""
    body = kmeans_ctes(k, iters, dims, table, id_col, emb_col)
    cos = (
        "round(CAST(list_sum(list_transform(list_zip(a.qv, b.qv),"
        " p -> p[1] * p[2])) AS DOUBLE)"
        " / (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS DOUBLE))"
        " * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS DOUBLE))),"
        " 6)"
    )
    return f"""
WITH {body}
SELECT a.cid AS cluster_id,
       a.{id_col} AS id_a,
       b.{id_col} AS id_b,
       {cos} AS cosine
FROM a{iters} a JOIN a{iters} b
  ON a.cid = b.cid AND a.{id_col} < b.{id_col}
WHERE {cos} >= {threshold}
ORDER BY id_a, id_b
"""
