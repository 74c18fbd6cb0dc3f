"""Corpus-curation decision operators — the steps that turn analysis
into an actual training set: quality-aware near-dup canonical selection
(which copy survives dedup?), PII-pattern density screening (which
sources need scrubbing?), and token-budget water-filling (how many
tokens does each source contribute when the budget is smaller than the
corpus?).

All three are exact and cross-engine deterministic:

- ``dedup_keep_best``: connected components over the MinHash candidate
  graph (``operators/clustering.py``), then ONE keep policy applied per
  cluster — keep the longest normalized member, ties to the smallest
  doc id. Output is the per-cluster manifest (kept doc, member count,
  characters dropped) a dedup pass actually executes.
- ``pii_density``: per-source counts of email / phone / SSN-shaped
  matches per million normalized characters. Patterns are ASCII-class
  only (``[0-9]``, explicit char classes) so Java regex and RE2 agree;
  counts use leftmost non-overlapping extraction in both engines.
- ``water_filling``: the classic max-min fair allocation — every
  source gets its full token count until the shared level L exhausts
  the budget; integer level + Hamilton-style remainder (deterministic
  by (size, source) order, the ``neyman_allocation`` precedent). All
  arithmetic on the |sources|-row frame, exact BIGINT.

Scale shape (100 TB): keep-best adds one broadcast-size length join and
a per-cluster window over the LABEL frame (never the corpus) on top of
the bounded-candidate components; pii_density is a single map-side
scan + |sources| rollup; water_filling's windows run on the
|sources|-row frame only.

No counterpart in the reference repo (curation extension surface,
alongside ``dedup`` / ``mixture`` / ``shards``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.clustering import (
    cluster_assignments,
)
from faers_datalakehouse_spark.operators.dedup import (
    _norm_text,
    shared_lsh_pairs,
)

# canonical two-pass normalization, shared with the document oracles
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
)


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(cluster_id, kept_id, n_members, kept_len, chars_dropped)``
    per near-dup cluster, ordered by cluster — the executable dedup
    manifest under the keep-longest policy (ties to the smallest id:
    among equal-length near-dups the choice is arbitrary, so it must at
    least be deterministic)."""
    ca = cluster_assignments(pairs, src="id_a", dst="id_b")
    # Join FIRST, normalize after: the two-regex normalization is the
    # dominant per-row cost, and cluster members are a tiny fraction of
    # the corpus. Projecting the normalized length below the join made
    # every document pay the regexes; Catalyst does not push computed
    # projections through joins, so placing the expression above the
    # (broadcast label-frame) join evaluates it for member rows only.
    # Same values, member-only compute.
    members = ca.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)), "doc_id"
    ).withColumn("_len", F.length(_norm_text(F.col(text_col)))).drop(text_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_len").desc(), F.col("doc_id")
    )
    ranked = members.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("doc_id")))
            .alias("kept_id"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.when(F.col("_rn") == 1, F.col("_len")))
            .cast("long")
            .alias("kept_len"),
            (
                F.sum("_len")
                - F.max(F.when(F.col("_rn") == 1, F.col("_len")))
            )
            .cast("long")
            .alias("chars_dropped"),
        )
        .orderBy("cluster_id")
    )


def dedup_keep_best_query(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = shared_lsh_pairs(spark, sf_dir, threshold)
    return dedup_keep_best(docs, pairs)


def keep_best_oracle_sql(pairs_sql: str) -> str:
    """Recursive-CTE twin of ``dedup_keep_best`` over any pair SQL with
    columns (id_a, id_b) — the ``cluster_oracle_sql`` walk plus the
    keep-longest selection."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM und),
walk(node, comp) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT u.b AS node, w.comp
  FROM walk w JOIN und u ON w.node = u.a
  WHERE w.comp < u.b
),
cc AS (SELECT node AS doc_id, min(comp) AS cluster_id
       FROM walk GROUP BY node),
lens AS (
  SELECT doc_id, length({_NORM_SQL}) AS len
  FROM documents
),
ranked AS (
  SELECT cc.cluster_id, cc.doc_id, lens.len,
         row_number() OVER (PARTITION BY cc.cluster_id
                            ORDER BY lens.len DESC, cc.doc_id) AS rn
  FROM cc JOIN lens USING (doc_id)
)
SELECT cluster_id,
       max(CASE WHEN rn = 1 THEN doc_id END) AS kept_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(CASE WHEN rn = 1 THEN len END) AS BIGINT) AS kept_len,
       CAST(sum(len) - max(CASE WHEN rn = 1 THEN len END) AS BIGINT)
         AS chars_dropped
FROM ranked
GROUP BY cluster_id
ORDER BY cluster_id
"""


_PII_PATTERNS = {
    "emails": "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+",
    "phones": "[0-9][0-9][0-9][-. ][0-9][0-9][0-9][-. ][0-9][0-9][0-9][0-9]",
    "ssns": "[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]",
}


def pii_density(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """``(source, n_docs, n_chars, n_emails, n_phones, n_ssns,
    pii_ppm)`` per source — PII-shaped match counts per million raw
    characters. A screening signal, not a scrubber: sources above a
    ppm threshold route to the redaction pass (``redact_pii``)."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(low)).cast("long").alias("n_chars"),
    ]
    for name, pat in _PII_PATTERNS.items():
        aggs.append(
            F.sum(F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0))))
            .cast("long")
            .alias(f"n_{name}"),
        )
    return (
        docs.groupBy(source_col)
        .agg(*aggs)
        .withColumn(
            "pii_ppm",
            F.expr(
                "CASE WHEN n_chars > 0 THEN "
                "(1000000 * (n_emails + n_phones + n_ssns)) div n_chars"
                " END"
            ),
        )
        .orderBy(source_col)
    )


def pii_density_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_density(spark.read.parquet(f"{sf_dir}/documents.parquet"))


PII_DENSITY_SQL = f"""
WITH g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(lower(coalesce(text, '')))) AS BIGINT)
           AS n_chars,
         CAST(sum(len(regexp_extract_all(lower(coalesce(text, '')),
           '{_PII_PATTERNS["emails"]}'))) AS BIGINT) AS n_emails,
         CAST(sum(len(regexp_extract_all(lower(coalesce(text, '')),
           '{_PII_PATTERNS["phones"]}'))) AS BIGINT) AS n_phones,
         CAST(sum(len(regexp_extract_all(lower(coalesce(text, '')),
           '{_PII_PATTERNS["ssns"]}'))) AS BIGINT) AS n_ssns
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_chars, n_emails, n_phones, n_ssns,
       CASE WHEN n_chars > 0 THEN
         (1000000 * (n_emails + n_phones + n_ssns)) // n_chars
       END AS pii_ppm
FROM g
ORDER BY source
"""


def water_filling(
    per_source: DataFrame,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """``(source, n_tokens, alloc_tokens, capped)`` — max-min fair
    allocation of ``budget = total * budget_num div budget_den`` tokens
    across sources: every source keeps min(its size, the shared level
    L); the integer remainder goes to the smallest partially-funded
    sources first (deterministic Hamilton order). Exact BIGINT on the
    |sources|-row frame."""
    w_ord = Window.orderBy("n", "source")
    w_all = Window.partitionBy()  # |sources|-row frame: bounded
    f = per_source.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n"),
    )
    f = (
        f.withColumn("i", F.row_number().over(w_ord))
        .withColumn(
            "p",
            F.sum("n").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("s_cnt", F.count(F.lit(1)).over(w_all))
        .withColumn("tot", F.sum("n").over(w_all))
        .withColumn(
            "budget",
            F.expr(f"(tot * {int(budget_num)}) div {int(budget_den)}"),
        )
        # total if the level were exactly this source's size (this
        # source counted at cap): p_{i-1} + (S - i + 1) * n_i —
        # nondecreasing in i, so the funded set is a prefix
        .withColumn(
            "f_at_n", F.col("p") - F.col("n") + (F.col("s_cnt") - F.col("i") + 1) * F.col("n")
        )
        .withColumn("funded", (F.col("f_at_n") <= F.col("budget")).cast("int"))
        .withColumn("k", F.sum("funded").over(w_all))
        .withColumn(
            "p_k",
            F.coalesce(
                F.sum(F.when(F.col("funded") == 1, F.col("n"))).over(w_all),
                F.lit(0),
            ),
        )
    )
    lvl = "CASE WHEN s_cnt > k THEN (budget - p_k) div (s_cnt - k) ELSE 0 END"
    rem = "CASE WHEN s_cnt > k THEN (budget - p_k) % (s_cnt - k) ELSE 0 END"
    return (
        f.withColumn(
            "alloc_tokens",
            F.expr(
                f"CASE WHEN funded = 1 THEN n ELSE ({lvl}) + "
                f"CASE WHEN i - k <= ({rem}) THEN 1 ELSE 0 END END"
            ).cast("long"),
        )
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "alloc_tokens",
            (F.col("funded") == 0).alias("capped"),
        )
        .orderBy("source")
    )


def water_filling_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate half the corpus's whitespace-token budget across
    sources max-min fairly — the standard under-budget mixture floor
    before temperature reweighting."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # split('') yields [''] — a fully-empty normalized doc must count
    # 0 tokens, not 1 (normalization collapses whitespace, so every
    # token of a NON-empty normalized string is non-empty already).
    norm = _norm_text(F.col("text"))
    per_source = docs.groupBy("source").agg(
        F.sum(
            F.when(norm == "", F.lit(0)).otherwise(
                F.size(F.split(norm, " "))
            )
        )
        .cast("long")
        .alias("n_tokens")
    )
    return water_filling(per_source)


WATER_FILLING_SQL = f"""
WITH per_source AS (
  SELECT source,
         CAST(sum(CASE WHEN {_NORM_SQL} = '' THEN 0
                  ELSE len(string_split({_NORM_SQL}, ' ')) END)
           AS BIGINT) AS n
  FROM documents GROUP BY source
),
base AS (
  SELECT source, n,
         row_number() OVER (ORDER BY n, source) AS i,
         sum(n) OVER (ORDER BY n, source
                      ROWS UNBOUNDED PRECEDING) AS p,
         count(*) OVER () AS s_cnt,
         sum(n) OVER () AS tot
  FROM per_source
),
lev AS (
  SELECT *,
         (tot * 1) // 2 AS budget,
         p - n + (s_cnt - i + 1) * n AS f_at_n
  FROM base
),
k AS (
  SELECT *,
         sum(CASE WHEN f_at_n <= budget THEN 1 ELSE 0 END)
           OVER () AS kk,
         COALESCE(sum(CASE WHEN f_at_n <= budget THEN n END)
           OVER (), 0) AS p_k
  FROM lev
)
SELECT source, CAST(n AS BIGINT) AS n_tokens,
       CAST(CASE WHEN f_at_n <= budget THEN n ELSE
         (CASE WHEN s_cnt > kk
               THEN (budget - p_k) // (s_cnt - kk) ELSE 0 END)
         + CASE WHEN i - kk <=
             (CASE WHEN s_cnt > kk
                   THEN (budget - p_k) % (s_cnt - kk) ELSE 0 END)
           THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tokens,
       f_at_n > budget AS capped
FROM k
ORDER BY source
"""


def curation_pipeline(
    docs: DataFrame,
    pairs: DataFrame,
    n_shards: int = 8,
    budget_num: int = 1,
    budget_den: int = 2,
    scrub_ppm: int = 0,
) -> DataFrame:
    """The full curation chain as ONE plan — raw corpus in, training
    manifest out (VERDICT r11 item 5):

    1. keep-best dedup: connected components over the candidate graph,
       keep the longest normalized member per cluster (``dedup_keep_best``
       policy); singletons survive untouched.
    2. PII screen on the KEPT corpus: sources whose pattern density
       exceeds ``scrub_ppm`` parts-per-million are flagged — their docs
       still ship, tagged for the redaction pass (``redact_pii``).
    3. budget join: max-min fair ``water_filling`` of
       ``total * budget_num/budget_den`` tokens across sources, then a
       deterministic greedy prefix per source (hash order, keep while
       tokens-before < allocation) selects the shipped docs.
    4. split + shard: stable md5 split (96/2/2) and md5 shard bucket;
       the manifest is one row per (split, shard) with an
       order-independent XOR content fingerprint a dataloader can
       re-derive and byte-verify.

    Output: ``(split, shard_id, n_docs, n_sources, n_scrub_docs,
    total_tokens, total_chars, content_fingerprint)``, ≤ 3 × n_shards
    rows at ANY corpus scale.

    Scale shape (100 TB): components run on the bounded candidate
    graph, never the corpus; the keep-best window and the greedy-prefix
    cumsum are per-source/per-cluster keyed windows (one shuffle each);
    water filling and the PII rollup are |sources|-row frames; the
    manifest is one final groupBy. No driver-side collect anywhere.
    """
    from faers_datalakehouse_spark.operators.dedup import _md5_hash64
    from faers_datalakehouse_spark.operators.sampling import (
        _hash_bucket,
        deterministic_split,
    )

    # 1. kept corpus: drop every cluster member that is not the keeper
    ca = cluster_assignments(pairs, src="id_a", dst="id_b")
    # join FIRST, normalize after (the dedup_keep_best r12 fix): the
    # two-regex normalization runs for cluster MEMBERS only, not the
    # whole corpus — Catalyst would otherwise evaluate the projection
    # below the join for every document.
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_len").desc(), F.col("doc_id")
    )
    dropped = (
        ca.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("_len", F.length(_norm_text(F.col("text"))))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )
    # dropped is duplicate-count-proportional (NOT |sources|-bounded) —
    # no broadcast hint; AQE picks broadcast vs shuffle by actual size
    kept = docs.join(dropped, "doc_id", "left_anti")

    # 2. PII screen over the kept corpus -> sources to scrub
    scrub = (
        pii_density(kept)
        .filter(F.col("pii_ppm") > scrub_ppm)
        .select("source")
    )

    # 3. per-doc tokens, per-source water-filled budgets, greedy prefix
    norm = _norm_text(F.col("text"))
    # tok feeds two consumers (the per-source totals and the greedy
    # prefix) — persisted so the normalization+tokenization pass over
    # the kept corpus runs once (run-internal cache, same policy as the
    # minhash/allpairs frames).
    tok = kept.select(
        "doc_id",
        "source",
        "text",
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tok"),
    ).persist()
    per_source = tok.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("n_tokens")
    )
    alloc = water_filling(
        per_source, budget_num=budget_num, budget_den=budget_den
    ).select("source", "alloc_tokens")
    w_sel = Window.partitionBy("source").orderBy(
        _hash_bucket(F.col("doc_id"), 1_000_000_007), F.col("doc_id")
    )
    chosen = (
        tok.withColumn(
            "_cum",
            F.sum("n_tok").over(
                w_sel.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .join(F.broadcast(alloc), "source")
        .filter(F.col("_cum") - F.col("n_tok") < F.col("alloc_tokens"))
    )

    # 4. split + shard + manifest
    assigned = deterministic_split(chosen, "doc_id").select(
        "split",
        _hash_bucket(F.col("doc_id"), n_shards).alias("shard_id"),
        "doc_id",
        "source",
        "n_tok",
        F.length("text").cast("long").alias("n_chars"),
        _md5_hash64(
            F.concat_ws(":", F.col("doc_id"), F.col("text"))
        ).alias("h"),
    )
    assigned = assigned.join(
        F.broadcast(scrub.withColumn("_scrub", F.lit(1))),
        "source",
        "left",
    )
    return (
        assigned.groupBy("split", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum(F.coalesce(F.col("_scrub"), F.lit(0)))
            .cast("long")
            .alias("n_scrub_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.bit_xor("h").alias("content_fingerprint"),
        )
        .orderBy("split", "shard_id")
    )


def curation_pipeline_query(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    n_shards: int = 8,
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = shared_lsh_pairs(spark, sf_dir, threshold)
    return curation_pipeline(docs, pairs, n_shards=n_shards)


def curation_pipeline_oracle_sql(
    pairs_sql: str, n_shards: int = 8, scrub_ppm: int = 0
) -> str:
    """DuckDB twin of ``curation_pipeline`` — composes the existing
    keep-best component walk, the PII rollup, and the water-filling CTE
    chain over any pair SQL with columns (id_a, id_b)."""
    pii_terms = " + ".join(
        f"len(regexp_extract_all(lower(coalesce(text, '')), '{pat}'))"
        for pat in _PII_PATTERNS.values()
    )
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM und),
walk(node, comp) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT u.b AS node, w.comp
  FROM walk w JOIN und u ON w.node = u.a
  WHERE w.comp < u.b
),
cc AS (SELECT node AS doc_id, min(comp) AS cluster_id
       FROM walk GROUP BY node),
lens AS (
  SELECT doc_id, length({_NORM_SQL}) AS len
  FROM documents
),
dropped AS (
  SELECT doc_id FROM (
    SELECT cc.doc_id,
           row_number() OVER (PARTITION BY cc.cluster_id
                              ORDER BY lens.len DESC, cc.doc_id) AS rn
    FROM cc JOIN lens USING (doc_id)
  ) WHERE rn > 1
),
kept AS (
  SELECT * FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
),
pii AS (
  SELECT source,
         CAST(sum(length(lower(coalesce(text, '')))) AS BIGINT)
           AS n_chars,
         CAST(sum({pii_terms}) AS BIGINT) AS n_pii
  FROM kept GROUP BY source
),
scrub AS (
  SELECT source FROM pii
  WHERE n_chars > 0 AND (1000000 * n_pii) // n_chars > {scrub_ppm}
),
tok AS (
  SELECT doc_id, source, text,
         CAST(CASE WHEN {_NORM_SQL} = '' THEN 0
              ELSE len(string_split({_NORM_SQL}, ' ')) END
           AS BIGINT) AS n_tok
  FROM kept
),
per_source AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n
  FROM tok GROUP BY source
),
base AS (
  SELECT source, n,
         row_number() OVER (ORDER BY n, source) AS i,
         sum(n) OVER (ORDER BY n, source
                      ROWS UNBOUNDED PRECEDING) AS p,
         count(*) OVER () AS s_cnt,
         sum(n) OVER () AS tot
  FROM per_source
),
lev AS (
  SELECT *,
         (tot * 1) // 2 AS budget,
         p - n + (s_cnt - i + 1) * n AS f_at_n
  FROM base
),
kk AS (
  SELECT *,
         sum(CASE WHEN f_at_n <= budget THEN 1 ELSE 0 END)
           OVER () AS k,
         COALESCE(sum(CASE WHEN f_at_n <= budget THEN n END)
           OVER (), 0) AS p_k
  FROM lev
),
alloc AS (
  SELECT source,
         CAST(CASE WHEN f_at_n <= budget THEN n ELSE
           (CASE WHEN s_cnt > k
                 THEN (budget - p_k) // (s_cnt - k) ELSE 0 END)
           + CASE WHEN i - k <=
               (CASE WHEN s_cnt > k
                     THEN (budget - p_k) % (s_cnt - k) ELSE 0 END)
             THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tokens
  FROM kk
),
sel AS (
  SELECT t.*,
         sum(n_tok) OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT
                      % 1000000007,
                    doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok t
),
chosen AS (
  SELECT s.* FROM sel s JOIN alloc a USING (source)
  WHERE s.cum - s.n_tok < a.alloc_tokens
),
assigned AS (
  SELECT CASE WHEN b < 96 THEN 'train'
              WHEN b < 98 THEN 'val'
              ELSE 'test' END AS split,
         hb % {n_shards} AS shard_id,
         source, n_tok,
         CAST(length(text) AS BIGINT) AS n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT
           AS h
  FROM (
    SELECT *,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT
             % 100 AS b,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT
             AS hb
    FROM chosen
  )
)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(CASE WHEN source IN (SELECT source FROM scrub)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_scrub_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor(h) AS content_fingerprint
FROM assigned
GROUP BY split, shard_id
ORDER BY split, shard_id
"""
