"""Corpus search primitives: inverted index + integer-exact BM25 top-k.

A curation pipeline needs corpus-wide lexical search — for deduplication
forensics ("which documents contain this leaked string"), benchmark
decontamination drill-downs, and quality auditing. The two classic
primitives:

- **inverted index**: token → (document frequency, sorted posting list).
  One ``groupBy(word)`` over the token stream; map-side partial
  aggregation makes the shuffle vocabulary-sized, not corpus-sized.
  ``max_df`` prunes stopword-class terms (their posting lists are the
  corpus itself — at 100 TB a single array row would be GBs; standard
  practice drops or caps them, and the pruned terms carry no search
  signal anyway).
- **BM25 top-k**: Robertson/Spärck-Jones ranking, made **integer-exact**
  (the repo-wide cross-engine float rule): idf uses the bit-length
  ``floor(log2(N div df))`` (same trick as ``operators.surprisal``), and
  the tf normalization with k1=1.2, b=0.75 is cleared of fractions by
  multiplying through by ``10·Σdl``:

      tf_norm = 2.2·tf / (tf + 0.3 + 0.9·dl·N/Σdl)
              = 22·tf·Σdl / (10·tf·Σdl + 3·Σdl + 9·dl·N)

  so each term's score is one integer division
  ``idf_bits · 22000 · tf · Σdl  div  (10·tf·Σdl + 3·Σdl + 9·dl·N)``
  (milli-scaled), and a document's score is an integer SUM — exact,
  summation-order-free, reproducible in DuckDB to the last digit.
  Int64 headroom: the numerator is ≲ 2^50 up to Σdl ≈ 10^9 tokens per
  statistics partition; beyond that, compute corpus statistics per shard
  or widen to decimal(38,0) — the plan shape is unchanged.

Scale layout: token stats are two vocabulary/doc-sized aggregates; the
query-term filter is an ``isin`` over a handful of literals (pushed to
the scan of the tf frame); scoring joins are broadcasts (vocab-row
per-term stats); top-k is ``orderBy().limit()`` → TakeOrderedAndProject.

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .surprisal import corpus_tokens

K1_NUM = 22  # 2·(k1+1)·10 with k1=1.2 → numerator factor 22·tf·Σdl
D_TF = 10  # 10·tf·Σdl
D_CONST = 3  # 0.3·10 → 3·Σdl
D_LEN = 9  # 0.9·10 → 9·dl·N
SCALE = 1000  # milli-scaled integer scores


def inverted_index(
    docs: DataFrame,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    flat: bool = False,
) -> DataFrame:
    """``(word, df, postings)`` with ``postings`` the sorted list of doc
    ids containing the word. ``max_df`` drops stopword-class terms.

    ``flat=True`` renders postings as a comma-joined string instead of
    ``array<long>`` — the lossless serialization for consumers whose row
    canonicalization can't hash list cells (the round-5 driver failure:
    pandas ``sort_values`` raises ``unhashable type: 'list'``). Integer
    doc ids render identically in every engine, so the string form stays
    hash-exact against the DuckDB ``array_to_string`` twin."""
    toks = corpus_tokens(docs, id_col, text_col)
    idx = toks.groupBy("word").agg(
        F.countDistinct("id").alias("df"),
        F.sort_array(F.collect_set("id")).alias("postings"),
    )
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    if flat:
        idx = idx.withColumn("postings", F.concat_ws(",", "postings"))
    return idx.orderBy("word")


def _corpus_stats(toks: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, dl, global) frames: per-(doc, word) counts, per-doc lengths,
    and the 1-row (n_docs, sum_dl) global — all exact integers."""
    tf = toks.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return tf, dl, glob


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under integer-exact
    BM25-lite: ``(doc_id, n_terms_hit, score_milli)``, ties broken by
    doc id ascending. Only documents containing at least one query term
    are candidates (inner join — the standard impact-ordered behavior).
    """
    terms = sorted(set(query_terms))
    toks = corpus_tokens(docs, id_col, text_col)
    tf, dl, glob = _corpus_stats(toks)

    qtf = tf.filter(F.col("word").isin(list(terms)))
    qdf = qtf.groupBy("word").agg(F.countDistinct("id").alias("df"))

    scored = (
        qtf.join(F.broadcast(qdf), "word")
        .join(dl, "id")
        .crossJoin(F.broadcast(glob))
    )
    idf_bits = (
        F.length(F.bin(F.expr("n_docs div df"))) - F.lit(1)
    ).cast("long")
    num = (
        idf_bits
        * F.lit(K1_NUM * SCALE)
        * F.col("tf").cast("long")
        * F.col("sum_dl").cast("long")
    )
    den = (
        F.lit(D_TF) * F.col("tf").cast("long") * F.col("sum_dl").cast("long")
        + F.lit(D_CONST) * F.col("sum_dl").cast("long")
        + F.lit(D_LEN) * F.col("dl").cast("long") * F.col("n_docs").cast("long")
    )
    # true integer division (Spark SQL `div`) — exact at any magnitude,
    # never routed through a double (which would lose bits past 2^53)
    per_term = (
        scored.withColumn("num_c", num)
        .withColumn("den_c", den)
        .withColumn("term_score", F.expr("num_c div den_c"))
    )
    return (
        per_term.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("term_score").alias("score_milli"),
        )
        .select(
            F.col("id").alias(id_col), "n_terms_hit", "score_milli"
        )
        .orderBy(F.desc("score_milli"), id_col)
        .limit(k)
    )


def bm25_oracle_sql(query_terms: Sequence[str], k: int = 10) -> str:
    """DuckDB twin of ``bm25_topk`` — identical normalization, identical
    integer arithmetic, identical tie-break."""
    terms = sorted(set(query_terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
),
toks2 AS (SELECT * FROM toks WHERE word <> ''),
tf AS (SELECT id, word, count(*) AS tf FROM toks2 GROUP BY id, word),
dl AS (SELECT id, count(*) AS dl FROM toks2 GROUP BY id),
gstats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
qtf AS (SELECT * FROM tf WHERE word IN ({in_list})),
qdf AS (SELECT word, count(DISTINCT id) AS df FROM qtf GROUP BY word),
per_term AS (
  SELECT qtf.id,
         (length(bin(gstats.n_docs // qdf.df)) - 1)
           * {K1_NUM * SCALE} * qtf.tf * gstats.sum_dl AS num,
         {D_TF} * qtf.tf * gstats.sum_dl
           + {D_CONST} * gstats.sum_dl
           + {D_LEN} * dl.dl * gstats.n_docs AS den
  FROM qtf JOIN qdf USING (word) JOIN dl USING (id) CROSS JOIN gstats
)
SELECT id AS doc_id,
       count(*) AS n_terms_hit,
       CAST(sum(num // den) AS BIGINT) AS score_milli
FROM per_term
GROUP BY id
ORDER BY score_milli DESC, doc_id
LIMIT {k}
"""


def inverted_index_oracle_sql(max_df: int, flat: bool = False) -> str:
    """DuckDB twin of ``inverted_index`` (with stopword pruning)."""
    postings = (
        "array_to_string(list_sort(list(id)), ',')"
        if flat
        else "list_sort(list(id))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
),
toks2 AS (SELECT DISTINCT id, word FROM toks WHERE word <> '')
SELECT word,
       count(*) AS df,
       {postings} AS postings
FROM toks2
GROUP BY word
HAVING count(*) <= {max_df}
ORDER BY word
"""


# --------------------------------------------------------------------------
# All-pairs document similarity via posting-list self-join (Elsayed,
# Lin & Oard, "Pairwise Document Similarity in Large Collections with
# MapReduce", ACL 2008) — the sparse/lexical complement to the dense
# ANN stack in operators/similarity.py.
# --------------------------------------------------------------------------


def allpairs_similarity(
    docs: DataFrame,
    n: int = 3,
    max_df_pct: int = 20,
    min_dot: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """tf-idf dot products between every document pair that shares at
    least one indexed ``n``-token shingle: ``(id_a, id_b, dot, cos)``
    with ``id_a < id_b``, ordered by (id_a, id_b).

    Features are word shingles, not single words: shingles carry phrase
    identity (the near-duplicate signal) and their feature space stays
    discriminative even on small vocabularies, where single-word tf-idf
    saturates. Weights are exact integers — ``w(d,g) = tf · idf_bits``
    with the +1-smoothed bit-length idf
    (``1 + floor(log2(N div df))`` = ``length(bin(N div df))``; the
    smoothing keeps shared features weighted even when df approaches N,
    where the unsmoothed floor collapses to 0 and erases every pair) —
    so ``dot`` and the norm-squares are int64 and the DuckDB twin
    matches bit-for-bit; ``cos`` is one IEEE chain over those integers
    (``dot / sqrt(double(norm2_a · norm2_b))``), identical across
    engines.

    Scale shape (the ACL'08 layout): pair generation is a self-join of
    the weighted postings ON SHINGLE — its output is bounded by
    ``Σ_g df(g)²``, and the ``max_df_pct`` cut (df ≤ N·pct/100,
    integer-exact in both engines) caps every feature's contribution.
    That cut is what makes all-pairs similarity tractable at corpus
    scale: boilerplate shingles pair EVERY document with every other
    (the quadratic killer), carry no discrimination signal, and are
    exactly the features tf-idf down-weights anyway. The postings frame
    feeds three consumers (both self-join sides + the norm aggregation),
    so it is persisted; every join key (shingle, then doc id) is a plain
    hash shuffle — no broadcast of anything corpus-proportional, no
    driver state.
    """
    from .dedup import _let, _norm_text

    # _let binds the normalized token array ONCE: a subexpression
    # referenced inside a transform lambda is re-evaluated per array
    # element (no CSE in higher-order functions), and here that
    # subexpression is two corpus-text regexes — measured 11.5 s vs
    # 0.9 s for the shingle stream at sf0.1
    sh = _let(
        F.split(_norm_text(F.col(text_col)), " "),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = docs.select(
        F.col(id_col).alias("id"), F.explode(sh).alias("g")
    )
    # tf feeds three derivations (dfreq, the global N, the weighted
    # postings) — persist so the tokenize+count pipeline runs once
    tf = (
        grams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    nd = tf.agg(F.countDistinct("id").alias("n_docs"))
    idf_bits = F.length(F.bin(F.expr("n_docs div df"))).cast("long")
    # document frequency via count-over-window on g, NOT groupBy +
    # join-back (r13; the substring.py window-hash idiom): the join
    # shape shuffled the cached postings AND the df aggregate on g and
    # re-read the postings twice; the window is ONE exchange on g — and
    # it leaves ``w`` hash-partitioned (and sorted) on g, which is
    # exactly the pair self-join's key, so both self-join sides reuse
    # the cached layout with no further exchange. Identical df values,
    # identical weights.
    w = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") * 100 <= F.col("n_docs") * max_df_pct)
        .select(
            "id",
            "g",
            (F.col("tf").cast("long") * idf_bits).alias("w"),
        )
        .persist()
    )
    norms = w.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("norm2"))
    a, b = w.alias("a"), w.alias("b")
    pairs = (
        a.join(b, "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
        .filter(F.col("dot") >= min_dot)
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm2").alias("_n2a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm2").alias("_n2b"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "dot",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("_n2a") * F.col("_n2b")).cast("double"))
            ).alias("cos"),
        )
        .orderBy("id_a", "id_b")
    )


def allpairs_oracle_sql(
    n: int = 3, max_df_pct: int = 20, min_dot: int = 1
) -> str:
    """DuckDB twin of ``allpairs_similarity`` — identical shingling,
    integer weights, and IEEE cosine chain."""
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT id, array_to_string(list_slice(t, i, i + {n} - 1), ' ') AS g
  FROM toks, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
tf AS (SELECT id, g, count(*) AS tf FROM grams GROUP BY id, g),
dfreq AS (SELECT g, count(*) AS df FROM tf GROUP BY g),
nd AS (SELECT count(DISTINCT id) AS n_docs FROM tf),
w AS (
  SELECT tf.id, tf.g,
         tf.tf * length(bin(nd.n_docs // dfreq.df)) AS w
  FROM tf JOIN dfreq USING (g) CROSS JOIN nd
  WHERE dfreq.df * 100 <= nd.n_docs * {max_df_pct}
),
norms AS (SELECT id, sum(w * w) AS norm2 FROM w GROUP BY id),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.g = b.g AND a.id < b.id
  GROUP BY a.id, b.id
  HAVING sum(a.w * b.w) >= {min_dot}
)
SELECT p.id_a, p.id_b, CAST(p.dot AS BIGINT) AS dot,
       CAST(p.dot AS DOUBLE)
         / sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE)) AS cos
FROM pairs p
JOIN norms na ON na.id = p.id_a
JOIN norms nb ON nb.id = p.id_b
ORDER BY id_a, id_b
"""
