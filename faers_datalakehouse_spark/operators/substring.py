"""Substring-level duplicate detection: duplicated k-token window spans.

Token-hash dedup (exact, MinHash, SimHash — ``operators/dedup.py``) works
at document granularity; training corpora also need *substring*-level
dedup — boilerplate, licenses, navigation chrome repeated inside otherwise
unique documents (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499, finds duplicated ≥50-token
substrings with a suffix array). A suffix array is a single-machine
construction; the distributed analog used by large-corpus pipelines is
windowed fingerprints: hash every k-token window, keep windows whose hash
occurs more than once in the corpus, and merge overlapping windows into
maximal duplicated spans per document.

Scale shape (the reason this form is used at 100 TB): the window frame is
one row per token (linear, no shuffle to build — explode is a flatMap);
the duplicate-hash filter is a groupBy on the 60-bit window hash with
map-side partial counts; the join back is equi on the same hash; span
merging is a per-document sorted window (gaps-and-islands), which
partitions by doc_id and never sees more than one document's windows in a
task. No stage is quadratic and nothing is collected.

Everything is exact-integer arithmetic over the engine-portable md5 hash,
so the full pipeline has a bit-identical DuckDB twin (``DUP_SPANS_SQL``).

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_hash64
from .parallelism import ensure_compute_parallelism

TERM_RE = "[a-z0-9]+"


def _window_hashes(text_col: Column, k: int, min_toks: int | None = None) -> Column:
    """Array of md5-int64 hashes of each k-token window (space-joined —
    tokens match ``[a-z0-9]+`` so the separator can't collide).

    Short docs yield an EMPTY array via the in-expression guard — a
    separate ``filter(size(tokens) >= k)`` would re-tokenize the full
    text a second time (PushPredicateThroughProject inlines the filter
    into the scan, and FilterExec does no subexpression elimination);
    guarding inside one projection tokenizes once. ``min_toks`` raises
    the emptiness threshold (winnowing needs ``k + w - 1``). The guard
    also prevents the n < k descending-sequence trap (Spark's sequence
    reverses when start > stop)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(TERM_RE), 0)
    n = F.size(toks)
    arr = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: _md5_hash64(F.array_join(F.slice(toks, i, k), " ")),
    )
    return F.when(n >= (min_toks or k), arr).otherwise(
        F.array().cast("array<bigint>")
    )


def duplicated_window_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated k-token spans per document.

    Returns ``(doc_id, span_start, span_end, n_windows)`` — token offsets
    (0-based, inclusive) of every maximal span covered by k-token windows
    whose hash occurs ≥ ``min_count`` times corpus-wide (within-document
    repeats count, matching the self-repetition case). Two duplicated
    windows at starts p < p' merge when ``p' - p <= k`` (their token
    ranges overlap or adjoin).
    """
    docs = ensure_compute_parallelism(docs)
    # short docs yield an empty array inside _window_hashes (one
    # tokenization pass); posexplode of an empty array emits no rows,
    # so no separate — and re-tokenizing — length filter is needed
    windows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_window_hashes(F.col(text_col), k)).alias("pos", "whash"),
    )
    # Corpus-wide occurrence counts via count-over-window on whash, NOT
    # groupBy + join-back: the join shape scans/tokenizes/hashes every
    # window twice (agg side + probe side) and shuffles the full window
    # frame twice; the window shape is one pass and one shuffle (1.9×
    # faster at sf0.1; at corpus scale it also avoids persisting a
    # token-count-sized frame to dodge the recompute).
    hits = (
        windows.withColumn(
            "n_occ", F.count(F.lit(1)).over(Window.partitionBy("whash"))
        )
        .filter(F.col("n_occ") >= min_count)
        .select("doc_id", "pos")
    )
    byrow = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(byrow) > k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = hits.withColumn(
        "island",
        F.sum(brk).over(byrow.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
        .orderBy("doc_id", "span_start")
    )


DUP_SPANS_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{term_re}') AS t
  FROM documents
),
w AS (
  SELECT doc_id,
         i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(list_slice(t, i, i + {k} - 1), ' ')),
                         1, 15))::BIGINT AS whash
  FROM toks, unnest(range(1, len(t) - {k} + 2)) AS u(i)
  WHERE len(t) >= {k}
),
dup AS (
  SELECT whash FROM w GROUP BY whash HAVING count(*) >= {min_count}
),
hits AS (
  SELECT w.doc_id, w.pos FROM w JOIN dup USING (whash)
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {k}
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
islands AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {k} - 1 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


def dup_spans_oracle_sql(k: int = 8, min_count: int = 2) -> str:
    return DUP_SPANS_SQL_TEMPLATE.format(term_re=TERM_RE, k=k, min_count=min_count)


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): from the k-token window hashes, every
    window of ``w`` consecutive hashes contributes its MINIMUM (rightmost
    position on ties); the distinct selected (position, hash) pairs are
    the document's fingerprint set. Guarantees: any shared run of at
    least ``w + k - 1`` tokens between two documents shares at least one
    fingerprint, while storing only ~2/(w+1) of all window hashes.

    Returns ``(doc_id, pos, fhash)`` ordered by (doc_id, pos).

    Scale shape: the per-position explode into the ≤ ``w`` windows that
    contain it is a flatMap (×w row growth with w ~ 4, linear); both
    aggregations partition by (doc, window-start) and stay inside one
    document — the same bounded-partition profile as
    ``duplicated_window_spans``. All arithmetic is md5-int64 → exact
    DuckDB twin (``winnowing_oracle_sql``).
    """
    docs = ensure_compute_parallelism(docs)
    # The md5 window-hash array (an interpreted higher-order transform of
    # slice+array_join+md5 per window) must be referenced EXACTLY ONCE —
    # projections do no subexpression elimination, so a second reference
    # (e.g. size(arr) in the same select) re-evaluates the whole array per
    # row, doubling the dominant CPU cost at any scale. posexplode is the
    # sole consumer; n_start is recovered AFTER the explode from the
    # per-document window count (count = n_start + w - 1), which rides the
    # same doc_id shuffle the rest of the pipeline needs anyway.
    hashes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            _window_hashes(F.col(text_col), k, min_toks=k + w - 1)
        ).alias("pos", "whash"),
    ).withColumn(
        "n_start",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")) - F.lit(w) + 1,
    )
    wins = hashes.select(
        "doc_id",
        "pos",
        "whash",
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - F.lit(w) + 1, F.lit(0)),
                F.least(F.col("pos"), F.col("n_start") - 1),
            )
        ).alias("s"),
    )
    # Per-window minimum via min-over-window + filter — the same one-pass
    # count-over-window shape duplicated_window_spans uses — instead of a
    # groupBy + join-back, which consumes `wins` twice and re-runs the
    # whole tokenize+hash+explode chain for the probe side. The (doc_id, s)
    # window needs no extra exchange: hash-partitioning on doc_id already
    # satisfies clustering on (doc_id, s), so only a re-sort remains.
    sel = (
        wins.withColumn(
            "mh", F.min("whash").over(Window.partitionBy("doc_id", "s"))
        )
        .filter(F.col("whash") == F.col("mh"))
        .groupBy("doc_id", "s", "mh")
        .agg(F.max("pos").alias("p"))  # rightmost minimal hash per window
    )
    return (
        sel.select("doc_id", F.col("p").alias("pos"), F.col("mh").alias("fhash"))
        .distinct()
        .orderBy("doc_id", "pos")
    )


WINNOWING_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{term_re}') AS t
  FROM documents
),
h AS (
  SELECT doc_id,
         i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(list_slice(t, i, i + {k} - 1), ' ')),
                         1, 15))::BIGINT AS whash
  FROM toks, unnest(range(1, len(t) - {k} + 2)) AS u(i)
  WHERE len(t) >= {k} + {w} - 1
),
n AS (SELECT doc_id, max(pos) - {w} + 2 AS n_start FROM h GROUP BY doc_id),
wins AS (
  SELECT h.doc_id, h.pos, h.whash, s
  FROM h JOIN n USING (doc_id),
       unnest(range(greatest(h.pos - {w} + 1, 0),
                    least(h.pos, n.n_start - 1) + 1)) AS u(s)
),
minw AS (SELECT doc_id, s, min(whash) AS mh FROM wins GROUP BY doc_id, s),
sel AS (
  SELECT w.doc_id, w.s, w.whash AS mh, max(w.pos) AS p
  FROM wins w JOIN minw m
    ON w.doc_id = m.doc_id AND w.s = m.s AND w.whash = m.mh
  GROUP BY w.doc_id, w.s, w.whash
)
SELECT DISTINCT doc_id, CAST(p AS INTEGER) AS pos, mh AS fhash
FROM sel
ORDER BY doc_id, pos
"""


def winnowing_oracle_sql(k: int = 5, w: int = 4) -> str:
    return WINNOWING_SQL_TEMPLATE.format(term_re=TERM_RE, k=k, w=w)


def fingerprint_containment(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    threshold_milli: int = 300,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric near-containment detection: pairs where the smaller
    document's winnowing fingerprints are substantially shared by the
    larger — the "tweet inside a book" duplication class that Jaccard
    misses entirely (containment 1.0 can coexist with Jaccard ~0, so a
    Jaccard-threshold candidate filter has no recall guarantee here).

    Score: ``containment_milli = shared * 1000 div min(|fp(A)|, |fp(B)|)``
    over the documents' DISTINCT fingerprint-hash sets (positions
    dropped). Fingerprints with document frequency > ``max_df`` are
    excluded from pair GENERATION and the shared count — a common-phrase
    fingerprint seen in hundreds of documents carries no containment
    signal but would create a quadratic hub in the self-join; the
    denominator stays the TRUE fingerprint-set size. The oracle applies
    the identical rule, so the cut is semantics, not approximation
    drift.

    Scale shape: winnowing keeps ~2/(w+1) of window hashes; the pair
    generator is an equi-join on fingerprint hash whose per-key fan-out
    is bounded by ``max_df`` BY CONSTRUCTION (<= max_df^2/2 pairs per
    hash); shared counts are a partial-agged groupBy on (id_a, id_b);
    sizes join back on id. No all-pairs path at any scale.

    Reference scope: extends the dedup family (``operators/dedup.py``,
    ``duplicated_window_spans``) — no counterpart in the reference.
    """
    fp = winnowing_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    )
    # FOUR consumers read this frame (sizes, fdf, and both sides of the
    # fhash self-join via keep) and Spark re-executes lineage per
    # consumer boundary — unpersisted, the whole tokenize+md5+winnow
    # chain ran 4x (the r7 source_overlap trap; driver r8 saw q87 spread
    # 6.8-22.2 s). Persist the distinct fingerprint set so the chain
    # runs once; the frame is ~2/(w+1) of the token windows, far smaller
    # than the corpus text. Cache stays until LRU eviction (same policy
    # as minhash_lsh_pairs); at cluster scale this would be an explicit
    # checkpoint.
    sets_ = fp.select("doc_id", "fhash").distinct().persist()
    sizes = sets_.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    # document frequency via count-over-window on fhash, NOT groupBy +
    # join-back (r13; the same one-pass idiom duplicated_window_spans
    # documents above): the join shape shuffled the cached set twice
    # (agg side + probe side); the window is ONE exchange — and leaves
    # ``keep`` partitioned/sorted on fhash, the pair self-join's equi
    # key, so the join reuses the layout. Identical _fdf values.
    keep = (
        sets_.withColumn(
            "_fdf", F.count(F.lit(1)).over(Window.partitionBy("fhash"))
        )
        .filter(F.col("_fdf") <= max_df)
        .select("doc_id", "fhash")
    )
    shared = (
        keep.alias("a")
        .join(
            keep.alias("b"),
            (F.col("a.fhash") == F.col("b.fhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            sizes.select(
                F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("n_shared * 1000 div least(n_a, n_b)").alias(
                "containment_milli"
            ),
        )
    )
    return out.filter(
        F.col("containment_milli") >= threshold_milli
    ).orderBy("id_a", "id_b")


def fingerprint_containment_oracle_sql(
    k: int = 5,
    w: int = 4,
    threshold_milli: int = 300,
    max_df: int = 50,
) -> str:
    return f"""
WITH fps AS ({winnowing_oracle_sql(k=k, w=w)}),
sets AS (SELECT DISTINCT doc_id, fhash FROM fps),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM sets GROUP BY 1),
fdf AS (SELECT fhash, count(*) AS f FROM sets GROUP BY 1),
keep AS (
  SELECT s.doc_id, s.fhash
  FROM sets s JOIN fdf USING (fhash) WHERE fdf.f <= {max_df}
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM keep a JOIN keep b
    ON a.fhash = b.fhash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b,
       CAST(s.n_shared AS BIGINT) AS n_shared,
       CAST(sa.n_fp AS BIGINT) AS n_a,
       CAST(sb.n_fp AS BIGINT) AS n_b,
       CAST(s.n_shared AS BIGINT) * 1000
         // least(sa.n_fp, sb.n_fp) AS containment_milli
FROM shared s
JOIN sizes sa ON s.id_a = sa.doc_id
JOIN sizes sb ON s.id_b = sb.doc_id
WHERE CAST(s.n_shared AS BIGINT) * 1000 // least(sa.n_fp, sb.n_fp)
      >= {threshold_milli}
ORDER BY s.id_a, s.id_b
"""
