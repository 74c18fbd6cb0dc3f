"""Text-analysis expression library for LLM training-data pipelines.

Everything here is built from ``pyspark.sql.functions`` (JVM-side, codegen'd,
Arrow-free) so the hot path over billions of documents never leaves the JVM:
language-ID, quality scoring, token counting, and fingerprinting all compile
into one projection over the parquet scan.

These operate on the driver's ``documents`` table (``doc_id, text, lang,
source, n_chars`` — TESTDATA.md) but take Columns, so they apply to any corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword alternations for the n-gram/stopword heuristic.
# Word-boundary anchored; RE2 (DuckDB) and java.util.regex both support \b.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it|for|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|dans|que|pour|des)\b",
    "es": r"\b(el|la|los|las|y|es|una|en|que|por)\b",
}

STOPWORD_RE = LANG_MARKERS["en"]
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish: words / numbers / punct


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_trim(col: Column | str) -> Column:
    """Whitespace trim covering tabs/newlines: ``F.trim`` strips ASCII
    spaces ONLY, so trim-then-split-on-\\s+ produced phantom empty
    tokens for text ending in '\\n' (i.e. nearly every real document) —
    the DuckDB twins (`regexp_replace(x, '^\\s+|\\s+$', '', 'g')`)
    mirror this exactly."""
    return F.regexp_replace(_c(col), r"^\s+|\s+$", "")


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` split or a BPE-ish regex tokenizer."""
    c = _c(col)
    if mode == "whitespace":
        t = ws_trim(c)
        return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    if mode == "regex":
        return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))
    raise ValueError(f"unknown mode {mode!r}")


def language_id(col: Column | str, markers: dict[str, str] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts.

    Ties (and all-zero scores) resolve to the alphabetically-first language so
    the result is deterministic and oracle-comparable.
    """
    markers = markers or LANG_MARKERS
    lowered = F.lower(_c(col))
    langs = sorted(markers)  # alphabetical → deterministic tiebreak
    # array-argmax (array_position = FIRST max) instead of a chained
    # when(s > best) ladder, which doubles the expression tree per language
    scores = F.array(
        *[F.regexp_count(lowered, F.lit(markers[lang])) for lang in langs]
    )
    names = F.array(*[F.lit(lang) for lang in langs])
    pos = F.array_position(scores, F.array_max(scores)).cast("int")
    # NULL text -> NULL (all scores NULL made the fallthrough pick the
    # LAST language — rows with missing text classified as 'fr')
    return F.when(lowered.isNull(), F.lit(None).cast("string")).otherwise(
        F.element_at(names, pos)
    )


def quality_score_cols(col: Column | str) -> dict[str, Column]:
    """Document-quality signals + composite score.

    - ``q_len``           — character length
    - ``q_tokens``        — whitespace token count
    - ``q_mean_tok_len``  — mean token length (spam/boilerplate signal)
    - ``q_punct_ratio``   — punctuation chars / chars
    - ``q_stop_ratio``    — English stopword hits / tokens
    - ``q_alpha_ratio``   — alphabetic chars / chars
    - ``q_score``         — composite in [0, 1]
    """
    c = _c(col)
    n_chars = F.length(c).cast("double")
    toks = token_count(c).cast("double")
    safe_chars = F.when(n_chars > 0, n_chars).otherwise(F.lit(1.0))
    safe_toks = F.when(toks > 0, toks).otherwise(F.lit(1.0))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", "")).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    stop_hits = F.regexp_count(F.lower(c), F.lit(STOPWORD_RE)).cast("double")
    punct_ratio = punct / safe_chars
    alpha_ratio = alpha / safe_chars
    stop_ratio = stop_hits / safe_toks
    mean_tok_len = F.when(toks > 0, n_chars / toks).otherwise(F.lit(0.0))
    length_signal = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.25) * length_signal
        + F.lit(0.25) * F.least(stop_ratio * 2.5, F.lit(1.0))
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )
    return {
        "q_len": n_chars.cast("long"),
        "q_tokens": toks.cast("long"),
        "q_mean_tok_len": F.round(mean_tok_len, 4),
        "q_punct_ratio": F.round(punct_ratio, 4),
        "q_stop_ratio": F.round(stop_ratio, 4),
        "q_alpha_ratio": F.round(alpha_ratio, 4),
        "q_score": F.round(score, 4),
    }


def doc_fingerprint(col: Column | str, n_words: int = 8) -> Column:
    """Content fingerprint: md5 over the first ``n_words`` normalized words.

    Normalization (lowercase, strip non-alphanumerics, collapse whitespace)
    makes the fingerprint robust to formatting; restricting to a prefix makes
    it a cheap near-head-dup blocker at corpus scale.
    """
    c = _c(col)
    # one-pass form of the two-pass oracle normalization — provably equal
    # (see operators/dedup._norm_text) and one text scan cheaper
    norm = F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))
    prefix = F.array_join(F.slice(F.split(norm, " "), 1, n_words), " ")
    return F.md5(prefix)


def _let(expr: Column, fn) -> Column:
    """One-element-array let binding (see ``operators/dedup._let``): a
    subexpression referenced inside a higher-order lambda re-evaluates per
    element; binding it as the lambda variable evaluates it exactly once."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def repetition_stats_cols(col: Column | str) -> dict[str, Column]:
    """Gopher-style within-document repetition signals.

    Boilerplate and SEO spam repeat themselves; these per-row signals catch
    that without any shuffle (all higher-order array expressions over the
    token stream, one codegen'd projection):

    - ``r_tokens``           — whitespace token count
    - ``r_top_word_count``   — occurrences of the most frequent token
    - ``r_top_word_frac``    — top-token occurrences / tokens
    - ``r_dup_2gram_frac``   — repeated 2-grams / 2-grams
    - ``r_dup_3gram_frac``   — repeated 3-grams / 3-grams
    - ``r_adjacent_repeats`` — count of immediately-repeated tokens

    Fractions are each a SINGLE IEEE division of two exact integers (then one
    round) so DuckDB reproduces them bit-for-bit — no float accumulation.
    The top-count scan is O(distinct × tokens) per row: bounded per-document
    work, embarrassingly parallel at corpus scale.
    """
    c = _c(col)

    def build(words: Column) -> Column:
        n = F.size(words)
        top = F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda t: F.size(F.filter(words, lambda w: w == t)),
            )
        )
        grams2 = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams3 = F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        adj = F.when(
            n >= 2,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.element_at(words, i + 1) == F.element_at(words, i),
                )
            ),
        ).otherwise(F.lit(0))

        def dup_frac(grams: Column) -> Column:
            total = F.size(grams)
            dups = (total - F.size(F.array_distinct(grams))).cast("double")
            return F.when(
                total > 0, F.round(dups / total.cast("double"), 4)
            ).otherwise(F.lit(0.0))

        return F.struct(
            n.cast("long").alias("r_tokens"),
            top.cast("long").alias("r_top_word_count"),
            F.when(
                n > 0,
                F.round(top.cast("double") / n.cast("double"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("r_top_word_frac"),
            dup_frac(grams2).alias("r_dup_2gram_frac"),
            dup_frac(grams3).alias("r_dup_3gram_frac"),
            adj.cast("long").alias("r_adjacent_repeats"),
        )

    empty = ws_trim(c) == ""
    stats = _let(F.split(ws_trim(c), r"\s+"), build)
    zero_l = F.lit(0).cast("long")
    zero_d = F.lit(0.0)
    return {
        "r_tokens": F.when(empty, zero_l).otherwise(stats["r_tokens"]),
        "r_top_word_count": F.when(empty, zero_l).otherwise(
            stats["r_top_word_count"]
        ),
        "r_top_word_frac": F.when(empty, zero_d).otherwise(
            stats["r_top_word_frac"]
        ),
        "r_dup_2gram_frac": F.when(empty, zero_d).otherwise(
            stats["r_dup_2gram_frac"]
        ),
        "r_dup_3gram_frac": F.when(empty, zero_d).otherwise(
            stats["r_dup_3gram_frac"]
        ),
        "r_adjacent_repeats": F.when(empty, zero_l).otherwise(
            stats["r_adjacent_repeats"]
        ),
    }


# --- corpus chunking + PII redaction (training-data preprocessing) ---

# Conservative patterns that parse identically in Spark (Java regex) and
# DuckDB (RE2): no lookarounds, no \b differences in scope here.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def redact_pii(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace PII spans with ``<TYPE>`` placeholders (one codegen'd
    regexp_replace chain — zero shuffle, linear scan)."""
    out = _c(col)
    for name, pattern in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def chunk_tokens(
    col: Column | str, chunk_size: int = 64, overlap: int = 16
) -> Column:
    """Split text into overlapping whitespace-token windows —
    ``array<struct<chunk_index int, chunk_text string>>``.

    Stride = chunk_size - overlap. The last window may be shorter; empty
    text yields a single empty chunk. All built-in array exprs (split →
    sequence → slice → array_join): per-row linear work, no shuffle —
    explode downstream to get one row per chunk.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap

    def build(words: Column) -> Column:
        n = F.size(words)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"),
            F.lit(1),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_index"),
                F.array_join(
                    F.slice(words, i * stride + 1, chunk_size), " "
                ).alias("chunk_text"),
            ),
        )

    return _let(F.split(ws_trim(col), r"\s+"), build)
