"""Text analysis: token counts, quality scoring, language ID,
document fingerprinting — all native Catalyst expressions (JVM-side,
whole-stage-codegen; no Python).

Every function is deterministic and oracle-expressible in ANSI SQL so
the driver's DuckDB comparison can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic. Deliberately small + closed so the same lists can
# be inlined into the SQL oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

def ws_tokens(c: Column):
    """Lowercased whitespace tokens of a text column — THE tokenizer
    shared by text stats, shingling, and simhash (one definition, so
    exact-dedup fingerprints and shingle dedup can't silently diverge
    on e.g. a unicode-whitespace change)."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


_TOKENS = ws_tokens


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_TOKENS(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish proxy: count of word/number/punctuation units — a
    regex-split approximation of subword tokenizers (ceil(chars/4) is
    the common rule of thumb; this counts actual unit boundaries)."""
    return F.size(
        F.filter(
            F.split(F.lower(text_col), r"([^a-z0-9]+)"), lambda t: t != F.lit("")
        )
    ) + F.size(F.filter(F.split(text_col, r"[a-zA-Z0-9\s]+"), lambda t: t != F.lit("")))


def stopword_hits(text_col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(_TOKENS(text_col), lambda t: t.isin(words)))


def quality_score(text_col: Column) -> Column:
    """Heuristic document quality in [0,1]: penalize very short docs,
    reward moderate average token length. Pure arithmetic over native
    aggregates (matches the SQL oracle exactly).

    score = least(1, n_tokens/100) * (1 - least(1, abs(avg_len - 5)/10))
    """
    toks = _TOKENS(text_col)
    n = F.size(toks)
    avg_len = (F.length(F.regexp_replace(F.lower(text_col), r"\s+", ""))
               / F.greatest(n.cast("double"), F.lit(1.0)))
    return F.round(
        F.least(F.lit(1.0), n / F.lit(100.0))
        * (F.lit(1.0) - F.least(F.lit(1.0), F.abs(avg_len - 5.0) / 10.0)),
        4,
    )


def language_id(text_col: Column) -> Column:
    """Stopword-vote language heuristic: argmax of per-language stopword
    hits, 'und' (undetermined) when no list scores > 0. Deterministic
    tie-break by language code order (de < en < es < fr)."""
    toks = _TOKENS(text_col)

    def _hits(words: list[str]):
        # NB: single-arg lambda only — a 2-arg lambda would make
        # F.filter pass the array index as the second argument.
        wl = list(words)
        return F.size(F.filter(toks, lambda t: t.isin(wl)))

    scores = {lang: _hits(words) for lang, words in STOPWORDS.items()}
    best = None
    for lang in sorted(STOPWORDS):  # deterministic tie order
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best["score"],
                          F.struct(s.alias("score"), F.lit(lang).alias("lang"))
                          ).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Normalization-invariant document fingerprint: md5 of the
    lowercased, whitespace-collapsed text (the exact-dedup key; the
    rolling-hash shingle variant lives in dedup.py)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")).cast("binary")
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(c))
        .withColumn("n_chars", F.length(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", language_id(c))
        .withColumn("fingerprint", fingerprint(c))
    )


# ---------------------------------------------------------------------------
# Repetition signals (the Gopher-style repetition filters: fraction of
# duplicate n-grams and the most-frequent-word share — high values mark
# boilerplate/spam documents a training pipeline drops).

def repetition_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals:

    - ``top_word_frac``: share of the most frequent token (explode →
      two keyed partial aggs — scales as one shuffle on (doc, token));
    - ``dup_trigram_frac``: duplicate word-3-gram share, computed
      per-row with ``array_distinct`` (no shuffle at all).
    Both rounded to 6 dp for engine-portable comparison."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt"))
    d = d.withColumn("_tks", _TOKENS(F.col("_txt")))
    tri = F.expr(
        "CASE WHEN size(_tks) >= 3 THEN "
        "transform(slice(_tks, 1, size(_tks) - 2), "
        "(x, i) -> concat_ws(' ', _tks[i], _tks[i + 1], _tks[i + 2])) "
        "ELSE array() END"
    )
    per_row = d.select(
        "doc_id",
        F.size("_tks").alias("_n"),
        F.size(tri).alias("_t"),
        F.size(F.array_distinct(tri)).alias("_td"),
    )
    counts = (
        d.select("doc_id", F.explode("_tks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("_topc"))
    )
    return (
        per_row.join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.when(F.col("_n") > 0,
                       F.col("_topc").cast("double") / F.col("_n"))
                .otherwise(F.lit(0.0)), 6
            ).alias("top_word_frac"),
            F.round(
                F.when(F.col("_t") > 0,
                       (F.col("_t") - F.col("_td")).cast("double") / F.col("_t"))
                .otherwise(F.lit(0.0)), 6
            ).alias("dup_trigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing: redact emails/phone-like strings, count what was hit.
# Both regexes stay in the RE2-compatible subset so the DuckDB oracle
# runs the very same patterns.

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}[ \-][0-9]{2,4}[ \-][0-9]{4,8}"


def redact_pii(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n_emails, n_phones, clean_text): emails → [EMAIL],
    phone-like +CC sequences → [PHONE]. Pure regexp_replace /
    regexp_count — native codegen, one scan, no shuffle."""
    c = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        clean.alias("clean_text"),
    )
