"""Text analysis over a documents table — all built-in JVM expressions.

Large-scale training-data pipeline operators (token counting, quality
scoring, language ID, document fingerprinting) expressed entirely with
``pyspark.sql.functions`` so they stay inside whole-stage codegen — the
reference's row classification stage (/root/reference/src/ccm/xdis.py:447-465)
done as columnar expressions, no Python in the hot path at all.

Canonical tokenization spec (shared with linkgraph.dedup so fingerprints,
shingles and stopword counts agree everywhere, and simple enough to be
replicated exactly in ANSI SQL for the DuckDB oracle):

    norm(text)   = trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))
    tokens(text) = [] if norm == '' else split(norm, ' ')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una"],
    "fr": ["le", "les", "des", "et", "est", "dans", "une", "pas", "pour", "que"],
}


def norm_col(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def tokens_col(text: Column) -> Column:
    n = norm_col(text)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def _count_in(toks: Column, words: list[str]) -> Column:
    lit_set = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_set, t)))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, n_chars_norm, avg_token_len)."""
    t = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.length(norm_col(F.col(text_col))).cast("long").alias("n_chars_norm"),
        F.when(F.size(t) == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.aggregate(t, F.lit(0.0), lambda a, x: a + F.length(x))
                / F.size(t),
                6,
            )
        )
        .alias("avg_token_len"),
    )


def quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, stopword_ratio, punct_ratio, quality_score).

    quality_score is a deterministic [0,1] heuristic: rewarded for stopword
    presence and a sane token count, penalized for punctuation density.
    """
    t = tokens_col(F.col(text_col))
    n_tok = F.size(t)
    sw = _count_in(t, STOPWORDS["en"])
    raw_len = F.length(F.col(text_col))
    n_punct = raw_len - F.length(
        F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9\s]", "")
    )
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(sw / n_tok)
    punct_ratio = F.when(raw_len == 0, F.lit(0.0)).otherwise(n_punct / raw_len)
    score = (
        F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.4
        + F.when((n_tok >= 10) & (n_tok <= 5000), 0.4).otherwise(0.0)
        + F.greatest(F.lit(0.0), F.lit(0.2) - punct_ratio)
    )
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, lang_pred) — n-gram(1) stopword-vote heuristic.

    argmax over per-language stopword hit counts, ties -> lexicographically
    smallest language code (min-based tie-break, engine-wide determinism
    rule), zero hits everywhere -> 'und'.
    """
    t = tokens_col(F.col(text_col))
    counts = {lang: _count_in(t, ws) for lang, ws in STOPWORDS.items()}
    best_n = F.greatest(*counts.values())
    # pick the lexicographically first language achieving best_n
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(counts[lang] == best_n, F.lit(lang)).otherwise(pred)
    pred = F.when(best_n == 0, F.lit("und")).otherwise(pred)
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, fp_md5, fp64) — content fingerprint of normalized text.

    fp64 is the first 15 hex digits of the md5 as a signed 60-bit int
    (portable across engines: DuckDB CAST('0x'||substr(md5,1,15) AS BIGINT)).
    """
    fp = F.md5(norm_col(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp64"),
    )
