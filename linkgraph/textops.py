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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def quality_cols(text_col: str = "text") -> dict[str, Column]:
    """The quality-signal expressions as a name->Column dict, so composed
    operators (see linkgraph.curation) can ride them in their own single
    projection instead of joining quality()'s output back on doc_id."""
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
    return {
        "n_tokens": n_tok.cast("long"),
        "stopword_ratio": F.round(stop_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, stopword_ratio, punct_ratio, quality_score).

    quality_score is a deterministic [0,1] heuristic: rewarded for stopword
    presence and a sane token count, penalized for punctuation density.
    """
    cols = quality_cols(text_col)
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
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


def langid_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, lang_pred, best_hits, second_hits, margin) — language
    ID with a confidence margin: (best − runner-up stopword hits) per
    token. Curation drops low-margin docs (mixed-language or too short to
    call) instead of trusting a bare argmax — the knob ``langid`` alone
    does not expose. Same vote, same tie-break, map-only."""
    t = tokens_col(F.col(text_col))
    n = F.size(t)
    counts = {lang: _count_in(t, ws) for lang, ws in STOPWORDS.items()}
    arr = F.array_sort(F.array(*counts.values()))
    best = F.element_at(arr, -1)
    second = F.element_at(arr, -2)
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    margin = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round((best - second) / n, 6)
    )
    return docs.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.cast("long").alias("best_hits"),
        second.cast("long").alias("second_hits"),
        margin.alias("margin"),
    )


def repetition(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, dup_5gram_frac) — Gopher-style repetition
    signals (Rae et al. 2021, "Scaling Language Models", App. A1.1), the
    standard filters for machine-generated / boilerplate webtext.

    Deliberately MAP-ONLY: every signal is computed per document with
    array higher-order functions (distinct + per-element count via
    filter), so the operator is a pure projection — zero shuffles at any
    corpus size, unlike the explode+groupBy formulation whose exchange
    would carry one row per (doc, line/gram). Per-doc cost is
    O(items x distinct items); web documents are small enough that this
    beats a corpus-wide shuffle by orders of magnitude at 100 TB.

    Definitions (deterministic, DuckDB-replicable; they count OVERLAPPING
    gram characters, a documented simplification of Gopher's
    covered-character versions):

    - lines = non-empty trimmed '\\n'-splits
    - dup_line_frac       = (n_lines - n_distinct_lines) / n_lines
    - dup_line_char_frac  = chars in repeat line instances beyond the
                            first, over total line chars
    - top_2gram_char_frac = occurrences x chars of the most frequent
                            token 2-gram (ties -> lexicographically
                            smallest, engine-wide min tie-break), over
                            normalized text length
    - dup_5gram_frac      = occurrences x chars summed over token 5-grams
                            appearing more than once, over normalized text
                            length (overlaps may push it past 1.0)
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    dlines = F.array_distinct(lines)
    n_lines = F.size(lines)
    # per-distinct-line occurrence counts, reused by both line signals
    lcnt = F.transform(
        dlines, lambda d: F.size(F.filter(lines, lambda x: x == d))
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dup_line_chars = F.aggregate(
        F.zip_with(
            dlines,
            lcnt,
            lambda d, c: F.when(c > 1, (c - 1) * F.length(d)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )

    t = tokens_col(F.col(text_col))
    n_chars = F.length(norm_col(F.col(text_col)))

    def grams(n: int) -> Column:
        m = F.size(t) - (n - 1)
        g = F.slice(t, 1, m)
        for k in range(2, n + 1):
            g = F.zip_with(g, F.slice(t, k, m), lambda a, b: F.concat(a, F.lit(" "), b))
        return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(g)

    def counted(g: Column) -> Column:
        dg = F.array_distinct(g)
        return F.zip_with(
            dg,
            F.transform(dg, lambda d: F.size(F.filter(g, lambda x: x == d))),
            lambda d, c: F.struct(d.alias("g"), c.alias("c")),
        )

    g2 = counted(grams(2))
    # argmax by count, min-gram tie-break, as a single ordered struct-min
    top2 = F.array_min(
        F.transform(g2, lambda s: F.struct((-s["c"]).alias("nc"), s["g"].alias("g")))
    )
    top2_chars = F.when(F.size(g2) == 0, F.lit(0)).otherwise(
        (-top2["nc"]) * F.length(top2["g"])
    )
    g5 = counted(grams(5))
    dup5_chars = F.aggregate(
        F.transform(
            g5,
            lambda s: F.when(s["c"] > 1, s["c"] * F.length(s["g"])).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )

    def frac(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(0.0)).otherwise(F.round(num / den, 6))

    return docs.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        frac(n_lines - F.size(dlines), n_lines).alias("dup_line_frac"),
        frac(dup_line_chars, line_chars).alias("dup_line_char_frac"),
        frac(top2_chars, n_chars).alias("top_2gram_char_frac"),
        frac(dup5_chars, n_chars).alias("dup_5gram_frac"),
    )


def vocabulary(
    docs: DataFrame,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (token, n_occ, n_docs) — the corpus-wide term table (tokenizer
    vocab building / df-based stopword discovery). One explode + one
    groupBy(token); n_docs is an exact distinct count (Spark plans it as
    an expand + two-level aggregate, still one logical exchange on token).
    ``min_count`` prunes the long singleton tail before it is ever
    collected anywhere."""
    t = tokens_col(F.col(text_col))
    ex = docs.select(F.col(id_col).alias("doc_id"), F.explode(t).alias("token"))
    return (
        ex.groupBy("token")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occ") >= min_count)
    )


def tfidf(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, token, tf, df, tfidf6) — classic tf·idf term weights,
    idf = ln(N/df) (natural log, no smoothing: df >= 1 by construction).

    Plan shape: one explode + groupBy(doc,token) builds tf; df FALLS OUT
    of tf (group again by token, count rows — tf rows are already unique
    per (doc, token), no second distinct pass over the corpus); N rides a
    broadcast single-row cross join. Three exchanges on naturally-bounded
    keys, everything codegen.
    """
    t = tokens_col(F.col(text_col))
    ex = docs.select(F.col(id_col).alias("doc_id"), F.explode(t).alias("token"))
    tf = ex.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dftab = tf.groupBy("token").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_total"))
    return (
        tf.join(dftab.where(F.col("df") >= min_df), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_total") / F.col("df")), 6
            ).alias("tfidf6"),
        )
    )


def c4_clean(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, clean_text, n_lines_kept, n_lines_dropped, drop_doc) —
    C4-style line-level cleaning (Raffel et al. 2020, §2.2), the standard
    boilerplate stripper for webtext corpora. Map-only (array lambdas in
    one projection — zero shuffle at any corpus size).

    Line KEEP rules (all must hold, evaluated on the trimmed line):
    - at least 3 whitespace-separated words
    - ends in terminal punctuation: . ! ? or a closing double quote
    - does not mention 'javascript' (case-insensitive)
    - does not contain a curly brace (code templating)

    ``drop_doc`` flags documents C4 removes outright ('lorem ipsum'
    placeholder text anywhere, case-insensitive); the text is still
    cleaned so callers can inspect, but a curation pipeline filters on
    the flag. clean_text joins surviving lines with newlines.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def keep(x: Column) -> Column:
        low = F.lower(x)
        words = F.size(F.filter(F.split(x, " "), lambda w: w != ""))
        terminal = (
            x.endswith(".") | x.endswith("!") | x.endswith("?") | x.endswith('"')
        )
        return (
            (words >= 3)
            & terminal
            & ~low.contains("javascript")
            & ~x.contains("{")
            & ~x.contains("}")
        )

    kept = F.filter(lines, keep)
    return docs.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_dropped"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("drop_doc"),
    )


def line_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, dedup_text, n_lines_kept, n_lines_dropped) — GLOBAL
    exact line-level deduplication (the corpus-wide half of C4's cleanup,
    Raffel et al. 2020 §2.2: boilerplate lines — nav bars, cookie
    banners, footers — repeat across millions of pages; only the first
    occurrence corpus-wide survives).

    First occurrence is a total order, (doc_id, line_pos) ascending, so
    the result is deterministic and resumable. Plan shape: one explode,
    one shuffle keyed on the line text (row_number window — the
    per-line state is one rank, no posting list), one shuffle back on
    doc_id to rebuild surviving text in original line order. Nothing is
    quadratic and no driver-side state: at 100 TB the line-keyed
    exchange is the same partitioned hash any groupBy runs, and
    boilerplate hot lines (millions of copies) cost one min() each, not
    a blowup, because row_number over an ordered window short-circuits
    to a streaming rank per partition key.
    """
    lines = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
        )
        .select("doc_id", "pos", F.trim("raw").alias("line"))
        .where(F.col("line") != "")
    )
    w = Window.partitionBy("line").orderBy(F.asc("doc_id"), F.asc("pos"))
    kept = lines.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("dedup_text"),
        F.count("*").alias("n_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+[0-9]{2}[0-9 ]{6,12}[0-9]"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_redact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_emails, n_phones, n_ipv4, clean_text) — the standard
    pre-training PII scrub: emails, international-format phone numbers,
    and IPv4 addresses replaced by typed placeholder tokens.

    Redaction is staged (emails first, then phones, then IPv4) and each
    count is taken on the text the stage actually sees, so counts equal
    redactions exactly even when categories could overlap (digits inside
    an email never double-count as a phone). Patterns stick to the
    ASCII-explicit subset ([0-9], \\b) that Java regex and RE2 interpret
    identically, so the DuckDB oracle matches byte-for-byte. Map-only:
    one whole-stage-codegen projection, zero shuffle at any scale.
    """
    t0 = F.col(text_col)
    n_em = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ph = F.regexp_count(t1, F.lit(PII_PHONE))
    t2 = F.regexp_replace(t1, PII_PHONE, "<PHONE>")
    n_ip = F.regexp_count(t2, F.lit(PII_IPV4))
    t3 = F.regexp_replace(t2, PII_IPV4, "<IP>")
    return docs.select(
        F.col(id_col),
        n_em.cast("long").alias("n_emails"),
        n_ph.cast("long").alias("n_phones"),
        n_ip.cast("long").alias("n_ipv4"),
        t3.alias("clean_text"),
    )


GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, keep, reason) — the Gopher rules composite
    pre-training filter (Rae et al. 2021, Appendix A): token-count range,
    mean token length, minimum stopword hits, symbol ratio, bullet-line
    and ellipsis-line fractions. ``reason`` names the FIRST violated rule
    (audit trail for what each rule costs), NULL when kept.

    One whole-stage-codegen projection — every rule is an array/regex
    expression over the row, zero shuffle at any corpus size; the rules
    compose the same normalized-token base as token_stats so thresholds
    mean the same thing across operators.
    """
    t = tokens_col(F.col(text_col))
    n = F.size(t)
    mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)) / n
    )
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*GOPHER_STOP)))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    nl = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda x: x.startswith("- ") | x.startswith("* "))
    )
    ellipsis = F.size(F.filter(lines, lambda x: x.endswith("...")))
    bullet_frac = F.when(nl == 0, F.lit(0.0)).otherwise(bullet / nl)
    ellipsis_frac = F.when(nl == 0, F.lit(0.0)).otherwise(ellipsis / nl)
    sym_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(F.col(text_col), F.lit("[#%]")) / n
    )
    reason = (
        F.when((n < 50) | (n > 100000), F.lit("n_tokens"))
        .when((mean_len < 3) | (mean_len > 10), F.lit("mean_tok_len"))
        .when(stop_hits < 2, F.lit("stopwords"))
        .when(sym_ratio > 0.1, F.lit("symbol_ratio"))
        .when(bullet_frac > 0.9, F.lit("bullet_lines"))
        .when(ellipsis_frac > 0.3, F.lit("ellipsis_lines"))
        .otherwise(F.lit(None).cast("string"))
    )
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (w1, w2, c12, pmi) — corpus-wide bigram collocations with
    pointwise mutual information: pmi = ln((c12/B) / ((c1/T)(c2/T))),
    B = total bigrams, T = total tokens. The collocation miner behind
    phrase vocabularies ("new york"-style merges) and corpus drift
    monitoring; ``min_count`` cuts the hapax tail BEFORE the unigram
    joins, so the pair table the joins touch is small at any corpus size.

    Shape: one bigram aggregation (zip_with over the token array, no
    per-element slice), one unigram aggregation, two token-keyed joins
    onto the already-thresholded pair table, scalar totals via broadcast
    crossJoin. No driver actions.
    """
    t = tokens_col(F.col(text_col))
    m = F.size(t) - 1
    bi = F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(t, 1, m), F.slice(t, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    bigrams = docs.select(F.explode(bi).alias("bg")).select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    bc = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    toks = docs.select(F.explode(t).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    totals = (
        toks.agg(F.count("*").cast("double").alias("T"))
        .crossJoin(bigrams.agg(F.count("*").cast("double").alias("B")))
    )
    u1 = uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log(
                    (F.col("c12") / F.col("B"))
                    / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
                ),
                6,
            ).alias("pmi"),
        )
    )


def lm_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, avg_neg_logp) for docs with >=1 token — the
    unigram-LM quality proxy (corpus-statistics perplexity surrogate):
    per-doc mean of -ln p(token) under the corpus's own unigram
    distribution. Low = boilerplate/common-word text, high = rare-token
    soup; the standard cheap stand-in for a KenLM filter stage.

    Two aggregations + one shuffle join keyed on token: the frequency
    table is an agg over the exploded tokens, the corpus total rides a
    broadcast crossJoin of a 1-row aggregate (no driver action), and the
    rejoin partitions by token — hot stopword keys are bounded because the
    join's build side is one row per distinct token, not per occurrence.
    Score rounded to 6 decimals (float-sum order tolerance, same
    convention as avg_token_len).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("total_toks"))
    scored = toks.join(freq, "tok").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(
            F.avg(-F.log(F.col("c") / F.col("total_toks"))), 6
        ).alias("avg_neg_logp"),
    )


def lm_score2(
    docs: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_bigrams, avg_neg_logp2) for docs with >=2 tokens —
    bigram-LM surprisal: mean of -ln p(w2|w1) with add-alpha smoothing,
    p = (c(w1 w2)+alpha) / (c(w1)+alpha*V), counts from the corpus
    itself. The conditional upgrade of ``lm_score``: boilerplate scores
    low (predictable continuations), shuffled/garbled text scores high
    even when its unigrams are common — the signal a KenLM filter brings,
    without the model artifact.

    Bigram arrays are built map-only (zip_with over shifted slices, like
    the shingle path); counting/joining shuffles on the bigram key, and
    the (V, alpha) normalizer rides a broadcast 1-row aggregate.
    """
    t = tokens_col(F.col(text_col))
    m = F.size(t) - 1
    bi = F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(t, 1, m), F.slice(t, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    dbg = docs.select(F.col(id_col), F.explode(bi).alias("bg")).select(
        id_col,
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    bc = dbg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    toks = docs.select(F.explode(t).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count("*").alias("c1")).select(
        F.col("tok").alias("w1"), "c1"
    )
    vv = toks.agg(F.countDistinct("tok").cast("double").alias("V"))
    a = float(alpha)
    scored = (
        dbg.join(bc, ["w1", "w2"]).join(uc, "w1").crossJoin(F.broadcast(vv))
    )
    p = (F.col("c12") + a) / (F.col("c1") + a * F.col("V"))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logp2"),
    )


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


def rare_token_mask(
    docs: DataFrame,
    min_df: int = 3,
    placeholder: str = "<RARE>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_tokens, n_masked, masked_text): suppression-style
    de-identification — every token whose corpus DOCUMENT frequency is
    below ``min_df`` is replaced by ``placeholder`` in the normalized
    token stream. The complement to pattern PII scrubbing
    (:func:`pii_redact`): names, handles, and ids too rare to be safe
    are removed wholesale, the k-anonymity idea applied to tokens.

    Shapes: one positional explode; the df table is a distinct
    (doc, token) count — both shuffles key on token; the rebuild is one
    groupBy doc with an order-preserving sort_array(collect_list(struct))
    (the same rebuild line_dedup uses). At 100 TB the df table is
    vocabulary-sized and the frequent side of the join could ride a
    broadcast bloom of the SAFE set; the plain shuffle join here is the
    general path.
    """
    pos_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "tok"),
    )
    dfreq = (
        pos_toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    j = pos_toks.join(dfreq, "tok")
    masked = F.when(F.col("df") >= min_df, F.col("tok")).otherwise(
        F.lit(placeholder)
    )
    return (
        j.select(
            "doc_id", "pos", masked.alias("mt"),
            (F.col("df") < min_df).cast("long").alias("is_masked"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("is_masked").cast("long").alias("n_masked"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("pos"), F.col("mt"))
                        )
                    ),
                    lambda s: s["mt"],
                ),
            ).alias("masked_text"),
        )
    )


def js_divergence_pairs(
    docs: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (key_a, key_b, jsd6): Jensen-Shannon divergence between every
    pair of per-key unigram distributions — the corpus-drift / mirror-
    detection metric (0 = identical language use, ln 2 = disjoint).
    JSD = (KL(P||M) + KL(Q||M)) / 2, M the midpoint; zero-probability
    terms contribute 0 (the standard convention), so the sum runs over
    the UNION vocabulary via a key-pair x token grid.

    Shapes: one explode + (key, token) count, then a small grid join —
    |keys|^2/2 x |vocab| rows, fine when keys are sources/domains (the
    intended grain); per-token probabilities join in twice by key. At
    web scale the vocab side is capped to the top-k tokens per key
    first (the tail adds nothing to JSD at 6 decimals).
    """
    st = (
        docs.select(
            F.col(key_col).alias("k"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("k", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = st.groupBy("k").agg(F.sum("c").alias("t"))
    p = st.join(tot, "k").select(
        "k", "tok", (F.col("c").cast("double") / F.col("t")).alias("p")
    )
    keys = st.select("k").distinct()
    toks = st.select("tok").distinct()
    grid = (
        keys.select(F.col("k").alias("ka"))
        .crossJoin(keys.select(F.col("k").alias("kb")))
        .where(F.col("ka") < F.col("kb"))
        .crossJoin(toks)
    )
    j = (
        grid.join(
            p.select(F.col("k").alias("ka"), "tok", F.col("p").alias("pa")),
            ["ka", "tok"], "left",
        )
        .join(
            p.select(F.col("k").alias("kb"), "tok", F.col("p").alias("pb")),
            ["kb", "tok"], "left",
        )
        .select(
            "ka", "kb",
            F.coalesce("pa", F.lit(0.0)).alias("pa"),
            F.coalesce("pb", F.lit(0.0)).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = (
        F.when(F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m))
        .otherwise(F.lit(0.0))
    )
    return (
        j.groupBy(F.col("ka").alias("key_a"), F.col("kb").alias("key_b"))
        .agg(F.round(F.sum(term), 6).alias("jsd6"))
    )


def lexical_diversity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, n_tokens, n_types, ttr6, hapax_frac6): type-token
    ratio and hapax-legomena fraction — the lexical-diversity quality
    signals (low TTR = repetitive boilerplate; high hapax = OCR noise /
    mojibake). One explode + (doc, token) count + doc aggregate: the
    scale shape, never a per-doc O(n^2) array scan.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.round(F.count("*").cast("double") / F.sum("c"), 6).alias("ttr6"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")).cast("double")
            / F.count("*"),
            6,
        ).alias("hapax_frac6"),
    )
