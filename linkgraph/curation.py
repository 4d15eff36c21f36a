"""Corpus curation summaries — the reporting layer of a training-data
pipeline (what fraction of each source survives dedup + quality gates,
and what it contributes in tokens).

≙ reference capability: per-group enrichment/aggregation over classified
rows (/root/reference/src/ccm/complexity.py:34-55 computes per-graph
scalar rollups; here the grouping key is the corpus ``source``).

Scale shape: ONE projection computes every per-doc signal (quality
expressions + content fingerprint, all JVM whole-stage codegen), one
window over the fingerprint marks exact duplicates, one aggregation by
source produces the report — two exchanges total, no self-joins, nothing
per-row in Python. At 100 TB both exchanges are on keys with natural
cardinality bounds (distinct fingerprints, distinct sources).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textops import norm_col, quality_cols


def source_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, n_docs, total_tokens, avg_quality, avg_stopword_ratio,
    exact_dup_frac) — one row per source.

    ``exact_dup_frac`` is the fraction of the source's docs an exact
    dedup pass would drop: duplicates are corpus-GLOBAL (same normalized
    text anywhere, keeper = min doc id, the engine-wide min tie-break),
    then attributed to the source of each dropped doc.
    """
    q = quality_cols(text_col)
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        q["n_tokens"].alias("n_tokens"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["quality_score"].alias("quality_score"),
        F.md5(norm_col(F.col(text_col))).alias("fp_md5"),
    )
    flagged = per_doc.withColumn(
        "is_dup",
        F.col("doc_id") != F.min("doc_id").over(Window.partitionBy("fp_md5")),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
        F.round(F.avg(F.col("is_dup").cast("double")), 6).alias("exact_dup_frac"),
    )


def adaptive_quality_filter(
    docs: DataFrame,
    key_col: str = "lang",
    frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> surviving (doc_id, <key_col>, quality_score, thr) — keep docs at
    or above their OWN stratum's quality quantile. Fixed global cutoffs
    over-filter strata whose score distribution sits low (different
    languages punctuate and stopword differently); a per-stratum quantile
    is the standard adaptive fix.

    One projection computes the scores, one |keys|-row aggregation the
    thresholds, and the threshold table broadcasts back — no second scan
    of the corpus, no driver action. Exact percentile locally; swap in
    percentile_approx at cluster scale (same call shape).
    """
    from .textops import quality

    q = quality(docs, id_col=id_col, text_col=text_col).join(
        docs.select(F.col(id_col), F.col(key_col)), id_col
    )
    thr = q.groupBy(key_col).agg(
        F.percentile("quality_score", F.lit(float(frac))).alias("thr")
    )
    return (
        q.join(F.broadcast(thr), key_col)
        .where(F.col("quality_score") >= F.col("thr"))
        .select(
            id_col,
            key_col,
            F.round("quality_score", 6).alias("quality_score"),
            F.round("thr", 6).alias("thr"),
        )
    )


def category_mi(docs: DataFrame, a_col: str = "source", b_col: str = "lang") -> DataFrame:
    """-> one row (n_docs, mi, nmi) — mutual information between two
    categorical doc attributes (source x lang by default), the mixture
    diagnostic: MI near 0 = languages spread evenly over sources; high =
    sources are language silos (so per-source sampling skews the language
    mix and the curation plan must stratify jointly). nmi normalizes by
    the smaller marginal entropy (0..1).

    One joint count aggregation (|A|x|B| rows), two marginal aggregations
    derived from it, a broadcast total — nothing scales with corpus size
    past the first groupBy.
    """
    joint = docs.groupBy(a_col, b_col).agg(F.count("*").alias("c"))
    ma = joint.groupBy(a_col).agg(F.sum("c").alias("ca"))
    mb = joint.groupBy(b_col).agg(F.sum("c").alias("cb"))
    tot = joint.agg(F.sum("c").alias("n"))
    j = (
        joint.join(ma, a_col)
        .join(mb, b_col)
        .crossJoin(F.broadcast(tot))
    )
    term = (F.col("c") / F.col("n")) * F.log(
        (F.col("c") * F.col("n")) / (F.col("ca") * F.col("cb"))
    )
    ent = lambda cc: -(cc / F.col("n")) * F.log(cc / F.col("n"))  # noqa: E731
    ha = ma.crossJoin(F.broadcast(tot)).agg(F.sum(ent(F.col("ca"))).alias("ha"))
    hb = mb.crossJoin(F.broadcast(tot)).agg(F.sum(ent(F.col("cb"))).alias("hb"))
    return (
        j.agg(F.sum(term).alias("mi"), F.max("n").alias("n_docs"))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("mi", 6).alias("mi"),
            F.round(
                F.col("mi") / F.least(F.col("ha"), F.col("hb")), 6
            ).alias("nmi"),
        )
    )
