"""Multinomial Naive Bayes text classifier as pure DataFrame algebra.

The LLM-pipeline use: train a cheap bag-of-words classifier (language,
domain, quality tier) on a labelled slice and score the whole corpus —
the fastText-classifier step of C4/CCNet-style curation, re-expressed as
two aggregations and one token-keyed join so it runs at 100 TB without
leaving the JVM.

Model = token counts. With Laplace(+1) smoothing the per-class score is

    score(d, l) = ln P(l) + sum_{tok in d} ln( (c(l,tok)+1) / (N_l+V) )
                = ln(n_docs_l / n_docs)
                  - n_d * ln(N_l + V)
                  + sum_{tok in d} ln(c(l,tok) + 1)

where c(l,tok)=0 terms contribute ln(1)=0 — so the scoring join only has
to touch (tok, label) pairs that EXIST in the model: explode the test
docs, inner-join the conditional-count table on ``tok``, aggregate
ln(c+1) per (doc, label), and fold the closed-form remainder in from the
tiny per-class stats table. Nothing is per-row Python and nothing is
O(V x docs).

Scale notes (100 TB corpus, ~1M-token vocab, <100 labels):
- train: one explode + one (label, tok) groupBy — partial aggregation
  map-side, output is the model (O(V x L) rows, usually small enough to
  broadcast back for scoring);
- score: hash join keyed on ``tok``; a hot stopword token matches at
  most L model rows, so the join cannot blow up quadratically the way a
  doc-doc self-join would;
- the per-class stats (L rows) and vocab size (1 row) ride along as
  broadcast cross-joins, never a driver collect.

Reference anchor: the reference classifies rows against a tiny in-memory
dimension table (reference complexity.py:60-84 class-name lookup); this
is the corpus-scale generalisation of that broadcast-classify shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_col

__all__ = ["nb_model", "nb_classify", "train_split_coin"]

# md5-prefix coin, identical in Spark and DuckDB (lowercase-hex compare):
# P[coin < 'cccccc'] = 0xcccccc / 16^6 = 0.8 exactly.
_SPLIT_THRESHOLD = "cccccc"


def train_split_coin(id_col: str = "doc_id", seed: str = "nb") -> Column:
    """Lexicographic md5-prefix uniform keyed on (id, seed) — the same
    portable coin as sampling.hash_sample, so the train/test split
    replays bit-identically in any engine with md5()."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 6
    )


def nb_model(
    train: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """-> (cond, stats).

    cond:  (label, tok, c) — token-instance counts per class (the model).
    stats: (label, n_docs, n_tokens, vocab, n_docs_total) — per-class
           doc/token totals plus the global train vocab size and corpus
           doc count, pre-joined so scoring needs no further driver
           action. L rows; broadcastable.
    """
    from .lineage import truncate_plan

    # ONE corpus explode: cond is materialized once and every other model
    # statistic derives from it (n_tokens = sum of counts, vocab =
    # distinct toks) or from a cheap no-explode doc scan (n_docs) — the
    # plan audit showed the naive form re-running the explode+aggregate
    # pass three times, once per downstream branch.
    ex = train.select(
        F.col(label_col).alias("label"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    cond = truncate_plan(ex.groupBy("label", "tok").agg(F.count("*").alias("c")))
    per_class = cond.groupBy("label").agg(F.sum("c").alias("n_tokens"))
    # classes with zero tokens (all-empty docs) still need a stats row
    all_class = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count_distinct(id_col).alias("n_docs")
    )
    globals_ = cond.agg(
        F.count_distinct("tok").alias("vocab")
    ).crossJoin(
        train.agg(F.count_distinct(id_col).alias("n_docs_total"))
    )
    stats = (
        all_class.join(per_class, "label", "left")
        .select(
            "label",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
        .crossJoin(F.broadcast(globals_))
    )
    return cond, stats


def nb_classify(
    test: DataFrame,
    cond: DataFrame,
    stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, pred, score) — argmax-class per test doc with its
    ln-posterior (up to the shared evidence constant). Ties break on the
    lexicographically smallest label so the argmax is deterministic."""
    base = test.select(F.col(id_col).alias("doc_id"),
                       tokens_col(F.col(text_col)).alias("t"))
    n_d = base.select("doc_id", F.size("t").cast("long").alias("n_d"))
    ex = base.select("doc_id", F.explode("t").alias("tok"))

    # sparse part: only (tok, label) pairs present in the model matter
    hits = (
        ex.join(cond, "tok")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.log(F.col("c") + F.lit(1.0))).alias("s"))
    )

    scored = (
        n_d.crossJoin(F.broadcast(stats))
        .join(hits, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            (
                F.log(F.col("n_docs") / F.col("n_docs_total"))
                - F.col("n_d")
                * F.log(F.col("n_tokens") + F.col("vocab") + F.lit(0.0))
                + F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id", F.col("label").alias("pred"), "score")
    )
