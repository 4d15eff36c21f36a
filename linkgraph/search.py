"""Full-text retrieval over the corpus: inverted postings + BM25 top-k.

A training-data pipeline needs retrieval for targeted curation (pull the
docs most relevant to a benchmark query, audit what the model will see)
and for decontamination triage. This is the classic two-table design —

- ``postings(docs)``: the inverted index, one row per (doc, term) with
  term frequency and doc length — ONE corpus-wide shuffle (groupBy on
  (doc_id, term)); at 100 TB this is the table you bucket by ``term``
  and reuse across every query batch.
- ``bm25_topk(docs, queries)``: Okapi BM25 (Robertson/Sparck Jones; the
  Lucene ``ln(1+(N-df+.5)/(df+.5))`` idf variant) scored with the query
  set BROADCAST against the postings — the corpus side never re-shuffles
  for a new query batch. Top-k per query is the exact two-phase
  aggregation (per-partition partial top-k, then final merge), so no
  single reducer ever sees more than ``k`` rows per (query, partition) —
  a window `row_number` over a popular query would sort that query's
  whole match list on one task instead.

Tokenization is textops.tokens_col (lower, strip non-alnum) so the index
agrees with vocabulary/tfidf. Scores are rounded to 6 decimals BEFORE
ranking (ties then break on doc_id), making the ranking reproducible
across engines — this is what the DuckDB oracle relies on.

Reference scope: ccm has no retrieval; this extends the engine's text
stack (SURVEY.md §2.5 graft-added) the way tfidf (textops.py:276) does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import tokens_col

K1 = 1.2
B = 0.75


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Inverted index: (doc_id, term, tf, dl). One shuffle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("t"),
    ).withColumn("dl", F.size("t"))
    return (
        toks.select("doc_id", "dl", F.explode("t").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, dl) for every doc, including empty ones (dl=0) — the
    corpus-size/avgdl statistics must count them."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).alias("dl"),
    )


def _partial_topk(scored: DataFrame, k: int, phase_col: str) -> DataFrame:
    """Exact per-group top-k without a per-group global sort: collect at
    most k (neg_score, doc_id) structs per (query, phase) group."""
    return (
        scored.groupBy("query_id", phase_col)
        .agg(F.slice(F.sort_array(F.collect_list(
            F.struct(F.col("neg_score"), F.col("doc_id"))
        )), 1, k).alias("top"))
        .select("query_id", F.explode("top").alias("s"))
        .select("query_id", F.col("s.neg_score").alias("neg_score"),
                F.col("s.doc_id").alias("doc_id"))
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 5,
              k1: float = K1, b: float = B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k docs per query by BM25: (query_id, rank, doc_id, score).

    ``queries`` is (query_id, qtext) — tiny, broadcast. Plan shape: the
    postings scan joins the broadcast query terms and broadcast df table
    (distinct terms of the query set only — also tiny), aggregates once
    on (query_id, doc_id), then two-phase top-k.
    """
    post = postings(docs, id_col, text_col)
    dl = doc_lengths(docs, id_col, text_col)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )

    qterms = queries.select(
        "query_id", F.explode(tokens_col(F.col("qtext"))).alias("term")
    ).distinct()
    # df only for terms that appear in some query: semi-join before the
    # groupBy keeps the aggregated side broadcast-sized
    dfreq = (
        post.join(F.broadcast(qterms.select("term").distinct()), "term",
                  "left_semi")
        .groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )

    matched = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf").cast("double") * (k1 + 1))
        / (F.col("tf").cast("double")
           + k1 * (1 - b + b * F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        matched.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .select("query_id", "doc_id", (-F.col("score")).alias("neg_score"))
        .withColumn("_pid", F.spark_partition_id())
    )
    partial = _partial_topk(scored, k, "_pid")
    final = (
        partial.groupBy("query_id")
        .agg(F.slice(F.sort_array(F.collect_list(
            F.struct(F.col("neg_score"), F.col("doc_id"))
        )), 1, k).alias("top"))
        .select("query_id", F.posexplode("top").alias("pos", "s"))
        .select(
            "query_id",
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s.doc_id").alias("doc_id"),
            (-F.col("s.neg_score")).alias("score"),
        )
    )
    return final
