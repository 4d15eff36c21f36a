"""BM25 retrieval: engine vs a pure-Python oracle on a hand corpus."""

from __future__ import annotations

import math
import re

from linkgraph.search import bm25_topk, postings

DOCS = [
    (0, "spark join window join join"),
    (1, "spark filter"),
    (2, "window sort merge window"),
    (3, "the quick brown fox"),
    (4, ""),
    (5, "join"),
]
QUERIES = [(0, "spark join"), (1, "window"), (2, "zebra")]


def _toks(s: str) -> list[str]:
    n = re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()
    return n.split(" ") if n else []


def _bm25_oracle(k: int = 5, k1: float = 1.2, b: float = 0.75):
    toks = {i: _toks(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, q in QUERIES:
        scores = {}
        for term in sorted(set(_toks(q))):
            dfreq = sum(1 for t in toks.values() if term in t)
            if not dfreq:
                continue
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            for i, t in toks.items():
                tf = t.count(term)
                if tf:
                    dl = len(t)
                    scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * dl / avgdl))
        ranked = sorted(
            ((round(s, 6), i) for i, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        out[qid] = [(r + 1, i, s) for r, (s, i) in enumerate(ranked)]
    return out


def test_postings_shape(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    post = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in postings(docs).collect()}
    assert post[(0, "join")] == (3, 5)
    assert post[(0, "spark")] == (1, 5)
    assert (4, "") not in post and not any(d == 4 for d, _ in post)


def test_bm25_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "qtext"])
    got = {}
    for r in bm25_topk(docs, qs, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 6)))
    for qid in got:
        got[qid].sort()
    want = {qid: rows for qid, rows in _bm25_oracle().items() if rows}
    assert got == want
    assert 2 not in got  # no corpus doc contains 'zebra'


def test_bm25_k_truncates(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame([(0, "join window spark")],
                               ["query_id", "qtext"])
    rows = bm25_topk(docs, qs, k=2).collect()
    assert len(rows) == 2 and sorted(r["rank"] for r in rows) == [1, 2]


def test_bm25_two_phase_exact_under_many_partitions(spark):
    # the per-partition partial top-k must be exact however the scored
    # rows are split; force many tiny partitions
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"]).repartition(7)
    qs = spark.createDataFrame(QUERIES, ["query_id", "qtext"])
    got = {(r["query_id"], r["rank"]): r["doc_id"]
           for r in bm25_topk(docs, qs, k=3).collect()}
    want = {(qid, rk): d for qid, rows in _bm25_oracle(k=3).items()
            for rk, d, _ in rows}
    assert got == want
