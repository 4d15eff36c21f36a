"""Naive Bayes classifier: exact-score replica, determinism, edge cases."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from linkgraph.classify import nb_classify, nb_model, train_split_coin


def _toks(text):
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return norm.split(" ") if norm else []


def _replica(train_rows, test_rows):
    """(label, text) train rows -> {doc_id: (pred, score)} via the exact
    Laplace-smoothed multinomial NB formula, computed independently."""
    cond, n_tok, n_doc = {}, {}, {}
    vocab = set()
    for label, text in train_rows:
        n_doc[label] = n_doc.get(label, 0) + 1
        for t in _toks(text):
            cond[(label, t)] = cond.get((label, t), 0) + 1
            n_tok[label] = n_tok.get(label, 0) + 1
            vocab.add(t)
    total_docs = sum(n_doc.values())
    v = len(vocab)
    out = {}
    for doc_id, text in test_rows:
        toks = _toks(text)
        best = None
        for label in sorted(n_doc):
            s = math.log(n_doc[label] / total_docs)
            s -= len(toks) * math.log(n_tok.get(label, 0) + v)
            for t in toks:
                s += math.log(cond.get((label, t), 0) + 1)
            if best is None or s > best[1] + 1e-12:
                best = (label, s)
        out[doc_id] = best
    return out


TRAIN = [
    ("en", "the cat sat on the mat and the dog barked"),
    ("en", "a quick brown fox jumps over the lazy dog"),
    ("en", "the rain in spain stays mainly on the plain"),
    ("de", "der hund bellt und die katze schläft auf der matte"),
    ("de", "die schnelle braune füchsin springt über den faulen hund"),
    ("de", "der regen in spanien bleibt meistens auf der ebene"),
]
TEST = [
    (1, "the dog sat on the plain"),
    (2, "der hund springt über die katze"),
    (3, "fox und hund"),  # mixed — replica decides the tie policy
    (4, ""),  # empty doc: score = prior - 0, argmax = max-prior class
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, "lang string, text string").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    return nb_model(train, label_col="lang")


def test_nb_scores_match_replica(spark, model):
    cond, stats = model
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {r["doc_id"]: (r["pred"], r["score"])
           for r in nb_classify(test, cond, stats).collect()}
    want = _replica(TRAIN, TEST)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], f"doc {d}"
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-9)


def test_nb_model_stats(spark, model):
    cond, stats = model
    rows = {r["label"]: r for r in stats.collect()}
    assert set(rows) == {"en", "de"}
    assert rows["en"]["n_docs"] == 3 and rows["de"]["n_docs"] == 3
    assert rows["en"]["n_docs_total"] == 6
    # vocab is global and identical on every stats row
    assert rows["en"]["vocab"] == rows["de"]["vocab"] > 0
    en_toks = sum(len(_toks(t)) for l, t in TRAIN if l == "en")
    assert rows["en"]["n_tokens"] == en_toks
    # cond counts multiplicity: 'the' appears 6x in en train text
    the = {r["label"]: r["c"] for r in cond.where(F.col("tok") == "the").collect()}
    assert the == {"en": 6}


def test_nb_empty_test_and_empty_train_class(spark):
    # a class whose only doc is empty text still gets a stats row and
    # can win on prior alone for empty test docs
    train = spark.createDataFrame(
        [("a", "x y z", 1), ("a", "x y", 2), ("b", "", 3)],
        "lang string, text string, doc_id long",
    )
    cond, stats = nb_model(train, label_col="lang")
    assert {r["label"] for r in stats.collect()} == {"a", "b"}
    test = spark.createDataFrame([(9, "")], "doc_id long, text string")
    out = nb_classify(test, cond, stats).collect()
    assert len(out) == 1
    # priors: a=2/3, b=1/3 -> empty doc predicted 'a'
    assert out[0]["pred"] == "a"


def test_split_coin_is_portable_md5(spark):
    df = spark.createDataFrame([(17,), (42,)], "doc_id long")
    got = {r["doc_id"]: r["coin"]
           for r in df.select("doc_id", train_split_coin().alias("coin")).collect()}
    for k, coin in got.items():
        assert coin == hashlib.md5(f"{k}:nb".encode()).hexdigest()[:6]
