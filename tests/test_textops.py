"""Text-analysis operators vs a row-at-a-time pure-Python oracle."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from linkgraph import textops

DOCS = [
    (0, "The cat and the hat sat on a mat, and it was good."),
    (1, "der die das und ist nicht mit ein eine zu der die"),
    (2, ""),
    (3, "!!! ... ???"),
    (4, "le chat est dans la maison et le chien est dans le jardin pour que"),
    (5, "el perro y el gato en la casa de que un una los las"),
    (6, "word " * 30),
    (7, "café δοκιμή naïve — unicode & <tags>"),
    (8, "a b c a b c a b c"),
]


def norm(text: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()


def toks(text: str) -> list[str]:
    n = norm(text)
    return [] if n == "" else n.split(" ")


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_stats(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.token_stats(docs_df).collect()}
    for i, text in DOCS:
        t = toks(text)
        assert got[i]["n_tokens"] == len(t), text
        assert got[i]["n_chars_norm"] == len(norm(text))
        want_avg = round(sum(len(x) for x in t) / len(t), 6) if t else 0.0
        assert got[i]["avg_token_len"] == pytest.approx(want_avg, abs=1e-9)


def test_quality(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.quality(docs_df).collect()}
    sw = set(textops.STOPWORDS["en"])
    for i, text in DOCS:
        t = toks(text)
        sr = sum(1 for x in t if x in sw) / len(t) if t else 0.0
        np_ = len(re.sub(r"[^a-zA-Z0-9\s]", "", text))
        pr = (len(text) - np_) / len(text) if text else 0.0
        assert got[i]["stopword_ratio"] == pytest.approx(round(sr, 6), abs=1e-9)
        assert got[i]["punct_ratio"] == pytest.approx(round(pr, 6), abs=1e-9)
        score = (
            min(sr * 2.0, 1.0) * 0.4
            + (0.4 if 10 <= len(t) <= 5000 else 0.0)
            + max(0.0, 0.2 - pr)
        )
        assert got[i]["quality_score"] == pytest.approx(round(score, 6), abs=1e-9)


def test_langid(spark, docs_df):
    got = {r["doc_id"]: r["lang_pred"] for r in textops.langid(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[4] == "fr"
    assert got[5] == "es"
    assert got[2] == "und"  # empty
    assert got[3] == "und"  # punctuation only
    assert got[6] == "und"  # no stopwords at all
    assert got[8] == "en"  # 'a' is an en stopword


def test_fingerprint_matches_md5(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.fingerprint(docs_df).collect()}
    for i, text in DOCS:
        h = hashlib.md5(norm(text).encode()).hexdigest()
        assert got[i]["fp_md5"] == h
        assert got[i]["fp64"] == int(h[:15], 16)


def test_fingerprint_invariant_under_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO\tworld ")],
        "doc_id long, text string",
    )
    fps = [r["fp_md5"] for r in textops.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]
