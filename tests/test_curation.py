"""Per-source curation report: aggregates match a pure-Python replica;
global dup attribution lands on the dropped doc's source."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from linkgraph.curation import source_report
from linkgraph import textops


def test_source_report_handcrafted(spark):
    rows = [
        # s1: two docs, one the global keeper of a dup pair
        (0, "the quick brown fox jumps over it", "s1"),
        (1, "totally unique text in s1 and that is fine", "s1"),
        # s2: exact dup of doc 0 (normalized) -> dropped, attributed to s2
        (2, "The  QUICK brown fox, jumps over it!", "s2"),
        (3, "another text that is unique to s2", "s2"),
        # s3: internal dup pair -> one dropped
        (4, "same same", "s3"),
        (5, "same same", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_report(df).collect()}
    assert set(got) == {"s1", "s2", "s3"}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["exact_dup_frac"] == 0.0
    assert got["s2"]["n_docs"] == 2 and got["s2"]["exact_dup_frac"] == 0.5
    assert got["s3"]["n_docs"] == 2 and got["s3"]["exact_dup_frac"] == 0.5

    # totals and means agree with the per-doc quality operator
    q = {r["doc_id"]: r for r in textops.quality(df).collect()}
    for src in ("s1", "s2", "s3"):
        ids = [i for i, _, s in rows if s == src]
        assert got[src]["total_tokens"] == sum(q[i]["n_tokens"] for i in ids)
        want_avg = round(sum(q[i]["quality_score"] for i in ids) / len(ids), 6)
        # Spark rounds HALF_UP, python round() is banker's — 1 ulp@1e-6 slack
        assert got[src]["avg_quality"] == pytest.approx(want_avg, abs=2e-6)


@pytest.fixture()
def docs_df(spark):
    rows = [(i, f"doc number {i} with some shared words the and of value {i % 7}")
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_source_report_corpus(spark, docs_df):
    df = docs_df.withColumn(
        "source", F.concat(F.lit("src"), F.pmod("doc_id", F.lit(3)))
    )
    out = source_report(df).collect()
    assert sum(r["n_docs"] for r in out) == df.count()
    for r in out:
        assert 0.0 <= r["exact_dup_frac"] <= 1.0


def test_adaptive_quality_filter_per_stratum_median(spark):
    from linkgraph.curation import adaptive_quality_filter
    from linkgraph.textops import quality

    # two langs with deliberately different score distributions
    good = "this is a perfectly normal sentence with the usual words and it flows on"
    bad = "$$$ ### @@@ %%%"
    rows = (
        [(i, "en", good if i < 3 else bad) for i in range(5)]
        + [(10 + i, "de", good if i < 4 else bad) for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = {r["doc_id"] for r in adaptive_quality_filter(docs, key_col="lang").collect()}
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in quality(docs).collect()
    }
    import statistics

    for lang, ids in (("en", range(5)), ("de", range(10, 15))):
        med = statistics.median([scores[i] for i in ids])
        want = {i for i in ids if scores[i] >= med}
        assert want == (kept & set(ids)), lang


def test_category_mi_extremes(spark):
    import math

    from linkgraph.curation import category_mi

    # perfectly language-siloed sources: MI = H(lang) -> nmi = 1
    siloed = spark.createDataFrame(
        [(i, f"s{i % 2}", ["en", "de"][i % 2]) for i in range(100)],
        "doc_id long, source string, lang string",
    )
    r = category_mi(siloed).collect()[0]
    assert r["nmi"] == 1.0
    assert abs(r["mi"] - math.log(2)) < 1e-6
    # independent attributes: MI ~ 0
    indep = spark.createDataFrame(
        [(i, f"s{i % 2}", ["en", "de"][(i // 2) % 2]) for i in range(100)],
        "doc_id long, source string, lang string",
    )
    r2 = category_mi(indep).collect()[0]
    assert abs(r2["mi"]) < 1e-6
