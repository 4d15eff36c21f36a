"""URL canonicalization: alias spellings collapse, distinct pages don't."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.urlops import alias_groups, canonicalize

CASES = [
    # (input, canonical)
    ("HTTP://Docs.Example:80//a/./index.html?b=2&a=1#frag",
     "http://docs.example/a/?a=1&b=2"),
    ("https://docs.example:443/a", "https://docs.example/a"),
    ("https://docs.example:8443/a", "https://docs.example:8443/a"),
    ("http://docs.example:443/a", "http://docs.example:443/a"),  # not http's port
    ("https://Example.COM", "https://example.com/"),
    ("https://example.com///x////y", "https://example.com/x/y"),
    ("https://example.com/x/././y/.", "https://example.com/x/y/"),
    ("https://example.com/index.htm", "https://example.com/"),
    ("https://example.com/windex.html", "https://example.com/windex.html"),
    ("https://example.com/p?z=1&a=2&m=0", "https://example.com/p?a=2&m=0&z=1"),
    ("https://example.com/p?redir=https://other.example/q",
     "https://example.com/p?redir=https://other.example/q"),
    ("https://example.com/p#a#b", "https://example.com/p"),
    ("https://example.com/?q=1", "https://example.com/?q=1"),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["c"] for r in
           df.select(canonicalize(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_alias_groups_collapse(spark):
    df = spark.createDataFrame(
        [("HTTPS://A.example/p",), ("https://a.example:443/p",),
         ("https://a.example/p#x",), ("https://b.example/p",)],
        ["url"],
    )
    groups = {r["canon_url"]: r["n_aliases"]
              for r in alias_groups(df).collect()}
    assert groups == {"https://a.example/p": 3, "https://b.example/p": 1}


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    once = df.select(canonicalize(F.col("url")).alias("url"))
    twice = once.select(canonicalize(F.col("url")).alias("url"))
    assert [r["url"] for r in once.collect()] == \
        [r["url"] for r in twice.collect()]


def test_canonicalize_stays_jvm_side(spark):
    """The whole expression compiles into one codegen'd projection —
    no Python eval stage in the plan. (Built over range(), not a local
    relation, so the plan shows the codegen wrapper.)"""
    import io
    from contextlib import redirect_stdout

    df = spark.range(100).select(
        F.concat(F.lit("HTTP://Host"), F.col("id"),
                 F.lit(".Example:80//p?b=2&a=1#f")).alias("url")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.select(canonicalize(F.col("url")).alias("c")).explain("formatted")
    plan = buf.getvalue()
    assert "Python" not in plan
    head = plan.split("\n\n")[0]
    # every physical node is starred (inside a codegen span) — array_sort
    # would regress the canonicalize Project to interpreted eval
    starred = [ln for ln in head.splitlines()[1:] if ln.strip()]
    assert starred and all("* " in ln for ln in starred), head
