"""Extractor invariant: byte-identical text per url vs the canonical
reference extractor; exact ordered link lists (BASELINE.json:16)."""

import pandas as pd
import pytest

from linkgraph import corpus
from linkgraph.extract import (
    anchors_series,
    extract_links,
    extract_links_with_text,
    extract_text,
    extracted_text,
    links_series,
    text_series,
)


@pytest.mark.parametrize("n_pages", [corpus.TINY, corpus.SMALL])
def test_text_byte_identity_vectorized_vs_reference(n_pages):
    rows, _ = corpus.gen_corpus(corpus.DEFAULT_SEED, n_pages)
    html = pd.Series([r.html for r in rows])
    vec = text_series(html)
    for i, r in enumerate(rows):
        ref = extract_text(r.html)
        assert vec.iloc[i] == ref, r.url
        assert ref == r.text, r.url  # generator's oracle column round-trips


@pytest.mark.parametrize("n_pages", [corpus.TINY, corpus.SMALL])
def test_links_exact_vectorized_vs_reference(n_pages):
    rows, links_by_url = corpus.gen_corpus(corpus.DEFAULT_SEED, n_pages)
    html = pd.Series([r.html for r in rows])
    base = pd.Series([r.url for r in rows])
    vec = links_series(html, base)
    for i, r in enumerate(rows):
        ref = extract_links(r.html, r.url)
        assert list(vec.iloc[i]) == ref, r.url
        assert ref == links_by_url[r.url], r.url


@pytest.mark.parametrize("n_pages", [corpus.TINY, corpus.SMALL])
def test_anchors_vectorized_vs_reference(n_pages):
    """A7 enrichment: vectorized (dst_url, anchor) == canonical, and the
    dst_url sequence must equal extract_links exactly (same keep/drop +
    normalization)."""
    rows, _ = corpus.gen_corpus(corpus.DEFAULT_SEED, n_pages)
    html = pd.Series([r.html for r in rows])
    base = pd.Series([r.url for r in rows])
    vec = anchors_series(html, base)
    for i, r in enumerate(rows):
        ref = extract_links_with_text(r.html, r.url)
        got = [(d["dst_url"], d["anchor"]) for d in vec.iloc[i]]
        assert got == ref, r.url
        assert [u for u, _ in ref] == extract_links(r.html, r.url), r.url


def test_anchor_unescape_and_inner_markup():
    html = (
        b'<html><a href="https://h.example/a"><b>B &amp; C</b></a>'
        b'<a href="#frag-only">dropped</a>'
        b'<a href="/rel">r &lt;tag&gt;</a></html>'
    )
    got = extract_links_with_text(html, "https://base.example/dir/page")
    assert got == [
        ("https://h.example/a", "<b>B & C</b>"),
        ("https://base.example/rel", "r <tag>"),
    ]


def test_spark_text_udf_byte_identity(spark, small):
    got = {
        r["url"]: r["text_extracted"]
        for r in extracted_text(small.pages).collect()
    }
    for row in small.rows:
        assert got[row.url] == row.text


def test_spark_links_table_exact(spark, small):
    got: dict[str, list[tuple[int, str]]] = {}
    for r in small.links.collect():
        got.setdefault(r["src_url"], []).append((r["pos"], r["dst_url"]))
    for row in small.rows:
        expected = small.links_by_url[row.url]
        actual = [d for _, d in sorted(got.get(row.url, []))]
        assert actual == expected, row.url
        poss = sorted(p for p, _ in got.get(row.url, []))
        assert poss == list(range(len(expected)))


def test_normalization_cases():
    html = (
        b'<html><body><p>x</p>'
        b'<a href="HTTPS://SITE1.EXAMPLE/pX">a</a>'
        b'<a href="/p7#frag">b</a>'
        b'<a href="sub/page">c</a>'
        b'<a href="#only-frag">d</a>'
        b'<a href="https://other.example/Q?a=1#f">e</a>'
        b"</body></html>"
    )
    base = "https://site3.example/dir/p3"
    assert extract_links(html, base) == [
        "https://site1.example/pX",
        "https://site3.example/p7",
        "https://site3.example/dir/sub/page",
        "https://other.example/Q?a=1",
    ]
    vec = links_series(pd.Series([html]), pd.Series([base]))
    assert list(vec.iloc[0]) == extract_links(html, base)


def test_empty_and_no_links():
    html = b"<html><body><p>just text</p></body></html>"
    assert extract_links(html, "https://a.example/p") == []
    assert extract_text(html) == "just text"
    vec = links_series(pd.Series([html]), pd.Series(["https://a.example/p"]))
    assert list(vec.iloc[0]) == []


def test_entity_unescape_matches():
    html = "<html><body><p>a &amp;lt; b &lt;x&gt; &amp; c</p></body></html>".encode()
    ref = extract_text(html)
    assert ref == "a &lt; b <x> & c"
    assert text_series(pd.Series([html])).iloc[0] == ref


def test_source_line_links_line_map(spark):
    from linkgraph.extract import source_line_links

    html0 = (
        'no links here\n'
        'two: <a href="https://a.example/x">A</a> <a href="HTTP://B.EX/y#f">B</a>\n'
        'none\n'
        'one: <a href="/rel/path">rel</a>'
    )
    html1 = '<a href="https://only.example/">o</a>'
    pages = spark.createDataFrame(
        [(0, html0.encode()), (1, html1.encode())], "doc_id long, html binary"
    )
    got = sorted(
        source_line_links(pages).collect(),
        key=lambda r: (r["doc_id"], r["line_no"]),
    )
    assert [(r["doc_id"], r["line_no"], r["n_links"]) for r in got] == [
        (0, 2, 2), (0, 4, 1), (1, 1, 1),
    ]
    # hrefs exactly as written: no normalization, case and fragments kept
    assert got[0]["hrefs"] == ["https://a.example/x", "HTTP://B.EX/y#f"]
    assert got[1]["hrefs"] == ["/rel/path"]
    assert got[2]["hrefs"] == ["https://only.example/"]


def test_anchor_corpus_aggregates_per_target(spark):
    from linkgraph.extract import anchor_corpus

    anchors = spark.createDataFrame(
        [
            (0, "u1", "click"),
            (1, "u1", "click"),
            (1, "u1", "here"),
            (2, "u2", "only"),
        ],
        "src_doc long, dst_url string, anchor string",
    )
    got = {r["dst_url"]: r for r in anchor_corpus(anchors).collect()}
    u1 = got["u1"]
    assert (u1["n_anchors"], u1["n_src_docs"], u1["n_unique_anchors"]) == (3, 2, 2)
    assert u1["anchor_sample"] == "click"
    assert got["u2"]["n_anchors"] == 1
