"""Quotient graph + node-induced subgraph vs networkx.

≙ reference G4 (get_source_code_graph quotient, graphs.py:135-202) and
G3 (get_subgraph, graphs.py:100-133 — broken upstream, capability
reproduced here).
"""

import networkx as nx
from pyspark.sql import functions as F

from linkgraph.quotient import (
    host_graph,
    host_of,
    node_induced_subgraph,
    quotient_edges,
    quotient_graph,
)


def test_quotient_matches_networkx(spark, tiny):
    """Quotient under id % 7 equivalence == nx.quotient_graph."""
    # pmod, not %: ids are xxhash64 (negative); python % is non-negative
    mapping = tiny.vertices.select("id", F.pmod(F.col("id"), F.lit(7)).alias("key"))
    got = {
        (r["q_src"], r["q_dst"])
        for r in quotient_edges(tiny.edges, mapping).collect()
    }
    g = tiny.nx_digraph_ids()
    q = nx.quotient_graph(g, lambda u, v: u % 7 == v % 7, create_using=nx.DiGraph)
    want = {
        (min(bu) % 7, min(bv) % 7) for bu, bv in q.edges
    }
    assert got == want


def test_quotient_vertices(spark, tiny):
    mapping = tiny.vertices.select("id", F.pmod(F.col("id"), F.lit(7)).alias("key"))
    _, qv = quotient_graph(tiny.edges, mapping)
    rows = {r["key"]: (r["n_members"], r["rep_id"]) for r in qv.collect()}
    by_key = {}
    for r in tiny.vertices.select("id").collect():
        by_key.setdefault(r["id"] % 7, []).append(r["id"])
    assert rows == {k: (len(v), min(v)) for k, v in by_key.items()}


def test_host_of(spark):
    spark_rows = [
        ("https://example.com/a/b", "example.com"),
        ("HTTP://WWW.Example.ORG:8080/x", "www.example.org"),
        ("https://user:pw@sub.host.net/p?q=1", "sub.host.net"),
        ("ftp://plain.host", "plain.host"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in spark_rows], "url string")
    got = [r[0] for r in df.select(host_of(F.col("url"))).collect()]
    assert got == [h for _, h in spark_rows]


def test_host_graph(spark):
    rows = [
        ("https://a.com/1", "https://b.com/2"),
        ("https://a.com/3", "https://b.com/4"),  # same host pair -> 1 edge
        ("https://b.com/1", "https://a.com/9"),
        ("https://a.com/1", "https://a.com/2"),  # intra-host dropped
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = {(r["q_src"], r["q_dst"]) for r in host_graph(df).collect()}
    assert got == {("a.com", "b.com"), ("b.com", "a.com")}


def test_node_induced_subgraph(spark, tiny):
    keep = tiny.vertices.where(F.col("id") % 2 == 0).select("id")
    sub_e, sub_v = node_induced_subgraph(tiny.edges, tiny.vertices, keep)
    keep_ids = {r["id"] for r in keep.collect()}
    g = tiny.nx_digraph_ids().subgraph(keep_ids)
    assert {(r["src"], r["dst"]) for r in sub_e.collect()} == set(g.edges)
    degs = {r["id"]: (r["out_deg"], r["in_deg"]) for r in sub_v.collect()}
    assert set(degs) == keep_ids
    for v in keep_ids:
        assert degs[v] == (g.out_degree(v), g.in_degree(v)), v
