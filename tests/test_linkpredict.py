"""Link prediction vs a hand-computed fixture and a networkx check."""

from __future__ import annotations

import math

from linkgraph.linkpredict import link_prediction

# directed edges; undirected view:
# 1-2, 1-3, 2-3 (triangle), 4-1, 4-2 (4 shares {1,2} with 3), 5-1
EDGES = [(1, 2), (1, 3), (2, 3), (4, 1), (4, 2), (5, 1)]


def _df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_common_neighbors_and_aa(spark):
    got = {(r["u"], r["v"]): (r["cn"], r["aa"])
           for r in link_prediction(_df(spark), min_common=2).collect()}
    # 3 and 4 share neighbors {1, 2}; deg(1)=4, deg(2)=3
    aa = round(1 / math.log(4) + 1 / math.log(3), 6)
    assert got == {(3, 4): (2, aa)}


def test_existing_edges_excluded(spark):
    got = {(r["u"], r["v"]) for r in
           link_prediction(_df(spark), min_common=1).collect()}
    for u, v in EDGES:
        pair = (min(u, v), max(u, v))
        assert pair not in got
    # 2 and 5 share neighbor 1 but are unlinked -> present at min_common=1
    assert (2, 5) in got and (3, 4) in got


def test_hub_cap_drops_centers(spark):
    # cap below deg(1)=4: wedges through vertex 1 vanish; (3,4) survives
    # via center 2 only -> cn drops from 2 to 1
    got = {(r["u"], r["v"]): r["cn"]
           for r in link_prediction(_df(spark), min_common=1,
                                    hub_cap=3).collect()}
    assert got[(3, 4)] == 1
    # (2,5) only shared center was 1 -> gone entirely
    assert (2, 5) not in got


def test_matches_networkx(spark):
    nx = __import__("pytest").importorskip("networkx")
    g = nx.Graph(EDGES)
    want = {}
    for u in g:
        for v in g:
            if u < v and not g.has_edge(u, v):
                cn = len(list(nx.common_neighbors(g, u, v)))
                if cn >= 1:
                    aa = sum(1 / math.log(g.degree(w))
                             for w in nx.common_neighbors(g, u, v))
                    want[(u, v)] = (cn, round(aa, 6))
    got = {(r["u"], r["v"]): (r["cn"], r["aa"])
           for r in link_prediction(_df(spark), min_common=1).collect()}
    assert got == want
