"""Per-component structural complexity: ccm's six formulas, exact
(reference: /root/reference/src/ccm/complexity.py:55,86,116,146,179,207)."""

import networkx as nx

from linkgraph.complexity import component_complexity, graph_complexity
from linkgraph.components import connected_components


def python_oracle(bundle):
    """Direct per-component computation from the ground-truth edge list."""
    g = bundle.nx_digraph_ids()
    und = g.to_undirected()
    comps = {}
    for comp in nx.connected_components(und):
        m = min(comp)
        nodes = set(comp)
        E = sum(1 for u, v in g.edges if u in nodes)
        N = len(nodes)
        D = sum(1 for u in nodes if g.out_degree(u) >= 2)
        X = sum(1 for u in nodes if g.out_degree(u) == 0)
        comps[m] = dict(N=N, E=E, D=D, X=X)
    return comps


def test_component_scores_small(spark, small):
    comps = connected_components(spark, small.edges, small.vertices)
    got = {
        r["component"]: r.asDict()
        for r in component_complexity(spark, small.edges, comps).collect()
    }
    oracle = python_oracle(small)
    assert set(got) == set(oracle)
    for c, o in oracle.items():
        r = got[c]
        assert (r["N"], r["E"], r["D"], r["X"]) == (o["N"], o["E"], o["D"], o["X"]), c
        E, N, D, X = o["E"], o["N"], o["D"], o["X"]
        assert r["mccabe"] == E - N + 2
        assert r["mccabe_generalised"] == E - N + 2  # P=1 per component
        assert r["henderson_sellers"] == E - N + 2
        assert r["henderson_sellers_tegarden"] == E - N + 1
        assert r["hst_generalised"] == E - N + X + 2
        assert r["harrison"] == D - X + 2


def test_self_loop_island_scores_two(spark, tiny):
    """ccm's ``identity`` echo: single vertex + self-loop -> E−N+2 = 2
    (README.rst:276-286)."""
    from linkgraph.corpus import url_for

    comps = connected_components(spark, tiny.edges, tiny.vertices)
    scores = component_complexity(spark, tiny.edges, comps)
    island = tiny.id_of_url[url_for(0)]
    row = scores.where(scores["component"] == island).collect()[0]
    assert (row["N"], row["E"], row["mccabe"]) == (1, 1, 2)


def test_graph_complexity_generalised(spark, small):
    comps = connected_components(spark, small.edges, small.vertices)
    row = graph_complexity(spark, small.edges, comps).collect()[0]
    oracle = python_oracle(small)
    N = sum(o["N"] for o in oracle.values())
    E = sum(o["E"] for o in oracle.values())
    P = len(oracle)
    X = sum(o["X"] for o in oracle.values())
    D = sum(o["D"] for o in oracle.values())
    assert (row["N"], row["E"], row["P"], row["D"], row["X"]) == (N, E, P, D, X)
    assert row["mccabe_generalised"] == E - N + 2 * P
    assert row["henderson_sellers"] == E - N + P + 1
    assert row["henderson_sellers_tegarden"] == E - N + P
    assert row["hst_generalised"] == E - N + X + 2
    assert row["harrison"] == D - X + 2
