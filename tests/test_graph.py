"""Graph construction: edges, vertices, degrees, collision audit."""

from linkgraph.graph import collision_audit

from conftest import collect_map


def test_edge_count_matches_ground_truth(small):
    expected = {
        (s, d) for s, dsts in small.links_by_url.items() for d in dsts
    }
    assert small.edges.count() == len(expected)


def test_collision_audit(small):
    ids, urls = collision_audit(small.vertices)
    assert ids == urls


def test_vertex_set_includes_dangling_targets(small):
    g = small.nx_digraph()
    assert small.vertices.count() == g.number_of_nodes()
    # dangling targets exist in the fixture by construction (~1%)
    page_urls = {r.url for r in small.rows}
    assert set(small.url_of_id.values()) - page_urls, "fixture lost its dangling urls"


def test_degrees_match_networkx(small):
    g = small.nx_digraph()
    out_deg = collect_map(small.vertices, "url", "out_deg")
    in_deg = collect_map(small.vertices, "url", "in_deg")
    for u in g.nodes:
        assert out_deg[u] == g.out_degree(u), u
        assert in_deg[u] == g.in_degree(u), u


def test_corpus_determinism():
    from linkgraph import corpus

    a_rows, a_links = corpus.gen_corpus(42, corpus.TINY)
    b_rows, b_links = corpus.gen_corpus(42, corpus.TINY)
    assert a_rows == b_rows
    assert a_links == b_links
    c_rows, _ = corpus.gen_corpus(43, corpus.TINY)
    assert c_rows != a_rows


def test_tiny_structural_cases(tiny):
    from linkgraph.corpus import url_for

    lb = tiny.links_by_url
    assert lb[url_for(0)] == [url_for(0)]  # self-loop island
    assert lb[url_for(1)] == [url_for(2)]
    assert lb[url_for(10)] == []  # dangling-only page
    # hub page: index 17 in a 40-page corpus -> out-degree n//4 = 10
    assert len(lb[url_for(17)]) >= 8


def test_reciprocity(spark):
    from linkgraph.graph import reciprocity

    # 0->1 (with reverse), 1->2 (one-way), 2->2 (self-loop, dropped), dup row
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 2), (0, 1)], "src long, dst long"
    )
    r = reciprocity(e).collect()[0]
    assert r["n_directed"] == 3
    assert r["n_reciprocal"] == 2
    assert r["reciprocity"] == 0.666667


def test_reciprocity_empty(spark):
    from linkgraph.graph import reciprocity

    e = spark.createDataFrame([(7, 7)], "src long, dst long")
    r = reciprocity(e).collect()[0]
    assert r["n_directed"] == 0 and r["reciprocity"] == 0.0


def test_degree_histogram(spark):
    from linkgraph.graph import degree_histogram

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 2), (0, 1)], "src long, dst long"
    )
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    got = {r["out_deg"]: r["n_vertices"] for r in degree_histogram(e, v).collect()}
    # 0: deg 2 (distinct dsts), 1: deg 1, 2: self-loop only -> 0, 3: isolated -> 0
    assert got == {2: 1, 1: 1, 0: 2}
    assert sum(got.values()) == 4


def test_bfs_distances(spark):
    from linkgraph.graph import bfs_distances

    # 0 -> 1 -> 2 -> 3 -> 4 chain, plus 9 isolated, plus shortcut 0 -> 3
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(spark, e, seeds, max_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}
    # bounded radius: max_hops=1 only reaches direct successors
    got1 = {
        r["id"]: r["dist"]
        for r in bfs_distances(spark, e, seeds, max_hops=1).collect()
    }
    assert got1 == {0: 0, 1: 1, 3: 1}


def test_bfs_vs_networkx(spark, tiny):
    import networkx as nx
    from linkgraph.graph import bfs_distances

    g = tiny.nx_digraph_ids()
    seed_ids = sorted(g.nodes)[:2]
    want = {}
    for s in seed_ids:
        for v, d in nx.single_source_shortest_path_length(g, s, cutoff=3).items():
            want[v] = min(want.get(v, 99), d)
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(spark, tiny.edges, seeds, max_hops=3).collect()
    }
    assert got == want


def test_cocitation(spark):
    from linkgraph.graph import cocitation

    # 0 and 1 share targets {10, 11}; 2 shares only {10} with them
    e = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (0, 10)],
        "src long, dst long",
    )
    got = {(r["a"], r["b"]): r["shared"] for r in cocitation(e).collect()}
    assert got == {(0, 1): 2}
    got1 = {
        (r["a"], r["b"]): r["shared"]
        for r in cocitation(e, min_shared=1).collect()
    }
    assert got1 == {(0, 1): 2, (0, 2): 1, (1, 2): 1}
    # df_cap drops the super-cited target 10
    capped = {
        (r["a"], r["b"]): r["shared"]
        for r in cocitation(e, min_shared=1, df_cap=2).collect()
    }
    assert capped == {(0, 1): 1}


def test_health_report(spark):
    # 0->1->2, 3->1, 4 isolated-as-source-only (4->5), self-loop 6->6 dropped
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 1), (4, 5), (4, 5), (6, 6)], "src long, dst long"
    )
    from linkgraph.graph import health_report

    r = health_report(edges).collect()[0]
    assert r["n_edges"] == 4          # distinct, self-loop dropped
    assert r["n_vertices"] == 6       # 0,1,2,3,4,5
    assert r["n_entry"] == 3          # 0,3,4 (out only)
    assert r["n_dangling"] == 2       # 2,5 (in only)
    assert r["n_internal"] == 1       # 1
    assert abs(r["frac_dangling"] - 2 / 6) < 1e-6


def test_assortativity_vs_numpy(spark):
    import numpy as np

    # varying out-degrees: src i%9 fans out, dst (i*7+3)%23 fans in
    rng = [(i % 9, (i * 7 + 3) % 23) for i in range(60)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rng if a != b], "src long, dst long"
    )
    from linkgraph.graph import assortativity

    r = assortativity(edges).collect()[0]
    e = sorted({(a, b) for a, b in rng if a != b})
    outd = {}
    ind = {}
    for a, b in e:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    x = np.array([outd[a] for a, b in e], dtype=float)
    y = np.array([ind[b] for a, b in e], dtype=float)
    want = float(np.corrcoef(x, y)[0, 1])
    assert r["n_edges"] == len(e)
    assert abs(r["assortativity6"] - want) < 1e-6

    # degenerate: every src out-degree 1 -> zero variance -> NULL, no error
    ring = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    d = assortativity(ring).collect()[0]
    assert d["n_edges"] == 10 and d["assortativity6"] is None


def test_snapshot_diff_churn_only(spark):
    from linkgraph.graph import snapshot_diff

    a = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 3)], "src long, dst long"
    )
    b = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["status"] for r in snapshot_diff(a, b).collect()}
    # unchanged edges (1,2),(2,3) are absent; dup (2,3) in A collapses
    assert got == {(1, 3): "removed", (4, 5): "added"}


def test_harmonic_centrality_vs_networkx(spark):
    import networkx as nx

    from linkgraph.graph import harmonic_centrality

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (9, 0)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (9,), (4,)], "id long")
    got = {r["seed"]: r for r in harmonic_centrality(spark, edf, seeds, max_hops=3).collect()}
    g = nx.DiGraph(edges)
    for s in (0, 9):
        lengths = nx.single_source_shortest_path_length(g, s, cutoff=3)
        want_h = round(sum(1 / d for d in lengths.values() if d > 0), 6)
        want_n = sum(1 for d in lengths.values() if d > 0)
        assert (got[s]["n_reached"], got[s]["harmonic"]) == (want_n, want_h)
    assert 4 not in got  # seed with no out-edges reaches nothing


def test_conductance_two_communities(spark):
    from linkgraph.graph import conductance

    # two triangles joined by one bridge edge
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    m = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, key long"
    )
    got = {r["key"]: r for r in conductance(e, m).collect()}
    # each community: vol = 3 internal edges * 2 + 1 bridge stub = 7
    for k in (0, 1):
        assert (got[k]["vol"], got[k]["cut"]) == (7, 1)
        assert got[k]["conductance"] == round(1 / 7, 6)


def test_modularity_matches_networkx(spark):
    """sum(q_term9) == nx.community.modularity on a random partition;
    per-community terms match a literal python replica."""
    import random

    import networkx as nx

    from linkgraph.graph import modularity

    rng = random.Random(13)
    n = 40
    epairs = set()
    while len(epairs) < 120:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            epairs.add((min(u, v), max(u, v)))
    label = {i: i % 5 for i in range(n)}

    edges = spark.createDataFrame(sorted(epairs), "src long, dst long")
    labels = spark.createDataFrame(
        [(i, label[i]) for i in range(n)], "id long, label long"
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}

    g = nx.Graph(sorted(epairs))
    g.add_nodes_from(range(n))
    comms = [{i for i in range(n) if label[i] == c} for c in range(5)]
    want_q = nx.community.modularity(g, comms)
    got_q = sum(r["q_term9"] for r in rows.values())
    assert abs(got_q - want_q) < 1e-6

    m = len(epairs)
    for c in range(5):
        mc = sum(1 for (u, v) in epairs if label[u] == c and label[v] == c)
        dc = sum(g.degree(i) for i in range(n) if label[i] == c)
        r = rows[c]
        assert r["n_nodes"] == sum(1 for i in range(n) if label[i] == c)
        assert r["intra_edges"] == mc
        assert r["degree_sum"] == dc
        assert abs(r["q_term9"] - (mc / m - (dc / (2 * m)) ** 2)) < 1e-8
