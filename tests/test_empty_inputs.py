"""Empty-input behavior for this round's operators: every op must return
an EMPTY result (never crash, never a spurious row) when fed zero rows —
the guard that matters when a filter upstream matches nothing."""

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_text_and_sampling_ops_empty(spark):
    from linkgraph.dedup import winnow_fingerprints, winnow_pairs
    from linkgraph.sampling import weighted_sample

    docs = _empty(spark, "doc_id long, text string, lang string, n_chars long")
    assert winnow_fingerprints(docs).count() == 0
    assert winnow_pairs(docs).count() == 0
    assert weighted_sample(docs, k=3, strata_col="lang").count() == 0


def test_events_ops_empty(spark):
    from linkgraph.events import funnel, funnel_reached
    from linkgraph.rangejoin import range_join

    ev = _empty(
        spark, "event_id long, ts timestamp, user_id long, event_type string"
    )
    steps = ["view", "click"]
    assert funnel_reached(ev, steps).count() == 0
    assert funnel(ev, steps).count() == 0
    assert range_join(
        ev, ev, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_s=-10, upper_s=0,
    ).count() == 0


def test_graph_ops_empty(spark):
    from linkgraph.betweenness import seeded_betweenness
    from linkgraph.hits import katz
    from linkgraph.scc import condensation
    from linkgraph.simrank import simrank2_topk
    from linkgraph.walks import node2vec_walks

    e = _empty(spark, "src long, dst long")
    v = _empty(spark, "id long")
    assert condensation(spark, e, v).count() == 0
    assert simrank2_topk(spark, e, v).count() == 0
    assert seeded_betweenness(spark, e, v, depth=2).count() == 0
    assert katz(spark, e, v, iterations=2).count() == 0
    assert node2vec_walks(e, v, steps=2).count() == 0


def test_sketch_ops_empty(spark):
    from linkgraph.sketches import (
        bloom_bits, bloom_probe, cms_estimate, cms_table, hll_distinct,
    )

    toks = _empty(spark, "lang string, tok string")
    # keyed HLL: no keys -> no rows
    assert hll_distinct(toks, ["lang"], F.col("tok")).count() == 0
    sk = cms_table(toks, F.col("tok"))
    assert sk.count() == 0
    assert cms_estimate(sk, toks.select("tok"), "tok").count() == 0
    bits = bloom_bits(toks, F.col("tok"))
    assert bits.count() == 0
    # empty filter: every probe misses (no bits set)
    probes = spark.createDataFrame([("x",)], "tok string")
    rows = bloom_probe(bits, probes, F.col("tok")).collect()
    assert len(rows) == 1 and not rows[0]["bloom_hit"]


def test_misc_ops_empty(spark):
    from linkgraph.graph import modularity
    from linkgraph.multimodal import transform_features
    from linkgraph.simsearch import quantize_int8

    e = _empty(spark, "src long, dst long")
    lab = _empty(spark, "id long, label long")
    assert modularity(e, lab).count() == 0
    embs = _empty(spark, "vec_id long, embedding array<float>")
    assert quantize_int8(embs).count() == 0
    media = _empty(spark, "media_id long, kind string, payload binary")
    assert transform_features(media).count() == 0


def test_round3_late_ops_empty(spark):
    from linkgraph.classify import nb_classify, nb_model
    from linkgraph.components import cc_incremental
    from linkgraph.hits import salsa
    from linkgraph.hyperball import effective_diameter
    from linkgraph.labelprop import label_propagation_seeded
    from linkgraph.pca import pca_cov, pca_power, pca_project

    e = _empty(spark, "src long, dst long")
    v = _empty(spark, "id long")

    # NB: empty train -> empty model; scoring anything against it is empty
    docs = _empty(spark, "doc_id long, text string, lang string")
    cond, stats = nb_model(docs)
    assert cond.count() == 0 and stats.count() == 0
    some = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert nb_classify(some, cond, stats).count() == 0

    # SALSA: no edges -> every vertex scores 0; no vertices -> no rows
    verts3 = spark.createDataFrame([(i,) for i in range(3)], "id long")
    rows = salsa(spark, e, verts3, iterations=2).collect()
    assert {(r["hub"], r["authority"]) for r in rows} == {(0.0, 0.0)}
    assert salsa(spark, e, v, iterations=2).count() == 0

    # incremental CC: empty delta leaves labels untouched
    labels = spark.createDataFrame([(1, 1), (2, 1)], "id long, component long")
    got = {r["id"]: r["component"]
           for r in cc_incremental(spark, labels, e).collect()}
    assert got == {1: 1, 2: 1}

    # seeded LP: no seeds -> everything stays unlabeled
    seeds = _empty(spark, "id long, label long")
    edges3 = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["id"]: r["label"]
           for r in label_propagation_seeded(
               spark, edges3, seeds, verts3, iterations=2).collect()}
    assert got == {0: -1, 1: -1, 2: -1}

    # PCA: empty embeddings -> empty cov/component/projection, no crash
    embs = _empty(spark, "vec_id long, embedding array<float>")
    cov = pca_cov(embs, dim=4)
    assert cov.count() == 0
    comp = pca_power(cov, 4, rounds=2)
    assert comp.count() == 0
    assert pca_project(embs, comp).count() == 0

    # effective diameter over an empty graph: no rows, no crash
    assert effective_diameter(spark, e, v, b=4, iters=2).count() == 0


def test_round4_late_ops_empty(spark):
    from linkgraph.community import louvain_communities
    from linkgraph.mis import maximal_independent_set
    from linkgraph.sssp import sssp_distances

    e = _empty(spark, "src long, dst long")
    v = _empty(spark, "id long")
    we = _empty(spark, "src long, dst long, w double")

    # MIS: no vertices -> no rows; no edges -> every vertex 'in'
    assert maximal_independent_set(spark, e, v).count() == 0
    verts3 = spark.createDataFrame([(i,) for i in range(3)], "id long")
    states = {
        r["state"]
        for r in maximal_independent_set(spark, e, verts3).collect()
    }
    assert states == {"in"}

    # Louvain: no edges -> singleton labels survive; no vertices -> empty
    got = {
        r["id"]: r["label"]
        for r in louvain_communities(spark, e, verts3, rounds=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}
    assert louvain_communities(spark, e, v, rounds=1).count() == 0

    # SSSP: no seeds -> no rows; no edges -> seeds only at distance 0
    seeds = _empty(spark, "id long")
    assert sssp_distances(spark, we, seeds, max_hops=2).count() == 0
    one_seed = spark.createDataFrame([(7,)], "id long")
    rows = sssp_distances(spark, we, one_seed, max_hops=2).collect()
    assert [(r["id"], r["dist"]) for r in rows] == [(7, 0.0)]
