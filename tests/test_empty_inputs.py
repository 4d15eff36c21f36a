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
