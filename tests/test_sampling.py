"""Deterministic sampling / per-source caps (training-data curation)."""

import hashlib

from linkgraph import sampling


def test_hash_sample_matches_reference_coin(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(400)], "doc_id long, source string"
    )
    got = {r["doc_id"] for r in sampling.hash_sample(docs, 0.25).collect()}
    thr = sampling.hash_threshold(0.25)
    want = {
        i for i in range(400)
        if hashlib.md5(f"{i}:s1".encode()).hexdigest()[:6] < thr
    }
    assert got == want
    assert 0.15 < len(got) / 400 < 0.35  # rate lands near 0.25


def test_hash_sample_seed_independence(spark):
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r["doc_id"] for r in sampling.hash_sample(docs, 0.5, seed="a").collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(docs, 0.5, seed="b").collect()}
    assert a != b
    # independent coins: overlap near rate^2 * n
    assert 0.1 < len(a & b) / 500 < 0.4


def test_cap_per_source_priority(spark):
    rows = [(i, "s0" if i < 6 else "s1", 100 - i) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sampling.cap_per_source(docs, cap=2)
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    # longest-first: s0 keeps docs 0,1 (n_chars 100,99); s1 keeps 6,7
    assert got == {("s0", 0), ("s0", 1), ("s1", 6), ("s1", 7)}
    ranks = {r["doc_id"]: r["source_rank"] for r in out.collect()}
    assert ranks[0] == 1 and ranks[1] == 2


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(900)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.5, "de": 0.1}  # fr absent -> dropped
    out = sampling.stratified_sample(docs, fr, key_col="lang")
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    assert all(lang != "fr" for _, lang in got)
    import hashlib

    for i, lang in rows:
        if lang == "fr":
            continue
        coin = hashlib.md5(f"{i}:s1".encode()).hexdigest()[:6]
        want = coin < sampling.hash_threshold(fr[lang])
        assert ((i, lang) in got) == want


def test_stratified_sample_nested_on_rate_increase(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id long, lang string"
    )
    lo = {r["doc_id"] for r in
          sampling.stratified_sample(docs, {"en": 0.2}).collect()}
    hi = {r["doc_id"] for r in
          sampling.stratified_sample(docs, {"en": 0.6}).collect()}
    assert lo <= hi  # same coin: raising a stratum rate keeps prior docs


def test_pack_chunks_running_layout(spark):
    # 3 docs per source; token counts 4, 3, 5 with budget 6
    texts = {0: "a b c d", 1: "e f g", 2: "h i j k l"}
    rows = [(s * 10 + i, f"s{s}", texts[i]) for s in range(2) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source"], r["doc_id"]): r
        for r in sampling.pack_chunks(docs, budget=6).collect()
    }
    for s in ("s0", "s1"):
        base = 0 if s == "s0" else 10
        d0, d1, d2 = (got[(s, base + i)] for i in range(3))
        assert (d0["chunk_id"], d0["chunk_offset"]) == (0, 0)
        assert (d1["chunk_id"], d1["chunk_offset"]) == (0, 4)
        # doc 2 starts at global offset 7 -> chunk 1, offset 1
        assert (d2["chunk_id"], d2["chunk_offset"]) == (1, 1)
        assert [d["n_tokens"] for d in (d0, d1, d2)] == [4, 3, 5]


def test_pack_chunks_streams_are_independent(spark):
    # a huge doc in one stream must not shift chunk ids in another
    rows = [(0, "big", "x " * 10_000), (1, "small", "a b"), (2, "small", "c")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r for r in sampling.pack_chunks(docs, budget=4).collect()}
    assert (got[1]["chunk_id"], got[1]["chunk_offset"]) == (0, 0)
    assert (got[2]["chunk_id"], got[2]["chunk_offset"]) == (0, 2)
    assert got[0]["chunk_id"] == 0 and got[0]["n_tokens"] == 10_000


def test_mixture_weights_temperature(spark):
    rows = [(i, "big") for i in range(80)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r for r in sampling.mixture_weights(docs, alpha=0.5).collect()}
    tw = 80**0.5 + 10**0.5
    assert got["big"]["n_docs"] == 80
    assert abs(got["big"]["weight"] - 80**0.5 / tw) < 1e-6
    assert abs(got["small"]["weight"] - 10**0.5 / tw) < 1e-6
    # alpha<1 upweights the small source vs its raw share
    assert got["small"]["weight"] > 10 / 90


def test_source_length_stats_percentiles(spark):
    rows = [(i, "s", n) for i, n in enumerate([10, 20, 30, 40])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    r = sampling.source_length_stats(docs).collect()[0]
    # continuous interpolation: p50 of [10,20,30,40] = 25, p90 = 37
    assert (r["n_docs"], r["len_p50"], r["len_p90"], r["len_max"]) == (4, 25.0, 37.0, 40)


def test_chunk_fill_report_agrees_with_pack(spark):
    rows = [
        (0, "a", "x " * 5),   # 5 tokens
        (1, "a", "x " * 4),   # total a: 9 -> 3 chunks of 4, tail 1
        (2, "b", "x " * 8),   # total b: 8 -> 2 full chunks, tail 4
        (3, "c", ""),         # empty stream
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in sampling.chunk_fill_report(docs, budget=4).collect()}
    a, b, c = got["a"], got["b"], got["c"]
    assert (a["total_tokens"], a["n_chunks"], a["tail_fill"]) == (9, 3, 1)
    assert abs(a["waste_frac"] - (1 - 9 / 12)) < 1e-9
    assert (b["n_chunks"], b["tail_fill"], b["waste_frac"]) == (2, 4, 0.0)
    assert (c["total_tokens"], c["n_chunks"], c["waste_frac"]) == (0, 0, 0.0)
    # n_chunks agrees with the pack map's max chunk_id + 1 per stream
    pk = sampling.pack_chunks(docs, budget=4)
    import pyspark.sql.functions as F
    mx = {
        r["source"]: r["mx"]
        for r in pk.groupBy("source").agg(
            F.max(F.col("chunk_id") * 4 + F.col("chunk_offset") + F.col("n_tokens")).alias("mx")
        ).collect()
    }
    for s in ("a", "b"):
        import math
        assert got[s]["n_chunks"] == math.ceil(mx[s] / 4)


def test_assign_shards_deterministic_and_balanced(spark):
    import hashlib

    docs = spark.createDataFrame([(i,) for i in range(800)], "doc_id long")
    got = {r["doc_id"]: r["shard"] for r in sampling.assign_shards(docs, 16).collect()}
    for i in (0, 17, 555):
        want = int(hashlib.md5(f"{i}:s1".encode()).hexdigest()[:6], 16) % 16
        assert got[i] == want
    rep = {r["shard"]: r for r in sampling.shard_balance_report(docs, 16).collect()}
    assert sum(r["n_docs"] for r in rep.values()) == 800
    assert all(20 <= r["n_docs"] <= 90 for r in rep.values())  # roughly uniform


def test_weighted_sample_matches_python_ares(spark):
    """weighted_sample == a literal python A-Res replica (same md5
    uniforms, ln(u)/w ranking, id tie-break), per stratum."""
    import hashlib
    import math

    from linkgraph.sampling import weighted_sample

    rows = [(i, "s%d" % (i % 3), (i * 37) % 11 + 1) for i in range(60)]
    rows.append((99, "s0", 0))  # w == 0: excluded from the draw
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    def key(i, w):
        h = int(hashlib.md5(f"{i}:ws1".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / (2**60 + 1)) / w

    want = {}
    by_stratum = {}
    for i, s, w in rows:
        if w > 0:
            by_stratum.setdefault(s, []).append((i, w))
    K = 4
    for s, items in by_stratum.items():
        ranked = sorted(items, key=lambda t: (-key(t[0], t[1]), t[0]))
        for rk, (i, _) in enumerate(ranked[:K], start=1):
            want[(s, i)] = rk

    got = {
        (r["lang"], r["doc_id"]): r["rk"]
        for r in weighted_sample(
            df, k=K, weight_col="n_chars", strata_col="lang"
        ).collect()
    }
    assert got == want


def test_weighted_sample_prefers_heavy_items(spark):
    """Across 40 independent seeds, an item with 30x the weight must be
    drawn into the k=1 slot far more often (law-of-large-numbers check
    on P ~ w_i / sum w for the first A-Res draw)."""
    from linkgraph.sampling import weighted_sample

    df = spark.createDataFrame(
        [(0, 30), (1, 1), (2, 1), (3, 1)], "doc_id long, n_chars long"
    )
    wins = {i: 0 for i in range(4)}
    for s in range(40):
        top = weighted_sample(df, k=1, seed="t%d" % s).collect()[0]
        wins[top["doc_id"]] += 1
    assert wins[0] >= 25  # E[wins0] = 40 * 30/33 ~ 36
