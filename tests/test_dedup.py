"""Dedup operators vs pure-Python oracles (exact hashes, exact Jaccard,
MinHash/LSH candidate recall on constructed near-dups)."""

import hashlib
import itertools
import re

import pytest

from linkgraph import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the tall fence near the old barn in the quiet village"
)
NEAR = BASE.replace("quiet village", "quiet town")  # high shingle overlap
DOCS = [
    (0, BASE),
    (1, NEAR),
    (2, BASE),  # exact dup of 0
    (3, "completely different text about spark partitions and shuffles"),
    (4, "another unrelated document mentioning joins aggregates and scans"),
    (5, ""),
    (6, "tiny"),
]


def toks(text):
    n = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return [] if not n else n.split(" ")


def shingles(text, n=3):
    t = toks(text)
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_groups(spark, docs_df):
    got = {r["doc_id"]: r for r in dedup.exact_groups(docs_df).collect()}
    assert got[0]["group_size"] == 2 and got[2]["group_size"] == 2
    assert got[0]["rep_id"] == 0 and got[2]["rep_id"] == 0
    assert not got[0]["is_dup"] and got[2]["is_dup"]
    assert got[1]["group_size"] == 1 and not got[1]["is_dup"]


def test_shingle_table(spark, docs_df):
    got = {}
    for r in dedup.shingle_table(docs_df, n=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for i, text in DOCS:
        assert got.get(i, set()) == shingles(text), i


def test_ngram_jaccard_exact(spark, docs_df):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.0).collect()
    }
    for (i, ta), (j, tb) in itertools.combinations(DOCS, 2):
        sa, sb = shingles(ta), shingles(tb)
        inter = len(sa & sb)
        if inter == 0:
            assert (i, j) not in got
            continue
        want = round(inter / len(sa | sb), 6)
        assert got[(i, j)] == pytest.approx(want, abs=1e-9)
    # the constructed near-dup pair scores high, and dup pair is 1.0
    assert got[(0, 2)] == 1.0
    assert got[(0, 1)] > 0.8


def test_df_cap_drops_hot_shingles(spark):
    rows = [(i, "common shingle here unique%d tail" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.0).count()
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.0, df_cap=5).count()
    assert uncapped == 45  # all pairs share 'common shingle here'
    assert capped == 0


def test_minhash_signatures_match_oracle(spark, docs_df):
    got = {r["doc_id"]: r for r in dedup.minhash_signatures(docs_df, 8).collect()}
    for i, text in DOCS:
        sh = shingles(text)
        for j in range(8):
            if sh:
                want = min(
                    hashlib.md5(f"{j}:{s}".encode()).hexdigest() for s in sh
                )
            else:
                want = "z"
            assert got[i][f"mh{j}"] == want, (i, j)


def test_lsh_finds_near_dups(spark, docs_df):
    pairs = dedup.minhash_dedup_pairs(
        docs_df, num_hashes=8, rows_per_band=2, verify_threshold=0.5
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (0, 2) in found  # exact dup always collides in every band
    assert (0, 1) in found  # near-dup: P[band collision] ~ 1-(1-j^2)^4, j~0.9
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_simhash_oracle_and_similarity(spark, docs_df):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df, 16).collect()}
    hexhi = set("89abcdef")
    for i, text in DOCS:
        words = set(toks(text))
        sig = 0
        for b in range(16):
            v = sum(
                1 if hashlib.md5(w.encode()).hexdigest()[b] in hexhi else -1
                for w in words
            )
            if v > 0:
                sig |= 1 << b
        assert got[i] == sig, i
    assert got[0] == got[2]  # exact dups identical
    # near-dups within small hamming distance
    assert bin(got[0] ^ got[1]).count("1") <= 4


def test_embedding_dup_pairs_bruteforce(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # ~same direction as 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["a"], r["b"]): r["cos"]
        for r in dedup.embedding_dup_pairs(df, 0.95, method="bruteforce").collect()
    }
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] > 0.999


def test_embedding_dup_lsh_matches_bruteforce_when_bucketed(spark):
    rows = [
        (0, [1.0, 0.5, 0.2, 0.1]),
        (1, [0.99, 0.51, 0.21, 0.1]),
        (2, [-1.0, 0.5, 0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = dedup.embedding_dup_pairs(
        df, 0.9, method="lsh", lsh_tables=1, lsh_bits=2, n_dims=4
    ).collect()
    assert {(r["a"], r["b"]) for r in lsh} == {(0, 1)}


def test_embedding_multi_table_lsh_recall_beats_single(spark):
    """A pair split by table 0's hyperplane is still caught by another
    table (OR-of-ANDs recall)."""
    # dim 0 sign differs (tiny magnitude) -> table 0 separates them; the
    # other 63 dims agree -> tables 1..3 bucket them together.
    a = [0.001] + [1.0] * 63
    b = [-0.001] + [1.0] * 63
    df = spark.createDataFrame(
        [(0, a), (1, b)], "vec_id long, embedding array<float>"
    )
    single = dedup.embedding_dup_pairs(
        df, 0.9, method="lsh", lsh_tables=1, lsh_bits=8
    ).collect()
    multi = dedup.embedding_dup_pairs(
        df, 0.9, method="lsh", lsh_tables=4, lsh_bits=8
    ).collect()
    assert single == []  # table 0 probes dim 0 and splits the pair
    assert {(r["a"], r["b"]) for r in multi} == {(0, 1)}


def test_ngram_capped_vs_exact_on_fixture(spark, docs_df):
    """df_cap=None (exact) is a superset of the capped default; on this
    fixture no shingle is hot, so they coincide."""
    exact = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.0, df_cap=None
        ).collect()
    }
    capped = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.0, log_drops=False
        ).collect()
    }
    assert capped == exact
    dedup.release_caches()


def test_lsh_rows_per_band_divisibility(spark, docs_df):
    sigs = dedup.minhash_signatures(docs_df, 8)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        dedup.lsh_candidate_pairs(sigs, num_hashes=8, rows_per_band=3)


def test_dup_clusters_transitive(spark):
    """a~b and b~c must land in ONE cluster with rep=min even when (a,c)
    was never a pair (transitivity via CC); untouched docs are singleton
    canonical rows."""
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 4)], "a long, b long")
    got = {r["doc_id"]: r for r in dedup.dup_clusters(spark, pairs, docs).collect()}
    assert {got[i]["cluster_rep"] for i in (1, 3, 5)} == {1}
    assert got[1]["cluster_size"] == 3 and got[5]["is_dup"] and not got[1]["is_dup"]
    assert got[2]["cluster_rep"] == 2 and got[4]["is_dup"]
    assert got[0]["cluster_size"] == 1 and not got[0]["is_dup"]


def test_decontaminate_flags_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated text about spark partitions and shuffles"),
            (2, "quick brown fox jumps over the lazy dog again and again"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in dedup.decontaminate(corpus, bench, n=8).collect()
    }
    # doc 0 shares 'quick brown fox jumps over the lazy dog' (two 8-grams
    # of bench overlap its text: positions differ), doc 2 shares one
    assert 0 in out and 2 in out
    assert 1 not in out and 3 not in out
    # verify counts against a python set oracle
    def grams(t, n=8):
        ws = t.split()
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bset = grams("a quick brown fox jumps over the lazy dog")
    for i, txt in [(0, "the quick brown fox jumps over the lazy dog today"),
                   (2, "quick brown fox jumps over the lazy dog again and again")]:
        assert out[i] == len(grams(txt) & bset)


def test_simhash_pairs_equal_bruteforce(spark):
    """Banded bucketing is lossless at bands > max_hamming (pigeonhole):
    the pair set must equal a brute-force Hamming scan of the sketches."""
    from itertools import combinations

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content about spark engines",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert got == want
    assert (0, 3, 0) in got  # exact dups at hamming 0


def test_containment_pairs_exact(spark, docs_df):
    got = {
        (r["a"], r["b"]): r["containment"]
        for r in dedup.containment_pairs(docs_df, threshold=0.0,
                                         df_cap=None).collect()
    }
    texts = dict(DOCS)
    want = {}
    for a, b in itertools.permutations(texts, 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if sa and sa & sb:
            want[(a, b)] = round(len(sa & sb) / len(sa), 6)
    assert got == want


def test_containment_catches_quote_jaccard_misses(spark):
    short = "the five word quoted sentence here"
    long = ("a very long document with lots of filler words surrounding "
            "it so that " + short + " appears verbatim inside plus even "
            "more filler trailing text to pad the shingle set out")
    df = spark.createDataFrame([(0, short), (1, long)],
                               "doc_id long, text string")
    cont = {(r["a"], r["b"]): r["containment"]
            for r in dedup.containment_pairs(df, threshold=0.9,
                                             df_cap=None).collect()}
    assert cont == {(0, 1): 1.0}  # short fully contained; reverse below 0.9
    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5, df_cap=None).count()
    assert jac == 0  # symmetric measure misses the quote


def test_containment_shares_shingle_scan(spark, docs_df):
    sh = dedup.shingle_table(docs_df, n=3)
    via_shared = dedup.containment_pairs(docs_df, threshold=0.5,
                                         shingles=sh, df_cap=None).count()
    direct = dedup.containment_pairs(docs_df, threshold=0.5,
                                     df_cap=None).count()
    assert via_shared == direct > 0
