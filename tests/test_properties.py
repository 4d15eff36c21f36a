"""Property-based checks (hypothesis) for the newest operators — each
example builds a whole random dataframe and compares against a
pure-Python replay, so one example amortizes a full Spark round-trip.
Example counts are kept small: Spark actions dominate runtime.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=20),
    right=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=20, unique=True),
)
@SET
def test_asof_join_matches_bruteforce(spark, left, right):
    from datetime import datetime, timedelta

    from linkgraph.asof import asof_join

    base = datetime(2024, 1, 1)
    t = lambda s: base + timedelta(seconds=s)  # noqa: E731
    ldf = spark.createDataFrame(
        [(i, k, t(s)) for i, (k, s) in enumerate(left)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, t(s)) for i, (k, s) in enumerate(right)],
        "sig_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["sig_id_r"]
        for r in asof_join(ldf, rdf, on="user_id", right_cols=["sig_id"]).collect()
    }
    for i, (k, s) in enumerate(left):
        # unique (key, ts) right rows -> at most one best match
        cand = [
            (s2, 100 + j)
            for j, (k2, s2) in enumerate(right)
            if k2 == k and s2 <= s
        ]
        want = max(cand)[1] if cand else None
        assert got[i] == want, (i, k, s, cand)


@given(
    docs=st.lists(
        st.tuples(_keys, st.integers(min_value=0, max_value=12)),
        min_size=1,
        max_size=20,
    ),
    budget=st.integers(min_value=1, max_value=7),
)
@SET
def test_pack_chunks_replays_running_sum(spark, docs, budget):
    from linkgraph.sampling import pack_chunks

    df = spark.createDataFrame(
        [(i, f"s{k}", "x " * n) for i, (k, n) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in pack_chunks(df, budget=budget).collect()}
    running: dict = {}
    for i, (k, n) in enumerate(docs):  # doc_id order == list order
        before = running.get(k, 0)
        running[k] = before + n
        r = got[i]
        assert r["n_tokens"] == n
        assert 0 <= r["chunk_offset"] < budget
        assert r["chunk_id"] * budget + r["chunk_offset"] == before


_safe_text = st.text(
    alphabet=st.sampled_from("ab @.+-019\n"), min_size=0, max_size=40
)


@given(texts=st.lists(_safe_text, min_size=1, max_size=15))
@SET
def test_pii_redact_counts_equal_placeholders(spark, texts):
    from linkgraph.textops import pii_redact

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for r in pii_redact(df).collect():
        c = r["clean_text"]
        assert r["n_emails"] == c.count("<EMAIL>")
        assert r["n_phones"] == c.count("<PHONE>")
        assert r["n_ipv4"] == c.count("<IP>")


@given(
    edges=st.lists(st.tuples(_keys, _keys), min_size=1, max_size=16),
    steps=st.integers(min_value=1, max_value=3),
)
@SET
def test_walks_follow_edges(spark, edges, steps):
    from linkgraph.walks import random_walks

    edges = sorted(set(edges))
    edf = spark.createDataFrame(edges, "src long, dst long")
    starts = spark.createDataFrame(
        [(k,) for k in sorted({s for s, _ in edges})], "id long"
    )
    rows = random_walks(edf, starts, steps=steps).collect()
    byw: dict = {}
    for r in rows:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    eset = set(edges)
    for w, path in byw.items():
        assert path[0] == w
        # contiguous steps, each hop a real edge
        for s in range(1, max(path) + 1):
            assert s in path
            assert (path[s - 1], path[s]) in eset


_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
    min_size=0,
    max_size=12,
)


@given(docs=st.lists(_words, min_size=2, max_size=10))
@SET
def test_simhash_banded_pairs_are_lossless(spark, docs):
    """bands > max_hamming -> the bucketed join equals brute force
    (pigeonhole), on arbitrary random corpora."""
    from itertools import combinations

    from linkgraph import dedup

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    want = {
        (a, b)
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_pairs(df, max_hamming=3).collect()
    }
    assert got == want


@given(docs=st.lists(_words, min_size=1, max_size=10))
@SET
def test_lm_scores_are_nonnegative(spark, docs):
    """Self-corpus LMs: p(token) <= 1 always (c <= T, c12 <= c1 and
    alpha <= alpha*V), so both surprisal scores are >= 0 on any corpus."""
    from linkgraph.textops import lm_score, lm_score2

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    for r in lm_score(df).collect():
        assert r["avg_neg_logp"] >= 0.0
    for r in lm_score2(df).collect():
        assert r["avg_neg_logp2"] >= 0.0


# ---------------------------------------------------------------------------
# avro_lite codec: encode(decode(x)) == x for arbitrary records


_AVRO_VALUE = {
    "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "string": st.text(max_size=40),
    "bytes": st.binary(max_size=40),
    "boolean": st.booleans(),
    "double": st.floats(allow_nan=False, width=64),
}


@given(
    rows=st.lists(
        st.fixed_dictionaries({
            "s": _AVRO_VALUE["string"],
            "n": _AVRO_VALUE["long"],
            "i": _AVRO_VALUE["int"],
            "d": _AVRO_VALUE["double"],
            "b": _AVRO_VALUE["boolean"],
            "by": _AVRO_VALUE["bytes"],
            "opt": st.one_of(st.none(), _AVRO_VALUE["long"]),
            "arr": st.lists(_AVRO_VALUE["string"], max_size=5),
            "m": st.dictionaries(
                st.text(max_size=8), _AVRO_VALUE["long"], max_size=4),
        }),
        max_size=8,
    ),
    codec=st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=40, deadline=None)
def test_avro_container_roundtrip_property(tmp_path_factory, rows, codec):
    from linkgraph import avro_lite as avro

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ]}
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    avro.write_container(path, schema, rows, codec=codec)
    _, _, out = avro.read_container(path)
    assert out == rows


@given(
    toks=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=25),
        min_size=1, max_size=12,
    ),
    k=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=5),
)
@SET
def test_winnowing_matches_replica(spark, toks, k, w):
    """Winnowing selection == the paper replica for ANY (k, w) and tiny
    alphabets (maximal hash ties exercise the rightmost rule)."""
    from linkgraph.dedup import winnow_fingerprints
    from test_winnow import winnow_py

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(toks)],
        "doc_id long, text string",
    )
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {
        i: winnow_py(t, k, w) for i, t in enumerate(toks) if len(t) >= k
    }
    want = {i: s for i, s in want.items() if s}
    assert got == want


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),          # user
            st.sampled_from(["view", "click", "buy", "x"]),  # type
            _ts,
        ),
        min_size=1, max_size=25,
    ),
)
@SET
def test_funnel_matches_fold_replica(spark, evs):
    """funnel_reached == a literal fold over (ts, event_id)-sorted
    events for arbitrary interleavings, ties, and repeats."""
    import datetime as dt

    from linkgraph.events import funnel_reached

    steps = ["view", "click", "buy"]
    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), u, t)
        for i, (u, t, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user_id"]: r["reached"]
        for r in funnel_reached(df, steps).collect()
    }
    want = {}
    for u in {r[2] for r in rows}:
        seq = sorted(
            (ts, eid, et) for eid, ts, uu, et in rows
            if uu == u and et in steps
        )
        if not seq:
            continue
        acc = 0
        for _, _, et in seq:
            if acc < len(steps) and et == steps[acc]:
                acc += 1
        want[u] = acc
    assert got == want


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=1, max_size=15),
    right=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=15),
    lo=st.integers(min_value=-20, max_value=10),
    span=st.integers(min_value=1, max_value=30),
)
@SET
def test_range_join_matches_bruteforce(spark, left, right, lo, span):
    import datetime as dt

    from linkgraph.rangejoin import range_join

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    ldf = spark.createDataFrame(
        [(i, k, t(s)) for i, (k, s) in enumerate(left)],
        "lid long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, t(s)) for i, (k, s) in enumerate(right)],
        "rid long, user_id long, ts timestamp",
    )
    hi = lo + span
    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            ldf, rdf, on=["user_id"], left_ts="ts", right_ts="ts",
            lower_s=lo, upper_s=hi,
        ).collect()
    }
    want = {
        (i, 100 + j)
        for i, (k, s) in enumerate(left)
        for j, (k2, s2) in enumerate(right)
        if k == k2 and s + lo <= s2 <= s + hi
    }
    assert got == want
