"""Text-analysis operators vs a row-at-a-time pure-Python oracle."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from linkgraph import textops

DOCS = [
    (0, "The cat and the hat sat on a mat, and it was good."),
    (1, "der die das und ist nicht mit ein eine zu der die"),
    (2, ""),
    (3, "!!! ... ???"),
    (4, "le chat est dans la maison et le chien est dans le jardin pour que"),
    (5, "el perro y el gato en la casa de que un una los las"),
    (6, "word " * 30),
    (7, "café δοκιμή naïve — unicode & <tags>"),
    (8, "a b c a b c a b c"),
]


def norm(text: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()


def toks(text: str) -> list[str]:
    n = norm(text)
    return [] if n == "" else n.split(" ")


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_stats(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.token_stats(docs_df).collect()}
    for i, text in DOCS:
        t = toks(text)
        assert got[i]["n_tokens"] == len(t), text
        assert got[i]["n_chars_norm"] == len(norm(text))
        want_avg = round(sum(len(x) for x in t) / len(t), 6) if t else 0.0
        assert got[i]["avg_token_len"] == pytest.approx(want_avg, abs=1e-9)


def test_quality(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.quality(docs_df).collect()}
    sw = set(textops.STOPWORDS["en"])
    for i, text in DOCS:
        t = toks(text)
        sr = sum(1 for x in t if x in sw) / len(t) if t else 0.0
        np_ = len(re.sub(r"[^a-zA-Z0-9\s]", "", text))
        pr = (len(text) - np_) / len(text) if text else 0.0
        assert got[i]["stopword_ratio"] == pytest.approx(round(sr, 6), abs=1e-9)
        assert got[i]["punct_ratio"] == pytest.approx(round(pr, 6), abs=1e-9)
        score = (
            min(sr * 2.0, 1.0) * 0.4
            + (0.4 if 10 <= len(t) <= 5000 else 0.0)
            + max(0.0, 0.2 - pr)
        )
        assert got[i]["quality_score"] == pytest.approx(round(score, 6), abs=1e-9)


def test_langid(spark, docs_df):
    got = {r["doc_id"]: r["lang_pred"] for r in textops.langid(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[4] == "fr"
    assert got[5] == "es"
    assert got[2] == "und"  # empty
    assert got[3] == "und"  # punctuation only
    assert got[6] == "und"  # no stopwords at all
    assert got[8] == "en"  # 'a' is an en stopword


def test_fingerprint_matches_md5(spark, docs_df):
    got = {r["doc_id"]: r for r in textops.fingerprint(docs_df).collect()}
    for i, text in DOCS:
        h = hashlib.md5(norm(text).encode()).hexdigest()
        assert got[i]["fp_md5"] == h
        assert got[i]["fp64"] == int(h[:15], 16)


def test_fingerprint_invariant_under_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO\tworld ")],
        "doc_id long, text string",
    )
    fps = [r["fp_md5"] for r in textops.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


def _rep_oracle(text: str) -> dict:
    """Pure-Python replica of textops.repetition for one document."""
    lines = [x.strip() for x in text.split("\n") if x.strip()]
    toks = norm(text).split() if norm(text) else []
    nchars = len(norm(text))

    def counts(items):
        c: dict = {}
        for x in items:
            c[x] = c.get(x, 0) + 1
        return c

    lc = counts(lines)
    line_chars = sum(len(x) for x in lines)
    dup_line_chars = sum((c - 1) * len(d) for d, c in lc.items() if c > 1)
    g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    g5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    c2, c5 = counts(g2), counts(g5)
    if c2:
        maxc = max(c2.values())
        topg = min(g for g, c in c2.items() if c == maxc)
        top2 = maxc * len(topg)
    else:
        top2 = 0
    dup5 = sum(c * len(g) for g, c in c5.items() if c > 1)

    def frac(n, d):
        return round(n / d, 6) if d else 0.0

    return {
        "n_lines": len(lines),
        "dup_line_frac": frac(len(lines) - len(lc), len(lines)),
        "dup_line_char_frac": frac(dup_line_chars, line_chars),
        "top_2gram_char_frac": frac(top2, nchars),
        "dup_5gram_frac": frac(dup5, nchars),
    }


def test_repetition_vs_python_oracle(spark):
    rows = [
        (0, "hello world\nhello world\nunique line"),
        (1, "a b a b a b a b"),
        (2, ""),
        (3, "spam spam spam spam spam spam"),
        (4, "one two three four five six seven one two three four five six"),
        (5, "Line A\nline a\nLINE A\n\n  \nLine B"),
        (6, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in textops.repetition(df).collect()}
    for i, text in rows:
        want = _rep_oracle(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k)


def test_repetition_corpus_ranges(spark, docs_df):
    out = textops.repetition(docs_df).collect()
    assert len(out) == docs_df.count()
    for r in out:
        assert 0.0 <= r["dup_line_frac"] <= 1.0
        assert 0.0 <= r["dup_line_char_frac"] <= 1.0
        assert r["top_2gram_char_frac"] >= 0.0
        assert r["dup_5gram_frac"] >= 0.0


def test_c4_clean_rules(spark):
    rows = [
        (0, "This is a sentence.\nshort one.\nNo terminal punct here\n"
            "Enable javascript to view this page.\nif (x) { return y; }\n"
            'He said "stop there."\nAnother good long sentence!'),
        (1, "Lorem Ipsum dolor sit amet.\nA real keeper sentence."),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.c4_clean(df).collect()}
    # doc 0: kept = the 3-word terminal-punct lines without js/braces
    assert got[0]["clean_text"].split("\n") == [
        "This is a sentence.",
        'He said "stop there."',
        "Another good long sentence!",
    ]
    assert got[0]["n_lines_kept"] == 3
    assert got[0]["n_lines_dropped"] == 4
    assert not got[0]["drop_doc"]
    # doc 1: lorem ipsum flags the whole doc (case-insensitive)
    assert got[1]["drop_doc"]
    assert got[1]["n_lines_kept"] == 2
    # doc 2: empty text -> empty output, nothing dropped
    assert got[2]["clean_text"] == ""
    assert got[2]["n_lines_kept"] == 0 and got[2]["n_lines_dropped"] == 0


def test_c4_clean_corpus(spark, docs_df):
    out = textops.c4_clean(docs_df)
    assert out.count() == docs_df.count()
    r = out.agg(
        F.sum("n_lines_kept").alias("k"), F.sum("n_lines_dropped").alias("d")
    ).collect()[0]
    assert r["k"] >= 0 and r["d"] >= 0


def test_vocabulary(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "The CAT sat."), (2, "")],
        "doc_id long, text string",
    )
    got = {r["token"]: r for r in textops.vocabulary(df).collect()}
    assert got["the"]["n_occ"] == 3 and got["the"]["n_docs"] == 2
    assert got["cat"]["n_occ"] == 2 and got["cat"]["n_docs"] == 2
    assert got["sat"]["n_occ"] == 1 and got["sat"]["n_docs"] == 1
    assert "" not in got
    filtered = {
        r["token"] for r in textops.vocabulary(df, min_count=2).collect()
    }
    assert filtered == {"the", "cat"}


def test_tfidf(spark):
    import math

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "b b b"), (3, "")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["token"]): r for r in textops.tfidf(df).collect()}
    n = 4
    assert got[(0, "a")]["tf"] == 2 and got[(0, "a")]["df"] == 2
    assert got[(0, "a")]["tfidf6"] == pytest.approx(
        round(2 * math.log(n / 2), 6), abs=2e-6
    )
    assert got[(2, "b")]["tf"] == 3 and got[(2, "b")]["df"] == 2
    assert (1, "c") in got and got[(1, "c")]["df"] == 1
    # min_df prunes rare terms
    pruned = {
        r["token"] for r in textops.tfidf(df, min_df=2).collect()
    }
    assert pruned == {"a", "b"}


def test_line_dedup_global_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha line\nshared banner\nbeta line"),
            (1, "shared banner\ngamma line\n\n  shared banner  "),
            (2, "shared banner"),
            (3, ""),
            (4, "delta\ndelta\nunique tail"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.line_dedup(docs).collect()}
    # doc 0 saw 'shared banner' first (doc_id order) and keeps everything
    assert got[0]["dedup_text"] == "alpha line\nshared banner\nbeta line"
    assert got[0]["n_lines_kept"] == 3 and got[0]["n_lines_dropped"] == 0
    # doc 1 loses both banner copies (trimmed match), keeps gamma
    assert got[1]["dedup_text"] == "gamma line"
    assert got[1]["n_lines_kept"] == 1 and got[1]["n_lines_dropped"] == 2
    # doc 2 is all boilerplate -> empty
    assert got[2]["dedup_text"] == "" and got[2]["n_lines_kept"] == 0
    # empty doc still present
    assert got[3]["dedup_text"] == "" and got[3]["n_lines_dropped"] == 0
    # within-doc repeat: first copy survives, second drops; order preserved
    assert got[4]["dedup_text"] == "delta\nunique tail"
    assert got[4]["n_lines_dropped"] == 1
    assert len(got) == 5


def test_line_dedup_total_lines_conserved(spark):
    import itertools

    texts = ["\n".join(f"l{(i * j) % 7}" for j in range(5)) for i in range(20)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = textops.line_dedup(docs).collect()
    kept = sum(r["n_lines_kept"] for r in rows)
    dropped = sum(r["n_lines_dropped"] for r in rows)
    all_lines = list(
        itertools.chain.from_iterable(t.split("\n") for t in texts)
    )
    assert kept + dropped == len([x for x in all_lines if x.strip()])
    # each distinct line survives exactly once corpus-wide
    assert kept == len({x.strip() for x in all_lines if x.strip()})


def test_pii_redact_all_categories(spark):
    docs = spark.createDataFrame(
        [
            (0, "write to bob.smith+x@mail.example.org today"),
            (1, "dial +41 791234567 or +12 3456789 now"),
            (2, "server 192.168.0.1 and 10.0.3.7 up"),
            (3, "mixed a@b.co then +33 1234567 then 8.8.8.8"),
            (4, "nothing to scrub here"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.pii_redact(docs).collect()}
    assert got[0]["n_emails"] == 1 and got[0]["clean_text"] == "write to <EMAIL> today"
    assert got[1]["n_phones"] == 2
    assert got[1]["clean_text"] == "dial <PHONE> or <PHONE> now"
    assert got[2]["n_ipv4"] == 2
    assert got[2]["clean_text"] == "server <IP> and <IP> up"
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ipv4"]) == (1, 1, 1)
    assert got[3]["clean_text"] == "mixed <EMAIL> then <PHONE> then <IP>"
    assert got[4]["clean_text"] == "nothing to scrub here"
    assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ipv4"]) == (0, 0, 0)
    assert got[5]["clean_text"] == ""


def test_pii_redact_no_double_count_across_stages(spark):
    # digits inside an email are consumed by the email stage and must not
    # resurface as a phone; an IP inside a redacted phone span is gone too
    docs = spark.createDataFrame(
        [(0, "u+41 791234567x@ex.org"), (1, "+41 10 0 3 77 more")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.pii_redact(docs).collect()}
    # email regex grabs the local part up to the space? no: local part has
    # no spaces, so "791234567x@ex.org" is the email; "+41 " survives but
    # is too short to be a phone afterwards
    assert got[0]["n_emails"] == 1 and got[0]["n_phones"] == 0
    assert got[1]["n_phones"] == 1 and got[1]["n_ipv4"] == 0


def test_lm_score_exact_unigram(spark):
    import math

    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "b"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in textops.lm_score(docs).collect()}
    assert got[0]["n_tokens"] == 3
    assert got[0]["avg_neg_logp"] == round(-math.log(0.75), 6)
    assert got[1]["avg_neg_logp"] == round(-math.log(0.25), 6)
    assert 2 not in got  # empty docs emit no row


def test_lm_score_orders_common_below_rare(spark):
    rows = [(i, "the common text " + ("rare%d" % i if i == 0 else "the"))
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_neg_logp"] for r in textops.lm_score(docs).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_collocations_exact_pmi(spark):
    import math

    # "a b" x3 (two docs), "c d" x1; unigrams: a3 b3 c1 d1 -> T=8, B=6
    docs = spark.createDataFrame(
        [(0, "a b a b c d"), (1, "a b")], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): r
        for r in textops.collocations(docs, min_count=2).collect()
    }
    bigrams = ["a b", "b a", "a b", "b c", "c d", "a b"]
    from collections import Counter

    bcnt, ucnt = Counter(bigrams), Counter("a b a b c d a b".split())
    B, T = len(bigrams), sum(ucnt.values())
    keep = {k: v for k, v in bcnt.items() if v >= 2}
    assert {(k.split()[0], k.split()[1]) for k in keep} == set(got)
    for k, c12 in keep.items():
        w1, w2 = k.split()
        pmi = math.log((c12 / B) / ((ucnt[w1] / T) * (ucnt[w2] / T)))
        assert got[(w1, w2)]["c12"] == c12
        assert abs(got[(w1, w2)]["pmi"] - round(pmi, 6)) < 1e-9


def test_repeated_spans_caught_at_any_offset(spark):
    from linkgraph.dedup import repeated_spans

    shared = "the exact same boilerplate sentence repeated across documents verbatim today"
    docs = spark.createDataFrame(
        [
            (0, "unique preamble alpha beta " + shared),  # shifted offset
            (1, shared + " unique tail omega"),
            (2, "totally unrelated text that is long enough to shingle but never shared with anything at all here"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    got = {r["span"]: r["n_docs"] for r in
           repeated_spans(docs, width=10).collect()}
    # every 10-token run of the shared sentence is caught despite the
    # differing offsets (the positional-window failure mode)
    toks = shared.split()
    for i in range(len(toks) - 9):
        span = " ".join(toks[i : i + 10])
        assert got.get(span) == 2, span
    # spans from the unrelated doc never appear (df 1 filtered)
    assert not any("unrelated" in s for s in got)


def test_gopher_filter_first_violation(spark):
    ok = ("the data and the model be of that have with it " * 8).strip()  # 96 toks
    docs = spark.createDataFrame(
        [
            (0, ok),
            (1, "too short to pass"),
            (2, ("a " * 60).strip()),  # 60 tokens of len 1 -> mean_tok_len
            (3, ("quartz " * 60).strip()),  # stopword-free, len 6 -> stopwords
            (4, ok + " " + "#% " * 30),  # symbol ratio blown
            (5, "\n".join(["- bullet %d the be to of and that have with item" % i for i in range(12)])),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.gopher_filter(docs).collect()}
    assert got[0]["keep"] and got[0]["reason"] is None
    assert got[1]["reason"] == "n_tokens"
    assert got[2]["reason"] == "mean_tok_len"
    assert got[3]["reason"] == "stopwords"
    assert got[4]["reason"] == "symbol_ratio"
    assert got[5]["reason"] == "bullet_lines"


def test_langid_scores_margin(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat and the hat is it you that"),  # clean en
            (1, "the and der und cat hat"),             # 2 en vs 2 de tie
            (2, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.langid_scores(docs).collect()}
    assert got[0]["lang_pred"] == "en" and got[0]["margin"] > 0.3
    # mixed doc: tie at 3 hits each -> lexicographic 'de', margin 0
    assert got[1]["lang_pred"] == "de"
    assert got[1]["best_hits"] == got[1]["second_hits"] == 2
    assert got[1]["margin"] == 0.0
    assert got[2]["lang_pred"] == "und" and got[2]["margin"] == 0.0


def test_lm_score2_exact_bigram(spark):
    import math

    # corpus bigrams: "a b" x2, "b a" x1 ; unigrams a3 b2 ; V=2 ; alpha=0.5
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in textops.lm_score2(docs, alpha=0.5).collect()}
    p_ab = (2 + 0.5) / (3 + 0.5 * 2)   # c(a b)=2, c(a)=3
    p_ba = (1 + 0.5) / (2 + 0.5 * 2)   # c(b a)=1, c(b)=2
    want = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    assert got[0]["n_bigrams"] == 3
    assert abs(got[0]["avg_neg_logp2"] - want) < 1e-9
    assert 1 not in got and 2 not in got  # <2 tokens emit no row


def test_rare_token_mask(spark):
    """df counts are DOCUMENT frequency (repeats inside one doc don't
    save a token); order preserved byte-exactly; placeholder counts."""
    from linkgraph.textops import rare_token_mask

    docs = spark.createDataFrame(
        [
            (0, "alpha beta secret alpha"),
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "loner loner loner"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in rare_token_mask(docs, min_df=2).collect()}
    # df: alpha=3, beta=3, gamma=2, secret=1, loner=1
    assert rows[0]["masked_text"] == "alpha beta <RARE> alpha"
    assert rows[0]["n_masked"] == 1 and rows[0]["n_tokens"] == 4
    assert rows[1]["masked_text"] == "alpha beta gamma"
    assert rows[1]["n_masked"] == 0
    assert rows[3]["masked_text"] == "<RARE> <RARE> <RARE>"
    assert rows[3]["n_masked"] == 3


def test_js_divergence_pairs(spark):
    """Identical vocabularies -> 0; disjoint -> ln 2; mixed case matches
    a literal python replica over the union vocabulary."""
    import math

    from linkgraph.textops import js_divergence_pairs

    docs = spark.createDataFrame(
        [
            (0, "a b c a", "s1"),
            (1, "a b c a", "s2"),          # s2 identical to s1
            (2, "x y z x y z", "s3"),      # s3 disjoint from s1/s2
            (3, "a a x", "s4"),            # s4 overlaps both
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["key_a"], r["key_b"]): r["jsd6"]
        for r in js_divergence_pairs(docs, key_col="source").collect()
    }
    assert got[("s1", "s2")] == 0.0
    assert abs(got[("s1", "s3")] - math.log(2)) < 1e-6

    def jsd(pa, pb):
        toks = set(pa) | set(pb)
        s = 0.0
        for t in toks:
            p, q = pa.get(t, 0.0), pb.get(t, 0.0)
            m = (p + q) / 2
            if p > 0:
                s += 0.5 * p * math.log(p / m)
            if q > 0:
                s += 0.5 * q * math.log(q / m)
        return s

    p1 = {"a": 0.5, "b": 0.25, "c": 0.25}
    p4 = {"a": 2 / 3, "x": 1 / 3}
    assert abs(got[("s1", "s4")] - round(jsd(p1, p4), 6)) < 1e-6
    assert len(got) == 6  # 4 choose 2 unordered pairs
