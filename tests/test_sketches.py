"""Portable HLL: register-exact vs a literal python replica; estimate
within the published error bound (1.04/sqrt(m)) across cardinalities."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from linkgraph.sketches import hll_alpha, hll_distinct


def hll_py(items, b=8):
    """Flajolet et al. 2007, literally."""
    m = 1 << b
    width = 60 - b
    regs = [0] * m
    for it in items:
        h = int(hashlib.md5(str(it).encode()).hexdigest()[:15], 16)
        j = h & (m - 1)
        w = h >> b
        rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
        regs[j] = max(regs[j], rho)
    s = sum(1.0 / (1 << r) for r in regs)
    e = hll_alpha(m) * m * m / s
    v = regs.count(0)
    if e <= 2.5 * m and v > 0:
        e = float(m) * math.log(float(m) / v)
    return sum(1 for r in regs if r > 0), e


@pytest.mark.parametrize("n", [40, 500, 5000])
def test_hll_matches_python_replica(spark, n):
    items = [f"item-{i}" for i in range(n)] * 2  # duplicates: no effect
    df = spark.createDataFrame([(x,) for x in items], "tok string")
    row = hll_distinct(df, [], F.col("tok"), b=8).collect()
    # keyless groupBy: one global row
    assert len(row) == 1
    nonempty, est = hll_py(items)
    assert row[0]["nonempty_buckets"] == nonempty
    assert abs(row[0]["hll_estimate4"] - round(est, 4)) < 1e-9


@pytest.mark.parametrize("n", [100, 1000, 8000])
def test_hll_error_bound(spark, n):
    """|est - n| within 4 sigma, sigma = 1.04/sqrt(256) = 6.5%."""
    df = spark.createDataFrame(
        [(f"x{i}",) for i in range(n)], "tok string"
    )
    est = hll_distinct(df, [], F.col("tok"), b=8).collect()[0]["hll_estimate4"]
    assert abs(est - n) / n < 4 * 1.04 / 16


def test_hll_keyed_independence(spark):
    """Per-key sketches equal the same sketch run on each key alone."""
    rows = [("a", f"w{i}") for i in range(300)] + [
        ("b", f"w{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, tok string")
    both = {
        r["k"]: r["hll_estimate4"]
        for r in hll_distinct(df, ["k"], F.col("tok")).collect()
    }
    for k in ("a", "b"):
        alone = hll_distinct(
            df.where(F.col("k") == k), ["k"], F.col("tok")
        ).collect()[0]["hll_estimate4"]
        assert both[k] == alone


def test_cms_never_underestimates_and_is_tight_for_heavy(spark):
    """CMS point estimates >= exact always; with n_items << d*w the
    top item is exact (no collisions in at least one row, whp for this
    fixed fixture)."""
    from linkgraph.sketches import cms_estimate, cms_table

    rows = (
        [("hot",)] * 500
        + [(f"warm{i}",) for i in range(10) for _ in range(20)]
        + [(f"cold{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "tok string")
    sk = cms_table(df, F.col("tok"), d=4, w=512)
    exact = {r["tok"]: r["n"] for r in
             df.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    items = df.select("tok").distinct()
    est = {r["tok"]: r["cms_est"] for r in
           cms_estimate(sk, items, "tok", d=4, w=512).collect()}
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] >= exact[k], k
    assert est["hot"] == exact["hot"]


def test_cms_matches_python_replica(spark):
    from linkgraph.sketches import cms_estimate, cms_table

    items = [f"t{i % 37}" for i in range(400)]
    d, w = 4, 64  # small w: force collisions, exercise the min
    df = spark.createDataFrame([(x,) for x in items], "tok string")
    sk = cms_table(df, F.col("tok"), d=d, w=w)
    est = {r["tok"]: r["cms_est"] for r in cms_estimate(
        sk, df.select("tok").distinct(), "tok", d=d, w=w).collect()}

    cells = {}
    for it in items:
        for i in range(d):
            c = int(hashlib.md5(f"{i}:{it}".encode()).hexdigest()[:15], 16) % w
            cells[(i, c)] = cells.get((i, c), 0) + 1
    for it in set(items):
        want = min(
            cells[(i, int(hashlib.md5(f"{i}:{it}".encode())
                          .hexdigest()[:15], 16) % w)]
            for i in range(d)
        )
        assert est[it] == want, it


def test_bloom_no_false_negatives_and_matches_replica(spark):
    from linkgraph.sketches import bloom_bits, bloom_probe

    members = [f"m{i}" for i in range(150)]
    probes = members[:40] + [f"p{i}" for i in range(300)]
    K, M = 3, 1024  # small m: force some false positives

    mdf = spark.createDataFrame([(x,) for x in members], "item string")
    pdf = spark.createDataFrame([(x,) for x in probes], "item string")
    bits = bloom_bits(mdf, F.col("item"), k=K, m=M)
    got = {
        r["item"]: r["bloom_hit"]
        for r in bloom_probe(bits, pdf, F.col("item"), k=K, m=M).collect()
    }

    def positions(x):
        return {
            int(hashlib.md5(f"{i}:{x}".encode()).hexdigest()[:15], 16) % M
            for i in range(K)
        }

    setbits = set()
    for x in members:
        setbits |= positions(x)
    want = {x: positions(x) <= setbits for x in probes}
    assert got == want
    for x in members[:40]:
        assert got[x]  # structural: never a false negative
    fps = sum(1 for x in probes[40:] if got[x])
    assert fps >= 1  # small m chosen so the FP path is exercised
