"""HyperBall: register state matches a pure-Python HLL-ball replica
byte for byte (same md5 layout), estimates match the replica's floats,
the neighbourhood function is monotone and starts at |V|, and the
generated DuckDB SQL twin agrees with Spark on the same edge list."""

import hashlib
import math

import duckdb
import pandas as pd
import pytest

from linkgraph.hyperball import (
    hyperball,
    hyperball_regs,
    hyperball_sql,
    neighbourhood_function,
)
from linkgraph.sketches import hll_alpha

B = 4  # 16 buckets — small enough to exercise collisions on tiny graphs


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "src long, dst long"
    )


def verts_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def _rho(item: str, b: int):
    h = int(hashlib.md5(item.encode()).hexdigest()[:15], 16)
    m = 1 << b
    bucket = h & (m - 1)
    w = h >> b
    width = 60 - b
    return bucket, (width + 1) if w == 0 else (width + 1 - w.bit_length())


def replica_regs(pairs, ids, b, iters):
    """{id: {bucket: r}} after `iters` ball unions."""
    regs = {}
    for i in ids:
        bucket, r = _rho(str(int(i)), b)
        regs[i] = {bucket: r}
    out_nbrs = {}
    for u, v in pairs:
        out_nbrs.setdefault(u, []).append(v)
    for _ in range(iters):
        new = {}
        for i in ids:
            merged = dict(regs[i])
            for w in out_nbrs.get(i, []):
                for bkt, r in regs[w].items():
                    if r > merged.get(bkt, 0):
                        merged[bkt] = r
            new[i] = merged
        regs = new
    return regs


def replica_estimate(reg_map, b):
    m = 1 << b
    nonempty = len(reg_map)
    s = sum(1.0 / (1 << r) for r in reg_map.values()) + (m - nonempty)
    e_raw = hll_alpha(m) * m * m / s
    v = m - nonempty
    if e_raw <= 2.5 * m and v > 0:
        return float(m) * math.log(float(m) / v)
    return e_raw


PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 0), (7, 8)]
IDS = list(range(9))


def test_registers_match_replica(spark):
    for iters in (0, 1, 2, 3):
        got = {
            (row["id"], row["bucket"]): row["r"]
            for row in hyperball_regs(
                spark, edges_df(spark, PAIRS), verts_df(spark, IDS),
                b=B, iters=iters,
            ).collect()
        }
        want = {
            (i, bkt): r
            for i, regmap in replica_regs(PAIRS, IDS, B, iters).items()
            for bkt, r in regmap.items()
        }
        assert got == want, f"iters={iters}"


def test_estimates_match_replica(spark):
    rep = replica_regs(PAIRS, IDS, B, 2)
    want = {i: round(replica_estimate(rep[i], B), 4) for i in IDS}
    got = {
        row["id"]: row["ball_est4"]
        for row in hyperball(
            spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=2
        ).collect()
    }
    assert got == pytest.approx(want, abs=1e-9)


def test_neighbourhood_function_monotone(spark):
    nf = neighbourhood_function(
        spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=3
    ).collect()
    vals = [row["reachable_pairs2"] for row in sorted(nf, key=lambda r: r["t"])]
    assert len(vals) == 4
    assert vals == sorted(vals)  # balls only grow
    # t=0: every ball is {v} itself — 9 singleton estimates
    rep0 = replica_regs(PAIRS, IDS, B, 0)
    want0 = round(sum(round(replica_estimate(rep0[i], B), 4) for i in IDS), 2)
    assert vals[0] == pytest.approx(want0, abs=1e-6)


def _r4(x):
    # Spark's round() = HALF_UP over the double's shortest decimal repr
    # (BigDecimal.valueOf); Python's round() is half-even — they differ
    # on exact .00005 ties, which the /2 centrality step does produce.
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def test_centrality_matches_replica(spark):
    from linkgraph.hyperball import hyperball_centrality

    iters = 3
    states = [replica_regs(PAIRS, IDS, B, t) for t in range(iters + 1)]
    want = {}
    for i in IDS:
        e4 = [_r4(replica_estimate(states[t][i], B))
              for t in range(iters + 1)]
        td, hm = 0.0, 0.0
        for t in range(1, iters + 1):
            td = td + float(t) * (e4[t] - e4[t - 1])
            hm = hm + (e4[t] - e4[t - 1]) / float(t)
        want[i] = (_r4(td), _r4(hm))
    got = {
        row["id"]: (row["totdist4"], row["harmonic4"])
        for row in hyperball_centrality(
            spark, edges_df(spark, PAIRS), verts_df(spark, IDS),
            b=B, iters=iters,
        ).collect()
    }
    assert set(got) == set(want)
    for i in IDS:
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-9), i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i


def test_centrality_sql_twin(spark):
    from linkgraph.hyperball import centrality_sql, hyperball_centrality

    got = (
        hyperball_centrality(
            spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=2
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "pairs", pd.DataFrame(PAIRS, columns=["src", "dst"]).astype("int64")
    )
    con.register("idtab", pd.DataFrame({"id": IDS}).astype("int64"))
    sql = f"""
WITH edges AS (SELECT src, dst FROM pairs),
verts AS (SELECT id FROM idtab),
{centrality_sql('edges', 'verts', b=B, iters=2)}
SELECT id, totdist4, harmonic4 FROM hb_cent ORDER BY id
"""
    want = con.execute(sql).df()
    assert list(got["id"]) == list(want["id"])
    assert got["totdist4"].tolist() == pytest.approx(
        want["totdist4"].tolist(), abs=1e-9
    )
    assert got["harmonic4"].tolist() == pytest.approx(
        want["harmonic4"].tolist(), abs=1e-9
    )


def test_sql_twin_matches_spark(spark):
    got = (
        hyperball(
            spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=2
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "pairs", pd.DataFrame(PAIRS, columns=["src", "dst"]).astype("int64")
    )
    con.register("idtab", pd.DataFrame({"id": IDS}).astype("int64"))
    sql = f"""
WITH edges AS (SELECT src, dst FROM pairs),
verts AS (SELECT id FROM idtab),
{hyperball_sql('edges', 'verts', b=B, iters=2)}
SELECT id, nonempty AS nonempty_buckets, round(est, 4) AS ball_est4
FROM hb_est ORDER BY id
"""
    want = con.execute(sql).df()
    assert list(got["id"]) == list(want["id"])
    assert list(got["nonempty_buckets"]) == list(want["nonempty_buckets"])
    assert got["ball_est4"].tolist() == pytest.approx(
        want["ball_est4"].tolist(), abs=1e-9
    )


def test_effective_diameter_matches_nfunction_selection(spark):
    """eff_diameter = the q-quantile selection over the (already
    replica-pinned) neighbourhood function, interpolation included."""
    from linkgraph.hyperball import effective_diameter

    nf = neighbourhood_function(
        spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=3
    ).collect()
    vals = {r["t"]: r["reachable_pairs2"] for r in nf}
    n_inf = vals[max(vals)]
    t = min(k for k in sorted(vals) if vals[k] >= 0.9 * n_inf)
    if t == 0:
        interp = 0.0
    else:
        interp = t - 1 + (0.9 * n_inf - vals[t - 1]) / (vals[t] - vals[t - 1])
    got = effective_diameter(
        spark, edges_df(spark, PAIRS), verts_df(spark, IDS), b=B, iters=3
    ).collect()
    assert len(got) == 1
    assert got[0]["eff_diameter"] == t
    assert got[0]["eff_diameter_interp4"] == pytest.approx(_r4(interp), abs=1e-9)
    assert got[0]["reachable_pairs_inf2"] == n_inf


def test_effective_diameter_star_is_two(spark):
    """Bidirected hub-and-spokes: spoke->spoke takes 2 hops via the hub,
    so balls saturate at t=2 and the effective diameter is exactly 2
    (singleton/one-hop masses are well under 90% of saturation)."""
    from linkgraph.hyperball import effective_diameter

    pairs = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    got = effective_diameter(
        spark, edges_df(spark, pairs), verts_df(spark, range(9)), b=B, iters=3
    ).collect()[0]
    assert got["eff_diameter"] == 2
