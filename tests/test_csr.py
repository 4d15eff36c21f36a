"""CSR block compaction round-trips the edge table exactly."""

from linkgraph.csr import compact_csr, expand_csr


def test_csr_roundtrip(spark, small):
    csr = compact_csr(small.edges, num_blocks=8)
    back = expand_csr(csr)
    orig = {(r["src"], r["dst"]) for r in small.edges.collect()}
    got = [(r["src"], r["dst"]) for r in back.collect()]
    assert len(got) == len(orig)
    assert set(got) == orig


def test_csr_shape_invariants(spark, tiny):
    rows = compact_csr(tiny.edges, num_blocks=4).collect()
    assert sum(r["n_edges"] for r in rows) == tiny.edges.count()
    for r in rows:
        assert len(r["offsets"]) == len(r["srcs"]) + 1
        assert r["offsets"][0] == 0
        assert r["offsets"][-1] == r["n_edges"]
        assert r["srcs"] == sorted(r["srcs"])
