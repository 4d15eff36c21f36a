"""Capture .explain("formatted") plans for the round-6-touched queries.

Usage: python scripts/plans_r06.py <outdir>

Runs against whatever tree it sits in, so the same script (copied into a
worktree at the round-start commit) produces the *_before.txt set and the
current tree produces *_after.txt. Only public operator APIs are used.
Frames are built exactly as bench.py builds them (sf0.1 inputs).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph import tpcgraph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans-r06", cores="32", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    edges = tpcgraph.order_edges(spark, SF_DIR).persist()
    edges.count()
    verts = tpcgraph.vertices_of(edges).persist()
    verts.count()

    def emit(name, df):
        p = f"{outdir}/{name}_{suffix}.txt"
        with open(p, "w") as f:
            f.write(formatted_plan(df))
        print("wrote", p, flush=True)

    # Per-round frames are normally plan-truncated (localCheckpoint +
    # stats reset), which would hide the round joins from explain();
    # disable truncation inside the iterative modules for the CAPTURE
    # ONLY so the unrolled plan shows the real per-round operators.
    import linkgraph.labelprop as lp_mod
    import linkgraph.community as comm_mod
    import linkgraph.mis as mis_mod
    import linkgraph.components as comp_mod

    def _no_trunc(df, eager=True):
        return df

    for mod in (lp_mod, comm_mod, mis_mod, comp_mod):
        mod.truncate_plan = _no_trunc

    emit("labelprop3", lp_mod.label_propagation(spark, edges, verts, 3))
    emit(
        "louvain2",
        comm_mod.louvain_communities(
            spark, edges, verts, rounds=2, materialize_each=False
        ),
    )
    emit("mis2",
         mis_mod.maximal_independent_set(spark, edges, verts, rounds=2))

    # components iterates to a signature fixpoint (driver actions per
    # round); capture two star rounds' unrolled plan instead
    pairs = comp_mod._canon_pairs(edges)
    bc = hasattr(comp_mod, "fits_broadcast") and comp_mod.fits_broadcast(
        verts.count()
    )
    try:
        one = comp_mod._small_star(comp_mod._large_star(pairs, bc), bc)
        two = comp_mod._small_star(comp_mod._large_star(one, bc), bc)
    except TypeError:  # round-start signature has no bcast flag
        one = comp_mod._small_star(comp_mod._large_star(pairs))
        two = comp_mod._small_star(comp_mod._large_star(one))
    emit("components", two)

    # restore real truncation for the blocked captures below
    from linkgraph.lineage import truncate_plan as _real_trunc

    for mod in (lp_mod, comm_mod, mis_mod, comp_mod):
        mod.truncate_plan = _real_trunc

    # blocked-store build: the store write is the heavy plan; reproduce
    # build_blocked's e2 frame shape through a tiny real build, then
    # capture the final rank-decode plan of blocked pagerank (the ranks
    # frame embeds the vmap join)
    from linkgraph.pagerank_csr import build_blocked, pagerank_blocked

    g = build_blocked(spark, edges, verts.select("id"), n_blocks=8,
                      n_vertices=verts.count())
    res = pagerank_blocked(spark, g, tol=1.0, max_iter=2)
    emit("pagerank_blocked_decode", res.ranks)
    g.delete()
    from linkgraph.community_csr import louvain_blocked
    from linkgraph.graph import undirected_edges

    g2 = build_blocked(spark, undirected_edges(edges), verts.select("id"),
                       n_blocks=8)
    emit("louvain_blocked", louvain_blocked(spark, g2, rounds=1))
    g2.delete()
    from linkgraph import caching

    caching.release_caches()


if __name__ == "__main__":
    main()
