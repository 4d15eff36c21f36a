"""Phase-level timing of the headline bench queries (guide §1: measure
first). Mirrors bench.py's exact call shapes but wraps each internal phase
in its own timer so optimization targets the real hotspot, not a guess.

Usage: python scripts/diag_phases.py [query ...]   (default: all)
Prints one line per phase; same sf/core env contract as bench.py.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph import caching, dedup, tpcgraph  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    only = set(sys.argv[1:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("linkgraph-diag", cores=cpus,
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()
    edges = tpcgraph.order_edges(spark, SF_DIR).persist()
    edges.count()
    verts = tpcgraph.vertices_of(edges).persist()
    n_verts = verts.count()

    t_last = [time.perf_counter()]

    def mark(label: str) -> None:
        now = time.perf_counter()
        print(f"  {label:40s} {now - t_last[0]:7.3f}s", flush=True)
        t_last[0] = now

    def start(q: str) -> bool:
        if only and q not in only:
            return False
        print(f"== {q}", flush=True)
        t_last[0] = time.perf_counter()
        return True

    # --- raw action latency ------------------------------------------------
    if start("action_latency"):
        for _ in range(3):
            spark.range(1).count()
        mark("3x spark.range(1).count() warm")
        df = spark.range(1000000).select((F.col("id") % 97).alias("k"))
        df.groupBy("k").count().count()
        mark("1M groupBy count (1 shuffle job)")

    # --- pagerank: build vs supersteps vs decode ---------------------------
    if start("pagerank"):
        from linkgraph.pagerank_csr import build_blocked, pagerank_blocked

        g = build_blocked(spark, edges, verts.select("id"), n_blocks=8,
                          n_vertices=n_verts)
        mark("build_blocked")
        res = pagerank_blocked(
            spark, g, tol=n_verts * 1e-6, max_iter=60,
            transport="barrier", barrier_slots=8,
        )
        mark("pagerank_blocked (incl prep+decode)")
        res.ranks.count()
        mark("ranks.count()")
        step_total = sum(s.seconds for s in res.supersteps)
        print(f"  {'sum of superstep secs':40s} {step_total:7.3f}s "
              f"({res.iterations} iters)")
        g.delete()

    # --- louvain_blocked: sym-closure, build, rounds, decode ---------------
    if start("louvain_blocked"):
        from linkgraph.community_csr import louvain_blocked
        from linkgraph.graph import undirected_edges
        from linkgraph.pagerank_csr import build_blocked

        und = undirected_edges(edges)
        g = build_blocked(spark, und, verts.select("id"), n_blocks=8)
        mark("undirected_edges + build_blocked")
        stats: dict = {}
        out = louvain_blocked(spark, g, rounds=2, stats=stats)
        out.count()
        mark("louvain rounds + decode + count")
        print(f"  {'step_secs':40s} {stats['step_secs']}")
        g.delete()
        caching.release_caches()

    # --- louvain2 flat: prep vs rounds -------------------------------------
    if start("louvain2"):
        from linkgraph.community import (
            _prep_graph, louvain_move_round)
        from linkgraph.lineage import truncate_plan

        prepped = _prep_graph(edges)
        mark("_prep_graph (sym distinct + deg)")
        labels = verts.select("id", F.col("id").alias("label"))
        for r in range(2):
            labels = truncate_plan(
                louvain_move_round(spark, edges, labels, _prepped=prepped))
            mark(f"round {r}")
        labels.count()
        mark("final count")

    # --- labelprop3: prep vs rounds ----------------------------------------
    if start("labelprop3"):
        from linkgraph.labelprop import label_propagation

        label_propagation(spark, edges, verts, 3).count()
        mark("label_propagation(3) end-to-end")

    # --- components --------------------------------------------------------
    if start("components"):
        from linkgraph.components import connected_components

        connected_components(spark, edges, verts).count()
        mark("connected_components end-to-end")

    # --- mis2 --------------------------------------------------------------
    if start("mis2"):
        from linkgraph.mis import maximal_independent_set

        maximal_independent_set(spark, edges, verts, rounds=2).count()
        mark("mis rounds=2 end-to-end")

    # --- dedup_minhash: shingles vs sigs vs verify -------------------------
    if start("dedup_minhash"):
        shingles = dedup.shingle_table(docs, 3).persist()
        shingles.count()
        mark("shingle_table persist+count")
        dedup.minhash_dedup_pairs(
            docs, num_hashes=8, rows_per_band=2, verify_threshold=0.5,
            shingles=shingles,
        ).count()
        mark("minhash_dedup_pairs (sigs+cand+verify)")
        dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, shingles=shingles, log_drops=False
        ).count()
        mark("ngram_jaccard_pairs")
        caching.release_caches()
        shingles.unpersist()

    # --- triangles ---------------------------------------------------------
    if start("triangles"):
        from linkgraph.triangles import triangle_counts

        tri_edges = tpcgraph.supplier_copart_edges(spark, SF_DIR)
        triangle_counts(
            spark, tri_edges, tpcgraph.vertices_of(tri_edges)).count()
        mark("triangle_counts end-to-end")
        caching.release_caches()

    # --- sim_topk_lsh ------------------------------------------------------
    if start("sim_topk_lsh"):
        from linkgraph import simsearch

        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
        embs.count()
        mark("embs persist")
        queries = simsearch.queries_from(embs, 50).persist()
        queries.count()
        mark("queries persist")
        simsearch.topk_lsh(
            embs, queries, k=5, n_tables=10, bits_per_table=6, probe_flips=1
        ).count()
        mark("topk_lsh")
        queries.unpersist()

    # --- text_winnow --------------------------------------------------------
    if start("text_winnow"):
        dedup.winnow_fingerprints(docs).count()
        mark("winnow_fingerprints")

    # --- sssp3 --------------------------------------------------------------
    if start("sssp3"):
        from linkgraph.sssp import sssp_distances

        wedges = edges.select(
            "src", "dst",
            ((F.col("src") % 97 + F.col("dst") % 89 + 1).cast("double")
             / 10.0).alias("w"),
        )
        sssp_seeds = verts.select("id").where(F.col("id") % 100 == 0)
        sssp_distances(spark, wedges, sssp_seeds, 3).count()
        mark("sssp_distances(3)")


if __name__ == "__main__":
    main()
