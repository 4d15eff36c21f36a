"""Noop-sink isolation bench (guide §1.4) — NOT the driver contract.

bench.py (frozen, the driver's artifact) times each query with the same
count() sinks as round 1. This companion measures the same computations
against the built-in noop sink (`format("noop")`), which materializes
EVERY column of every row and cannot be pruned by the optimizer — the
honest cost of the transformation itself — and labels each job
(setJobDescription) so the UI maps time to operators.

Prints one JSON line: {"queries": {name: [per-rep seconds...]}, "sf": ...}.
Reps are interleaved across queries (2 full passes) so a host-noise burst
cannot inflate one query's every sample (the repo's additive-noise model).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph import caching, dedup, simsearch, tpcgraph  # noqa: E402
from linkgraph.components import connected_components  # noqa: E402
from linkgraph.community import louvain_communities  # noqa: E402
from linkgraph.labelprop import label_propagation  # noqa: E402
from linkgraph.mis import maximal_independent_set  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402
from linkgraph.triangles import triangle_counts  # noqa: E402
from linkgraph.walks import random_walks  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("linkgraph-bench-extra", cores=cpus,
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    docs.count()
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    embs.count()
    edges = tpcgraph.order_edges(spark, SF_DIR).persist()
    edges.count()
    verts = tpcgraph.vertices_of(edges).persist()
    verts.count()
    n_docs = docs.count()

    def q_labelprop3():
        noop(label_propagation(spark, edges, verts, 3))

    def q_louvain2():
        noop(louvain_communities(spark, edges, verts, rounds=2))

    def q_mis2():
        noop(maximal_independent_set(spark, edges, verts, rounds=2))

    def q_components():
        noop(connected_components(spark, edges, verts))

    def q_triangles():
        te = tpcgraph.supplier_copart_edges(spark, SF_DIR)
        noop(triangle_counts(spark, te, tpcgraph.vertices_of(te)))
        caching.release_caches()

    def q_dedup_minhash():
        sh = dedup.shingle_table(docs, 3).persist()
        noop(dedup.minhash_dedup_pairs(
            docs, num_hashes=8, rows_per_band=2, verify_threshold=0.5,
            shingles=sh))
        caching.release_caches()
        sh.unpersist()

    def q_walks4():
        wj = F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3)).alias("j")
        wedges = docs.select(F.col("doc_id").alias("src"), wj).select(
            "src", ((F.col("src") * 7 + F.col("j") * 13) % n_docs).alias("dst")
        ).distinct()
        wstarts = docs.where(F.col("doc_id") % 17 == 0).select(
            F.col("doc_id").alias("id"))
        noop(random_walks(wedges, wstarts, steps=4))

    def q_sim_topk_lsh():
        qs = simsearch.queries_from(embs, 50).persist()
        qs.count()
        noop(simsearch.topk_lsh(
            embs, qs, k=5, n_tables=10, bits_per_table=6, probe_flips=1))
        qs.unpersist()

    qs = {
        "labelprop3": q_labelprop3,
        "louvain2": q_louvain2,
        "mis2": q_mis2,
        "components": q_components,
        "triangles": q_triangles,
        "dedup_minhash": q_dedup_minhash,
        "walks4": q_walks4,
        "sim_topk_lsh": q_sim_topk_lsh,
    }
    out: dict[str, list[float]] = {k: [] for k in qs}
    for _pass in range(2):
        for name, fn in qs.items():
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            fn()
            out[name].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "noop-sink isolation (guide §1.4), per-query seconds",
        "queries": out,
        "mins": {k: min(v) for k, v in out.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
