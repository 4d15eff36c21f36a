"""Incremental-update vs full-rebuild evidence at a size where compaction
cost dominates fixed overhead.

Builds a synthetic power-law graph (synthgraph, the scaling-bench
generator), compacts it once, then times: (a) a full build_blocked of the
post-delta graph vs (b) update_blocked applying the same delta to the
existing store (~0.1% of edges added+removed). Prints one JSON line.

Usage: python scripts/bench_store_update.py [n_vertices] [avg_deg]
Defaults 2_000_000 x 20 (~40M edges) — big enough that the full
compaction's |E| shuffle dwarfs the update's touched-partition rewrite.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.session import get_spark  # noqa: E402


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from linkgraph.pagerank_csr import build_blocked, update_blocked
    from linkgraph.synthgraph import synth_edges

    spark = get_spark("store-update-bench", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    base_dir = "/tmp/lg-upd-bench"
    shutil.rmtree(base_dir, ignore_errors=True)

    edges = synth_edges(spark, n_vertices, avg_deg, num_partitions=64)
    verts = spark.range(n_vertices).select(F.col("id"))

    # the delta: ~0.1% spurious reversed edges in, same order of real
    # edges out (disjoint slices so the delta never cancels itself).
    # Materialized first — a real crawl delta arrives as files, not as a
    # lazy slice of a generator that re-synthesizes 145M edges per action
    rem = edges.where(F.col("src") % 997 == 0).localCheckpoint()
    add = (
        edges.where(F.col("src") % 991 == 1)
        .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .localCheckpoint()
    )

    t0 = time.perf_counter()
    g = build_blocked(
        spark, edges, verts, n_blocks=64, store_path=f"{base_dir}/store",
        n_vertices=n_vertices, blocking="range",
    )
    build_sec = round(time.perf_counter() - t0, 2)

    # scenario 1: UNIFORM delta — dsts spread over every block, so all
    # 64 partitions rewrite; incremental ~ rebuild by construction (the
    # honest worst case)
    t0 = time.perf_counter()
    g2 = update_blocked(spark, g, added=add, removed=rem)
    uniform_sec = round(time.perf_counter() - t0, 2)

    # scenario 2: LOCALIZED delta — a recrawl of one host cluster: dst
    # ids in the first 1/32 of the range-blocked id space, so only ~2 of
    # 64 partitions are touched. This is the case the design targets.
    lo = n_vertices // 32
    rem_loc = edges.where(
        (F.col("dst") < lo) & (F.col("src") % 7 == 0)
    ).localCheckpoint()
    add_loc = (
        edges.where((F.col("dst") < lo) & (F.col("src") % 11 == 3))
        .select("src", (F.col("dst") + 1).alias("dst"))
        .where(F.col("dst") < lo)
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    g3 = update_blocked(spark, g2, added=add_loc, removed=rem_loc)
    local_sec = round(time.perf_counter() - t0, 2)

    n_edges = int(
        spark.read.parquet(f"{base_dir}/store/edges").count()
    )
    print(json.dumps({
        "metric": "store build vs incremental update",
        "n_vertices": n_vertices,
        "n_edges_after": n_edges,
        "full_build_sec": build_sec,
        "uniform_delta_update_sec": uniform_sec,
        "uniform_delta_rows": int(add.count() + rem.count()),
        "local_delta_update_sec": local_sec,
        "local_delta_rows": int(add_loc.count() + rem_loc.count()),
        "local_speedup_vs_build": round(build_sec / max(local_sec, 1e-9), 2),
    }))
    g3.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
