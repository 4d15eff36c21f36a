"""spark-submit entry point for the linkgraph engine (north rule: ships as
a ``spark-submit --py-files`` package).

Cluster usage:

    python scripts/make_package.py               # -> dist/linkgraph.zip
    spark-submit --py-files dist/linkgraph.zip main.py \\
        --pages /data/pages_parquet --out /data/linkgraph_out \\
        --checkpoint-dir /data/ckpt --run-id run-2025-01 --job all

Local smoke (no cluster): add --local-cores 8. On a cluster, the master
and executor sizing come from spark-submit, never from this script.

Jobs:
  extract     pages -> links + edges + vertices (written under --out);
              --pages may be a parquet dir OR an Iceberg table directory
              (jar-free reader; append @<snapshot_id> to time-travel)
  pagerank    converged ranks (+ per-superstep checkpoints when
              --checkpoint-dir is set; --resume continues a run_id)
  pagerank-blocked  the scale path: one-time CSR block compaction under
              --out (reused across runs), native-kernel supersteps
              (--transport jobs|barrier, --blocking hash|range,
              --n-blocks); --resume continues the run_id mid-iteration
              from the per-step checkpoint files
  store-update  apply a crawl delta to the existing blocked store IN
              PLACE (--update-added/--update-removed/--update-vertices
              parquet paths; only touched partitions rewritten); with
              --warm-rank, re-rank warm-started from ranks_blocked
  components  connected components (small-star/large-star)
  labelprop   synchronous label propagation (--iterations)
  triangles   per-vertex triangle counts
  complexity  per-component structural-complexity scores (ccm echo)
  all         everything above in dependency order
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_session(args):
    from pyspark.sql import SparkSession

    if args.local_cores:
        from linkgraph.session import get_spark

        return get_spark("linkgraph-main", cores=args.local_cores,
                         shuffle_partitions=args.shuffle_partitions)
    # on a cluster: spark-submit owns master/executors; just take the session
    b = SparkSession.builder.appName("linkgraph-main")
    b = b.config("spark.sql.execution.arrow.pyspark.enabled", "true")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    return b.getOrCreate()


def load_pages(spark, url: str):
    """Parquet dir or jar-free Iceberg table (BASELINE.json:6 mandates the
    Iceberg ingest path); ``path@<snapshot_id>`` time-travels."""
    from linkgraph.iceberg_lite import IcebergLiteTable

    path, _, snap = url.partition("@")
    if IcebergLiteTable.exists(path):
        t = IcebergLiteTable.load(path)
        return t.scan(spark, snapshot_id=int(snap) if snap else None)
    if snap:
        raise SystemExit(f"--pages {url}: @snapshot requires an Iceberg table")
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True,
                   help="pages table: parquet dir, or an Iceberg table "
                        "directory (auto-detected; optional @<snapshot_id> "
                        "suffix time-travels)")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--job", default="all",
                   choices=["extract", "pagerank", "pagerank-blocked",
                            "store-update", "components", "labelprop",
                            "louvain", "louvain-blocked", "louvain-hier",
                            "mis", "mis-blocked",
                            "triangles", "complexity", "all"])
    p.add_argument("--checkpoint-dir", default=None,
                   help="parquet dir, or iceberg://catalog.namespace to "
                        "checkpoint into Iceberg tables (requires an "
                        "Iceberg catalog on the session)")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tol", type=float, default=1e-6,
                   help="PageRank L1 tolerance PER VERTEX (networkx semantics)")
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--iterations", type=int, default=5, help="labelprop supersteps")
    p.add_argument("--n-blocks", type=int, default=None,
                   help="pagerank-blocked: vertex blocks (default 2x "
                        "shuffle partitions)")
    p.add_argument("--transport", default="jobs", choices=["jobs", "barrier"],
                   help="pagerank-blocked superstep transport")
    p.add_argument("--blocking", default="hash", choices=["hash", "range"],
                   help="pagerank-blocked vertex blocking (range = "
                        "host-locality layout for dense host-sorted ids)")
    p.add_argument("--update-added", default=None,
                   help="store-update: parquet of (src,dst) edges to add")
    p.add_argument("--update-removed", default=None,
                   help="store-update: parquet of (src,dst) edges to remove")
    p.add_argument("--update-vertices", default=None,
                   help="store-update: parquet of (id) new vertices")
    p.add_argument("--warm-rank", action="store_true",
                   help="store-update: re-rank warm-started from the "
                        "previous ranks_blocked output")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--local-cores", type=int, default=None)
    args = p.parse_args(argv)

    spark = build_session(args)
    from pyspark.sql import functions as F

    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.complexity import component_complexity, graph_complexity
    from linkgraph.components import connected_components
    from linkgraph.extract import build_links
    from linkgraph.graph import build_graph
    from linkgraph.labelprop import label_propagation
    from linkgraph.pagerank import pagerank
    from linkgraph.triangles import triangle_counts

    out = args.out.rstrip("/")
    ckpt = (
        CheckpointManager(spark, args.checkpoint_dir, args.run_id)
        if args.checkpoint_dir
        else None
    )
    jobs = (
        ["extract", "pagerank", "components", "labelprop", "triangles", "complexity"]
        if args.job == "all"
        else [args.job]
    )

    pages = load_pages(spark, args.pages)
    links = build_links(pages)
    edges, vertices = build_graph(pages, links)
    if "extract" in jobs:
        links.write.mode("overwrite").parquet(f"{out}/links")
        edges.write.mode("overwrite").parquet(f"{out}/edges")
        vertices.write.mode("overwrite").parquet(f"{out}/vertices")
        print(json.dumps({"job": "extract", "edges": edges.count(),
                          "vertices": vertices.count()}))
    # downstream jobs read the written tables when present (plan truncation)
    try:
        edges = spark.read.parquet(f"{out}/edges")
        vertices = spark.read.parquet(f"{out}/vertices")
    except Exception:
        pass

    comps = None
    if "pagerank" in jobs:
        n = vertices.count()
        res = pagerank(spark, edges, vertices, tol=args.tol * n,
                       max_iter=args.max_iter, checkpoint=ckpt, resume=args.resume)
        res.ranks.write.mode("overwrite").parquet(f"{out}/ranks")
        print(json.dumps({"job": "pagerank", "iterations": res.iterations,
                          "converged": res.converged,
                          "supersteps": [
                              {"step": s.superstep, "l1": s.l1_delta,
                               "sec": round(s.seconds, 3)}
                              for s in res.supersteps]}))
    if "pagerank-blocked" in jobs:
        from linkgraph.pagerank_csr import (
            build_blocked, load_blocked, pagerank_blocked,
        )

        store = f"{out}/blocked_store"
        # fingerprint the compaction inputs: a store reused by path alone
        # would silently serve ranks for a STALE graph if --pages changed,
        # and silently ignore --n-blocks/--blocking (round-2 ADVICE, low)
        fp = {
            "pages": args.pages,
            "pages_rows": pages.count(),
            "n_blocks": args.n_blocks,
            "blocking": args.blocking,
        }
        g = None
        try:
            g = load_blocked(spark, store)  # reuse a previous compaction
            if g.fingerprint != fp:
                print(json.dumps({
                    "job": "pagerank-blocked", "event": "store_rebuild",
                    "reason": "fingerprint mismatch",
                    "store_fingerprint": g.fingerprint, "requested": fp,
                }))
                g.unpersist()
                g = None
        except (FileNotFoundError, ValueError):
            pass
        if g is None:
            g = build_blocked(spark, edges, vertices.select("id"),
                              n_blocks=args.n_blocks, store_path=store,
                              blocking=args.blocking, fingerprint=fp)
        n = vertices.count()
        run_dir = f"{out}/blocked_ranks/{args.run_id}"
        if not args.resume:
            import shutil as _sh

            _sh.rmtree(run_dir, ignore_errors=True)
        res = pagerank_blocked(spark, g, tol=args.tol * n,
                               max_iter=args.max_iter,
                               transport=args.transport, run_dir=run_dir)
        res.ranks.write.mode("overwrite").parquet(f"{out}/ranks_blocked")
        print(json.dumps({"job": "pagerank-blocked",
                          "iterations": res.iterations,
                          "converged": res.converged,
                          "n_blocks": g.n_blocks,
                          "supersteps": [
                              {"step": s.superstep, "l1": s.l1_delta,
                               "sec": round(s.seconds, 3)}
                              for s in res.supersteps]}))

    if "store-update" in jobs:
        from linkgraph.pagerank_csr import (
            load_blocked, pagerank_blocked, update_blocked,
        )

        store = f"{out}/blocked_store"
        g = load_blocked(spark, store)
        rd = spark.read
        g2 = update_blocked(
            spark, g,
            added=rd.parquet(args.update_added) if args.update_added else None,
            removed=(
                rd.parquet(args.update_removed) if args.update_removed else None
            ),
            new_vertices=(
                rd.parquet(args.update_vertices)
                if args.update_vertices else None
            ),
            fingerprint={
                **(g.fingerprint or {}),
                "deltas_applied": int(
                    (g.fingerprint or {}).get("deltas_applied", 0)
                ) + 1,
            },
        )
        print(json.dumps({
            "job": "store-update", "n": g2.n, "n_dangling": g2.n_dangling,
            "build_token": g2.build_token,
        }))
        if args.warm_rank:
            init = spark.read.parquet(f"{out}/ranks_blocked")
            res = pagerank_blocked(
                spark, g2, tol=args.tol * g2.n, max_iter=args.max_iter,
                transport=args.transport, init_ranks=init,
            )
            res.ranks.write.mode("overwrite").parquet(f"{out}/ranks_blocked")
            print(json.dumps({
                "job": "store-update-warm-rank",
                "iterations": res.iterations, "converged": res.converged,
            }))

    if "components" in jobs or "complexity" in jobs:
        comps = connected_components(spark, edges, vertices, checkpoint=ckpt)
        comps.write.mode("overwrite").parquet(f"{out}/components")
        print(json.dumps({
            "job": "components",
            "n_components": comps.select("component").distinct().count()}))
    if "labelprop" in jobs:
        labels = label_propagation(spark, edges, vertices, args.iterations,
                                   checkpoint=ckpt, resume=args.resume)
        labels.write.mode("overwrite").parquet(f"{out}/labels")
        print(json.dumps({"job": "labelprop", "iterations": args.iterations}))
    if "louvain" in jobs:
        from linkgraph.community import louvain_communities
        from linkgraph.graph import modularity

        labels = louvain_communities(spark, edges, vertices,
                                     rounds=args.iterations)
        labels.write.mode("overwrite").parquet(f"{out}/communities")
        q = float(
            modularity(edges, labels).agg(F.sum("q_term9")).collect()[0][0]
            or 0.0
        )
        print(json.dumps({
            "job": "louvain", "rounds": args.iterations,
            "n_communities": labels.select("label").distinct().count(),
            "modularity": round(q, 9),
        }))
    if "louvain-blocked" in jobs:
        # the scale path: zero-shuffle local-move rounds on an anonymous
        # blocked store built from the distinct symmetric closure
        from linkgraph.community_csr import louvain_blocked
        from linkgraph.graph import modularity, undirected_edges
        from linkgraph.pagerank_csr import build_blocked

        g = build_blocked(spark, undirected_edges(edges),
                          vertices.select("id"), n_blocks=args.n_blocks)
        try:
            labels = louvain_blocked(
                spark, g, rounds=args.iterations
            ).localCheckpoint()
        finally:
            g.delete()
        labels.write.mode("overwrite").parquet(f"{out}/communities_blocked")
        q = float(
            modularity(edges, labels).agg(F.sum("q_term9")).collect()[0][0]
            or 0.0
        )
        print(json.dumps({
            "job": "louvain-blocked", "rounds": args.iterations,
            "n_communities": labels.select("label").distinct().count(),
            "modularity": round(q, 9),
        }))
    if "louvain-hier" in jobs:
        from linkgraph.community import louvain_hierarchy
        from linkgraph.graph import modularity

        labels = louvain_hierarchy(spark, edges, vertices,
                                   rounds=args.iterations)
        labels.write.mode("overwrite").parquet(f"{out}/communities_hier")
        q = float(
            modularity(edges, labels).agg(F.sum("q_term9")).collect()[0][0]
            or 0.0
        )
        print(json.dumps({
            "job": "louvain-hier", "rounds": args.iterations,
            "n_communities": labels.select("label").distinct().count(),
            "modularity": round(q, 9),
        }))
    if "mis" in jobs:
        from linkgraph.mis import maximal_independent_set

        state = maximal_independent_set(spark, edges, vertices)
        state.write.mode("overwrite").parquet(f"{out}/mis")
        # fixpoint mode guarantees NO 'und' rows (round-4 ADVICE fix),
        # so in + out is the full vertex count by construction
        print(json.dumps({
            "job": "mis",
            "in": state.where("state = 'in'").count(),
            "out": state.where("state = 'out'").count(),
        }))
    if "mis-blocked" in jobs:
        from linkgraph.graph import undirected_edges
        from linkgraph.mis_csr import mis_blocked
        from linkgraph.pagerank_csr import build_blocked

        g = build_blocked(spark, undirected_edges(edges),
                          vertices.select("id"), n_blocks=args.n_blocks)
        try:
            state = mis_blocked(spark, g).localCheckpoint()
        finally:
            g.delete()
        state.write.mode("overwrite").parquet(f"{out}/mis_blocked")
        print(json.dumps({
            "job": "mis-blocked",
            "in": state.where("state = 'in'").count(),
            "out": state.where("state = 'out'").count(),
        }))
    if "triangles" in jobs:
        tri = triangle_counts(spark, edges, vertices)
        tri.write.mode("overwrite").parquet(f"{out}/triangles")
        print(json.dumps({"job": "triangles",
                          "total": int(tri.agg(F.sum("triangles")).collect()[0][0] or 0) // 3}))
    if "complexity" in jobs:
        comps = comps if comps is not None else spark.read.parquet(f"{out}/components")
        cscores = component_complexity(spark, edges, comps)
        cscores.write.mode("overwrite").parquet(f"{out}/complexity")
        whole = graph_complexity(spark, edges, comps).collect()[0].asDict()
        print(json.dumps({"job": "complexity", "whole_graph": whole}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
