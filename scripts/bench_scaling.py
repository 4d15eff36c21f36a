"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
parallelism levels of the same job on the same deterministic input:
local[N] and local[4N] (default N=8). Each level runs in a fresh
subprocess (a JVM can't change master in-process); this wrapper collects
the JSON results and writes BENCH/BASELINE.md.

Workloads:
- pagerank: supersteps over a ~17M-edge synthetic power-law graph
  (linkgraph.synthgraph); throughput = edges/sec per superstep, first
  superstep dropped as warmup. This is the north-rule metric.
- extract: vectorized pandas-UDF link extraction over 200k synthesized
  HTML pages; throughput = pages/sec (Python-worker scaling path).

Efficiency = (thr_4N / thr_N) / 4.

Usage:
    python scripts/bench_scaling.py            # both levels + report
    python scripts/bench_scaling.py --run 8    # one level, JSON to stdout
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_VERTICES = 4_000_000
AVG_DEG = 8
SUPERSTEPS = 4
N_PAGES = 400_000
PARTS = 128  # same input partitioning at both levels (fair comparison)
BASE_CORES = int(os.environ.get("SCALING_BASE_CORES", "8"))


def run_one(cores: int) -> dict:
    from pyspark.sql import functions as F

    from linkgraph.extract import extract_links_udf
    from linkgraph.pagerank import pagerank
    from linkgraph.session import get_spark
    from linkgraph.synthgraph import synth_edges, synth_vertices

    spark = get_spark(
        f"scaling-{cores}",
        cores=cores,
        shuffle_partitions=PARTS,
        driver_memory="48g",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = synth_edges(spark, N_VERTICES, AVG_DEG, num_partitions=PARTS).persist()
    n_edges = edges.count()
    verts = synth_vertices(spark, N_VERTICES, num_partitions=PARTS)

    res = pagerank(spark, edges, verts, tol=0.0, max_iter=SUPERSTEPS)
    step_secs = [s.seconds for s in res.supersteps][1:]  # drop warmup
    pr_sec = sum(step_secs) / len(step_secs)

    # vectorized extraction workload (Python-worker path)
    pages = spark.range(0, N_PAGES, numPartitions=PARTS).select(
        F.concat(F.lit("https://bench.example/p"), F.col("id")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>bench page body text</p>"),
                F.aggregate(
                    F.transform(
                        F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(12))),
                        lambda j: F.concat(
                            F.lit('<a href="https://bench.example/p'),
                            F.pmod(F.col("id") * 31 + j * 7, F.lit(N_PAGES)),
                            F.lit('#s">x</a>'),
                        ),
                    ),
                    F.lit(""),
                    lambda acc, x: F.concat(acc, x),
                ),
                F.lit("</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    ).persist()
    pages.count()

    def run_extract():
        return pages.select(
            F.explode(extract_links_udf(F.col("html"), F.col("url")))
        ).count()

    run_extract()  # warm the Python workers (cold-start is ~2s x n_workers)
    t0 = time.perf_counter()
    n_links = run_extract()
    ex_sec = time.perf_counter() - t0

    out = {
        "cores": cores,
        "n_edges": n_edges,
        "pagerank_sec_per_superstep": round(pr_sec, 3),
        "pagerank_edges_per_sec": round(n_edges / pr_sec, 1),
        "extract_sec": round(ex_sec, 3),
        "extract_pages_per_sec": round(N_PAGES / ex_sec, 1),
        "n_links": n_links,
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print(json.dumps(run_one(int(sys.argv[2]))))
        return

    results = {}
    for cores in (BASE_CORES, BASE_CORES * 4):
        print(f"running local[{cores}] ...", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, __file__, "--run", str(cores)],
            capture_output=True, text=True, cwd=str(REPO), timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"local[{cores}] run failed")
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(results[cores], file=sys.stderr)

    lo, hi = results[BASE_CORES], results[BASE_CORES * 4]
    pr_eff = (hi["pagerank_edges_per_sec"] / lo["pagerank_edges_per_sec"]) / 4
    ex_eff = (hi["extract_pages_per_sec"] / lo["extract_pages_per_sec"]) / 4

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox evidence: the same job at two parallelism levels on the same
deterministic input (single machine, {os.cpu_count()} physical cores;
local[{BASE_CORES}] vs local[{BASE_CORES * 4}]). Efficiency =
(thr_4N / thr_N) / 4. Method caveats: both levels share one memory
subsystem, and the JVM's GC/shuffle threads are not bounded by the
`local[N]` task-slot count, which depresses measured efficiency vs a real
N-node vs 4N-node comparison.

Input: synthetic power-law graph, {N_VERTICES:,} vertices,
{lo['n_edges']:,} edges (linkgraph.synthgraph, seed 42); {N_PAGES:,}
synthesized HTML pages for the extraction path.

| workload | metric | local[{BASE_CORES}] | local[{BASE_CORES * 4}] | efficiency |
|---|---|---|---|---|
| PageRank superstep | edges/sec | {lo['pagerank_edges_per_sec']:,} | {hi['pagerank_edges_per_sec']:,} | {pr_eff:.2f} |
| PageRank superstep | sec/superstep | {lo['pagerank_sec_per_superstep']} | {hi['pagerank_sec_per_superstep']} | — |
| link extraction (pandas UDF) | pages/sec | {lo['extract_pages_per_sec']:,} | {hi['extract_pages_per_sec']:,} | {ex_eff:.2f} |

Raw: {json.dumps(results)}
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
