"""Two-cluster-size scaling evidence on a REAL multi-executor cluster.

Starts a Spark standalone master + one 32-core worker on localhost, then
spark-submits the same job (scripts/cluster_job.py, shipped with
--py-files dist/linkgraph.zip) twice:

    N  executors: spark.cores.max=8   -> 2 executors x 4 cores
    4N executors: spark.cores.max=32  -> 8 executors x 4 cores

Each executor is its own JVM with its own heap, GC, and shuffle server —
unlike local[N], where one shared heap makes shuffle-heavy stages
anti-scale with thread count (measured: groupBy over 130M rows is ~1.5x
SLOWER at local[32] than local[8]). Executor size is identical across the
two levels; only the executor COUNT changes — the honest analogue of
adding nodes.

Writes BENCH/BASELINE.md. Run with nothing else on the machine.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark  # noqa: E402

SPARK_HOME = Path(pyspark.__file__).parent
MASTER = "spark://127.0.0.1:7077"

N_VERTICES = int(os.environ.get("BENCH_N_VERTICES", 24_000_000))
AVG_DEG = int(os.environ.get("BENCH_AVG_DEG", 16))
SUPERSTEPS = int(os.environ.get("BENCH_SUPERSTEPS", 20))
N_PAGES = int(os.environ.get("BENCH_N_PAGES", 1_600_000))
# web-graph locality: fraction of links that stay inside the src's host;
# host-clustered ids + range blocking keep them in the diagonal block
# pair, whose rank vector + accumulator are cache-resident
INTRA_HOST = float(os.environ.get("BENCH_INTRA_HOST", 0.85))
# B sized so both locals of a pair fit 16 bits (packed-u32 edge words,
# 4B/edge streamed) and a rank block (n/B doubles) stays ~L2-resident
N_BLOCKS = int(os.environ.get("BENCH_N_BLOCKS", 384))
# parquet store on DISK; decoded npy sidecars + per-step rank files on
# tmpfs (the hot mmap'd working set), so tmpfs stays well under RAM even
# with 8 executor JVMs up
STORE = os.environ.get("BENCH_STORE", "/tmp/linkgraph-cluster-store")
NPY_DIR = "/dev/shm/linkgraph-npy"
RANKS_DIR = "/dev/shm/linkgraph-ranks"
EXECUTOR_CORES = 4
EXECUTOR_MEM = "6g"
# N executors vs 4N executors, identical executor shape. Default N=1:
# the 4N level then uses half the box's 32 cores, so the comparison is
# not confounded by the driver/OS competing for the last cores — adding
# executors is the thing being measured. BENCH_N_EXECUTORS=2 reproduces
# the 8->32-core variant.
N_EXEC = int(os.environ.get("BENCH_N_EXECUTORS", 1))
LEVELS = {
    N_EXEC * EXECUTOR_CORES: f"{N_EXEC} executor(s) x {EXECUTOR_CORES} cores",
    4 * N_EXEC * EXECUTOR_CORES:
        f"{4 * N_EXEC} executors x {EXECUTOR_CORES} cores",
}

ENV = {
    **os.environ,
    "SPARK_HOME": str(SPARK_HOME),
    # build-phase shuffles are tens of GB at 1.4B edges: keep them on real
    # disk so tmpfs stays free for the block store + rank files (the
    # superstep itself barely shuffles — file-based transport)
    "SPARK_LOCAL_DIRS": "/tmp/linkgraph-cluster-local",
    # driver-side too: pagerank_blocked resolves the rank-file root on the
    # driver; workers get the same via spark.executorEnv.* below
    "LINKGRAPH_NPY_DIR": "/dev/shm/linkgraph-npy",
    "LINKGRAPH_RANKS_DIR": "/dev/shm/linkgraph-ranks",
    "SPARK_LOG_DIR": "/tmp/linkgraph-cluster-logs",
    "SPARK_NO_DAEMONIZE": "1",
    "PYSPARK_PYTHON": sys.executable,
    "PYSPARK_DRIVER_PYTHON": sys.executable,
}


def spark_class(*args):
    return subprocess.Popen(
        [str(SPARK_HOME / "bin" / "spark-class"), *args],
        env=ENV, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


def submit(cores_max: int, mode: str = "run", timeout: int = 2400) -> dict:
    cmd = [
        str(SPARK_HOME / "bin" / "spark-submit"),
        "--master", MASTER,
        "--deploy-mode", "client",
        "--py-files", str(REPO / "dist" / "linkgraph.zip"),
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.executor.cores={EXECUTOR_CORES}",
        "--conf", f"spark.executor.memory={EXECUTOR_MEM}",
        # every executor JVM must size its GC/thread pools for ITS core
        # slice, not the whole machine: 8 co-located JVMs each spawning
        # 32-core-sized GC threads oversubscribe the box and produce
        # multi-second straggler supersteps at the 4N level only
        "--conf", "spark.executor.extraJavaOptions="
                  f"-XX:ActiveProcessorCount={EXECUTOR_CORES} "
                  f"-XX:ParallelGCThreads={EXECUTOR_CORES} -XX:ConcGCThreads=2",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.python.worker.reuse=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", f"spark.executorEnv.LINKGRAPH_NPY_DIR={NPY_DIR}",
        "--conf", f"spark.executorEnv.LINKGRAPH_RANKS_DIR={RANKS_DIR}",
        str(REPO / "scripts" / "cluster_job.py"),
        str(N_VERTICES), str(AVG_DEG), str(SUPERSTEPS), str(N_PAGES),
        str(N_BLOCKS), STORE, mode, str(INTRA_HOST),
    ]
    proc = subprocess.run(cmd, env=ENV, capture_output=True, text=True,
                          cwd=str(REPO), timeout=timeout)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(proc.stdout[-2000:], file=sys.stderr)
    print(proc.stderr[-4000:], file=sys.stderr)
    raise SystemExit(f"submit cores.max={cores_max} produced no RESULT")


def main() -> None:
    subprocess.run(  # always repackage: a stale zip ships stale engine code
        [sys.executable, str(REPO / "scripts" / "make_package.py")], check=True
    )
    os.makedirs(ENV["SPARK_LOG_DIR"], exist_ok=True)
    master = spark_class(
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090",
    )
    time.sleep(6)
    worker = spark_class(
        "org.apache.spark.deploy.worker.Worker", MASTER,
        "--cores", "32", "--memory", "80g", "--webui-port", "8091",
    )
    time.sleep(6)
    try:
        # the store is deterministic in (N_VERTICES, AVG_DEG, N_BLOCKS,
        # seed); reuse it if present — delete STORE manually after
        # changing those params
        print("prep: building block store at full width ...", file=sys.stderr)
        prep = submit(32, mode="prep", timeout=5400)
        print(prep, file=sys.stderr)
        results = {}
        for cores_max in LEVELS:
            print(f"submitting cores.max={cores_max} ({LEVELS[cores_max]}) ...",
                  file=sys.stderr)
            results[cores_max] = submit(cores_max)
            print(results[cores_max], file=sys.stderr)
    finally:
        for p in (worker, master):
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except Exception:
                pass

    lo_cores, hi_cores = sorted(LEVELS)
    lo, hi = results[lo_cores], results[hi_cores]
    pr_eff = (hi["pagerank_edges_per_sec"] / lo["pagerank_edges_per_sec"]) / 4
    ex_eff = (hi["extract_pages_per_sec"] / lo["extract_pages_per_sec"]) / 4
    tail_n = SUPERSTEPS - SUPERSTEPS // 2

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors,
run via spark-submit --py-files on a multi-executor cluster at two cluster
sizes. Sandbox evidence: a REAL Spark standalone cluster on localhost
(separate master, worker, and executor JVMs), same deterministic input,
same executor shape (4 cores / {EXECUTOR_MEM}) at both levels — only the
executor count changes:

- N  = {LEVELS[lo_cores]} (spark.cores.max={lo_cores})
- 4N = {LEVELS[hi_cores]} (spark.cores.max={hi_cores})

Submitted with `spark-submit --master {MASTER} --py-files dist/linkgraph.zip
scripts/cluster_job.py` (the engine's shipping mechanism).

Input: synthetic power-law web graph, {N_VERTICES:,} vertices,
{lo['n_edges']:,} edges, {INTRA_HOST:.0%} intra-host links
(linkgraph.synthgraph, seed 42 — host locality per published Common-Crawl
measurements; host-clustered ids), compacted ONCE into a {N_BLOCKS}-block
range-blocked CSR store (linkgraph.pagerank_csr.build_blocked, prep run at
full width) that BOTH levels load — byte-identical input, so the timing
isolates superstep throughput; {N_PAGES:,} synthesized HTML pages for the
extraction path. PageRank runs the engine's scale path: blocked CSR with
packed-u32 edge words, per-host JIT-compiled native scatter-add kernel
(linkgraph.native), pre-scaled rank files, ONE barrier-scheduled job for
all supersteps with file-based rendezvous and work-stealing block claims
— bit-matched to the flat DataFrame path and networkx by
tests/test_pagerank_csr.py. Throughput = edges/sec per superstep at
steady state (median of the last {tail_n} of {SUPERSTEPS} supersteps;
early supersteps pay edge-sidecar decode + kernel compile + Python-worker
warmup).

| workload | metric | N | 4N | efficiency |
|---|---|---|---|---|
| PageRank superstep | edges/sec | {lo['pagerank_edges_per_sec']:,} | {hi['pagerank_edges_per_sec']:,} | {pr_eff:.2f} |
| PageRank superstep | sec/superstep | {lo['pagerank_sec_per_superstep']} | {hi['pagerank_sec_per_superstep']} | — |
| link extraction (pandas UDF) | pages/sec | {lo['extract_pages_per_sec']:,} | {hi['extract_pages_per_sec']:,} | {ex_eff:.2f} |

Per-superstep seconds, N: {lo['pagerank_steps']}
Per-superstep seconds, 4N: {hi['pagerank_steps']}

Method notes:
- Separate executor JVMs (not local[N] threads): a single shared heap
  makes memory-heavy stages anti-scale with thread count (GC and the
  block manager are shared); independent JVMs are the faithful analogue
  of adding cluster nodes.
- All executors share one machine, so memory bandwidth, L3, and the
  loopback network are still shared — a true 4N-node cluster adds those
  resources per node; these numbers are therefore a LOWER bound on real
  scaling. The 4N level deliberately uses half the box's 32 cores so the
  driver/OS do not confound the top level.
- Efficiency = (throughput_4N / throughput_N) / 4.

Raw: {json.dumps({str(k): v for k, v in results.items()})}
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
