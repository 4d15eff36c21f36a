"""Connected-components scaling evidence at two cluster sizes (N vs 4N).

The north rule names four algorithms (PageRank, connected components,
label propagation, triangle count); BENCH/BASELINE.md's gate evidences
PageRank supersteps and link extraction. This script extends the SAME
protocol (scripts/bench_cluster.py: real standalone cluster, CPU-pinned
1-core executors, byte-identical prebuilt store at both levels, per-run
additive-noise estimator) to the CC scale path —
linkgraph.components_csr.connected_components_blocked, min-label
scatter supersteps over a SYMMETRIZED blocked-CSR store. Each superstep
does the full scatter-min over all edges regardless of how many labels
still change, so sec/superstep is throughput exactly as for PageRank.

Reuses bench_cluster's master/worker/submit helpers; the CC graph is
sized independently (env below) so the PR store is untouched. APPENDS a
section to BENCH/BASELINE.md. Run with nothing else on the machine.
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

# CC-specific sizing: symmetrization doubles the stored edge count, so
# the default graph is half the PR bench's scale; override via env.
os.environ.setdefault("BENCH_N_VERTICES", "8000000")
os.environ.setdefault("BENCH_AVG_DEG", "42")
os.environ.setdefault("BENCH_SUPERSTEPS", "40")  # max_iter cap for CC
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by cc modes
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_REPS", "3")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-cc")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_package.py")], check=True
    )
    os.makedirs(bc.ENV["SPARK_LOG_DIR"], exist_ok=True)
    master = bc.spark_class(
        "org.apache.spark.deploy.master.Master",
        "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090",
        cpus=bc.CONTROL_CPUS,
    )
    time.sleep(6)

    runs: list[dict] = []
    prep_info = None
    try:
        # prep at full width through a temporary unpinned worker: builds
        # the symmetrized store AND decode-warms the npy sidecars (the CC
        # prep run executes the supersteps once at full width)
        prep_worker = bc.start_worker(32, "80g", 8099, cpus=None)
        time.sleep(6)
        print("prep: building/validating SYM block store ...", file=sys.stderr)
        prep_info = bc.submit(32, mode="prep-cc", timeout=7200,
                              exec_cores=4, exec_mem="6g")
        print(prep_info, file=sys.stderr)
        bc._kill(prep_worker)
        time.sleep(4)

        workers = [
            bc.start_worker(bc.EXECUTOR_CORES, "8g", 8091 + i, cpus=cpus)
            for i, cpus in enumerate(bc.WORKER_CPU_SETS)
        ]
        time.sleep(6)
        for rep in range(bc.REPS):
            run = {"rep": rep}
            for cores_max in sorted(bc.LEVELS):
                print(f"rep {rep}: cores.max={cores_max} "
                      f"({bc.LEVELS[cores_max]}) ...", file=sys.stderr)
                run[cores_max] = bc.submit(cores_max, mode="run-cc")
                print(run[cores_max], file=sys.stderr)
                import shutil

                shutil.rmtree(bc.RANKS_DIR, ignore_errors=True)
            runs.append(run)
        for w in workers:
            bc._kill(w)
    finally:
        for p in list(locals().get("workers", [])) + [master]:
            bc._kill(p)

    lo_c, hi_c = sorted(bc.LEVELS)
    effs = [
        (r[hi_c]["cc_edges_per_sec"] / r[lo_c]["cc_edges_per_sec"]) / 4
        for r in runs
    ]
    med = statistics.median(effs)
    n_edges = runs[0][lo_c]["n_edges"]
    n_comp = {r[c]["n_components"] for r in runs for c in (lo_c, hi_c)}
    assert len(n_comp) == 1, f"levels disagree on components: {n_comp}"
    steps = runs[0][lo_c]["cc_n_steps"]

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1} | {r[lo_c]['cc_sec_per_superstep']} -> "
        f"{r[hi_c]['cc_sec_per_superstep']} | {effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    section = f"""

## Connected-components scaling (round 3, same protocol)

Same cluster, pinning, estimator, and level shape as the PageRank gate
above; the workload is the CC scale path
(`linkgraph.components_csr.connected_components_blocked`): min-label
scatter supersteps over a SYMMETRIZED range-blocked CSR store
({os.environ['BENCH_N_VERTICES']} vertices, {n_edges:,} stored
(symmetrized) edges, {os.environ['BENCH_N_BLOCKS']} blocks, built once
at full width, decode-warmed in prep). Converges in {steps} supersteps;
per-run throughput = edges/sec at the median of the last half of the
supersteps; every run at BOTH levels agrees on the component count
({n_comp.pop():,}) — the levels compute the same answer, byte-identical
input.

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| CC min-label superstep | **{med:.2f}** | {[round(e, 2) for e in effs]} |

| run | CC sec/superstep N -> 4N | CC eff |
|---|---|---|
{per_run_rows}

Label propagation and triangle counting remain evidenced at sf0.1 by
bench.py only: their engine paths are ordinary shuffle-on-key DataFrame
jobs (no blocked store), and on THIS host a 1-core-executor level pair
mostly measures the shared memory-bandwidth ceiling for shuffle-heavy
plans rather than the engine (the round-1 flat-PageRank lesson). Their
per-superstep plans are the same shape as flat PageRank's, whose blocked
replacement is what the gate measures.
"""
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(section)
    print(section)


if __name__ == "__main__":
    main()
