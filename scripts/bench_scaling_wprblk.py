"""Blocked weighted-PageRank scaling evidence at N vs 4N.

Gates the weighted scatter-ADD kernel: fused gather-multiply-scatter-add
supersteps (linkgraph.wpagerank_csr.wpagerank_blocked +
native.scatter_addw32) over the SUM-collapsed weight sidecar — the scale
path behind graph_wpagerank2_blocked. Complements the weighted-SSSP gate
(scatter_minw32): with it, every kernel family in the engine has a
DIRECTLY measured N->4N number (scatter-add 1.06, scatter-min 0.93,
modal-vote 0.94, sorted-merge 0.98, weighted-min 0.93, weighted-add =
this gate).

Protocol identical to the CC/LP gates (scripts/bench_cluster.py): real
standalone cluster, CPU-pinned 1-core executors, byte-identical prebuilt
DIRECTED store + weight sidecar at both levels, per-superstep walls
recorded INSIDE one run (stats["step_secs"]); per-run throughput = stored
weighted edges/sec at the median of the last half of the supersteps.
Every repetition's two levels must agree on a raw-bits checksum of the
final rank vectors before the rep is persisted to
BENCH/wprblk_runs.jsonl (validate-then-checkpoint); a killed session
resumes from the completed prefix — delete the jsonl (or raise
BENCH_REPS) to measure fresh repetitions. The regenerated markdown
section REPLACES itself in place, bounded at the next '## ' header; the
round label comes from $BENCH_ROUND. Run with nothing else on the
machine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("BENCH_N_VERTICES", "8000000")
os.environ.setdefault("BENCH_AVG_DEG", "42")
os.environ.setdefault("BENCH_SUPERSTEPS", "6")  # bounded hop count
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by wprblk modes
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_REPS", "3")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-wprblk")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent
RUNS_FILE = REPO / "BENCH" / "wprblk_runs.jsonl"
ROUND = os.environ.get("BENCH_ROUND", "round 4")


def _load_runs() -> list[dict]:
    runs: list[dict] = []
    if RUNS_FILE.exists():
        for line in RUNS_FILE.read_text().splitlines():
            if not line.strip():
                continue
            raw = json.loads(line)
            runs.append({
                (int(k) if k.isdigit() else k): v for k, v in raw.items()
            })
    return runs


def _validate_rep(run: dict, lo_c: int, hi_c: int) -> None:
    """Cross-level agreement BEFORE the rep is persisted (the lpblk
    discipline): per-block rank vectors are pure functions of step
    inputs, so their raw-bits checksum must be identical at both levels
    regardless of scheduling."""
    lo, hi = run[lo_c], run[hi_c]
    assert lo["wpr_check"] == hi["wpr_check"], (
        f"levels disagree on final ranks: {lo['wpr_check']} vs "
        f"{hi['wpr_check']}")
    assert lo["n_edges"] == hi["n_edges"]


def main() -> None:
    lo_c, hi_c = sorted(bc.LEVELS)
    runs = _load_runs()
    if runs:
        print(f"resuming: {len(runs)} completed rep(s) in {RUNS_FILE}",
              file=sys.stderr)
    master = None
    workers = []
    try:
        if len(runs) < bc.REPS:  # only touch the cluster when measuring
            subprocess.run(
                [sys.executable, str(REPO / "scripts" / "make_package.py")],
                check=True,
            )
            os.makedirs(bc.ENV["SPARK_LOG_DIR"], exist_ok=True)
            master = bc.spark_class(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", "7077",
                "--webui-port", "8090",
                cpus=bc.CONTROL_CPUS,
            )
            time.sleep(6)
            # prep at full width through a temporary unpinned worker:
            # builds the directed store + weight sidecar AND decode-warms
            # the npy sidecars (prep runs one full-width superstep)
            prep_worker = bc.start_worker(32, "80g", 8099, cpus=None)
            time.sleep(6)
            print("prep: building/validating store + sum weight sidecar ...",
                  file=sys.stderr)
            prep_info = bc.submit(32, mode="prep-wprblk", timeout=7200,
                                  exec_cores=4, exec_mem="6g")
            print(prep_info, file=sys.stderr)
            bc._kill(prep_worker)
            time.sleep(4)

            workers = [
                bc.start_worker(bc.EXECUTOR_CORES, "8g", 8091 + i, cpus=cpus)
                for i, cpus in enumerate(bc.WORKER_CPU_SETS)
            ]
            time.sleep(6)
        for rep in range(len(runs), bc.REPS):
            run = {"rep": rep}
            for cores_max in sorted(bc.LEVELS):
                print(f"rep {rep}: cores.max={cores_max} "
                      f"({bc.LEVELS[cores_max]}) ...", file=sys.stderr)
                run[cores_max] = bc.submit(cores_max, mode="run-wprblk",
                                           timeout=5400)
                print(run[cores_max], file=sys.stderr)
            _validate_rep(run, lo_c, hi_c)
            runs.append(run)
            with open(RUNS_FILE, "a") as f:
                f.write(json.dumps(run) + "\n")
    finally:
        for p in workers + [master]:
            bc._kill(p)

    effs = [
        (r[hi_c]["wpr_edges_per_sec"] / r[lo_c]["wpr_edges_per_sec"]) / 4
        for r in runs
    ]
    med = statistics.median(effs)
    n_edges = runs[0][lo_c]["n_edges"]
    checks = {tuple(r[c]["wpr_check"]) for r in runs for c in (lo_c, hi_c)}
    assert len(checks) == 1, f"reps disagree on final ranks: {checks}"
    steps = runs[0][lo_c]["wpr_n_steps"]

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1} | {r[lo_c]['wpr_sec_per_superstep']} -> "
        f"{r[hi_c]['wpr_sec_per_superstep']} | {effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    section = f"""

## Weighted PageRank scaling — blocked store ({ROUND}, same protocol)

Same cluster, pinning, and level shape as the PageRank/CC/LP gates; the
workload is the weighted scatter-ADD kernel's scale path
(`linkgraph.wpagerank_csr.wpagerank_blocked` + `native.scatter_addw32`,
bit-matched to the flat pagerank_weighted by tests/test_wpagerank_csr.py
and the `graph_wpagerank2_blocked` oracle row): {steps} fixed weighted
supersteps — contrib = scaled_rank(src) * w fused in one C loop — over
the SUM-collapsed weight sidecar of the DIRECTED blocked store
({os.environ['BENCH_N_VERTICES']} vertices, {n_edges:,} weighted edges,
{os.environ['BENCH_N_BLOCKS']} blocks) — zero shuffle per superstep.
Per-superstep walls from INSIDE one run; per-run throughput = weighted
edges/sec at the median of the last half of the supersteps. Every
repetition's two levels agree on a raw-bits checksum of the final rank
vectors (per-block vectors are pure functions of step inputs, so they
are bit-identical across cluster sizes; validated before the rep is
persisted to BENCH/wprblk_runs.jsonl). With this gate every kernel
family in the engine carries a directly measured number: scatter-add
1.06, scatter-min 0.93, modal-vote 0.94, sorted-merge 0.98,
weighted-min 0.93, weighted-add below.

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| weighted PageRank superstep (blocked) | **{med:.2f}** | {[round(e, 2) for e in effs]} |

| run | WPR sec/superstep N -> 4N | eff |
|---|---|---|
{per_run_rows}

Reproduce: `python scripts/bench_scaling_wprblk.py` (env knobs at the
top of the script; BENCH/wprblk_runs.jsonl checkpoints completed reps —
delete it or raise BENCH_REPS to measure fresh ones; keep the machine
otherwise idle).
"""
    bc.replace_section(REPO / "BENCH" / "BASELINE.md",
                       "\n## Weighted PageRank scaling — blocked store",
                       section)
    print(section)


if __name__ == "__main__":
    main()
