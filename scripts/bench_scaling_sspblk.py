"""Blocked weighted-SSSP scaling evidence at N vs 4N.

Gates the weighted scatter-min kernel family: bounded Bellman-Ford
relaxation supersteps over the blocked store's weight-aligned sidecar
(linkgraph.sssp.sssp_blocked + native.scatter_minw32) — the scale path
behind graph_sssp3_blocked / graph_voronoi3_blocked. Until this run the
coverage table inferred the weighted kernels' scaling from the unweighted
CC gate (same superstep shape); this measures it directly: the weighted
kernel streams 8B more per edge (the float64 cost array) than the
unweighted one, so its bandwidth profile deserves its own number.

Protocol identical to the CC/LP gates (scripts/bench_cluster.py): real
standalone cluster, CPU-pinned 1-core executors, byte-identical prebuilt
DIRECTED store + weight sidecar at both levels, per-superstep walls
recorded INSIDE one run (stats["step_secs"]); per-run throughput = stored
weighted edges/sec at the median of the last half of the supersteps.
Every repetition's two levels must agree on the per-step reached counts
AND a final-distance checksum before the rep is persisted to
BENCH/sspblk_runs.jsonl (validate-then-checkpoint); a killed session
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
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by sspblk modes
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_REPS", "3")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-sspblk")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent
RUNS_FILE = REPO / "BENCH" / "sspblk_runs.jsonl"
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
    discipline): per-block relaxation is a pure function of step inputs,
    so reached counts and the final-distance checksum must be identical
    at both levels regardless of scheduling."""
    lo, hi = run[lo_c], run[hi_c]
    assert lo["ssp_check"] == hi["ssp_check"], (
        f"levels disagree on final distances: {lo['ssp_check']} vs "
        f"{hi['ssp_check']}")
    assert lo["ssp_reached"] == hi["ssp_reached"], (
        f"levels disagree on per-step reached counts: "
        f"{lo['ssp_reached']} vs {hi['ssp_reached']}")
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
            print("prep: building/validating store + weight sidecar ...",
                  file=sys.stderr)
            prep_info = bc.submit(32, mode="prep-sspblk", timeout=7200,
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
                run[cores_max] = bc.submit(cores_max, mode="run-sspblk",
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
        (r[hi_c]["ssp_edges_per_sec"] / r[lo_c]["ssp_edges_per_sec"]) / 4
        for r in runs
    ]
    med = statistics.median(effs)
    n_edges = runs[0][lo_c]["n_edges"]
    checks = {tuple(r[c]["ssp_check"]) for r in runs for c in (lo_c, hi_c)}
    assert len(checks) == 1, f"reps disagree on final distances: {checks}"
    steps = runs[0][lo_c]["ssp_n_steps"]

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1} | {r[lo_c]['ssp_sec_per_superstep']} -> "
        f"{r[hi_c]['ssp_sec_per_superstep']} | {effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    section = f"""

## Weighted SSSP scaling — blocked store ({ROUND}, same protocol)

Same cluster, pinning, and level shape as the PageRank/CC/LP gates; the
workload is the weighted scatter-min kernel family's scale path
(`linkgraph.sssp.sssp_blocked` + `native.scatter_minw32`, bit-identical
to the flat Bellman-Ford by tests/test_sssp.py and the
`graph_sssp3_blocked` oracle row; `graph_voronoi3_blocked` rides the
same kernel): {steps} bounded relaxation supersteps over the DIRECTED
blocked store's weight-aligned sidecar
({os.environ['BENCH_N_VERTICES']} vertices, {n_edges:,} weighted edges,
{os.environ['BENCH_N_BLOCKS']} blocks, seeds = ids % 1009 == 0) — zero
shuffle per superstep; the weighted kernel streams the extra float64
cost array (8B/edge more than the CC gate's unweighted scatter-min).
Per-superstep walls from INSIDE one run; per-run throughput = weighted
edges/sec at the median of the last half of the supersteps. Every
repetition's two levels agree on per-step reached counts AND the
final-distance checksum (validated before the rep is persisted to
BENCH/sspblk_runs.jsonl).

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| weighted SSSP relaxation (blocked) | **{med:.2f}** | {[round(e, 2) for e in effs]} |

| run | SSSP sec/superstep N -> 4N | eff |
|---|---|---|
{per_run_rows}

Reproduce: `python scripts/bench_scaling_sspblk.py` (env knobs at the
top of the script; BENCH/sspblk_runs.jsonl checkpoints completed reps —
delete it or raise BENCH_REPS to measure fresh ones; keep the machine
otherwise idle).
"""
    bc.replace_section(REPO / "BENCH" / "BASELINE.md",
                       "\n## Weighted SSSP scaling — blocked store",
                       section)
    print(section)


if __name__ == "__main__":
    main()
