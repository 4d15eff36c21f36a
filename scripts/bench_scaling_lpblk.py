"""Blocked-CSR label propagation scaling evidence at N vs 4N.

Round 3 gated flat LP (join+agg supersteps) and it failed at median 0.40:
the flat path shuffles |E| vote rows per superstep through executor-to-
executor exchange, and its Δwall/Δiters estimator differenced two runs
whose base wall swung 404->634s. This script gates the REPLACEMENT scale
path — linkgraph.labelprop_csr.label_propagation_blocked: modal-vote
native-kernel supersteps over a blocked-CSR store built from the DISTINCT
symmetric closure, zero shuffle per superstep — with per-superstep walls
recorded INSIDE one run (stats["step_secs"], same estimator as the CC
gate). Protocol otherwise identical to scripts/bench_cluster.py: real
standalone cluster, CPU-pinned 1-core executors, byte-identical prebuilt
store at both levels.

REPLACES (in place) the markdown section between its own header and the
next '## ' header in BENCH/BASELINE.md; the round label comes from
$BENCH_ROUND. Each completed repetition is checkpointed to
BENCH/lpblk_runs.jsonl AFTER its two levels are validated against each
other (label checksum + per-superstep changed counts must agree), so a
killed session resumes from the completed prefix — delete the jsonl (or
raise BENCH_REPS) to measure fresh repetitions. Run with nothing else on
the machine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

# modal vote materializes every incoming label per superstep (no streaming
# combiner exists for a mode), so per-edge cost is several x CC's
# scatter-min: same graph shape as the CC gate, fewer supersteps
os.environ.setdefault("BENCH_N_VERTICES", "8000000")
os.environ.setdefault("BENCH_AVG_DEG", "42")
os.environ.setdefault("BENCH_SUPERSTEPS", "8")
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by lpblk modes
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_REPS", "4")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-lpblk")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent
RUNS_FILE = REPO / "BENCH" / "lpblk_runs.jsonl"
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
    """Cross-level agreement gate BEFORE the rep is persisted: a divergent
    rep must fail loudly here, not poison the checkpoint file (round-3
    ADVICE: a persisted bad rep re-fails every resume until hand-edited).
    Labels live in dense-rank space at both levels, so the checksum and
    the per-superstep changed counts must be identical."""
    lo, hi = run[lo_c], run[hi_c]
    assert lo["lp_check"] == hi["lp_check"], (
        f"levels disagree on final labels: {lo['lp_check']} vs "
        f"{hi['lp_check']}")
    assert lo["lp_changed"] == hi["lp_changed"], (
        f"levels disagree on per-superstep changed counts: "
        f"{lo['lp_changed']} vs {hi['lp_changed']}")
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
            # builds the undirected store AND decode-warms the npy
            # sidecars (prep runs one full-width superstep)
            prep_worker = bc.start_worker(32, "80g", 8099, cpus=None)
            time.sleep(6)
            print("prep: building/validating UND block store ...",
                  file=sys.stderr)
            prep_info = bc.submit(32, mode="prep-lpblk", timeout=7200,
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
                run[cores_max] = bc.submit(cores_max, mode="run-lpblk",
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
        (r[hi_c]["lp_edges_per_sec"] / r[lo_c]["lp_edges_per_sec"]) / 4
        for r in runs
    ]
    med = statistics.median(effs)
    n_edges = runs[0][lo_c]["n_edges"]
    checks = {tuple(r[c]["lp_check"]) for r in runs for c in (lo_c, hi_c)}
    assert len(checks) == 1, f"reps disagree on final labels: {checks}"
    steps = runs[0][lo_c]["lp_n_steps"]

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1} | {r[lo_c]['lp_sec_per_superstep']} -> "
        f"{r[hi_c]['lp_sec_per_superstep']} | {effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    section = f"""

## Label propagation scaling — blocked store ({ROUND}, same protocol)

Same cluster, pinning, and level shape as the PageRank gate; the workload
is LP's scale path (`linkgraph.labelprop_csr.label_propagation_blocked`,
bit-identical to the flat join+agg path by tests/test_labelprop_csr.py
and the `graph_labelprop_blocked` oracle row): modal-vote native-kernel
supersteps over a blocked-CSR store built ONCE at full width from the
DISTINCT symmetric closure ({os.environ['BENCH_N_VERTICES']} vertices,
{n_edges:,} stored undirected edges, {os.environ['BENCH_N_BLOCKS']}
blocks) — zero shuffle per superstep. This replaces the flat-path LP gate
(previous section), which failed at median 0.40 for the two reasons
diagnosed there: per-superstep |E|-row exchange contending on shared
memory bandwidth, and a Δwall-between-runs estimator whose 1-iteration
base wall swung 404->634s. Both are fixed structurally here: no exchange,
and per-superstep walls are recorded INSIDE one run
(stats["step_secs"], the CC gate's estimator); per-run throughput =
stored edges/sec at the median of the last half of {steps} supersteps.
Every repetition's two levels agree on the final-label checksum AND the
per-superstep changed-label counts (validated before the rep is
persisted to BENCH/lpblk_runs.jsonl).

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| LP modal-vote superstep (blocked) | **{med:.2f}** | {[round(e, 2) for e in effs]} |

| run | LP sec/superstep N -> 4N | LP eff |
|---|---|---|
{per_run_rows}

Reproduce: `python scripts/bench_scaling_lpblk.py` (env knobs at the top
of the script; BENCH/lpblk_runs.jsonl checkpoints completed reps — delete
it or raise BENCH_REPS to measure fresh ones; keep the machine otherwise
idle).
"""
    bc.replace_section(REPO / "BENCH" / "BASELINE.md",
                       "\n## Label propagation scaling — blocked store",
                       section)
    print(section)


if __name__ == "__main__":
    main()
