"""Blocked-store triangle-count scaling evidence at N vs 4N.

Round 3 gated the FLAT wedge-join triangle path and it passed at median
0.90 — but with 0.83-1.11 rep variance and 8-13 minute walls at only
45.7M edges (every rep re-runs two |E|-scale shuffle joins twice per
level). This script gates the blocked replacement —
linkgraph.triangles_csr.triangle_total_blocked: one map-only stage of
native sorted-merge adjacency intersections over a prebuilt oriented-CSR
store, zero shuffle — at the same protocol as the other block-store
gates: real standalone cluster, CPU-pinned 1-core executors, byte-
identical prebuilt store at both levels, adjacency sidecars decode-warmed
once at full width. The workload is ONE pass (not iterative), so the
estimator is simply the count-job wall: two passes per level, min
(contention noise on a shared host is strictly additive).

REPLACES (in place, bounded at the next '## ' header) its own section of
BENCH/BASELINE.md; the round label comes from $BENCH_ROUND. Each
completed repetition is validated (both levels must report the identical
triangle total) BEFORE being checkpointed to BENCH/triblk_runs.jsonl, so
a killed session resumes from the completed prefix — delete the jsonl
(or raise BENCH_REPS) to measure fresh repetitions. Run with nothing
else on the machine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

# the merge kernel streams ~2x the stored pair set per count (both
# endpoint adjacency lists), far cheaper per edge than LP's modal vote:
# same graph shape as the LP/CC gates
os.environ.setdefault("BENCH_N_VERTICES", "8000000")
os.environ.setdefault("BENCH_AVG_DEG", "42")
os.environ.setdefault("BENCH_SUPERSTEPS", "2")  # unused by triblk modes
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by triblk modes
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_REPS", "3")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-triblk")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent
RUNS_FILE = REPO / "BENCH" / "triblk_runs.jsonl"
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
    """Cross-level agreement BEFORE the rep is persisted (round-3 ADVICE:
    a persisted divergent rep re-fails every resume until hand-edited)."""
    lo, hi = run[lo_c], run[hi_c]
    assert lo["n_triangles"] == hi["n_triangles"], (
        f"levels disagree on triangle total: {lo['n_triangles']} vs "
        f"{hi['n_triangles']}")
    assert lo["n_pairs"] == hi["n_pairs"]


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
            # builds the oriented store AND decode-warms the adjacency
            # sidecars (prep runs one full-width count)
            prep_worker = bc.start_worker(32, "80g", 8099, cpus=None)
            time.sleep(6)
            print("prep: building/validating oriented tri store ...",
                  file=sys.stderr)
            prep_info = bc.submit(32, mode="prep-triblk", timeout=7200,
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
                run[cores_max] = bc.submit(cores_max, mode="run-triblk",
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
        (r[hi_c]["tri_pairs_per_sec"] / r[lo_c]["tri_pairs_per_sec"]) / 4
        for r in runs
    ]
    med = statistics.median(effs)
    n_pairs = runs[0][lo_c]["n_pairs"]
    totals = {r[c]["n_triangles"] for r in runs for c in (lo_c, hi_c)}
    assert len(totals) == 1, f"reps disagree on triangle total: {totals}"

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1} | {r[lo_c]['tri_sec']} -> {r[hi_c]['tri_sec']} "
        f"| {effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    section = f"""

## Triangle-count scaling — blocked store ({ROUND}, same protocol)

Same cluster, pinning, and level shape as the PageRank/CC/LP gates; the
workload is the blocked triangle path
(`linkgraph.triangles_csr.triangle_total_blocked`, per-vertex counts
bit-identical to the flat wedge join by tests/test_triangles_csr.py and
the `graph_triangles_blocked` oracle row): ONE map-only stage of native
sorted-merge intersections over a per-block oriented-CSR store built
ONCE at full width ({os.environ['BENCH_N_VERTICES']} vertices,
{n_pairs:,} stored oriented pairs, {os.environ['BENCH_N_BLOCKS']}
blocks, triangle total {runs[0][lo_c]['n_triangles']:,}) — zero shuffle;
the only cross-task traffic is B scalar rows. This is the scale-path
counterpart of the flat-path gate (which passed at 0.90 median but with
0.83-1.11 rep variance and 8-13 min walls at 45.7M edges; the blocked
walls below are on a {n_pairs / 45_700_000:.0f}x larger pair set). The
workload is one pass, so the estimator is the count-job wall (two passes
per level, min); both levels must report the identical triangle total
before a rep is persisted.

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| triangle count (blocked, one map stage) | **{med:.2f}** | {[round(e, 2) for e in effs]} |

| run | count wall N -> 4N (s) | eff |
|---|---|---|
{per_run_rows}

Reproduce: `python scripts/bench_scaling_triblk.py` (env knobs at the
top of the script; BENCH/triblk_runs.jsonl checkpoints completed reps —
delete it or raise BENCH_REPS to measure fresh ones; keep the machine
otherwise idle).
"""
    bc.replace_section(REPO / "BENCH" / "BASELINE.md",
                       "\n## Triangle-count scaling — blocked store",
                       section)
    print(section)


if __name__ == "__main__":
    main()
