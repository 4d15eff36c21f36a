"""Label-propagation + triangle-count scaling evidence at N vs 4N.

Completes the north rule's four named algorithms: BENCH/BASELINE.md
gates PageRank supersteps + link extraction, bench_scaling_cc.py adds
connected components; this script runs the SAME cluster protocol
(scripts/bench_cluster.py: real standalone cluster, CPU-pinned 1-core
executors, per-run additive-noise estimators) for the two flat
shuffle-on-key workloads:

- label propagation (linkgraph.labelprop.label_propagation): modal-label
  BSP supersteps, one join + two aggregations each. Supersteps are a
  lazy fused chain, so per-superstep cost is the MARGINAL wall between a
  1-iteration and a k-iteration run (Δwall/Δiters — cancels synth, the
  one-time edge-side repartition+persist, and warmup).
- triangle counting (linkgraph.triangles.triangle_total): degree-ordered
  oriented wedge join, one job, min of two passes.

Unlike the blocked-CSR workloads these exercise Spark's shuffle machinery
itself across executor JVMs — the fairest possible test of whether the
ENGINE's plans (map-side partial aggregation, static-side partitioning,
degree orientation) scale when executors are added. Both levels
regenerate the same deterministic graph (seed 42) and must agree on the
label checksum and triangle total — validated per repetition BEFORE the
rep is checkpointed to BENCH/lptri_runs.jsonl (a divergent rep is
reported and discarded, never persisted).

REPLACES (in place, bounded at the next '## ' header) its own section of
BENCH/BASELINE.md; the round label comes from $BENCH_ROUND (default
"round 3" — the committed lptri_runs.jsonl holds round-3 measurements).
A rerun with the checkpoint file present measures nothing new: it
resumes from the completed prefix and regenerates the section — delete
the jsonl (or raise BENCH_REPS) to collect fresh repetitions. Run with
nothing else on the machine.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

# flat shuffle jobs at 1 core are ~10-20x slower per edge than the
# blocked-CSR kernel: size the graph well below the CC bench's
os.environ.setdefault("BENCH_N_VERTICES", "1000000")
os.environ.setdefault("BENCH_AVG_DEG", "12")
os.environ.setdefault("BENCH_SUPERSTEPS", "6")  # lp k_hi; k_lo = 1
os.environ.setdefault("BENCH_N_PAGES", "1000")  # unused by run-lptri
os.environ.setdefault("BENCH_N_BLOCKS", "16")  # unused by run-lptri
os.environ.setdefault("BENCH_REPS", "3")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-lptri")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402  (reads the env above at import)

REPO = Path(__file__).resolve().parent.parent
# per-rep checkpoint: each completed repetition is appended here once both
# levels finish AND agree, so a killed session loses at most the rep in
# flight and a rerun resumes from the completed prefix.
RUNS_FILE = REPO / "BENCH" / "lptri_runs.jsonl"
ROUND = os.environ.get("BENCH_ROUND", "round 3")


def _validate_rep(run: dict, lo_c: int, hi_c: int) -> None:
    """Cross-level agreement BEFORE the rep is persisted (round-3 ADVICE:
    a divergent rep written to the jsonl re-fails every resume until the
    file is hand-edited)."""
    lo, hi = run[lo_c], run[hi_c]
    assert lo["lp_check"] == hi["lp_check"], (
        f"levels disagree on LP labels: {lo['lp_check']} vs {hi['lp_check']}")
    assert lo["n_triangles"] == hi["n_triangles"], (
        f"levels disagree on triangles: {lo['n_triangles']} vs "
        f"{hi['n_triangles']}")
    assert lo["n_edges"] == hi["n_edges"]


def _load_runs() -> list[dict]:
    runs: list[dict] = []
    if RUNS_FILE.exists():
        for line in RUNS_FILE.read_text().splitlines():
            if not line.strip():
                continue
            raw = json.loads(line)
            # JSON stringifies the integer level keys; restore them
            runs.append({
                (int(k) if k.isdigit() else k): v for k, v in raw.items()
            })
    return runs


def main() -> None:
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
                # the 1-core level runs LP (4 passes) + triangles (2 passes)
                # in one submit: ~3,300s clean, so 3600 leaves no headroom
                run[cores_max] = bc.submit(
                    cores_max, mode="run-lptri", timeout=5400, exec_mem="6g"
                )
                print(run[cores_max], file=sys.stderr)
            _validate_rep(run, *sorted(bc.LEVELS))
            runs.append(run)
            with open(RUNS_FILE, "a") as f:
                f.write(json.dumps(run) + "\n")
    finally:
        for p in workers + [master]:
            bc._kill(p)

    lo_c, hi_c = sorted(bc.LEVELS)
    lp_effs = [
        (r[hi_c]["lp_edges_per_sec"] / r[lo_c]["lp_edges_per_sec"]) / 4
        for r in runs
    ]
    tri_effs = [
        (r[hi_c]["tri_edges_per_sec"] / r[lo_c]["tri_edges_per_sec"]) / 4
        for r in runs
    ]
    checks = {tuple(r[c]["lp_check"]) for r in runs for c in (lo_c, hi_c)}
    tris = {r[c]["n_triangles"] for r in runs for c in (lo_c, hi_c)}
    assert len(checks) == 1, f"levels disagree on LP labels: {checks}"
    assert len(tris) == 1, f"levels disagree on triangle total: {tris}"
    n_edges = runs[0][lo_c]["n_edges"]

    per_run_rows = "\n".join(
        f"| {r['rep'] + 1}{'*' if r.get('note') else ''} | "
        f"{r[lo_c]['lp_sec_per_superstep']} -> "
        f"{r[hi_c]['lp_sec_per_superstep']} | {lp_effs[i]:.2f} "
        f"| {r[lo_c]['tri_sec']} -> {r[hi_c]['tri_sec']} "
        f"| {tri_effs[i]:.2f} |"
        for i, r in enumerate(runs)
    )
    # provenance notes carried in the checkpoint records surface as
    # footnotes (round-3 ADVICE: the evidence doc must show, not hide,
    # that a rep was reconstructed rather than freshly logged)
    footnotes = "\n".join(
        f"\\* rep {r['rep'] + 1}: {r['note']}" for r in runs if r.get("note")
    )
    section = f"""

## Label propagation + triangle counting scaling ({ROUND}, same protocol)

Same cluster, pinning, and level shape as the PageRank gate; the
workloads are the two FLAT shuffle-on-key paths the north rule names —
modal-label BSP label propagation (one join + two map-side-partial
aggregations per superstep) and degree-ordered oriented triangle
counting — over a deterministic power-law graph
({os.environ['BENCH_N_VERTICES']} vertices, {n_edges:,} directed edges,
seed 42) that both levels regenerate and persist before timing. These
exercise Spark's executor-to-executor shuffle itself, not the blocked
CSR kernel. LP per-superstep cost = marginal wall between a 1- and a
{os.environ['BENCH_SUPERSTEPS']}-iteration run (Δwall/Δiters, min of two
passes per point: cancels synth + one-time edge-side partition+persist +
warmup); triangles = min of two passes. Both levels agree on the label
checksum and the triangle total ({tris.pop():,}) in every repetition.

| workload | median N->4N efficiency | per-run values |
|---|---|---|
| LP superstep (edge traversals/sec) | **{statistics.median(lp_effs):.2f}** | {[round(e, 2) for e in lp_effs]} |
| triangle count (edges/sec) | **{statistics.median(tri_effs):.2f}** | {[round(e, 2) for e in tri_effs]} |

| run | LP sec/superstep N -> 4N | LP eff | tri sec N -> 4N | tri eff |
|---|---|---|---|---|
{per_run_rows}
{footnotes}
"""
    bc.replace_section(
        REPO / "BENCH" / "BASELINE.md",
        "\n## Label propagation + triangle counting scaling",
        section,
    )
    print(section)


if __name__ == "__main__":
    main()
