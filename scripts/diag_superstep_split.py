"""One-off per-superstep kernel-vs-coordination split at N and 4N.

Round-3 verdict #8: the PageRank gate's 1.06 median efficiency needs the
single-slot serialization overhead at the N level quantified, so >1.0
can't be read as a soft-baseline artifact. This runs the SAME pinned
cluster protocol as the gates on the (already-built) blocked LP store —
the same store + superstep shape as PageRank's — for a few supersteps at
cores.max=1 and 4, with the in-task per-block kernel seconds recorded by
linkgraph.labelprop_csr (load + gather + modal-vote + write, summed
across tasks). The split per superstep:

    coordination_wall = superstep_wall - kernel_core_secs / slots

i.e. everything that is NOT per-block work: task dispatch, arrow
round-trips, the changed-count reduce, scheduler latency — the part that
the single-slot level serializes and the 4-slot level overlaps.

Prints a small JSON per level; paste-ready rows for the BASELINE.md
hygiene note. Does NOT touch lpblk_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("BENCH_N_VERTICES", "8000000")
os.environ.setdefault("BENCH_AVG_DEG", "42")
os.environ["BENCH_SUPERSTEPS"] = os.environ.get("DIAG_SUPERSTEPS", "3")
os.environ.setdefault("BENCH_N_PAGES", "1000")
os.environ.setdefault("BENCH_N_BLOCKS", "256")
os.environ.setdefault("BENCH_STORE", "/tmp/linkgraph-cluster-store-lpblk")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_cluster as bc  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_package.py")],
        check=True,
    )
    os.makedirs(bc.ENV["SPARK_LOG_DIR"], exist_ok=True)
    master = None
    workers = []
    out = {}
    try:
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
        for cores_max in sorted(bc.LEVELS):
            print(f"diag: cores.max={cores_max} ...", file=sys.stderr)
            r = bc.submit(cores_max, mode="run-lpblk", timeout=5400)
            walls = r["lp_steps"]
            kerns = r["lp_kernel_secs"]
            coords = [
                round(w - k / cores_max, 3) for w, k in zip(walls, kerns)
            ]
            out[cores_max] = {
                "walls": walls,
                "kernel_core_secs": kerns,
                "coordination_walls": coords,
            }
            print(json.dumps({str(cores_max): out[cores_max]}))
    finally:
        for p in workers + [master]:
            bc._kill(p)
    print("DIAG " + json.dumps(out))


if __name__ == "__main__":
    main()
