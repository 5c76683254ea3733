"""Run ONE additional scaling repetition (same fixed workload as
``bench.py --scaling``: rows=120000, cdc=180000 x3 batches, k-replicated
scan regions) and dump its raw JSON — used to append re-check reps to
BENCH/BASELINE.md without overwriting the existing evidence. Layout knobs
are pinned to the values every prior rep used, so the numbers are
comparable rep-for-rep."""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    cores = [int(c) for c in os.environ.get("SPARK_GRAFT_SCALE", "8,32").split(",")]
    hw = bench.hw_probe(cores)
    io = bench.io_ceiling_probe(cores)
    results = {}
    for cpus in cores:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            MOONLINK_BENCH_ROWS=os.environ.get("MOONLINK_SCALE_ROWS", "120000"),
            MOONLINK_BENCH_CDC=os.environ.get("MOONLINK_SCALE_CDC", "180000"),
            MOONLINK_BENCH_BATCHES="3",
            MOONLINK_BENCH_SCAN_REPS="2",
            MOONLINK_SCAN_K_PRE=os.environ.get("MOONLINK_SCAN_K_PRE", "9"),
            MOONLINK_SCAN_K_POST=os.environ.get("MOONLINK_SCAN_K_POST", "32"),
            MOONLINK_SCAN_K_CPU=os.environ.get("MOONLINK_SCAN_K_CPU", "8"),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py"),
             "--engine-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps({
        "results": {str(k): v for k, v in results.items()},
        "hw_probe": {str(k): v for k, v in hw.items()},
        "io_probe": {str(k): v for k, v in io.items()},
    }))


if __name__ == "__main__":
    main()
