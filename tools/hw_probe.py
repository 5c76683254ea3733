"""Raw-CPU parallel-scaling probe — NO Spark.

Measures how well this machine itself scales the CPU-bound work the engine
does (numpy image synthesis + encode) via a plain multiprocessing pool.
Virtualized hosts commonly lose per-core throughput as more cores engage
(turbo/frequency scaling, shared memory bandwidth); that loss is a hardware
ceiling no software can beat, so engine scaling efficiency should be read
against this number, not against an assumed-perfect 1.0.
"""

from __future__ import annotations

import sys
import time
from multiprocessing import Pool

_IMAGES = 48_000
_PER_TASK = 500


def _work(seed: int) -> int:
    from moonlink_spark.functions.imagecodec import encode, synth_pixels

    n = 0
    for i in range(seed * _PER_TASK, seed * _PER_TASK + _PER_TASK):
        b = encode(synth_pixels(i, 64, 64), "jpeg" if i % 2 else "png")
        n += len(b)
    return n


def probe(nproc: int) -> float:
    """Images/sec encoding _IMAGES images across ``nproc`` processes."""
    tasks = list(range(_IMAGES // _PER_TASK))
    with Pool(nproc) as p:
        p.map(_work, tasks[:nproc])  # warmup (imports, allocator)
        t0 = time.perf_counter()
        p.map(_work, tasks)
        dt = time.perf_counter() - t0
    return _IMAGES / dt


if __name__ == "__main__":
    for n in [int(x) for x in (sys.argv[1:] or ["2", "8", "32"])]:
        print(f"procs={n} images_per_sec={probe(n):.0f}")
