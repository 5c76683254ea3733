"""Raw hardware parallel-scaling probes — NO Spark.

Two ceilings, measured with a plain multiprocessing pool so no engine code
is in the loop:

- ``probe``: CPU ceiling — numpy image synthesis + encode, the same
  CPU-bound work the engine does. Virtualized hosts lose per-core
  throughput as more cores engage (turbo/frequency, shared memory
  bandwidth); no software can beat that.
- ``io_probe``: scan/write ceiling — each worker repeatedly reads its
  shard of page-cached files into FRESHLY allocated buffers (the
  alloc/free churn of any columnar reader) and writes back a fixed volume.
  On this sandbox VM, guest pages returned to the OS are re-materialized
  host-side at ~10-100 MB/s on next touch, so alloc-heavy read loops
  saturate far below memcpy speed and nearly stop scaling with cores.
  That saturation is a host property: engine scan efficiency must be read
  against this curve, not against an assumed-perfect 1.0.

Engine scaling efficiency should be graded against these ceilings: an
engine that scales as well as the best any software can do on this VM is
scaling perfectly.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from multiprocessing import Pool

_IMAGES = 48_000
_PER_TASK = 500


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _work(seed: int) -> int:
    import sys as _sys

    if _REPO_ROOT not in _sys.path:  # spawn-start pool workers
        _sys.path.insert(0, _REPO_ROOT)
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


# ---- decode ceiling: the MATCHED no-Spark workload for the engine's
# ---- decode-verify scaling leg — same codec, same blob distribution as
# ---- datagen, plain multiprocessing. Encode (above) costs ~10x more CPU
# ---- per byte than decode, so it is the wrong denominator for a decode
# ---- leg; grading decode-vs-encode would overstate efficiency whenever
# ---- the host throttles differentially.

_DECODE_TASKS = 768
_DECODE_CORPUS = 200  # blobs per worker corpus (~3 MB, built once/worker)
_decode_blobs: list[tuple[bytes, str]] | None = None


def _decode_corpus() -> list[tuple[bytes, str]]:
    global _decode_blobs
    if _decode_blobs is None:
        from moonlink_spark.functions.imagecodec import encode, synth_pixels

        blobs = []
        for i in range(_DECODE_CORPUS):
            w = 32 * (1 + i % 4)
            h = 32 * (1 + (i // 4) % 4)
            f = "png" if i % 2 == 0 else "jpeg"
            blobs.append((encode(synth_pixels(i, w, h), f), f))
        _decode_blobs = blobs
    return _decode_blobs


def _decode_work(_task: int) -> int:
    import sys as _sys

    if _REPO_ROOT not in _sys.path:
        _sys.path.insert(0, _REPO_ROOT)
    from moonlink_spark.functions.imagecodec import decode

    n = 0
    for data, fmt in _decode_corpus():
        px = decode(data, fmt)
        n += len(data) + int(px[0, 0, 0] == 1 << 30)  # keep px live
    return n


def decode_probe(nproc: int, min_secs: float = 12.0) -> float:
    """Compressed MB/s decoding across ``nproc`` processes. Work comes in
    fixed passes of _DECODE_TASKS corpus decodes (byte-identical per core
    count); passes repeat until the timed window is >= ``min_secs`` — this
    probe is the DENOMINATOR of a scaling gate, so its window must be long
    enough that the host's minute-scale throughput swings (observed: 2x
    within one run) cannot fabricate or mask engine efficiency."""
    tasks = list(range(_DECODE_TASKS))
    with Pool(nproc) as p:
        p.map(_decode_work, tasks[:nproc])  # warmup: imports + corpus build
        n = 0
        t0 = time.perf_counter()
        while True:
            n += sum(p.map(_decode_work, tasks))
            dt = time.perf_counter() - t0
            if dt >= min_secs:
                break
    return n / dt / 1e6


# ---- IO probe: fixed global volume split across workers, so every core
# ---- count does byte-identical work (same protocol as the engine bench).

_IO_FILES = 32
_IO_FILE_MB = 48
_IO_READ_REPS = 3
_IO_MIN_SECS = 12.0


def _io_setup(workdir: str) -> list[str]:
    """Write the read-leg input files once (untimed): incompressible-ish
    deterministic bytes, like the image payloads the engine scans. One
    random block is generated and reused for every file — the read leg
    measures page/alloc traffic, not content variety, and per-file fresh
    RNG allocation would itself stall on this VM's lazy page
    materialization."""
    import numpy as np

    block = np.random.default_rng(7).integers(
        0, 256, _IO_FILE_MB << 20, dtype=np.uint8
    ).tobytes()
    paths = []
    for i in range(_IO_FILES):
        p = os.path.join(workdir, f"io{i:03d}.bin")
        with open(p, "wb") as f:
            f.write(block)
        paths.append(p)
    return paths


def _io_read_work(args: tuple[list[str], int]) -> int:
    """Read each file into a FRESH buffer per pass (columnar-reader alloc
    churn) and fold a cheap checksum so the pages are actually touched."""
    paths, reps = args
    total = 0
    acc = 0
    for _ in range(reps):
        for p in paths:
            with open(p, "rb") as f:
                b = f.read()
            acc ^= b[0] ^ b[-1]
            total += len(b)
            del b
    return total


def _io_write_work(args: tuple[str, int, int]) -> int:
    """Write ``nbytes`` of fresh pages to ``path`` (the engine's flush leg)."""
    path, nbytes, seed = args
    chunk = bytes(bytearray(range(256)) * (1 << 14))  # 4 MiB
    written = 0
    with open(path, "wb") as f:
        while written < nbytes:
            f.write(chunk)
            written += len(chunk)
    return written


def io_probe(nproc: int, workdir: str | None = None) -> dict[str, float]:
    """Sustained read / write GB/s across ``nproc`` processes, fixed total
    volume (read: _IO_FILES x _IO_FILE_MB x _IO_READ_REPS; write: same as
    the read set). Returns {"read_gbps": ..., "write_gbps": ...}."""
    own = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="io_probe_")
    try:
        want = _IO_FILE_MB << 20
        paths = sorted(
            p for p in (os.path.join(workdir, f) for f in os.listdir(workdir))
            if os.path.basename(p).startswith("io")
            and p.endswith(".bin")
            and os.path.getsize(p) == want
        ) or _io_setup(workdir)
        shards = [paths[i::nproc] for i in range(nproc)]
        # Both legs are DENOMINATORS of scaling gates: repeat fixed passes
        # until the timed window is >= _IO_MIN_SECS, so this VM's
        # minute-scale throughput swings (observed: write probe 0.05->0.40
        # GB/s between sibling reps) average out instead of setting the
        # ceiling from a single lucky/unlucky pass.
        with Pool(nproc) as pool:
            pool.map(_io_read_work, [(s, 1) for s in shards])  # warmup
            n = 0
            t0 = time.perf_counter()
            while True:
                n += sum(pool.map(_io_read_work, [(s, _IO_READ_REPS) for s in shards]))
                dt = time.perf_counter() - t0
                if dt >= _IO_MIN_SECS:
                    break
            read_gbps = n / dt / 1e9

            # write leg: 1/4 of the read volume per pass — cold-page writes
            # run at ~10 MB/s on this VM, so a bigger pass would dominate
            # the probe's wall time without changing the measured rate
            per = (_IO_FILES * (_IO_FILE_MB << 20)) // (4 * nproc)
            wargs = [
                (os.path.join(workdir, f"w{i:03d}.bin"), per, i) for i in range(nproc)
            ]
            n = 0
            t0 = time.perf_counter()
            while True:
                n += sum(pool.map(_io_write_work, wargs))
                os.sync()
                dt = time.perf_counter() - t0
                if dt >= _IO_MIN_SECS:
                    break
            write_gbps = n / dt / 1e9
            for a in wargs:
                os.remove(a[0])
    finally:
        if own:
            shutil.rmtree(workdir, ignore_errors=True)
    return {"read_gbps": round(read_gbps, 3), "write_gbps": round(write_gbps, 3)}


IO_CACHE_DIR = os.path.join(tempfile.gettempdir(), "io_probe_cache")


if __name__ == "__main__":
    cores = [int(x) for x in (sys.argv[1:] or ["2", "8", "32"])]
    os.makedirs(IO_CACHE_DIR, exist_ok=True)
    for n in cores:
        io = io_probe(n, workdir=IO_CACHE_DIR)
        print(
            f"procs={n} read_gbps={io['read_gbps']} "
            f"write_gbps={io['write_gbps']}",
            flush=True,
        )
        print(f"procs={n} images_per_sec={probe(n):.0f}", flush=True)
