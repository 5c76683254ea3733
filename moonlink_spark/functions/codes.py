"""Space-filling-curve codes: Morton (Z-order) and Hilbert — vectorized numpy.

No moonlink counterpart (the reference delegates layout to flush order);
required by the north rule for clustering the image table on (phash, w, h) so
per-file min/max manifest stats become tight and scans prune.

Hilbert uses the public Skilling transform ("Programming the Hilbert curve",
J. Skilling, AIP Conf. Proc. 707, 2004) — the same algorithm behind
Iceberg's/DataBricks' Hilbert clustering — vectorized over numpy arrays.

Everything here is called inside pandas UDFs (Arrow-batched); the per-batch
work is pure numpy bit arithmetic, no per-row Python.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_to_bits(x: np.ndarray, lo: int, hi: int, bits: int) -> np.ndarray:
    """Map int64 values in [lo, hi] onto [0, 2^bits) monotonically, integer-only
    (right-shift by the excess range bits — no float precision loss)."""
    span = max(int(hi) - int(lo), 0)
    x = (x.astype(np.int64) - np.int64(lo)).astype(np.uint64)
    shift = max(0, span.bit_length() - bits)
    return (x >> np.uint64(shift)).astype(np.uint64)


def morton_interleave(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Bit-interleave k normalized uint64 columns → Z-order code (uint64).
    col 0 contributes the most-significant bit of each group."""
    k = len(cols)
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = (c >> np.uint64(b)) & np.uint64(1)
            out |= bit << np.uint64(b * k + (k - 1 - i))
    return out


def hilbert_index(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Skilling AxestoTranspose, vectorized, then bit-interleave → Hilbert
    distance (uint64). ``cols`` must already be normalized to [0, 2^bits)."""
    n = len(cols)
    X = [c.astype(np.uint64).copy() for c in cols]
    M = np.uint64(1 << (bits - 1))
    # inverse undo
    Q = int(M)
    while Q > 1:
        P = np.uint64(Q - 1)
        Qu = np.uint64(Q)
        for i in range(n):
            hi = (X[i] & Qu) != 0
            # where bit set: invert low bits of X[0]; else exchange low bits
            t = (X[0] ^ X[i]) & P
            X[0] = np.where(hi, X[0] ^ P, X[0] ^ t)
            X[i] = np.where(hi, X[i], X[i] ^ t)
        Q >>= 1
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = int(M)
    while Q > 1:
        Qu = np.uint64(Q)
        t = np.where((X[n - 1] & Qu) != 0, t ^ np.uint64(Q - 1), t)
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    return morton_interleave(X, bits)


def zorder_expr(
    cols: list[Column],
    bounds: list[tuple[int, int]],
    total_bits: int = 63,
) -> Column:
    """Morton Z-order as a PURE built-in column expression (shift/and/or
    terms) — stays inside whole-stage codegen, no Python anywhere.

    Bit-identical to ``sfc_code(..., "zorder")``: same normalize (subtract
    lo, right-shift excess range bits) and same interleave (col 0 takes the
    most-significant bit of each group). This is the preferred clustering
    path; the numpy version remains for Hilbert (whose state machine does
    not reduce to a flat bitwise expression).
    """
    k = len(cols)
    bits = max(1, total_bits // k)
    terms: list[Column] = []
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        span = max(int(hi) - int(lo), 0)
        shift = max(0, span.bit_length() - bits)
        nc = F.shiftrightunsigned((c.cast("long") - F.lit(int(lo))), shift)
        for b in range(bits):
            bit = F.shiftrightunsigned(nc, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * k + (k - 1 - i)))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).cast("long")


def sfc_code(
    arrays: list[np.ndarray],
    bounds: list[tuple[int, int]],
    strategy: str = "zorder",
    total_bits: int = 63,
) -> np.ndarray:
    """Compose normalize + curve; returns int64 (non-negative) codes."""
    k = len(arrays)
    bits = max(1, total_bits // k)
    norm = [
        normalize_to_bits(np.asarray(a), lo, hi, bits)
        for a, (lo, hi) in zip(arrays, bounds)
    ]
    code = (
        hilbert_index(norm, bits) if strategy == "hilbert" else morton_interleave(norm, bits)
    )
    return code.astype(np.int64)
