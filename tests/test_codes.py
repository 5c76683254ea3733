import numpy as np

from moonlink_spark.functions.codes import (
    hilbert_index,
    morton_interleave,
    normalize_to_bits,
    sfc_code,
)


def test_normalize_monotone():
    x = np.array([-100, 0, 5, 10**12], dtype=np.int64)
    out = normalize_to_bits(x, -100, 10**12, 21)
    assert (np.diff(out.astype(np.int64)) >= 0).all()
    assert out.max() < (1 << 21)


def test_morton_2d_known():
    # x most significant within each bit pair: (1,0)->0b10=2; (1,1)->3;
    # (2,3): pos3=x1=1, pos2=y1=1, pos1=x0=0, pos0=y0=1 -> 0b1101=13
    x = np.array([0, 1, 1, 2], dtype=np.uint64)
    y = np.array([0, 0, 1, 3], dtype=np.uint64)
    out = morton_interleave([x, y], bits=2)
    assert out.tolist() == [0, 2, 3, 13]


def test_hilbert_is_permutation():
    bits = 4
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    idx = hilbert_index([xs.ravel(), ys.ravel()], bits)
    assert sorted(idx.tolist()) == list(range(n * n))


def test_hilbert_locality():
    # consecutive hilbert indices must be grid-adjacent (curve property)
    bits = 4
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    idx = hilbert_index([xs.ravel(), ys.ravel()], bits)
    order = np.argsort(idx)
    px, py = xs.ravel()[order].astype(int), ys.ravel()[order].astype(int)
    step = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (step == 1).all()


def test_sfc_code_deterministic_and_nonneg():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**62, 1000)
    b = rng.integers(0, 128, 1000)
    c = rng.integers(0, 128, 1000)
    bounds = [(0, 2**62), (0, 127), (0, 127)]
    for strat in ("zorder", "hilbert"):
        c1 = sfc_code([a, b, c], bounds, strat)
        c2 = sfc_code([a, b, c], bounds, strat)
        assert (c1 == c2).all()
        assert (c1 >= 0).all()
    assert not (sfc_code([a, b, c], bounds, "zorder") == sfc_code([a, b, c], bounds, "hilbert")).all()
