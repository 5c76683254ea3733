"""Deterministic image codecs — pure numpy + stdlib zlib (no PIL in sandbox).

Two formats, matching FIXTURES.md F1:

- ``png``  — a real, spec-compliant PNG encoder/decoder (8-bit RGB, filter 0,
  zlib). Lossless → exact pixel equality checks.
- ``jpeg`` — the container has no JPEG library, so the lossy path is a
  clearly-marked DETERMINISTIC FAKE (``QJPG``): uniform quantization (step 4)
  + zlib. Quantization error is uniform in [-2,2] → PSNR ≈ 47 dB, which
  exercises the "PSNR >= 40 dB for lossy fmt" oracle from BASELINE.json
  input_hint. The Spark-side plumbing (binary column, Arrow batch transfer,
  pandas-UDF signatures) is identical to what a real JPEG codec would use —
  swap ``_qjpg_*`` for PIL/turbojpeg calls on a real cluster.

All functions operate on numpy arrays / iterate within an Arrow batch —
they are only ever called inside pandas UDFs / mapInPandas (no per-row
Python at the Spark API layer, per BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"
_QSTEP = 4


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """pixels: uint8 array (h, w, 3) → PNG bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    off = 8
    w = h = None
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, color = struct.unpack(">IIBB", body[:10])
            assert bit == 8 and color == 2, "codec only handles 8-bit RGB"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filt = raw[:, 0]
    assert (filt == 0).all(), "codec only emits filter 0"
    return raw[:, 1:].reshape(h, w, 3).copy()


def qjpg_encode(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    q = (pixels // _QSTEP).astype(np.uint8)
    return (
        _QJPG_MAGIC
        + struct.pack(">IIB", w, h, _QSTEP)
        + zlib.compress(q.tobytes(), 6)
    )


def qjpg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _QJPG_MAGIC, "not a QJPG"
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * step + step // 2, 255).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return png_encode(pixels) if fmt == "png" else qjpg_encode(pixels)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return png_decode(data) if fmt == "png" else qjpg_decode(data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic tiny image for row index i (FIXTURES.md F1): RGB
    gradient + per-i noise from np.random.default_rng(42 + i)."""
    rng = np.random.default_rng(42 + i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)
