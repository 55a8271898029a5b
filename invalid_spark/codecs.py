"""Image codecs for the validation engine's pixel invariants.

The sandbox has no PIL/libjpeg, so:

- **PNG is real**: a minimal, deterministic, pure-numpy PNG encoder +
  decoder (8-bit RGB, filter 0, zlib level 6). Lossless round-trip is
  exact, so the ``allclose`` invariant for lossless formats is tested
  against a genuine codec. Public format per the PNG spec (RFC 2083).
- **Lossy formats are a deterministic STAND-IN**: ``FAKE_LOSSY_MAGIC``
  + PNG of quantized pixels (quantization step 4). Decoding returns
  the quantized pixels; PSNR vs the original is ~48 dB — above the
  40 dB gate — with real PSNR math. In production this dispatch point
  is where libjpeg-turbo/Pillow plugs in; the Spark-side plumbing
  (binary column → Arrow batch → decode → metric) is identical.

Also implements a deterministic 64-bit perceptual hash (pHash:
mean-pool to 32×32 gray → DCT-II → top-left 8×8 AC coefficients →
median threshold), the classic public algorithm.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_LOSSY_MAGIC = b"FLSY"  # deterministic lossy stand-in (see module doc)
LOSSY_QUANT_STEP = 4

__all__ = [
    "encode_png",
    "decode_png",
    "encode_image",
    "decode_image",
    "psnr",
    "phash64",
    "DecodeError",
]


class DecodeError(ValueError):
    """Raised for corrupt/truncated image bytes."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (color type 2, filter 0)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png` (8-bit RGB, filters
    0-2 supported). Raises :class:`DecodeError` on corruption."""
    if not data.startswith(PNG_SIG):
        raise DecodeError("bad PNG signature")
    pos = len(PNG_SIG)
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise DecodeError("truncated chunk")
        crc = data[pos + 8 + ln : pos + 12 + ln]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
            zlib.crc32(tag + body) & 0xFFFFFFFF
        ):
            raise DecodeError("bad CRC")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise DecodeError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise DecodeError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise DecodeError(f"inflate failed: {e}") from e
    stride = w * 3 + 1
    if len(raw) != h * stride:
        raise DecodeError("bad scanline length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters, px = rows[:, 0], rows[:, 1:].copy()
    if (filters > 2).any():
        raise DecodeError("unsupported PNG filter")
    out = np.zeros_like(px)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        line = px[y]
        f = filters[y]
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        else:  # f == 1, Sub
            cur = line.copy()
            cur_i = cur.astype(np.int16)
            for x in range(3, w * 3):
                cur_i[x] = (cur_i[x] + cur_i[x - 3]) & 0xFF
            cur = cur_i.astype(np.uint8)
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode pixels in the named format. ``png`` is a real PNG;
    every other fmt uses the deterministic lossy stand-in."""
    if fmt == "png":
        return encode_png(arr)
    q = LOSSY_QUANT_STEP
    quant = ((arr.astype(np.int32) // q) * q + q // 2).clip(0, 255).astype(np.uint8)
    return FAKE_LOSSY_MAGIC + encode_png(quant)


def decode_image(data: bytes) -> np.ndarray:
    """Decode either container; raises :class:`DecodeError` if corrupt."""
    if data[: len(FAKE_LOSSY_MAGIC)] == FAKE_LOSSY_MAGIC:
        return decode_png(bytes(data[len(FAKE_LOSSY_MAGIC) :]))
    return decode_png(bytes(data))


def is_lossless(fmt: str) -> bool:
    return fmt == "png"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------------------
# perceptual hash

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def _pool_to(gray: np.ndarray, n: int = 32) -> np.ndarray:
    """Deterministic area resample of a 2-D array to n×n via an
    integral image (summed-area table)."""
    h, w = gray.shape
    yb = np.arange(n + 1) * h // n
    xb = np.arange(n + 1) * w // n
    c = np.zeros((h + 1, w + 1))
    c[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    y0, y1 = yb[:-1], np.maximum(yb[1:], yb[:-1] + 1)
    x0, x1 = xb[:-1], np.maximum(xb[1:], xb[:-1] + 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return (
        c[y1[:, None], x1[None, :]]
        - c[y0[:, None], x1[None, :]]
        - c[y1[:, None], x0[None, :]]
        + c[y0[:, None], x0[None, :]]
    ) / area


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash (signed int64, Spark LongType-friendly)."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _pool_to(gray, 32)
    m = _dct_matrix(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = 0
    for i, v in enumerate(block >= med):
        if v:
            bits |= 1 << i
    # fold into signed 64-bit
    if bits >= 1 << 63:
        bits -= 1 << 64
    return int(bits)
