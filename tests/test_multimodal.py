"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic
fake decode, and the strict stub raising at the codec call site."""

from __future__ import annotations

import pytest

from invalid_spark.pipeline import multimodal as mm


def test_audio_features_deterministic(spark):
    df = mm.synth_audio(spark, 50)
    f1 = sorted(map(tuple, mm.audio_features(df).collect()))
    f2 = sorted(map(tuple, mm.audio_features(df).collect()))
    assert f1 == f2 and len(f1) == 50
    r = f1[0]
    assert r[1] > 0 and 0 < r[2] < 1 and r[5] == pytest.approx(r[1] / 16000)


def test_audio_schema_contract(spark):
    df = mm.synth_audio(spark, 5)
    out = mm.audio_features(df)
    assert out.columns == [
        "clip_id", "n_samples", "rms", "peak", "zero_crossings", "duration_sec"
    ]


def test_video_frame_sampling_fanout(spark):
    df = mm.synth_video(spark, 20)
    frames = mm.video_frame_sample(df, every_nth=10)
    got = frames.groupBy("video_id").count().collect()
    meta = {r["video_id"]: r["n_frames"] for r in df.select("video_id", "n_frames").collect()}
    for r in got:
        expected = -(-meta[r["video_id"]] // 10)  # ceil
        assert r["count"] == expected
    # frame phashes deterministic per (video, idx)
    a = sorted(map(tuple, frames.collect()))
    b = sorted(map(tuple, mm.video_frame_sample(df, every_nth=10).collect()))
    assert a == b


def test_strict_decoder_raises_for_non_wav(spark):
    # synth_audio payloads are opaque ("opus") — strict mode decodes
    # only WAV natively and raises at the codec integration point for
    # everything else
    df = mm.synth_audio(spark, 3)
    with pytest.raises(Exception) as ei:
        mm.audio_features(df, decoder="strict").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_wav_codec_roundtrip():
    import numpy as np

    sr = 16000
    t = np.arange(4000) / sr
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    for width, tol in [(1, 1e-2), (2, 1e-4), (4, 1e-7)]:
        raw = mm.encode_wav(sig, sr, sampwidth=width)
        dec, got_sr = mm.decode_wav(raw)
        assert got_sr == sr and len(dec) == len(sig)
        assert float(np.max(np.abs(dec - sig))) < tol, width


def test_wav_24bit_and_stereo_downmix():
    import io
    import wave

    import numpy as np

    sr = 8000
    sig = 0.25 * np.sin(2 * np.pi * 200.0 * np.arange(2000) / sr)
    # 24-bit mono: pack signed ints little-endian 3 bytes each
    v = (sig * ((1 << 23) - 1)).round().astype(np.int64)
    v24 = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
    frames = bytearray()
    for x in v24:
        frames += bytes(((int(x) & 0xFF), (int(x) >> 8) & 0xFF,
                         (int(x) >> 16) & 0xFF))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(sr)
        w.writeframes(bytes(frames))
    dec, got_sr = mm.decode_wav(buf.getvalue())
    assert got_sr == sr
    assert float(np.max(np.abs(dec - sig))) < 1e-5
    # stereo: L = sig, R = -sig → mean downmix ≈ 0
    inter = np.empty(2 * len(sig))
    inter[0::2], inter[1::2] = sig, -sig
    data = (inter * 32767.0).round().astype("<i2").tobytes()
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data)
    dec2, _ = mm.decode_wav(buf2.getvalue())
    assert len(dec2) == len(sig)
    assert float(np.max(np.abs(dec2))) < 1e-4


def test_strict_mode_decodes_real_wav(spark):
    """End-to-end: planted 16-bit PCM WAV payloads decode through the
    Arrow-batch pipeline with exact sample counts and the analytic
    sine RMS/peak (A=0.5 → rms A/√2, peak A)."""
    import math

    df = mm.synth_wav(spark, 12)
    meta = {r["clip_id"]: r["n_samples"]
            for r in df.select("clip_id", "n_samples").collect()}
    feats = mm.audio_features(df, decoder="strict").collect()
    assert len(feats) == 12
    for r in feats:
        assert r["n_samples"] == meta[r["clip_id"]]  # decoded == planted
        assert r["duration_sec"] == pytest.approx(
            meta[r["clip_id"]] / 16000.0
        )
        assert r["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=2e-3)
        assert r["peak"] == pytest.approx(0.5, rel=2e-3)
        assert r["zero_crossings"] > 0
