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


def test_strict_decoder_raises_at_call_site(spark):
    df = mm.synth_audio(spark, 3)
    with pytest.raises(Exception) as ei:
        mm.audio_features(df, decoder="strict").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
