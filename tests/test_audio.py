"""Audio features: mel-band physics (tone frequency ordering), silence
vs noise, and the Spark mapInPandas path over real WAV bytes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topic_store_spark.multimodal.audio import (
    extract_audio_features,
    log_mel,
    mel_filterbank,
    stft_mag,
)
from topic_store_spark.multimodal.codecs import encode_wav

SR = 16_000


def _tone(freq, seconds=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype("float32")


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(32, 256, SR)
    assert fb.shape == (32, 129)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_tone_frequency_ordering():
    lm_low = log_mel(_tone(300), SR).mean(axis=0)
    lm_high = log_mel(_tone(4000), SR).mean(axis=0)
    # higher tone peaks in a higher mel band
    assert int(np.argmax(lm_high)) > int(np.argmax(lm_low))
    # each tone's energy is concentrated (peak well above median)
    for lm in (lm_low, lm_high):
        assert lm.max() - np.median(lm) > 3.0


def test_stft_shapes_and_short_clip():
    mag = stft_mag(_tone(440), n_fft=256, hop=128)
    assert mag.shape[1] == 129 and mag.shape[0] > 50
    tiny = stft_mag(np.zeros(10), n_fft=256, hop=128)
    assert tiny.shape == (1, 129)


def test_spark_extraction_over_wav_bytes(spark):
    rng = np.random.default_rng(3)
    clips = [
        (1, encode_wav(_tone(300).reshape(-1, 1), SR), SR),
        (2, encode_wav(_tone(4000).reshape(-1, 1), SR), SR),
        (3, encode_wav(
            rng.uniform(-0.3, 0.3, SR // 2).astype("float32").reshape(-1, 1),
            SR,
        ), SR),
        (4, None, SR),
    ]
    df = spark.createDataFrame(
        clips, "clip_id long, data binary, sample_rate int"
    )
    out = {
        r["clip_id"]: r["audio_features"]
        for r in extract_audio_features(df).collect()
    }
    assert out[4] is None
    assert out[1]["n_frames"] > 50 and abs(out[1]["duration_s"] - 0.5) < 0.01
    assert np.argmax(out[2]["mel_mean"]) > np.argmax(out[1]["mel_mean"])
    # noise has a much higher zero-crossing rate than a 300 Hz tone
    assert out[3]["zero_cross_rate"] > 4 * out[1]["zero_cross_rate"]
    assert out[1]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.01)
    # mel_mean is a ready-made embedding column for the similarity ops
    emb = extract_audio_features(df.filter(F.col("data").isNotNull())).select(
        F.col("clip_id").alias("vec_id"),
        F.col("audio_features.mel_mean").alias("embedding"),
    )
    assert emb.schema["embedding"].dataType.simpleString() == "array<double>"
    assert emb.count() == 3


def test_empty_clip_yields_zero_struct(spark):
    """A valid zero-sample clip (empty payload, or a WAV with no
    samples) must produce a zeroed feature struct, not crash the task."""
    clips = [
        (1, b"", SR),
        (2, encode_wav(np.zeros((0, 1), dtype="float32"), SR), SR),
        (3, encode_wav(_tone(300).reshape(-1, 1), SR), SR),
    ]
    df = spark.createDataFrame(
        clips, "clip_id long, data binary, sample_rate int"
    )
    out = {
        r["clip_id"]: r["audio_features"]
        for r in extract_audio_features(
            df.filter(F.col("clip_id") == 1), fmt="pcm_f32"
        ).collect()
    }
    assert out[1]["n_frames"] == 0 and out[1]["rms"] == 0.0
    assert list(out[1]["mel_mean"]) == [0.0] * 32
    out = {
        r["clip_id"]: r["audio_features"]
        for r in extract_audio_features(
            df.filter(F.col("clip_id") >= 2)
        ).collect()
    }
    assert out[2]["duration_s"] == 0.0 and out[2]["zero_cross_rate"] == 0.0
    assert out[3]["n_frames"] > 50


def test_encode_wav_scalar_is_single_mono_frame():
    """r10 ADVICE: a 0-D scalar encodes as one mono frame (pre-r10
    atleast_2d behavior), not a ValueError."""
    from topic_store_spark.multimodal.codecs import decode_wav

    buf = encode_wav(np.float32(0.5), SR)
    arr = decode_wav(buf)
    assert arr.shape == (1, 1)
    assert arr[0, 0] == np.float32(0.5)
