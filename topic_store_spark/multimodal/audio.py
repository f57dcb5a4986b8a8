"""Audio feature extraction — STFT + log-mel filterbank, numpy only.

The audio half of the multimodal feature layer (images:
`multimodal/phash.py` + `binary.decode_images`): raw PCM or WAV bytes
become fixed-width log-mel summary vectors, the representation every
audio curation / retrieval pipeline keys on (dedup via embedding
LSH, ANN search, quality gates on silence/clipping).  All DSP is
from-scratch numpy — Hann window, real FFT magnitude, triangular mel
filterbank (HTK mel scale) — matching the repo's codec policy: no
media libraries, real math, deterministic outputs.

Spark shape: `extract_audio_features` is Arrow `mapInPandas` with the
same batch contract as the other decoders.  Per clip it emits pooled
``mel_mean``/``mel_std`` vectors (arrays of doubles) rather than the
full spectrogram — bounded row width, and the mean vector drops
straight into `operators/similarity.py` as an embedding column.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_mag(x: np.ndarray, n_fft: int = 256, hop: int = 128) -> np.ndarray:
    """Magnitude spectrogram (n_frames, n_fft//2 + 1); clips shorter
    than one frame are zero-padded to a single frame."""
    x = np.asarray(x, dtype="float64")
    if x.ndim == 2:  # multi-channel: average
        x = x.mean(axis=1)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    w = hann(n_fft)
    frames = np.stack(
        [x[i * hop : i * hop + n_fft] * w for i in range(n_frames)]
    )
    return np.abs(np.fft.rfft(frames, axis=1))


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters on the HTK mel scale."""
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(0, mel(sample_rate / 2), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, mid):
            if mid > lo:
                fb[i, b] = (b - lo) / (mid - lo)
        for b in range(mid, hi):
            if hi > mid:
                fb[i, b] = (hi - b) / (hi - mid)
    return fb


def log_mel(
    x: np.ndarray,
    sample_rate: int,
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 32,
) -> np.ndarray:
    """(n_frames, n_mels) log-mel energies."""
    mag = stft_mag(x, n_fft, hop)
    fb = mel_filterbank(n_mels, n_fft, sample_rate)
    return np.log(mag @ fb.T + 1e-10)


_OUT_FIELDS = [
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_cross_rate", T.DoubleType()),
    T.StructField("mel_mean", T.ArrayType(T.DoubleType())),
    T.StructField("mel_std", T.ArrayType(T.DoubleType())),
]


def extract_audio_features(
    df: DataFrame,
    data_col: str = "data",
    rate_col: str = "sample_rate",
    fmt: str = "wav",
    n_fft: int = 256,
    hop: int = 128,
    n_mels: int = 32,
) -> DataFrame:
    """Attach an ``audio_features`` struct to a relation of audio blobs.

    ``fmt="wav"`` decodes RIFF bytes with the from-scratch codec
    (`multimodal/codecs.decode_wav`; the WAV's own sample rate is NOT
    read here — pass it in ``rate_col``, matching the metadata-struct
    convention of `binary.attach_binary_metadata`).  ``fmt="pcm_f32"``
    treats bytes as raw little-endian float32 PCM.
    """
    from topic_store_spark.multimodal.codecs import decode_wav

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("audio_features", T.StructType(_OUT_FIELDS))]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data, sr in zip(pdf[data_col], pdf[rate_col]):
                if data is None:
                    out.append(None)
                    continue
                if fmt == "wav":
                    x = decode_wav(bytes(data)).astype("float64")
                elif fmt == "pcm_f32":
                    x = np.frombuffer(bytes(data), dtype="<f4").astype(
                        "float64"
                    )
                else:
                    raise NotImplementedError(f"audio format {fmt!r}")
                if x.ndim == 2:
                    x = x.mean(axis=1)
                if x.size == 0:
                    # a valid zero-sample clip (empty payload / WAV with
                    # no samples) must not crash the whole task
                    out.append(
                        {
                            "n_frames": 0,
                            "duration_s": 0.0,
                            "rms": 0.0,
                            "zero_cross_rate": 0.0,
                            "mel_mean": [0.0] * n_mels,
                            "mel_std": [0.0] * n_mels,
                        }
                    )
                    continue
                if np.issubdtype(x.dtype, np.floating) and np.abs(x).max() > 1.5:
                    x = x / 32768.0  # int16-scaled payloads
                lm = log_mel(x, int(sr), n_fft, hop, n_mels)
                zc = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1
                    else 0.0
                )
                out.append(
                    {
                        "n_frames": int(lm.shape[0]),
                        "duration_s": float(len(x) / sr),
                        "rms": float(np.sqrt(np.mean(x**2))),
                        "zero_cross_rate": zc,
                        "mel_mean": lm.mean(axis=0).tolist(),
                        "mel_std": lm.std(axis=0).tolist(),
                    }
                )
            pdf = pdf.copy()
            pdf["audio_features"] = out
            yield pdf

    return df.mapInPandas(feats, schema=out_schema)
