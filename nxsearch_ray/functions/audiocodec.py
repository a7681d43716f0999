"""Pure-numpy audio codec for uncompressed WAV (RIFF PCM / IEEE float).

Same rationale as functions/imagecodec.py: the container has no
soundfile/torchaudio, but uncompressed WAV needs none — RIFF chunk
walking plus a dtype view.  Compressed audio (MP3/OGG/...) still
requires a codec library and keeps the stub behavior
(``decode_wav`` returns None for non-RIFF payloads).

Decode output is (mono float64 samples in [-1, 1], sample_rate).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_wav", "encode_wav", "audio_feature_vector",
           "FEATURE_DIM"]

FEATURE_DIM = 8
_FFT_CAP = 65536   # analyze at most this many leading samples


def decode_wav(buf: bytes) -> tuple[np.ndarray, int] | None:
    """(mono samples float64 in [-1,1], sample_rate) for RIFF/WAVE PCM
    (8/16/32-bit int) or IEEE-float payloads; None when the payload is
    not RIFF/WAVE (a compressed format needing a codec).  Malformed
    RIFF of a supported kind raises ValueError."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)      # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or sample_rate < 1:
        raise ValueError("invalid WAV fmt chunk")
    if audio_format == 1:                 # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) \
                / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) \
                / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    n = (len(x) // channels) * channels
    mono = x[:n].reshape(-1, channels).mean(axis=1)
    return mono, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + int(sample_rate).to_bytes(4, "little")
           + int(sample_rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_feature_vector(samples: np.ndarray, sample_rate: int
                         ) -> np.ndarray:
    """FEATURE_DIM deterministic floats over the leading ≤65536 mono
    samples: RMS, zero-crossing rate, mean |x|, peak |x|, spectral
    centroid and bandwidth (fraction of Nyquist), low-band (<1 kHz)
    energy ratio, duration of the analyzed window in seconds."""
    x = np.asarray(samples, dtype=np.float64)[:_FFT_CAP]
    n = len(x)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.count_nonzero(np.signbit(x[1:]) !=
                                 np.signbit(x[:-1]))) / max(n - 1, 1)
    mean_abs = float(np.mean(np.abs(x)))
    peak = float(np.max(np.abs(x)))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = float(spec.sum())
    nyq = sample_rate / 2.0
    if total > 0:
        centroid = float((freqs * spec).sum()) / total / nyq
        bandwidth = float(np.sqrt(
            ((freqs - centroid * nyq) ** 2 * spec).sum() / total)) / nyq
        low = float(spec[freqs < 1000.0].sum()) / total
    else:
        centroid = bandwidth = low = 0.0
    return np.array([rms, zcr, mean_abs, peak, centroid, bandwidth,
                     low, n / sample_rate], dtype=np.float32)
