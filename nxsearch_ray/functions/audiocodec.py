"""Pure-numpy audio codec for WAV: PCM / IEEE float (uncompressed)
plus G.711 µ-law/A-law and IMA ADPCM (compressed).

Same rationale as functions/imagecodec.py: the container has no
soundfile/torchaudio, but none of these formats needs one — RIFF
chunk walking plus a dtype view for PCM, a 256-entry table lookup
for the G.711 companders (ITU-T G.711), and the public step/index
recurrence for IMA/DVI ADPCM (format tag 0x11), vectorized ACROSS
blocks (the per-sample loop runs once per block position with every
block advancing in lockstep).  Psychoacoustic codecs (MP3/OGG/AAC)
still require a codec library and keep the stub behavior
(``decode_wav`` returns None for non-RIFF payloads).

Decode output is (mono float64 samples in [-1, 1], sample_rate).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_wav", "encode_wav", "encode_wav_g711",
           "encode_wav_ima_adpcm", "audio_feature_vector",
           "FEATURE_DIM"]

# ------------------------------------------------------------------
# G.711 companders (decode = 256-entry tables, built once)


def _ulaw_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.float64) / 32768.0


def _alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, -mag, mag).astype(np.float64) / 32768.0


_ULAW = _ulaw_table()
_ALAW = _alaw_table()

# IMA/DVI ADPCM tables (public spec)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int64)


def _ima_decode_mono(data: bytes, block_align: int) -> np.ndarray:
    """IMA ADPCM 'data' chunk → int16 samples, vectorized across
    blocks: per block a 4-byte header (predictor int16, step index),
    then 4-bit nibbles, low nibble first."""
    if block_align < 5:
        raise ValueError("invalid IMA ADPCM block align")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.empty(0, dtype=np.int16)
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=nblocks * block_align) \
        .reshape(nblocks, block_align)
    pred = raw[:, 0].astype(np.int64) | (raw[:, 1].astype(np.int64)
                                         << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    index = np.clip(raw[:, 2].astype(np.int64), 0, 88)
    payload = raw[:, 4:]
    nibbles = np.empty((nblocks, payload.shape[1] * 2),
                       dtype=np.int64)
    nibbles[:, 0::2] = payload & 0xF
    nibbles[:, 1::2] = payload >> 4
    spb = nibbles.shape[1]
    out = np.empty((nblocks, spb + 1), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for j in range(spb):            # lockstep across all blocks
        n = nibbles[:, j]
        step = _IMA_STEP[index]
        diff = (step >> 3) + np.where(n & 1, step >> 2, 0) \
            + np.where(n & 2, step >> 1, 0) + np.where(n & 4, step, 0)
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff),
                       -32768, 32767)
        index = np.clip(index + _IMA_INDEX[n & 7], 0, 88)
        out[:, j + 1] = pred.astype(np.int16)
    return out.reshape(-1)

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
    elif audio_format == 6:               # G.711 A-law
        x = _ALAW[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 7:               # G.711 µ-law
        x = _ULAW[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 0x11:            # IMA/DVI ADPCM
        if channels != 1:
            raise ValueError(
                "multi-channel IMA ADPCM unsupported (mono only)")
        block_align = int.from_bytes(fmt[12:14], "little")
        x = _ima_decode_mono(data, block_align).astype(np.float64) \
            / 32768.0
        channels = 1
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


def _wav_container(fmt_tag: int, channels: int, rate: int,
                   byte_rate: int, block_align: int, bits: int,
                   data: bytes, extra: bytes = b"") -> bytes:
    fmt = (fmt_tag.to_bytes(2, "little")
           + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + block_align.to_bytes(2, "little")
           + bits.to_bytes(2, "little") + extra)
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _compand(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Nearest-decode-value quantizer: provably the optimal encoder
    for a 256-entry compander table, and consistent with the decoder
    by construction."""
    order = np.argsort(table, kind="stable")
    ts = table[order]
    idx = np.clip(np.searchsorted(ts, x), 1, 255)
    lo, hi = ts[idx - 1], ts[idx]
    pick = np.where(np.abs(x - lo) <= np.abs(hi - x), idx - 1, idx)
    return order[pick].astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, sample_rate: int, *,
                    law: str = "ulaw") -> bytes:
    """Mono float samples in [-1, 1] → G.711 µ-law/A-law WAV."""
    table = _ULAW if law == "ulaw" else _ALAW
    tag = 7 if law == "ulaw" else 6
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = _compand(x, table).tobytes()
    return _wav_container(tag, 1, sample_rate, sample_rate, 1, 8,
                          data)


def encode_wav_ima_adpcm(samples: np.ndarray, sample_rate: int, *,
                         block_align: int = 256) -> bytes:
    """Mono float samples in [-1, 1] → IMA/DVI ADPCM WAV (the
    sequential reference encoder — test twin of the vectorized
    decoder)."""
    s = np.clip(np.round(np.asarray(samples, dtype=np.float64)
                         * 32767), -32768, 32767).astype(np.int64)
    spb = (block_align - 4) * 2          # nibbles per block
    out = bytearray()
    index = 0
    pos = 0
    while pos < len(s):
        pred = int(s[pos])
        out += int(pred & 0xFFFF).to_bytes(2, "little")
        out += bytes([index, 0])
        blk = s[pos + 1:pos + 1 + spb]
        nibs: list[int] = []
        for v in blk:
            step = int(_IMA_STEP[index])
            diff = int(v) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder recurrence keeps both sides in lockstep
            d = (step >> 3) + (step >> 2 if nib & 1 else 0) \
                + (step >> 1 if nib & 2 else 0) \
                + (step if nib & 4 else 0)
            pred = max(-32768, min(32767,
                                   pred - d if nib & 8 else pred + d))
            index = max(0, min(88, index + int(_IMA_INDEX[nib & 7])))
            nibs.append(nib)
        while len(nibs) < spb:           # pad the tail block
            nibs.append(0)
        for i in range(0, spb, 2):
            out.append(nibs[i] | (nibs[i + 1] << 4))
        pos += 1 + spb
    byte_rate = max(1, (sample_rate * block_align) // (spb + 1))
    return _wav_container(0x11, 1, sample_rate, byte_rate,
                          block_align, 4, bytes(out),
                          extra=(2).to_bytes(2, "little")
                          + (spb + 1).to_bytes(2, "little"))


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
