"""Pure-numpy image codec for uncompressed formats (PPM/PGM/BMP).

The sandbox has no Pillow/libjpeg, but the uncompressed classics need
none: PPM (P6) / PGM (P5) are netpbm headers + raw bytes, and 24-bit
BI_RGB BMP is a fixed header + padded BGR rows — both implemented here
from their public specifications with numpy only.  This makes the
multimodal image stages REAL for these formats; compressed formats
(JPEG/PNG/...) still require a codec library and keep the stub
behavior (`decode_image` returns None → caller raises or falls back).

Decode output is (H, W, C) uint8 with C ∈ {1, 3}.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_image", "encode_ppm", "resize_nearest",
           "image_feature_vector", "FEATURE_DIM"]

FEATURE_DIM = 8


def _pnm_tokens(buf: bytes, need: int) -> tuple[list[int], int]:
    """First ``need`` whitespace-separated integer tokens after the
    magic, honoring '#' comments; returns (tokens, offset past the
    single whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = 2  # past magic
    n = len(buf)
    while len(toks) < need and i < n:
        c = buf[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            j = i
            while j < n and not buf[j:j + 1].isspace():
                j += 1
            toks.append(int(buf[i:j]))
            i = j + 1 if len(toks) == need else j
    if len(toks) < need:
        raise ValueError("truncated PNM header")
    return toks, i


def _decode_pnm(buf: bytes) -> np.ndarray:
    channels = 3 if buf[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(buf, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    need = w * h * channels
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, channels)


def _decode_bmp(buf: bytes) -> np.ndarray:
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(buf[10:14], "little")
    dib = int.from_bytes(buf[14:18], "little")
    if dib < 40:
        raise ValueError("unsupported BMP (pre-BITMAPINFOHEADER)")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()   # BGR → RGB


def decode_image(buf: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for supported uncompressed formats, else None
    (unknown magic — a compressed format needing a codec library).
    Malformed payloads of a SUPPORTED format raise ValueError."""
    if len(buf) >= 2 and buf[:2] in (b"P6", b"P5"):
        return _decode_pnm(buf)
    if len(buf) >= 2 and buf[:2] == b"BM":
        return _decode_bmp(buf)
    return None


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W, 1)/(H, W) uint8 → P6/P5 bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (integer center-gather)."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64),
                    h - 1)
    xi = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64),
                    w - 1)
    return arr[yi][:, xi]


def image_feature_vector(arr: np.ndarray) -> np.ndarray:
    """FEATURE_DIM deterministic floats: per-channel mean and std
    (grayscale broadcast to 3), mean luma (Rec.601), aspect ratio —
    all in [0, 1] except the ratio (clipped to 8)."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    means = a.mean(axis=(0, 1)) / 255.0
    stds = a.std(axis=(0, 1)) / 255.0
    luma = float((0.299 * means[0] + 0.587 * means[1]
                  + 0.114 * means[2]))
    ratio = min(arr.shape[1] / max(arr.shape[0], 1), 8.0)
    return np.array([means[0], means[1], means[2],
                     stds[0], stds[1], stds[2], luma, ratio],
                    dtype=np.float32)
