"""Pure-numpy image codec: PPM/PGM/BMP (uncompressed), PNG, and
baseline JPEG.

The sandbox has no Pillow/libjpeg, but none of the formats here
needs one: PPM (P6) / PGM (P5) are netpbm headers + raw bytes,
24-bit BI_RGB BMP is a fixed header + padded BGR rows, PNG
(W3C spec) is zlib-compressed filtered scanlines — stdlib ``zlib``
plus numpy covers decode end-to-end (8- and 16-bit depth, color
types 0/2/3/4/6, non-interlaced AND Adam7) —
and JPEG — baseline sequential AND progressive (SOF2) — is
implemented from ITU-T T.81 in `functions/jpegcodec.py` (Huffman +
IDCT in numpy; arithmetic coding raises ValueError).  WebP/AVIF/... still require a
codec library and keep the stub behavior (`decode_image` returns
None → caller raises or falls back).

Decode output is (H, W, C) uint8 with C ∈ {1, 3} (alpha channels
are dropped: the feature stages are defined over color planes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_image", "encode_ppm", "encode_png",
           "resize_nearest", "image_feature_vector", "FEATURE_DIM"]

PNG_SIG = b"\x89PNG\r\n\x1a\n"

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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int,
                  start: int = 0) -> np.ndarray:
    """Reverse the PNG scanline filters (spec §9) for one (sub-)image
    starting at byte ``start`` of the inflated stream: returns
    (h, w*bpp) decoded bytes.  None/Up/Sub are vectorized per row
    (Sub is a per-lane cumsum — mod 256 distributes over addition);
    Average and Paeth predict from the DECODED left byte through a
    floor-div / non-linear choice, so those rows run a per-byte loop
    (rare in practice and bounded by one row)."""
    stride = w * bpp
    if len(raw) - start < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    raw = raw[start:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = int(raw[pos])
        row = raw[pos + 1:pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = row
        elif f == 2:                      # Up
            cur = (row + prev) & 255
        elif f == 1:                      # Sub: per-lane cumsum
            cur = np.cumsum(row.reshape(-1, bpp), axis=0) \
                .reshape(-1) & 255
        elif f in (3, 4):                 # Average / Paeth
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 3:
                    cur[i] = (row[i] + ((a + b) >> 1)) & 255
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    cur[i] = (row[i] + pred) & 255
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(buf: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8, C ∈ {1, 3}: 8/16-bit, color types
    0/2/3/4/6, non-interlaced or Adam7.  Implemented from the public
    W3C spec (chunk stream → IHDR → concatenated IDAT → zlib inflate
    → unfilter [per pass] → de-palette / drop alpha / 16→8)."""
    pos = len(PNG_SIG)
    ihdr = None
    plte = None
    idat: list[bytes] = []
    n = len(buf)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", buf[pos:pos + 4]), \
            buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length            # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8) \
                .reshape(-1, 3).copy()
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth not in (8, 16):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype_i not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype_i}")
    if depth == 16 and ctype_i == 3:
        raise ValueError("16-bit palette PNG is not a valid encoding")
    ch = _PNG_CHANNELS[ctype_i]
    bpp = ch * (depth // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                        dtype=np.uint8)
    if interlace == 0:
        bts = _png_unfilter(raw, h, w, bpp)
    else:
        # Adam7 (spec §8.2): 7 independently-filtered sub-images in
        # one zlib stream, scattered back on the pass grids
        bts = np.zeros((h, w * bpp), dtype=np.uint8)
        start = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8),
                               (0, 4, 4, 8), (2, 0, 4, 4),
                               (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = _png_unfilter(raw, ph, pw, bpp, start=start)
            start += ph * (pw * bpp + 1)
            rows = np.arange(y0, h, dy)
            cols = (np.arange(x0, w, dx) * bpp)[:, None] \
                + np.arange(bpp)[None, :]
            bts[rows[:, None], cols.reshape(-1)[None, :]] = \
                sub.reshape(ph, pw * bpp)
    if depth == 16:
        # big-endian 16-bit samples → 8-bit by linear rescale with
        # rounding, round(v16 * 255 / 65535) — matches libpng/Pillow
        # output where plain high-byte truncation can be off by one
        pairs = bts.reshape(h, w * ch, 2).astype(np.uint32)
        v16 = (pairs[:, :, 0] << 8) | pairs[:, :, 1]
        bts = ((v16 * 255 + 32767) // 65535).astype(np.uint8)
    px = bts.reshape(h, w, ch)
    if ctype_i == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if ctype_i == 4:                  # gray+alpha → gray
        return px[:, :, :1].copy()
    if ctype_i == 6:                  # RGBA → RGB
        return px[:, :, :3].copy()
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, {1,3}) or (H, W) uint8 → minimal filter-0 PNG bytes
    (the test-side twin of `_decode_png`)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_png expects 1 or 3 channels")
    ctype = 0 if c == 1 else 2

    def chunk(tag: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         arr.reshape(h, w * c)], axis=1)
    return PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(rows.tobytes())) + \
        chunk(b"IEND", b"")


def decode_image(buf: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 for PPM/PGM/BMP/PNG/JPEG, else None
    (unknown magic — a format needing a codec library, e.g. WebP).
    Malformed payloads of a SUPPORTED format raise ValueError."""
    if len(buf) >= 2 and buf[:2] in (b"P6", b"P5"):
        return _decode_pnm(buf)
    if len(buf) >= 2 and buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:8] == PNG_SIG:
        return _decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        from nxsearch_ray.functions.jpegcodec import decode_jpeg

        return decode_jpeg(buf)
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
