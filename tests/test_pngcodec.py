"""PNG decode (functions/imagecodec.py) against a test-side forward
filterer: every scanline filter type, every supported color type.

The decoder is implemented from the W3C PNG spec; the tests build
payloads with an independent forward filter (spec §9 equations run
the encoding direction here, decode direction in the codec) so the
two sides can't share a bug.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from nxsearch_ray.functions.imagecodec import (
    PNG_SIG,
    decode_image,
    encode_png,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + \
        struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Apply the spec's ENCODE-side filters row by row (independent
    reimplementation of §9, scalar on purpose)."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    stride = w * c
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        enc = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = int(row[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else \
                    (b if pb <= pc_ else cc)
            enc[i] = (row[i] - pred) & 255
        out.append(f)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def _png_bytes(img: np.ndarray, ctype: int, filters: list[int],
               plte: np.ndarray | None = None) -> bytes:
    h, w, c = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    raw = _forward_filter(img, filters)
    # split IDAT in two to exercise chunk concatenation
    z = zlib.compress(raw)
    half = len(z) // 2
    body += _chunk(b"IDAT", z[:half]) + _chunk(b"IDAT", z[half:])
    return body + _chunk(b"IEND", b"")


def _rng_img(h, w, c, seed=5):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_rgb_all_filters(filters):
    img = _rng_img(7, 5, 3)
    out = decode_image(_png_bytes(img, 2, filters))
    assert out.shape == (7, 5, 3)
    assert np.array_equal(out, img)


def test_png_gray_and_alpha_types():
    gray = _rng_img(6, 4, 1)
    out = decode_image(_png_bytes(gray, 0, [0, 1, 2, 3, 4]))
    assert np.array_equal(out, gray)

    ga = _rng_img(6, 4, 2)
    out = decode_image(_png_bytes(ga, 4, [4, 3, 2, 1, 0]))
    assert np.array_equal(out, ga[:, :, :1])   # alpha dropped

    rgba = _rng_img(5, 9, 4)
    out = decode_image(_png_bytes(rgba, 6, [1, 4]))
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_palette():
    plte = _rng_img(1, 16, 3).reshape(16, 3)
    idx = np.random.default_rng(9).integers(
        0, 16, size=(8, 3, 1), dtype=np.uint8)
    out = decode_image(_png_bytes(idx, 3, [0, 2], plte=plte))
    assert np.array_equal(out, plte[idx[:, :, 0]])


def test_png_encode_decode_roundtrip():
    for c in (1, 3):
        img = _rng_img(11, 13, c, seed=c)
        assert np.array_equal(decode_image(encode_png(img)), img)


def test_png_rejects_unsupported():
    img = _rng_img(4, 4, 3)
    # IHDR data starts at 8 (sig) + 8 (len+tag): depth is byte 8 of
    # the payload, interlace is byte 12
    depth4 = bytearray(_png_bytes(img, 2, [0]))
    depth4[8 + 8 + 8] = 4
    with pytest.raises(ValueError, match="bit depth"):
        decode_image(bytes(depth4))
    bad_il = bytearray(_png_bytes(img, 2, [0]))
    bad_il[8 + 8 + 12] = 2
    with pytest.raises(ValueError, match="interlace"):
        decode_image(bytes(bad_il))
    # flipping a sequential stream's header to Adam7 misaligns the
    # pass layout — a loud data error, not a silent mis-decode
    lied = bytearray(_png_bytes(img, 2, [0]))
    lied[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="truncated|filter type"):
        decode_image(bytes(lied))


def test_png_feeds_multimodal_features():
    """A PNG payload flows through the REAL image-feature stage."""
    from nxsearch_ray.functions.imagecodec import image_feature_vector

    img = _rng_img(16, 16, 3, seed=3)
    arr = decode_image(encode_png(img))
    v = image_feature_vector(arr)
    assert v.shape == (8,)
    assert abs(v[0] - img[:, :, 0].mean() / 255.0) < 1e-6


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def test_png_adam7_interlaced():
    """Adam7: forward-interlace independently in the test, decode
    through the codec — every pixel must land back on its grid."""
    img = _rng_img(13, 11, 3, seed=21)     # odd dims hit empty edges
    ihdr = struct.pack(">IIBBBBB", 11, 13, 8, 2, 0, 0, 1)
    raw = b""
    for i, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _forward_filter(sub, [i % 5])   # vary filters by pass
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    out = decode_image(buf)
    assert np.array_equal(out, img)


def _scale_16to8(img16: np.ndarray) -> np.ndarray:
    """round(v * 255 / 65535) — the libpng-style linear rescale."""
    return ((img16.astype(np.uint32) * 255 + 32767) // 65535) \
        .astype(np.uint8)


def test_png_16bit_depth():
    """16-bit samples decode via linear rescale round(v*255/65535)
    (matches libpng/Pillow; plain high-byte truncation is off by one
    on values like 0x00FF), all filter types."""
    rng = np.random.default_rng(4)
    img16 = rng.integers(0, 1 << 16, size=(6, 5, 3), dtype=np.uint16)
    as_bytes = img16.astype(">u2").view(np.uint8).reshape(6, 5, 6)
    ihdr = struct.pack(">IIBBBBB", 5, 6, 16, 2, 0, 0, 0)
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(
            _forward_filter(as_bytes, [0, 1, 2, 3, 4]))) + \
        _chunk(b"IEND", b"")
    out = decode_image(buf)
    assert np.array_equal(out, _scale_16to8(img16))

    # 16-bit gray
    g16 = rng.integers(0, 1 << 16, size=(4, 7, 1), dtype=np.uint16)
    gb = g16.astype(">u2").view(np.uint8).reshape(4, 7, 2)
    ihdr = struct.pack(">IIBBBBB", 7, 4, 16, 0, 0, 0, 0)
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(_forward_filter(gb, [4]))) + \
        _chunk(b"IEND", b"")
    assert np.array_equal(decode_image(buf), _scale_16to8(g16))

    # the truncation-vs-rescale boundary cases: 0x00FF rescales to 1
    # (truncation says 0), 0xFF00 rescales to 254 (truncation 255)
    edge = np.array([[[0x00FF, 0xFF00, 0xFFFF]]], dtype=np.uint16)
    eb = edge.astype(">u2").view(np.uint8).reshape(1, 1, 6)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(_forward_filter(eb, [0]))) + \
        _chunk(b"IEND", b"")
    assert decode_image(buf).ravel().tolist() == [1, 254, 255]
