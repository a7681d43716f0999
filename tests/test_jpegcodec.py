"""Baseline JPEG codec (functions/jpegcodec.py, from ITU-T T.81).

Encoder and decoder share only the bitstream (all tables ride in
DQT/DHT), so round-trips exercise the full marker/Huffman/DCT path;
quality is asserted as PSNR since JPEG is lossy by design.
"""

from __future__ import annotations

import numpy as np
import pytest

from nxsearch_ray.functions.jpegcodec import (
    _ZIGZAG,
    _build_huffman,
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _smooth(h, w, c=3):
    """Gradient image — the signal class JPEG is built for."""
    y = np.linspace(0, 200, h)[:, None]
    x = np.linspace(0, 55, w)[None, :]
    base = y + x
    if c == 1:
        return base[:, :, None].astype(np.uint8)
    return np.stack([base, base + 30, 255 - base], axis=2) \
        .clip(0, 255).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # first/last diagonals of the T.81 zigzag, natural flat indices
    assert list(_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZIGZAG[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]


def test_huffman_tables_are_valid_prefix_codes():
    for bits, vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
        assert sum(bits) == len(vals)
        enc, dec = _build_huffman(bits, vals)
        assert len(enc) == len(vals)
        # kraft inequality (strict prefix code)
        assert sum(2.0 ** -ln for _, ln in enc.values()) <= 1.0
        # no code is a prefix of another
        codes = sorted((ln, code) for code, ln in enc.values())
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1:]:
                assert (c2 >> (l2 - l1)) != c1


@pytest.mark.parametrize("kw", [{}, {"subsample": True},
                                {"quality": 95}, {"quality": 50},
                                {"restart_interval": 2},
                                {"subsample": True,
                                 "restart_interval": 3}])
def test_roundtrip_psnr_rgb(kw):
    img = _smooth(41, 23)      # non-multiple-of-16 dims
    out = decode_jpeg(encode_jpeg(img, **kw))
    assert out.shape == img.shape
    floor = 33.0 if kw.get("quality") == 50 else \
        36.0 if kw.get("subsample") else 38.0
    assert _psnr(out, img) > floor, kw


def test_roundtrip_gray_and_flat():
    g = _smooth(24, 17, c=1)
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == g.shape and _psnr(out, g) > 40
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert _psnr(out, flat) > 45


def test_noise_structural_roundtrip():
    """Noise is JPEG's worst case — shape/type must survive even if
    fidelity doesn't."""
    n = np.random.default_rng(3).integers(
        0, 256, (17, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(n, quality=95))
    assert out.shape == n.shape and out.dtype == np.uint8


def test_rejects_non_baseline_and_malformed():
    img = _smooth(16, 16)
    buf = bytearray(encode_jpeg(img))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC1            # extended sequential: unsupported
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(encode_jpeg(img)[:40] + b"\xff\xd9")


def test_jpeg_flows_through_image_stage():
    """decode_image dispatches JPEG; the multimodal feature actor
    produces real stats from a JPEG payload."""
    import pyarrow as pa

    from nxsearch_ray.functions.imagecodec import decode_image
    from nxsearch_ray.stages.multimodal import ImageFeatureActor

    img = _smooth(32, 32)
    payload = encode_jpeg(img, subsample=True)
    arr = decode_image(payload)
    assert arr.shape == img.shape

    actor = ImageFeatureActor(deterministic_fake=False)
    out = actor(pa.table({"page_id": pa.array([7], type=pa.int64()),
                          "payload": [payload]}))
    row = out.to_pylist()[0]
    assert row["width"] == 32 and row["height"] == 32
    # channel means survive the lossy trip
    feat = row["features"]
    assert abs(feat[0] - img[:, :, 0].mean() / 255.0) < 0.02


def test_mjpeg_avi_roundtrip_and_stage():
    """MJPEG/AVI: encode JPEG frames into an AVI, parse it back, and
    sample frames through the video stage — each sampled frame is a
    standalone decodable JPEG."""
    import pyarrow as pa

    from nxsearch_ray.functions.videocodec import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
        parse_video,
    )
    from nxsearch_ray.stages.multimodal import VideoFrameSampleActor

    frames_img = [np.clip(_smooth(24, 16).astype(np.int64) + i * 3,
                          0, 255).astype(np.uint8) for i in range(5)]
    jpegs = [encode_jpeg(f) for f in frames_img]
    avi = encode_avi_mjpeg(jpegs, 16, 24, fps=10.0)

    vid = parse_avi_mjpeg(avi)
    assert vid is not None and vid.n_frames == 5
    assert (vid.width, vid.height) == (16, 24)
    assert abs(vid.fps - 10.0) < 1e-3
    assert vid.pts(3) == pytest.approx(0.3)
    for i in range(5):
        out = decode_jpeg(vid.frame(i))
        assert _psnr(out, frames_img[i]) > 38

    assert parse_video(avi).n_frames == 5
    assert parse_video(b"RIFX nope") is None

    actor = VideoFrameSampleActor(num_frames=3,
                                  deterministic_fake=False)
    t = actor(pa.table({"page_id": pa.array([9], type=pa.int64()),
                        "payload": [avi]}))
    assert t.num_rows == 3
    for fb in t.column("frame").to_pylist():
        assert decode_jpeg(fb).shape == (24, 16, 3)


def test_avi_rejects_non_mjpeg_stream():
    from nxsearch_ray.functions.videocodec import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    avi = bytearray(encode_avi_mjpeg(
        [encode_jpeg(_smooth(8, 8))], 8, 8))
    i = avi.find(b"00dc") + 8
    avi[i:i + 2] = b"\x00\x00"       # corrupt the frame's SOI
    with pytest.raises(ValueError, match="not MJPEG"):
        parse_avi_mjpeg(bytes(avi))


def test_g711_and_ima_adpcm_wav():
    """Compressed-audio WAV: G.711 companders (exact table inverse)
    and IMA ADPCM (lockstep-vectorized decoder vs the sequential
    reference encoder) hit their textbook SNRs on a sine."""
    from nxsearch_ray.functions.audiocodec import (
        decode_wav,
        encode_wav_g711,
        encode_wav_ima_adpcm,
    )

    t = np.arange(8000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)

    def snr(ref, out):
        n = min(len(ref), len(out))
        ref, out = ref[:n], out[:n]
        err = ((ref - out) ** 2).sum()
        return 10 * np.log10((ref ** 2).sum() / max(err, 1e-12))

    for law, floor in (("ulaw", 34.0), ("alaw", 34.0)):
        out, sr = decode_wav(encode_wav_g711(x, 8000, law=law))
        assert sr == 8000 and len(out) == len(x)
        assert snr(x, out) > floor, law

    out, sr = decode_wav(encode_wav_ima_adpcm(x, 8000))
    assert sr == 8000 and len(out) >= len(x)   # tail block padded
    assert snr(x, out) > 24.0

    # flows through the real audio feature path
    from nxsearch_ray.functions.audiocodec import audio_feature_vector

    v = audio_feature_vector(out[:8000], sr)
    ref = audio_feature_vector(x, 8000)
    assert abs(v[0] - ref[0]) < 0.02            # RMS survives


def test_wav_compressed_feature_stage():
    """A µ-law payload drives the multimodal audio stage for real."""
    import pyarrow as pa

    from nxsearch_ray.functions.audiocodec import encode_wav_g711
    from nxsearch_ray.stages.multimodal import AudioFeatureActor

    t = np.arange(4000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 220 * t)
    actor = AudioFeatureActor(deterministic_fake=False)
    out = actor(pa.table({
        "page_id": pa.array([3], type=pa.int64()),
        "payload": [encode_wav_g711(x, 8000)]}))
    row = out.to_pylist()[0]
    assert row["sample_rate"] == 8000
    assert abs(row["features"][0] - 0.5 / np.sqrt(2)) < 0.02  # RMS


@pytest.mark.parametrize("quality", [50, 85, 95])
def test_progressive_bit_exact_vs_baseline(quality):
    """Progressive (SOF2) re-encodes the SAME quantized coefficients
    as baseline, so decode must be BIT-IDENTICAL — this gates every
    scan type (DC first/refine, AC first with EOB runs and ZRL, AC
    refinement with correction bits) at once."""
    from nxsearch_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    img = _smooth(41, 23)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(base, prog)


def test_progressive_gray_and_noise_bit_exact():
    """Noise maximizes nonzero AC coefficients — the refinement
    pass's hardest input; grayscale covers the 1-component scans."""
    from nxsearch_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    g = _smooth(24, 17, c=1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)),
        decode_jpeg(encode_jpeg_progressive(g)))
    n = np.random.default_rng(7).integers(
        0, 256, (17, 19, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(n, quality=95)),
        decode_jpeg(encode_jpeg_progressive(n, quality=95)))


def test_progressive_flows_through_image_stage():
    import pyarrow as pa

    from nxsearch_ray.functions.imagecodec import decode_image
    from nxsearch_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )
    from nxsearch_ray.stages.multimodal import ImageFeatureActor

    img = _smooth(32, 32)
    payload = encode_jpeg_progressive(img)
    assert decode_image(payload).shape == img.shape
    actor = ImageFeatureActor(deterministic_fake=False)
    out = actor(pa.table({"page_id": pa.array([1], type=pa.int64()),
                          "payload": [payload]}))
    assert out.to_pylist()[0]["width"] == 32


def test_progressive_truncated_scan_rejected():
    from nxsearch_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    buf = encode_jpeg_progressive(_smooth(16, 16))
    with pytest.raises(ValueError,
                       match="truncated progressive|truncated JPEG"):
        decode_jpeg(buf[:len(buf) // 2] + b"\xff\xd9")


@pytest.mark.parametrize("dims", [(41, 23), (20, 20), (16, 16)])
def test_progressive_420_bit_exact(dims):
    """4:2:0 progressive — the dominant real-world configuration.
    The (20, 20) case makes the component's TRUE non-interleaved
    block grid (3x3 luma) smaller than the MCU-padded grid (4x4),
    pinning the scan-geometry mapping."""
    from nxsearch_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    h, w = dims
    img = _smooth(h, w)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, subsample=True)),
        decode_jpeg(encode_jpeg_progressive(img, subsample=True)))
    n = np.random.default_rng(h * w).integers(
        0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(n, quality=95, subsample=True)),
        decode_jpeg(encode_jpeg_progressive(n, quality=95,
                                            subsample=True)))
