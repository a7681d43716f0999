"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with
metadata columns beside them; decode / feature-extraction runs as an
actor-pool `map_batches` stage with SMALL batches (wide rows — see the
block-size note in SURVEY.md §7).

Image decode is REAL for PPM/PGM/BMP, PNG *and baseline JPEG*:
payloads decode through the pure-numpy codecs in
functions/imagecodec.py and functions/jpegcodec.py (PNG needs only
stdlib zlib; JPEG is a from-spec T.81 Huffman+IDCT implementation),
feeding real width/height/channel-statistics features and a real
nearest-neighbor resize.  Remaining formats (WebP/AVIF, MP3, H.264)
require libraries NOT in this container, so those paths are stubbed: a payload the codec
cannot decode raises `NotImplementedError` unless Pillow is present,
and with ``deterministic_fake=True`` the stage emits deterministic
pseudo-features derived from the payload bytes so that schema,
batching, actor lifecycle and downstream layout stay testable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.hashing import sequence_hashes, splitmix64

FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int8()),
    ("payload_bytes", pa.int64()),
    ("payload_hash", pa.uint64()),
    ("features", pa.list_(pa.float32(), FEATURE_DIM)),
])


class ImageFeatureActor:
    """Decode + feature-extract stage for a binary image column.

    ``__init__`` loads the decoder once per actor (the real pattern for
    model-bearing stages); per-batch work is vectorized over payload
    bytes.
    """

    def __init__(self, *, binary_col: str = "payload",
                 id_col: str = "page_id",
                 deterministic_fake: bool = False):
        self.binary_col = binary_col
        self.id_col = id_col
        self.fake = deterministic_fake
        if not deterministic_fake:
            # uncompressed formats decode with the built-in pure-numpy
            # codec; Pillow (absent here) would extend to JPEG/PNG
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError:
                self._pil = None

    def _decode(self, payload: bytes) -> "np.ndarray":
        from nxsearch_ray.functions.imagecodec import decode_image

        arr = decode_image(payload)
        if arr is not None:
            return arr
        if self._pil is not None:       # pragma: no cover - no PIL here
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload))
                              .convert("RGB"))
        raise NotImplementedError(
            "payload is not a PPM/PGM/BMP/PNG/baseline-JPEG image "
            "and Pillow is not installed — WebP/AVIF decode is a "
            "declared stub in this environment")

    def _fake_decode(self, payloads: list[bytes]) -> dict:
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=len(payloads))
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8) \
            .astype(np.uint64)
        offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        h = sequence_hashes(flat, offsets)
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int32)
        height = (splitmix64(h) % np.uint64(1080)
                  + np.uint64(16)).astype(np.int32)
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
        for j in range(FEATURE_DIM):
            feats[:, j] = (splitmix64(h ^ np.uint64(j + 1))
                           .astype(np.float64) / 2.0 ** 64)
        return {"width": width, "height": height,
                "channels": np.full(len(payloads), 3, dtype=np.int8),
                "payload_bytes": lens, "payload_hash": h,
                "features": feats}

    def _real_decode(self, payloads: list[bytes]) -> dict:
        from nxsearch_ray.functions.imagecodec import (
            image_feature_vector,
        )

        n = len(payloads)
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=n)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8) \
            .astype(np.uint64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        h = sequence_hashes(flat, offsets)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        channels = np.zeros(n, dtype=np.int8)
        feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = self._decode(p)       # per image; numpy inside
            height[i], width[i] = arr.shape[0], arr.shape[1]
            channels[i] = arr.shape[2] if arr.ndim == 3 else 1
            feats[i] = image_feature_vector(arr)
        return {"width": width, "height": height, "channels": channels,
                "payload_bytes": lens, "payload_hash": h,
                "features": feats}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in
                    batch.column(self.binary_col).to_pylist()]
        d = (self._fake_decode(payloads) if self.fake
             else self._real_decode(payloads))
        return pa.Table.from_arrays(
            [batch.column(self.id_col).cast(pa.int64()),
             pa.array(d["width"]), pa.array(d["height"]),
             pa.array(d["channels"]), pa.array(d["payload_bytes"]),
             pa.array(d["payload_hash"], type=pa.uint64()),
             pa.FixedSizeListArray.from_arrays(
                 pa.array(d["features"].reshape(-1)), FEATURE_DIM)],
            schema=IMAGE_FEATURES_SCHEMA)


def image_features_stage(ds, *, binary_col: str = "payload",
                         id_col: str = "page_id",
                         deterministic_fake: bool = False,
                         concurrency=(1, 4), batch_size: int = 64):
    """Small batch_size: binary payloads are wide; concurrency × batch
    × payload must fit the worker heap."""
    return ds.map_batches(
        ImageFeatureActor,
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col,
                                   deterministic_fake=deterministic_fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


IMAGE_RESIZE_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("payload", pa.binary()),
])


class ImageResizeActor:
    """Resize stage: binary image in → binary (target_w × target_h)
    image out.

    Real path (default): decode via the pure-numpy codec (PPM/PGM/BMP),
    deterministic nearest-neighbor resize, re-encode as PPM/PGM.
    Fake path: the output buffer is a deterministic stride-gather over
    the input bytes (cyclic when the input is smaller), so downstream
    stages see target-sized payloads — the memory/batching behavior of
    a resize stage without decoding."""

    def __init__(self, target_w: int, target_h: int, *,
                 binary_col: str = "payload", id_col: str = "page_id",
                 deterministic_fake: bool = False):
        self.tw, self.th = int(target_w), int(target_h)
        self.binary_col = binary_col
        self.id_col = id_col
        self.fake = deterministic_fake
        # optional-library route (probed ONCE per actor): where Pillow
        # exists, WebP/AVIF/... decode through it behind the same
        # interface; the pure-numpy codec stays the first path
        self._pil = None
        if not deterministic_fake:
            try:
                from PIL import Image

                self._pil = Image
            except ImportError:
                pass

    def _resize_real(self, p: bytes) -> bytes:
        from nxsearch_ray.functions.imagecodec import (
            decode_image,
            encode_ppm,
            resize_nearest,
        )

        arr = decode_image(p)
        if arr is None and self._pil is not None:
            import io

            arr = np.asarray(
                self._pil.open(io.BytesIO(p)).convert("RGB"))
        if arr is None:
            raise NotImplementedError(
                "payload is not a PPM/PGM/BMP/PNG/baseline-JPEG "
                "image and Pillow is not installed — WebP/AVIF resize "
                "is a declared stub in this environment")
        return encode_ppm(resize_nearest(arr, self.tw, self.th))

    def _resize_fake(self, p: bytes) -> bytes:
        nbytes = self.tw * self.th * 3
        src = np.frombuffer(p or b"\x00", dtype=np.uint8)
        idx = (np.arange(nbytes, dtype=np.int64)
               * max(len(src) // max(nbytes, 1), 1)) % len(src)
        return src[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self._resize_fake if self.fake else self._resize_real
        out = [fn(p) for p in batch.column(self.binary_col).to_pylist()]
        n = batch.num_rows
        return pa.Table.from_arrays(
            [batch.column(self.id_col).cast(pa.int64()),
             pa.array(np.full(n, self.tw, dtype=np.int32)),
             pa.array(np.full(n, self.th, dtype=np.int32)),
             pa.array(out, type=pa.binary())],
            schema=IMAGE_RESIZE_SCHEMA)


def image_resize_stage(ds, target_w: int, target_h: int, *,
                       binary_col: str = "payload",
                       id_col: str = "page_id",
                       deterministic_fake: bool = False,
                       concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_args=(target_w, target_h),
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col,
                                   deterministic_fake=deterministic_fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


AUDIO_FEATURES_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("sample_rate", pa.int32()),
    ("duration_s", pa.float64()),
    ("payload_bytes", pa.int64()),
    ("features", pa.list_(pa.float32(), FEATURE_DIM)),
])


class AudioFeatureActor:
    """Audio decode + feature-extract.

    Real path (default): uncompressed RIFF/WAVE payloads decode with
    the pure-numpy codec (functions/audiocodec.py) into true sample
    rate / duration and real signal features (RMS, ZCR, spectral
    centroid...); compressed formats raise the stub contract unless a
    codec library is present.  Fake path: 16 kHz mono s16 is assumed
    (duration = bytes / 32000) and the feature vector derives from the
    payload hash — deterministic, so two byte-identical clips always
    collide downstream."""

    def __init__(self, *, binary_col: str = "payload",
                 id_col: str = "page_id",
                 deterministic_fake: bool = False):
        self.binary_col = binary_col
        self.id_col = id_col
        self.fake = deterministic_fake
        # optional-library route (probed ONCE per actor): soundfile
        # decodes FLAC/OGG/... where installed; WAV stays pure-numpy
        self._sf = None
        if not deterministic_fake:
            try:
                import soundfile

                self._sf = soundfile
            except ImportError:
                pass

    def _fake(self, payloads: list[bytes], lens, h) -> pa.Table:
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
        for j in range(FEATURE_DIM):
            feats[:, j] = (splitmix64(h ^ np.uint64(0xA0D10 + j))
                           .astype(np.float64) / 2.0 ** 64)
        return (np.full(len(payloads), 16000, dtype=np.int32),
                lens.astype(np.float64) / 32000.0, feats)

    def _real(self, payloads: list[bytes]):
        from nxsearch_ray.functions.audiocodec import (
            audio_feature_vector,
            decode_wav,
        )

        n = len(payloads)
        sr = np.zeros(n, dtype=np.int32)
        dur = np.zeros(n, dtype=np.float64)
        feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            got = decode_wav(p)
            if got is None and self._sf is not None:
                import io

                data, rate = self._sf.read(io.BytesIO(p),
                                           dtype="float32")
                if data.ndim > 1:       # downmix like decode_wav
                    data = data.mean(axis=1)
                got = (data, int(rate))
            if got is None:
                raise NotImplementedError(
                    "payload is not an uncompressed RIFF/WAVE file and "
                    "no audio codec library (soundfile) is installed — "
                    "compressed-format decode is a declared stub in "
                    "this environment")
            samples, rate = got
            sr[i] = rate
            dur[i] = len(samples) / rate
            feats[i] = audio_feature_vector(samples, rate)
        return sr, dur, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in
                    batch.column(self.binary_col).to_pylist()]
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                           count=len(payloads))
        if self.fake:
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8) \
                .astype(np.uint64)
            offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            h = sequence_hashes(flat, offsets)
            sr, dur, feats = self._fake(payloads, lens, h)
        else:
            sr, dur, feats = self._real(payloads)
        return pa.Table.from_arrays(
            [batch.column(self.id_col).cast(pa.int64()),
             pa.array(sr), pa.array(dur), pa.array(lens),
             pa.FixedSizeListArray.from_arrays(
                 pa.array(feats.reshape(-1)), FEATURE_DIM)],
            schema=AUDIO_FEATURES_SCHEMA)


def audio_features_stage(ds, *, binary_col: str = "payload",
                         id_col: str = "page_id",
                         deterministic_fake: bool = False,
                         concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureActor,
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col,
                                   deterministic_fake=deterministic_fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


VIDEO_FRAMES_SCHEMA = pa.schema([
    ("page_id", pa.int64()),
    ("frame_idx", pa.int32()),
    ("pts_s", pa.float64()),
    ("frame", pa.binary()),
])


class VideoFrameSampleActor:
    """Frame-sample stage: one input video row explodes to
    ``num_frames`` frame rows (uniform temporal sampling) — the
    row-expanding layout a real extractor produces, so downstream
    batch sizing / shuffle costs are representative.

    Real path (default): uncompressed YUV4MPEG2 and MJPEG/AVI
    payloads parse with the pure-Python codecs
    (functions/videocodec.py; MJPEG frames are standalone JPEGs
    decoded by functions/jpegcodec.py) — true frame count, true pts
    from the container frame rate, raw planar YUV or standalone-JPEG
    frame bytes out; inter-frame codecs (H.264/VP9) raise the stub
    contract (no codec library here).  Fake path: frame i is a
    deterministic byte
    window at offset i/num_frames into the payload; pts assumes
    30 fps over a bytes-proportional duration."""

    FPS = 30.0

    def __init__(self, num_frames: int, *, frame_bytes: int = 1024,
                 binary_col: str = "payload", id_col: str = "page_id",
                 deterministic_fake: bool = False):
        self.num_frames = int(num_frames)
        self.frame_bytes = int(frame_bytes)
        self.binary_col = binary_col
        self.id_col = id_col
        self.fake = deterministic_fake
        # optional-library route (probed ONCE per actor): imageio's
        # ffmpeg plugin decodes inter-frame codecs where installed
        self._iio = None
        if not deterministic_fake:
            try:
                import imageio.v3 as iio

                self._iio = iio
            except ImportError:
                pass

    def _emit_fake(self, p: bytes, emit) -> None:
        p = p or b"\x00"
        n_total_frames = max(len(p) // self.frame_bytes, 1)
        dur = n_total_frames / self.FPS
        for i in range(self.num_frames):
            start = (i * len(p)) // self.num_frames
            chunk = p[start:start + self.frame_bytes]
            if len(chunk) < self.frame_bytes:       # cyclic pad
                chunk = (chunk + p * (self.frame_bytes // len(p) + 1)
                         )[:self.frame_bytes]
            emit(i, dur * i / self.num_frames, chunk)

    def _emit_real(self, p: bytes, emit) -> None:
        from nxsearch_ray.functions.videocodec import parse_video

        vid = parse_video(p or b"")
        if vid is None and self._iio is not None:
            frames = list(self._iio.imiter(p, plugin="pyav"))
            take = min(self.num_frames, len(frames))
            for i in range(take):
                src = (i * len(frames)) // max(take, 1)
                emit(i, src / self.FPS,
                     np.asarray(frames[src]).tobytes())
            return
        if vid is None:
            raise NotImplementedError(
                "payload is neither YUV4MPEG2 nor MJPEG/AVI and no "
                "video codec library (imageio+pyav/ffmpeg) is "
                "installed — inter-frame codec (H.264/VP9) decode is "
                "a declared stub in this environment")
        take = min(self.num_frames, vid.n_frames)
        for i in range(take):
            src = (i * vid.n_frames) // max(take, 1)
            emit(i, vid.pts(src), vid.frame(src))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        fidx: list[int] = []
        pts: list[float] = []
        frames: list[bytes] = []
        ids = batch.column(self.id_col).to_pylist()
        emit_one = self._emit_fake if self.fake else self._emit_real
        for pid, p in zip(ids,
                          batch.column(self.binary_col).to_pylist()):
            def emit(i, t, chunk, pid=pid):
                ids_out.append(int(pid))
                fidx.append(i)
                pts.append(t)
                frames.append(chunk)

            emit_one(p, emit)
        return pa.Table.from_arrays(
            [pa.array(ids_out, type=pa.int64()),
             pa.array(fidx, type=pa.int32()),
             pa.array(pts, type=pa.float64()),
             pa.array(frames, type=pa.binary())],
            schema=VIDEO_FRAMES_SCHEMA)


def video_frame_sample_stage(ds, num_frames: int, *,
                             frame_bytes: int = 1024,
                             binary_col: str = "payload",
                             id_col: str = "page_id",
                             deterministic_fake: bool = False,
                             concurrency=(1, 4), batch_size: int = 16):
    """batch_size is SMALL: each input row multiplies into
    ``num_frames`` output rows of ``frame_bytes`` each."""
    return ds.map_batches(
        VideoFrameSampleActor,
        fn_constructor_args=(num_frames,),
        fn_constructor_kwargs=dict(frame_bytes=frame_bytes,
                                   binary_col=binary_col, id_col=id_col,
                                   deterministic_fake=deterministic_fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
