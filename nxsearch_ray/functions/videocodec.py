"""Pure-Python video codecs: uncompressed Y4M and MJPEG-in-AVI.

Third member of the imagecodec/audiocodec family: YUV4MPEG2 is a
plain-text header (``YUV4MPEG2 W.. H.. F<num>:<den> ... C420...``)
followed by ``FRAME[ params]\\n`` + raw planar YUV per frame.
Motion-JPEG in an AVI container (the classic camera/webcam format) is
a RIFF chunk walk whose ``00dc`` frames are standalone baseline JPEGs
— decoded by `functions/jpegcodec.py`, so "compressed video" is real
for MJPEG.  Inter-frame codecs (H.264/VP9/...) still need a codec
library and keep the stub behavior (``parse_video`` returns None for
unknown payloads).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["Y4MVideo", "parse_y4m", "encode_y4m",
           "AviMjpegVideo", "parse_avi_mjpeg", "encode_avi_mjpeg",
           "parse_video"]

_PLANE_FACTORS = {            # bytes per pixel pair-of-planes factor
    "420": 1.5, "420jpeg": 1.5, "420paldv": 1.5, "420mpeg2": 1.5,
    "422": 2.0, "444": 3.0, "mono": 1.0,
}


@dataclass
class Y4MVideo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    frame_offsets: list[int]      # byte offset of each frame's DATA
    frame_size: int
    buf: bytes

    @property
    def n_frames(self) -> int:
        return len(self.frame_offsets)

    @property
    def fps(self) -> float:
        return self.fps_num / max(self.fps_den, 1)

    def frame(self, i: int) -> bytes:
        off = self.frame_offsets[i]
        return self.buf[off:off + self.frame_size]

    def pts(self, i: int) -> float:
        return i / self.fps if self.fps > 0 else 0.0


def parse_y4m(buf: bytes) -> Y4MVideo | None:
    """Parse an uncompressed YUV4MPEG2 payload; None when the magic is
    absent (a compressed format needing a codec library); ValueError on
    a malformed Y4M."""
    if not buf.startswith(b"YUV4MPEG2"):
        return None
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = 0
    num, den = 30, 1
    cs = "420"
    for tok in buf[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            a, b = val.split(b":")
            num, den = int(a), int(b)
        elif tag == b"C":
            cs = val.decode()
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    factor = _PLANE_FACTORS.get(cs)
    if factor is None:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    frame_size = int(w * h * factor)
    offsets: list[int] = []
    pos = nl + 1
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_size > n:
            raise ValueError("truncated Y4M frame")
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_size
    return Y4MVideo(width=w, height=h, fps_num=num, fps_den=den,
                    colorspace=cs, frame_offsets=offsets,
                    frame_size=frame_size, buf=buf)


@dataclass
class AviMjpegVideo:
    """Same surface as Y4MVideo; ``frame(i)`` returns the i-th frame's
    standalone JPEG bytes (decodable by jpegcodec/decode_image)."""

    width: int
    height: int
    usec_per_frame: int
    frame_spans: list[tuple[int, int]]     # (offset, size) in buf
    buf: bytes

    @property
    def n_frames(self) -> int:
        return len(self.frame_spans)

    @property
    def fps(self) -> float:
        return 1_000_000 / max(self.usec_per_frame, 1)

    def frame(self, i: int) -> bytes:
        off, size = self.frame_spans[i]
        return self.buf[off:off + size]

    def pts(self, i: int) -> float:
        return i * self.usec_per_frame / 1_000_000


def _riff_chunks(buf: bytes, pos: int, end: int):
    """(fourcc, payload_start, payload_size) per chunk; LIST payloads
    start AFTER their type fourcc, which is yielded as the id."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        start = pos + 8
        if start + size > end:
            raise ValueError("truncated AVI chunk")
        if fourcc == b"LIST":
            yield buf[start:start + 4], start + 4, size - 4
        else:
            yield fourcc, start, size
        pos = start + size + (size & 1)    # chunks are word-aligned


def parse_avi_mjpeg(buf: bytes) -> "AviMjpegVideo | None":
    """Parse an AVI container holding MJPEG frames; None when the RIFF
    magic is absent, ValueError on a malformed or non-MJPEG AVI."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack("<I", buf[4:8])
    end = min(8 + riff_size, len(buf))
    w = h = 0
    usec = 33333
    spans: list[tuple[int, int]] = []
    saw_movi = False
    for cid, start, size in _riff_chunks(buf, 12, end):
        if cid == b"hdrl":
            for hid, hstart, hsize in _riff_chunks(buf, start,
                                                   start + size):
                if hid == b"avih" and hsize >= 40:
                    usec = struct.unpack(
                        "<I", buf[hstart:hstart + 4])[0] or usec
                    w, h = struct.unpack(
                        "<II", buf[hstart + 32:hstart + 40])
        elif cid == b"movi":
            saw_movi = True
            # frame chunks may sit directly in 'movi' or be grouped
            # inside nested 'rec ' LISTs (interleaved AVIs)
            stack = [(start, start + size)]
            while stack:
                s, e = stack.pop()
                for fid, fstart, fsize in _riff_chunks(buf, s, e):
                    if fid == b"rec ":
                        stack.append((fstart, fstart + fsize))
                    elif fid[2:4] in (b"dc", b"db"):
                        if buf[fstart:fstart + 2] != b"\xff\xd8":
                            raise ValueError(
                                "AVI stream is not MJPEG (frame without "
                                "JPEG SOI) — inter-frame codecs need a "
                                "codec library")
                        spans.append((fstart, fsize))
    if not saw_movi:
        raise ValueError("AVI without a movi list")
    return AviMjpegVideo(width=w, height=h, usec_per_frame=usec,
                         frame_spans=spans, buf=buf)


def parse_video(buf: bytes):
    """Y4MVideo | AviMjpegVideo | None (unknown container)."""
    v = parse_y4m(buf)
    if v is not None:
        return v
    return parse_avi_mjpeg(buf)


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(data)) + data + \
        (b"\x00" if len(data) & 1 else b"")


def _list(ltype: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", ltype + data)


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int,
                     height: int, *, fps: float = 30.0) -> bytes:
    """Standalone JPEG frames → minimal MJPEG AVI (test helper /
    re-emit sink)."""
    usec = int(round(1_000_000 / max(fps, 1e-9)))
    n = len(jpeg_frames)
    maxf = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack("<10I", usec, 0, 0, 0, n, 0, 1, maxf,
                       width, height) + b"\x00" * 16
    strh = (b"vidsMJPG" + struct.pack("<IHHIIIIIII", 0, 0, 0, 0,
                                      1, int(round(max(fps, 1e-9))),
                                      0, n, maxf, 0)
            + struct.pack("<I", 0) + struct.pack("<4H", 0, 0,
                                                 width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi",
                 b"".join(_chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_y4m(frames: list[bytes], width: int, height: int, *,
               fps_num: int = 30, fps_den: int = 1,
               colorspace: str = "420") -> bytes:
    """Raw planar frames → Y4M bytes (test helper / re-emit sink)."""
    head = (f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} "
            f"Ip A1:1 C{colorspace}\n").encode()
    body = b"".join(b"FRAME\n" + f for f in frames)
    return head + body
