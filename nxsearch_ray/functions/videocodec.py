"""Pure-Python codec for uncompressed Y4M (YUV4MPEG2) video.

Third member of the imagecodec/audiocodec family: YUV4MPEG2 is a
plain-text header (``YUV4MPEG2 W.. H.. F<num>:<den> ... C420...``)
followed by ``FRAME[ params]\\n`` + raw planar YUV per frame — no
codec library required.  Compressed video (H.264/VP9/...) still needs
one and keeps the stub behavior (``parse_y4m`` returns None for
non-Y4M payloads).
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["Y4MVideo", "parse_y4m", "encode_y4m"]

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


def encode_y4m(frames: list[bytes], width: int, height: int, *,
               fps_num: int = 30, fps_den: int = 1,
               colorspace: str = "420") -> bytes:
    """Raw planar frames → Y4M bytes (test helper / re-emit sink)."""
    head = (f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} "
            f"Ip A1:1 C{colorspace}\n").encode()
    body = b"".join(b"FRAME\n" + f for f in frames)
    return head + body
