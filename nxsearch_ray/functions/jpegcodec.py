"""Pure-numpy JPEG codec — baseline and progressive (ITU-T T.81).

Decode: marker parse (DQT/SOF0/DHT/DRI/SOS), Huffman entropy decode
with byte-unstuffing and restart-marker handling, dequantize,
un-zigzag, vectorized IDCT (orthonormal DCT-II matrix sandwich),
chroma upsample for any sampling factors in {1, 2}, JFIF BT.601
YCbCr→RGB.  Encode (the test-side twin and corpus-export path):
4:4:4 or 4:2:0, Annex-K-style quantization scaled by a quality knob,
one Huffman table per (DC/AC × luma/chroma) emitted in DHT — the
decoder reads every table from the stream, so the two sides are
self-consistent by construction and the decoder works for any
baseline stream, not just ours.

Baseline sequential (SOF0) AND progressive (SOF2, spec Annex G:
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB-run coding) are implemented at 8-bit;
arithmetic coding and 12-bit raise ValueError with the marker name, mirroring how the uncompressed codecs reject what they
can't parse.  Entropy decoding is a per-symbol Python loop — the
irreducible part of Huffman streams — while all block math (DCT,
quantization, color transform, up/downsampling) is vectorized over
every block of the image at once.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# ------------------------------------------------------------------
# shared constants

# zigzag position -> natural (row*8+col) index: anti-diagonals, odd
# diagonals walked with row ascending, even with column ascending
_ZIGZAG = np.array(sorted(
    range(64),
    key=lambda n: ((n >> 3) + (n & 7),
                   (n >> 3) if ((n >> 3) + (n & 7)) % 2 else (n & 7))),
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)   # natural index -> zigzag position

# Annex K.1 quantization tables (row-major)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]):
    """(code, length) per value + a decode map {(length, code): value}."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            v = vals[i]
            enc[v] = (code, length)
            dec[(length, code)] = v
            code += 1
            i += 1
        code <<= 1
    return enc, dec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "restart marker inside an entropy segment")
            else:
                self.marker = nxt
                raise _EndOfScan()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            v = dec.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Drop the segment's padding bits and consume the RSTn
        marker sitting at the current byte position."""
        self.acc = 0
        self.nbits = 0
        if not (self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _EndOfScan(Exception):
    pass


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, C) uint8, C ∈ {1, 3}."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    dri = 0
    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = buf[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:                       # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if len(seg) < seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                # kept in zigzag order — dequantization happens in
                # zigzag space, before the natural-order gather
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1) \
                    .astype(np.float64)
                i += 65
        elif m == 0xC0:                     # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), \
                seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = [{"id": seg[6 + 3 * i],
                      "hs": seg[7 + 3 * i] >> 4,
                      "vs": seg[7 + 3 * i] & 15,
                      "tq": seg[8 + 3 * i]} for i in range(nc)]
            for c in comps:
                if c["hs"] not in (1, 2) or c["vs"] not in (1, 2):
                    raise ValueError(
                        f"sampling factor {c['hs']}x{c['vs']} "
                        "unsupported")
        elif m == 0xC2:                     # SOF2 progressive
            return _decode_progressive(buf)
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{m:02X}) unsupported")
        elif m == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                _, dec = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + nv
        elif m == 0xDD:                     # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:                     # SOS
            ns = seg[0]
            scan = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4,
                                     seg[2 + 2 * i] & 15)
                    for i in range(ns)}
            pos += seglen
            return _decode_scan(buf, pos, h, w, comps, scan, qt,
                                huff_dc, huff_ac, dri)
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(buf, pos, h, w, comps, scan, qt, huff_dc, huff_ac,
                 dri) -> np.ndarray:
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        c["pred"] = 0
    rd = _BitReader(buf, pos)
    nmcu = mcux * mcuy
    mcu = 0
    try:
        while mcu < nmcu:
            if dri and mcu and mcu % dri == 0:
                rd.restart()
                for c in comps:
                    c["pred"] = 0
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dc_dec = huff_dc[scan[c["id"]][0]]
                ac_dec = huff_ac[scan[c["id"]][1]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = np.zeros(64, dtype=np.float64)
                        s = rd.huff(dc_dec)
                        diff = _extend(rd.bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_dec)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient overrun")
                            blk[k] = _extend(rd.bits(s), s)
                            k += 1
                        row = my * c["vs"] + by
                        col = mx * c["hs"] + bx
                        c["coef"][row * c["bw"] + col] = blk
            mcu += 1
    except (_EndOfScan, IndexError) as exc:
        if mcu < nmcu:
            raise ValueError("truncated JPEG scan") from exc

    return _finish_planes(comps, qt, h, w, hmax, vmax)


def _decode_progressive(buf: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2, spec §G): coefficients accumulate over
    multiple scans — DC first/refine (interleaved), AC band
    first/refine (single-component, spectral selection + successive
    approximation) — then one shared dequant/IDCT tail."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = 1
    dri = 0
    n = len(buf)
    while pos < n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = buf[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if len(seg) < seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1) \
                    .astype(np.float64)
                i += 65
        elif m == 0xC2:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), \
                seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = [{"id": seg[6 + 3 * i],
                      "hs": seg[7 + 3 * i] >> 4,
                      "vs": seg[7 + 3 * i] & 15,
                      "tq": seg[8 + 3 * i]} for i in range(nc)]
            for c in comps:
                if c["hs"] not in (1, 2) or c["vs"] not in (1, 2):
                    raise ValueError(
                        f"sampling factor {c['hs']}x{c['vs']} "
                        "unsupported")
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["hs"]
                c["bh"] = mcuy * c["vs"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64),
                                     dtype=np.int64)
                # non-interleaved scan grid (true component dims)
                c["nbw"] = -(-(-(-w * c["hs"] // hmax)) // 8)
                c["nbh"] = -(-(-(-h * c["vs"] // vmax)) // 8)
                c["mcux"], c["mcuy"] = mcux, mcuy
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                _, dec = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + nv
        elif m == 0xDD:
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scomps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                       seg[2 + 2 * i] & 15) for i in range(ns)]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            pos = _progressive_scan(
                buf, pos + seglen, comps, scomps, ss, se, ah, al,
                huff_dc, huff_ac, dri)
            continue
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed SOF markers in one stream")
        pos += seglen
    if not comps:
        raise ValueError("progressive JPEG missing SOF2")
    return _finish_planes(comps, qt, h, w, hmax, vmax)


def _progressive_scan(buf, pos, comps, scomps, ss, se, ah, al,
                      huff_dc, huff_ac, dri) -> int:
    """Decode one progressive scan into the components' coefficient
    arrays; returns the byte position of the next marker."""
    rd = _BitReader(buf, pos)
    by_id = {c["id"]: c for c in comps}
    if ss == 0:                               # DC scan (interleaved)
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        sel = [by_id[cid] for cid, *_ in scomps]
        tdc = {cid: td for cid, td, _ in scomps}
        for c in sel:
            c["pred"] = 0
        single = len(sel) == 1
        if single:
            c = sel[0]
            nmcu = c["nbw"] * c["nbh"]
        else:
            nmcu = sel[0]["mcux"] * sel[0]["mcuy"]
        mcu = 0
        try:
            while mcu < nmcu:
                if dri and mcu and mcu % dri == 0:
                    rd.restart()
                    for c in sel:
                        c["pred"] = 0
                if single:
                    c = sel[0]
                    row, col = divmod(mcu, c["nbw"])
                    blocks = [(c, row * c["bw"] + col)]
                else:
                    my, mx = divmod(mcu, sel[0]["mcux"])
                    blocks = [
                        (c, (my * c["vs"] + by) * c["bw"]
                         + mx * c["hs"] + bx)
                        for c in sel
                        for by in range(c["vs"])
                        for bx in range(c["hs"])]
                for c, bi in blocks:
                    if ah == 0:
                        s = rd.huff(huff_dc[tdc[c["id"]]])
                        diff = _extend(rd.bits(s), s) if s else 0
                        c["pred"] += diff
                        c["coef"][bi, 0] = c["pred"] << al
                    else:
                        if rd.bits(1):
                            c["coef"][bi, 0] |= (1 << al)
                mcu += 1
        except (_EndOfScan, IndexError) as exc:
            raise ValueError("truncated progressive DC scan") from exc
        return rd.pos

    # AC scan: single component, non-interleaved block raster
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, _, ta = scomps[0]
    c = by_id[cid]
    ac = huff_ac[ta]
    nblk = c["nbw"] * c["nbh"]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    try:
        for blk in range(nblk):
            if dri and blk and blk % dri == 0:
                rd.restart()
                eobrun = 0
            row, col = divmod(blk, c["nbw"])
            coef = c["coef"][row * c["bw"] + col]
            if ah == 0:                       # first pass for the band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = rd.huff(ac)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient overrun")
                    coef[k] = _extend(rd.bits(s), s) << al
                    k += 1
            else:                             # refinement pass
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = rd.huff(ac)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r)
                                if r:
                                    eobrun += rd.bits(r)
                                break
                            val = 0           # ZRL: 16 zero-history
                        elif s == 1:
                            val = p1 if rd.bits(1) else m1
                        else:
                            raise ValueError(
                                "invalid refinement magnitude")
                        # advance over r zero-history coefficients,
                        # correcting nonzero-history ones on the way
                        while k <= se:
                            if coef[k] != 0:
                                if rd.bits(1) and not (coef[k] & p1):
                                    coef[k] += p1 if coef[k] > 0 \
                                        else m1
                            else:
                                if r == 0:
                                    if val:
                                        coef[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if coef[k] != 0:
                            if rd.bits(1) and not (coef[k] & p1):
                                coef[k] += p1 if coef[k] > 0 else m1
                        k += 1
                    eobrun -= 1
    except (_EndOfScan, IndexError) as exc:
        raise ValueError("truncated progressive AC scan") from exc
    return rd.pos


def _finish_planes(comps, qt, h, w, hmax, vmax) -> np.ndarray:
    """Shared decode tail: dequantize (zigzag space), IDCT, chroma
    upsample, color transform."""
    planes = []
    for c in comps:
        # coef rows and the DQT payload are both in zigzag order:
        # dequantize there, then gather natural order
        q = qt[c["tq"]]
        blocks = (np.asarray(c["coef"], dtype=np.float64)
                  * q)[:, _UNZIGZAG].reshape(-1, 8, 8)
        # IDCT: D.T @ B @ D, batched
        px = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT)
        px = np.clip(np.round(px + 128), 0, 255)
        bh, bw = c["bh"], c["bw"]
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["vs"], axis=0),
                          hmax // c["hs"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)


# ------------------------------------------------------------------
# encoder

# Annex K.3 typical Huffman tables: (bits[16], values) per class.
# The decoder never assumes these — they ride in DHT — so even a
# transcription slip would stay self-consistent; the tests verify the
# prefix property and a known-value round-trip regardless.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


# Flat (equal-length) Huffman tables for the progressive encoder:
# grossly suboptimal for size, trivially valid (complete prefix code,
# all-ones codeword unused), and they cover every (run, size) symbol
# including the EOBn codes 0x10..0xE0 that Annex K's baseline tables
# lack.  The decoder reads tables from DHT, so it still exercises the
# general path.
_FLAT_DC = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(16)))
_FLAT_AC = ([0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
            list(range(256)))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad the partial byte with 1-bits (spec padding)."""
        if self.nbits:
            self.bits((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def raw(self, b: bytes) -> None:
        """Emit marker bytes verbatim (no stuffing) — caller must have
        aligned first."""
        self.out.extend(b)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * s + 50) / 100), 1, 255)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (nblocks, 64) int zigzagged coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8) \
        .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T)
    coef = np.round(coef.reshape(-1, 64) / q.reshape(-1))
    return coef[:, _ZIGZAG].astype(np.int64)


def _encode_blocks(wr, coefs, order, dc_enc, ac_enc, preds, ci):
    """Entropy-encode blocks of one component in `order`."""
    for bi in order:
        blk = coefs[bi]
        diff = int(blk[0]) - preds[ci]
        preds[ci] = int(blk[0])
        s = _category(diff)
        code, ln = dc_enc[s]
        wr.bits(code, ln)
        if s:
            wr.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                wr.bits(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_enc[(run << 4) | s]
            wr.bits(code, ln)
            wr.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_enc[0x00]
            wr.bits(code, ln)


def _emit_ac_first(wr, blocks, ac_enc, ss, se, al) -> None:
    """AC first pass (spec §G.1.2.2): band coefficients point-
    transformed toward zero, zero runs + EOB-run coding.
    ``blocks`` is any iterable of 64-coefficient rows in the scan's
    block order."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_enc[r << 4]
            wr.bits(code, ln)
            if r:
                wr.bits(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        v = [(abs(int(x)) >> al) * (1 if x >= 0 else -1)
             for x in blk[ss:se + 1]]
        nz = [i for i, x in enumerate(v) if x]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            x = v[i]
            if x == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_enc[0xF0]
                wr.bits(code, ln)
                r -= 16
            s = _category(x)
            code, ln = ac_enc[(r << 4) | s]
            wr.bits(code, ln)
            wr.bits(x if x >= 0 else x + (1 << s) - 1, s)
            r = 0
        if nz[-1] < len(v) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(wr, blocks, ac_enc, ss, se, al) -> None:
    """AC refinement pass (spec §G.1.2.3 / figure G.7): newly-
    significant coefficients as (run,1)+sign, correction bits for
    already-significant ones buffered per the two-buffer discipline
    (BE rides with the pending EOB run, BR with the current symbol)."""
    eobrun = 0
    be: list[int] = []

    def flush_eobrun() -> None:
        nonlocal eobrun, be
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_enc[r << 4]
            wr.bits(code, ln)
            if r:
                wr.bits(eobrun - (1 << r), r)
            for b in be:
                wr.bits(b, 1)
            eobrun = 0
            be = []

    for blk in blocks:
        band = [int(x) for x in blk[ss:se + 1]]
        amp = [abs(x) >> al for x in band]
        sig_new = [i for i, a in enumerate(amp) if a == 1
                   and (a >> 1) == 0 and abs(band[i]) >> (al + 1) == 0]
        eob = sig_new[-1] if sig_new else -1
        r = 0
        br: list[int] = []
        for k, x in enumerate(band):
            a = amp[k]
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eobrun()
                code, ln = ac_enc[0xF0]
                wr.bits(code, ln)
                r -= 16
                for b in br:
                    wr.bits(b, 1)
                br = []
            if a > 1:                    # already significant
                br.append(a & 1)
                continue
            flush_eobrun()
            code, ln = ac_enc[(r << 4) | 1]
            wr.bits(code, ln)
            wr.bits(1 if x > 0 else 0, 1)
            for b in br:
                wr.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()


def encode_jpeg_progressive(arr: np.ndarray, *, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """(H, W, {1,3}) or (H, W) uint8 → progressive JPEG (SOF2):
    4:4:4 or 4:2:0, scan script DC(Al=1) → per-component AC 1-63
    (Al=1) → DC refine → per-component AC refine.  Same quantized
    coefficients as the baseline encoder at the same quality and
    subsampling, so decode output is bit-identical to the baseline
    stream's."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive expects 1 or 3 "
                         "channels")
    gray = nc == 1
    sub = 2 if (subsample and not gray) else 1

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128]

    align = 8 * sub
    ph, pw = -(-h // align) * align, -(-w // align) * align

    def pad(p):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    planes[0] = pad(planes[0])
    for i in range(1, len(planes)):
        p = pad(planes[i])
        if sub == 2:
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes[i] = p

    qly = _scaled_qt(_QT_LUMA, quality)
    qlc = _scaled_qt(_QT_CHROMA, quality)
    coefs = [_fdct_quant(planes[0], qly)] + \
        [_fdct_quant(p, qlc) for p in planes[1:]]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker,
                               len(payload) + 2) + payload)

    for tq, q in ((0, qly), (1, qlc))[:1 if gray else 2]:
        seg(0xDB, bytes([tq]) + bytes(
            q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    comps = b"".join(
        bytes([i + 1, (sub << 4 | sub) if i == 0 and sub == 2
               else 0x11, 0 if i == 0 else 1])
        for i in range(1 if gray else 3))
    seg(0xC2, struct.pack(">BHHB", 8, h, w, 1 if gray else 3) + comps)
    seg(0xC4, bytes([0x00]) + bytes(_FLAT_DC[0]) + bytes(_FLAT_DC[1]))
    seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC[0]) + bytes(_FLAT_AC[1]))
    dc_enc, _ = _build_huffman(*_FLAT_DC)
    ac_enc, _ = _build_huffman(*_FLAT_AC)

    ncomp = 1 if gray else 3
    all_ids = list(range(1, ncomp + 1))

    def sos(comp_ids, ss, se, ah, al) -> None:
        payload = bytes([len(comp_ids)]) + b"".join(
            bytes([cid, 0x00]) for cid in comp_ids) + \
            bytes([ss, se, (ah << 4) | al])
        seg(0xDA, payload)

    # per-component block geometry: padded (MCU) grid for DC scans,
    # TRUE grid (ceil of component sample dims / 8) for AC scans
    ybw = pw // 8
    cbw = pw // (8 * sub)
    mcux, mcuy = pw // (8 * sub), ph // (8 * sub)

    def mcu_blocks(i):
        """(ci, block_index) sequence of MCU i, interleaved order."""
        my, mx = divmod(i, mcux)
        if sub == 2:
            for by in range(2):
                for bx in range(2):
                    yield 0, (my * 2 + by) * ybw + (mx * 2 + bx)
        else:
            yield 0, my * ybw + mx
        for ci in range(1, ncomp):
            yield ci, my * cbw + mx

    def true_grid(ci):
        """Block rows of component ci's TRUE (non-interleaved) grid."""
        if ci == 0:
            nbw, nbh, stride = -(-w // 8), -(-h // 8), ybw
        else:
            cw, chh = -(-w // sub), -(-h // sub)
            nbw, nbh, stride = -(-cw // 8), -(-chh // 8), cbw
        return [coefs[ci][r * stride + c]
                for r in range(nbh) for c in range(nbw)]

    # scan 1: DC first, Al=1, interleaved MCU order
    sos(all_ids, 0, 0, 0, 1)
    wr = _BitWriter()
    preds = [0] * ncomp
    for i in range(mcux * mcuy):
        for ci, bi in mcu_blocks(i):
            v = int(coefs[ci][bi][0]) >> 1
            diff = v - preds[ci]
            preds[ci] = v
            s = _category(diff)
            code, ln = dc_enc[s]
            wr.bits(code, ln)
            if s:
                wr.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out.extend(wr.flush())

    # scans 2..: AC first per component, band 1-63, Al=1 (true grid)
    for ci in range(ncomp):
        sos([ci + 1], 1, 63, 0, 1)
        wr = _BitWriter()
        _emit_ac_first(wr, true_grid(ci), ac_enc, 1, 63, 1)
        out.extend(wr.flush())

    # DC refinement: one raw bit per block, interleaved MCU order
    sos(all_ids, 0, 0, 1, 0)
    wr = _BitWriter()
    for i in range(mcux * mcuy):
        for ci, bi in mcu_blocks(i):
            wr.bits(int(coefs[ci][bi][0]) & 1, 1)
    out.extend(wr.flush())

    # AC refinement per component (true grid)
    for ci in range(ncomp):
        sos([ci + 1], 1, 63, 1, 0)
        wr = _BitWriter()
        _emit_ac_refine(wr, true_grid(ci), ac_enc, 1, 63, 0)
        out.extend(wr.flush())

    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg(arr: np.ndarray, *, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W, {1,3}) or (H, W) uint8 → baseline JPEG bytes
    (4:4:4, or 4:2:0 with ``subsample=True``; 3-channel input is RGB;
    ``restart_interval`` emits DRI + RSTn every that many MCUs)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    gray = nc == 1
    sub = 2 if (subsample and not gray) else 1

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]

    align = 8 * sub
    ph = -(-h // align) * align
    pw = -(-w // align) * align

    def pad(p, th, tw):
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                      mode="edge")

    planes[0] = pad(planes[0], ph, pw)
    for i in range(1, len(planes)):
        p = pad(planes[i], ph, pw)
        if sub == 2:
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes[i] = p

    qly = _scaled_qt(_QT_LUMA, quality)
    qlc = _scaled_qt(_QT_CHROMA, quality)
    coefs = [_fdct_quant(planes[0], qly)] + \
        [_fdct_quant(p, qlc) for p in planes[1:]]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker,
                               len(payload) + 2) + payload)

    for tq, q in ((0, qly), (1, qlc))[:1 if gray else 2]:
        seg(0xDB, bytes([tq]) + bytes(
            q.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    comps = b"".join(
        bytes([i + 1, (sub << 4 | sub) if i == 0 and sub == 2
               else 0x11, 0 if i == 0 else 1])
        for i in range(1 if gray else 3))
    seg(0xC0, struct.pack(">BHHB", 8, h, w, 1 if gray else 3) + comps)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)] if gray else \
        [(0x00, _DC_LUMA), (0x10, _AC_LUMA),
         (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (bits, vals) in tables:
        seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    scomps = b"".join(bytes([i + 1, 0x00 if i == 0 else 0x11])
                      for i in range(1 if gray else 3))
    seg(0xDA, bytes([1 if gray else 3]) + scomps + b"\x00\x3f\x00")

    dc_l, _ = _build_huffman(*_DC_LUMA)
    ac_l, _ = _build_huffman(*_AC_LUMA)
    dc_c, _ = _build_huffman(*_DC_CHROMA)
    ac_c, _ = _build_huffman(*_AC_CHROMA)
    wr = _BitWriter()
    preds = [0, 0, 0]
    ybw = pw // 8
    cbw = pw // (8 * sub)
    mcux = pw // (8 * sub)
    mcuy = ph // (8 * sub)
    nmcu = mcux * mcuy
    rst = 0
    for mcu in range(nmcu):
        my, mx = divmod(mcu, mcux)
        if sub == 2:
            order = [(my * 2 + by) * ybw + (mx * 2 + bx)
                     for by in range(2) for bx in range(2)]
        else:
            order = [my * ybw + mx]
        _encode_blocks(wr, coefs[0], order, dc_l, ac_l, preds, 0)
        if not gray:
            for ci in (1, 2):
                _encode_blocks(wr, coefs[ci], [my * cbw + mx],
                               dc_c, ac_c, preds, ci)
        if restart_interval and mcu != nmcu - 1 \
                and (mcu + 1) % restart_interval == 0:
            wr.align()
            wr.raw(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            preds[:] = [0, 0, 0]
    out.extend(wr.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)
