"""Baseline JPEG codec in pure numpy + stdlib — no codec library.

Scope (documented, enforced): baseline sequential DCT (SOF0), 8-bit
samples, sampling factors 1-2 per axis — 4:4:4, 4:2:0 (the layout
nearly every camera/web JPEG uses), 4:2:2/4:4:0 and single-component
grayscale — with restart markers. Progressive (SOF2), arithmetic-coded,
12-bit, and exotic-sampling streams raise ValueError, which the
multimodal pipeline turns into the digest pseudo-feature fallback.

Everything here is from the public ITU-T T.81 spec: the FDCT/IDCT are
the orthonormal 8x8 DCT-II as matrix products (A.3.3), entropy coding
is canonical Huffman over (run, size) symbols with DC prediction
(F.1.2), the quantization and Huffman constants are the Annex K tables
with the standard IJG quality scaling. The DECODER reads DQT/DHT from
the stream, so round-trip correctness does not depend on the constants
— they only matter for interop with external encoders.

Like the PNG decoder, the per-block entropy loops run in Python — fine
for the feature-extraction payloads this serves (thumbnails, fixtures),
a clearly-marked hot spot for anything bigger.

Reference parity note: the reference repo (cesium-ml/cesium) has no
media pipeline at all; this module serves the builder-brief multimodal
surface (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "jpeg_features"]

# zigzag scan order as (row, col) pairs (T.81 Figure 5)
ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
)
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

# orthonormal 8-point DCT-II matrix: fwd F = C @ B @ C.T, inv B = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K.1/K.2 quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [int(x, 16) for x in (
        "01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 81 91"
        " a1 08 23 42 b1 c1 15 52 d1 f0 24 33 62 72 82 09 0a 16 17 18 19 1a"
        " 25 26 27 28 29 2a 34 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a 53"
        " 54 55 56 57 58 59 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78 79"
        " 7a 83 84 85 86 87 88 89 8a 92 93 94 95 96 97 98 99 9a a2 a3 a4 a5"
        " a6 a7 a8 a9 aa b2 b3 b4 b5 b6 b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9"
        " ca d2 d3 d4 d5 d6 d7 d8 d9 da e1 e2 e3 e4 e5 e6 e7 e8 e9 ea f1 f2"
        " f3 f4 f5 f6 f7 f8 f9 fa").split()],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [int(x, 16) for x in (
        "00 01 02 03 11 04 05 21 31 06 12 41 51 07 61 71 13 22 32 81 08 14"
        " 42 91 a1 b1 c1 09 23 33 52 f0 15 62 72 d1 0a 16 24 34 e1 25 f1 17"
        " 18 19 1a 26 27 28 29 2a 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a"
        " 53 54 55 56 57 58 59 5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78"
        " 79 7a 82 83 84 85 86 87 88 89 8a 92 93 94 95 96 97 98 99 9a a2 a3"
        " a4 a5 a6 a7 a8 a9 aa b2 b3 b4 b5 b6 b7 b8 b9 ba c2 c3 c4 c5 c6 c7"
        " c8 c9 ca d2 d3 d4 d5 d6 d7 d8 d9 da e2 e3 e4 e5 e6 e7 e8 e9 ea f2"
        " f3 f4 f5 f6 f7 f8 f9 fa").split()],
)


def _huff_codes(bits, values):
    """Canonical Huffman assignment (T.81 C.2): {value: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    """{(length, code): value} for the bit-at-a-time decoder."""
    return {(ln, code): v for v, (code, ln) in _huff_codes(bits, values).items()}


def _scale_qt(table, quality):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s to the byte edge


def _category(v):
    return int(abs(int(v))).bit_length()


def _encode_block(zz, prev_dc, dc_tab, ac_tab, w):
    """One zigzagged quantized block -> bits; returns its DC for the
    next block's prediction."""
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _edge_pad(c: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = c.shape
    p = np.empty((ph, pw))
    p[:h, :w] = c
    p[h:, :w] = c[h - 1:h, :]  # edge replicate
    p[:, w:] = p[:, w - 1:w]
    return p


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray -> baseline JFIF bytes
    (standard Annex K tables at the given IJG quality).
    subsampling: "444" (no chroma subsampling), "420" (2x2 box-averaged
    chroma, the layout nearly every camera/web JPEG uses), or "422"
    (horizontal-only). restart_interval > 0 emits a DRI segment and
    RSTn markers every that many MCUs (DC predictors reset)."""
    img = np.asarray(rgb, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [img.astype(np.float64)]
        hv = [(1, 1)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        try:
            hv = {
                "444": [(1, 1), (1, 1), (1, 1)],
                "420": [(2, 2), (1, 1), (1, 1)],
                "422": [(2, 1), (1, 1), (1, 1)],
            }[subsampling]
        except KeyError:
            raise ValueError(
                f"unknown subsampling {subsampling!r} (444 | 420 | 422)"
            ) from None
    qts = [_scale_qt(_QT_LUMA, quality), _scale_qt(_QT_CHROMA, quality)]
    dc_specs, ac_specs = [_DC_LUMA, _DC_CHROMA], [_AC_LUMA, _AC_CHROMA]
    dc_tabs = [_huff_codes(*s) for s in dc_specs]
    ac_tabs = [_huff_codes(*s) for s in ac_specs]

    hmax = max(hh for hh, _ in hv)
    vmax = max(vv for _, vv in hv)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = []
    for ci, c in enumerate(comps):
        hi, vi = hv[ci]
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by the sampling ratio over the
            # edge-padded full-res plane (exact reshape means)
            fy, fx = vmax // vi, hmax // hi
            full = _edge_pad(c, mcuy * 8 * vmax, mcux * 8 * hmax)
            c = full.reshape(
                full.shape[0] // fy, fy, full.shape[1] // fx, fx
            ).mean(axis=(1, 3))
            planes.append(c)
        else:
            planes.append(_edge_pad(c, mcuy * 8 * vi, mcux * 8 * hi))

    wtr = _BitWriter()
    prev_dc = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                )
                prev_dc = [0] * len(comps)
            mcu += 1
            for ci, p in enumerate(planes):
                hi, vi = hv[ci]
                ti = 0 if ci == 0 else 1
                for v in range(vi):
                    for hh in range(hi):
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        f = _C @ blk @ _C.T
                        q = np.round(f / qts[ti]).astype(np.int32)
                        zz = q[_ZZ_ROWS, _ZZ_COLS]
                        prev_dc[ci] = _encode_block(
                            zz, prev_dc[ci], dc_tabs[ti], ac_tabs[ti], wtr
                        )
    wtr.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    nf = len(comps)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(min(nf, 2)):
        out += seg(0xFFDB, bytes([ti]) + bytes(
            int(qts[ti][r, c]) for r, c in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for ti in range(min(nf, 2)):
        for cls, spec in ((0, dc_specs[ti]), (1, ac_specs[ti])):
            out += seg(0xFFC4, bytes([(cls << 4) | ti])
                       + bytes(spec[0]) + bytes(spec[1]))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bytes(wtr.out)
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """Bit reader over the entropy-coded segment with 0xFF00 unstuffing;
    surfaces RSTn markers as DecodeRestart sentinels."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _Restart(nxt - 0xD0)
            else:
                raise ValueError("unexpected marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self):
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def skip_restart(self):
        """Consume an RSTn marker and realign to the byte edge."""
        self.acc = 0
        self.n = 0
        self.pos += 2


class _Restart(Exception):
    def __init__(self, n):
        self.n = n


def _read_huff(rd, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v, s):
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (or (h, w, 1) gray).
    Supports SOF0, 8-bit, sampling factors 1-2 per axis (4:4:4 / 4:2:0 /
    4:2:2 / 4:4:0; subsampled chroma upsampled nearest), restart
    markers; rejects progressive/arithmetic streams with ValueError.

    Hostile-input contract: EVERY malformed stream raises ValueError —
    the T.81 container has many length/reference pitfalls (truncated
    segments, scans referencing undefined Huffman/quant tables), so in
    addition to the explicit validations, low-level failures
    (struct.error/IndexError/KeyError) are converted at this boundary
    (fuzz-tested)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError, OverflowError) as exc:
        raise ValueError(
            f"malformed JPEG stream ({type(exc).__name__})"
        ) from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts = {}
    dc_tabs, ac_tabs = {}, {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", d[pos + 2:pos + 4])
        body = d[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    t[r, c] = body[i + 1 + k]
                qts[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(nf):
                cid, hvb, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hvb >> 4, hvb & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = sof
    if h <= 0 or w <= 0 or h * w > 1 << 26:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    comp_tabs = {cid: (td, ta) for cid, td, ta in scan}
    for cid, td, ta in scan:
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("JPEG scan references an undefined Huffman table")
    for cid, tq, _hi, _vi in comps:
        if tq not in qts:
            raise ValueError("JPEG component references an undefined quant table")
        if cid not in comp_tabs:
            raise ValueError("JPEG scan does not cover every frame component")

    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU at the component's full resolution,
        # REGARDLESS of the declared sampling factors (real encoders
        # emit grayscale SOFs declaring 2x2). Decoding it as hi*vi
        # interleaved blocks would silently scramble the image.
        cid, tq, _, _ = comps[0]
        comps = [(cid, tq, 1, 1)]
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer JPEG sampling ratio")
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi)) for _, _, hi, vi in comps
    ]
    rd = _BitReader(d, pos)
    prev_dc = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # expect an RSTn here: drain bits to the marker
                try:
                    while True:
                        rd.bit()
                except _Restart:
                    rd.skip_restart()
                    prev_dc = [0] * len(comps)
            mcu += 1
            for ci, (cid, tq, hi, vi) in enumerate(comps):
                td, ta = comp_tabs[cid]
                for v in range(vi):
                    for hh in range(hi):
                        try:
                            s = _read_huff(rd, dc_tabs[td])
                            if s > 11:  # T.81 F.1.2.1: 8-bit DC category <= 11
                                raise ValueError("invalid JPEG DC category")
                            diff = _extend(rd.bits(s), s) if s else 0
                            prev_dc[ci] += diff
                            zz = np.zeros(64, dtype=np.int32)
                            zz[0] = prev_dc[ci]
                            k = 1
                            while k < 64:
                                rs = _read_huff(rd, ac_tabs[ta])
                                r, s = rs >> 4, rs & 0xF
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += r
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(rd.bits(s), s)
                                k += 1
                        except _Restart:
                            raise ValueError("unexpected restart marker")
                        blk = np.zeros((8, 8), dtype=np.float64)
                        blk[_ZZ_ROWS, _ZZ_COLS] = (
                            zz * qts[tq][_ZZ_ROWS, _ZZ_COLS]
                        )
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = (
                            _C.T @ blk @ _C + 128.0
                        )
    # upsample subsampled components to full resolution (nearest), crop
    up = []
    for p, (_, _, hi, vi) in zip(planes, comps):
        if (hi, vi) != (hmax, vmax):
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        up.append(p[:h, :w])
    planes = up
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_features(payload: bytes) -> np.ndarray:
    """8 deterministic image features (layout: media_codecs.
    image_feature_vec; marker 4.0); grayscale broadcasts its single
    channel."""
    from .media_codecs import image_feature_vec

    img = decode_jpeg(payload).astype(np.float64) / 255.0
    rgb = np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img
    return image_feature_vec(rgb, 4.0)
