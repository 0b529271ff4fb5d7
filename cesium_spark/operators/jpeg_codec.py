"""JPEG codec in pure numpy + stdlib — no codec library.

Scope (documented, enforced): baseline sequential DCT (SOF0) AND
progressive DCT (SOF2: spectral selection + successive approximation,
T.81 Annex G — the layout most real web JPEGs use), 8-bit samples,
sampling factors 1-2 per axis — 4:4:4, 4:2:0 (the layout nearly every
camera/web JPEG uses), 4:2:2/4:4:0 and single-component grayscale —
with restart markers. Arithmetic-coded, hierarchical, 12-bit, and
exotic-sampling streams raise ValueError, which the multimodal
pipeline turns into the digest pseudo-feature fallback.

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


# Progressive AC scans additionally need the EOBn symbols (r<<4 | 0 for
# r = 0..14: end-of-band runs of 2^r..2^(r+1)-1 blocks, T.81 G.1.2.2),
# which the Annex K sequential tables don't contain. One flat table
# covers every symbol a progressive AC scan can emit — EOBn, ZRL, and
# (run, size) for size 1..10 (8-bit quantized AC magnitudes fit in 10
# bits) — all at 9 bits: 176 symbols, canonical codes 0..175, the
# all-ones code unused as T.81 requires. Compression is worse than a
# tuned table; the decoder reads whatever DHT the stream declares, so
# interop is unaffected.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
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


def _pt_ac(v: int, al: int) -> int:
    """AC successive-approximation point transform: integer division by
    2^al truncating TOWARD ZERO (T.81 G.1.2.2 — unlike the DC point
    transform, which is an arithmetic right shift, G.1.2.1)."""
    v = int(v)
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray -> JFIF bytes
    (standard Annex K tables at the given IJG quality).
    subsampling: "444" (no chroma subsampling), "420" (2x2 box-averaged
    chroma, the layout nearly every camera/web JPEG uses), or "422"
    (horizontal-only). restart_interval > 0 emits a DRI segment and
    RSTn markers every that many MCUs (DC predictors reset).

    progressive=True emits an SOF2 stream with a scan script exercising
    every progressive scan kind (T.81 Annex G): successive-approximation
    DC first (Al=1) + DC refinement, and per-component spectral-selection
    AC first scans over two bands at Al=2 followed by two refinement
    passes (Ah=2->Al=1, Ah=1->Al=0) with EOB-run accumulation. The
    quantized coefficients are IDENTICAL to the baseline encoding of the
    same image, so both decode to the same pixels bit-for-bit."""
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

    # quantized zigzag coefficients per component, (nby, nbx, 64) — the
    # shared substrate of the baseline and progressive writers (identical
    # coefficients => identical decoded pixels either way, which is what
    # the progressive conformance tests assert)
    all_zz = []
    for ci, p in enumerate(planes):
        ti = 0 if ci == 0 else 1
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        zz = np.empty((nby, nbx, 64), dtype=np.int32)
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                f = _C @ blk @ _C.T
                q = np.round(f / qts[ti]).astype(np.int32)
                zz[by, bx] = q[_ZZ_ROWS, _ZZ_COLS]
        all_zz.append(zz)

    nf = len(comps)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos_seg(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for cid, td, ta in scan_comps:
            body += bytes([cid, (td << 4) | ta])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(min(nf, 2)):
        out += seg(0xFFDB, bytes([ti]) + bytes(
            int(qts[ti][r, c]) for r, c in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    for ti in range(min(nf, 2)):
        out += seg(0xFFC4, bytes([ti])
                   + bytes(dc_specs[ti][0]) + bytes(dc_specs[ti][1]))
        ac_spec = _AC_PROG if progressive else ac_specs[ti]
        out += seg(0xFFC4, bytes([(1 << 4) | ti])
                   + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    if not progressive:
        wtr = _BitWriter()
        prev_dc = [0] * nf
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    wtr.flush()
                    wtr.out += bytes(
                        [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
                    )
                    prev_dc = [0] * nf
                mcu += 1
                for ci in range(nf):
                    hi, vi = hv[ci]
                    ti = 0 if ci == 0 else 1
                    for v in range(vi):
                        for hh in range(hi):
                            prev_dc[ci] = _encode_block(
                                all_zz[ci][my * vi + v, mx * hi + hh],
                                prev_dc[ci], dc_tabs[ti], ac_tabs[ti], wtr,
                            )
        wtr.flush()
        out += sos_seg(
            [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
             for ci in range(nf)], 0, 63, 0, 0)
        out += bytes(wtr.out)
        out += b"\xff\xd9"  # EOI
        return out

    # ---------------- progressive (SOF2) scan script ----------------
    ac_prog_tab = _huff_codes(*_AC_PROG)
    hmax_, vmax_ = hmax, vmax

    def comp_grid(ci):
        """Non-interleaved block grid of component ci (T.81 A.2.2)."""
        hi, vi = hv[ci]
        cw = -(-w * hi // hmax_)
        ch = -(-h * vi // vmax_)
        return -(-ch // 8), -(-cw // 8)

    def dc_first_scan(al):
        wtr = _BitWriter()
        prev = [0] * nf
        if nf > 1:
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        wtr.flush()
                        wtr.out += bytes(
                            [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                        prev = [0] * nf
                    mcu += 1
                    for ci in range(nf):
                        hi, vi = hv[ci]
                        for v in range(vi):
                            for hh in range(hi):
                                dc = int(all_zz[ci][my * vi + v, mx * hi + hh, 0]) >> al
                                diff = dc - prev[ci]
                                prev[ci] = dc
                                s = _category(diff)
                                c, ln = dc_tabs[0 if ci == 0 else 1][s]
                                wtr.write(c, ln)
                                if s:
                                    wtr.write(
                                        diff if diff >= 0
                                        else diff + (1 << s) - 1, s)
        else:
            nch, ncw = comp_grid(0)
            blk = 0
            for by in range(nch):
                for bx in range(ncw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        wtr.flush()
                        wtr.out += bytes(
                            [0xFF, 0xD0 + ((blk // restart_interval - 1) % 8)])
                        prev = [0]
                    blk += 1
                    dc = int(all_zz[0][by, bx, 0]) >> al
                    diff = dc - prev[0]
                    prev[0] = dc
                    s = _category(diff)
                    c, ln = dc_tabs[0][s]
                    wtr.write(c, ln)
                    if s:
                        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        wtr.flush()
        return sos_seg([(ci + 1, 0 if ci == 0 else 1, 0)
                        for ci in range(nf)], 0, 0, 0, al) + bytes(wtr.out)

    def dc_refine_scan(al):
        wtr = _BitWriter()
        if nf > 1:
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        wtr.flush()
                        wtr.out += bytes(
                            [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                    mcu += 1
                    for ci in range(nf):
                        hi, vi = hv[ci]
                        for v in range(vi):
                            for hh in range(hi):
                                wtr.write(
                                    (int(all_zz[ci][my * vi + v,
                                                    mx * hi + hh, 0])
                                     >> al) & 1, 1)
        else:
            nch, ncw = comp_grid(0)
            blk = 0
            for by in range(nch):
                for bx in range(ncw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        wtr.flush()
                        wtr.out += bytes(
                            [0xFF, 0xD0 + ((blk // restart_interval - 1) % 8)])
                    blk += 1
                    wtr.write((int(all_zz[0][by, bx, 0]) >> al) & 1, 1)
        wtr.flush()
        return sos_seg([(ci + 1, 0, 0) for ci in range(nf)],
                       0, 0, al + 1, al) + bytes(wtr.out)

    def ac_first_scan(ci, ss, se, al):
        wtr = _BitWriter()
        nch, ncw = comp_grid(ci)
        state = {"eobrun": 0}

        def flush_eob():
            n = state["eobrun"]
            while n:
                run = min(n, 0x7FFF)
                r = run.bit_length() - 1
                c, ln = ac_prog_tab[r << 4]
                wtr.write(c, ln)
                if r:
                    wtr.write(run - (1 << r), r)
                n -= run
            state["eobrun"] = 0

        blk = 0
        for by in range(nch):
            for bx in range(ncw):
                if restart_interval and blk and blk % restart_interval == 0:
                    flush_eob()
                    wtr.flush()
                    wtr.out += bytes(
                        [0xFF, 0xD0 + ((blk // restart_interval - 1) % 8)])
                blk += 1
                vals = [_pt_ac(all_zz[ci][by, bx, k], al)
                        for k in range(ss, se + 1)]
                if not any(vals):
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals[:last_nz + 1]):
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_prog_tab[0xF0]
                        wtr.write(c, ln)
                        run -= 16
                    s = _category(v)
                    c, ln = ac_prog_tab[(run << 4) | s]
                    wtr.write(c, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < len(vals) - 1:
                    state["eobrun"] = 1
        flush_eob()
        wtr.flush()
        return sos_seg([(ci + 1, 0, 0 if ci == 0 else 1)],
                       ss, se, 0, al) + bytes(wtr.out)

    def ac_refine_scan(ci, ss, se, al):
        """T.81 G.1.2.3 (the libjpeg encode_mcu_AC_refine discipline):
        the zero-run counts ZERO-HISTORY positions only; coefficients
        already nonzero at coarser precision contribute buffered
        correction bits that are emitted after the next symbol."""
        wtr = _BitWriter()
        nch, ncw = comp_grid(ci)
        state = {"eobrun": 0, "be": []}

        def flush_eob():
            n = state["eobrun"]
            while n:
                run = min(n, 0x7FFF)
                r = run.bit_length() - 1
                c, ln = ac_prog_tab[r << 4]
                wtr.write(c, ln)
                if r:
                    wtr.write(run - (1 << r), r)
                n -= run
            state["eobrun"] = 0
            for b in state["be"]:
                wtr.write(b, 1)
            state["be"] = []

        blk = 0
        for by in range(nch):
            for bx in range(ncw):
                if restart_interval and blk and blk % restart_interval == 0:
                    flush_eob()
                    wtr.flush()
                    wtr.out += bytes(
                        [0xFF, 0xD0 + ((blk // restart_interval - 1) % 8)])
                blk += 1
                pts = [_pt_ac(all_zz[ci][by, bx, k], al)
                       for k in range(ss, se + 1)]
                absv = [abs(v) for v in pts]
                eob = 0
                for i, a in enumerate(absv):
                    if a == 1:
                        eob = i
                run = 0
                br: list[int] = []
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        flush_eob()
                        c, ln = ac_prog_tab[0xF0]
                        wtr.write(c, ln)
                        run -= 16
                        for b in br:
                            wtr.write(b, 1)
                        br = []
                    if a > 1:
                        br.append(a & 1)  # correction bit
                        continue
                    flush_eob()
                    c, ln = ac_prog_tab[(run << 4) | 1]
                    wtr.write(c, ln)
                    wtr.write(1 if pts[i] > 0 else 0, 1)
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                    run = 0
                if run > 0 or br:
                    state["eobrun"] += 1
                    state["be"].extend(br)
                    if state["eobrun"] == 0x7FFF:
                        flush_eob()
        flush_eob()
        wtr.flush()
        return sos_seg([(ci + 1, 0, 0 if ci == 0 else 1)],
                       ss, se, al + 1, al) + bytes(wtr.out)

    bands = [(1, 5), (6, 63)]
    out += dc_first_scan(1)
    for ci in range(nf):
        for ss, se in bands:
            out += ac_first_scan(ci, ss, se, 2)
    for ci in range(nf):
        for ss, se in bands:
            out += ac_refine_scan(ci, ss, se, 1)
    for ci in range(nf):
        for ss, se in bands:
            out += ac_refine_scan(ci, ss, se, 0)
    out += dc_refine_scan(0)
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
    """JFIF bytes -> (h, w, 3) uint8 RGB (or (h, w, 1) gray).
    Supports baseline sequential (SOF0) AND progressive (SOF2, spectral
    selection + successive approximation, T.81 Annex G), 8-bit, sampling
    factors 1-2 per axis (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0; subsampled
    chroma upsampled nearest), restart markers; rejects
    arithmetic-coded / hierarchical / 12-bit streams with ValueError.

    Architecture: every scan decodes into per-component COEFFICIENT
    buffers (baseline is simply the one-scan case); dequantization +
    IDCT + upsampling + color conversion happen once at the end, so the
    two frame types share the whole reconstruction path.

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


def _expect_restart(rd: _BitReader) -> None:
    """Drain padding bits to the RSTn marker and realign (any other
    content here is a stream error surfaced by _fill)."""
    try:
        while True:
            rd.bit()
    except _Restart:
        rd.skip_restart()


def _scan_baseline(rd, units, coefs, dc_tabs, ac_tabs, restart_interval):
    """Sequential scan: DC + AC 0..63 per data unit, interleaved in MCU
    units (exactly F.2.2 — the one-scan special case of the shared
    coefficient-buffer architecture)."""
    prev: dict[int, int] = {}
    u = 0
    for unit in units:
        if restart_interval and u and u % restart_interval == 0:
            _expect_restart(rd)
            prev = {}
        u += 1
        for ci, by, bx, td, ta in unit:
            s = _read_huff(rd, dc_tabs[td])
            if s > 11:  # T.81 F.1.2.1: 8-bit DC category <= 11
                raise ValueError("invalid JPEG DC category")
            diff = _extend(rd.bits(s), s) if s else 0
            dc = prev.get(ci, 0) + diff
            prev[ci] = dc
            zz = coefs[ci][by, bx]
            zz[0] = dc
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


def _scan_dc_first(rd, units, coefs, dc_tabs, al, restart_interval):
    """Progressive DC first scan (G.2): baseline DC prediction on the
    point-transformed values, stored shifted left by Al."""
    prev: dict[int, int] = {}
    u = 0
    for unit in units:
        if restart_interval and u and u % restart_interval == 0:
            _expect_restart(rd)
            prev = {}
        u += 1
        for ci, by, bx, td, _ta in unit:
            s = _read_huff(rd, dc_tabs[td])
            if s > 11:
                raise ValueError("invalid JPEG DC category")
            diff = _extend(rd.bits(s), s) if s else 0
            dc = prev.get(ci, 0) + diff
            prev[ci] = dc
            coefs[ci][by, bx, 0] = dc << al
    return


def _scan_dc_refine(rd, units, coefs, al, restart_interval):
    """Progressive DC refinement: one appended bit per data unit
    (two's-complement OR works for either sign)."""
    u = 0
    for unit in units:
        if restart_interval and u and u % restart_interval == 0:
            _expect_restart(rd)
        u += 1
        for ci, by, bx, _td, _ta in unit:
            coefs[ci][by, bx, 0] |= rd.bit() << al


def _scan_ac_first(rd, grid, coef, ac_tab, ss, se, al, restart_interval):
    """Progressive AC first scan over one component's band Ss..Se
    (G.1.2.2): run/size symbols plus EOBn end-of-band runs."""
    nch, ncw = grid
    eobrun = 0
    blk = 0
    for by in range(nch):
        for bx in range(ncw):
            if restart_interval and blk and blk % restart_interval == 0:
                _expect_restart(rd)
                eobrun = 0
            blk += 1
            if eobrun:
                eobrun -= 1
                continue
            zz = coef[by, bx]
            k = ss
            while k <= se:
                rs = _read_huff(rd, ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:  # EOBn: run of 2^r + bits(r) blocks
                        eobrun = (1 << r) + (rd.bits(r) if r else 0) - 1
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                zz[k] = _extend(rd.bits(s), s) << al
                k += 1


def _scan_ac_refine(rd, grid, coef, ac_tab, ss, se, al, restart_interval):
    """Progressive AC refinement (G.2 / the libjpeg decode_mcu_AC_refine
    discipline): zero-runs count ZERO-HISTORY positions; every
    already-nonzero coefficient passed consumes one correction bit;
    newly significant coefficients arrive with magnitude 1 at this
    precision (sign bit in the stream)."""
    nch, ncw = grid
    p1 = 1 << al
    m1 = -p1
    eobrun = 0
    blk = 0
    for by in range(nch):
        for bx in range(ncw):
            if restart_interval and blk and blk % restart_interval == 0:
                _expect_restart(rd)
                eobrun = 0
            blk += 1
            zz = coef[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _read_huff(rd, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) + (rd.bits(r) if r else 0)
                            break
                        val = 0  # ZRL: 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("invalid AC refinement size")
                        val = p1 if rd.bit() else m1
                    while k <= se:
                        c = int(zz[k])
                        if c != 0:
                            if rd.bit() and (c & p1) == 0:
                                zz[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val != 0 and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                # end-of-band run covers the rest of this block:
                # correction bits only
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if rd.bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _decode_jpeg(payload: bytes) -> np.ndarray:
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts = {}
    dc_tabs, ac_tabs = {}, {}
    sof = None
    progressive = False
    restart_interval = 0
    coefs = None
    comps = None
    geo = None  # (hmax, vmax, mcux, mcuy)
    scanned: set[int] = set()

    def comp_grid(ci):
        """Non-interleaved block grid of component ci (T.81 A.2.2)."""
        hmax, vmax, _, _ = geo
        _, _, hi, vi = comps[ci]
        h, w, _ = sof
        ch = -(-h * vi // vmax)   # ceil: component sample dimensions
        cw = -(-w * hi // hmax)
        return -(-ch // 8), -(-cw // 8)

    def units_interleaved(scomps_r):
        _, _, mcux, mcuy = geo
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci, td, ta in scomps_r:
                    _, _, hi, vi = comps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            unit.append((ci, my * vi + v, mx * hi + hh, td, ta))
                yield unit

    def units_single(scomps_r):
        ci, td, ta = scomps_r[0]
        nch, ncw = comp_grid(ci)
        for by in range(nch):
            for bx in range(ncw):
                yield [(ci, by, bx, td, ta)]

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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nf):
                cid, hvb, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hvb >> 4, hvb & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, hi, vi))
            if h <= 0 or w <= 0 or h * w > 1 << 26:
                raise ValueError(f"invalid JPEG dimensions {w}x{h}")
            if nf == 1:
                # T.81 A.2: a single-component scan is NON-interleaved —
                # one data unit per MCU at the component's full
                # resolution, REGARDLESS of the declared sampling factors
                # (real encoders emit grayscale SOFs declaring 2x2).
                cid, tq, _, _ = comps[0]
                comps = [(cid, tq, 1, 1)]
            hmax = max(hi for _, _, hi, _ in comps)
            vmax = max(vi for _, _, _, vi in comps)
            for _, _, hi, vi in comps:
                if hmax % hi or vmax % vi:
                    raise ValueError("non-integer JPEG sampling ratio")
            geo = (hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax)))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: decode the scan inline
            if sof is None:
                raise ValueError("JPEG scan before frame header")
            ns = body[0]
            if len(body) != 1 + 2 * ns + 3 or ns < 1:
                raise ValueError("bad JPEG scan header")
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0xF) for i in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            cindex = {cid: ci for ci, (cid, _, _, _) in enumerate(comps)}
            for cid, _, _ in scan:
                if cid not in cindex:
                    raise ValueError("JPEG scan references unknown component")
                scanned.add(cid)
            scomps_r = [(cindex[cid], td, ta) for cid, td, ta in scan]
            if coefs is None:
                _, _, mcux, mcuy = geo
                coefs = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                    for _, _, hi, vi in comps
                ]
            pos += 2 + ln
            rd = _BitReader(d, pos)
            try:
                if not progressive:
                    # T.81 allows sequential frames split into several
                    # scans (non-interleaved per-component scans are
                    # common from hardware encoders); each scan decodes
                    # independently, coverage is validated at the end
                    if ns > 1 and ns != len(comps):
                        raise ValueError(
                            "interleaved JPEG scan must cover every "
                            "frame component"
                        )
                    for _, td, ta in scomps_r:
                        if td not in dc_tabs or ta not in ac_tabs:
                            raise ValueError(
                                "JPEG scan references an undefined Huffman table"
                            )
                    units = (units_interleaved(scomps_r) if ns > 1
                             else units_single(scomps_r))
                    _scan_baseline(rd, units, coefs, dc_tabs, ac_tabs,
                                   restart_interval)
                elif ss == 0:  # DC scan
                    if se != 0:
                        raise ValueError("progressive DC scan must have Se=0")
                    units = (units_interleaved(scomps_r) if ns > 1
                             else units_single(scomps_r))
                    if ah == 0:
                        for _, td, _ in scomps_r:
                            if td not in dc_tabs:
                                raise ValueError(
                                    "JPEG scan references an undefined "
                                    "Huffman table"
                                )
                        _scan_dc_first(rd, units, coefs, dc_tabs, al,
                                       restart_interval)
                    else:
                        _scan_dc_refine(rd, units, coefs, al,
                                        restart_interval)
                else:  # AC scan: non-interleaved by definition (G.1.1)
                    if ns != 1:
                        raise ValueError(
                            "progressive AC scan must cover one component"
                        )
                    if se > 63 or ss > se:
                        raise ValueError("bad spectral selection band")
                    ci, _td, ta = scomps_r[0]
                    if ta not in ac_tabs:
                        raise ValueError(
                            "JPEG scan references an undefined Huffman table"
                        )
                    if ah == 0:
                        _scan_ac_first(rd, comp_grid(ci), coefs[ci],
                                       ac_tabs[ta], ss, se, al,
                                       restart_interval)
                    else:
                        _scan_ac_refine(rd, comp_grid(ci), coefs[ci],
                                        ac_tabs[ta], ss, se, al,
                                        restart_interval)
            except _Restart:
                raise ValueError("unexpected restart marker") from None
            pos = rd.pos
            # a restart boundary may coincide with the scan end; any
            # stray non-marker padding before the next marker is skipped
            while pos < len(d) and d[pos] != 0xFF:
                pos += 1
            while (pos + 1 < len(d) and d[pos] == 0xFF
                   and 0xD0 <= d[pos + 1] <= 0xD7):
                pos += 2
            continue
        pos += 2 + ln

    if sof is None or coefs is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    for cid, tq, _hi, _vi in comps:
        if tq not in qts:
            raise ValueError("JPEG component references an undefined quant table")
        if cid not in scanned:
            raise ValueError("JPEG scans do not cover every frame component")
    hmax, vmax, _, _ = geo

    # shared reconstruction: dequantize + IDCT every block, assemble
    # planes, upsample, color-convert
    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        qtz = qts[tq][_ZZ_ROWS, _ZZ_COLS].astype(np.float64)
        cf = coefs[ci].astype(np.float64) * qtz
        nby, nbx = cf.shape[:2]
        spec = np.zeros((nby, nbx, 8, 8))
        spec[:, :, _ZZ_ROWS, _ZZ_COLS] = cf
        blocks = _C.T @ spec @ _C + 128.0
        planes.append(
            blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
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
