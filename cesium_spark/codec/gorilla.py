"""Gorilla-style compression for per-window time-series blocks:
delta-of-delta timestamp encoding + XOR float encoding (Facebook Gorilla,
VLDB 2015, sections 4.1.1/4.1.2), vectorized in numpy.

Layout difference vs the paper (deliberate): the paper interleaves control
and payload bits in one stream, decoded one element at a time. At Spark
scale a per-element Python decode loop would dominate, so this codec
transposes the same information into columnar sub-streams (fixed-width
control codes, fixed-width descriptors, concatenated variable-width
payloads) — the same separation Parquet applies to rep/def levels vs
data. Encode AND decode are then pure vectorized numpy (bit gather /
scatter via repeat + cumsum), with identical information content and
compression behavior to the paper's stream.

  timestamps: ts0 raw; delta-of-delta, zigzagged, bucketed by a 2-bit
              code {0: dod==0, 1: 16-bit, 2: 32-bit, 3: 64-bit payload}
  values:     v0 raw; XOR with previous; 1 control bit {0: xor==0,
              1: a 12-bit descriptor (6-bit leading-zero count, 6-bit
                 meaningful-length-1) + the meaningful bits}

Block format (little-endian header, streams bit-packed MSB-first):
  'GOR1' | u32 n | i64 ts0 | u64 v0_bits | u32 len x 5 |
  ts_codes(2b) | ts_payload(var) | v_ctrl(1b) | v_descr(12b) | v_payload(var)

Losslessness: exact bit roundtrip for any float64 (NaNs included) and any
int64 microsecond timestamps; tests cover constant / drifting / random /
NaN series and empty blocks.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GOR1"

# --------------------------------------------------------------- bit utils


def _pack_fixed(vals: np.ndarray, width: int) -> bytes:
    """Pack each element of `vals` into `width` bits, MSB-first."""
    n = len(vals)
    if n == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None].astype(np.uint64) >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_fixed(buf: bytes, width: int, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: n * width]
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def _bit_matrix(vals: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 matrix of each value's bits, MSB-first."""
    return np.unpackbits(
        vals.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )


def _pack_var(vals: np.ndarray, widths: np.ndarray) -> bytes:
    """Concatenate the low `widths[i]` bits of vals[i], MSB-first.

    Boolean fancy-indexing of the full bit matrix returns elements in
    row-major order — exactly the concatenated variable-width stream.
    """
    widths = np.asarray(widths, dtype=np.int64)
    total = int(widths.sum())
    if total == 0:
        return b""
    full = _bit_matrix(np.ascontiguousarray(vals, dtype=np.uint64))
    mask = np.arange(64, dtype=np.int64) >= (64 - widths)[:, None]
    return np.packbits(full[mask]).tobytes()


def _unpack_var(buf: bytes, widths: np.ndarray) -> np.ndarray:
    widths = np.asarray(widths, dtype=np.int64)
    total = int(widths.sum())
    n = len(widths)
    if total == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=total)
    full = np.zeros((n, 64), dtype=np.uint8)
    mask = np.arange(64, dtype=np.int64) >= (64 - widths)[:, None]
    full[mask] = bits
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count of uint64, x > 0 (vectorized)."""
    hi32 = (x >> np.uint64(32)).astype(np.int64)
    lo32 = (x & np.uint64(0xFFFFFFFF)).astype(np.int64)
    use_hi = hi32 != 0
    v = np.where(use_hi, hi32, lo32).astype(np.float64)
    _, exp = np.frexp(v)  # exact: v < 2^32 < 2^53
    clz32 = 32 - exp
    return np.where(use_hi, clz32, 32 + clz32).astype(np.int64)


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Trailing-zero count of uint64, x > 0 (vectorized)."""
    low = (x & (~x + np.uint64(1))).astype(np.uint64)  # lowest set bit
    return 63 - _clz64(low)


# --------------------------------------------------------------- block API


def encode_block(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Compress one block: sorted int64 microsecond timestamps + float64
    values -> bytes. Lossless."""
    ts = np.ascontiguousarray(ts_us, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(ts)
    if n == 0:
        return _MAGIC + struct.pack("<IqQ", 0, 0, 0) + struct.pack("<IIIII", 0, 0, 0, 0, 0)
    ts0 = int(ts[0])
    v0 = int(v[0])

    # timestamps: delta-of-delta with implicit previous-delta 0 at start
    deltas = np.diff(ts, prepend=ts[0])  # deltas[0] = 0
    dod = np.diff(deltas)
    zz = _zigzag(dod)
    codes = np.zeros(len(zz), dtype=np.uint8)
    codes[zz > 0] = 1
    codes[zz >= (1 << 16)] = 2
    codes[zz >= (1 << 32)] = 3
    widths = np.choose(codes, [0, 16, 32, 64])
    ts_codes = _pack_fixed(codes, 2)
    ts_payload = _pack_var(zz, widths)

    # values: XOR stream with separated descriptor / payload sub-streams
    xor = v[1:] ^ v[:-1]
    ctrl = (xor != 0).astype(np.uint8)
    nzx = xor[xor != 0]
    if len(nzx):
        lead = _clz64(nzx)
        trail = _ctz64(nzx)
        nmean = 64 - lead - trail
        descr = (lead.astype(np.uint64) << np.uint64(6)) | (nmean - 1).astype(np.uint64)
        v_descr = _pack_fixed(descr, 12)
        v_payload = _pack_var(nzx >> trail.astype(np.uint64), nmean)
    else:
        v_descr = b""
        v_payload = b""
    v_ctrl = _pack_fixed(ctrl, 1)

    head = _MAGIC + struct.pack("<IqQ", n, ts0, v0)
    parts = [ts_codes, ts_payload, v_ctrl, v_descr, v_payload]
    head += struct.pack("<IIIII", *(len(p) for p in parts))
    return head + b"".join(parts)


def decode_block(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_block: bytes -> (int64 ts_us, float64 values)."""
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("bad block magic")
    n, ts0, v0 = struct.unpack_from("<IqQ", buf, 4)
    lens = struct.unpack_from("<IIIII", buf, 24)
    off = 44
    streams = []
    for ln in lens:
        streams.append(bytes(buf[off: off + ln]))
        off += ln
    ts_codes_b, ts_payload_b, v_ctrl_b, v_descr_b, v_payload_b = streams
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    codes = _unpack_fixed(ts_codes_b, 2, n - 1)
    widths = np.choose(codes.astype(np.int64), [0, 16, 32, 64])
    dod = _unzigzag(_unpack_var(ts_payload_b, widths))
    deltas = np.concatenate(([0], np.cumsum(dod)))
    ts = ts0 + np.cumsum(deltas)

    ctrl = _unpack_fixed(v_ctrl_b, 1, n - 1).astype(bool)
    k = int(ctrl.sum())
    xors = np.zeros(n - 1, dtype=np.uint64)
    if k:
        descr = _unpack_fixed(v_descr_b, 12, k)
        lead = (descr >> np.uint64(6)).astype(np.int64)
        nmean = (descr & np.uint64(0x3F)).astype(np.int64) + 1
        payload = _unpack_var(v_payload_b, nmean)
        trail = (64 - lead - nmean).astype(np.uint64)
        xors[ctrl] = payload << trail
    # v[i] = v[i-1] ^ xor[i]  ->  cumulative XOR scan
    vbits = np.bitwise_xor.accumulate(
        np.concatenate(([np.uint64(v0)], xors)).astype(np.uint64)
    )
    return ts.astype(np.int64), vbits.view(np.float64)
