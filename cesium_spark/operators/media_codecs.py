"""Pure-numpy media codecs: real decoders for the container-friendly
formats (RIFF/WAVE PCM audio, uncompressed 24-bit BMP images) — no
external codec library involved, just header parsing + numpy reshapes.

These upgrade the multimodal pipeline's decode step from a stub to a
real implementation for the formats where that is honestly possible
offline; compressed formats (JPEG/PNG/MP3/H.264) still require a codec
library and keep the documented `register_decoder` swap-in path.

Everything decodes per Arrow batch inside mapInPandas — numpy owns the
byte crunching, blobs never become driver-side Python objects.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav", "decode_wav", "wav_features",
    "encode_bmp", "decode_bmp", "bmp_features",
    "numpy_media_decoder",
]


# --------------------------------------------------------------- WAV/PCM


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono/multichannel float [-1, 1] -> 16-bit PCM RIFF/WAVE bytes.
    samples: (n,) or (channels, n)."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    ch, n = s.shape
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    interleaved = pcm.T.reshape(-1).tobytes()  # frame-major interleave
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data = struct.pack("<4sI", b"data", len(interleaved)) + interleaved
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (8/16/32-bit) -> (float64 samples in [-1, 1] of
    shape (channels, n), sample_rate). Walks the chunk list properly, so
    files with LIST/INFO or fact chunks decode too."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, sz = struct.unpack("<4sI", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM supported (audio_format={audio_format})")
    if ch <= 0 or rate <= 0:
        raise ValueError(f"invalid fmt chunk (channels={ch}, rate={rate})")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        raw = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        raw = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(raw) // ch
    return raw[: n * ch].reshape(n, ch).T, rate


def wav_features(payload: bytes) -> np.ndarray:
    """8 deterministic audio features from a PCM WAV payload:
    [duration_s, rms, zero_crossing_rate, peak_abs,
     spectral_centroid_norm (0..1 of Nyquist), n_channels,
     sample_rate_khz, 1.0 (wav marker)]."""
    s, rate = decode_wav(payload)
    mono = s.mean(axis=0)
    n = len(mono)
    dur = n / float(rate)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    if n > 1:
        mag = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        tot = float(mag.sum())
        centroid = float((freqs * mag).sum() / tot) / (rate / 2.0) if tot > 0 else 0.0
    else:
        centroid = 0.0
    return np.array(
        [dur, rms, zcr, peak, centroid, s.shape[0], rate / 1000.0, 1.0],
        dtype=np.float32,
    )


# ------------------------------------------------------------ BMP (24-bit)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return header + info + pix


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB. Handles bottom-up
    and top-down (negative height) row order and 4-byte row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions ({w}x{h})")
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_len, offset=offset
    ).reshape(h, row_len)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def bmp_features(payload: bytes) -> np.ndarray:
    """8 deterministic image features from a BMP payload:
    [width, height, mean_r, mean_g, mean_b, std_luminance, aspect, 2.0
    (bmp marker)] — channel means/std normalized to [0, 1]."""
    img = decode_bmp(payload).astype(np.float64) / 255.0
    h, w, _ = img.shape
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    return np.array(
        [w, h, img[..., 0].mean(), img[..., 1].mean(), img[..., 2].mean(),
         lum.std(), w / float(h), 2.0],
        dtype=np.float32,
    )


def numpy_media_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch decoder for the formats decodable without codec
    libraries; raises on anything else (callers choose the fallback —
    multimodal.extract_features falls back to the digest pseudo-features
    and exposes register_decoder for real codec deployments)."""
    mt = (media_type or "").lower()
    if mt in ("audio/wav", "audio/x-wav", "wav"):
        return wav_features(payload)
    if mt in ("image/bmp", "bmp"):
        return bmp_features(payload)
    raise ValueError(f"no pure-numpy decoder for media_type={media_type!r}")
