"""Pure-numpy media codecs: WAV/BMP roundtrips, analytic feature values,
and the Spark extract_features path decoding real payloads."""

import numpy as np
import pytest

from cesium_spark.operators.media_codecs import (
    bmp_features, decode_bmp, decode_wav, encode_bmp, encode_wav,
    numpy_media_decoder, wav_features,
)


def test_wav_roundtrip_and_analytic_features():
    rate = 8000
    t = np.arange(rate)  # exactly 1 s
    freq = 440.0
    mono = 0.5 * np.sin(2 * np.pi * freq * t / rate)
    payload = encode_wav(mono, rate)

    s, r = decode_wav(payload)
    assert r == rate and s.shape == (1, rate)
    np.testing.assert_allclose(s[0], mono, atol=1.0 / 32767)

    f = wav_features(payload)
    assert abs(f[0] - 1.0) < 1e-6                    # duration 1 s
    assert abs(f[1] - 0.5 / np.sqrt(2)) < 1e-3       # rms of 0.5 sine
    assert abs(f[2] - 2 * freq / rate) < 2e-3        # zcr = 2f/rate
    assert abs(f[3] - 0.5) < 1e-3                    # peak
    assert abs(f[4] - freq / (rate / 2.0)) < 1e-2    # centroid at f/Nyquist
    assert f[5] == 1 and abs(f[6] - 8.0) < 1e-6 and f[7] == 1.0

    # stereo + 8-bit depth paths
    stereo = np.vstack([mono, -mono])
    s2, _ = decode_wav(encode_wav(stereo, rate))
    assert s2.shape == (2, rate)
    np.testing.assert_allclose(s2[1], -mono, atol=1.0 / 32767)


def test_bmp_roundtrip_and_features():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(13, 7, 3), dtype=np.uint8)  # odd width -> padding
    assert (decode_bmp(encode_bmp(img)) == img).all()

    solid = np.zeros((4, 8, 3), dtype=np.uint8)
    solid[..., 0] = 200  # pure red-ish
    f = bmp_features(encode_bmp(solid))
    assert f[0] == 8 and f[1] == 4
    assert abs(f[2] - 200 / 255.0) < 1e-6 and f[3] == 0.0 and f[4] == 0.0
    assert f[5] == 0.0  # solid color -> zero luminance std
    assert abs(f[6] - 2.0) < 1e-6 and f[7] == 2.0


def test_dispatch_and_unknown_type():
    payload = encode_wav(np.zeros(100), 8000)
    assert numpy_media_decoder(payload, "audio/wav")[7] == 1.0
    with pytest.raises(ValueError, match="no pure-numpy decoder"):
        numpy_media_decoder(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav")


def test_extract_features_decodes_real_media(spark):
    """End-to-end through the Arrow-batched Spark path: WAV and BMP rows
    decode for real, a codec-requiring type falls back to the digest
    pseudo-features (still deterministic)."""
    from cesium_spark.operators.multimodal import extract_features

    wav = encode_wav(0.25 * np.sin(2 * np.pi * 100 * np.arange(4000) / 4000.0), 4000)
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    rows = [
        (1, "audio/wav", bytearray(wav), None, None, 1000),
        (2, "image/bmp", bytearray(encode_bmp(img)), 2, 2, None),
        (3, "image/jpeg", bytearray(b"\xff\xd8\xff fake"), 1, 1, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "width int, height int, duration_ms int")
    out = {r["media_id"]: r["features"] for r in extract_features(df).collect()}
    assert abs(out[1][0] - 1.0) < 1e-6 and out[1][7] == 1.0   # real WAV decode
    assert out[2][0] == 2 and out[2][7] == 2.0                 # real BMP decode
    assert len(out[3]) == 8 and all(0 <= v <= 1 for v in out[3])  # digest fallback


def test_corrupt_payloads_degrade_not_crash(spark):
    """Review finding: malformed blobs raised struct.error /
    ZeroDivisionError past the fallback and killed the whole job. Every
    corrupt payload must degrade to digest pseudo-features."""
    import struct
    from cesium_spark.operators.multimodal import _default_decode, extract_features

    truncated_fmt = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + \
        struct.pack("<4sI", b"fmt ", 4) + b"\x01\x00\x02\x00"
    zero_ch = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 0, 8000, 0, 0, 16) + \
        struct.pack("<4sI", b"data", 0)
    zero_h_bmp = encode_bmp(np.zeros((1, 4, 3), dtype=np.uint8))
    zero_h_bmp = zero_h_bmp[:22] + struct.pack("<i", 0) + zero_h_bmp[26:]

    bad = [
        (1, "audio/wav", truncated_fmt), (2, "audio/wav", zero_ch),
        (3, "image/bmp", zero_h_bmp), (4, "audio/wav", b"\x00" * 3),
    ]
    for _, mt, payload in bad:
        out = _default_decode(payload, mt)
        assert out.shape == (8,) and np.isfinite(out).all()

    df = spark.createDataFrame(
        [(i, mt, bytearray(p), None, None, None) for i, mt, p in bad],
        "media_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int")
    rows = extract_features(df).collect()
    assert len(rows) == 4 and all(len(r["features"]) == 8 for r in rows)
