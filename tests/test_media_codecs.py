"""Pure-numpy media codecs: WAV/BMP/PNG roundtrips, analytic feature
values, and the Spark extract_features path decoding real payloads."""

import struct
import zlib

import numpy as np
import pytest

from cesium_spark.operators.media_codecs import (
    bmp_features, decode_bmp, decode_png, decode_wav, encode_bmp,
    encode_png, encode_wav, numpy_media_decoder, png_features,
    wav_features,
)


def _png_raw(w, h, depth, color_type, scanlines, extra_chunks=()):
    """Hand-rolled PNG for decoder paths encode_png doesn't emit
    (gray, palette, 16-bit, interlace): scanlines = raw filtered bytes
    (with per-row filter byte) pre-compression."""
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    interlace = 1 if "interlace" in dict(extra_chunks or ()) else 0
    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace))
    for ctype, body in extra_chunks:
        if ctype != "interlace":
            out += chunk(ctype, body)
    return out + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


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


def test_png_roundtrip_every_filter():
    """All five scanline filters (None/Sub/Up/Average/Paeth) must
    reconstruct the image exactly — encode_png's filter_type knob
    exercises each defilter path against the same random image."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
    for ftype in range(5):
        got = decode_png(encode_png(img, filter_type=ftype))
        assert (got == img).all(), f"filter {ftype}"


def test_png_analytic_features():
    """Synthesized PNG with known channel means -> exact recovery
    (r3 VERDICT item 4's done-criterion)."""
    solid = np.zeros((4, 8, 3), dtype=np.uint8)
    solid[..., 0] = 200
    f = png_features(encode_png(solid, filter_type=4))
    assert f[0] == 8 and f[1] == 4
    assert abs(f[2] - 200 / 255.0) < 1e-6 and f[3] == 0.0 and f[4] == 0.0
    assert f[5] == 0.0 and abs(f[6] - 2.0) < 1e-6 and f[7] == 3.0
    # dispatcher route
    assert numpy_media_decoder(encode_png(solid), "image/png")[7] == 3.0


def test_png_gray_palette_16bit_and_rejects():
    # gray 8-bit: 2x2 values 0,64,128,192, filter 0 rows
    lines = b"\x00" + bytes([0, 64]) + b"\x00" + bytes([128, 192])
    g = decode_png(_png_raw(2, 2, 8, 0, lines))
    assert g.shape == (2, 2, 1) and g.ravel().tolist() == [0, 64, 128, 192]
    f = png_features(_png_raw(2, 2, 8, 0, lines))
    assert abs(f[2] - (0 + 64 + 128 + 192) / 4.0 / 255.0) < 1e-6
    assert f[2] == f[3] == f[4]  # gray broadcasts channels

    # gray+alpha: alpha ignored by features
    lines_ga = b"\x00" + bytes([100, 255, 100, 0])
    fga = png_features(_png_raw(2, 1, 8, 4, lines_ga))
    assert abs(fga[2] - 100 / 255.0) < 1e-6

    # palette: 2 entries, indices [1, 0]
    plte = bytes([10, 20, 30, 200, 100, 50])
    p = decode_png(_png_raw(2, 1, 8, 3, b"\x00" + bytes([1, 0]),
                            extra_chunks=((b"PLTE", plte),)))
    assert p.tolist() == [[[200, 100, 50], [10, 20, 30]]]

    # 16-bit RGB: one pixel 0xFF00, 0x8000, 0x0001 (network byte order)
    px = struct.pack(">HHH", 0xFF00, 0x8000, 0x0001)
    img16 = decode_png(_png_raw(1, 1, 16, 2, b"\x00" + px))
    assert img16.dtype == np.uint16 and img16[0, 0].tolist() == [0xFF00, 0x8000, 1]

    # Adam7 interlace (r4 VERDICT item 3): hand-built gray 2x2 — pass 1
    # carries pixel (0,0), pass 6 pixel (1,0), pass 7 the y=1 row; the
    # other passes are empty and contribute NO bytes, per the spec
    adam_lines = b"\x00\x00" + b"\x00\x40" + b"\x00\x80\xc0"
    gi = decode_png(_png_raw(2, 2, 8, 0, adam_lines,
                             extra_chunks=(("interlace", b""),)))
    assert gi.shape == (2, 2, 1) and gi.ravel().tolist() == [0, 64, 128, 192]
    # sequential bytes under an interlaced header -> length mismatch
    with pytest.raises(ValueError, match="length"):
        decode_png(_png_raw(2, 2, 8, 0, lines, extra_chunks=(("interlace", b""),)))

    # palette index out of range -> reject, not garbage pixels
    with pytest.raises(ValueError, match="palette"):
        decode_png(_png_raw(2, 1, 8, 3, b"\x00" + bytes([5, 0]),
                            extra_chunks=((b"PLTE", plte),)))


def test_png_corruption_detected_and_degrades():
    """Bit flips are caught by the CRC check; through the multimodal
    path they degrade to digest pseudo-features, never crash."""
    from cesium_spark.operators.multimodal import _default_decode

    good = encode_png(np.full((3, 3, 3), 77, dtype=np.uint8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    out = _default_decode(bytes(bad), "image/png")
    assert out.shape == (8,) and np.isfinite(out).all() and out[7] != 3.0
    # truncated mid-chunk
    with pytest.raises(ValueError):
        decode_png(good[:30])


def test_dispatch_and_unknown_type():
    payload = encode_wav(np.zeros(100), 8000)
    assert numpy_media_decoder(payload, "audio/wav")[7] == 1.0
    with pytest.raises(ValueError, match="no pure-numpy decoder"):
        numpy_media_decoder(b"ID3\x04 fake mp3", "audio/mpeg")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav")


def test_jpeg_roundtrip_and_features():
    """Baseline JPEG from scratch (T.81): solid blocks recover exactly
    (DC-only), smooth gradients within quantization error at q95,
    grayscale single-component path, and the dispatcher route."""
    from cesium_spark.operators.jpeg_codec import (
        decode_jpeg, encode_jpeg, jpeg_features)

    solid = np.zeros((16, 24, 3), np.uint8)
    solid[...] = (200, 100, 50)
    assert (decode_jpeg(encode_jpeg(solid, 90)) == solid).all()
    f = jpeg_features(encode_jpeg(solid))
    assert f[0] == 24 and f[1] == 16 and f[7] == 4.0
    assert abs(f[2] - 200 / 255.0) < 2 / 255.0 and f[5] < 1e-3

    grad = np.stack(
        [np.linspace(0, 255, 41)[None, :].repeat(33, 0),
         np.linspace(0, 255, 33)[:, None].repeat(41, 1),
         np.full((33, 41), 128.0)], -1).astype(np.uint8)  # non-multiple-of-8 dims
    err = np.abs(decode_jpeg(encode_jpeg(grad, 95)).astype(int) - grad.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5

    gray = np.linspace(0, 255, 400).reshape(20, 20).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(gray, 95))
    assert dg.shape == (20, 20, 1)
    assert np.abs(dg[..., 0].astype(int) - gray.astype(int)).max() <= 3

    assert numpy_media_decoder(encode_jpeg(solid), "image/jpeg")[7] == 4.0

    # restart markers (DRI + RSTn every 2 MCUs, DC predictors reset)
    rst = encode_jpeg(grad, 95, restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI present
    err_rst = np.abs(decode_jpeg(rst).astype(int) - grad.astype(int))
    assert err_rst.max() <= 6

    # chroma subsampling: 4:2:0 (2x2 Y blocks per MCU + box-averaged
    # chroma) and 4:2:2; solid color stays exact, the smooth gradient
    # stays within subsampled-chroma error; restarts compose with 420
    for sub, tol in (("420", 10), ("422", 8)):
        solid_err = np.abs(
            decode_jpeg(encode_jpeg(solid, 90, subsampling=sub)).astype(int)
            - solid.astype(int))
        assert solid_err.max() == 0, sub
        e2 = np.abs(
            decode_jpeg(encode_jpeg(grad, 95, subsampling=sub)).astype(int)
            - grad.astype(int))
        assert e2.max() <= tol, sub
    e3 = np.abs(
        decode_jpeg(encode_jpeg(grad, 95, restart_interval=2,
                                subsampling="420")).astype(int)
        - grad.astype(int))
    assert e3.max() <= 10


def test_jpeg_rejects_and_degrades():
    """Truncation / corrupt headers / garbage raise ValueError and
    degrade to pseudo-features through the multimodal path."""
    from cesium_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from cesium_spark.operators.multimodal import _default_decode

    good = encode_jpeg(np.full((10, 10, 3), 99, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])               # truncated mid-segment
    with pytest.raises(ValueError):
        # APP0 payload re-tagged as a frame header: corrupt precision
        decode_jpeg(b"\xff\xd8\xff\xc2" + good[4:])
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        # arithmetic-coded progressive (SOF10) stays rejected
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xca", 1))
    out = _default_decode(good[:40], "image/jpeg")
    assert out.shape == (8,) and out[7] != 4.0  # degraded, not decoded
    # and an intact payload through the same multimodal entry decodes
    ok = _default_decode(good, "image/jpeg")
    assert ok[7] == 4.0


def test_jpeg_progressive_conformance():
    """Progressive (SOF2) decode — r4 VERDICT item 2. The progressive
    encoder writes the IDENTICAL quantized coefficients as baseline
    through a scan script covering every Annex G scan kind (DC first
    Al=1 + DC refinement; per-component spectral-selection AC first
    scans at Al=2 with EOB-run accumulation; two AC refinement passes),
    so the decoded pixels must match the baseline decode BIT-FOR-BIT —
    across color/gray, every supported subsampling, restart markers,
    and non-multiple-of-8/16 dimensions. The multimodal path now
    decodes progressive payloads for REAL (no pseudo-feature fallback)."""
    from cesium_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from cesium_spark.operators.multimodal import _default_decode

    rng = np.random.RandomState(17)
    x = np.linspace(0, 255, 41)[None, :] * np.ones((27, 1))
    grad = np.stack(
        [x, x[::-1], np.tile(np.linspace(0, 255, 27)[:, None], (1, 41))], -1
    ).astype(np.uint8)
    noise = rng.randint(0, 256, (24, 56, 3)).astype(np.uint8)

    for img, sub, q, ri in [
        (grad, "444", 90, 0),
        (grad, "420", 85, 0),
        (grad, "422", 95, 0),
        (noise, "420", 50, 0),
        (noise, "444", 75, 3),   # restart markers inside every scan
    ]:
        base = decode_jpeg(encode_jpeg(img, q, restart_interval=ri,
                                       subsampling=sub))
        prog_bytes = encode_jpeg(img, q, restart_interval=ri,
                                 subsampling=sub, progressive=True)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        np.testing.assert_array_equal(decode_jpeg(prog_bytes), base)

    # grayscale, with and without restart markers (the gray DC-refine
    # scan dropped its RSTn emission pre-review — review finding r5)
    g = grad[..., 0]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(g, 85, progressive=True)),
        decode_jpeg(encode_jpeg(g, 85)),
    )
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(g, 80, restart_interval=3, progressive=True)),
        decode_jpeg(encode_jpeg(g, 80, restart_interval=3)),
    )

    # solid-color progressive recovers exactly, like baseline
    solid = np.full((16, 16, 3), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(solid, 95, progressive=True)) == solid).all()

    # multimodal entry: progressive decodes for real (marker 4.0 = real
    # decode, not the digest fallback)
    assert _default_decode(
        encode_jpeg(solid, 90, progressive=True), "image/jpeg")[7] == 4.0


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
        (4, "image/png", bytearray(encode_png(img, filter_type=2)), 2, 2, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "width int, height int, duration_ms int")
    out = {r["media_id"]: r["features"] for r in extract_features(df).collect()}
    assert abs(out[1][0] - 1.0) < 1e-6 and out[1][7] == 1.0   # real WAV decode
    assert out[2][0] == 2 and out[2][7] == 2.0                 # real BMP decode
    assert len(out[3]) == 8 and all(0 <= v <= 1 for v in out[3])  # digest fallback
    assert out[4][7] == 3.0 and abs(out[4][2] - 128 / 255.0) < 1e-6  # real PNG decode


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


def test_png_decompression_bomb_rejected():
    """Review finding (r4): a tiny IHDR with a huge-ratio IDAT must be
    rejected at the declared size (+1 probe byte), not inflated fully —
    one hostile blob must never OOM an executor."""
    # 2x2 gray PNG header, IDAT that inflates to ~64 MB of zeros
    bomb_raw = b"\x00" * (64 * 1024 * 1024)
    payload = _png_raw(2, 2, 8, 0, bomb_raw)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(payload)
    from cesium_spark.operators.multimodal import _default_decode
    out = _default_decode(payload, "image/png")
    assert out.shape == (8,) and out[7] != 3.0  # degraded, not decoded


def test_resize_images_spark_path(spark):
    """resize_images: real decode -> nearest-neighbor -> lossless PNG
    re-encode for BMP/PNG/JPEG inputs; garbage passes through with
    resized=false. The resized PNG decodes back to the exact
    nearest-neighbor result (PNG is lossless; JPEG source compared
    within its quantization error)."""
    from cesium_spark.operators.media_codecs import decode_png, resize_rgb
    from cesium_spark.operators.jpeg_codec import encode_jpeg
    from cesium_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (16, 12, 3), np.uint8)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(img)), None, None, None),
        (2, "image/png", bytearray(encode_png(img)), None, None, None),
        (3, "image/jpeg", bytearray(encode_jpeg(img, 95)), None, None, None),
        (4, "image/jpeg", bytearray(b"garbage bytes"), None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
              "width int, height int, duration_ms int")
    out = {r["media_id"]: r for r in resize_images(df, 6, 8).collect()}
    want = resize_rgb(img, 6, 8)
    got_bmp = decode_png(bytes(out[1]["payload"]))
    assert out[1]["resized"] and (got_bmp == want).all()
    assert (decode_png(bytes(out[2]["payload"])) == want).all()
    got_jpg = decode_png(bytes(out[3]["payload"])).astype(int)
    assert out[3]["media_type"] == "image/png"
    assert np.abs(got_jpg - want.astype(int)).max() <= 24  # jpeg source error
    assert not out[4]["resized"] and bytes(out[4]["payload"]) == b"garbage bytes"


def test_sample_frames_spark_path(spark):
    """sample_frames: one row per sampled frame (0, every_n, ...,
    capped), frames decode back to the exact source frames; only the
    requested frames are decoded; undecodable video emits the single
    (-1, NULL) skip row."""
    from cesium_spark.operators.media_codecs import (
        decode_bmp_video, decode_png, encode_bmp_video)
    from cesium_spark.operators.multimodal import sample_frames

    frames = [np.full((4, 6, 3), 10 * i, np.uint8) for i in range(7)]
    vid = encode_bmp_video(frames)
    df = spark.createDataFrame(
        [(1, "video/x-bmp-seq", bytearray(vid), None, None, None),
         (2, "video/mp4", bytearray(b"\x00\x00\x00 ftypisom fake"), None, None, None)],
        "media_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int")
    rows = sample_frames(df, every_n=2, max_frames=3).collect()
    mine = sorted([r for r in rows if r["media_id"] == 1],
                  key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in mine] == [0, 2, 4]
    for r in mine:
        img = decode_png(bytes(r["payload"]))
        assert (img == frames[r["frame_idx"]]).all()
    skip = [r for r in rows if r["media_id"] == 2]
    assert len(skip) == 1 and skip[0]["frame_idx"] == -1
    assert skip[0]["payload"] is None

    # selective decode: indices= only materializes the requested frames
    got = decode_bmp_video(vid, indices=[1, 5])
    assert [i for i, _ in got] == [1, 5]
    assert (got[1][1] == frames[5]).all()


def test_bmpseq_truncation_is_valueerror():
    """Review finding (r4): BMPSEQ payloads truncated before the frame
    count must raise the codec module's documented ValueError, not
    struct.error."""
    from cesium_spark.operators.media_codecs import (
        bmp_video_frame_count, decode_bmp_video)

    for fn in (bmp_video_frame_count, decode_bmp_video):
        with pytest.raises(ValueError, match="truncated"):
            fn(b"BMPSEQ0\x00\x01")


def test_codec_fuzz_hostile_bytes_only_valueerror():
    """Every pure-numpy decoder must reject arbitrary/mutated bytes
    with ValueError (the multimodal degrade contract) — never an
    IndexError/struct.error/OverflowError escaping from header math.
    Deterministic fuzz: random blobs, truncations, and single-byte
    mutations of valid payloads."""
    from cesium_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
    from cesium_spark.operators.media_codecs import (
        decode_bmp, decode_bmp_video, decode_png, decode_wav,
        encode_bmp_video)

    rng = np.random.RandomState(1234)
    img = rng.randint(0, 256, (9, 7, 3), np.uint8)
    valid = {
        decode_wav: encode_wav(rng.uniform(-1, 1, 500), 8000),
        decode_bmp: encode_bmp(img),
        decode_png: encode_png(img, filter_type=3),
        decode_jpeg: encode_jpeg(img, 85),
        decode_bmp_video: encode_bmp_video([img, img]),
    }
    decoders = list(valid)

    def check(fn, payload):
        try:
            fn(bytes(payload))
        except ValueError:
            pass  # the contract
        # anything else propagates and fails the test

    # the progressive scan decoders and the Adam7 pass scatterer (r5)
    # hold the same contract — mutate/truncate through the same harness
    for fn, extra in (
        (decode_jpeg, encode_jpeg(img, 85, progressive=True)),
        (decode_png, encode_png(img, filter_type=2, interlace=True)),
    ):
        for cut in (0, 8, 40, len(extra) // 3, len(extra) // 2, len(extra) - 1):
            check(fn, extra[:cut])
        for _ in range(120):
            b = bytearray(extra)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(len(b))] = rng.randint(256)
            check(fn, b)

    for fn, good in valid.items():
        for cut in (0, 1, 3, 8, 12, 20, len(good) // 2, len(good) - 1):
            check(fn, good[:cut])
        for _ in range(120):
            b = bytearray(good)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(len(b))] = rng.randint(256)
            check(fn, b)
    for _ in range(150):
        blob = rng.bytes(rng.randint(1, 200))
        for fn in decoders:
            check(fn, blob)
        # random payloads wearing each format's magic
        check(decode_png, b"\x89PNG\r\n\x1a\n" + blob)
        check(decode_jpeg, b"\xff\xd8" + blob)
        check(decode_bmp, b"BM" + blob)
        check(decode_wav, b"RIFF" + blob[:4] + b"WAVE" + blob)
        check(decode_bmp_video, b"BMPSEQ0\x00" + blob)


def test_png_garbage_deflate_with_valid_crc():
    """A structurally valid PNG whose IDAT carries non-deflate bytes
    (CRC recomputed, so the chunk walk accepts it) must still raise
    ValueError, not zlib.error."""
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", b"\xde\xad\xbe\xef not deflate")
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)


def test_jpeg_grayscale_sof_with_declared_subsampling():
    """Review finding (r4): T.81 A.2 — a single-component scan is
    NON-interleaved regardless of declared sampling factors. A grayscale
    stream whose SOF says 2x2 must decode to the same pixels as the
    1x1 declaration, not scrambled blocks."""
    from cesium_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

    gray = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    good = encode_jpeg(gray, 95)
    # patch the SOF component byte from 0x11 to 0x22 (same scan data)
    sof_at = good.index(b"\xff\xc0")
    comp_hv_at = sof_at + 4 + 6 + 1  # marker+len + B HH HH B + comp id
    patched = good[:comp_hv_at] + b"\x22" + good[comp_hv_at + 1:]
    a = decode_jpeg(good)
    b = decode_jpeg(patched)
    assert (a == b).all()

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="411")


def test_png_adam7_bit_equal_to_sequential():
    """r4 VERDICT item 3: an Adam7-interlaced fixture decodes bit-equal
    to its deinterlaced (sequential) twin — across every filter type,
    edge shapes where most passes are empty, and through the multimodal
    feature path."""
    from cesium_spark.operators.multimodal import _default_decode

    rng = np.random.RandomState(29)
    for shape in [(9, 7), (16, 16), (1, 1), (3, 1), (1, 3), (33, 21)]:
        img = rng.randint(0, 256, (*shape, 3), np.uint8)
        for ft in range(5):
            seq = decode_png(encode_png(img, filter_type=ft))
            adam = decode_png(encode_png(img, filter_type=ft, interlace=True))
            np.testing.assert_array_equal(seq, adam)
            np.testing.assert_array_equal(seq, img)

    img = rng.randint(0, 256, (12, 10, 3), np.uint8)
    pay = encode_png(img, filter_type=4, interlace=True)
    assert _default_decode(pay, "image/png")[7] == 3.0  # real decode
    np.testing.assert_array_equal(
        png_features(pay), png_features(encode_png(img, filter_type=4)))


def test_jpeg_multiscan_sequential_decode():
    """T.81 sequential frames may split into per-component
    non-interleaved scans (common from hardware encoders). Hand-roll a
    3-scan SOF0 stream carrying the same coefficients as the
    interleaved encoding — decodes must be bit-identical."""
    import struct as _struct
    from cesium_spark.operators import jpeg_codec as J

    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    interleaved = J.encode_jpeg(img, 85)  # 4:4:4 — every comp full-res

    # rebuild the same stream with one SOS per component
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    comps = [0.299 * r + 0.587 * g + 0.114 * b,
             -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
             0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    qts = [J._scale_qt(J._QT_LUMA, 85), J._scale_qt(J._QT_CHROMA, 85)]
    dc_specs, ac_specs = [J._DC_LUMA, J._DC_CHROMA], [J._AC_LUMA, J._AC_CHROMA]
    dc_tabs = [J._huff_codes(*s) for s in dc_specs]
    ac_tabs = [J._huff_codes(*s) for s in ac_specs]
    h, w = img.shape[:2]
    nby, nbx = h // 8, w // 8

    def seg(marker, body):
        return _struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"
    for ti in range(2):
        out += seg(0xFFDB, bytes([ti]) + bytes(
            int(qts[ti][rr, cc]) for rr, cc in J.ZIGZAG))
    sof = _struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for ti in range(2):
        for cls, spec in ((0, dc_specs[ti]), (1, ac_specs[ti])):
            out += seg(0xFFC4, bytes([(cls << 4) | ti])
                       + bytes(spec[0]) + bytes(spec[1]))
    for ci, plane in enumerate(comps):
        ti = 0 if ci == 0 else 1
        p = J._edge_pad(plane, nby * 8, nbx * 8)
        wtr = J._BitWriter()
        prev = 0
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                q = np.round((J._C @ blk @ J._C.T) / qts[ti]).astype(np.int32)
                prev = J._encode_block(q[J._ZZ_ROWS, J._ZZ_COLS], prev,
                                       dc_tabs[ti], ac_tabs[ti], wtr)
        wtr.flush()
        out += seg(0xFFDA, bytes([1, ci + 1, (ti << 4) | ti, 0, 63, 0]))
        out += bytes(wtr.out)
    out += b"\xff\xd9"

    np.testing.assert_array_equal(
        J.decode_jpeg(out), J.decode_jpeg(interleaved))


def test_png_subbyte_depths():
    """Bit depths 1/2/4 (grayscale + palette — the favicon/icon
    layouts): MSB-first unpack, exact full-range gray rescale
    (255/85/17 are integers), packed-byte filtering, and the Adam7
    interaction where passes scatter SAMPLES, not bytes."""
    # 1-bit gray 10x2 checkerboard rows
    r0 = bytes([0b10101010, 0b10000000])
    r1 = bytes([0b01010101, 0b01000000])
    g1 = decode_png(_png_raw(10, 2, 1, 0, b"\x00" + r0 + b"\x00" + r1))
    assert g1[0, :, 0].tolist() == [255, 0] * 5
    assert g1[1, :, 0].tolist() == [0, 255] * 5

    # 2-bit gray 5x1: samples 0,1,2,3,0 -> 0,85,170,255,0
    g2 = decode_png(_png_raw(5, 1, 2, 0,
                             b"\x00" + bytes([0b00011011, 0b00000000])))
    assert g2[0, :, 0].tolist() == [0, 85, 170, 255, 0]

    # 4-bit palette 3x1: indices 2,0,1
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    p4 = decode_png(_png_raw(3, 1, 4, 3, b"\x00" + bytes([0x20, 0x10]),
                             extra_chunks=((b"PLTE", plte),)))
    assert p4.tolist() == [[[70, 80, 90], [10, 20, 30], [40, 50, 60]]]

    # 1-bit Adam7 2x2 checker: pass1 px(0,0)=1, pass6 px(1,0)=0,
    # pass7 row1 = (0,1)
    adam = b"\x00\x80" + b"\x00\x00" + b"\x00\x40"
    ga = decode_png(_png_raw(2, 2, 1, 0, adam,
                             extra_chunks=(("interlace", b""),)))
    assert ga[..., 0].tolist() == [[255, 0], [0, 255]]

    # filters operate on PACKED bytes: Up filter with zero delta
    r = bytes([0b11001100, 0b00110011])
    gf = decode_png(_png_raw(16, 2, 1, 0,
                             b"\x00" + r + b"\x02" + bytes([0, 0])))
    assert (gf[0] == gf[1]).all()

    # sub-byte palette index out of range still rejected
    with pytest.raises(ValueError, match="palette"):
        decode_png(_png_raw(3, 1, 4, 3, b"\x00" + bytes([0x20, 0x30]),
                            extra_chunks=((b"PLTE", plte),)))
    # RGB at sub-byte depth is illegal per spec
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_png_raw(2, 1, 4, 2, b"\x00" + bytes([0, 0, 0])))
