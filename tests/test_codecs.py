"""Real media codecs (core.codecs) + the S4 decode path they unlock.

The reference decodes embedded media with PIL/cv2/ffmpeg; this engine
decodes PNG/BMP/PNM/WAV with pure stdlib + numpy (core/codecs.py) and
falls back to the documented deterministic stub for entropy-coded
formats. These tests pin: exact encode→decode roundtrips across every
PNG filter type and color type, hand-built palette/BMP/PNM corner
layouts, the box-mean resize and luma-grid feature arithmetic, and the
distributed decode / thumbnail / audio stages against ENCODE-side
ground truth (fixtures.media_gen records dims/checksums before
encoding, so Spark-side agreement is an encoder↔decoder inverse
check, not an identity).
"""

import struct
import zlib

import numpy as np
import pytest

from pdf_table_spark.core import codecs as C


def _rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------- PNG


@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "cycle"])
@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (7, 5, 4),
                                   (1, 1), (2, 300, 3)])
def test_png_roundtrip_all_filters(filter_mode, shape):
    arr = _rng(3).integers(0, 256, size=shape, dtype=np.uint8)
    back = C.png_decode(C.png_encode(arr, filter_mode=filter_mode))
    assert back.shape == arr.shape
    assert (back == arr).all()


def test_png_gradient_exercises_predictors():
    # smooth content makes Sub/Up/Average/Paeth residuals mostly zero;
    # any off-by-one in the predictors shows up as wrong pixels
    y, x = np.mgrid[0:40, 0:60]
    arr = ((y * 3 + x * 2) % 256).astype(np.uint8)
    for fm in (1, 2, 3, 4):
        assert (C.png_decode(C.png_encode(arr, filter_mode=fm))
                == arr).all()


def test_png_multi_idat_and_palette():
    # hand-build: palette color type 3, pixel data split across two
    # IDAT chunks — both paths the encoder itself never emits
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    comp = zlib.compress(raw)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    data = (C.PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", comp[:5]) + chunk(b"IDAT", comp[5:])
            + chunk(b"IEND", b""))
    out = C.png_decode(data)
    assert out.shape == (2, 3, 3)
    assert (out == pal[idx]).all()


def test_png_rejects_bad_crc_interlace_depth():
    arr = np.zeros((4, 4), dtype=np.uint8)
    good = bytearray(C.png_encode(arr))
    good[20] ^= 0xFF  # corrupt inside IHDR body → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        C.png_decode(bytes(good))

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    interlaced = (C.PNG_MAGIC + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        C.png_decode(interlaced)
    deep = (C.PNG_MAGIC + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 40))
        + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        C.png_decode(deep)


# ------------------------------------------------------------- BMP


def test_bmp_roundtrip_and_padding():
    # width 3 → 9-byte rows padded to 12: exercises stride logic
    arr = _rng(5).integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    data = C.bmp_encode(arr)
    assert C.sniff(data) == "bmp"
    assert (C.bmp_decode(data) == arr).all()


def test_bmp_topdown_and_32bit():
    # hand-build a top-down (negative height) 32-bit BMP
    arr = _rng(6).integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    bgra = arr[:, :, [2, 1, 0, 3]]
    pix = bgra.tobytes()
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0,
                         len(pix), 0, 0, 0, 0))
    out = C.bmp_decode(hdr + pix)
    assert out.shape == (2, 2, 4)
    assert (out == arr).all()


def test_bmp_8bit_gray_palette():
    gray = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    stride_rows = [bytes([gray[1, 0], gray[1, 1], 0, 0]),
                   bytes([gray[0, 0], gray[0, 1], 0, 0])]  # bottom-up
    pix = b"".join(stride_rows)
    hdr = (b"BM" + struct.pack("<IHHI", 54 + 1024 + len(pix), 0, 0,
                               54 + 1024)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0,
                         len(pix), 0, 0, 256, 0))
    out = C.bmp_decode(hdr + pal + pix)
    assert out.shape == (2, 2)
    assert (out == gray).all()


# ------------------------------------------------------------- PNM


def test_pnm_roundtrip_and_comment():
    g = _rng(7).integers(0, 256, size=(3, 4), dtype=np.uint8)
    assert (C.pnm_decode(C.pnm_encode(g)) == g).all()
    rgb = _rng(8).integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert (C.pnm_decode(C.pnm_encode(rgb)) == rgb).all()
    with_comment = b"P5\n# a comment line\n4 3\n255\n" + g.tobytes()
    assert (C.pnm_decode(with_comment) == g).all()


# ------------------------------------------------------------- WAV


def test_wav_roundtrip_mono_stereo():
    mono = (np.sin(np.arange(3000) / 7) * 12345).astype(np.int16)
    arr, rate = C.wav_decode(C.wav_encode(mono, 22050))
    assert rate == 22050 and arr.shape == (3000, 1)
    assert (arr[:, 0] == mono).all()
    stereo = _rng(9).integers(-32768, 32767, size=(100, 2),
                              dtype=np.int16)
    arr, rate = C.wav_decode(C.wav_encode(stereo, 8000))
    assert rate == 8000 and (arr == stereo).all()


# ------------------------------------------- resize / feature math


def test_resize_box_exact_means():
    # 4x4 → 2x2: each output pixel is the floor-mean of its 2x2 bin
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = C.resize_box(arr, 2, 2)
    assert out.tolist() == [[(0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4],
                            [(8 + 9 + 12 + 13) // 4,
                             (10 + 11 + 14 + 15) // 4]]
    # upscale axis degrades to nearest-neighbor replication
    up = C.resize_box(np.array([[1, 2]], dtype=np.uint8), 4, 2)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


def test_to_gray_and_feature():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (0, 255, 0)
    rgb[1, 0] = (0, 0, 255)
    rgb[1, 1] = (255, 255, 255)
    g = C.to_gray(rgb)
    assert g.tolist() == [[255 * 299 // 1000, 255 * 587 // 1000],
                          [255 * 114 // 1000, 255]]
    f = C.image_feature(rgb)
    assert len(f) == 16
    assert abs(sum(v * v for v in f) - 1.0) < 1e-5
    assert f == C.image_feature(rgb)  # deterministic


# --------------------------------------- distributed decode stages


def test_decode_media_matches_encode_side_truth(spark):
    from pdf_table_spark.fixtures.media_gen import (media_payloads,
                                                    media_truth)
    from pdf_table_spark.ops.multimodal import decode_media
    rows = [r for r in media_payloads()
            if r["media_ref"].startswith("media://img/")]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r["media_ref"]: r for r in decode_media(df).collect()}
    truth = media_truth()
    assert len(got) == len(truth)
    for t in truth:
        g = got[t["media_ref"]]
        assert g["width"] == t["src_width"], t["media_ref"]
        assert g["height"] == t["src_height"], t["media_ref"]
        assert g["format"] == t["format"], t["media_ref"]
        assert g["n_bytes"] == t["n_bytes"], t["media_ref"]
        # feature is the real 4x4 luma grid of the decoded pixels
        assert len(g["feature"]) == 16
        assert abs(sum(v * v for v in g["feature"]) - 1.0) < 1e-4


def test_decode_media_pixel_checksum():
    # driver-side: decoded pixels match the pre-encode checksum exactly
    from pdf_table_spark.fixtures.media_gen import (media_payloads,
                                                    media_truth)
    truth = {t["media_ref"]: t for t in media_truth()}
    for r in media_payloads():
        if not r["media_ref"].startswith("media://img/"):
            continue
        arr, fmt = C.decode_image(r["payload"])
        t = truth[r["media_ref"]]
        assert int(arr.astype(np.int64).sum()) == t["px_sum"]
        assert fmt == t["format"]


def test_thumbnail_media_distributed(spark):
    from pdf_table_spark.fixtures.media_gen import media_payloads
    from pdf_table_spark.ops.multimodal import thumbnail_media
    rows = [r for r in media_payloads()
            if r["media_ref"].startswith("media://img/")][:12]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {r["media_ref"]: r
           for r in thumbnail_media(df, 64, 64).collect()}
    assert len(out) == len(rows)
    for r in rows:
        src, _ = C.decode_image(r["payload"])
        sh, sw = src.shape[:2]
        scale = min(64 / sw, 64 / sh, 1.0)
        ow, oh = max(1, int(sw * scale)), max(1, int(sh * scale))
        expect = C.resize_box(src, ow, oh)
        g = out[r["media_ref"]]
        assert (g["width"], g["height"]) == (ow, oh)
        thumb = C.png_decode(bytes(g["thumb"]))
        assert thumb.shape == expect.shape
        assert (thumb == expect).all()  # exact distributed == local


def test_decode_audio_matches_truth(spark):
    from pdf_table_spark.fixtures.media_gen import (media_payloads,
                                                    wav_truth)
    from pdf_table_spark.ops.multimodal import decode_audio
    rows = [r for r in media_payloads()
            if r["media_ref"].startswith("media://wav/")]
    # decode_audio drops non-wav rows: feed it one image row too
    rows.append({"media_ref": "media://img/0000",
                 "payload": C.png_encode(
                     np.zeros((2, 2), dtype=np.uint8))})
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r["media_ref"]: r for r in decode_audio(df).collect()}
    truth = wav_truth()
    assert len(got) == len(truth)  # the png row was dropped
    for t in truth:
        g = got[t["media_ref"]]
        for k in ("sample_rate", "n_channels", "n_frames",
                  "duration_ms", "peak"):
            assert g[k] == t[k], (t["media_ref"], k)


def test_magic_prefix_collision_falls_back():
    # a utf8 "payload" that happens to start with BMP magic must fall
    # back to the stub decode, not crash the stage
    from pdf_table_spark.ops.multimodal import _decode_image
    w, h, fmt, feat = _decode_image(b"BM-this-is-not-a-bitmap-at-all")
    assert 64 <= w and 64 <= h and len(feat) == 16
    w2, h2, fmt2, _ = _decode_image(b"P6 but actually just text")
    assert 64 <= w2 and 64 <= h2
