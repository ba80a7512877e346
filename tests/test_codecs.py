"""Pixel/sample-exact oracles for the pure-Python media codecs
(operators/codecs.py) and the real-decode multimodal paths they power.

Layer-1 tests pin HAND-BUILT golden byte strings to exact arrays —
the byte layout is written out literally, not via the encoder, so an
encoder+decoder that agree on a wrong layout cannot pass.  Layer-2
round-trips arbitrary arrays.  Layer-3 drives the Spark operators
(synthesize_media → extract_features/resize_images with fake=False)
and checks the decoded output pixel-exactly against numpy references.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projectmapreduce_spark.operators.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_nearest,
    sniff,
)
from projectmapreduce_spark.operators.multimodal import (
    _synth_pixels,
    extract_features,
    resize_images,
    synthesize_media,
)

# ---------- layer 1: golden bytes ----------


def test_bmp_golden_2x2_bottom_up():
    # 2×2, 24-bpp, bottom-up.  Rows are 6 bytes + 2 pad.  Stored rows:
    # bottom row first, BGR order.
    # Target (top-down RGB): [[red, green], [blue, white]]
    red, green, blue, white = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    stride = 8
    img_size = stride * 2
    hdr = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, img_size, 0, 0, 0, 0)
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\0\0"  # blue, white in BGR
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\0\0"  # red, green in BGR
    payload = hdr + info + bottom_row + top_row
    assert sniff(payload) == "bmp"
    out = decode_bmp(payload)
    np.testing.assert_array_equal(out, np.array([[red, green], [blue, white]], np.uint8))


def test_bmp_golden_top_down_negative_height():
    # Same target image, biHeight = -2 => rows stored top-down.
    stride = 8
    img_size = stride * 2
    hdr = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, img_size, 0, 0, 0, 0)
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\0\0"
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\0\0"
    out = decode_bmp(hdr + info + top_row + bottom_row)
    np.testing.assert_array_equal(
        out, np.array([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]], np.uint8)
    )


def test_bmp_row_padding_width_3():
    # Width 3: 9 payload bytes/row + 3 pad bytes — the classic
    # off-by-stride trap.  1 row, pixels (1,2,3)(4,5,6)(7,8,9) RGB.
    stride = 12
    hdr = struct.pack("<2sIHHI", b"BM", 54 + stride, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 24, 0, stride, 0, 0, 0, 0)
    row = bytes([3, 2, 1, 6, 5, 4, 9, 8, 7]) + b"\0\0\0"  # BGR + pad
    out = decode_bmp(hdr + info + row)
    np.testing.assert_array_equal(out, np.array([[(1, 2, 3), (4, 5, 6), (7, 8, 9)]], np.uint8))


def test_bmp_rejects_non_24bpp():
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="24-bpp"):
        decode_bmp(hdr + info + b"\0" * 8)


def test_ppm_golden_with_comment():
    payload = b"P6\n# a comment\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    assert sniff(payload) == "ppm"
    out = decode_ppm(payload)
    np.testing.assert_array_equal(out, np.array([[(10, 20, 30), (40, 50, 60)]], np.uint8))


def test_wav_golden_with_extra_chunk():
    # RIFF with an odd-sized LIST chunk before data (pad byte rule) —
    # a chunk walker that assumes fmt+data adjacency fails here.
    samples = struct.pack("<4h", -32768, -1, 0, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", 16) + fmt
    body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # odd size + pad
    body += b"data" + struct.pack("<I", len(samples)) + samples
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert sniff(payload) == "wav"
    s, rate = decode_wav(payload)
    assert rate == 8000
    np.testing.assert_array_equal(s[:, 0], np.array([-32768, -1, 0, 32767], np.int16))


def test_wav_rejects_non_pcm16():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------- layer 2: round-trips ----------


def _rng_img(h, w, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (2, 2), (3, 3), (5, 7), (64, 8)])
def test_bmp_roundtrip_exact(shape):
    img = _rng_img(*shape)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("shape", [(1, 1), (4, 3), (17, 5)])
def test_ppm_roundtrip_exact(shape):
    img = _rng_img(*shape)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip_exact(ch):
    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, (777, ch), dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, s)


def test_wav_empty_track():
    out, rate = decode_wav(encode_wav(np.zeros((0,), np.int16), 16000))
    assert out.shape == (0, 1) and rate == 16000


def test_resize_nearest_2x2_to_4x4_exact():
    img = np.array([[(1, 1, 1), (2, 2, 2)], [(3, 3, 3), (4, 4, 4)]], np.uint8)
    out = resize_nearest(img, 4, 4)
    expect = np.array(
        [
            [(1,) * 3, (1,) * 3, (2,) * 3, (2,) * 3],
            [(1,) * 3, (1,) * 3, (2,) * 3, (2,) * 3],
            [(3,) * 3, (3,) * 3, (4,) * 3, (4,) * 3],
            [(3,) * 3, (3,) * 3, (4,) * 3, (4,) * 3],
        ],
        np.uint8,
    )
    np.testing.assert_array_equal(out, expect)


def test_resize_nearest_identity():
    img = _rng_img(6, 6)
    np.testing.assert_array_equal(resize_nearest(img, 6, 6), img)


# ---------- layer 3: Spark operators, real decode ----------


def test_synthesize_and_extract_pixel_exact(spark):
    from projectmapreduce_spark.io import scan
    from tests.conftest import SF_SMOKE

    d = scan(spark, SF_SMOKE, "documents").limit(20)
    media = synthesize_media(d, "doc_id", "text", kind="image")
    feats = {r.media_id: r for r in extract_features(media, dim=16, fake=False).collect()}
    for r in d.collect():
        px = _synth_pixels(r.text.encode("utf-8"))
        hist = np.bincount(px.ravel() % 16, minlength=16).astype(float)
        hist /= hist.sum()
        got = feats[r.doc_id]
        assert (got.height, got.width) == px.shape[:2]
        np.testing.assert_allclose(got.features, hist, rtol=1e-12)


def test_resize_images_real_decode_pixel_exact(spark):
    from projectmapreduce_spark.io import scan
    from tests.conftest import SF_SMOKE

    d = scan(spark, SF_SMOKE, "documents").limit(8)
    media = synthesize_media(d, "doc_id", "text", kind="image")
    resized = {r.media_id: r for r in resize_images(media, 4, 4, fake=False).collect()}
    for r in d.collect():
        src = _synth_pixels(r.text.encode("utf-8"))
        expect = resize_nearest(src, 4, 4)
        got = decode_bmp(bytes(resized[r.doc_id].payload))
        np.testing.assert_array_equal(got, expect)
        assert (resized[r.doc_id].width, resized[r.doc_id].height) == (4, 4)


def test_audio_synthesis_samples_exact(spark):
    from projectmapreduce_spark.io import scan
    from tests.conftest import SF_SMOKE

    d = scan(spark, SF_SMOKE, "documents").limit(10)
    media = synthesize_media(d, "doc_id", "text", kind="audio")
    rows = {r.media_id: r for r in media.collect()}
    for r in d.collect():
        seed = r.text.encode("utf-8")
        s, rate = decode_wav(bytes(rows[r.doc_id].payload))
        assert rate == 16000
        expect = (np.frombuffer(seed, np.uint8).astype(np.int16) - 128) * 256
        np.testing.assert_array_equal(s[:, 0], expect)
        assert rows[r.doc_id].duration_ms == len(seed) * 1000 // 16000


# ---------- AVI (round 3) ----------


def test_avi_golden_1x1_two_frames():
    """Hand-built byte layout: 2 frames of a single pixel.  Pins the
    RIFF tree (hdrl/avih/strl/strh/strf sizes), the 00db chunk ids and
    the per-frame DIB raster (1 px -> 3 bytes + 1 pad byte to stride 4,
    odd chunk size -> 1 RIFF pad byte)."""
    import struct

    from projectmapreduce_spark.operators.codecs import decode_avi, encode_avi

    f0 = np.array([[[10, 20, 30]]], dtype=np.uint8)  # RGB
    f1 = np.array([[[200, 150, 100]]], dtype=np.uint8)
    payload = encode_avi(np.stack([f0, f1]), fps=25)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    # hdrl starts right after the RIFF form type
    assert payload[12:16] == b"LIST" and payload[20:24] == b"hdrl"
    assert payload[24:28] == b"avih"
    (us,) = struct.unpack_from("<I", payload, 32)
    assert us == 1_000_000 // 25
    # movi list contains two 00db chunks of 4 bytes (3 BGR + 1 stride pad)
    movi_at = payload.find(b"movi")
    c0 = movi_at + 4
    assert payload[c0 : c0 + 4] == b"00db"
    (sz,) = struct.unpack_from("<I", payload, c0 + 4)
    assert sz == 4  # stride 4 for 1 px
    assert payload[c0 + 8 : c0 + 12] == bytes([30, 20, 10, 0])  # BGR + pad
    back, fps = decode_avi(payload)
    assert fps == 25
    np.testing.assert_array_equal(back, np.stack([f0, f1]))


def test_avi_roundtrip_exact():
    rng = np.random.default_rng(11)
    for shape in [(1, 1, 1, 3), (3, 5, 7, 3), (8, 4, 4, 3)]:
        frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
        from projectmapreduce_spark.operators.codecs import decode_avi, encode_avi

        back, fps = decode_avi(encode_avi(frames, fps=10))
        assert fps == 10
        np.testing.assert_array_equal(back, frames)


def test_video_synthesis_and_real_frame_sampling(spark):
    """End-to-end real video path: synthesize AVI from text, decode via
    sample_frames(fake=False), verify every sampled frame is a valid
    BMP whose pixels equal the synth frame (np.roll of the base image),
    and that the stride-2 sampling picks exactly frames 0, 2, 4, …"""
    from projectmapreduce_spark.io import scan
    from projectmapreduce_spark.operators.multimodal import (
        _synth_frames,
        sample_frames,
        synthesize_media,
    )
    from tests.conftest import SF_SMOKE

    d = scan(spark, SF_SMOKE, "documents").limit(6)
    media = synthesize_media(d, "doc_id", "text", kind="video")
    frames = sample_frames(media, fake=False, every_n_frames=2).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for r in frames:
        by_doc.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame_payload)
    for r in d.collect():
        stack = _synth_frames(r.text.encode("utf-8"))
        expect_idx = list(range(0, stack.shape[0], 2))
        assert sorted(by_doc[r.doc_id]) == expect_idx
        for i in expect_idx:
            np.testing.assert_array_equal(
                decode_bmp(by_doc[r.doc_id][i]), stack[i]
            )


# ---------- PNG ----------


def test_png_golden_all_five_filters():
    """Hand-built 2×5 RGB PNG exercising every scanline filter type.
    The filtered bytes are derived BY HAND from RFC 2083 §6 (written
    in the comments), so a decoder whose unfilter math is wrong in any
    of the five reconstructions cannot pass."""
    import zlib

    from projectmapreduce_spark.operators.codecs import decode_png

    # target pixels (top-down RGB), stride = 6:
    want = np.array(
        [
            [(10, 20, 30), (40, 50, 60)],      # row0, filter 0 None
            [(15, 25, 35), (20, 30, 40)],      # row1, filter 1 Sub
            [(115, 125, 135), (220, 230, 240)],  # row2, filter 2 Up
            [(120, 130, 140), (200, 210, 220)],  # row3, filter 3 Average
            [(100, 110, 120), (50, 60, 70)],   # row4, filter 4 Paeth
        ],
        np.uint8,
    )
    raw = bytes(
        [0, 10, 20, 30, 40, 50, 60]              # None: raw == recon
        + [1, 15, 25, 35, 5, 5, 5]               # Sub: x<3 raw, then 20-15 etc.
        + [2, 100, 100, 100, 200, 200, 200]      # Up: 115-15, 220-20 etc.
        + [3, 63, 68, 73, 30, 30, 30]            # Avg: 120-(0+115)//2, 200-(120+220)//2
        + [4, 236, 236, 236, 106, 106, 106]      # Paeth: 100-120 mod 256, 50-200 mod 256
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 5, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert sniff(payload) == "png"
    np.testing.assert_array_equal(decode_png(payload), want)


def test_png_rgba_drops_alpha_and_gray_replicates():
    import zlib

    from projectmapreduce_spark.operators.codecs import decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 2×1 RGBA (color type 6): alpha bytes must be dropped, not blended
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    raw = bytes([0, 1, 2, 3, 99, 4, 5, 6, 77])
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        decode_png(p), np.array([[(1, 2, 3), (4, 5, 6)]], np.uint8)
    )
    # 2×1 grayscale (color type 0): gray plane replicated to RGB
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    raw = bytes([0, 9, 200])
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        decode_png(p), np.array([[(9, 9, 9), (200, 200, 200)]], np.uint8)
    )


def test_png_crc_mismatch_and_boundary_raise():
    import zlib

    from projectmapreduce_spark.operators.codecs import decode_png, encode_png

    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    # flip one byte inside the IDAT body -> CRC check must fire
    idat_at = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # palette (color type 3) is the documented codec boundary
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(p)


@pytest.mark.parametrize("shape", [(1, 1, 3), (3, 5, 3), (64, 8, 3)])
def test_png_roundtrip_exact(shape):
    from projectmapreduce_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    np.testing.assert_array_equal(out, arr)


def test_png_synthesis_matches_bmp_decode_pixel_exact(spark):
    """Cross-codec oracle: the PNG and BMP renditions of the same seed
    must decode to IDENTICAL pixel arrays (and both equal the numpy
    synthesis reference) — a container bug in either codec breaks the
    agreement."""
    from projectmapreduce_spark.operators.codecs import decode_bmp, decode_png

    rows = [(1, "hello png world"), (2, ""), (3, "x" * 500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    png = {
        r.media_id: bytes(r.payload)
        for r in synthesize_media(df, "doc_id", "text", kind="image", image_format="png").collect()
    }
    bmp = {
        r.media_id: bytes(r.payload)
        for r in synthesize_media(df, "doc_id", "text", kind="image").collect()
    }
    for i, text in rows:
        ref = _synth_pixels(text.encode())
        np.testing.assert_array_equal(decode_png(png[i]), ref)
        np.testing.assert_array_equal(decode_png(png[i]), decode_bmp(bmp[i]))


def test_png_resize_real_decode(spark):
    from projectmapreduce_spark.operators.codecs import decode_png

    df = spark.createDataFrame([(1, "resize me please, twelve")], "doc_id long, text string")
    media = synthesize_media(df, "doc_id", "text", kind="image", image_format="png")
    out = resize_images(media, 4, 4, fake=False).collect()[0]
    px = decode_png(bytes(out.payload))
    ref = resize_nearest(_synth_pixels(b"resize me please, twelve"), 4, 4)
    np.testing.assert_array_equal(px, ref)


# ---------- GIF ----------


def test_gif_golden_2x2_hand_packed_lzw():
    """Hand-assembled GIF89a: 2×2, 4-color global palette, LZW stream
    packed BY HAND (clear,0,1,2,3,eoi with the 3→4-bit width growth at
    dictionary size 8) — an encoder/decoder pair that share a wrong
    width rule cannot pass."""
    from projectmapreduce_spark.operators.codecs import decode_gif

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x91, 0, 0)
        + palette
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([0x02])                      # LZW min code size
        + bytes([0x03, 0x44, 0x34, 0x05])    # hand-packed code stream
        + b"\x00" + b"\x3b"
    )
    assert sniff(payload) == "gif"
    from projectmapreduce_spark.operators.codecs import decode_gif

    out = decode_gif(payload)
    want = np.array(
        [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]], np.uint8
    )
    np.testing.assert_array_equal(out, want)


def test_gif_interlaced_rows_reordered():
    """Same pixels, interlace flag set: stored row order is the 4-pass
    schedule (h=5 → 0,4,2,1,3); the decoder must undo it."""
    from projectmapreduce_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, size=(5, 3), dtype=np.uint8)
    rgb = np.stack([img * 60, img * 10, 255 - img * 60], axis=2).astype(np.uint8)
    plain = bytearray(encode_gif(rgb))
    # rewrite the raster with rows in interlace order and set the flag
    desc_at = plain.index(0x2C, 13)
    iflags_at = desc_at + 9
    order = [0, 4, 2, 1, 3]
    inter = rgb[order]
    reenc = bytearray(encode_gif(inter))
    reenc_desc = reenc.index(0x2C, 13)
    reenc[reenc_desc + 9] |= 0x40
    np.testing.assert_array_equal(decode_gif(bytes(reenc)), rgb)
    assert plain is not None and iflags_at > 0  # (layout sanity)


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (40, 8)])
def test_gif_roundtrip_exact(shape):
    from projectmapreduce_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    # ≤16 distinct colors so the palette fits easily
    idx = rng.integers(0, 16, size=shape, dtype=np.uint8)
    arr = np.stack([idx * 16, 255 - idx * 16, idx * 3], axis=2).astype(np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(arr)), arr)


def test_gif_roundtrip_forces_dict_reset():
    """A long noisy image forces the LZW dictionary past 4096 entries →
    the encoder must emit a mid-stream clear and the decoder must
    resync."""
    from projectmapreduce_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, size=(256, 64), dtype=np.uint8)
    arr = np.stack([idx, idx, idx], axis=2).astype(np.uint8)  # 256 gray levels
    np.testing.assert_array_equal(decode_gif(encode_gif(arr)), arr)


def test_gif_too_many_colors_raises():
    from projectmapreduce_spark.operators.codecs import encode_gif

    g = np.arange(32 * 32, dtype=np.uint16)
    arr = np.stack([g % 256, g // 256, np.zeros_like(g)], axis=1).astype(np.uint8)
    with pytest.raises(ValueError, match="256 colors"):
        encode_gif(arr.reshape(32, 32, 3))


def test_gif_extract_features_through_spark(spark):
    from projectmapreduce_spark.operators.codecs import encode_gif

    img = np.array([[(10, 20, 30), (40, 50, 60)]], np.uint8)
    rows = [(1, "gif", bytearray(encode_gif(img)), "image/gif", None, None, None)]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = extract_features(media, dim=16, fake=False).collect()[0]
    assert (out.width, out.height) == (2, 1)
    assert abs(sum(out.features) - 1.0) < 1e-9


def test_gif_resize_real_decode(spark):
    from projectmapreduce_spark.operators.codecs import decode_gif, encode_gif

    img = np.array([[(10, 20, 30), (40, 50, 60)], [(5, 5, 5), (7, 7, 7)]], np.uint8)
    rows = [(1, "gif", bytearray(encode_gif(img)), "image/gif", None, None, None)]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = resize_images(media, 4, 4, fake=False).collect()[0]
    from projectmapreduce_spark.operators.codecs import resize_nearest

    np.testing.assert_array_equal(
        decode_gif(bytes(out.payload)), resize_nearest(img, 4, 4)
    )


# ---------- JPEG ----------


def test_jpeg_golden_dc_only_grayscale():
    """Hand-assembled baseline JPEG: one 8×8 grayscale block whose
    entropy data is packed BY HAND — DC category 5 (code 110) + value
    bits 10000 (diff 16) + EOB (code 1010), padded with 1s.  The
    decoded block must be the constant round(16·Q00/8) + 128 = 160:
    a decoder with wrong canonical-code construction, wrong magnitude
    extension, or wrong IDCT scaling cannot produce it."""
    from projectmapreduce_spark.operators.codecs import (
        _DC_LUM,
        _AC_LUM,
        _Q_LUM,
        _ZIGZAG,
        decode_jpeg,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(_Q_LUM.reshape(64)[_ZIGZAG].astype(np.uint8)))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1]))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_AC_LUM[0]) + bytes(_AC_LUM[1]))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + dht_dc + dht_ac + sof + sos
        + bytes([0xD0, 0xAF])  # hand-packed: 110 10000 1010 + 1-padding
        + b"\xff\xd9"
    )
    assert sniff(payload) == "jpeg"
    out = decode_jpeg(payload)
    np.testing.assert_array_equal(out, np.full((8, 8, 3), 160, np.uint8))


def test_jpeg_roundtrip_bounded_error():
    """JPEG is lossy; the contract is BOUNDED quantization error.  A
    smooth gradient (energy in low frequencies) must round-trip within
    a few codes; a flat field within ±2."""
    from projectmapreduce_spark.operators.codecs import decode_jpeg, encode_jpeg

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255 / (h - 1), xx * 255 / (w - 1), (yy + xx) * 255 / (h + w - 2)],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 3.0

    flat = np.full((8, 8, 3), 119, np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(flat)).astype(int) - 119).max() <= 2


def test_jpeg_odd_dimensions_and_boundaries():
    from projectmapreduce_spark.operators.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    odd = rng.integers(0, 256, (13, 11, 3), np.uint8)
    assert decode_jpeg(encode_jpeg(odd)).shape == (13, 11, 3)

    # progressive (SOF2) is the documented boundary
    p = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    sof_at = bytes(p).index(b"\xff\xc0")
    p[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")


def test_jpeg_extract_features_through_spark(spark):
    from projectmapreduce_spark.operators.codecs import encode_jpeg

    img = np.full((9, 7, 3), 100, np.uint8)
    rows = [(1, "jpeg", bytearray(encode_jpeg(img)), "image/jpeg", None, None, None)]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = extract_features(media, dim=16, fake=False).collect()[0]
    assert (out.width, out.height) == (7, 9)
    assert abs(sum(out.features) - 1.0) < 1e-9


# ---------- round-5 advice regressions ----------


def test_jpeg_rejects_4_component_cmyk():
    """Adobe CMYK/YCCK baseline: 4 components, each sampling 0x11 —
    must hit the codec boundary (NotImplementedError), never silently
    decode as YCbCr with the K plane dropped."""
    from projectmapreduce_spark.operators.codecs import decode_jpeg

    sof_body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([4]) + bytes(
        b for c in range(4) for b in (c + 1, 0x11, 0)
    )
    payload = b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    with pytest.raises(NotImplementedError, match="4-component"):
        decode_jpeg(payload)


def test_jpeg_grayscale_rounds_like_color():
    """Grayscale (1-component) decode must .round() like the color
    path, not truncate.  Hand-build a 1-component stream (the encoder
    only emits 3-component), then pin decode output against an exact
    independent IDCT reference computed with .round() — truncation
    shifts every fractional reconstruction ≥ x.5 down one level."""
    from projectmapreduce_spark.operators import codecs as C

    g = (np.arange(64, dtype=np.float64).reshape(8, 8) * 3.7 + 10.0) % 256

    # quantize one 8x8 block exactly as the encoder does
    coef = C._DCT_M @ (g - 128.0) @ C._DCT_M.T
    q = np.round(coef / C._Q_LUM).astype(np.int64)
    zz = q.reshape(64)[C._ZIGZAG]

    dc_tab = C._huff_codes(*C._DC_LUM)
    ac_tab = C._huff_codes(*C._AC_LUM)
    bw = C._BitWriter()
    s, bits = C._mag_bits(int(zz[0])) if zz[0] else (0, 0)
    code, ln = dc_tab[s]
    bw.put(code, ln)
    if s:
        bw.put(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.put(code, ln)
            run -= 16
        s, bits = C._mag_bits(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]
        bw.put(code, ln)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(C._Q_LUM.reshape(64)[C._ZIGZAG].astype(np.uint8)))
        + seg(0xC4, bytes([0x00]) + bytes(C._DC_LUM[0]) + bytes(C._DC_LUM[1]))
        + seg(0xC4, bytes([0x10]) + bytes(C._AC_LUM[0]) + bytes(C._AC_LUM[1]))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )

    dec = C.decode_jpeg(payload)
    recon = C._DCT_M.T @ (q * C._Q_LUM).astype(np.float64) @ C._DCT_M + 128.0
    expected = np.clip(recon, 0, 255).round().astype(np.uint8)
    # the reference includes sub-half fractional values, so truncation
    # would diverge — guard that the pin is actually discriminating
    frac = np.abs(recon - np.floor(recon) - 0.5)
    assert (np.abs(recon - np.round(recon)) > 1e-9).any() and (frac < 0.49).any()
    np.testing.assert_array_equal(dec[:, :, 0], expected)
    np.testing.assert_array_equal(dec[:, :, 1], expected)


def test_gif_out_of_range_palette_index_is_valueerror():
    """A raster whose LZW output indexes past the color table must
    raise the codec's ValueError, not a numpy IndexError (table has 2
    entries, pixel code 3 is representable at min_code=2)."""
    from projectmapreduce_spark.operators.codecs import decode_gif

    header = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)  # GCT depth 1 (2 entries)
    table = bytes(6)
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    # min_code=2: codes [clear=4, 3, eoi=5] packed LSB-first at width 3
    lzw = bytes([2, 2, 0x5C, 0x01, 0])
    payload = header + table + img_desc + lzw + b"\x3b"
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(payload)


def test_jpeg_stray_restart_marker_is_valueerror():
    """An RSTn encountered mid-entropy-decode on a stream with no DRI
    must surface as ValueError from any decode position (DC, AC, or
    magnitude bits), never the internal _RestartMarker."""
    from projectmapreduce_spark.operators.codecs import decode_jpeg, encode_jpeg

    arr = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = bytearray(encode_jpeg(arr))
    sos = payload.find(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", payload, sos + 2)
    scan_start = sos + 2 + ln
    # overwrite the first entropy bytes with an RST0 marker
    payload[scan_start : scan_start + 2] = b"\xff\xd0"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
