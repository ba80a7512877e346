"""Container/framing-layer codec tests (operators/containers.py):
golden bytes, published check vectors, corruption triage, and the
writer↔walker cross-checks the l11h/l11i oracles lean on."""

from __future__ import annotations

import struct

import pytest

from projectmapreduce_spark.operators.containers import (
    MPEG1_L3_BITRATES_KBPS,
    crc16_mpeg,
    encode_mp4_minimal,
    encode_mpeg_frames,
    mp4_synth_sample_sizes,
    mpeg_frame_length,
    parse_mpeg_frames,
    probe_mp4,
    walk_boxes,
)

SEED = "hello world, this is a test document".encode()


# ---------- CRC: published check vector ----------


def test_crc16_mpeg_check_vector():
    """CRC-16 poly 0x8005, init 0xFFFF, MSB-first, no xorout is the
    published CRC-16/CMS parameterization; its standard check value
    over b'123456789' is 0xAEE7 — an EXTERNAL validation that the CRC
    implementation matches the MPEG audio spec, not just itself."""
    assert crc16_mpeg(b"123456789") == 0xAEE7


# ---------- MPEG frame arithmetic: hand-computed slot lengths ----------


def test_mpeg_frame_lengths_hand_computed():
    # 144000*kbps // 44100 (+ padding), computed by hand
    assert mpeg_frame_length(128, 44100, 0) == 417
    assert mpeg_frame_length(160, 44100, 1) == 523
    assert mpeg_frame_length(192, 44100, 0) == 626
    assert mpeg_frame_length(320, 48000, 0) == 960
    assert mpeg_frame_length(32, 32000, 1) == 145


def test_mpeg_bitrate_table_is_the_public_one():
    assert MPEG1_L3_BITRATES_KBPS[1:15] == (
        32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320
    )


# ---------- MPEG golden bytes ----------


def test_mpeg_golden_first_frame_header():
    """Frame 0 of the synth schedule: 128 kbps (index 9), 44100 Hz
    (index 0), no padding, protected (CRC present), mono — header
    bytes FF FB would be unprotected; protected is FF FA.  Golden
    bytes hand-assembled from the ISO bit layout."""
    p = encode_mpeg_frames(SEED, 1)
    assert p[0] == 0xFF
    assert p[1] == 0b1111_1010  # sync|MPEG1|LayerIII|protection=0
    assert p[2] == 0b1001_0000  # bitrate idx 9 | rate idx 0 | pad 0
    assert p[3] == 0b1100_0100  # mono | original
    assert len(p) == 417
    # stored CRC must equal a recomputation over header[2:4]+side info
    side = p[6 : 6 + 17]
    assert struct.unpack(">H", p[4:6])[0] == crc16_mpeg(p[2:4] + side)


def test_mpeg_stream_walk_matches_schedule():
    p = encode_mpeg_frames(SEED, 7)
    frames = parse_mpeg_frames(p)
    assert [f["kbps"] for f in frames] == [128, 160, 192, 128, 160, 192, 128]
    assert [f["padding"] for f in frames] == [0, 1, 0, 1, 0, 1, 0]
    assert [f["crc"] for f in frames] == [True, False, True, False, True, False, True]
    assert sum(f["n_bytes"] for f in frames) == len(p)
    assert all(f["samplerate"] == 44100 for f in frames)


def test_mpeg_corruption_triage():
    p = encode_mpeg_frames(SEED, 3)
    frames = parse_mpeg_frames(p)
    # flip a CRC-covered side-info byte in the protected first frame
    bad = bytearray(p)
    bad[8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_mpeg_frames(bytes(bad))
    # destroy the sync word of frame 1
    off = frames[0]["n_bytes"]
    bad = bytearray(p)
    bad[off] = 0x00
    with pytest.raises(ValueError, match="lost sync"):
        parse_mpeg_frames(bytes(bad))
    # truncate mid-frame
    with pytest.raises(ValueError, match="overruns"):
        parse_mpeg_frames(p[:-5])
    # forbidden bitrate index (15) in frame 0
    bad = bytearray(p)
    bad[2] |= 0xF0
    with pytest.raises(ValueError, match="forbidden"):
        parse_mpeg_frames(bytes(bad))


# ---------- MP4 golden structure ----------


def test_mp4_golden_layout_constants():
    """The l11i oracle's arithmetic: total = 400 + 4·n + Σ sizes and
    exactly 14 boxes — pinned here against the actual writer output at
    two different (seed, n) points so the oracle constant cannot drift
    from the byte layout."""
    for seed, n in ((SEED, 5), (b"", 1), (b"x" * 999, 31)):
        m = encode_mp4_minimal(seed, n)
        sizes = mp4_synth_sample_sizes(len(seed), n)
        assert len(m) == 400 + 4 * n + sum(sizes)
        boxes = walk_boxes(m)
        assert len(boxes) == 14
        assert [b["fourcc"] for b in boxes if b["depth"] == 0] == ["ftyp", "moov", "mdat"]


def test_mp4_probe_cross_checks():
    m = encode_mp4_minimal(SEED, 5)
    info = probe_mp4(m)
    assert info["n_samples"] == 5
    assert info["timescale"] == 1000
    assert info["duration"] == 125
    assert info["mdat_bytes"] == sum(mp4_synth_sample_sizes(len(SEED), 5))
    assert info["total_bytes"] == len(m)


def test_mp4_corruption_triage():
    m = encode_mp4_minimal(SEED, 4)
    # box size escaping its parent
    bad = bytearray(m)
    bad[0] = 0xFF
    with pytest.raises(ValueError, match="escapes parent"):
        walk_boxes(bytes(bad))
    # truncated mdat: box sizes no longer reach the end
    with pytest.raises(ValueError, match="escapes parent"):
        probe_mp4(m[:-3])
    # metadata lies about sample sizes: bump one stsz entry — the
    # stsz-sum == mdat cross-check must catch it even though every
    # box still parses
    boxes = {b["fourcc"]: b for b in walk_boxes(m)}
    stsz = boxes["stsz"]
    first_size_off = stsz["body_offset"] + 12
    bad = bytearray(m)
    bad[first_size_off + 3] ^= 0x01
    with pytest.raises(ValueError, match="stsz sum"):
        probe_mp4(bytes(bad))


def test_mp4_gap_between_boxes_rejected():
    m = encode_mp4_minimal(SEED, 2)
    # shrink ftyp's size by 4: walker lands mid-box and must fail on
    # the garbage fourcc/size rather than resynchronize silently
    bad = bytearray(m)
    bad[3] -= 4
    with pytest.raises(ValueError):
        walk_boxes(bytes(bad))
