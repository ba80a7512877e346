"""Container/framing-layer codecs: MPEG audio frame streams and
MP4 (ISO base media file format) box trees — pure Python, zero deps.

The multimodal codec boundary, one layer deeper (VERDICT r5 stretch
item): full MPEG-1 Layer III PCM decode needs the ISO/IEC 11172-3
Huffman code tables, which are not available in this environment and
cannot be reproduced from memory without risking a non-compliant
decoder that silently mis-decodes real files — so SAMPLE decode stays
a documented ``NotImplementedError``.  What IS fully specified by
public knowledge and implemented for real here is the layer every
100 TB media-ingest pipeline needs FIRST: frame/box-level parsing —
sync scanning, header field tables, frame-length arithmetic, CRC-16
validation, box-tree walking with size/nesting validation — the
metadata extraction, corruption triage, and chunk-boundary work that
runs over petabytes of crawled media before any sample is decoded.

Format facts used (all public, stable since 1993/2001):

- MPEG-1 audio frame header (ISO/IEC 11172-3 §2.4.1.3): 32 bits =
  11-bit sync (all ones), 2-bit version ID (0b11 = MPEG-1), 2-bit
  layer (0b01 = Layer III), 1-bit protection (0 = CRC-16 present),
  4-bit bitrate index, 2-bit sampling-rate index, 1-bit padding,
  1-bit private, 2-bit channel mode, 2-bit mode extension, 1-bit
  copyright, 1-bit original, 2-bit emphasis.
- MPEG-1 Layer III bitrate table (kbps, index 1..14):
  32 40 48 56 64 80 96 112 128 160 192 224 256 320; indexes 0 and 15
  are free-format/forbidden and rejected here.
- MPEG-1 sampling rates: index 0/1/2 = 44100/48000/32000; 3 reserved.
- Layer III MPEG-1 frame length = 144000·kbps ÷ samplerate + padding
  bytes; 1152 PCM samples per frame.
- CRC-16 when protection = 0: polynomial 0x8005, init 0xFFFF, MSB
  first, over header bytes 2–3 plus the side-info region (17 bytes
  mono / 32 bytes stereo for MPEG-1 Layer III); stored big-endian
  immediately after the header.
- ISO BMFF (ISO/IEC 14496-12): a file is a sequence of boxes, each a
  4-byte big-endian size (including the 8-byte header) + 4-byte
  fourcc; container boxes (moov/trak/mdia/minf/stbl) hold child boxes
  as their entire body; full boxes start with 1-byte version + 3-byte
  flags.  mvhd v0 body: ver/flags 4, ctime 4, mtime 4, timescale 4,
  duration 4, rate 4, volume 2, reserved 10, matrix 36, predefined
  24, next_track_id 4.  stts: entry_count then (sample_count,
  sample_delta) pairs.  stsz: sample_size (0 = per-sample table),
  sample_count, then sizes.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- MPEG audio

MPEG1_L3_BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
MPEG1_SAMPLE_RATES = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME_L3 = 1152
_SIDE_INFO_BYTES = {3: 17, 0: 17, 1: 32, 2: 32}  # mono:17, stereo modes:32

# Synthesis constants (mirrored by the l11h SQL oracle).
MPEG_SYNTH_BR_CYCLE = (9, 10, 11)  # bitrate indexes → 128/160/192 kbps
MPEG_SYNTH_RATE_IDX = 0  # 44100 Hz


def crc16_mpeg(data: bytes) -> int:
    """CRC-16 with the MPEG audio polynomial 0x8005 (x^16+x^15+x^2+1),
    init 0xFFFF, MSB-first, no final xor."""
    crc = 0xFFFF
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def mpeg_frame_length(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    """Layer III MPEG-1 frame byte length (integer floor division —
    the slot arithmetic real decoders use to find the next sync)."""
    return 144_000 * bitrate_kbps // samplerate + padding


def _synth_frame_payload(seed: bytes, frame_idx: int, n: int) -> bytes:
    """Deterministic filler for the main-data region: a rolling byte
    pattern from the seed — NOT valid Huffman main data (sample decode
    is the documented boundary); the frame layer never interprets it."""
    if not seed:
        seed = b"\x00"
    return bytes((seed[(frame_idx + k) % len(seed)] + frame_idx) & 0xFF for k in range(n))


def encode_mpeg_frames(seed: bytes, n_frames: int) -> bytes:
    """Build a syntactically valid MPEG-1 Layer III mono frame stream:
    real sync words, real header fields, real slot arithmetic, real
    CRC-16 over header remainder + side info on every even frame
    (protection = 0), deterministic filler in the main-data region.

    Per-frame schedule (the l11h oracle mirrors this arithmetic):
    bitrate index cycles 9→10→11 (128/160/192 kbps), padding = i % 2,
    44100 Hz throughout.
    """
    out = bytearray()
    for i in range(n_frames):
        br_idx = MPEG_SYNTH_BR_CYCLE[i % len(MPEG_SYNTH_BR_CYCLE)]
        padding = i % 2
        protection = 0 if i % 2 == 0 else 1  # 0 = CRC present
        kbps = MPEG1_L3_BITRATES_KBPS[br_idx]
        assert kbps is not None
        flen = mpeg_frame_length(kbps, MPEG1_SAMPLE_RATES[MPEG_SYNTH_RATE_IDX], padding)
        # Header: sync(11) ver(2)=11 layer(2)=01 prot(1) | br(4) sr(2)
        # pad(1) priv(1)=0 | mode(2)=11(mono) modeext(2)=0 copy(1)=0
        # orig(1)=1 emph(2)=0
        b0 = 0xFF
        b1 = 0b111_11_01_0 | protection
        b2 = (br_idx << 4) | (MPEG_SYNTH_RATE_IDX << 2) | (padding << 1)
        b3 = 0b11_00_0_1_00
        header = bytes((b0, b1, b2, b3))
        side = _synth_frame_payload(seed, i, _SIDE_INFO_BYTES[3])
        body_len = flen - 4 - _SIDE_INFO_BYTES[3] - (2 if protection == 0 else 0)
        body = _synth_frame_payload(seed, i + 1, body_len)
        out += header
        if protection == 0:
            out += struct.pack(">H", crc16_mpeg(header[2:4] + side))
        out += side + body
    return bytes(out)


def parse_mpeg_frames(payload: bytes) -> list[dict]:
    """Walk an MPEG-1 Layer III frame stream: validate every sync
    word, decode header fields through the public tables, verify
    CRC-16 on protected frames, advance by the slot-arithmetic frame
    length, and require the stream to end exactly on a frame boundary.
    Returns one dict per frame (kbps, samplerate, padding, crc,
    n_bytes).  Raises ValueError on any structural corruption — the
    triage contract a crawled-media pipeline needs (quarantine, don't
    guess)."""
    frames: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if n - pos < 4:
            raise ValueError(f"truncated header at byte {pos}")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0b1110_0000) != 0b1110_0000:
            raise ValueError(f"lost sync at byte {pos}")
        version = (b1 >> 3) & 0b11
        layer = (b1 >> 1) & 0b11
        if version != 0b11 or layer != 0b01:
            raise ValueError(f"not MPEG-1 Layer III at byte {pos}")
        protection = b1 & 1
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 0b11
        kbps = MPEG1_L3_BITRATES_KBPS[br_idx]
        samplerate = MPEG1_SAMPLE_RATES[sr_idx]
        if kbps is None or samplerate is None:
            raise ValueError(f"forbidden bitrate/samplerate index at byte {pos}")
        flen = mpeg_frame_length(kbps, samplerate, padding)
        if pos + flen > n:
            raise ValueError(f"frame at byte {pos} overruns stream ({flen} bytes)")
        if protection == 0:
            side_n = _SIDE_INFO_BYTES[mode]
            stored = struct.unpack(">H", payload[pos + 4 : pos + 6])[0]
            side = payload[pos + 6 : pos + 6 + side_n]
            if crc16_mpeg(payload[pos + 2 : pos + 4] + side) != stored:
                raise ValueError(f"CRC mismatch in frame at byte {pos}")
        frames.append(
            {
                "kbps": kbps,
                "samplerate": samplerate,
                "padding": padding,
                "crc": protection == 0,
                "n_bytes": flen,
            }
        )
        pos += flen
    return frames


# -------------------------------------------------------------------- ISOBMFF

_CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

# Synthesis constants (mirrored by the l11i SQL oracle).
MP4_SYNTH_TIMESCALE = 1000
MP4_SYNTH_DELTA = 25  # ms per sample at timescale 1000


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full_box(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + body)


def mp4_synth_sample_sizes(seed_len: int, n_samples: int) -> list[int]:
    """Per-sample byte sizes, derived from (index, seed length) only so
    the SQL oracle can recompute them without byte access."""
    return [16 + (7 * i + seed_len) % 32 for i in range(n_samples)]


def encode_mp4_minimal(seed: bytes, n_samples: int) -> bytes:
    """Assemble a minimal, structurally valid ISO BMFF file: ftyp +
    moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stts + stsz +
    stco))))) + mdat.  Every box has a correct size field; stts/stsz
    describe exactly the samples concatenated into mdat, so a parser
    can cross-check sample-table arithmetic against physical bytes —
    the structural contract this codec exists to exercise.  (No codec
    config boxes: the mdat payload is deterministic filler; sample
    DECODE is the documented boundary.)"""
    sizes = mp4_synth_sample_sizes(len(seed), n_samples)
    duration = MP4_SYNTH_DELTA * n_samples

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", MP4_SYNTH_TIMESCALE, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )  # identity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # layer, group, volume, reserved
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),  # width, height (audio)
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", MP4_SYNTH_TIMESCALE, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"pmr\x00")
    stts = _full_box(
        b"stts", 0, 0, struct.pack(">I", 1) + struct.pack(">II", n_samples, MP4_SYNTH_DELTA)
    )
    stsz = _full_box(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n_samples) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stts + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat_body = b"".join(_synth_frame_payload(seed, i, s) for i, s in enumerate(sizes))
    mdat = _box(b"mdat", mdat_body)
    return ftyp + moov + mdat


def walk_boxes(payload: bytes, offset: int = 0, end: int | None = None) -> list[dict]:
    """Recursively walk an ISO BMFF box tree, validating that every
    box's size field fits its parent exactly (no overlap, no gap, no
    overrun) — the structural integrity check a media lake runs before
    trusting any metadata.  Returns flat dicts: fourcc, offset, size,
    depth, body offset/size.  Raises ValueError on malformed sizes."""
    end = len(payload) if end is None else end
    out: list[dict] = []

    def rec(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos < hi:
            if hi - pos < 8:
                raise ValueError(f"truncated box header at byte {pos}")
            size = struct.unpack(">I", payload[pos : pos + 4])[0]
            fourcc = payload[pos + 4 : pos + 8]
            if size < 8 or pos + size > hi:
                raise ValueError(
                    f"box {fourcc!r} at byte {pos}: size {size} escapes parent"
                )
            out.append(
                {
                    "fourcc": fourcc.decode("latin-1"),
                    "offset": pos,
                    "size": size,
                    "depth": depth,
                    "body_offset": pos + 8,
                    "body_size": size - 8,
                }
            )
            if fourcc in _CONTAINER_BOXES:
                rec(pos + 8, pos + size, depth + 1)
            pos += size
        if pos != hi:
            raise ValueError(f"box run ends at {pos}, parent ends at {hi}")

    rec(offset, end, 0)
    return out


def probe_mp4(payload: bytes) -> dict:
    """Parse the box tree and extract/cross-check the track metadata a
    pipeline indexes on: movie timescale + duration (mvhd), sample
    count + total duration (stts), per-sample sizes (stsz), and the
    PHYSICAL mdat payload length — which must equal the stsz sum, the
    cross-check that catches truncated uploads whose metadata still
    parses."""
    boxes = walk_boxes(payload)
    by = {b["fourcc"]: b for b in boxes}
    for required in ("ftyp", "moov", "mvhd", "trak", "stbl", "stts", "stsz", "mdat"):
        if required not in by:
            raise ValueError(f"missing required box {required}")

    def body(b: dict) -> bytes:
        return payload[b["body_offset"] : b["body_offset"] + b["body_size"]]

    mvhd = body(by["mvhd"])
    timescale, duration = struct.unpack(">II", mvhd[12:20])

    stts = body(by["stts"])
    (n_entries,) = struct.unpack(">I", stts[4:8])
    n_samples = 0
    stts_duration = 0
    for k in range(n_entries):
        cnt, delta = struct.unpack(">II", stts[8 + 8 * k : 16 + 8 * k])
        n_samples += cnt
        stts_duration += cnt * delta

    stsz = body(by["stsz"])
    fixed, stsz_count = struct.unpack(">II", stsz[4:12])
    if fixed:
        stsz_sum = fixed * stsz_count
    else:
        stsz_sum = sum(
            struct.unpack(">I", stsz[12 + 4 * k : 16 + 4 * k])[0] for k in range(stsz_count)
        )

    mdat_bytes = by["mdat"]["body_size"]
    if stsz_count != n_samples:
        raise ValueError(f"stsz count {stsz_count} != stts samples {n_samples}")
    if stsz_sum != mdat_bytes:
        raise ValueError(f"stsz sum {stsz_sum} != mdat payload {mdat_bytes}")
    if stts_duration != duration:
        raise ValueError(f"stts duration {stts_duration} != mvhd duration {duration}")
    return {
        "n_boxes": len(boxes),
        "timescale": timescale,
        "duration": duration,
        "n_samples": n_samples,
        "mdat_bytes": mdat_bytes,
        "total_bytes": len(payload),
    }
