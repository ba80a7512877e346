"""Pure-Python media codecs (SURVEY.md §2.11 L11 — the de-stubbed tier).

The container has no PIL/ffmpeg/torchaudio, but seven classic formats
decode with numpy + struct + zlib alone:

* **BMP** — 24-bit uncompressed ``BI_RGB`` Windows bitmaps: 14-byte
  file header, 40-byte ``BITMAPINFOHEADER``, bottom-up BGR rows padded
  to 4 bytes ([MS-WMF] / Windows SDK public layout).
* **PNG** — RFC 2083 / ISO 15948: signature + CRC-checked chunks,
  IHDR geometry, concatenated IDAT zlib stream, and the full 5-type
  per-row filter reconstruction (None/Sub/Up/Average/Paeth); 8-bit
  truecolor (type 2), truecolor+alpha (6, alpha dropped) and
  grayscale (0, replicated) decode to the same (H, W, 3) contract as
  BMP; palette/interlace/16-bit stay behind the codec boundary.
* **GIF (87a/89a)** — logical screen + color tables, variable-width
  LSB-first LZW with clear/EOI and mid-stream dictionary resets,
  4-pass de-interlacing; first frame to the same (H, W, 3) contract
  (GIF spec / Welch 1984 — public layouts).
* **JPEG (baseline)** — ITU-T T.81 sequential DCT: full marker
  parse, canonical Huffman entropy decode with byte unstuffing and
  restart markers, dequantize + dezigzag + exact float IDCT, BT.601
  YCbCr→RGB; the one LOSSY tier (tests assert bounded quantization
  error plus a hand-packed DC-only golden).  Progressive/arithmetic/
  12-bit/subsampled streams stay behind the codec boundary.
* **PPM (P6)** — Netpbm binary RGB, maxval 255: ASCII header then raw
  RGB triplets, row-major top-down.
* **WAV** — RIFF/WAVE with a PCM16 ``fmt `` chunk and a ``data``
  chunk, little-endian interleaved samples.
* **AVI** — RIFF/AVI with an uncompressed 24-bit DIB video stream
  ('vids'/'DIB '): ``LIST hdrl`` (``avih`` main header + ``LIST strl``
  with ``strh``/``strf``), then ``LIST movi`` of ``00db`` frames, each
  frame a bottom-up BGR padded raster exactly like the BMP pixel
  block (OpenDML / Microsoft AVI RIFF public layout).

These are REAL decoders: every byte of the pixel/sample payload is
interpreted per the published layout, and the unit tests pin
hand-built golden byte strings to exact pixel/sample arrays.  Formats
beyond these (MP3/MP4/H.264 — real DSP codecs) remain behind the
documented ``NotImplementedError`` codec boundary in ``multimodal.py``
for SAMPLE decode; their container/framing layer (MPEG audio frame
walking, ISO BMFF box trees) is real in ``operators/containers.py``.

Scale note: all functions here are *per-payload kernels* executed
inside Arrow-batched ``mapInPandas`` workers — they never see more
than one payload at a time and hold no state, so the operators that
wrap them distribute trivially.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------- sniffing ----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(payload: bytes) -> str | None:
    """Identify a payload by magic bytes:
    'bmp' | 'png' | 'gif' | 'jpeg' | 'ppm' | 'wav' | 'avi' | None."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


# ---------- BMP (24-bit BI_RGB) ----------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    # biHeight > 0 => bottom-up (the classic layout).
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = a[:, :, ::-1]  # RGB -> BGR
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom row first
        rows += bgr[y].tobytes() + b"\0" * pad
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB array.

    Supports bottom-up (biHeight > 0) and top-down (biHeight < 0) rows
    and the mandatory 4-byte row padding; rejects anything that is not
    24-bpp BI_RGB (the documented codec boundary)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(payload)}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # stored bottom-up -> return top-down
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------- PNG (RFC 2083 / ISO 15948, 8-bit, non-interlaced) ----------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (color type 2, filter 0 on every scanline, one zlib IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # scanlines: one filter-type byte (0 = None) then raw RGB bytes
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_scanlines(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse PNG per-scanline filtering → (h, w*bpp) uint8.

    Each scanline is [filter_type, f(x1), f(x2), ...]; reconstruction
    per RFC 2083 §6 with a = left pixel's byte, b = byte above,
    c = upper-left: Sub adds a, Up adds b, Average adds (a+b)//2,
    Paeth adds the predictor nearest to a+b-c.  Up/None vectorize;
    Sub/Average/Paeth carry a within-row dependency, computed with an
    int16 running loop (payload kernels see one image at a time)."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError(f"truncated PNG raster: need {h * (stride + 1)}, have {len(raw)}")
    mat = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(mat[y, 0])
        line = mat[y, 1:].astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y > 0 else np.zeros(stride, dtype=np.int16)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype} on row {y}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, 3) uint8 RGB.

    Walks the chunk stream (CRC-verified for IHDR/IDAT/PLTE), inflates
    the concatenated IDAT zlib stream, reverses all five scanline
    filters.  Color types: 2 (truecolor) decodes exactly; 6
    (truecolor+alpha) drops the alpha plane; 0 (grayscale) replicates
    the gray plane.  Palette (3), interlaced, and non-8-bit images
    raise ``NotImplementedError`` — the documented codec boundary."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype in (b"IHDR", b"IDAT", b"PLTE"):
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
            if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG {ctype.decode()} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_n, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or ctype_n not in (0, 2, 6):
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/RGBA PNG supported "
            f"(depth={depth}, color={ctype_n}, interlace={interlace})"
        )
    bpp = {0: 1, 2: 3, 6: 4}[ctype_n]
    planes = _unfilter_scanlines(zlib.decompress(bytes(idat)), w, h, bpp).reshape(h, w, bpp)
    if ctype_n == 0:
        return np.repeat(planes, 3, axis=2).copy()
    return planes[:, :, :3].copy()


# ---------- GIF (87a/89a, LZW, first frame) ----------


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a single-frame GIF89a
    with a global color table (≤256 unique colors — the format's hard
    limit; more raises ValueError) and a real LZW-compressed raster."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF supports at most 256 colors, image has {len(colors)}")
    # palette size: power of two ≥ n_colors, minimum 2
    depth = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    header = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)

    # LZW encode (variable-width codes, LSB-first packing)
    min_code = max(2, depth)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[int] = [clear]
    dict_: dict[tuple[int, ...], int] = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    run: tuple[int, ...] = ()
    for px in inverse.tolist():
        cand = run + (px,)
        if cand in dict_:
            run = cand
            continue
        codes.append(dict_[run])
        run = (px,)
        if next_code < 4096:  # codes are 12-bit max; never assign 4096
            dict_[cand] = next_code
            next_code += 1
        else:
            codes.append(clear)
            dict_ = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
    if run:
        codes.append(dict_[run])
    codes.append(eoi)
    # pack: code width grows when next_code would exceed the width
    out = bytearray()
    acc = bits = 0
    width = min_code + 1
    n_emitted = eoi + 1
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if c == clear:
            n_emitted = eoi + 1
            width = min_code + 1
        else:
            n_emitted += 1
            if n_emitted > (1 << width) and width < 12:
                width += 1
    if bits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        header
        + table.tobytes()
        + img_desc
        + bytes([min_code])
        + bytes(blocks)
        + b"\x00"
        + b"\x3b"
    )


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a GIF87a/89a payload's FIRST image to (H, W, 3) uint8
    RGB: logical-screen + color tables per the GIF spec, variable-width
    LSB-first LZW with clear/EOI handling, Adam-style 4-pass
    de-interlacing when the interlace flag is set.  Transparency and
    later animation frames are out of contract (first frame only)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x} at {pos}")
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            size = payload[pos]
            data += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1

        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        dict_: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        acc = bits = bit_pos = 0
        prev: bytes | None = None
        out = bytearray()
        while True:
            while bits < width:
                if bit_pos >= len(data):
                    raise ValueError("truncated GIF LZW stream")
                acc |= data[bit_pos] << bits
                bits += 8
                bit_pos += 1
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                dict_ = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError(f"invalid GIF LZW code {code}")
            out += entry
            prev = entry
            if len(dict_) >= (1 << width) and width < 12:
                width += 1
        idx = np.frombuffer(bytes(out[: w * h]), np.uint8)
        if len(idx) < w * h:
            raise ValueError(f"truncated GIF raster: need {w * h}, have {len(idx)}")
        if int(idx.max()) >= len(table):
            # A color table smaller than 1<<min_code (or corrupt LZW
            # output) would otherwise surface as a numpy IndexError —
            # keep the codec's ValueError contract.
            raise ValueError(
                f"GIF pixel index {int(idx.max())} out of range for "
                f"{len(table)}-entry color table"
            )
        rows = table[idx].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        return rows.copy()
    raise ValueError("GIF contains no image block")


# ---------- JPEG (baseline sequential, ITU-T T.81 / JFIF) ----------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K (T.81) example quantization + Huffman tables — the public
# spec's own values, used by essentially every baseline encoder.
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits, vals):
    """Canonical Huffman code table {symbol: (code, length)} from the
    DHT BITS/HUFFVAL form (T.81 Annex C flow)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, value-bits) magnitude coding of a nonzero coefficient."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a baseline sequential
    JFIF JPEG: 4:4:4 (no chroma subsampling), Annex-K quantization and
    Huffman tables, BT.601 RGB→YCbCr.  Lossy by nature — round-trip
    tests assert bounded error, not equality."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y, cb, cr]
    qs = [_Q_LUM, _Q_CHR, _Q_CHR]
    dc_tabs = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHR), _huff_codes(*_DC_CHR)]
    ac_tabs = [_huff_codes(*_AC_LUM), _huff_codes(*_AC_CHR), _huff_codes(*_AC_CHR)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwid = -(-h // 8), -(-w // 8)
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(3):
                plane = planes[ci]
                blk = np.empty((8, 8))
                ys, xs = by * 8, bx * 8
                src = plane[ys : ys + 8, xs : xs + 8]
                blk[: src.shape[0], : src.shape[1]] = src
                if src.shape[0] < 8:  # edge replication padding
                    blk[src.shape[0] :, :] = blk[src.shape[0] - 1 : src.shape[0], :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
                coef = _DCT_M @ (blk - 128.0) @ _DCT_M.T
                q = np.round(coef / qs[ci]).astype(np.int64)
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, bits = _mag_bits(diff) if diff else (0, 0)
                code, ln = dc_tabs[ci][s]
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
                        code, ln = ac_tabs[ci][0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    s, bits = _mag_bits(v)
                    code, ln = ac_tabs[ci][(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_tabs[ci][0x00]  # EOB
                    bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(q.reshape(64)[_ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + jfif + dqt(0, _Q_LUM) + dqt(1, _Q_CHR)
        + dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_LUM)
        + dht(0, 1, *_DC_CHR) + dht(1, 1, *_AC_CHR)
        + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: consumed by caller
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0
        self.acc = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a BASELINE sequential JPEG (SOF0, 8-bit, 4:4:4 or
    grayscale, optional restart intervals) to (H, W, 3) uint8 RGB —
    full marker parse, canonical Huffman entropy decode with byte
    unstuffing, dequantize + dezigzag + exact float IDCT, BT.601
    YCbCr→RGB.  Progressive (SOF2), arithmetic coding, 12-bit, and
    subsampled chroma raise ``NotImplementedError`` — the documented
    codec boundary."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, q_tid, sampling)
    h = w = 0
    restart = 0
    scan_map: list[tuple[int, int, int]] = []  # (comp_idx, dc_tid, ac_tid)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tid = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qtabs[tid] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nval = sum(bits)
                vals = list(body[i + 17 : i + 17 + nval])
                fwd = _huff_codes(bits, vals)
                htabs[(cls, tid)] = {(c, l): sym for sym, (c, l) in fwd.items()}
                i += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if nc not in (1, 3):
                # Adobe CMYK/YCCK baseline streams carry 4 components
                # whose samplings are all 0x11 — without this gate they
                # would pass every guard and silently decode as
                # 3-component YCbCr, dropping the K plane.
                raise NotImplementedError(f"{nc}-component JPEG (CMYK/YCCK) unsupported")
            for c in range(nc):
                cid, samp, qtid = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        f"subsampled chroma unsupported (sampling 0x{samp:02x})"
                    )
                comps.append((cid, qtid, samp))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(i for i, (q_cid, _, _) in enumerate(comps) if q_cid == cid)
                scan_map.append((ci, tids >> 4, tids & 0x0F))
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if not comps or not scan_map:
        raise ValueError("missing SOF/SOS")

    br = _BitReader(payload, pos)
    bh, bwid = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bwid * 8)) for _ in comps]
    pred = [0] * len(comps)
    mcu = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart and mcu and mcu % restart == 0:
                # DNL-aligned restart: skip to the RSTn marker
                br.align()
                p = br.pos
                while not (payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7):
                    p += 1
                br.pos = p + 2
                pred = [0] * len(comps)
            mcu += 1
            for ci, dc_tid, ac_tid in scan_map:
                # The whole per-block entropy decode converts a stray
                # RSTn (possible anywhere in DC/AC huff decode or a
                # magnitude-bits read on truncated/foreign DRI streams)
                # into the codec's ValueError contract.
                try:
                    s = _huff_decode(br, htabs[(0, dc_tid)])
                    diff = _extend(br.bits(s), s) if s else 0
                    pred[ci] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(br, htabs[(1, ac_tid)])
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError(f"invalid AC symbol 0x{sym:02x}")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.bits(size), size)
                        k += 1
                except _RestartMarker:
                    raise ValueError("unexpected restart marker") from None
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = zz
                coef = q.reshape(8, 8) * qtabs[comps[ci][1]]
                blk = _DCT_M.T @ coef @ _DCT_M + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk

    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        # .round() matches the color path — truncation here gave up to
        # one intensity level of systematic downward bias.
        yp = np.clip(planes[0], 0, 255).round()
        return np.repeat(yp[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


# ---------- PPM (P6, maxval 255) ----------


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to (H, W, 3) uint8 RGB.

    Handles the Netpbm header grammar: tokens separated by whitespace,
    ``#`` comments to end-of-line, single whitespace byte after maxval
    before the raster."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # the single whitespace byte after maxval
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: need {need}, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


# ---------- WAV (RIFF PCM16) ----------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as PCM16 RIFF/WAVE."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 RIFF/WAVE payload → ((n, channels) int16, rate).

    Walks the RIFF chunk list (so extra chunks like LIST/INFO are
    skipped correctly, including the odd-size pad byte rule); rejects
    non-PCM or non-16-bit encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    n = len(data) // (ch * 2)
    s = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return s.copy(), rate


# ---------- AVI (RIFF, uncompressed 24-bit DIB stream) ----------


def _dib_raster(frame: np.ndarray) -> bytes:
    """The BMP-style pixel block: bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    pad = (-(w * 3)) % 4
    bgr = frame[:, :, ::-1]
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        rows += bgr[y].tobytes() + b"\0" * pad
    return bytes(rows)


def _list_chunk(list_type: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", 4 + len(body)) + list_type + body


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack as an uncompressed
    24-bit DIB AVI ('vids'/'DIB ' stream, one ``00db`` chunk per frame)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError(f"expected (N, H, W, 3) RGB frames, got {f.shape}")
    n, h, w, _ = f.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 index is written, so AVIF_HASINDEX stays clear)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids",
        b"DIB ",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        n,  # dwLength (frames)
        frame_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (-1 default)
        0,  # dwSampleSize (0: variable / one sample per chunk)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    strl = _list_chunk(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list_chunk(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list_chunk(
        b"movi", b"".join(_chunk(b"00db", _dib_raster(fr)) for fr in f)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed 24-bit DIB AVI → ((N, H, W, 3) uint8 RGB,
    fps).  Walks the RIFF tree (LIST hdrl → avih/strh/strf for
    geometry and timing; LIST movi → ``00db``/``00dc`` frame chunks in
    stream order, word-aligned); rejects compressed streams — the
    documented codec boundary."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            yield cid, pos + 8, size
            pos += 8 + size + (size & 1)

    w = h = None
    fps = 10
    compression = 0
    frames: list[bytes] = []
    for cid, off, size in walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        ltype = payload[off : off + 4]
        if ltype == b"hdrl":
            for c2, o2, s2 in walk(payload, off + 4, off + size):
                if c2 == b"avih":
                    us_per_frame = struct.unpack_from("<I", payload, o2)[0]
                    if us_per_frame:
                        fps = round(1_000_000 / us_per_frame)
                elif c2 == b"LIST" and payload[o2 : o2 + 4] == b"strl":
                    for c3, o3, s3 in walk(payload, o2 + 4, o2 + s2):
                        if c3 == b"strf":
                            _, w, h, _, bpp, compression = struct.unpack_from(
                                "<IiiHHI", payload, o3
                            )
                            if bpp != 24 or compression != 0:
                                raise NotImplementedError(
                                    f"only 24-bpp uncompressed DIB AVI supported "
                                    f"(bpp={bpp}, comp={compression})"
                                )
        elif ltype == b"movi":
            for c2, o2, s2 in walk(payload, off + 4, off + size):
                if c2 in (b"00db", b"00dc"):
                    frames.append(payload[o2 : o2 + s2])
    if w is None or h is None:
        raise ValueError("missing strf header")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        if len(raw) < stride * h:
            raise ValueError(f"truncated frame {i}")
        rows = (
            np.frombuffer(raw, dtype=np.uint8, count=stride * h)
            .reshape(h, stride)[:, : w * 3]
            .reshape(h, w, 3)
        )
        out[i] = rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB
    return out, fps


# ---------- resize kernel ----------


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, 3) to (height, width, 3) —
    deterministic integer index maps (floor((i + 0.5) * src/dst)), the
    classic sampling grid, bit-identical across platforms."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]
