"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.11 L11).

Media travel as opaque ``BinaryType`` payload columns plus a typed
metadata struct — the pattern that scales: payloads stay columnar
(parquet binary, never driver-collected), every transform is an
Arrow-batched ``mapInPandas`` whose batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Codec tiers:

* **Real decode** (``fake=False``): BMP (24-bit BI_RGB), PNG (8-bit
  RFC 2083, full 5-filter reconstruction, stdlib zlib inflate), GIF
  (variable-width LZW, de-interlacing), baseline JPEG (Huffman +
  IDCT, the one lossy tier), PPM (P6), WAV (RIFF PCM16)
  and AVI (RIFF, uncompressed 24-bit DIB
  stream) payloads are decoded by the pure-Python codecs
  in ``operators/codecs.py`` — pixel/sample/frame arrays, dimensions,
  frame counts and durations all come from interpreting the actual
  container layout.  ``synthesize_media`` manufactures real
  BMP/PNG/WAV/AVI payloads deterministically from any string column
  so every media family's decode path runs on every tier's data with
  no external libs.
* **Codec boundary**: payloads in formats beyond those seven
  (MP3/MP4/H.264, progressive JPEG…) raise ``NotImplementedError``
  inside the workers — PIL/ffmpeg/torchaudio are not in this
  container.  The FRAME/CONTAINER layer of MP3 and MP4 is real,
  though (``probe_mpeg_streams`` / ``probe_mp4_files`` below, over
  ``operators/containers.py``): header/box parsing, CRC and
  size-integrity validation — only sample decode stays behind the
  boundary.
* **Byte-level fake** (``fake=True``): the original deterministic
  stand-in (byte-histogram features, byte-chunk "frames") kept for
  plumbing tests over arbitrary payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from projectmapreduce_spark.operators.codecs import (
    decode_avi,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_png,
    encode_wav,
    resize_nearest,
    sniff,
)

# Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Manufacture a media table from any string column (test harness:
    utf-8 bytes stand in for encoded media).  Real pipelines read the
    payload from object storage with a binary-file source."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: byte-value
    histogram folded to ``dim`` buckets, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    total = hist.sum() or 1.0
    return hist / total


def _hist_features(values: np.ndarray, dim: int) -> list[float]:
    """L1-normalized histogram of uint8 content values folded to ``dim``
    buckets — the shared feature map for decoded pixels and samples."""
    hist = np.bincount(values.ravel() % dim, minlength=dim).astype("float64")
    total = hist.sum() or 1.0
    return list(hist / total)


# Synthesis constants: every real payload manufactured by
# ``synthesize_media`` uses these, and the SQL oracles for the decode
# queries re-derive the expected metadata from them.
BMP_SYNTH_WIDTH = 8
BMP_SYNTH_MAX_HEIGHT = 64
WAV_SYNTH_RATE = 16000
AVI_SYNTH_FPS = 10
AVI_SYNTH_MIN_FRAMES = 2
AVI_SYNTH_FRAME_MOD = 7  # n_frames = MIN + len(seed) % MOD  (2..8)


def _synth_pixels(seed: bytes) -> np.ndarray:
    """Deterministic (H, 8, 3) uint8 pixel array from seed bytes: the
    bytes tiled row-major over an 8-wide RGB grid, height scaled to the
    seed length (1..64 rows)."""
    w = BMP_SYNTH_WIDTH
    h = max(1, min(BMP_SYNTH_MAX_HEIGHT, -(-len(seed) // (w * 3))))
    need = h * w * 3
    arr = np.frombuffer(seed, dtype=np.uint8)
    if arr.size == 0:
        flat = np.zeros(need, dtype=np.uint8)
    else:
        flat = np.tile(arr, -(-need // arr.size))[:need]
    return flat.reshape(h, w, 3)


def _synth_samples(seed: bytes) -> np.ndarray:
    """Deterministic int16 PCM track from seed bytes: one sample per
    byte, affine map b -> (b - 128) * 256 (full int16 swing)."""
    b = np.frombuffer(seed, dtype=np.uint8).astype(np.int16)
    return (b - 128) * 256


def _synth_frames(seed: bytes) -> np.ndarray:
    """Deterministic (N, H, 8, 3) frame stack from seed bytes: frame 0
    is the BMP synth image; frame f is frame 0 rolled f rows — fake
    'motion' with real per-frame content.  N = 2 + len(seed) % 7."""
    base = _synth_pixels(seed)
    n = AVI_SYNTH_MIN_FRAMES + len(seed) % AVI_SYNTH_FRAME_MOD
    return np.stack([np.roll(base, f, axis=0) for f in range(n)])


def synthesize_media(
    df: DataFrame,
    id_col: str,
    text_col: str,
    kind: str = "image",
    image_format: str = "bmp",
) -> DataFrame:
    """Manufacture a media table with REAL encoded payloads (BMP or
    PNG for ``kind='image'`` per ``image_format``, WAV PCM16 for
    ``kind='audio'``) derived deterministically from a string column.
    Unlike ``attach_payload`` (opaque utf-8 bytes), these payloads
    decode: the downstream ``extract_features`` / ``resize_images``
    real paths interpret the actual container format, and metadata
    (width/height/duration_ms) is computed from the synthesis
    constants so SQL oracles can re-derive it from ``length(text)``.
    A NULL source string synthesizes the same payload as an EMPTY one
    (the seed is ``text or ""``) — oracles mirror this with
    ``coalesce(text, '')``."""
    if kind not in ("image", "audio", "video"):
        raise ValueError(f"synthesize_media supports image|audio|video, got {kind!r}")
    if image_format not in ("bmp", "png", "jpeg"):
        raise ValueError(f"image_format must be bmp|png|jpeg, got {image_format!r}")
    mime = {
        "image": f"image/{image_format}",
        "audio": "audio/wav",
        "video": "video/x-msvideo",
    }[kind]
    encode_image = {"bmp": encode_bmp, "png": encode_png, "jpeg": encode_jpeg}[image_format]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf[id_col],
                "kind": kind,
                "payload": [],
                "mime": mime,
                "width": pd.array([None] * len(pdf), dtype="Int32"),
                "height": pd.array([None] * len(pdf), dtype="Int32"),
                "duration_ms": pd.array([None] * len(pdf), dtype="Int32"),
            }
            widths: list[int | None] = []
            heights: list[int | None] = []
            durs: list[int | None] = []
            for text in pdf[text_col]:
                seed = (text or "").encode("utf-8")
                if kind == "image":
                    px = _synth_pixels(seed)
                    out["payload"].append(encode_image(px))
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                    durs.append(None)
                elif kind == "video":
                    fr = _synth_frames(seed)
                    out["payload"].append(encode_avi(fr, AVI_SYNTH_FPS))
                    heights.append(fr.shape[1])
                    widths.append(fr.shape[2])
                    durs.append(fr.shape[0] * 1000 // AVI_SYNTH_FPS)
                else:
                    s = _synth_samples(seed)
                    out["payload"].append(encode_wav(s, WAV_SYNTH_RATE))
                    widths.append(None)
                    heights.append(None)
                    durs.append(len(s) * 1000 // WAV_SYNTH_RATE)
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["duration_ms"] = pd.array(durs, dtype="Int32")
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(batches, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract each payload → (media_id, kind,
    n_bytes, width, height, n_samples, features array<double>).

    ``fake=False`` runs the REAL pure-Python decoders from
    ``operators/codecs.py``: BMP/PPM payloads are decoded to pixel
    arrays (width/height from the container header, features = the
    L1-normalized folded histogram of decoded pixel values), WAV
    payloads to int16 sample arrays (n_samples from the data chunk,
    features over the samples mapped back to uint8).  Payloads in any
    other format raise ``NotImplementedError`` inside the workers —
    the documented codec boundary (no JPEG/PNG/video libs here).

    ``fake=True`` keeps the deterministic byte-histogram stand-in over
    the raw container bytes (identical Arrow path, no decode).
    """

    def one(payload: bytes) -> tuple[int | None, int | None, int | None, list[float] | None]:
        # NULL payload → typed-null metadata and NULL features (no
        # decode to attempt); callers that want "null doc = empty doc"
        # coalesce upstream (synthesize_media does).
        if payload is None:
            return None, None, None, None
        if fake:
            return None, None, None, list(_fake_features(payload, dim))
        fmt = sniff(payload)
        if fmt == "bmp":
            px = decode_bmp(payload)
        elif fmt == "png":
            px = decode_png(payload)
        elif fmt == "gif":
            px = decode_gif(payload)
        elif fmt == "jpeg":
            px = decode_jpeg(payload)
        elif fmt == "ppm":
            px = decode_ppm(payload)
        elif fmt == "wav":
            s, _rate = decode_wav(payload)
            u8 = ((s.astype(np.int32) // 256) + 128).astype(np.uint8)
            return None, None, s.shape[0], _hist_features(u8, dim)
        elif fmt == "avi":
            frames, _fps = decode_avi(payload)
            # width/height from the stream header; n_samples = frame
            # count; features over ALL decoded frame pixels.
            return (
                frames.shape[2],
                frames.shape[1],
                frames.shape[0],
                _hist_features(frames, dim),
            )
        else:
            raise NotImplementedError(
                "payload is not BMP/PNG/GIF/JPEG/PPM/WAV/AVI — codecs for other "
                "formats "
                "are not available in this environment (pass fake=True for the "
                "byte-level stand-in)"
            )
        return px.shape[1], px.shape[0], None, _hist_features(px, dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(
                        [len(p) if p is not None else None for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "n_samples": pd.array([d[2] for d in decoded], dtype="Int64"),
                    "features": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(
        batches,
        "media_id long, kind string, n_bytes long, width int, height int, "
        "n_samples long, features array<double>",
    )


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize kernel.

    ``fake=False``: REAL decode → nearest-neighbor resample →
    re-encode.  BMP payloads are decoded per the 24-bit BI_RGB layout,
    resized on the deterministic ``resize_nearest`` grid and re-encoded
    as BMP (PNG and PPM handled the same, each staying in its own
    format); other formats raise ``NotImplementedError`` (codec
    boundary).  ``fake=True`` keeps the byte truncate/pad plumbing
    stand-in."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if fake:
                out = [
                    bytes(p[:target]).ljust(target, b"\0") if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                out = []
                for p in pdf["payload"]:
                    if p is None:  # null media passes through as null
                        out.append(None)
                        continue
                    fmt = sniff(p)
                    if fmt == "bmp":
                        out.append(encode_bmp(resize_nearest(decode_bmp(p), width, height)))
                    elif fmt == "png":
                        out.append(encode_png(resize_nearest(decode_png(p), width, height)))
                    elif fmt == "gif":
                        out.append(encode_gif(resize_nearest(decode_gif(p), width, height)))
                    elif fmt == "jpeg":
                        # lossy re-encode — the format's own contract
                        out.append(encode_jpeg(resize_nearest(decode_jpeg(p), width, height)))
                    elif fmt == "ppm":
                        from projectmapreduce_spark.operators.codecs import encode_ppm

                        out.append(encode_ppm(resize_nearest(decode_ppm(p), width, height)))
                    elif fmt == "avi":
                        frames, fps = decode_avi(p)
                        resized = np.stack(
                            [resize_nearest(fr, width, height) for fr in frames]
                        )
                        out.append(encode_avi(resized, fps))
                    else:
                        raise NotImplementedError(
                            "payload is not BMP/PNG/GIF/PPM/AVI — image codecs "
                            "for other formats are not available (pass fake=True)"
                        )
            res = pdf.copy()
            res["payload"] = out
            res["width"] = width
            res["height"] = height
            yield res

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 64,
    fake: bool = False,
    every_n_frames: int = 2,
) -> DataFrame:
    """Video frame-sampling kernel (1 payload → N frames).

    ``fake=False``: REAL decode — AVI payloads are parsed per the RIFF
    layout (operators/codecs.py:decode_avi), every ``every_n_frames``-th
    frame is taken and re-encoded as a standalone BMP payload, so the
    emitted frames are themselves decodable images any downstream image
    operator (resize, feature-extract) can consume.  ``frame_idx`` is
    the index in the SOURCE stream.  Non-AVI payloads raise
    ``NotImplementedError`` (codec boundary).

    ``fake=True``: the original byte-chunking stand-in (1 'frame' per
    ``every_n_bytes``) kept for plumbing tests over arbitrary payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                # NULL payload (e.g. a NULL source document) = no
                # media = zero frames, in both tiers — the SQL twin is
                # the oracle's length(text) > 0 guard.
                if p is None:
                    continue
                if fake:
                    for i, off in enumerate(range(0, len(p), every_n_bytes)):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(i)
                        rows["frame_payload"].append(bytes(p[off : off + every_n_bytes]))
                    continue
                if sniff(bytes(p)) != "avi":
                    raise NotImplementedError(
                        "payload is not an uncompressed DIB AVI — video codecs "
                        "for other formats are not available (pass fake=True)"
                    )
                frames, _fps = decode_avi(bytes(p))
                for i in range(0, frames.shape[0], every_n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(encode_bmp(frames[i]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        batches, "media_id long, frame_idx int, frame_payload binary"
    )


# Synthesis schedules for the container-layer probes (mirrored by the
# l11h/l11i SQL oracles — change together).
MPEG_SYNTH_MAX_FRAMES = 12  # 1 + min(len//200, 11)
MP4_SYNTH_MAX_SAMPLES = 31  # 1 + min(len//150, 30)


def probe_mpeg_streams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an MPEG-1 Layer III frame STREAM per row (real sync
    words, header fields, slot arithmetic, CRC-16 on protected frames
    — operators/containers.py) and parse it back with the real frame
    walker: every output number comes from the PARSE, not the
    synthesis schedule, so a one-byte disagreement between the framer
    and the walker (sync mask, length formula, CRC span) shifts a
    value and fails the oracle hash.  Arrow-batched mapInPandas,
    shuffle-free — the shape of metadata extraction over a crawled
    audio lake.  PCM decode of the main-data region stays the
    documented NotImplementedError boundary (the ISO Huffman tables
    are not available in this environment)."""
    from projectmapreduce_spark.operators.containers import (
        encode_mpeg_frames,
        parse_mpeg_frames,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_frames", "n_bytes", "duration_ms", "kbps_sum")}
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                seed = (text or "").encode("utf-8")
                nf = 1 + min(len(seed) // 200, MPEG_SYNTH_MAX_FRAMES - 1)
                frames = parse_mpeg_frames(encode_mpeg_frames(seed, nf))
                rates = {f["samplerate"] for f in frames}
                assert len(rates) == 1, "synth streams are single-rate"
                rows["media_id"].append(mid)
                rows["n_frames"].append(len(frames))
                rows["n_bytes"].append(sum(f["n_bytes"] for f in frames))
                rows["duration_ms"].append(len(frames) * 1152 * 1000 // rates.pop())
                rows["kbps_sum"].append(sum(f["kbps"] for f in frames))
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches,
        "media_id long, n_frames long, n_bytes long, duration_ms long, kbps_sum long",
    )


def probe_mp4_files(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a minimal-but-valid ISO BMFF file per row and probe
    it with the real box-tree walker (size/nesting validation, mvhd /
    stts / stsz extraction, stsz-sum == mdat cross-check —
    operators/containers.py).  As with probe_mpeg_streams, every
    output value is read back out of the parsed byte structure, so the
    oracle hash pins the writer's box sizes AND the reader's walk.
    Arrow-batched mapInPandas, shuffle-free."""
    from projectmapreduce_spark.operators.containers import (
        encode_mp4_minimal,
        probe_mp4,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                k: []
                for k in (
                    "media_id", "n_boxes", "n_samples", "duration_ms",
                    "mdat_bytes", "total_bytes",
                )
            }
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                seed = (text or "").encode("utf-8")
                n = 1 + min(len(seed) // 150, MP4_SYNTH_MAX_SAMPLES - 1)
                info = probe_mp4(encode_mp4_minimal(seed, n))
                rows["media_id"].append(mid)
                rows["n_boxes"].append(info["n_boxes"])
                rows["n_samples"].append(info["n_samples"])
                # synth timescale is 1000 -> duration IS milliseconds
                rows["duration_ms"].append(info["duration"])
                rows["mdat_bytes"].append(info["mdat_bytes"])
                rows["total_bytes"].append(info["total_bytes"])
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches,
        "media_id long, n_boxes long, n_samples long, duration_ms long, "
        "mdat_bytes long, total_bytes long",
    )
