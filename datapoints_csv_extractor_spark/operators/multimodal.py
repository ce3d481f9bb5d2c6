"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Models image/audio/video the way a 100 TB lake should: the payload is
an opaque BINARY column; metadata (byte length, content hash, declared
mime) is typed and queryable without touching the bytes. Decode /
feature-extract runs as Arrow-batched pandas functions over
``mapInPandas`` — the schema, batch shape, and partitioning are real.
Metadata extraction is REAL for all three modalities in every
environment: images through Pillow when importable
(``decode_blobs(use_pil=None)`` auto-detects) else a pure-stdlib
PNG/JPEG/GIF header parser; audio through a stdlib RIFF/WAVE walk
(sample-frame count); video through a stdlib ISO-BMFF box walk
(``stts`` frame count + ``tkhd`` dimensions). SAMPLE-LEVEL decode is
also real where a pure-stdlib codec exists: 16-bit PCM WAV decodes to
actual audio features (``audio_features``: duration/RMS/ZCR/peak) and
PNG decodes to actual pixels (``image_features``: zlib inflate +
filter reconstruction -> brightness/contrast/channel means; PIL stays
the preferred tier when importable), baseline-sequential JPEG
decodes to actual pixels too (``jpegcodec.decode_jpeg``: Huffman
entropy decode + IDCT + chroma upsample), and GIF decodes its first
frame (``gifcodec.decode_gif``: variable-width LZW + palette +
interlace) — the classic image trio all sample-decode with zero
third-party code (JPEG covers baseline AND progressive SOF2 since
round 9; GIF covers full animation — frame compositing with GCE
transparency and disposal — since round 8, see
gifcodec.decode_gif_frames).

CODEC BOUNDARY (permanent, decided round 10): sample-level decode of
perceptual/temporal codecs — MP3/AAC subband+MDCT synthesis, H.264 —
and of arithmetic-coded/12-bit JPEG is OUT OF SCOPE for this engine,
permanently. Rationale: (a) they are ffmpeg-class signal-processing
work, not query-engine work — a lakehouse pipeline shells to a decode
service for samples; (b) arithmetic-coded and 12-bit JPEG are a
vanishing fraction of real corpora (browsers never shipped arithmetic
decoding, so the web corpus effectively contains none); (c) what a
100 TB curation pass actually GATES on is stream METADATA — duration,
bitrate, dimensions, frame counts — and that tier is fully real here
with zero third-party code: MP3/MP2/MP1 via the frame-header walk
(``mp3_stream_metadata``: duration/mean-bitrate/VBR), MP4 via the
ISO-BMFF box walk, WAV via the RIFF walk, images via the header trio.
This mirrors the classifier-weights decision in SURVEY §7: the
boundary is declared, tested up to its edge, and not an open item.

The driver-facing query (q_multimodal_meta) exercises the metadata
path, which IS pure SQL on both engines; the decode plumbing is
pytest-covered.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapoints_csv_extractor_spark.operators.relational import load

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def blobs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-materialized as a multimodal blob table: payload =
    utf-8 bytes of the text (a stand-in byte stream), metadata typed."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("blob_id"),
        payload.alias("payload"),
        mime.alias("mime"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan of the blob table: size stats + content hash
    per mime type WITHOUT decoding payloads — the query pattern that
    must stay cheap at 100 TB (columnar pruning skips the payload
    column entirely; verify with .explain -> ReadSchema excludes it)."""
    b = blobs_from_documents(spark, sf_dir)
    return b.groupBy("mime").agg(
        F.count("*").alias("n_blobs"),
        F.sum("byte_len").alias("total_bytes"),
        F.max("byte_len").alias("max_bytes"),
        F.countDistinct("sha256").alias("distinct_payloads"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC stand-in decoder for UNKNOWN mime types.

    Image, audio, and video payloads never reach this path — they get
    real container-level metadata extraction (Pillow or stdlib
    PNG/JPEG/GIF headers; RIFF/WAVE; ISO-BMFF box walk). Full
    sample/pixel decoding of audio/video (ffmpeg/soundfile) is not
    available in this container; a production build adds the codec
    behind the same mapInPandas plumbing. Dimensions here derive from
    payload bytes so tests are stable.
    """
    n = len(payload)
    w = 16 + (payload[0] if n else 0) % 64
    h = 16 + (payload[-1] if n else 0) % 64
    frames = 1 + n % 7
    return w, h, frames


def _parse_image_header(raw: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib image dimension extraction for the three classic
    container formats (public file-format knowledge: PNG IHDR, JPEG
    SOFn, GIF logical screen descriptor). Returns (width, height,
    n_frames) or None when the payload is not a recognized image —
    the PIL-less environments' REAL decode tier, so dimension
    extraction does not degrade to a stub just because Pillow is
    absent.

    - PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height; an APNG ``acTL`` chunk before IDAT supplies the
      frame count.
    - JPEG: walk marker segments from SOI to the first SOFn
      (0xC0-0xCF minus the non-frame C4/C8/CC) and read its
      big-endian height/width.
    - GIF: little-endian width/height at offset 6.
    """
    import struct

    if (
        len(raw) >= 24
        and raw[:8] == b"\x89PNG\r\n\x1a\n"
        and raw[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", raw[16:24])
        frames = 1
        off = 8
        while off + 8 <= len(raw):
            ln, typ = struct.unpack(">I4s", raw[off : off + 8])
            if typ == b"acTL" and off + 12 <= len(raw):
                frames = struct.unpack(">I", raw[off + 8 : off + 12])[0] or 1
                break
            if typ == b"IDAT":
                break
            off += 12 + ln  # 4 len + 4 type + data + 4 crc
        return (w, h, frames) if w and h else None
    if len(raw) >= 4 and raw[:2] == b"\xff\xd8":
        off = 2
        while off + 9 <= len(raw):
            if raw[off] != 0xFF:
                off += 1
                continue
            marker = raw[off + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                off += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", raw[off + 2 : off + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", raw[off + 5 : off + 9])
                return (w, h, 1) if w and h else None
            off += 2 + seg_len
        return None
    if len(raw) >= 10 and raw[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", raw[6:10])
        return (w, h, 1) if w and h else None
    return None


def _parse_wav_header(raw: bytes) -> tuple[None, None, int] | None:
    """Pure-stdlib WAV (RIFF) header parse (public file-format
    knowledge): walk the chunk list for ``fmt `` (block align) and
    ``data`` (payload size) and return the sample-frame count as
    ``n_frames`` — the audio analog of image dimensions. Width/height
    have no audio meaning and stay NULL. Returns None when the
    payload is not a RIFF/WAVE stream (skip-don't-fail, matching the
    image tiers)."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    off = 12
    block_align = None
    data_size = None
    while off + 8 <= len(raw):
        cid = raw[off : off + 4]
        (size,) = struct.unpack("<I", raw[off + 4 : off + 8])
        if cid == b"fmt " and off + 8 + 16 <= len(raw):
            block_align = struct.unpack("<H", raw[off + 20 : off + 22])[0]
        elif cid == b"data":
            data_size = size
        if block_align is not None and data_size is not None:
            break
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if not block_align or data_size is None:
        return None
    return (None, None, data_size // block_align)


# MPEG audio (ISO/IEC 11172-3 / 13818-3) bitrate tables, kbps, by
# (version-group, layer): V1 = MPEG-1, V2 = MPEG-2 & 2.5. Index 0 is
# free-format (frame size unknowable from the header — rejected),
# index 15 invalid.
_MP3_BITRATES = {
    ("V1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448],
    ("V1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320, 384],
    ("V1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320],
    ("V2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                192, 224, 256],
    ("V2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                144, 160],
    ("V2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def mp3_stream_metadata(raw: bytes) -> dict | None:
    """Pure-stdlib MPEG-audio (MP3/MP2/MP1) stream metadata: skip an
    ID3v2 tag if present, then hop frame headers (sync + version/
    layer/bitrate/samplerate -> exact frame byte length, ISO/IEC
    11172-3) collecting per-frame bitrate and sample counts — the
    audio analog of the MP4 ``stts`` walk, real metadata with zero
    codec work. Returns duration / mean bitrate / VBR detection:

    ``{"sample_rate", "n_sample_frames", "n_mpeg_frames",
    "duration_ms", "bitrate_kbps_mean", "is_vbr", "layer"}``

    or None when the payload is not MPEG audio / uses free-format
    bitrate — or when sample rate or MPEG version CHANGES mid-stream
    (a concatenation artifact: a single well-formed stream keeps one
    rate, and averaging duration across mixed rates would be silently
    wrong — round-10 advice). Sample DECODE (the perceptual
    subband/MDCT synthesis itself) is permanently out of scope — see
    the module docstring's codec-boundary declaration;
    duration/bitrate metadata is what a 100 TB curation pass actually
    gates on."""
    pos = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        size = 0
        for b in raw[6:10]:  # syncsafe big-endian
            if b & 0x80:
                return None
            size = (size << 7) | b
        pos = 10 + size
    total_samples = 0
    n_frames = 0
    bitrate_sum = 0
    bitrates: set[int] = set()
    rate = 0
    first_ver = -1
    layer_out = 0
    while pos + 4 <= len(raw):
        b0, b1, b2, _ = raw[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:  # trailing junk / APEv2 tag after audio
                break
            return None
        ver_bits = (b1 >> 3) & 0x03  # 0=2.5, 2=MPEG2, 3=MPEG1
        layer_bits = (b1 >> 1) & 0x03  # 1=L3, 2=L2, 3=L1
        if ver_bits == 1 or layer_bits == 0:
            return None
        layer = 4 - layer_bits
        vgroup = "V1" if ver_bits == 3 else "V2"
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
        frame_rate = _MP3_RATES[ver_bits][sr_idx]
        if n_frames and (frame_rate != rate or ver_bits != first_ver):
            # Mid-stream rate/version switch: duration over a single
            # nominal rate would be wrong — reject, don't guess.
            return None
        rate = frame_rate
        first_ver = ver_bits
        padding = (b2 >> 1) & 0x01
        if layer == 1:
            frame_len = (12 * bitrate // rate + padding) * 4
            samples = 384
        else:
            samples = 1152 if (layer == 2 or vgroup == "V1") else 576
            per = 144 if samples == 1152 else 72
            frame_len = per * bitrate // rate + padding
        if frame_len <= 4:
            return None
        total_samples += samples
        n_frames += 1
        bitrate_sum += bitrate
        bitrates.add(bitrate)
        layer_out = layer
        pos += frame_len
    if not n_frames:
        return None
    return {
        "sample_rate": rate,
        "n_sample_frames": total_samples,
        "n_mpeg_frames": n_frames,
        "duration_ms": round(total_samples * 1000.0 / rate, 3),
        "bitrate_kbps_mean": round(bitrate_sum / n_frames / 1000.0, 3),
        "is_vbr": len(bitrates) > 1,
        "layer": layer_out,
    }


def _parse_mp3_frames(raw: bytes) -> tuple[None, None, int] | None:
    """Back-compat shim over :func:`mp3_stream_metadata` for the
    decode_blobs dims contract: (None, None, n_sample_frames)."""
    meta = mp3_stream_metadata(raw)
    return (None, None, meta["n_sample_frames"]) if meta else None


def _parse_mp4_frames(raw: bytes) -> tuple[int | None, int | None, int] | None:
    """Pure-stdlib MP4 (ISO BMFF) box walk (public container spec):
    find the video track (``hdlr`` handler 'vide') and sum its
    ``stts`` sample counts — the container's frame count, no codec
    needed. Width/height come from the track header (``tkhd``) when
    present. Returns None for non-MP4 payloads (skip-don't-fail,
    matching the image/audio tiers)."""
    import struct

    def boxes(start: int, end: int):
        off = start
        while off + 8 <= end:
            (size,) = struct.unpack(">I", raw[off : off + 4])
            typ = raw[off + 4 : off + 8]
            hdr = 8
            if size == 1:
                if off + 16 > end:
                    return
                (size,) = struct.unpack(">Q", raw[off + 8 : off + 16])
                hdr = 16
            elif size == 0:
                size = end - off
            if size < hdr or off + size > end:
                return
            yield typ, off + hdr, off + size
            off += size

    def find(typ: bytes, start: int, end: int) -> tuple[int, int] | None:
        for t, s, e in boxes(start, end):
            if t == typ:
                return (s, e)
        return None

    # An MP4 leads with ftyp (or styp/moov for fragments/faststart).
    head = {t for t, _, _ in boxes(0, min(len(raw), 64))}
    if not head & {b"ftyp", b"styp", b"moov"}:
        return None
    moov = find(b"moov", 0, len(raw))
    if moov is None:
        return None
    for t, s, e in boxes(*moov):
        if t != b"trak":
            continue
        mdia = find(b"mdia", s, e)
        if mdia is None:
            continue
        hdlr = find(b"hdlr", *mdia)
        if hdlr is None or raw[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        w = h = None
        tkhd = find(b"tkhd", s, e)
        if tkhd is not None:
            ts, te = tkhd
            version = raw[ts]
            # width/height are the last two 16.16 fixed-point fields.
            if te - 8 >= ts:
                wq, hq = struct.unpack(">II", raw[te - 8 : te])
                w, h = wq >> 16, hq >> 16
                if not (w and h):
                    w = h = None
            del version
        minf = find(b"minf", *mdia)
        if minf is None:
            continue
        stbl = find(b"stbl", *minf)
        if stbl is None:
            continue
        stts = find(b"stts", *stbl)
        if stts is None:
            continue
        ss, se = stts
        if se - ss < 8:
            continue
        (n_entries,) = struct.unpack(">I", raw[ss + 4 : ss + 8])
        total = 0
        off = ss + 8
        for _ in range(n_entries):
            if off + 8 > se:
                return None
            (count,) = struct.unpack(">I", raw[off : off + 4])
            total += count
            off += 8
        return (w, h, total)
    return None


def pil_available() -> bool:
    """Whether the real image codec (Pillow) is importable — the
    feature gate for ``decode_blobs(use_pil=None)``."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_blobs(blobs: DataFrame, use_pil: bool | None = None) -> DataFrame:
    """Arrow-batched decode + feature extraction over mapInPandas.

    Partition-parallel, vectorized transfer; each pandas batch maps
    payload bytes -> (width, height, n_frames, 8-dim feature). The
    feature here is a byte histogram — stand-in for an embedding model
    forward pass, with the identical dataflow shape.

    ``use_pil=None`` auto-detects Pillow. ``image/*`` payloads always
    get REAL dimension extraction: the full Pillow codec when
    importable, else the pure-stdlib header parser
    (``_parse_image_header`` — PNG/JPEG/GIF). In BOTH tiers a payload
    that claims image but fails to parse yields NULL dims
    (skip-don't-fail, the engine's P4 rule) rather than fake numbers,
    so results agree across environments. Non-image mimes (audio,
    video — no codec libs exist in this container) keep the
    deterministic stub. The output schema is identical in every tier,
    so downstream plans never know which codec ran.
    """
    if use_pil is None:
        use_pil = pil_available()

    def _non_image(mime: str, raw: bytes):
        # Audio: REAL stdlib WAV parse (sample-frame count as
        # n_frames), falling back to an MPEG-audio frame walk (MP3/
        # MP2/MP1 — exact PCM sample-frame count from the headers).
        # Video: REAL stdlib MP4 box walk (stts frame count + tkhd
        # dims). All parse-or-NULL, like the image tiers; unknown
        # mimes keep the deterministic stand-in.
        if mime.startswith("audio/"):
            parsed = _parse_wav_header(raw)
            if parsed is None:
                parsed = _parse_mp3_frames(raw)
            return parsed if parsed is not None else (None, None, None)
        if mime.startswith("video/"):
            parsed = _parse_mp4_frames(raw)
            return parsed if parsed is not None else (None, None, None)
        return _fake_decode(raw)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            import io

            from PIL import Image

            def dims(mime: str, p) -> tuple[int | None, int | None, int | None]:
                raw = bytes(p)
                if not mime.startswith("image/"):
                    return _non_image(mime, raw)
                try:
                    with Image.open(io.BytesIO(raw)) as img:
                        return (
                            int(img.width),
                            int(img.height),
                            int(getattr(img, "n_frames", 1)),
                        )
                except Exception:
                    return (None, None, None)

        else:

            def dims(mime: str, p) -> tuple[int | None, int | None, int | None]:
                raw = bytes(p)
                if not mime.startswith("image/"):
                    return _non_image(mime, raw)
                parsed = _parse_image_header(raw)
                return parsed if parsed is not None else (None, None, None)

        for pdf in batches:
            out = {
                "blob_id": pdf["blob_id"],
                "mime": pdf["mime"],
            }
            decoded = [
                dims(m, p) for m, p in zip(pdf["mime"], pdf["payload"])
            ]
            out["width"] = pd.array([t[0] for t in decoded], dtype="Int32")
            out["height"] = pd.array([t[1] for t in decoded], dtype="Int32")
            out["n_frames"] = pd.array([t[2] for t in decoded], dtype="Int32")
            out["feature"] = pdf["payload"].map(
                lambda p: [
                    float(sum(1 for b in bytes(p) if b % 8 == i)) for i in range(8)
                ]
            )
            yield pd.DataFrame(out)

    return blobs.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into frame
    indexes, keep every Nth — pure JVM explode, no Python."""
    return decoded.where(F.col("mime") == "video/mp4").select(
        "blob_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing decode pipeline (rows-only: the Arrow-batched
    pandas decode has no SQL twin): blob table -> mapInPandas decode ->
    per-mime feature/dimension stats. Exercises the full multimodal
    dataflow — binary payload scan, vectorized Python boundary,
    JVM-side aggregation of the decoded output."""
    decoded = decode_blobs(blobs_from_documents(spark, sf_dir))
    return (
        decoded.groupBy("mime")
        .agg(
            F.count("*").alias("n_decoded"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.max("n_frames").alias("max_frames"),
            F.round(
                F.avg(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x)), 2
            ).alias("avg_feature_mass"),
        )
        .orderBy("mime")
    )


def q_multimodal_feature_knn(
    spark: SparkSession, sf_dir: str, query_blob_id: int = 0, k: int = 10
) -> DataFrame:
    """Multimodal -> similarity composition: decode blobs to feature
    vectors (Arrow-batched Python boundary), then exact cosine top-k
    neighbors of one blob's feature — the retrieval step a multimodal
    curation pipeline runs after embedding extraction. Same
    broadcast-literal + TakeOrdered shape as the embedding kNN; the
    only Python in the plan is the vectorized decode."""
    from datapoints_csv_extractor_spark.operators.similarity import (
        _require_row,
        cosine,
    )

    blobs = blobs_from_documents(spark, sf_dir)
    decoded = decode_blobs(blobs).select(
        "blob_id", "mime", F.col("feature").cast("array<double>").alias("feature")
    )
    # Query-feature fetch filters BEFORE the decode: predicates cannot
    # push through mapInPandas (the Python map is a pushdown barrier),
    # so filtering the decoded frame would decode the whole corpus to
    # find one row.
    qrow = _require_row(
        decode_blobs(blobs.where(F.col("blob_id") == query_blob_id))
        .select("feature")
        .first(),
        f"query blob_id={query_blob_id}",
    )
    from datapoints_csv_extractor_spark.operators.similarity import (
        _f64_lit,
    )

    qlit = _f64_lit(float(x) for x in qrow[0])
    cos = F.round(cosine(F.col("feature"), qlit), 4)
    return (
        decoded.where(F.col("blob_id") != query_blob_id)
        .select("blob_id", "mime", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("blob_id"))
        .limit(k)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def resize_blobs(
    blobs: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Arrow-batched resize over mapInPandas.

    DETERMINISTIC FAKE resample (no PIL/ffmpeg in this container): the
    "thumbnail" is a strided byte subsample of the payload sized
    target_w*target_h/8 — byte-for-byte reproducible, so tests pin
    output size and determinism. A production build replaces the inner
    function with the real resampler; the dataflow (binary in, binary
    out, per-batch vectorized, schema typed) is unchanged. Output
    payloads shrink ~payload/thumb ratio, which is the point at
    100 TB: resize early, ship thumbnails through the rest of the
    pipeline, keep originals cold.
    """
    n_bytes = max(1, (target_w * target_h) // 8)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def thumb(p) -> bytes:
                raw = bytes(p)
                if not raw:
                    return b"\x00" * n_bytes
                step = max(1, len(raw) // n_bytes)
                return (raw[::step] + b"\x00" * n_bytes)[:n_bytes]

            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "thumbnail": pdf["payload"].map(thumb),
                }
            )

    return blobs.mapInPandas(resize, RESIZED_SCHEMA)


def _parse_wav_pcm(raw: bytes):
    """Locate a decodable WAV's sample data: returns (sample_rate,
    n_channels, data_offset, data_size, fmt_tag, bits) for the
    formats ``_decode_wav_samples`` handles — linear PCM (fmt 1,
    8/16-bit) and the G.711 telephony codecs (fmt 6 A-law, fmt 7
    mu-law, 8-bit) — or None otherwise (the stand-in boundary is
    'perceptual codecs', not 'audio')."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    off = 12
    rate = channels = bits = fmt_tag = None
    data = None
    while off + 8 <= len(raw):
        cid = raw[off : off + 4]
        (size,) = struct.unpack("<I", raw[off + 4 : off + 8])
        if cid == b"fmt " and off + 8 + 16 <= len(raw):
            fmt_tag, channels, rate = struct.unpack(
                "<HHI", raw[off + 8 : off + 16]
            )
            bits = struct.unpack("<H", raw[off + 22 : off + 24])[0]
        elif cid == b"data":
            data = (off + 8, size)
        if rate is not None and data is not None:
            break
        off += 8 + size + (size & 1)
    ok = (fmt_tag == 1 and bits in (8, 16)) or (
        fmt_tag in (6, 7) and bits == 8
    )
    if not ok or not rate or not channels or data is None:
        return None
    data_off, data_size = data
    data_size = min(data_size, len(raw) - data_off)
    return rate, channels, data_off, data_size, fmt_tag, bits


def _g711_tables():
    """256-entry mu-law / A-law decode lookup tables (ITU-T G.711 —
    public telephony standard; the canonical segment/mantissa
    expansion formulas)."""
    import numpy as np

    u = np.arange(256, dtype=np.int64)
    inv = ~u & 0xFF
    e = (inv >> 4) & 0x07
    m = inv & 0x0F
    t = (((m << 3) + 0x84) << e) - 0x84
    ulaw = np.where(inv & 0x80, -t, t).astype(np.float64)

    a = np.arange(256, dtype=np.int64) ^ 0x55
    e = (a >> 4) & 0x07
    m = a & 0x0F
    t = (m << 4) + 8
    t = np.where(e > 0, (t + 0x100) << np.maximum(e - 1, 0), t)
    alaw = np.where(a & 0x80, -t, t).astype(np.float64)
    return ulaw, alaw


def _decode_wav_samples(raw: bytes):
    """Decode a WAV payload to (sample_rate, mono float64 array in
    [-1, 1]) — 16-bit PCM, 8-bit unsigned PCM, or G.711
    mu-law/A-law — or None when the container/codec is out of
    scope."""
    import numpy as np

    parsed = _parse_wav_pcm(raw)
    if parsed is None:
        return None
    rate, ch, off, size, fmt_tag, bits = parsed
    if fmt_tag == 1 and bits == 16:
        n = (size // 2 // ch) * ch
        x = np.frombuffer(raw, dtype="<i2", count=n, offset=off).astype(
            np.float64
        )
        scale = 32768.0
    else:
        n = (size // ch) * ch
        b = np.frombuffer(raw, dtype=np.uint8, count=n, offset=off)
        if fmt_tag == 1:  # 8-bit PCM is unsigned
            x = b.astype(np.float64) - 128.0
            scale = 128.0
        else:
            ulaw, alaw = _g711_tables()
            x = (ulaw if fmt_tag == 7 else alaw)[b]
            scale = 32768.0
    if not len(x):
        return rate, np.zeros(0)
    return rate, x.reshape(-1, ch).mean(axis=1) / scale


def audio_features(blobs: DataFrame) -> DataFrame:
    """REAL sample-level audio feature extraction for WAV blobs —
    duration, RMS energy, zero-crossing rate, peak amplitude — the
    features an audio-curation pass gates on (silence/clipping
    detection, speech-band heuristics). Arrow ``mapInPandas`` over
    the binary column; ``_decode_wav_samples`` handles 16-bit and
    8-bit linear PCM plus the G.711 telephony codecs (mu-law/A-law,
    table-driven numpy expansion — the format call-center and
    voicemail corpora actually arrive in); channels mono-mix by
    mean. Out-of-scope payloads emit NULL features (skip-don't-fail,
    the module's contract); perceptual codecs (MP3/AAC) are the
    PERMANENT sample-decode boundary (module docstring) — their
    metadata tier is real via :func:`audio_stream_metadata`."""
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossing_rate", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for bid, mime, payload in zip(
                pdf["blob_id"], pdf["mime"], pdf["payload"]
            ):
                raw = bytes(payload)
                decoded = _decode_wav_samples(raw)
                row = [None] * 6
                if decoded is not None:
                    rate, x = decoded
                    if len(x):
                        zc = float(np.mean(np.abs(np.diff(np.signbit(x)))))
                        row = [
                            int(rate),
                            int(len(x)),
                            round(len(x) / rate, 6),
                            round(float(np.sqrt(np.mean(x * x))), 6),
                            round(zc, 6),
                            round(float(np.max(np.abs(x))), 6),
                        ]
                out["blob_id"].append(int(bid))
                out["mime"].append(mime)
                for name, v in zip(
                    ["sample_rate", "n_frames", "duration_s", "rms",
                     "zero_crossing_rate", "peak"],
                    row,
                ):
                    out[name].append(v)
            yield pd.DataFrame(out)

    return blobs.select("blob_id", "mime", "payload").mapInPandas(
        extract, schema
    )


def _decode_png_pixels(raw: bytes):
    """Pure-stdlib PNG pixel decode (public file-format knowledge:
    zlib-inflated IDAT + per-scanline unfiltering, filters 0-4) for
    8-bit depth, color types 0/2/4/6, non-interlaced. Returns a
    (h, w, channels) uint8 numpy array or None for anything else —
    with this, image sample decode needs no third-party codec at all
    for PNG; PIL remains the preferred tier where present (more
    formats, C-speed)."""
    import struct
    import zlib

    import numpy as np

    if len(raw) < 8 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    off = 8
    width = height = depth = ctype = interlace = None
    idat = b""
    while off + 8 <= len(raw):
        (size,) = struct.unpack(">I", raw[off : off + 4])
        typ = raw[off + 4 : off + 8]
        body = raw[off + 8 : off + 8 + size]
        if typ == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        off += 12 + size
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if (
        not width
        or not height
        or depth != 8
        or channels is None
        or interlace != 0
    ):
        return None
    try:
        stream = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = width * channels
    if len(stream) < height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint16)
    prev = np.zeros(stride, dtype=np.uint16)
    pos = 0
    for y in range(height):
        filt = stream[pos]
        row = np.frombuffer(
            stream, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.uint16)
        pos += 1 + stride
        cur = row.copy()
        if filt == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif filt == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif filt != 0:
            return None
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(height, width, channels)


def _decode_image_pixels(raw: bytes):
    """Stdlib image pixel decode dispatch across the classic trio:
    PNG (zlib inflate + per-scanline unfilter,
    ``_decode_png_pixels``), baseline JPEG (Huffman entropy decode +
    IDCT, ``jpegcodec.decode_jpeg``), or GIF (variable-width LZW +
    palette, ``gifcodec.decode_gif``) to an (h, w, channels) uint8
    array; None for anything else. Every decoder magic-checks first,
    so dispatch is three cheap prefix tests, and all are
    parse-or-NULL on corrupt input."""
    px = _decode_png_pixels(raw)
    if px is not None:
        return px
    from datapoints_csv_extractor_spark.operators.gifcodec import decode_gif
    from datapoints_csv_extractor_spark.operators.jpegcodec import (
        decode_jpeg,
    )

    px = decode_jpeg(raw)
    if px is not None:
        return px
    return decode_gif(raw)


def image_features(blobs: DataFrame) -> DataFrame:
    """REAL pixel-level image features for PNG and baseline-JPEG
    blobs with no third-party codec: per-channel means, overall
    brightness, and contrast (grayscale std) — the signals an
    image-curation pass gates on (black/blank frames, exposure
    outliers). PIL-decodable formats use PIL when present; PNG/JPEG
    fall back to the stdlib decoders (``_decode_image_pixels``), and
    anything else emits NULLs."""
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("brightness", T.DoubleType()),
            T.StructField("contrast", T.DoubleType()),
            T.StructField("channel_means", T.ArrayType(T.DoubleType())),
        ]
    )
    use_pil = pil_available()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for bid, mime, payload in zip(
                pdf["blob_id"], pdf["mime"], pdf["payload"]
            ):
                raw = bytes(payload)
                px = None
                if use_pil:
                    try:
                        import io

                        from PIL import Image

                        px = np.asarray(Image.open(io.BytesIO(raw)))
                        if px.ndim == 2:
                            px = px[:, :, None]
                    except Exception:
                        px = None
                if px is None:
                    px = _decode_image_pixels(raw)
                out["blob_id"].append(int(bid))
                out["mime"].append(mime)
                if px is None:
                    for k in ("width", "height", "channels", "brightness",
                              "contrast", "channel_means"):
                        out[k].append(None)
                    continue
                h, w, c = px.shape
                gray = px.astype(np.float64).mean(axis=2)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["channels"].append(int(c))
                out["brightness"].append(round(float(gray.mean()) / 255.0, 6))
                out["contrast"].append(round(float(gray.std()) / 255.0, 6))
                out["channel_means"].append(
                    [round(float(px[:, :, j].mean()), 4) for j in range(c)]
                )
            yield pd.DataFrame(out)

    return blobs.select("blob_id", "mime", "payload").mapInPandas(
        extract, schema
    )


def encode_png(px) -> bytes:
    """Minimal deterministic PNG encoder (filter 0 per scanline,
    single IDAT) for 8-bit (h, w, c) uint8 arrays, c in {1, 2, 3, 4}.
    Public file-format knowledge; exists so synthetic/round-trip
    pipelines can MAKE valid PNG payloads without a media library
    (the decoder's inverse for filter-0 streams)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(px, dtype=np.uint8)
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    stream = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing REAL pixel decode: synthesize a deterministic
    16x16 RGB PNG per document (pixels = sha256-expanded doc bytes),
    run the full encode -> inflate -> unfilter -> feature path, and
    report brightness/contrast/channel means. Rows-only (no SQL
    engine decodes PNG), but the decode is the real codec, not a
    stub — determinism and closed-form cases pinned in pytest."""
    import hashlib

    import numpy as np

    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "mime": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                buf = b"".join(
                    hashlib.sha256(seed + bytes([i])).digest()
                    for i in range(24)
                )
                px = np.frombuffer(buf[: 16 * 16 * 3], dtype=np.uint8)
                rows["blob_id"].append(int(did))
                rows["mime"].append("image/png")
                rows["payload"].append(
                    encode_png(px.reshape(16, 16, 3))
                )
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return image_features(blobs).select(
        "blob_id", "width", "height", "channels", "brightness", "contrast"
    ).orderBy("blob_id")


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing REAL sample decode: synthesize a deterministic
    PCM WAV tone per document (freq keyed by doc_id), run the full
    RIFF -> int16 -> feature path (duration/RMS/ZCR/peak). Rows-only;
    the closed-form feature math is pinned in pytest."""
    import math
    import struct

    import numpy as np

    d = load(spark, sf_dir, "documents").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 4000
        for pdf in batches:
            rows = {"blob_id": [], "mime": [], "payload": []}
            for did in pdf["doc_id"]:
                freq = 100 + int(did) % 37 * 20
                n = rate // 4  # 250 ms
                x = (
                    0.5
                    * 32767
                    * np.sin(2 * math.pi * freq * np.arange(n) / rate)
                ).astype("<i2")
                data = x.tobytes()
                wav = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                rows["blob_id"].append(int(did))
                rows["mime"].append("audio/wav")
                rows["payload"].append(wav)
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return audio_features(blobs).select(
        "blob_id", "sample_rate", "n_frames", "duration_s", "rms",
        "zero_crossing_rate",
    ).orderBy("blob_id")


def audio_stream_metadata(blobs: DataFrame) -> DataFrame:
    """MPEG-audio stream metadata over a binary column — duration,
    mean bitrate, VBR flag — via :func:`mp3_stream_metadata`'s pure
    header walk (no sample decode). The number an audio-corpus
    curation pass gates on (drop sub-second clips, cap per-domain
    hours, flag bitrate outliers) without paying a codec. Arrow
    ``mapInPandas``, map-only: at 100 TB this is one scan, no
    shuffle, parallel in the payload partitions. Non-MPEG payloads
    emit NULL metadata (skip-don't-fail, the module's contract)."""
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_mpeg_frames", T.LongType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("bitrate_kbps_mean", T.DoubleType()),
            T.StructField("is_vbr", T.BooleanType()),
            T.StructField("layer", T.IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for bid, mime, payload in zip(
                pdf["blob_id"], pdf["mime"], pdf["payload"]
            ):
                meta = mp3_stream_metadata(bytes(payload))
                out["blob_id"].append(int(bid))
                out["mime"].append(mime)
                for name in ("sample_rate", "n_mpeg_frames",
                             "duration_ms", "bitrate_kbps_mean",
                             "is_vbr", "layer"):
                    out[name].append(meta[name] if meta else None)
            yield pd.DataFrame(out)

    return blobs.select("blob_id", "mime", "payload").mapInPandas(
        extract, schema
    )


def synth_mp3_stream(
    doc_id: int, n_frames: int | None = None, vbr: bool | None = None
) -> bytes:
    """Deterministic synthetic MPEG1 Layer-III stream keyed by
    doc_id: valid 4-byte frame headers (44.1 kHz; CBR 128 kbps for
    even ids, VBR alternating 128/192 kbps for odd) followed by
    hash-derived filler payload bytes — a REAL header layout the
    walk must hop exactly (frame length arithmetic per ISO/IEC
    11172-3), with the entropy payload irrelevant to metadata. Every
    third id (doc_id % 3 == 0) gets an ID3v2 tag prefix so the skip
    path is exercised. Shared by the driver query and the pytest
    oracle."""
    import hashlib

    if n_frames is None:
        n_frames = 5 + doc_id % 7
    if vbr is None:
        vbr = doc_id % 2 == 1
    rate = 44100
    out = bytearray()
    if doc_id % 3 == 0:
        body = b"TAG padding %d" % doc_id
        sz = len(body)
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
             (sz >> 7) & 0x7F, sz & 0x7F]
        ) + body
    for i in range(n_frames):
        br_idx = 11 if (vbr and i % 2 == 1) else 9  # 192 / 128 kbps
        bitrate = _MP3_BITRATES[("V1", 3)][br_idx] * 1000
        frame_len = 144 * bitrate // rate  # padding bit 0
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (0 << 2) | 0, 0xC4])
        filler = hashlib.sha256(
            f"{doc_id}:{i}".encode()
        ).digest() * (frame_len // 32 + 1)
        out += hdr + filler[: frame_len - 4]
    return bytes(out)


def q_audio_stream_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing MPEG-audio metadata decode: synthesize a
    deterministic MP3 stream per document (CBR/VBR mix, ID3 tags on
    every third id), run the full header walk, report per-blob
    duration / mean bitrate / VBR flag. Rows-only (binary frame-hop
    has no SQL twin); the closed-form expectations are pinned in
    pytest against the same synthesizer."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "mime": [], "payload": []}
            for did in pdf["doc_id"]:
                rows["blob_id"].append(int(did))
                rows["mime"].append("audio/mpeg")
                rows["payload"].append(synth_mp3_stream(int(did)))
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return audio_stream_metadata(blobs).select(
        "blob_id", "sample_rate", "n_mpeg_frames", "duration_ms",
        "bitrate_kbps_mean", "is_vbr",
    ).orderBy("blob_id")


def _dhash_bits(px) -> int:
    """64-bit dHash of an (h, w, c) pixel array as a SIGNED long:
    grayscale, block-average onto the 8x9 grid, one bit per
    horizontally-adjacent cell comparison. Shared by the image and
    video (per-frame) fingerprint kernels."""
    import numpy as np

    gray = px.astype(np.float64).mean(axis=2)
    rs = np.linspace(0, gray.shape[0], 9).astype(int)
    cs = np.linspace(0, gray.shape[1], 10).astype(int)
    grid = np.array(
        [
            [
                gray[rs[r]: rs[r + 1], cs[c]: cs[c + 1]].mean()
                for c in range(9)
            ]
            for r in range(8)
        ]
    )
    bits = (grid[:, 1:] > grid[:, :-1]).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    if h >= 1 << 63:  # store as signed long
        h -= 1 << 64
    return h


def image_dhash(blobs: DataFrame) -> DataFrame:
    """64-bit difference hash (dHash) per image blob — the standard
    perceptual fingerprint: decode, grayscale, block-average onto an
    8x9 grid, emit one bit per horizontally-adjacent cell comparison.
    Near-identical images (small edits, re-encodes) land within a few
    Hamming bits; unrelated images are ~32 apart. Decode tiers match
    image_features (PIL when importable, stdlib PNG/baseline-JPEG
    decoders otherwise); undecodable payloads emit NULL. Arrow-batched
    mapInPandas; the hash itself is numpy block means — no per-pixel
    Python."""
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )
    use_pil = pil_available()

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                raw = bytes(payload)
                px = None
                if use_pil:
                    try:
                        import io

                        from PIL import Image

                        px = np.asarray(Image.open(io.BytesIO(raw)))
                        if px.ndim == 2:
                            px = px[:, :, None]
                    except Exception:
                        px = None
                if px is None:
                    px = _decode_image_pixels(raw)
                ids.append(int(bid))
                hashes.append(None if px is None else _dhash_bits(px))
            yield pd.DataFrame({"blob_id": ids, "dhash": hashes})

    return blobs.select("blob_id", "payload").mapInPandas(go, schema)


def image_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 4, n_bands: int = 4
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join — the SimHash
    pigeonhole on dHash bits: split the 64-bit hash into ``n_bands``
    16-bit bands; any pair within ``max_hamming`` <= n_bands - 1 bits
    must agree on at least one whole band, so candidates come from an
    EQUIJOIN on (band index, band value) — never the n^2 pair space —
    and the exact Hamming check (JVM xor + bit_count) verifies.
    Unsigned shifts keep the sign bit from smearing across bands."""
    band_ids = F.array(*[F.lit(i) for i in range(n_bands)])
    width = 64 // n_bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        return df.where(F.col("dhash").isNotNull()).select(
            F.col("blob_id").alias(f"{side}_id"),
            F.col("dhash").alias(f"{side}_hash"),
            F.explode(band_ids).alias("band"),
        ).withColumn(
            "band_val",
            # SQL form: the python shiftrightunsigned only takes an
            # int literal shift, not a per-row column.
            F.expr(
                f"shiftrightunsigned({side}_hash, band * {width})"
            ).bitwiseAND(F.lit(mask)),
        )
    a = banded(hashes, "a")
    b = banded(hashes, "b")
    ham = F.bit_count(F.col("a_hash").bitwiseXOR(F.col("b_hash")))
    return (
        a.join(b, ["band", "band_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing perceptual image dedup over REAL pixels: every
    17th document's synthesized PNG gets a one-pixel-edited twin, and
    every 19th gets a CROSS-FORMAT twin — the same image stored once
    as PNG and once as baseline JPEG (``jpegcodec.encode_jpeg``), the
    classic re-encode duplicate. The dHash banded join must recover
    exactly the planted twins without ever forming the quadratic pair
    space; the JPEG pair proves the near-dup path decodes real JPEG
    entropy-coded pixels, not just headers. Rows-only (no SQL engine
    decodes PNG/JPEG); planted-pair recovery pinned in pytest.

    The cross-format image is piecewise-constant on the dHash 8x9
    sampling grid with adjacent cells on levels >=64 gray apart, so
    every hash comparison carries a margin JPEG quantization error
    (<= a few gray levels at q95) cannot flip — recovery is
    deterministic, not a tail-probability bet the way noise pixels
    would be (measured: noise images flip up to 4 bits even at
    quality 100).

    The demo corpus is a deterministic quarter of the documents
    (doc_id % 4 == 0): the cost here is SYNTHESIZING the payloads,
    not the operator — a real deployment hashes stored blobs once."""
    import hashlib

    import numpy as np

    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    # spread_scan: the docs table is one parquet file -> one input
    # partition -> a single-task Arrow stage; spread the synth/decode
    # across the cluster (the similarity-module discipline).
    d = spread_scan(
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
    )
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    levels = (32, 96, 160, 224)
    rs = np.linspace(0, 16, 9).astype(int)
    cs = np.linspace(0, 16, 10).astype(int)

    def cell_image(seed: bytes) -> np.ndarray:
        """Gray image constant on each dHash sampling cell, adjacent
        cells always on different levels (margin >= 64)."""
        stream = b"".join(
            hashlib.sha256(seed + b"cell" + bytes([i])).digest()
            for i in range(3)
        )
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        k = 0
        for r in range(8):
            lev = levels[stream[k] % 4]
            k += 1
            for c in range(9):
                if c > 0:
                    others = [x for x in levels if x != lev]
                    lev = others[stream[k] % 3]
                    k += 1
                img[rs[r] : rs[r + 1], cs[c] : cs[c + 1], :] = lev
        return img

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datapoints_csv_extractor_spark.operators.jpegcodec import (
            encode_jpeg,
        )

        for pdf in batches:
            rows = {"blob_id": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                buf = b"".join(
                    hashlib.sha256(seed + bytes([i])).digest()
                    for i in range(24)
                )
                px = np.frombuffer(buf[: 16 * 16 * 3], dtype=np.uint8).copy()
                rows["blob_id"].append(int(did))
                rows["payload"].append(encode_png(px.reshape(16, 16, 3)))
                if did % 17 == 0:
                    twin = px.copy()
                    twin[0] = 255 - twin[0]  # one-channel edit
                    rows["blob_id"].append(int(did) + 10_000_000)
                    rows["payload"].append(
                        encode_png(twin.reshape(16, 16, 3))
                    )
                if did % 19 == 0:
                    # Cross-format twin: same image, PNG + JPEG.
                    cell = cell_image(seed)
                    rows["blob_id"].append(int(did) + 20_000_000)
                    rows["payload"].append(encode_png(cell))
                    rows["blob_id"].append(int(did) + 30_000_000)
                    rows["payload"].append(encode_jpeg(cell, quality=95))
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return (
        image_near_dup_pairs(image_dhash(blobs), max_hamming=3)
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# Audio near-dup: spectral landmark fingerprints (constellation hashing)
# --------------------------------------------------------------------------

def audio_fingerprints(
    blobs: DataFrame,
    frame: int = 256,
    hop: int = 128,
    n_bands: int = 4,
    fan_out: int = 3,
) -> DataFrame:
    """Landmark fingerprints for decodable audio blobs — the
    constellation-hash scheme of Wang 2003 (the Shazam paper), the
    standard time-shift-robust audio identifier: STFT the mono
    signal, keep the peak bin per log-spaced band per frame (the
    'constellation'), then hash each peak against the peaks of the
    next ``fan_out`` frames as (f1, f2, dt) triples anchored at the
    first peak's frame index.

    A hash survives trims/padding because (f1, f2, dt) carries no
    absolute time — the anchor frame ``t`` rides along separately so
    the MATCHER can vote on a consistent offset. Vectorized numpy
    (rfft over a strided frame matrix) inside Arrow ``mapInPandas``;
    map-only, ~(frames * bands * fan_out) rows per blob.
    Out-of-scope payloads (perceptual codecs — the documented
    stand-in boundary) emit no rows."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("hash", T.LongType()),
            T.StructField("t", T.IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "hash": [], "t": []}
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                decoded = _decode_wav_samples(
                    b"" if payload is None else bytes(payload)
                )
                if decoded is None:
                    continue
                _, x = decoded
                if len(x) < frame:
                    continue
                n_frames = 1 + (len(x) - frame) // hop
                idx = (
                    np.arange(frame)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                mags = np.abs(np.fft.rfft(x[idx] * np.hanning(frame), axis=1))
                n_bins = mags.shape[1]
                # log-spaced band edges over [1, n_bins)
                edges = np.unique(
                    np.geomspace(1, n_bins - 1, n_bands + 1).astype(int)
                )
                peaks = np.full((n_frames, len(edges) - 1), -1, dtype=int)
                # Prominence floor: a band peak must carry a real
                # fraction of its frame's energy. Without it, bands
                # holding only window leakage emit junk peaks that
                # coincide across unrelated recordings (leakage
                # always lands at the band edge nearest the true
                # tone) and manufacture false matches.
                frame_max = mags.max(axis=1)
                for b in range(len(edges) - 1):
                    seg = mags[:, edges[b] : edges[b + 1]]
                    if seg.shape[1] == 0:
                        continue
                    am = seg.argmax(axis=1) + edges[b]
                    ok = mags[np.arange(n_frames), am] > np.maximum(
                        0.05 * frame_max, 1e-8
                    )
                    peaks[:, b] = np.where(ok, am, -1)
                for t in range(n_frames):
                    for f1 in peaks[t]:
                        if f1 < 0:
                            continue
                        for dt in range(1, fan_out + 1):
                            if t + dt >= n_frames:
                                break
                            for f2 in peaks[t + dt]:
                                if f2 < 0:
                                    continue
                                h = (int(f1) << 20) | (int(f2) << 4) | dt
                                rows["blob_id"].append(int(bid))
                                rows["hash"].append(h)
                                rows["t"].append(t)
            yield pd.DataFrame(
                {
                    "blob_id": pd.Series(rows["blob_id"], dtype="int64"),
                    "hash": pd.Series(rows["hash"], dtype="int64"),
                    "t": pd.Series(rows["t"], dtype="int32"),
                }
            )

    return blobs.select("blob_id", "payload").mapInPandas(extract, schema)


def audio_near_dup_pairs(
    fingerprints: DataFrame,
    min_votes: int = 5,
    max_hash_df: int = 50,
    min_anchor_frames: int = 8,
) -> DataFrame:
    """Audio near-dup pairs from landmark fingerprints: equijoin on
    the hash (candidates come from shared landmarks — the pair space
    is never formed), then OFFSET VOTING: a true match (same
    recording, possibly trimmed/padded) aligns at one consistent
    frame offset, so the pair's score is the max vote count over
    offsets, not the raw hash-collision count — random collisions
    scatter across offsets and stay under ``min_votes``.

    The vote count alone cannot separate a true match from one
    accidentally-shared loud passage (a fully-shared segment can
    out-vote a partially-capped true match), so the best offset must
    ALSO show temporal spread — ``min_anchor_frames`` distinct
    anchor frames: a real same-recording match aligns landmarks
    across the whole overlap, a passage collision clusters in one
    spot. This is the standard verification step on top of
    constellation voting.

    Scale guards mirror the text-dedup discipline: hashes occurring
    in more than ``max_hash_df`` blobs are dropped before the join
    (the stop-shingle rule — a hot landmark manufactures quadratic
    candidates and carries no discriminative power). Two shuffles
    (hash join, offset groupBy); output one row per matched ordered
    pair."""
    df_counts = fingerprints.groupBy("hash").agg(
        F.countDistinct("blob_id").alias("df")
    )
    kept = fingerprints.join(
        df_counts.where(F.col("df") <= max_hash_df).select("hash"), "hash"
    )
    a = kept.select(
        F.col("blob_id").alias("id_a"),
        "hash",
        F.col("t").alias("t_a"),
    )
    b = kept.select(
        F.col("blob_id").alias("id_b"),
        "hash",
        F.col("t").alias("t_b"),
    )
    from pyspark.sql import Window

    per_offset = (
        a.join(b, "hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b", (F.col("t_a") - F.col("t_b")).alias("offset")
        )
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.countDistinct("t_a").alias("n_anchors"),
            (F.max("t_a") - F.min("t_a")).alias("anchor_span"),
        )
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("votes"), F.asc("offset")
    )
    return (
        per_offset.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "id_a", "id_b",
            F.col("votes").alias("best_offset_votes"),
            "n_anchors", "anchor_span", "offset",
        )
        .where(
            (F.col("best_offset_votes") >= min_votes)
            & (F.col("n_anchors") >= min_anchor_frames)
        )
        .orderBy("id_a", "id_b")
    )


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing audio near-dup: per doc a deterministic
    4-segment tone melody (segment frequencies drawn from
    md5(doc_id) — an effectively collision-free trajectory space);
    every 25th doc is a 200 ms-SHIFTED copy of its predecessor's
    melody — the planted near-dup the matcher must recover: same
    recording, different container bytes, different absolute timing.
    An earlier arithmetic-mod chirp synthesis produced genuine
    near-clone trajectories for unrelated ids, which the matcher
    CORRECTLY flagged — uncontrolled planted structure, not a
    matcher bug; the hash-derived melodies remove it. Rows-only (FFT
    floats are not SQL-expressible); the matcher's
    verdict/offset-voting behavior is pinned closed-form in
    pytest."""
    import hashlib
    import math
    import struct

    import numpy as np

    d = load(spark, sf_dir, "documents").select("doc_id")
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    rate = 4000
    seg_s = 0.1

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def melody(seed: int, silence_s: float) -> bytes:
            # EIGHT dual-tone segments, frequencies quantized to FFT
            # bin centers (frame 256 -> 15.625 Hz bins; non-centered
            # spacings aliased adjacent byte values into one bin and
            # manufactured cross-doc segment collisions). Low tone in
            # bins 13..72, high tone in bins 83..122: two peaks per
            # frame in disjoint bands. A melody is then a sequence of
            # 8 (low, high) bin pairs from md5(seed) — enough
            # temporal structure that a true (shifted-twin) match
            # aligns anchors across ~24 frames while an accidental
            # shared segment spans only ~3, which is what the
            # matcher's anchor-spread verification thresholds on.
            h = hashlib.md5(str(seed).encode()).digest()
            n = int(rate * seg_s)
            t = np.arange(n) / rate
            bw = rate / 256.0
            x = np.concatenate(
                [
                    np.sin(2 * math.pi * ((13 + h[i] % 60) * bw) * t)
                    + 0.7
                    * np.sin(2 * math.pi * ((83 + h[i + 8] % 40) * bw) * t)
                    for i in range(8)
                ]
            )
            x = np.concatenate([np.zeros(int(rate * silence_s)), x])
            data = (0.6 * 32767 * x).astype("<i2").tobytes()
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data
            )

        for pdf in batches:
            rows = {"blob_id": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                twin = did % 25 == 1
                rows["blob_id"].append(did)
                rows["payload"].append(
                    melody(did - 1 if twin else did, 0.2 if twin else 0.0)
                )
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    fp = audio_fingerprints(blobs)
    # Hot-hash cap PROPORTIONAL to corpus size (1%, floor 5): the
    # melodies' per-segment byte alphabet is small, so WITHIN-segment
    # landmarks repeat across ~n/256 docs at any scale — a fixed cap
    # either keeps them (false votes) or starves twins as n grows.
    # The proportional cap drops them at every sf, leaving the
    # cross-boundary landmarks (consecutive-segment byte PAIRS,
    # 2^-16 collision) to carry the verdict — which is also the
    # honest real-corpus posture: landmark df tracks corpus size.
    n_docs = d.count()
    return audio_near_dup_pairs(
        fp, min_votes=12, max_hash_df=max(5, n_docs // 100),
        min_anchor_frames=16,
    )


# --------------------------------------------------------------------------
# Video near-dup: frame-sequence dHash fingerprints + offset voting
# --------------------------------------------------------------------------

def video_frame_dhashes(blobs: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-frame perceptual fingerprints for video blobs: decode the
    animation (``gifcodec.decode_gif_frames`` — full-canvas rendered
    frames, GCE compositing honored), sample every ``every_n``-th
    frame, and emit the shared 64-bit dHash per sampled frame.
    Undecodable payloads emit nothing (parse-or-NULL, like every
    decoder here). Arrow-batched mapInPandas; one output row per
    sampled frame — the video analog of ``audio_fingerprints``."""
    from datapoints_csv_extractor_spark.operators.gifcodec import (
        decode_gif_frames,
    )

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(payload))
                if not frames:
                    continue
                for i in range(0, len(frames), every_n):
                    ids.append(int(bid))
                    idxs.append(i)
                    hashes.append(_dhash_bits(frames[i]))
            yield pd.DataFrame(
                {"blob_id": ids, "frame_idx": idxs, "dhash": hashes}
            ).astype({"blob_id": "int64", "frame_idx": "int32"})

    return blobs.select("blob_id", "payload").mapInPandas(go, schema)


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    min_votes: int = 4,
    max_band_df: int = 50,
    min_anchor_frames: int = 4,
) -> DataFrame:
    """Near-duplicate video pairs: banded-Hamming frame candidates +
    the audio module's offset-voting verification.

    Candidates come from an EQUIJOIN on (band index, 16-bit band
    value) of each frame's dHash — the SimHash pigeonhole, so a frame
    pair within ``max_hamming`` <= n_bands - 1 bits always collides on
    a whole band and the quadratic (video x video x frame x frame)
    space is never formed. Each candidate frame pair is verified by
    exact Hamming (JVM xor + bit_count), then pairs vote on the frame
    OFFSET: a true near-dup (trimmed / extended / re-encoded cut of
    the same footage) aligns at one consistent offset with anchors
    spread across the overlap; accidental frame collisions scatter.
    Hot bands (> ``max_band_df`` distinct videos — title cards, black
    frames) are dropped before the join: the stop-shingle rule.
    Three shuffles total (band df, band join, offset groupBy).

    The frame-hash table is eagerly localCheckpoint-materialized:
    it feeds the hot-band aggregate and BOTH join sides, and its
    lineage is the GIF decode itself — left lazy, the optimizer
    duplicates the MapInPandas decode subtree into every consumer
    (16 decode nodes in the executed plan at sf0.1; ~100 s executor
    work re-decoding the same payloads). Hashes are a few dozen
    bytes per frame, so this is the guide's decide-on-small-rows
    discipline: decode once, reason over fingerprints."""
    from pyspark.sql import Window

    frame_hashes = frame_hashes.localCheckpoint()

    width = 64 // n_bands
    mask = (1 << width) - 1
    band_ids = F.array(*[F.lit(i) for i in range(n_bands)])

    def banded(side: str) -> DataFrame:
        return frame_hashes.where(F.col("dhash").isNotNull()).select(
            F.col("blob_id").alias(f"{side}_id"),
            F.col("frame_idx").alias(f"{side}_frame"),
            F.col("dhash").alias(f"{side}_hash"),
            F.explode(band_ids).alias("band"),
        ).withColumn(
            "band_val",
            F.expr(
                f"shiftrightunsigned({side}_hash, band * {width})"
            ).bitwiseAND(F.lit(mask)),
        )

    a = banded("a")
    hot = (
        a.groupBy("band", "band_val")
        .agg(F.countDistinct("a_id").alias("df"))
        .where(F.col("df") > max_band_df)
        .select("band", "band_val")
    )
    a = a.join(hot, ["band", "band_val"], "left_anti")
    b = banded("b").join(hot, ["band", "band_val"], "left_anti")
    ham = F.bit_count(F.col("a_hash").bitwiseXOR(F.col("b_hash")))
    matched = (
        a.join(b, ["band", "band_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_frame", "b_frame", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # same frame pair can collide on several bands
    )
    per_offset = matched.groupBy(
        "a_id", "b_id", (F.col("a_frame") - F.col("b_frame")).alias("offset")
    ).agg(
        F.count(F.lit(1)).alias("votes"),
        F.countDistinct("a_frame").alias("n_anchors"),
        (F.max("a_frame") - F.min("a_frame")).alias("anchor_span"),
    )
    w = Window.partitionBy("a_id", "b_id").orderBy(
        F.desc("votes"), F.asc("offset")
    )
    return (
        per_offset.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "a_id", "b_id",
            F.col("votes").alias("best_offset_votes"),
            "n_anchors", "anchor_span", "offset",
        )
        .where(
            (F.col("best_offset_votes") >= min_votes)
            & (F.col("n_anchors") >= min_anchor_frames)
        )
        .orderBy("a_id", "b_id")
    )


def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing video near-dup over REAL animated-GIF frames:
    every 4th document synthesizes an 8-frame 16x16 animation (each
    frame piecewise-constant on the dHash grid with >= 64-gray-level
    margins between adjacent cells — deterministic hashes, not a
    noise-tail bet), and every 17th of those gets a TRIMMED+EXTENDED
    twin: the same footage minus its first 2 frames plus 2 fresh
    ones — the classic re-cut duplicate. The banded frame join +
    offset voting must recover exactly the planted twins (6 shared
    frames aligned at offset +2) with zero false pairs. Rows-only
    (no SQL engine decodes GIF LZW); recovery pinned in pytest."""
    import hashlib

    import numpy as np

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        encode_gif_frames,
    )
    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    d = spread_scan(
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
    )
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    levels = (32, 96, 160, 224)
    rs = np.linspace(0, 16, 9).astype(int)
    cs = np.linspace(0, 16, 10).astype(int)

    def cell_frame(seed: bytes) -> np.ndarray:
        stream = b"".join(
            hashlib.sha256(seed + b"vcell" + bytes([i])).digest()
            for i in range(3)
        )
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        k = 0
        for r in range(8):
            lev = levels[stream[k] % 4]
            k += 1
            for c in range(9):
                if c > 0:
                    others = [x for x in levels if x != lev]
                    lev = others[stream[k] % 3]
                    k += 1
                img[rs[r]: rs[r + 1], cs[c]: cs[c + 1], :] = lev
        return img

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                frames = [
                    cell_frame(seed + b"f%d" % i) for i in range(8)
                ]
                rows["blob_id"].append(int(did))
                rows["payload"].append(encode_gif_frames(frames))
                if did % 17 == 0:
                    twin = frames[2:] + [
                        cell_frame(seed + b"x%d" % i) for i in range(2)
                    ]
                    rows["blob_id"].append(int(did) + 10_000_000)
                    rows["payload"].append(encode_gif_frames(twin))
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return video_near_dup_pairs(video_frame_dhashes(blobs))


def q_thumbnail_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal linking: find still images that are FRAMES of some
    video (thumbnail/poster detection — the dedup question a mixed
    image+video corpus asks before counting the same footage twice).

    Corpus: every 4th document synthesizes the 8-frame animation from
    q_video_near_dup; every 13th of those also publishes frame 3 as a
    standalone GIF still — the planted thumbnail. Match = exact
    64-bit frame-dHash equijoin (image hash x video frame hash; the
    near-dup banded join generalizes this to edited thumbnails, so
    the exact join keeps this query's semantics crisp), one shuffle.
    Rows-only; planted recovery pinned in pytest."""
    import hashlib

    import numpy as np

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        encode_gif,
        encode_gif_frames,
    )
    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    d = spread_scan(
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
    )
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    levels = (32, 96, 160, 224)
    rs = np.linspace(0, 16, 9).astype(int)
    cs = np.linspace(0, 16, 10).astype(int)

    def cell_frame(seed: bytes) -> np.ndarray:
        stream = b"".join(
            hashlib.sha256(seed + b"vcell" + bytes([i])).digest()
            for i in range(3)
        )
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        k = 0
        for r in range(8):
            lev = levels[stream[k] % 4]
            k += 1
            for c in range(9):
                if c > 0:
                    others = [x for x in levels if x != lev]
                    lev = others[stream[k] % 3]
                    k += 1
                img[rs[r]: rs[r + 1], cs[c]: cs[c + 1], :] = lev
        return img

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "kind": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                frames = [cell_frame(seed + b"f%d" % i) for i in range(8)]
                rows["blob_id"].append(int(did))
                rows["kind"].append("video")
                rows["payload"].append(encode_gif_frames(frames))
                if did % 13 == 0:
                    rows["blob_id"].append(int(did) + 10_000_000)
                    rows["kind"].append("image")
                    rows["payload"].append(encode_gif(frames[3]))
            yield pd.DataFrame(rows)

    # One synth pass: the video and image branches each re-execute
    # the whole mapInPandas subtree when blobs stays lazy (8 decode/
    # synth nodes in the executed plan, ~50 s executor work at
    # sf0.1). Materializing the blobs once means every payload is
    # synthesized once and decoded once by exactly one branch.
    blobs = d.mapInPandas(synth, schema).localCheckpoint()
    videos = blobs.where(F.col("kind") == "video")
    images = blobs.where(F.col("kind") == "image")
    frame_hashes = video_frame_dhashes(videos)
    img_hashes = image_dhash(images).where(F.col("dhash").isNotNull())
    return (
        img_hashes.select(
            F.col("blob_id").alias("image_id"), "dhash"
        )
        .join(
            frame_hashes.select(
                F.col("blob_id").alias("video_id"), "frame_idx", "dhash"
            ),
            "dhash",
        )
        .select("image_id", "video_id", "frame_idx")
        .orderBy("image_id", "video_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# Scene-cut detection / content-aware keyframe extraction
# --------------------------------------------------------------------------

def video_keyframes(
    frame_hashes: DataFrame, cut_bits: int = 16
) -> DataFrame:
    """Content-aware keyframe extraction from per-frame dHashes: a
    SCENE CUT is a frame whose perceptual hash sits more than
    ``cut_bits`` Hamming bits from its predecessor (hard cuts move
    30-60 of the 64 gradient bits; within-shot motion moves a
    handful), and the keyframe set is frame 0 plus the first frame of
    every new shot — the frame-sample step a multimodal training
    pipeline actually wants, versus the blind every-Nth
    ``frame_sample`` (which oversamples static shots and can straddle
    cuts). Feed it ``video_frame_dhashes`` output.

    All post-decode work is JVM: one per-video window (lag + XOR +
    bit_count + a running cut count for the shot id). The shuffle key
    is the video id, so the cost is one partition-local pass over
    frames — linear in total frame count at any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy("blob_id").orderBy("frame_idx")
    prev = F.lag("dhash").over(w)
    hamming = F.when(prev.isNull(), F.lit(None).cast("int")).otherwise(
        F.bit_count(F.col("dhash").bitwiseXOR(prev)).cast("int")
    )
    scored = frame_hashes.withColumn("hamming_prev", hamming).withColumn(
        "is_cut",
        F.coalesce(F.col("hamming_prev") > cut_bits, F.lit(False)),
    )
    shot = F.sum(F.col("is_cut").cast("int")).over(
        Window.partitionBy("blob_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return scored.select(
        "blob_id",
        "frame_idx",
        "hamming_prev",
        shot.cast("int").alias("shot_id"),
        ((F.col("frame_idx") == 0) | F.col("is_cut")).alias("is_keyframe"),
    ).orderBy("blob_id", "frame_idx")


def q_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing scene-cut keyframing over synthesized multi-shot
    animations: every 4th document becomes a 9-frame GIF with 3 shots
    (frames repeat within a shot — Hamming 0 — and change scene at
    the planted boundaries), so the expected result is exactly 3
    keyframes per video at the shot starts. Rows-only (GIF LZW decode
    has no SQL twin); the planted boundaries are pinned in pytest."""
    import hashlib

    import numpy as np

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        encode_gif_frames,
    )
    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    d = spread_scan(
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "text")
    )
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    levels = (32, 96, 160, 224)
    rs = np.linspace(0, 16, 9).astype(int)
    cs = np.linspace(0, 16, 10).astype(int)

    def cell_frame(seed: bytes) -> np.ndarray:
        stream = b"".join(
            hashlib.sha256(seed + b"kcell" + bytes([i])).digest()
            for i in range(3)
        )
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        k = 0
        for r in range(8):
            lev = levels[stream[k] % 4]
            k += 1
            for c in range(9):
                if c > 0:
                    others = [x for x in levels if x != lev]
                    lev = others[stream[k] % 3]
                    k += 1
                img[rs[r]: rs[r + 1], cs[c]: cs[c + 1], :] = lev
        return img

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                frames = []
                for shot in range(3):
                    scene = cell_frame(seed + b"s%d" % shot)
                    frames += [scene] * 3
                rows["blob_id"].append(int(did))
                rows["payload"].append(encode_gif_frames(frames))
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return video_keyframes(video_frame_dhashes(blobs))


# --------------------------------------------------------------------------
# Audio activity segmentation (VAD-style silence trimming)
# --------------------------------------------------------------------------

def audio_segments(
    blobs: DataFrame,
    frame_ms: int = 20,
    energy_cut: float = 0.01,
    min_gap_frames: int = 2,
) -> DataFrame:
    """Energy-threshold activity segmentation for WAV blobs — the
    VAD-style preprocessing an audio training pipeline runs before
    anything expensive: frame the signal into ``frame_ms`` windows,
    mark frames whose RMS clears ``energy_cut``, close gaps shorter
    than ``min_gap_frames`` (spoken pauses), and emit one row per
    ACTIVE segment with millisecond bounds and mean energy. Silence
    costs storage and compute downstream and teaches a model nothing;
    this is the trim.

    Arrow ``mapInPandas`` over the binary column (the module's
    decode contract: out-of-scope payloads emit nothing, vectorized
    numpy per batch — framing is one reshape, energies one
    einsum-free mean of squares). One output row per segment; all
    post-decode analytics (counts, durations, per-source rollups)
    stay JVM-side on the emitted frame."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("start_ms", T.LongType()),
            T.StructField("end_ms", T.LongType()),
            T.StructField("mean_rms", T.DoubleType()),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"blob_id": [], "seg_idx": [], "start_ms": [],
                   "end_ms": [], "mean_rms": []}
            for bid, payload in zip(pdf["blob_id"], pdf["payload"]):
                decoded = _decode_wav_samples(bytes(payload))
                if decoded is None:
                    continue
                rate, x = decoded
                if not len(x):
                    continue
                flen = max(int(rate * frame_ms / 1000), 1)
                n_frames = len(x) // flen
                if n_frames == 0:
                    continue
                frames = x[: n_frames * flen].reshape(n_frames, flen)
                rms = np.sqrt((frames * frames).mean(axis=1))
                active = rms > energy_cut
                # close sub-threshold gaps shorter than min_gap_frames
                idx = np.flatnonzero(active)
                if len(idx) == 0:
                    continue
                for a, b in zip(idx[:-1], idx[1:]):
                    if 0 < b - a - 1 < min_gap_frames:
                        active[a + 1: b] = True
                # segment boundaries from the closed mask
                edges = np.diff(active.astype(np.int8))
                starts = list(np.flatnonzero(edges == 1) + 1)
                ends = list(np.flatnonzero(edges == -1) + 1)
                if active[0]:
                    starts = [0] + starts
                if active[-1]:
                    ends = ends + [n_frames]
                for si, (s, e) in enumerate(zip(starts, ends)):
                    out["blob_id"].append(int(bid))
                    out["seg_idx"].append(si)
                    out["start_ms"].append(int(s * flen * 1000 // rate))
                    out["end_ms"].append(int(e * flen * 1000 // rate))
                    out["mean_rms"].append(float(rms[s:e].mean()))
            yield pd.DataFrame(out).astype(
                {"blob_id": "int64", "seg_idx": "int32",
                 "start_ms": "int64", "end_ms": "int64"}
            )

    return blobs.select("blob_id", "payload").mapInPandas(go, schema)


def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing activity segmentation over synthesized WAVs:
    every 5th document becomes a tone / silence / tone clip (0.3 s
    each), so the expected output is exactly two active segments per
    blob around the planted silence. Rows-only (PCM decode); the
    planted boundaries are pinned in pytest."""
    import hashlib
    import struct

    import numpy as np

    from datapoints_csv_extractor_spark.operators.skew import spread_scan

    d = spread_scan(
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    schema = T.StructType(
        [
            T.StructField("blob_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def wav(x: "np.ndarray", rate: int) -> bytes:
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(pcm))
        )
        return hdr + pcm

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 8000
        t = np.arange(int(0.3 * rate)) / rate
        for pdf in batches:
            rows = {"blob_id": [], "payload": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode()).digest()
                f1 = 400 + (seed[0] % 8) * 50
                f2 = 900 + (seed[1] % 8) * 50
                clip = np.concatenate([
                    0.5 * np.sin(2 * np.pi * f1 * t),
                    np.zeros(int(0.3 * rate)),
                    0.5 * np.sin(2 * np.pi * f2 * t),
                ])
                rows["blob_id"].append(int(did))
                rows["payload"].append(wav(clip, rate))
            yield pd.DataFrame(rows)

    blobs = d.mapInPandas(synth, schema)
    return audio_segments(blobs).orderBy("blob_id", "seg_idx")
