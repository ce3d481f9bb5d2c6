"""Property-based round-trips for the stdlib container parsers:
Hypothesis builds valid PNG/JPEG/GIF/WAV/MP4 streams with random
dimensions/frame counts and the header walkers must recover them
exactly; random byte soup must be rejected (None), never crash.

Driver-free (no Spark session): these run the pure functions the
mapInPandas decode tier calls per payload.
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from datapoints_csv_extractor_spark.operators import multimodal as M


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 1 << 20),
    h=st.integers(1, 1 << 20),
    frames=st.integers(1, 1000),
    apng=st.booleans(),
)
def test_png_header_roundtrip(w, h, frames, apng):
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    actl = _chunk(b"acTL", struct.pack(">II", frames, 0)) if apng else b""
    idat = _chunk(b"IDAT", zlib.compress(b"\x00"))
    raw = b"\x89PNG\r\n\x1a\n" + ihdr + actl + idat + _chunk(b"IEND", b"")
    want = (w, h, frames if apng else 1)
    assert M._parse_image_header(raw) == want


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    n_app=st.integers(0, 3),
)
def test_jpeg_header_roundtrip(w, h, n_app):
    apps = b""
    for i in range(n_app):
        payload = b"\x00" * (4 + i)
        apps += bytes([0xFF, 0xE0 + i]) + struct.pack(
            ">H", 2 + len(payload)
        ) + payload
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x01\x11\x00"
    assert M._parse_image_header(b"\xff\xd8" + apps + sof0) == (w, h, 1)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 65535), h=st.integers(1, 65535))
def test_gif_header_roundtrip(w, h):
    raw = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
    assert M._parse_image_header(raw) == (w, h, 1)


@settings(max_examples=50, deadline=None)
@given(
    n_samples=st.integers(0, 1 << 20),
    n_channels=st.integers(1, 8),
    bits=st.sampled_from([8, 16, 24, 32]),
    extra_chunk=st.booleans(),
)
def test_wav_header_roundtrip(n_samples, n_channels, bits, extra_chunk):
    block_align = (bits // 8) * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, 8000, 8000 * block_align, block_align, bits
    )
    # A LIST chunk before fmt exercises the chunk walker (and odd
    # sizes exercise word alignment).
    lst = (
        b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        if extra_chunk
        else b""
    )
    data_size = n_samples * block_align
    body = (
        b"WAVE"
        + lst
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size)
    )
    raw = b"RIFF" + struct.pack("<I", len(body) + data_size) + body
    # Header-only stream: the data chunk's size field is declared but
    # bytes need not be present for frame-count math.
    assert M._parse_wav_header(raw) == (None, None, n_samples)


@settings(max_examples=50, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10000), min_size=1, max_size=8),
    w=st.integers(0, 4095),
    h=st.integers(0, 4095),
    audio_track_first=st.booleans(),
)
def test_mp4_frames_roundtrip(counts, w, h, audio_track_first):
    stts = _box(
        b"stts",
        struct.pack(">II", 0, len(counts))
        + b"".join(struct.pack(">II", c, 100) for c in counts),
    )
    vide = _box(
        b"trak",
        _box(
            b"tkhd", b"\x00" * 76 + struct.pack(">II", w << 16, h << 16)
        )
        + _box(
            b"mdia",
            _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
            + _box(b"minf", _box(b"stbl", stts)),
        ),
    )
    # A non-video track must be skipped by the walker.
    soun = _box(
        b"trak",
        _box(
            b"mdia",
            _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
            + _box(
                b"minf",
                _box(b"stbl", _box(b"stts", struct.pack(">II", 0, 0))),
            ),
        ),
    )
    traks = soun + vide if audio_track_first else vide + soun
    raw = _box(b"ftyp", b"isom" + b"\x00" * 4) + _box(b"moov", traks)
    want_dims = (w, h) if (w and h) else (None, None)
    assert M._parse_mp4_frames(raw) == (*want_dims, sum(counts))


@settings(max_examples=200, deadline=None)
@given(raw=st.binary(max_size=256))
def test_parsers_never_crash_on_garbage(raw):
    for fn in (
        M._parse_image_header,
        M._parse_wav_header,
        M._parse_mp4_frames,
    ):
        out = fn(raw)
        assert out is None or (isinstance(out, tuple) and len(out) == 3)


def test_audio_features_decode_real_pcm(spark):
    """Sample-level WAV decode is REAL: a synthesized 440 Hz sine at
    8 kHz mono int16 must measure its closed-form RMS (amp/sqrt(2)),
    zero-crossing rate (2f/rate), duration, and peak; non-audio
    payloads emit NULL features."""
    import math
    import struct

    import numpy as np

    rate, freq, amp, secs = 8000, 440, 0.5, 1.0
    n = int(rate * secs)
    x = (amp * 32767 * np.sin(2 * math.pi * freq * np.arange(n) / rate)).astype(
        "<i2"
    )
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
    blobs = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav)), (2, "text/plain", bytearray(b"no"))],
        "blob_id long, mime string, payload binary",
    )
    rows = {r.blob_id: r for r in M.audio_features(blobs).collect()}
    r = rows[1]
    assert r.sample_rate == rate and r.n_frames == n
    assert abs(r.duration_s - secs) < 1e-6
    assert abs(r.rms - amp / math.sqrt(2)) < 0.01
    assert abs(r.zero_crossing_rate - 2 * freq / rate) < 0.005
    assert abs(r.peak - amp) < 0.01
    assert rows[2].rms is None and rows[2].n_frames is None


def _encode_png(px, filters):
    """Minimal PNG encoder for tests: applies the REQUESTED filter id
    per scanline (exercising each reconstruction path) and zlib-packs
    the stream. px is (h, w, c) uint8; filters is one id per row."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    stream = b""
    for y, f in zip(range(h), filters):
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # paeth
            enc = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (cur[i] - pred) & 0xFF
        stream += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_reconstructs_all_filters(spark):
    """The stdlib PNG decoder must invert every filter type (0-4) on
    random pixel data, and image_features must report the closed-form
    brightness of a constant image."""
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        raw = _encode_png(px, filters)
        got = M._decode_png_pixels(raw)
        assert got is not None and np.array_equal(got, px), filters

    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    blobs = spark.createDataFrame(
        [(1, "image/png", bytearray(_encode_png(flat, [0] * 8))),
         (2, "application/octet-stream", bytearray(b"junk"))],
        "blob_id long, mime string, payload binary",
    )
    rows = {r.blob_id: r for r in M.image_features(blobs).collect()}
    r = rows[1]
    assert (r.width, r.height, r.channels) == (8, 8, 3)
    assert abs(r.brightness - 128 / 255) < 1e-6
    assert r.contrast == 0.0
    assert r.channel_means == [128.0, 128.0, 128.0]
    assert rows[2].brightness is None


# --- Baseline JPEG codec (operators/jpegcodec.py) -------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    gray=st.booleans(),
    quality=st.integers(60, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_decodes_close_pixels(w, h, gray, quality, seed):
    """encode_jpeg -> decode_jpeg round-trips any shape (including
    non-multiple-of-8 edges and 1x1), recovers exact dimensions and
    channel count, and lands within lossy-codec error of the input
    (DC of every 8x8 block is quantized by <= the table's [0,0]
    entry, so block means can't drift far)."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    rng = np.random.RandomState(seed)
    c = 1 if gray else 3
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    blob = J.encode_jpeg(px, quality=quality)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    out = J.decode_jpeg(blob)
    assert out is not None and out.shape == (h, w, c)
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    # Random noise is the worst case for a transform codec; even so
    # the mean abs error stays far below "different image" territory.
    # Below one full 8x8 block the mean is over too few pixels for the
    # 4:2:0 chroma averaging to cancel out (measured worst 63.2 at
    # 2x2 color / q60 over 120 seeds x 5 qualities; >= 64 px stays
    # within the tier bounds), so sub-block images get a wider band.
    limit = 40 if quality < 80 else 20
    if h * w < 64:
        limit = 90
    assert err <= limit


def test_jpeg_decode_smooth_image_near_exact():
    """On low-frequency content (where JPEG is designed to be
    transparent) the decoder must reproduce the input almost exactly
    at high quality — a correctness pin much tighter than the noise
    bound above."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = np.stack(
        [np.clip(xx * 2 + yy, 0, 255), np.clip(255 - xx * 3, 0, 255),
         np.full_like(xx, 77)],
        axis=2,
    ).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(smooth, quality=95))
    assert out is not None
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 1.5


def test_jpeg_decode_subsampled_and_restart_markers():
    """4:2:0-style subsampled and DRI/RSTn streams decode: build the
    bitstream by hand (the encoder emits only 4:4:4 without DRI) so
    the decoder's chroma upsample and restart-realign paths are
    covered. A 16x16 constant-color image has an exactly predictable
    decode under any sampling layout."""
    import struct

    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    # Declare 4:2:0 (luma 2x2, chroma 1x1): the entropy stream then
    # carries per MCU 4 luma + 1 Cb + 1 Cr blocks. Build the whole
    # stream by hand with the module's own table helpers.
    qy = J._quality_scaled(J._QUANT_LUMA, 90)
    qc = J._quality_scaled(J._QUANT_CHROMA, 90)
    dc_y = J._canonical_codes(*J._DC_LUMA)
    ac_y = J._canonical_codes(*J._AC_LUMA)
    dc_c = J._canonical_codes(*J._DC_CHROMA)
    ac_c = J._canonical_codes(*J._AC_CHROMA)

    y_val = 0.299 * 200 + 0.587 * 200 + 0.114 * 200  # = 200
    blocks_y = np.zeros((8, 8)) + (y_val - 128.0)
    blocks_c = np.zeros((8, 8))  # Cb=Cr=128 -> centered 0

    out = bytearray()
    out += b"\xff\xd8"
    for tq, tbl in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[z]) for z in J._ZZ)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0])  # luma 2x2
    out += bytes([2, 0x11, 1])
    out += bytes([3, 0x11, 1])
    for tclass, (counts, syms) in (
        (0x00, J._DC_LUMA), (0x10, J._AC_LUMA),
        (0x01, J._DC_CHROMA), (0x11, J._AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms))
        out += bytes([tclass]) + bytes(counts) + bytes(syms)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: restart every MCU
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"

    def emit_mcu(bw, preds):
        # 4 luma blocks then Cb, Cr; DC diff vs predictor, all-zero AC.
        for ci, (blk, q, dcc, acc) in enumerate(
            [(blocks_y, qy, dc_y, ac_y)] * 4
            + [(blocks_c, qc, dc_c, ac_c), (blocks_c, qc, dc_c, ac_c)]
        ):
            comp = 0 if ci < 4 else ci - 3
            dct = (J._T8 @ blk @ J._T8.T).reshape(-1)
            dc = int(round(dct[0] / q[0]))
            diff = dc - preds[comp]
            preds[comp] = dc
            mag = abs(diff)
            size = mag.bit_length()
            code, length = dcc[size]
            bw.write(code, length)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
            code, length = acc[0x00]  # EOB
            bw.write(code, length)

    # One MCU covers the whole 16x16 image; DRI=1 means a restart
    # marker would follow BETWEEN MCUs — with a single MCU none is
    # required, so also emit a second image 32 wide (2 MCUs) to force
    # one RST0 into the stream.
    bw = J._BitWriter()
    emit_mcu(bw, [0, 0, 0])
    bw.flush()
    single = bytes(out) + bytes(bw.out) + b"\xff\xd9"
    px = J.decode_jpeg(single)
    assert px is not None and px.shape == (16, 16, 3)
    got = np.unique(px.reshape(-1, 3), axis=0)
    assert len(got) == 1
    assert np.all(np.abs(got[0].astype(int) - 200) <= 2)

    # Same header rebuilt for a 16x32 image: two MCUs, so DRI=1 forces
    # one RST0 between them (predictors reset, bit reader realigns).
    wide = bytearray()
    wide += b"\xff\xd8"
    for tq, tbl in ((0, qy), (1, qc)):
        wide += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        wide += bytes(int(tbl[z]) for z in J._ZZ)
    wide += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 32, 3)
    wide += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tclass, (counts, syms) in (
        (0x00, J._DC_LUMA), (0x10, J._AC_LUMA),
        (0x01, J._DC_CHROMA), (0x11, J._AC_CHROMA),
    ):
        wide += b"\xff\xc4" + struct.pack(">H", 19 + len(syms))
        wide += bytes([tclass]) + bytes(counts) + bytes(syms)
    wide += b"\xff\xdd" + struct.pack(">HH", 4, 1)
    wide += b"\xff\xda" + struct.pack(">HB", 12, 3)
    wide += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    bw = J._BitWriter()
    emit_mcu(bw, [0, 0, 0])
    bw.flush()
    wide += bytes(bw.out) + b"\xff\xd0"  # RST0, predictors reset
    bw = J._BitWriter()
    emit_mcu(bw, [0, 0, 0])
    bw.flush()
    wide += bytes(bw.out) + b"\xff\xd9"
    px = J.decode_jpeg(bytes(wide))
    assert px is not None and px.shape == (16, 32, 3)
    got = np.unique(px.reshape(-1, 3), axis=0)
    assert len(got) == 1
    assert np.all(np.abs(got[0].astype(int) - 200) <= 2)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    gray=st.booleans(),
    quality=st.integers(60, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_decode_matches_baseline_exactly(
    w, h, gray, quality, seed
):
    """encode_jpeg_progressive quantizes IDENTICALLY to encode_jpeg,
    so decoding the progressive stream must reproduce the baseline
    decode bit-for-bit — one equality that exercises every
    progressive path at once (DC first + refine, AC first with EOBn
    runs, two-level AC successive approximation with correction
    bits), since the scan script splits luma at Al=2 and chroma at
    Al=1."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    rng = np.random.RandomState(seed)
    c = 1 if gray else 3
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    blob = J.encode_jpeg_progressive(px, quality=quality)
    assert b"\xff\xc2" in blob[:256]  # SOF2 frame header (after DQTs)
    base = J.decode_jpeg(J.encode_jpeg(px, quality=quality))
    prog = J.decode_jpeg(blob)
    assert prog is not None and base is not None
    assert prog.shape == (h, w, c)
    assert np.array_equal(prog, base)


def test_jpeg_progressive_smooth_image_near_exact():
    """The progressive pipeline end-to-end on low-frequency content —
    the same transparency pin as the baseline codec's."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = np.stack(
        [np.clip(xx * 2 + yy, 0, 255), np.clip(255 - xx * 3, 0, 255),
         np.full_like(xx, 77)],
        axis=2,
    ).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_progressive(smooth, quality=95))
    assert out is not None
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 1.5


@settings(max_examples=30, deadline=None)
@given(
    cut=st.integers(2, 200),
    flip_at=st.integers(2, 200),
    flip_to=st.integers(0, 255),
)
def test_jpeg_progressive_truncated_and_bitflipped_is_parse_or_null(
    cut, flip_at, flip_to
):
    """The parse-or-NULL contract holds for progressive streams too:
    truncations and byte flips decode to None or some image, never
    raise."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    blob = J.encode_jpeg_progressive(px, quality=85)
    J.decode_jpeg(blob[: min(cut, len(blob))])
    mut = bytearray(blob)
    mut[flip_at % len(mut)] = flip_to
    J.decode_jpeg(bytes(mut))


@settings(max_examples=60, deadline=None)
@given(raw=st.binary(min_size=0, max_size=400))
def test_jpeg_decode_never_crashes_on_garbage(raw):
    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    assert J.decode_jpeg(raw) is None
    assert J.decode_jpeg(b"\xff\xd8" + raw) is None or True


@settings(max_examples=30, deadline=None)
@given(
    cut=st.integers(2, 200),
    flip_at=st.integers(2, 200),
    flip_to=st.integers(0, 255),
)
def test_jpeg_decode_truncated_and_bitflipped_is_parse_or_null(
    cut, flip_at, flip_to
):
    """Truncations and byte flips of a VALID stream must decode to
    None or to some image — never raise (parse-or-NULL contract the
    mapInPandas tier relies on)."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    blob = J.encode_jpeg(px, quality=85)
    J.decode_jpeg(blob[: min(cut, len(blob))])
    mut = bytearray(blob)
    mut[min(flip_at, len(mut) - 1)] = flip_to
    J.decode_jpeg(bytes(mut))


def test_image_features_and_dhash_decode_real_jpeg(spark):
    """image_features reports true stats for a JPEG blob (constant
    image -> exact closed-form brightness within codec error), and
    image_dhash produces matching hashes for the same image stored as
    PNG vs JPEG (the cross-format near-dup premise)."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import jpegcodec as J

    flat = np.full((16, 16, 3), 130, dtype=np.uint8)
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, 8:, :] = 220
    grad[:, :8, :] = 30
    blobs = spark.createDataFrame(
        [
            (1, "image/jpeg", bytearray(J.encode_jpeg(flat, quality=92))),
            (2, "image/png", bytearray(M.encode_png(grad))),
            (3, "image/jpeg", bytearray(J.encode_jpeg(grad, quality=92))),
        ],
        "blob_id long, mime string, payload binary",
    )
    feats = {r.blob_id: r for r in M.image_features(blobs).collect()}
    assert (feats[1].width, feats[1].height, feats[1].channels) == (16, 16, 3)
    assert abs(feats[1].brightness - 130 / 255) < 0.02
    assert feats[1].contrast < 0.02
    hashes = {r.blob_id: r.dhash for r in M.image_dhash(blobs).collect()}
    assert hashes[2] is not None and hashes[3] is not None
    ham = bin((hashes[2] ^ hashes[3]) & ((1 << 64) - 1)).count("1")
    assert ham <= 2, f"png-vs-jpeg dhash hamming {ham}"


# --- GIF codec (operators/gifcodec.py) ------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    n_levels=st.integers(2, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_is_exact(w, h, n_levels, seed):
    """GIF is lossless: encode_gif -> decode_gif must reproduce the
    input byte-for-byte for any palette-sized image (including 1x1
    and code-width-growth cases)."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import gifcodec as G

    rng = np.random.RandomState(seed)
    levels = np.linspace(0, 255, n_levels).astype(np.uint8)
    px = levels[rng.randint(0, n_levels, size=(h, w, 3))]
    out = G.decode_gif(G.encode_gif(px))
    assert out is not None and np.array_equal(out, px)


def test_gif_decode_interlaced_and_transparent():
    """Hand-built streams cover what the encoder doesn't emit: an
    interlaced image (8/8/4/2 pass weave) must de-weave to the
    original row order, and a transparent index (GIF89a graphic
    control) must composite onto the background color."""
    import struct

    import numpy as np

    from datapoints_csv_extractor_spark.operators import gifcodec as G

    # 10 rows, 4 cols, each row a distinct palette index 0..9.
    h, w = 10, 4
    rows = np.repeat(np.arange(h, dtype=np.int32)[:, None], w, axis=1)
    pal = np.stack(
        [np.arange(10) * 20, np.arange(10) * 10, np.arange(10) * 5],
        axis=1,
    ).astype(np.uint8)
    pal_full = np.zeros((16, 3), dtype=np.uint8)
    pal_full[:10] = pal
    # Interlace pass order: rows 0,8 then 4 then 2,6 then odd rows.
    order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    woven = rows[order].reshape(-1).tolist()
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0)
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(4)
    lzw = G._lzw_encode(woven, 4)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    px = G.decode_gif(bytes(out))
    assert px is not None and px.shape == (h, w, 3)
    assert np.array_equal(px, pal[rows])

    # Transparency: index 5 transparent, background index 2.
    out2 = bytearray()
    out2 += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 3, 2, 0)
    out2 += pal_full.tobytes()
    out2 += b"\x21\xf9\x04\x01\x00\x00\x05\x00"  # GCE: transparent=5
    out2 += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out2.append(4)
    lzw = G._lzw_encode(rows.reshape(-1).tolist(), 4)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out2.append(len(chunk))
        out2 += chunk
    out2 += b"\x00\x3b"
    px = G.decode_gif(bytes(out2))
    assert px is not None
    want = rows.copy()
    want[want == 5] = 2
    assert np.array_equal(px, pal[want])


@settings(max_examples=60, deadline=None)
@given(raw=st.binary(min_size=0, max_size=300))
def test_gif_decode_never_crashes_on_garbage(raw):
    from datapoints_csv_extractor_spark.operators import gifcodec as G

    G.decode_gif(raw)
    G.decode_gif(b"GIF89a" + raw)


def test_image_features_decode_real_gif(spark):
    """The mapInPandas tier reports true pixel stats for a GIF blob
    through the shared dispatcher."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators import gifcodec as G

    flat = np.full((12, 9, 3), 120, dtype=np.uint8)
    blobs = spark.createDataFrame(
        [(1, "image/gif", bytearray(G.encode_gif(flat)))],
        "blob_id long, mime string, payload binary",
    )
    r = M.image_features(blobs).collect()[0]
    assert (r.width, r.height, r.channels) == (9, 12, 3)
    assert abs(r.brightness - 120 / 255) < 1e-6
    assert r.contrast == 0.0


def _wav(fmt_tag, bits, rate, payload: bytes, channels=1) -> bytes:
    block = channels * (bits // 8)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, fmt_tag, channels, rate, rate * block, block, bits
        )
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def test_audio_features_decode_g711_and_pcm8(spark):
    """G.711 mu-law / A-law and 8-bit PCM WAVs decode to real
    samples: a companded 440 Hz sine must measure its closed-form
    RMS within companding quantization error, and the three variants
    must agree with the 16-bit PCM reference."""
    import math

    import numpy as np

    rate, freq, amp = 8000, 440, 0.5
    n = rate  # 1 second
    x = amp * np.sin(2 * math.pi * freq * np.arange(n) / rate)
    pcm16 = (x * 32767).astype("<i2")

    # Inverse companders (ITU-T G.711 encode formulas) for the test.
    def ulaw_encode(s):
        s = np.clip((s * 32768).astype(np.int64), -32635, 32635)
        sign = np.where(s < 0, 0x80, 0)
        mag = np.abs(s) + 0x84
        e = (np.floor(np.log2(mag)) - 7).astype(np.int64)
        m = (mag >> (e + 3)) & 0x0F
        return (~(sign | (e << 4) | m) & 0xFF).astype(np.uint8)

    def alaw_encode(s):
        s = np.clip((s * 32768).astype(np.int64), -32767, 32767)
        sign = np.where(s >= 0, 0x80, 0)
        mag = np.abs(s)
        e = np.maximum(
            (np.floor(np.log2(np.maximum(mag, 256))) - 7).astype(np.int64), 0
        )
        m = np.where(e > 0, (mag >> (e + 3)) & 0x0F, mag >> 4)
        return (((sign | (e << 4) | m) ^ 0x55) & 0xFF).astype(np.uint8)

    pcm8 = ((x * 127) + 128).astype(np.uint8)
    blobs = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_wav(1, 16, rate, pcm16.tobytes()))),
            (2, "audio/wav", bytearray(_wav(7, 8, rate, ulaw_encode(x).tobytes()))),
            (3, "audio/wav", bytearray(_wav(6, 8, rate, alaw_encode(x).tobytes()))),
            (4, "audio/wav", bytearray(_wav(1, 8, rate, pcm8.tobytes()))),
            (5, "audio/wav", bytearray(_wav(3, 32, rate, b"\x00" * 64))),
        ],
        "blob_id long, mime string, payload binary",
    )
    rows = {r.blob_id: r for r in M.audio_features(blobs).collect()}
    want_rms = amp / math.sqrt(2)
    for bid, tol in ((1, 0.002), (2, 0.02), (3, 0.02), (4, 0.02)):
        r = rows[bid]
        assert r.sample_rate == rate and r.n_frames == n, bid
        assert abs(r.rms - want_rms) < tol, (bid, r.rms)
        assert abs(r.zero_crossing_rate - 2 * freq / rate) < 0.01, bid
    assert rows[5].rms is None  # float WAV: out of scope, NULL not garbage


def _mp3_frame(ver_bits=3, layer_bits=1, br_idx=9, sr_idx=0, pad=0) -> bytes:
    """One syntactically-valid MPEG audio frame (header + zero
    payload sized to the header's own length formula)."""
    h = bytes(
        [
            0xFF,
            0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1,
            (br_idx << 4) | (sr_idx << 2) | (pad << 1),
            0x00,
        ]
    )
    from datapoints_csv_extractor_spark.operators.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
    )

    layer = 4 - layer_bits
    vgroup = "V1" if ver_bits == 3 else "V2"
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[ver_bits][sr_idx]
    if layer == 1:
        n = (12 * bitrate // rate + pad) * 4
    else:
        per = 144 if (layer == 2 or vgroup == "V1") else 72
        n = per * bitrate // rate + pad
    return h + b"\x00" * (n - 4)


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 12),
    ver=st.sampled_from([3, 2, 0]),
    layer_bits=st.sampled_from([1, 2, 3]),
    br_idx=st.integers(1, 14),
    sr_idx=st.integers(0, 2),
    id3=st.booleans(),
)
def test_mp3_frame_walk_counts_samples(
    n_frames, ver, layer_bits, br_idx, sr_idx, id3
):
    layer = 4 - layer_bits
    if layer == 1:
        samples = 384
    else:
        samples = 1152 if (layer == 2 or ver == 3) else 576
    body = _mp3_frame(ver, layer_bits, br_idx, sr_idx) * n_frames
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 if id3 else b""
    got = M._parse_mp3_frames(tag + body)
    assert got == (None, None, n_frames * samples)
    # Trailing junk after valid frames is tolerated (APEv2/ID3v1).
    got = M._parse_mp3_frames(tag + body + b"TAGjunkjunk")
    assert got == (None, None, n_frames * samples)


def test_mp3_frame_walk_rejects_non_mpeg():
    assert M._parse_mp3_frames(b"") is None
    assert M._parse_mp3_frames(b"RIFFxxxxWAVE") is None
    # free-format bitrate (index 0) is rejected, not guessed
    bad = bytes([0xFF, 0xFB, 0x02, 0x00]) + b"\x00" * 100
    assert M._parse_mp3_frames(bad) is None


def test_mp3_stream_metadata_duration_bitrate_vbr():
    """The metadata tier of the permanent codec boundary: duration,
    mean bitrate and the VBR flag must be closed-form exact on
    synthesized CBR and VBR streams (with ID3 skip + trailing junk)."""
    # CBR: 4 frames of MPEG1-L3 128 kbps @44.1 kHz.
    cbr = _mp3_frame(br_idx=9) * 4
    meta = M.mp3_stream_metadata(cbr + b"TAGjunk")
    assert meta["n_mpeg_frames"] == 4
    assert meta["sample_rate"] == 44100
    assert meta["duration_ms"] == round(4 * 1152 * 1000.0 / 44100, 3)
    assert meta["bitrate_kbps_mean"] == 128.0
    assert meta["is_vbr"] is False and meta["layer"] == 3
    # VBR: alternate 128 / 192 kbps — mean 160, flag set.
    vbr = (_mp3_frame(br_idx=9) + _mp3_frame(br_idx=11)) * 3
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    meta = M.mp3_stream_metadata(tag + vbr)
    assert meta["n_mpeg_frames"] == 6
    assert meta["bitrate_kbps_mean"] == 160.0
    assert meta["is_vbr"] is True
    assert M.mp3_stream_metadata(b"RIFFxxxxWAVE") is None
    # Mid-stream sample-rate or MPEG-version switches are
    # concatenation artifacts: duration over one nominal rate would
    # be silently wrong, so the walk rejects them (round-10 advice).
    mixed_rate = _mp3_frame(sr_idx=0) + _mp3_frame(sr_idx=1)
    assert M.mp3_stream_metadata(mixed_rate) is None
    mixed_ver = _mp3_frame(ver_bits=3) + _mp3_frame(ver_bits=2)
    assert M.mp3_stream_metadata(mixed_ver) is None
    # Same-rate multi-frame streams still walk fine after the guard.
    assert M.mp3_stream_metadata(_mp3_frame() * 3)["n_mpeg_frames"] == 3


def test_q_audio_stream_meta_matches_synth_closed_form(spark):
    """Driver query: per-doc synthesized MP3 streams (CBR/VBR mix,
    ID3 on every third id) must report exactly the synthesizer's
    frame count, the closed-form duration, and the parity-derived
    VBR flag — checked against a pure-Python re-derivation."""
    rows = M.q_audio_stream_meta(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        did = r.blob_id
        n = 5 + did % 7
        vbr = did % 2 == 1
        assert r.n_mpeg_frames == n
        assert r.sample_rate == 44100
        assert r.duration_ms == round(n * 1152 * 1000.0 / 44100, 3)
        assert r.is_vbr == vbr
        if not vbr:
            assert r.bitrate_kbps_mean == 128.0
        else:
            n_hi = n // 2  # odd frame indexes carry 192 kbps
            exp = round((128000 * (n - n_hi) + 192000 * n_hi) / n / 1000.0, 3)
            assert r.bitrate_kbps_mean == exp


def test_decode_blobs_audio_mp3_tier(spark):
    """decode_blobs' audio tier: WAV first, MPEG frame walk second,
    NULL for everything else — all through the Arrow path."""
    mp3 = _mp3_frame() * 3
    blobs = spark.createDataFrame(
        [
            (1, "audio/mpeg", bytearray(mp3), None, None),
            (2, "audio/wav", bytearray(b"notawav"), None, None),
        ],
        "blob_id long, mime string, payload binary, byte_len long, sha256 string",
    )
    rows = {r.blob_id: r for r in M.decode_blobs(blobs).collect()}
    assert rows[1].n_frames == 3 * 1152 and rows[1].width is None
    assert rows[2].n_frames is None


def _tone_wav(freqs, rate=4000, dur_s=0.6, prefix_silence_s=0.0):
    """16-bit PCM WAV of a linear chirp from freqs[0] to freqs[1] —
    a moving spectral peak, so the constellation has per-frame
    structure (a stationary sine gives every frame the same peak and
    degenerates the landmark scheme)."""
    import math
    import struct

    import numpy as np

    n = int(rate * dur_s)
    t = np.arange(n) / rate
    f0, f1 = freqs
    x = np.sin(2 * math.pi * (f0 * t + (f1 - f0) * t * t / (2 * dur_s)))
    x = np.concatenate([np.zeros(int(rate * prefix_silence_s)), x])
    data = (0.6 * 32767 * x).astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_audio_near_dup_matches_shifted_copy_only(spark):
    """The constellation matcher: a time-shifted copy of a recording
    matches it with a consistent offset; an unrelated recording does
    not; silence produces no spurious pairs."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.multimodal import (
        audio_fingerprints,
        audio_near_dup_pairs,
    )

    a = _tone_wav((440, 880))
    a_shift = _tone_wav((440, 880), prefix_silence_s=0.2)
    other = _tone_wav((1500, 300))
    blobs = spark.createDataFrame(
        [(1, a), (2, a_shift), (3, other)],
        "blob_id long, payload binary",
    )
    fp = audio_fingerprints(blobs)
    assert fp.where(F.col("blob_id") == 1).count() > 20
    pairs = audio_near_dup_pairs(fp, min_votes=5).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    # The shifted copy aligns on ONE offset with many votes.
    assert pairs[0].best_offset_votes >= 10


# ---------------------------------------------------------------------------
# Animated GIF codec + video near-dup
# ---------------------------------------------------------------------------


def test_gif_animation_round_trip_exact():
    import numpy as np

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.RandomState(11)
    frames = [
        (rng.randint(0, 4, (12, 9, 1)) * 70).astype(np.uint8).repeat(3, 2)
        for _ in range(6)
    ]
    raw = encode_gif_frames(frames)
    back = decode_gif_frames(raw)
    assert len(back) == 6
    assert all((a == b).all() for a, b in zip(frames, back))
    # The single-frame decoder sees the animation's first frame.
    assert (decode_gif(raw) == frames[0]).all()


def test_gif_frames_compositing_disposal_and_transparency():
    """Hand-built 2-frame GIF: full red background frame, then a
    transparent-holed green sub-rectangle with disposal=2 (restore
    background) — rendered frames must show true compositing, and a
    disposal-3 variant must restore the pre-frame canvas."""
    import struct

    import numpy as np

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        _lzw_encode,
        decode_gif_frames,
    )

    def img_block(ix, iy, iw, ih, indices):
        out = bytearray(b"\x2c" + struct.pack("<HHHHB", ix, iy, iw, ih, 0))
        out.append(2)  # min code size
        lzw = _lzw_encode(indices, 2)
        for j in range(0, len(lzw), 255):
            out.append(len(lzw[j:j + 255]))
            out += lzw[j:j + 255]
        out += b"\x00"
        return bytes(out)

    def gce(disposal, transparent=None):
        flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        return b"\x21\xf9\x04" + bytes([flags, 0, 0, transparent or 0]) + b"\x00"

    # Palette: 0=red 1=green 2=blue 3=black; screen 4x4, bg index 0.
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0])
    full_red = img_block(0, 0, 4, 4, [0] * 16)
    # 2x2 green patch at (1,1) whose top-left pixel is TRANSPARENT
    # (index 3 marked transparent): that pixel keeps the red below.
    patch = img_block(1, 1, 2, 2, [3, 1, 1, 1])

    raw2 = hdr + pal + gce(1) + full_red + gce(2, transparent=3) + patch
    raw2 += gce(1) + img_block(0, 0, 1, 1, [2]) + b"\x3b"
    frames = decode_gif_frames(raw2)
    assert len(frames) == 3
    red, green = np.array([255, 0, 0]), np.array([0, 255, 0])
    assert (frames[0] == red).all()
    assert (frames[1][1, 1] == red).all()        # transparent hole
    assert (frames[1][1, 2] == green).all()      # painted pixel
    assert (frames[1][2, 1] == green).all()
    # disposal=2 restored the patch region to bg before frame 3.
    assert (frames[2][1, 2] == red).all()
    assert (frames[2][0, 0] == np.array([0, 0, 255])).all()

    # disposal=3: frame 2's region must revert to frame 1's pixels
    # (no transparency here, so index 3 paints BLACK in frame 2).
    raw3 = hdr + pal + gce(1) + full_red + gce(3) + patch
    raw3 += gce(1) + img_block(0, 0, 1, 1, [2]) + b"\x3b"
    f3 = decode_gif_frames(raw3)
    assert (f3[1][1, 1] == np.array([0, 0, 0])).all()
    assert (f3[1][1, 2] == green).all()
    assert (f3[2][1, 1] == red).all()
    assert (f3[2][1, 2] == red).all()


def test_gif_frames_rejects_out_of_bounds_and_garbage():
    from datapoints_csv_extractor_spark.operators.gifcodec import (
        decode_gif_frames,
    )

    assert decode_gif_frames(b"not a gif") is None
    assert decode_gif_frames(b"GIF89a\x00") is None
    # Sub-image overruns the logical screen -> parse-or-NULL.
    import struct

    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    pal = bytes([0, 0, 0, 255, 255, 255])
    bad = hdr + pal + b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    assert decode_gif_frames(bad + b"\x02\x00\x3b") is None


def test_video_near_dup_recovers_exactly_planted_twins(spark):
    from datapoints_csv_extractor_spark.operators.multimodal import (
        q_video_near_dup,
    )

    rows = q_video_near_dup(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected planted twins in testdata"
    expected = sorted(
        did for did in range(0, 500, 4) if did % 17 == 0
    )
    assert sorted(r.a_id for r in rows) == expected
    for r in rows:
        assert r.b_id == r.a_id + 10_000_000
        assert r.offset == 2          # twin dropped 2 leading frames
        assert r.best_offset_votes == 6
        assert r.n_anchors == 6


def test_video_near_dup_hot_band_cap_drops_shared_title_card(spark):
    """Every video sharing one identical frame (a title card) must
    NOT pairwise-match through it: the hot-band cap removes the
    shared frame's bands before the join, and offset votes from a
    single frame stay under min_votes anyway."""
    import numpy as np
    import pandas as pd

    from datapoints_csv_extractor_spark.operators.gifcodec import (
        encode_gif_frames,
    )
    from datapoints_csv_extractor_spark.operators.multimodal import (
        video_frame_dhashes,
        video_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    title = (rng.randint(0, 4, (16, 16, 1)) * 80).astype(np.uint8).repeat(3, 2)
    payloads = []
    for i in range(60):
        r = np.random.RandomState(100 + i)
        body = [
            (r.randint(0, 4, (16, 16, 1)) * 80).astype(np.uint8).repeat(3, 2)
            for _ in range(5)
        ]
        payloads.append((i, encode_gif_frames([title] + body)))
    blobs = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["blob_id", "payload"])
    )
    out = video_near_dup_pairs(
        video_frame_dhashes(blobs), max_band_df=50
    ).collect()
    assert out == []


def test_thumbnail_match_recovers_planted_stills(spark):
    """Every planted still (frame 3 of every 13th video-doc) is
    matched to its own video at frame 3; any EXTRA match must come
    from a pair of documents with identical text (the corpus's real
    exact-dups produce identical footage — true positives)."""
    from datapoints_csv_extractor_spark.operators.multimodal import (
        q_thumbnail_match,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_thumbnail_match(spark, sf).collect()
    assert rows
    planted = {
        did for did in range(0, 500, 4) if did % 13 == 0
    }
    got_self = {
        r.image_id - 10_000_000
        for r in rows
        if r.video_id == r.image_id - 10_000_000
    }
    assert got_self == planted
    assert all(r.frame_idx == 3 for r in rows)
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        src = r.image_id - 10_000_000
        if r.video_id != src:
            assert texts[r.video_id] == texts[src]


def test_video_keyframes_find_planted_shot_boundaries(spark, tmp_path):
    # 9-frame animations with 3 shots of 3 identical frames each:
    # within-shot Hamming is 0, shot changes are large. Keyframes must
    # be exactly frames {0, 3, 6} and shot ids 0/1/2.
    import pandas as pd

    docs = spark.createDataFrame(
        [(0, "alpha doc"), (4, "beta doc")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from datapoints_csv_extractor_spark.operators.multimodal import (
        q_video_keyframes,
    )

    rows = q_video_keyframes(spark, str(tmp_path)).collect()
    assert {r.blob_id for r in rows} == {0, 4}
    for bid in (0, 4):
        vid = [r for r in rows if r.blob_id == bid]
        assert [r.frame_idx for r in vid] == list(range(9))
        keys = [r.frame_idx for r in vid if r.is_keyframe]
        assert keys == [0, 3, 6], keys
        assert [r.shot_id for r in vid] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
        # within-shot hamming exactly 0, boundaries far apart
        for r in vid:
            if r.frame_idx in (1, 2, 4, 5, 7, 8):
                assert r.hamming_prev == 0
            elif r.frame_idx in (3, 6):
                assert r.hamming_prev > 16


def test_audio_segments_trim_planted_silence(spark, tmp_path):
    # tone(0.3s) | silence(0.3s) | tone(0.3s) at 8 kHz must yield
    # exactly two active segments with ~[0,300) and ~[600,900) ms
    # bounds; a 40 ms pause INSIDE speech (shorter than the gap
    # closer) must NOT split a segment.
    import numpy as np

    from datapoints_csv_extractor_spark.operators.multimodal import (
        audio_segments,
        q_audio_segments,
    )

    docs = spark.createDataFrame(
        [(0, "alpha"), (5, "beta")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = q_audio_segments(spark, str(tmp_path)).collect()
    for bid in (0, 5):
        segs = [r for r in rows if r.blob_id == bid]
        assert [r.seg_idx for r in segs] == [0, 1]
        assert segs[0].start_ms == 0 and abs(segs[0].end_ms - 300) <= 20
        assert abs(segs[1].start_ms - 600) <= 20
        assert abs(segs[1].end_ms - 900) <= 20
        assert segs[0].mean_rms > 0.2

    # gap-closing: 40 ms dip inside speech stays one segment
    import struct

    rate = 8000
    t = np.arange(int(0.2 * rate)) / rate
    x = np.concatenate([
        0.5 * np.sin(2 * np.pi * 500 * t),
        np.zeros(int(0.04 * rate)),
        0.5 * np.sin(2 * np.pi * 500 * t),
    ])
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    blob = spark.createDataFrame(
        [(7, bytearray(hdr + pcm))], "blob_id long, payload binary"
    )
    segs = audio_segments(blob, min_gap_frames=3).collect()
    assert len(segs) == 1 and segs[0].start_ms == 0
