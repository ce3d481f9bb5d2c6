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
