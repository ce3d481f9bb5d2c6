"""Pure-stdlib+numpy baseline JPEG codec (public file-format
knowledge: ITU-T T.81 / ISO 10918-1).

Closes the engine's biggest multimodal stand-in: real corpora are
mostly JPEG, and until round 8 sample-level decode was real only for
PNG and PCM WAV — JPEG pixels needed PIL, which this container does
not ship. ``decode_jpeg`` is a baseline-sequential (SOF0) decoder:
marker walk, DQT/DHT table parse, Huffman entropy decode with
byte-unstuffing and RSTn restart handling, dequantize + dezigzag,
vectorized numpy IDCT per 8x8 block, chroma upsampling for the
common sampling layouts (4:4:4, 4:2:2, 4:2:0), and YCbCr->RGB.
``encode_jpeg`` is its inverse for making valid test/round-trip
payloads without a media library: 4:4:4, quality-scaled Annex-K
quantization tables, the Annex-K "typical" Huffman tables, byte
stuffing. Both ends exchange tables THROUGH the bitstream (DQT/DHT
segments), so round-trip correctness never depends on table choice.

Out of scope (returns None rather than guessing): progressive
(SOF2), arithmetic coding, 12-bit precision, hierarchical, CMYK and
other >3-component color — the documented stand-in boundary narrows
to "non-baseline JPEG", matching the PNG decoder's "8-bit
non-interlaced" boundary.

Scale: the decoder is called from Arrow-batched ``mapInPandas``
workers (multimodal.py), one image per call — per-image Python cost,
never per-pixel driver work; the heavy loops (IDCT, upsample, color
transform) are numpy matrix ops.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: index i of the scan holds block position
# (ZIGZAG_ROW[i], ZIGZAG_COL[i]).
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZZ = np.argsort(_ZZ)

# Orthonormal 8-point DCT-II basis: T[k, n] = 0.5*c(k)*cos((2n+1)k pi/16).
# DCT = T @ X @ T.T ; IDCT = T.T @ X @ T (exact inverse pair).
_T8 = np.array(
    [
        [
            0.5 * (1 / np.sqrt(2) if k == 0 else 1.0)
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# Annex-K (K.1/K.2) base quantization tables, row-major.
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex-K "typical" Huffman tables: (counts per code length 1..16,
# symbol list). Validity (sum(counts) == len(symbols), canonical
# codes fit) is asserted at import; the bitstream carries the tables,
# so decode correctness does not depend on these matching any other
# implementation byte-for-byte.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

for _counts, _syms in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_counts) == len(_syms), "huffman table counts/symbols disagree"


def _canonical_codes(counts: list[int], symbols: list[int]):
    """(symbol -> (code, length)) for a canonical Huffman table built
    the T.81 C.2 way: codes of each length are consecutive, starting
    from 2x the previous length's end."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(counts: list[int], symbols: list[int]):
    """((length, code) -> symbol) lookup for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(counts, symbols).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with JPEG byte
    unstuffing (FF 00 -> literal FF) and restart-marker awareness:
    hitting FF D0-D7 stops the stream until ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.at_marker = False

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                self.at_marker = True
                return False
            else:  # EOI or next segment: scan data over
                self.at_marker = True
                return False
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            # Past the end: T.81 allows the final byte's pad bits to
            # be consumed as 1s.
            return 1
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte."""
        self.buf = 0
        self.nbits = 0
        self.at_marker = False
        d = self.data
        # Skip fill bytes (FF) then the marker code byte.
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF:
            code = d[self.pos + 1]
            self.pos += 2
            if 0xD0 <= code <= 0xD7:
                return
        raise ValueError("expected restart marker")


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(raw: bytes):
    """Decode baseline-sequential JPEG bytes to an (h, w, channels)
    uint8 array (channels 1 for grayscale, 3 for YCbCr->RGB), or
    None for anything outside the baseline subset (progressive,
    arithmetic, 12-bit, >3 components) or for malformed input —
    parse-or-NULL, matching every other decoder in multimodal.py."""
    try:
        return _decode_jpeg_strict(raw)
    except Exception:  # noqa: BLE001 — corrupt input is data, not a bug
        return None


def _decode_jpeg_strict(raw: bytes):
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (precision, h, w, components)
    restart_interval = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            return None
        (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        body = raw[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        body[off : off + 64], dtype=np.uint8
                    ).astype(np.int32)
                    off += 64
                else:
                    tbl = np.frombuffer(
                        body[off : off + 128], dtype=">u2"
                    ).astype(np.int32)
                    off += 128
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                syms = list(body[off + 17 : off + 17 + n])
                off += 17 + n
                tbl = _decode_table(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            precision = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if precision != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for i in range(ncomp):
                cid = body[6 + i * 3]
                hv = body[7 + i * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF,
                     "tq": body[8 + i * 3]}
                )
            frame = (precision, h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[0:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for i in range(ns):
                cs = body[1 + i * 2]
                tdta = body[2 + i * 2]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                raw, pos, frame, quant, huff_dc, huff_ac, scan,
                restart_interval,
            )
        # else: APPn / COM / DNL — skip
    return None


def _decode_scan(
    raw, pos, frame, quant, huff_dc, huff_ac, scan, restart_interval
):
    _, h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            return None
        order.append((c, huff_dc.get(td), huff_ac.get(ta)))
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(raw, pos)
    preds = [0] * len(comps)
    idx = {c["id"]: i for i, c in enumerate(comps)}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for c, dtab, atab in order:
                ci = idx[c["id"]]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dtab)
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, atab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = (coefs * q)[_UNZZ].reshape(8, 8)
                        px = _T8.T @ block @ _T8 + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality->scaling mapping (quality 50 = base
    tables; 1 = coarsest; 100 = all-ones)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred: int) -> int:
    coefs = np.round(block / q).astype(np.int64)[_ZZ]
    dc = int(coefs[0])
    diff = dc - pred
    mag = abs(diff)
    size = mag.bit_length()
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(coefs[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        mag = abs(v)
        size = mag.bit_length()
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(px, quality: int = 90) -> bytes:
    """Encode an (h, w, c) uint8 array (c in {1, 2, 3, 4}; alpha /
    second-channel dropped) as baseline JFIF JPEG, 4:4:4, quality-
    scaled Annex-K quant tables, Annex-K typical Huffman tables.
    Deterministic; exists so pipelines can MAKE valid JPEG payloads
    (and the decoder's tests can round-trip) without a media
    library."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c == 2:
        px = px[:, :, :1]
    elif c == 4:
        px = px[:, :, :3]
    c = px.shape[2]
    f = px.astype(np.float64)
    if c == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [f[:, :, 0]]
    qy = _quality_scaled(_QUANT_LUMA, quality)
    qc = _quality_scaled(_QUANT_CHROMA, quality)
    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # no density, no thumbnail
    for tq, tbl in ((0, qy), (1, qc))[: 1 if c == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[z]) for z in _ZZ)
    ncomp = 1 if c == 1 else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass, (counts, syms) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms))
        out += bytes([tclass]) + bytes(counts) + bytes(syms)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    pad_h = (-h) % 8
    pad_w = (-w) % 8
    bw = _BitWriter()
    preds = [0] * ncomp
    padded = [
        np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge") - 128.0
        for p in planes
    ]
    for by in range((h + pad_h) // 8):
        for bx in range((w + pad_w) // 8):
            for ci in range(ncomp):
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dct = (_T8 @ blk @ _T8.T).reshape(-1)
                q = qy if ci == 0 else qc
                dc_codes = dc_y if ci == 0 else dc_c
                ac_codes = ac_y if ci == 0 else ac_c
                preds[ci] = _encode_block(
                    bw, dct, q, dc_codes, ac_codes, preds[ci]
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
