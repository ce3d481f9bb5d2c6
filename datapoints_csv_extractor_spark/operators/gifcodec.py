"""Pure-stdlib+numpy GIF codec (public file-format knowledge:
GIF87a/GIF89a specification, CompuServe 1987/1989).

Completes the classic-image-format trio: with PNG (zlib inflate +
unfilter, multimodal.py) and baseline JPEG (jpegcodec.py) already
decoding real samples, GIF was the remaining header-only format.
``decode_gif`` decodes the FIRST image frame: logical screen + global
color table parse, extension-block walk (graphic-control transparency
honored by substituting the background color), local color table
override, variable-code-width LZW decompression with clear/EOI
handling, interlace de-weaving (the 8/8/4/2 pass scheme), and palette
expansion to an (h, w, 3) uint8 RGB array. ``encode_gif`` is the
matching single-frame GIF89a writer (octree-free: palette built from
the image's distinct colors, <= 256 required) so tests and pipelines
can make valid payloads with no media library; both ends speak
through the bitstream only.

``decode_gif_frames`` / ``encode_gif_frames`` extend the codec to
ANIMATION (GIF89a): the frame walk honors each frame's Graphic
Control Extension — per-frame transparency, disposal methods 0/1
(leave), 2 (restore background), 3 (restore previous) — and
composites sub-rectangle frames onto the logical-screen canvas, so
every returned frame is the full rendered canvas at that point of
the animation, which is what a perceptual hash must see.

Out of scope (None, never a guess): images whose pixel data
overruns the declared dimensions, and palettes the stream does not
carry. Corrupt input is data, not a bug: parse-or-NULL like every
decoder in multimodal.py.

Scale: called per blob from Arrow-batched ``mapInPandas`` workers;
the LZW inner loop is per-CODE Python (codes ~ pixels/2 typical) with
numpy doing palette gather, de-interlace, and RGB expansion.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_color_table(raw: bytes, off: int, n: int):
    end = off + 3 * n
    if end > len(raw):
        return None, off
    tbl = np.frombuffer(raw[off:end], dtype=np.uint8).reshape(n, 3)
    return tbl, end


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """Variable-width LZW (GIF flavor): codes start at
    min_code_size+1 bits, dictionary grows to 4095, CLEAR resets,
    EOI terminates. Returns the index stream as a list of ints."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # Bit reader: GIF packs codes LSB-first.
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dict_next = eoi + 1
    table: dict[int, bytes] = {
        i: bytes([i]) for i in range(clear)
    }
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # stream ended without EOI: keep decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            dict_next = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == dict_next:
            entry = prev + prev[:1]
        else:
            raise ValueError("invalid LZW code")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output overruns image")
        if prev is not None and dict_next < 4096:
            table[dict_next] = prev + entry[:1]
            dict_next += 1
            if dict_next == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(raw: bytes):
    """Decode the first frame of a GIF87a/89a stream to an (h, w, 3)
    uint8 RGB array, or None for non-GIF / malformed input."""
    try:
        return _decode_gif_strict(raw)
    except Exception:  # noqa: BLE001 — corrupt input is data, not a bug
        return None


def _decode_gif_strict(raw: bytes):
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, bg_index, _ = struct.unpack("<HHBBB", raw[6:13])
    off = 13
    global_tbl = None
    if packed & 0x80:
        global_tbl, off = _read_color_table(
            raw, off, 2 << (packed & 0x07)
        )
        if global_tbl is None:
            return None
    transparent = None
    while off < len(raw):
        b = raw[off]
        if b == 0x3B:  # trailer before any image
            return None
        if b == 0x21:  # extension
            if off + 2 > len(raw):
                return None
            label = raw[off + 1]
            off += 2
            # Graphic Control Extension carries the transparency flag.
            if label == 0xF9 and off < len(raw) and raw[off] == 4:
                flags = raw[off + 1]
                if flags & 0x01:
                    transparent = raw[off + 4]
            # Skip sub-blocks.
            while off < len(raw) and raw[off] != 0:
                off += 1 + raw[off]
            off += 1  # block terminator
            continue
        if b == 0x2C:  # image descriptor
            if off + 10 > len(raw):
                return None
            ix, iy, iw, ih, ipacked = struct.unpack(
                "<HHHHB", raw[off + 1 : off + 10]
            )
            off += 10
            tbl = global_tbl
            if ipacked & 0x80:
                tbl, off = _read_color_table(
                    raw, off, 2 << (ipacked & 0x07)
                )
            if tbl is None or iw == 0 or ih == 0:
                return None
            if off >= len(raw):
                return None
            min_code = raw[off]
            off += 1
            if not (2 <= min_code <= 11):
                return None
            data = bytearray()
            while off < len(raw) and raw[off] != 0:
                n = raw[off]
                data += raw[off + 1 : off + 1 + n]
                off += 1 + n
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if len(idx) < iw * ih:
                return None
            grid = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: de-weave the 4 passes
                woven = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        woven[r] = grid[src]
                        src += 1
                grid = woven
            if int(grid.max()) >= len(tbl):
                return None
            if transparent is not None and transparent < len(tbl):
                # No alpha channel in the RGB contract: transparent
                # pixels show the background color (the single-frame
                # compositing rule).
                bg = (
                    bg_index
                    if global_tbl is not None and bg_index < len(global_tbl)
                    else 0
                )
                grid = np.where(grid == transparent, bg, grid)
            return tbl[grid]
        return None  # unknown block
    return None


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    dict_next = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for i in indices:
        nxt = prev + bytes([i])
        if nxt in table:
            prev = nxt
            continue
        emit(table[prev])
        if dict_next < 4096:
            table[nxt] = dict_next
            # GIF width bump happens when the NEXT code to assign
            # no longer fits (encoder mirrors the decoder's rule).
            if dict_next == (1 << code_size) and code_size < 12:
                code_size += 1
            dict_next += 1
        else:
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            dict_next = eoi + 1
            code_size = min_code_size + 1
        prev = bytes([i])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) / (h, w, 1)
    grayscale) as a single-frame non-interlaced GIF89a. The palette
    is the image's distinct colors — must be <= 256 (raises
    otherwise); quantization belongs to a real image library, not
    this test-payload writer."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif palette overflow (>256 colors)")
    # Palette size: power of two >= max(len, 2).
    depth = 1
    while (1 << depth) < max(len(colors), 2):
        depth += 1
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(depth, 2)
    out.append(min_code)
    lzw = _lzw_encode(inverse.astype(np.int32).tolist(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


_MAX_CANVAS_PIXELS = 1 << 22          # 4 Mpx logical screen
_MAX_ANIMATION_PIXELS = 1 << 26       # 64 Mpx across all frames


def decode_gif_frames(raw: bytes):
    """Decode a GIF87a/89a stream to the list of RENDERED frames —
    each an (sh, sw, 3) uint8 RGB snapshot of the logical-screen
    canvas after compositing that frame (GCE transparency + disposal
    honored). None for non-GIF / malformed input."""
    try:
        return _decode_gif_frames_strict(raw)
    except Exception:  # noqa: BLE001 — corrupt input is data, not a bug
        return None


def _decode_gif_frames_strict(raw: bytes):
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, bg_index, _ = struct.unpack("<HHBBB", raw[6:13])
    if sw == 0 or sh == 0 or sw * sh > _MAX_CANVAS_PIXELS:
        return None
    off = 13
    global_tbl = None
    if packed & 0x80:
        global_tbl, off = _read_color_table(raw, off, 2 << (packed & 0x07))
        if global_tbl is None:
            return None
    bg_rgb = (
        global_tbl[bg_index]
        if global_tbl is not None and bg_index < len(global_tbl)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    budget = _MAX_ANIMATION_PIXELS
    transparent = None
    disposal = 0
    while off < len(raw):
        b = raw[off]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if off + 2 > len(raw):
                return None
            label = raw[off + 1]
            off += 2
            if label == 0xF9 and off < len(raw) and raw[off] == 4:
                flags = raw[off + 1]
                disposal = (flags >> 2) & 0x07
                transparent = raw[off + 4] if flags & 0x01 else None
            while off < len(raw) and raw[off] != 0:
                off += 1 + raw[off]
            off += 1
            continue
        if b == 0x2C:  # image descriptor
            if off + 10 > len(raw):
                return None
            ix, iy, iw, ih, ipacked = struct.unpack(
                "<HHHHB", raw[off + 1 : off + 10]
            )
            off += 10
            if iw == 0 or ih == 0 or ix + iw > sw or iy + ih > sh:
                return None
            tbl = global_tbl
            if ipacked & 0x80:
                tbl, off = _read_color_table(raw, off, 2 << (ipacked & 0x07))
            if tbl is None or off >= len(raw):
                return None
            min_code = raw[off]
            off += 1
            if not (2 <= min_code <= 11):
                return None
            data = bytearray()
            while off < len(raw) and raw[off] != 0:
                n = raw[off]
                data += raw[off + 1 : off + 1 + n]
                off += 1 + n
            off += 1  # sub-block terminator
            budget -= iw * ih
            if budget < 0:
                return None
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if len(idx) < iw * ih:
                return None
            grid = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: de-weave the 4 passes
                woven = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for r in range(start, ih, step):
                        woven[r] = grid[src]
                        src += 1
                grid = woven
            if int(grid.max()) >= len(tbl):
                return None
            region = canvas[iy : iy + ih, ix : ix + iw]
            before = region.copy() if disposal == 3 else None
            rgb = tbl[grid]
            if transparent is not None:
                mask = grid != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                region[:, :] = bg_rgb
            elif disposal == 3:
                region[:, :] = before
            transparent = None
            disposal = 0
            continue
        return None  # unknown block
    return frames or None


def encode_gif_frames(frames, delay_cs: int = 4) -> bytes:
    """Encode a sequence of same-shape (h, w, 3) uint8 RGB arrays as
    an animated GIF89a: one GLOBAL palette over the union of colors
    (<= 256 required — this is a test-payload writer, quantization
    belongs to a real image library), full-screen frames, disposal 1
    (leave), NETSCAPE2.0 loop extension."""
    mats = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not mats:
        raise ValueError("encode_gif_frames: no frames")
    for i, m in enumerate(mats):
        if m.ndim == 2:
            mats[i] = np.repeat(m[:, :, None], 3, axis=2)
    h, w, _ = mats[0].shape
    if any(m.shape != (h, w, 3) for m in mats):
        raise ValueError("encode_gif_frames: frames must share one shape")
    stacked = np.concatenate([m.reshape(-1, 3) for m in mats])
    colors, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif_frames palette overflow (>256 colors)")
    depth = 1
    while (1 << depth) < max(len(colors), 2):
        depth += 1
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop forever.
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(depth, 2)
    per = h * w
    for i, _ in enumerate(mats):
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"  # disposal 1, no transparency
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(
            inverse[i * per : (i + 1) * per].astype(np.int32).tolist(),
            min_code,
        )
        for j in range(0, len(lzw), 255):
            chunk = lzw[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
