"""GIF87a/89a codec in pure stdlib + numpy (LZW + palette).

With ``functions/jpeg.py`` and the PNG codec this makes every common
crawled *image* format real in ``multimodal.decode_backend``; the only
remaining stubs are video containers (MP4) that genuinely need an
external demuxer.

Decoder scope (``decode_gif``): 87a and 89a, global and local color
tables, interlaced and non-interlaced frames, variable-width LSB-first
LZW with CLEAR/END handling and the deferred-clear (full-dictionary)
case. Returns the FIRST frame composited onto the logical screen as
(h, w, 3) uint8 RGB — the thumbnail/feature path this backend serves;
animation frames beyond the first are metadata for
``sample_video_frames``-style ops, not pixel sources here.

Encoder scope (``encode_gif``): roundtrip-test support (the
``encode_png``/``encode_jpeg`` pattern). Palettizes an RGB or gray
image (<= 256 distinct colors required) and emits real variable-width
LZW compression with dictionary growth and CLEAR-on-full — exercising
exactly the decoder paths a real crawled GIF hits.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first GIF LZW -> palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary: code -> byte string of indices
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    buf = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the first frame (see module
    docstring for scope)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed, bg = payload[10], payload[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    # logical screen starts as the background color (or black without a GCT)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    while i < len(payload):
        block = payload[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
        ipacked = payload[i + 9]
        i += 10
        ct = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[i]
        i += 1
        data = bytearray()
        while payload[i] != 0:
            n = payload[i]
            data += payload[i + 1 : i + 1 + n]
            i += 1 + n
        i += 1
        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            # rows[y] = index (in arrival order) of display row y
            rows = np.empty(h, dtype=np.int64)
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y] = r
                    r += 1
            frame = idx.reshape(h, w)[rows]
        else:
            frame = idx.reshape(h, w)
        rgb = ct[np.clip(frame, 0, len(ct) - 1)]
        canvas[top : top + h, left : left + w] = rgb
        return canvas  # first frame only
    raise ValueError("GIF contained no image data")


# --- encoder (roundtrip-test support) -------------------------------------


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real variable-width GIF LZW with dictionary growth and
    CLEAR-on-full — the compression a crawled GIF actually uses."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for v in indices.astype(np.uint8).tobytes():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            # GIF width grows AFTER the code that fills the current range
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB with <= 256 distinct colors
    -> single-frame GIF89a. Roundtrip-test encoder."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif needs <= 256 distinct colors, got {len(colors)}")
    # color table size must be a power of two >= 2
    bits = max(1, int(len(colors) - 1).bit_length())
    n = 1 << bits
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    indices = inverse.reshape(h, w).astype(np.uint8)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        stream = indices[order].reshape(-1)
    else:
        stream = indices.reshape(-1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += palette.tobytes()
    # a graphic control extension, so the decoder's skip path is exercised
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    data = _lzw_encode(min_code_size, stream)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
