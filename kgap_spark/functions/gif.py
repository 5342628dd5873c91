"""Pure-stdlib GIF87a/GIF89a decoder (first frame → RGB).

Same role and honest ceiling as the sibling PNG decoder
(``multimodal.decode_png``) and baseline JPEG decoder (``jpeg.py``):
correctness-first reference decode for the multimodal feature path —
a PIL-backed decoder slots in at the same seam in a full deployment.
Implements the GIF89a specification directly (logical screen
descriptor, global/local color tables, variable-width LSB-first LZW
per Appendix F, interlace pass reordering per Appendix E, extension
block skipping with GCE transparency); raises ValueError loudly on
anything malformed instead of guessing.

Reference parity note: the reference stack ships no decoder at all
(media handling delegated to external services); this module exists
for the training-data pipeline extension (SURVEY.md multimodal rows).
"""

from __future__ import annotations

import struct

_MAX_DIM = 16384
_MAX_PIXELS = 64 * 1024 * 1024


def _color_table(data: bytes, pos: int, flag: int, size_bits: int):
    """A color table of 2^(size_bits+1) RGB entries, if flagged."""
    if not flag:
        return None, pos
    n = 2 << size_bits
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("GIF: truncated color table")
    return data[pos:end], end


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks (length-prefixed, 0-terminated)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF: truncated sub-block")
        out += data[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW (Appendix F): codes packed LSB-first, widths
    grow from min_code_size+1 up to 12 bits, CLEAR resets the table,
    EOI ends the stream. Stops exactly at n_pixels (trailing garbage
    after enough pixels is tolerated, as real-world encoders pad)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table() -> list[bytes]:
        return [bytes((i,)) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = fresh_table()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise ValueError("GIF: LZW ended before raster complete")
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF: LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    raise ValueError("GIF: LZW data exhausted before raster complete")


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    """Reorder interlaced rows (Appendix E: passes start at rows
    0/4/2/1 with steps 8/8/4/2)."""
    out = bytearray(len(idx))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y * w:(y + 1) * w] = idx[src * w:(src + 1) * w]
            src += 1
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """GIF → ``(width, height, 3, rgb_bytes)`` of the FIRST image
    frame, row-major (animation frames beyond the first are ignored —
    the feature extractor pools one frame; frame-sampling plans handle
    the rest). Raises ValueError on malformed input."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    _sw, _sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    gct, pos = _color_table(data, 13, packed & 0x80, packed & 0x07)
    transparent = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4 and (body[0] & 1):
                transparent = body[3]  # GCE transparency index
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("GIF: truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB",
                                                   data[pos:pos + 9])
        pos += 9
        if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM
                and w * h <= _MAX_PIXELS):
            raise ValueError(f"GIF dimensions out of range ({w}x{h})")
        lct, pos = _color_table(data, pos, ipacked & 0x80, ipacked & 0x07)
        table = lct or gct
        if table is None:
            raise ValueError("GIF: no color table for image")
        if pos >= len(data):
            raise ValueError("GIF: missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        n_colors = len(table) // 3
        rgb = bytearray(3 * w * h)
        for i, c in enumerate(idx[:w * h]):
            if c >= n_colors:
                raise ValueError(f"GIF: pixel index {c} outside "
                                 f"{n_colors}-color table")
            if c == transparent:
                continue  # composited over black
            rgb[3 * i:3 * i + 3] = table[3 * c:3 * c + 3]
        return w, h, 3, bytes(rgb)
    raise ValueError("GIF: no image data")
