"""Pure-stdlib+numpy WebP VP8L (lossless) decoder.

Same role and honest ceiling as the sibling PNG/JPEG/GIF decoders:
correctness-first reference decode for the multimodal feature path —
a PIL/libwebp-backed decoder slots in at the same seam in a full
deployment. Implements the public "WebP Lossless Bitstream
Specification" directly: RIFF container walk (VP8X-aware), LSB-first
bit reading, canonical prefix codes (simple 1/2-symbol and normal
codes via the 19-symbol code-length code with 16/17/18 repeats),
LZ77 backward references with the 120-entry 2D distance map and
direct distances, color cache (0x1e35a7bd multiplier hash), meta
prefix-code groups, and all four transforms applied in reverse read
order (predictor modes 0-13, cross-color with 3.5 fixed-point
deltas, subtract-green, color-indexing with sub-byte pixel
bundling). Raises ValueError loudly on malformed or over/under-
subscribed codes instead of guessing; lossy VP8 raises
NotImplementedError (that codec is env-limited here).

Verification note: round-trip tested against a from-scratch test-side
encoder (tests/test_functions.py) covering literals, simple and
normal codes, color cache, LZ77 runs, and each transform; the fixed
spec tables (distance map, predictor tie-breaks, truncating /2 in
ClampAddSubtractHalf) follow the spec text and cannot be
cross-checked against libwebp inside this container.

Reference parity note: the reference stack ships no decoder at all
(media handling delegated to external services); this module exists
for the training-data pipeline extension (SURVEY.md multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_DIM = 16384
_MAX_PIXELS = 64 * 1024 * 1024

# Code-length-code symbol order (spec §"Decoding the Code Lengths").
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry (dx, dy) neighborhood map for distance codes 1..120
# (spec §"Decoding of Distances"); dx > 0 means to the LEFT of the
# current pixel, so distance = dy * width + dx in scan order.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (3, 8), (-3, 8), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (4, 8), (-4, 8), (8, 5), (5, 8), (-5, 8),
)


class _BitReader:
    """LSB-first bit reader over the VP8L stream."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("VP8L: truncated bitstream")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _Huff:
    """Canonical prefix code: codes assigned in (length, symbol)
    order, decoded MSB-first one stream bit at a time. A code with a
    single used symbol consumes zero bits. Multi-symbol codes must be
    exactly complete (Kraft sum == 1) — over- or under-subscribed
    lengths are a bitstream error."""

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][1]
            return
        self.single = None
        used.sort()
        kraft = 0
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = used[0][0]
        for length, sym in used:
            code <<= length - prev_len
            prev_len = length
            self.table[(length, code)] = sym
            code += 1
            kraft += 1 << (15 - length) if length <= 15 else 0
        if prev_len > 15 or kraft != 1 << 15:
            raise ValueError("VP8L: invalid prefix code lengths")
        self.max_len = prev_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_code(br: _BitReader, alphabet_size: int) -> _Huff:
    """One prefix code: simple (1-2 symbols) or normal (code-length
    code over 19 symbols, then lengths with 16/17/18 repeats)."""
    lengths = [0] * alphabet_size
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        sym0 = br.read(8) if br.read_bit() else br.read_bit()
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("VP8L: bad simple-code symbol pair")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _Huff(lengths)
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huff(clc_lengths)
    if br.read_bit():  # explicit count of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L: max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        else:
            if sym == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif sym == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if i + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[i] = fill
                i += 1
    return _Huff(lengths)


def _prefix_value(prefix: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode (spec §"LZ77 Backward
    Reference"): small prefixes are literal, larger carry extra bits."""
    if prefix < 4:
        return prefix + 1
    extra_bits = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, is_main: bool = False
) -> list[int]:
    """One spatially-coded image as flat ARGB ints (scan order).
    Sub-images (transform data, palette, meta image) pass
    is_main=False: they may use a color cache but never meta prefix
    groups."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: bad color-cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        meta_img = _decode_entropy_image(
            br, _subsample(w, meta_bits), _subsample(h, meta_bits))
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        num_groups = max(meta) + 1
    cache_syms = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_code(br, 256 + 24 + cache_syms),
            _read_code(br, 256), _read_code(br, 256), _read_code(br, 256),
            _read_code(br, 40),
        ))
    meta_w = _subsample(w, meta_bits) if meta else 0
    n = w * h
    pixels = [0] * n
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            group = groups[0]
        g = group[0].read(br)
        if g < 256:  # literal: G then R, B, A in stream order
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif g < 280:  # LZ77 backward reference
            length = _prefix_value(g - 256, br)
            dist_code = _prefix_value(group[4].read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            pixels[pos] = cache[g - 280]
            pos += 1
    return pixels


def _read_transform(br: _BitReader, w: int, h: int):
    """One transform header+data; returns (transform, new_width) —
    only COLOR_INDEXING with sub-byte bundling changes the width of
    everything read after it."""
    ttype = br.read(2)
    if ttype in (0, 1):  # PREDICTOR / CROSS-COLOR: block-grid sub-image
        bits = br.read(3) + 2
        data = _decode_entropy_image(
            br, _subsample(w, bits), _subsample(h, bits))
        return (ttype, bits, data, w), w
    if ttype == 2:  # SUBTRACT-GREEN: no data
        return (2, 0, None, w), w
    n_colors = br.read(8) + 1  # COLOR_INDEXING
    palette = _decode_entropy_image(br, n_colors, 1)
    for i in range(1, n_colors):  # palette entries are delta-coded
        prev, cur = palette[i - 1], palette[i]
        palette[i] = (
            (((cur >> 24) + (prev >> 24)) & 0xFF) << 24
            | ((((cur >> 16) + (prev >> 16)) & 0xFF) << 16)
            | ((((cur >> 8) + (prev >> 8)) & 0xFF) << 8)
            | ((cur + prev) & 0xFF))
    width_bits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else \
        1 if n_colors <= 16 else 0
    return (3, width_bits, palette, w), _subsample(w, width_bits)


def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)>>1 without carries across channels."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) >> 1
        d = a - ((tl >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C-style trunc toward 0
        out |= max(0, min(255, a + half)) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    """Predictor 11: the estimate p = L+T-TL is closer to L iff
    sum|T_c - TL_c| < sum|L_c - TL_c| (the |p-L| terms telescope)."""
    p_l = p_t = 0
    for sh in (0, 8, 16, 24):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        p_l += abs(tc - tlc)
        p_t += abs(lc - tlc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _add_mod(a: int, b: int) -> int:
    """Per-channel (a+b) mod 256."""
    return ((((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
            | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF))


def _inv_predictor(pixels: list[int], w: int, h: int, bits: int,
                   data: list[int]) -> None:
    """In-place inverse predictor. Borders per the reference layout:
    (0,0) predicts 0xff000000, top row predicts L, left column
    predicts T; top-right of the last column addresses flat[pos-w+1],
    i.e. the first (already decoded) pixel of the current row."""
    grid_w = _subsample(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pixels[pos - 1]
        elif x == 0:
            pred = pixels[pos - w]
        else:
            mode = (data[(y >> bits) * grid_w + (x >> bits)] >> 8) & 0xFF
            pred = _predict(mode, pixels[pos - 1], pixels[pos - w],
                            pixels[pos - w + 1], pixels[pos - w - 1])
        pixels[pos] = _add_mod(pixels[pos], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(pixels: list[int], w: int, h: int, bits: int,
                         data: list[int]) -> None:
    """In-place inverse cross-color: per-block ColorTransformElement
    (g2r in blue, g2b in green, r2b in red) as signed 3.5 fixed-point
    multipliers (delta = (int8(t)*int8(c)) >> 5, arithmetic shift)."""
    grid_w = _subsample(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = data[(y >> bits) * grid_w + (x >> bits)]
        g2r, g2b, r2b = _s8(cte & 0xFF), _s8((cte >> 8) & 0xFF), \
            _s8((cte >> 16) & 0xFF)
        px = pixels[pos]
        green = _s8((px >> 8) & 0xFF)
        red = (((px >> 16) & 0xFF) + ((g2r * green) >> 5)) & 0xFF
        blue = ((px & 0xFF) + ((g2b * green) >> 5)
                + ((r2b * _s8(red)) >> 5)) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _inv_color_indexing(pixels: list[int], packed_w: int, h: int,
                        width_bits: int, palette: list[int],
                        orig_w: int) -> list[int]:
    """Unbundle indices from the green channel (first pixel in the
    least-significant bits) and map through the palette;
    out-of-range indices are transparent black per spec."""
    n_colors = len(palette)
    if width_bits == 0:
        return [palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < n_colors
                else 0 for p in pixels]
    per_byte_bits = 8 >> width_bits
    mask = (1 << per_byte_bits) - 1
    xmask = (1 << width_bits) - 1
    out = [0] * (orig_w * h)
    for y in range(h):
        row = pixels[y * packed_w:(y + 1) * packed_w]
        base = y * orig_w
        for x in range(orig_w):
            packed = (row[x >> width_bits] >> 8) & 0xFF
            idx = (packed >> ((x & xmask) * per_byte_bits)) & mask
            out[base + x] = palette[idx] if idx < n_colors else 0
    return out


def _inv_subtract_green(pixels: list[int]) -> None:
    for pos, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        pixels[pos] = ((px & 0xFF00FF00)
                       | ((((px >> 16) & 0xFF) + g & 0xFF) << 16)
                       | ((px & 0xFF) + g & 0xFF))


def decode_vp8l(payload: bytes) -> tuple[int, int, int, bytes]:
    """VP8L chunk payload → ``(width, height, 4, rgba_bytes)`` (same
    convention as ``multimodal.decode_png``)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-is-used hint — informational
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: unsupported version {version}")
    if w > _MAX_DIM or h > _MAX_DIM or w * h > _MAX_PIXELS:
        raise ValueError(f"VP8L: unreasonable dimensions {w}x{h}")
    transforms = []
    cur_w = w
    while br.read_bit():
        transform, cur_w = _read_transform(br, cur_w, h)
        if any(t[0] == transform[0] for t in transforms):
            raise ValueError("VP8L: duplicate transform")
        transforms.append(transform)
    pixels = _decode_entropy_image(br, cur_w, h, is_main=True)
    for ttype, bits, data, t_width in reversed(transforms):
        if ttype == 0:
            _inv_predictor(pixels, t_width, h, bits, data)
        elif ttype == 1:
            _inv_color_transform(pixels, t_width, h, bits, data)
        elif ttype == 2:
            _inv_subtract_green(pixels)
        else:
            pixels = _inv_color_indexing(pixels, cur_w, h, bits, data,
                                         t_width)
        cur_w = t_width
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = arr >> 24
    return w, h, 4, rgba.tobytes()


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WEBP container → decoded VP8L image. Walks sibling
    chunks (VP8X extended headers and metadata are skipped); a lossy
    VP8 payload raises NotImplementedError — that decoder is
    env-limited here (libwebp absent), same seam as the other
    codecs."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise ValueError("WebP: truncated chunk")
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise NotImplementedError(
            "WebP: lossy VP8 decode requires libwebp (env-limited)")
    raise ValueError("WebP: no VP8L image chunk")
