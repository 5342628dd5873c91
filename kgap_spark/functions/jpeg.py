"""Minimal pure-stdlib+numpy baseline JPEG decoder.

Round-5 counterpart of the PNG decoder (`multimodal.decode_png`): the
reference treats media as opaque payloads handled by external tooling,
so this repo's multimodal plumbing shipped with deterministic stubs;
PNG fell to a real decoder in round 4 and this module does the same
for baseline JPEG — JFIF/EXIF container, SOF0 (baseline sequential
DCT), 8-bit precision, grayscale or YCbCr with sampling factors 1–2
per axis: 4:4:4, 4:2:2, 4:4:0, and the web-dominant 4:2:0 (chroma
reconstructed by pixel replication, the classic box upsample).
Restart markers and 16-bit quantization tables are handled;
progressive (SOF2), arithmetic
coding, and sampling factors >2 raise cleanly — the caller
(`_decode_image`) isolates that per row, and a PIL-backed decoder
slots in at the same seam for full-corpus coverage.

Decode path: marker walk → canonical Huffman tables (DHT) → entropy
scan (byte-unstuffing, bit reader) → per-MCU DC-diff/AC-RLE block
decode → dequantize (DQT) → de-zigzag → 8×8 inverse DCT as two
orthonormal matrix multiplies (numpy) → level shift/clamp → YCbCr→RGB
(JFIF). The arithmetic is fixture-grade Python, same honest ceiling
as the PNG unfilter's Paeth rows (BENCH/PNG_UNFILTER.md).
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import numpy as np

    # orthonormal DCT-II basis: T[u, x] = c(u)/2 · cos((2x+1)uπ/16);
    # T·Tᵀ = I, so IDCT is f = Tᵀ·F·T (two 8×8 matmuls per block)
    x = np.arange(8)
    u = np.arange(8).reshape(8, 1)
    T = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    T[0, :] *= 1 / np.sqrt(2)
    return T


class _Huffman:
    """Canonical Huffman table from a DHT segment: BITS (count of
    codes per length 1..16) + ordered symbol values."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    byte-unstuffing; a restart marker (FFD0–FFD7) resets bit alignment
    and is consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError("JPEG: unexpected restart marker")
                else:
                    raise ValueError("JPEG: marker inside entropy data")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the next RSTn marker, resetting bit alignment
        (spec F.2.1.3.1). Only 0xFF fill bytes may precede it — any
        other byte means the entropy decoder desynced, and that must
        surface as ValueError, never be skipped over (or run off the
        buffer as IndexError)."""
        self.nbits = 0
        data = self.data
        while True:
            if self.pos + 1 >= len(data):
                raise ValueError(
                    "JPEG: truncated entropy data — no restart marker"
                )
            b = data[self.pos]
            self.pos += 1
            if b != 0xFF:
                raise ValueError(
                    "JPEG: garbage byte before restart marker "
                    "(entropy decoder desync)"
                )
            nxt = data[self.pos]
            if nxt == 0xFF:
                continue  # fill byte: FF FF … FF Dn (B.1.1.2)
            self.pos += 1
            if 0xD0 <= nxt <= 0xD7:
                return
            raise ValueError(
                f"JPEG: expected restart marker, found FF{nxt:02X}"
            )


def _extend(v: int, t: int) -> int:
    """Spec F.12: map a T-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG → ``(width, height, channels, pixel_bytes)``
    row-major, channels ∈ {1 (gray), 3 (RGB)}. Raises ValueError on
    anything outside the supported baseline subset (see module doc)."""
    import numpy as np

    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _Huffman] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        # a marker may be preceded by any number of 0xFF fill bytes
        # (B.1.1.2) — consume them instead of reading 0xFF as the
        # marker code
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if prec else 1)
                vals = seg[i:i + n]
                qt[tid] = (list(struct.unpack(f">{64}H", vals)) if prec
                           else list(vals))
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                huff[(cls, tid)] = _Huffman(counts,
                                            seg[i + 17:i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = samp >> 4, samp & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"JPEG: sampling factor {hi}x{vi} unsupported "
                        "(1 or 2 per axis: 4:4:4/4:2:2/4:4:0/4:2:0)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc} components unsupported")
            if nc == 1:
                # single-component scan: MCU is one data unit and the
                # frame sampling factors don't partition it (A.2.2)
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG: only baseline sequential DCT (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF0")
            if not seg or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("JPEG: truncated SOS header")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # spec-legal but out of scope: a baseline file split
                # into per-component scans — fail the contract way
                # (ValueError), not with a KeyError mid-decode
                raise ValueError(
                    "JPEG: non-interleaved (multi-scan) baseline "
                    "unsupported"
                )
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 15)
            if set(sel) != {c["id"] for c in frame["comps"]}:
                raise ValueError("JPEG: scan/frame component mismatch")
            return _decode_scan(
                data, pos + seg_len, frame, sel, qt, huff,
                restart_interval, np
            )
        pos += seg_len
    raise ValueError("JPEG: no scan data found")


def _decode_block(br, dc_tab, ac_tab, q, pred, ci, T, np):
    """One 8×8 data unit: DC diff + AC RLE → dequant → de-zigzag →
    IDCT → level-shifted float pixels. Mutates pred[ci]."""
    coef = [0] * 64
    t = dc_tab.decode(br)
    pred[ci] += _extend(br.receive(t), t)
    coef[0] = pred[ci] * q[0]
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 15
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("JPEG: AC index out of range")
        coef[k] = _extend(br.receive(s), s) * q[k]
        k += 1
    block = np.zeros(64)
    block[ZIGZAG] = coef
    return T.T @ block.reshape(8, 8) @ T + 128.0


def _decode_scan(data, pos, frame, sel, qt, huff, restart_interval, np):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    T = _idct_matrix()
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # interleaved MCU grid (A.2.3): each MCU covers 8·hmax × 8·vmax
    # image pixels and carries h_i×v_i data units per component
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                       dtype=np.float64) for c in comps]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            mcu += 1
            for ci, comp in enumerate(comps):
                dc_tab = huff[(0, sel[comp["id"]][0])]
                ac_tab = huff[(1, sel[comp["id"]][1])]
                q = qt[comp["tq"]]
                for vy in range(comp["v"]):
                    for vx in range(comp["h"]):
                        px = _decode_block(br, dc_tab, ac_tab, q,
                                           pred, ci, T, np)
                        by = my * comp["v"] + vy
                        bx = mx * comp["h"] + vx
                        planes[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] = px
    up = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        # box upsample by replication back to full resolution, then
        # crop the MCU padding
        if hmax // comp["h"] > 1:
            p = np.repeat(p, hmax // comp["h"], axis=1)
        if vmax // comp["v"] > 1:
            p = np.repeat(p, vmax // comp["v"], axis=0)
        up.append(p[:h, :w])
    planes = up
    if len(comps) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()
