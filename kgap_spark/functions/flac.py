"""Pure-stdlib+numpy FLAC decoder → ``(sr, ch, samples)``.

Same role and honest ceiling as the sibling WAV/PNG/JPEG/GIF/VP8L
decoders: correctness-first reference decode for the multimodal audio
feature path — a soundfile/libFLAC-backed decoder slots in at the
same seam in a full deployment. Implements the public FLAC format
(RFC 9639) directly: metadata-block walk (STREAMINFO required),
MSB-first frame parsing with CRC-8 header validation, all four
subframe types (constant, verbatim, fixed orders 0-4, LPC orders
1-32 with quantized coefficients and arithmetic-shift prediction),
Rice-partitioned residuals (4- and 5-bit parameters, escape-coded
raw partitions, zigzag), wasted-bits shifts, and all four channel
assignments (independent, left/side, right/side, mid/side). Raises
ValueError loudly on anything malformed or outside the spec subset
(e.g. a 1-sample-rate-code-15 frame) instead of guessing.

Output convention matches ``audio.decode_wav``: float64 in [-1, 1],
shape ``(frames, channels)`` — ``audio.audio_features`` pools both.

Reference parity note: the reference stack ships no decoder at all;
this module exists for the training-data pipeline extension
(SURVEY.md multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_FLAC_BYTES = 64 * 1024 * 1024
_MAX_SAMPLES = 1 << 26  # ~22 min stereo @44.1k — feature-path bound

_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _BitReader:
    """MSB-first bit reader (FLAC frames are big-endian bit streams)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0    # bits consumed in current byte, from the MSB

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: truncated bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            chunk = (self.data[self.pos] >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC: unbounded unary run")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _coded_number(br: _BitReader) -> int:
    """The UTF-8-like frame/sample number (up to 36 bits, 7 bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("FLAC: bad coded-number lead byte")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    """Rice-partitioned residual: 2^p partitions, each with a 4/5-bit
    parameter or an escape to raw n-bit samples; zigzag decode."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: blocksize not divisible by partitions")
    out: list[int] = []
    for part in range(n_parts):
        count = (blocksize >> part_order) - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("FLAC: partition shorter than predictor order")
        param = br.read(param_bits)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                out.extend(br.read_signed(nbits) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if bps < 1:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        res = _residual(br, blocksize, order)
        s = samples
        for i, r in enumerate(res):
            k = order + i
            if order == 0:
                v = r
            elif order == 1:
                v = r + s[k - 1]
            elif order == 2:
                v = r + 2 * s[k - 1] - s[k - 2]
            elif order == 3:
                v = r + 3 * s[k - 1] - 3 * s[k - 2] + s[k - 3]
            else:
                v = r + 4 * s[k - 1] - 6 * s[k - 2] + 4 * s[k - 3] - s[k - 4]
            s.append(v)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _residual(br, blocksize, order)
        s = samples
        for r in res:
            pred = sum(c * s[-1 - j] for j, c in enumerate(coefs)) >> shift
            s.append(r + pred)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [v << wasted for v in samples]
    return samples


def _decode_frame(br: _BitReader, info: dict) -> tuple[list[list[int]], int]:
    """One frame → (per-channel sample lists, channel count)."""
    header_start = br.pos
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("FLAC: lost frame sync")
    if br.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    br.read(1)  # blocking strategy — coded number disambiguates
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    _coded_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved blocksize code 0")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZES[bs_code]
    if sr_code == 0:
        sample_rate = info["sample_rate"]
    elif sr_code == 12:
        sample_rate = br.read(8) * 1000
    elif sr_code == 13:
        sample_rate = br.read(16)
    elif sr_code == 14:
        sample_rate = br.read(16) * 10
    elif sr_code == 15:
        raise ValueError("FLAC: invalid sample-rate code 15")
    else:
        sample_rate = _SAMPLE_RATES[sr_code]
    if sample_rate != info["sample_rate"]:
        raise ValueError("FLAC: frame sample rate differs from STREAMINFO")
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SAMPLE_SIZES:
        bps = _SAMPLE_SIZES[ss_code]
    else:
        raise ValueError(f"FLAC: reserved sample-size code {ss_code}")
    crc_calc = _crc8(br.data[header_start:br.pos])
    if crc_calc != br.read(8):
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if ch_code < 8:
        n_ch = ch_code + 1
        chans = [_subframe(br, blocksize, bps) for _ in range(n_ch)]
    elif ch_code in (8, 9, 10):
        n_ch = 2
        # the difference (side) channel carries one extra bit
        bps0 = bps + (1 if ch_code == 9 else 0)
        bps1 = bps + (1 if ch_code in (8, 10) else 0)
        c0 = _subframe(br, blocksize, bps0)
        c1 = _subframe(br, blocksize, bps1)
        if ch_code == 8:  # left/side: R = L - side
            chans = [c0, [l - s for l, s in zip(c0, c1)]]
        elif ch_code == 9:  # right/side: L = R + side
            chans = [[r + s for s, r in zip(c0, c1)], c1]
        else:  # mid/side
            left = [((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(c0, c1)]
            chans = [left, [l - s for l, s in zip(left, c1)]]
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
    br.align()
    br.read(16)  # frame footer CRC-16 (not validated — header CRC is)
    return chans, n_ch


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes → ``(sample_rate, channels, samples)`` with
    ``samples`` float64 in [-1, 1], shape ``(frames, channels)``."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad marker)")
    if len(data) > MAX_FLAC_BYTES:
        raise ValueError("FLAC payload exceeds decoder bound")
    pos = 4
    info: dict | None = None
    while pos + 4 <= len(data):
        head = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("FLAC: truncated metadata block")
        if head & 0x7F == 0:  # STREAMINFO
            if blen < 34:
                raise ValueError("FLAC: STREAMINFO too short")
            b = _BitReader(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)  # min framesize
            b.read(24)  # max framesize
            info = {
                "sample_rate": b.read(20),
                "channels": b.read(3) + 1,
                "bps": b.read(5) + 1,
                "total_samples": b.read(36),
            }
        pos += 4 + blen
        if head & 0x80:  # last-metadata-block flag
            break
    else:
        raise ValueError("FLAC: no frames after metadata")
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("FLAC: zero sample rate")
    if info["total_samples"] > _MAX_SAMPLES:
        raise ValueError("FLAC: stream exceeds decoder sample bound")
    br = _BitReader(data, pos)
    per_ch: list[list[int]] = [[] for _ in range(info["channels"])]
    got = 0
    target = info["total_samples"]
    while br.pos < len(data) and (target == 0 or got < target):
        chans, n_ch = _decode_frame(br, info)
        if n_ch != info["channels"]:
            raise ValueError("FLAC: frame channel count differs from "
                             "STREAMINFO")
        for c, vals in zip(per_ch, chans):
            c.extend(vals)
        got += len(chans[0])
        if target == 0 and br.pos >= len(data) - 2:
            break
    if got == 0:
        raise ValueError("FLAC: no audio frames decoded")
    if target and got > target:  # final frame padding beyond total
        per_ch = [c[:target] for c in per_ch]
    arr = np.array(per_ch, dtype=np.float64).T
    return info["sample_rate"], info["channels"], \
        arr / float(1 << (info["bps"] - 1))
