"""Pure-stdlib+numpy WAV (RIFF) decoder → pooled audio features.

Real decode for the dominant uncompressed web-audio container:
RIFF/WAVE with PCM integer (format 1: 8/16/24/32-bit) and IEEE float
(format 3: 32/64-bit) sample data, any channel count. The chunk walk
follows the RIFF spec (word-aligned chunks, ``fmt `` before ``data``);
WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat GUID;
IMA/DVI ADPCM (0x11) and Microsoft ADPCM (0x02) blocks decode for
real (sequential per-block state machines — fixture-grade ceiling,
documented on each). Lossy codecs (MP3/OGG/AAC) stay behind the documented
env-limited stub in ``multimodal._decode_audio`` — their decoders are
not in this container (reference analog: kgap treats harvested page
assets as opaque payloads, ``ldes-consumer/app.py``; feature
extraction is this repo's extension surface).

Scale note: decoding runs inside ``mapInPandas`` Arrow batches
(see ``multimodal.extract_features``) — per-payload work is a single
``np.frombuffer`` + vectorized pooling, no per-sample Python loop.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: "<i2", 32: "<i4"}
_FLOAT_DTYPES = {32: "<f4", 64: "<f8"}

# WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs (first 2 bytes = format tag)
_FMT_PCM = 1
_FMT_ADPCM_MS = 2
_FMT_FLOAT = 3
_FMT_ADPCM_IMA = 0x11
_FMT_EXTENSIBLE = 0xFFFE

# IMA/DVI ADPCM tables (public constants, IMA ADPCM spec / RFC 3551
# §4.5.1 lineage): 89-entry step table + 8-entry index adaptation
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)

MAX_WAV_BYTES = 256 * 1024 * 1024  # refuse absurd single payloads


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE bytes → ``(sample_rate, channels, samples)`` with
    ``samples`` float64 in [-1, 1], shape ``(frames, channels)``.
    Raises ``ValueError`` for anything outside the PCM/IEEE-float
    subset — callers isolate that per row (NULL features), mirroring
    the image decoders."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    if len(data) > MAX_WAV_BYTES:
        raise ValueError("WAV payload exceeds decoder bound")
    pos, end = 12, len(data)
    fmt = None
    frames = None
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            (tag, ch, sr, _brate, block, bits) = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == _FMT_EXTENSIBLE:
                if len(body) < 26:
                    raise ValueError("WAVE_FORMAT_EXTENSIBLE truncated")
                tag = struct.unpack_from("<H", body, 24)[0]
            fmt = (tag, ch, sr, block, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            frames = _decode_samples(body, fmt)
        # LIST/INFO/fact/cue chunks are skipped by the walk
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    return fmt[2], fmt[1], frames


_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232))
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512,
             409, 307, 230, 230, 230)


def _decode_ima_adpcm(body: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (format 0x11): per-block per-channel 4-byte
    headers (predictor int16, step index), then channel-interleaved
    4-byte nibble groups, LOW nibble first. The state machine is
    inherently sequential (each sample's step depends on the last),
    so this is a per-block Python loop — same fixture-grade ceiling
    as the image decoders, documented; a partial trailing block is
    dropped."""
    if ch < 1 or ch > 8:
        raise ValueError(f"IMA ADPCM channel count out of range ({ch})")
    if block_align < 4 * ch + 4 * ch or block_align % 4:
        raise ValueError(f"IMA ADPCM bad block align {block_align}")
    n_blocks = len(body) // block_align
    if n_blocks == 0:
        raise ValueError("IMA ADPCM data smaller than one block")
    chans: list[list[int]] = [[] for _ in range(ch)]
    for bi in range(n_blocks):
        blk = body[bi * block_align:(bi + 1) * block_align]
        preds, idxs = [], []
        for c in range(ch):
            pred, index = struct.unpack_from("<hB", blk, c * 4)
            if index > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(index)
            chans[c].append(pred)
        pos = 4 * ch
        while pos + 4 * ch <= len(blk):
            for c in range(ch):
                pred, index = preds[c], idxs[c]
                for b in blk[pos + 4 * c:pos + 4 * c + 4]:
                    for nib in (b & 0xF, b >> 4):
                        step = _IMA_STEPS[index]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        pred += -diff if nib & 8 else diff
                        pred = max(-32768, min(32767, pred))
                        index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
                        chans[c].append(pred)
                preds[c], idxs[c] = pred, index
            pos += 4 * ch
    n = min(len(c) for c in chans)
    return np.array([c[:n] for c in chans],
                    dtype=np.float64).T / 32768.0


def _decode_ms_adpcm(body: bytes, ch: int, block_align: int) -> np.ndarray:
    """Microsoft ADPCM (format 0x02): per-block header (predictor
    coefficient index, initial delta, two seed samples per channel),
    then channel-alternating 4-bit nibbles, HIGH nibble first;
    prediction (s1*c1 + s2*c2) >> 8 with the 16-entry delta
    adaptation table. Sequential per block, same ceiling note as the
    IMA path."""
    if ch < 1 or ch > 2:
        raise ValueError(f"MS ADPCM channel count out of range ({ch})")
    if block_align < 7 * ch + 1:
        raise ValueError(f"MS ADPCM bad block align {block_align}")
    n_blocks = len(body) // block_align
    if n_blocks == 0:
        raise ValueError("MS ADPCM data smaller than one block")
    chans: list[list[int]] = [[] for _ in range(ch)]
    for bi in range(n_blocks):
        blk = body[bi * block_align:(bi + 1) * block_align]
        coefs, deltas, s1, s2 = [], [], [], []
        for c in range(ch):
            pidx = blk[c]
            if pidx >= len(_MS_COEFS):
                raise ValueError("MS ADPCM predictor index out of range")
            coefs.append(_MS_COEFS[pidx])
        off = ch
        for lst in (deltas, s1, s2):
            for c in range(ch):
                lst.append(struct.unpack_from("<h", blk, off)[0])
                off += 2
        for c in range(ch):  # seed samples, oldest first
            chans[c].append(s2[c])
            chans[c].append(s1[c])
        which = 0
        for b in blk[off:]:
            for nib in (b >> 4, b & 0xF):
                c = which % ch
                which += 1
                s = nib - 16 if nib >= 8 else nib
                c1, c2 = coefs[c]
                # C-style '/ 256': truncation toward ZERO — '>> 8'
                # floors, which drifts negative predictions by 1 LSB
                acc = s1[c] * c1 + s2[c] * c2
                pred = acc // 256 if acc >= 0 else -((-acc) // 256)
                new = max(-32768, min(32767, pred + deltas[c] * s))
                s2[c], s1[c] = s1[c], new
                deltas[c] = max(16, (_MS_ADAPT[nib] * deltas[c]) >> 8)
                chans[c].append(new)
    n = min(len(c) for c in chans)
    return np.array([c[:n] for c in chans],
                    dtype=np.float64).T / 32768.0


def _decode_samples(body: bytes, fmt) -> np.ndarray:
    tag, ch, _sr, block, bits = fmt
    if ch < 1 or ch > 64:
        raise ValueError(f"WAV channel count out of range ({ch})")
    if tag == _FMT_ADPCM_IMA:
        if bits != 4:
            raise ValueError(f"IMA ADPCM bits={bits} unsupported (4 only)")
        return _decode_ima_adpcm(body, ch, block)
    if tag == _FMT_ADPCM_MS:
        if bits != 4:
            raise ValueError(f"MS ADPCM bits={bits} unsupported (4 only)")
        return _decode_ms_adpcm(body, ch, block)
    if tag == _FMT_PCM and bits == 24:
        # 24-bit has no numpy dtype: widen via a strided uint8 view —
        # still vectorized, no per-sample loop
        n = len(body) // 3
        raw = np.frombuffer(body[:n * 3], dtype=np.uint8).reshape(n, 3)
        vals = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        arr = vals.astype(np.float64) / float(1 << 23)
    elif tag == _FMT_PCM and bits in _PCM_DTYPES:
        arr = np.frombuffer(
            body[:len(body) - len(body) % (bits // 8)],
            dtype=_PCM_DTYPES[bits],
        ).astype(np.float64)
        if bits == 8:  # 8-bit WAV PCM is unsigned, midpoint 128
            arr = (arr - 128.0) / 128.0
        else:
            arr = arr / float(1 << (bits - 1))
    elif tag == _FMT_FLOAT and bits in _FLOAT_DTYPES:
        arr = np.frombuffer(
            body[:len(body) - len(body) % (bits // 8)],
            dtype=_FLOAT_DTYPES[bits],
        ).astype(np.float64)
    else:
        raise ValueError(
            f"unsupported WAV format tag={tag} bits={bits} "
            "(PCM 8/16/24/32, IEEE float 32/64, IMA/MS ADPCM only; "
            "lossy codecs need soundfile — not in this container)"
        )
    n_frames = len(arr) // ch
    if n_frames == 0:
        raise ValueError("WAV data chunk has no complete frame")
    return arr[:n_frames * ch].reshape(n_frames, ch)


def audio_features(sr: int, ch: int, samples: np.ndarray,
                   dim: int = 16) -> list[float]:
    """Decoded frames → ``dim`` pooled features, deterministic and
    fully vectorized: [duration (capped 1h, normalized), sample-rate
    /48k, channels/8, RMS, peak, zero-crossing rate, then ``dim-6``
    per-segment RMS values over the mono mix] — the audio analog of
    ``multimodal._image_features``'s 3×3 luma grid."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    dur = n / float(sr) if sr else 0.0
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
        if n > 1 else 0.0
    feats = [
        min(dur, 3600.0) / 3600.0,
        min(sr, 48000) / 48000.0,
        min(ch, 8) / 8.0,
        rms,
        peak,
        zcr,
    ]
    for seg in np.array_split(mono, max(dim - len(feats), 1)):
        feats.append(
            float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
        )
    return feats[:dim]


def encode_wav(sr: int, samples: np.ndarray) -> bytes:
    """Test helper: frames (float64 [-1,1], shape (n, ch)) → 16-bit
    PCM RIFF bytes. Kept here (not in tests) so fixtures and docs can
    synthesize WAV payloads with one import."""
    n, ch = samples.shape
    pcm = np.clip(samples, -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(ints)) + ints
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
