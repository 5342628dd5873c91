"""Pure-stdlib+numpy WAV (RIFF) decoder → pooled audio features.

Real decode for the dominant uncompressed web-audio container:
RIFF/WAVE with PCM integer (format 1: 8/16/24/32-bit) and IEEE float
(format 3: 32/64-bit) sample data, any channel count. The chunk walk
follows the RIFF spec (word-aligned chunks, ``fmt `` before ``data``);
WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat GUID.
Compressed codecs (MP3/OGG/AAC, ADPCM) stay behind the documented
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
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE

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


def _decode_samples(body: bytes, fmt) -> np.ndarray:
    tag, ch, _sr, _block, bits = fmt
    if ch < 1 or ch > 64:
        raise ValueError(f"WAV channel count out of range ({ch})")
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
            "(PCM 8/16/24/32 and IEEE float 32/64 only; compressed "
            "codecs need soundfile — not in this container)"
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
