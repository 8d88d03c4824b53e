"""Pure-stdlib WAV (RIFF PCM) codec for the multimodal audio seams.

The container ships no audio libraries (librosa/soundfile/av), and the
reference treats media as opaque blobs — this module makes the audio
half of the multimodal tier load-bearing the same way imagecodec.py did
for images: a real decoder for the one uncompressed public format a
scanner actually meets, straight from the spec (RIFF/WAVE, `fmt ` +
`data` chunks; PCM 8-bit unsigned / 16-bit signed little-endian,
Microsoft WAVE format, multi-channel interleaved).

``decode_wav`` -> (samples float64 in [-1, 1] shaped (n_frames,
n_channels), sample_rate); ``decode_audio_meta`` is the dict the
multimodal metadata schema expects (sample_rate, duration_ms, plus
integer-exact stats for id-arithmetic oracles); ``encode_wav`` builds
spec-valid fixtures. Everything is per-payload Python invoked from
Arrow-batched mapInPandas pipelines — the Spark-side plumbing is the
existing multimodal seam, unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError


class AudioDecodeError(ImageDecodeError):
    """Malformed or unsupported audio payload (loud, never a fake)."""


def encode_wav(
    samples: "np.ndarray", sample_rate: int, bits: int = 16
) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) PCM samples —
    int16 (bits=16) or uint8 (bits=8) — as a canonical RIFF/WAVE file."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise AudioDecodeError(f"expected (frames[, channels]), got {a.shape}")
    n_ch = a.shape[1]
    if bits == 16:
        raw = a.astype("<i2").tobytes()
    elif bits == 8:
        raw = a.astype(np.uint8).tobytes()
    else:
        raise AudioDecodeError(f"bits must be 8 or 16, got {bits}")
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) % 2 else b"")
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_chunks(payload: bytes):
    """Walk RIFF sub-chunks: yields (id, data_offset, size). Chunks are
    word-aligned — odd sizes carry a pad byte (the spec detail naive
    parsers miss)."""
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = bytes(payload[pos : pos + 4])
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > n:
            raise AudioDecodeError(f"truncated WAV chunk {cid!r}")
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)


def _decode_wav_raw(payload: bytes) -> tuple["np.ndarray", int, int]:
    """(raw integer samples shaped (n_frames, n_channels) as int64,
    sample_rate, bits) — the exact stored PCM values."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    fmt = data = None
    for cid, off, size in _wav_chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = bytes(payload[off : off + size])
        elif cid == b"data" and data is None:
            data = (off, size)
    if fmt is None or len(fmt) < 16:
        raise AudioDecodeError("WAV missing/short 'fmt ' chunk")
    if data is None:
        raise AudioDecodeError("WAV missing 'data' chunk")
    tag, n_ch, rate, _brate, block, bits = struct.unpack_from("<HHIIHH", fmt)
    if tag != 1:
        raise AudioDecodeError(
            f"only PCM WAV supported (wFormatTag={tag}; compressed audio "
            "needs the production decoder seam)"
        )
    if n_ch < 1 or rate < 1 or bits not in (8, 16):
        raise AudioDecodeError(
            f"bad PCM params: channels={n_ch} rate={rate} bits={bits}"
        )
    if block != n_ch * bits // 8:
        raise AudioDecodeError(
            f"inconsistent block align {block} for {n_ch}ch {bits}-bit"
        )
    off, size = data
    n_frames = size // block
    count = n_frames * n_ch
    if bits == 16:
        raw = np.frombuffer(payload, dtype="<i2", count=count, offset=off)
    else:
        raw = np.frombuffer(payload, dtype=np.uint8, count=count, offset=off)
    return raw.astype(np.int64).reshape(n_frames, n_ch), rate, bits


def decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode a PCM RIFF/WAVE payload to (float64 samples in [-1, 1],
    shaped (n_frames, n_channels), sample_rate). 8-bit unsigned and
    16-bit signed PCM supported; compressed formats (non-PCM wFormatTag)
    are refused loudly."""
    raw, rate, bits = _decode_wav_raw(payload)
    if bits == 16:
        return raw.astype(np.float64) / 32768.0, rate
    return (raw.astype(np.float64) - 128.0) / 128.0, rate


# ---------------------------------------------------------------------------
# AIFF (Apple IFF: big-endian PCM, 80-bit extended-float sample rate)


def _f80_pack(value: int) -> bytes:
    """Encode a positive integer as the 80-bit IEEE 754 extended float
    the AIFF COMM chunk uses for sampleRate (sign+exp 16 bits, explicit
    integer bit + 63-bit mantissa)."""
    if value <= 0:
        raise AudioDecodeError(f"bad sample rate {value}")
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_unpack(b: bytes) -> int:
    """Decode the COMM sampleRate extended float to an int (audio rates
    are integral; refuse the exotic rest loudly)."""
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000:
        raise AudioDecodeError("negative AIFF sample rate")
    e = se - 16383
    if not 0 <= e <= 62:
        raise AudioDecodeError(f"unsupported AIFF sample-rate exponent {e}")
    shift = 63 - e
    if mant & ((1 << shift) - 1):
        raise AudioDecodeError("non-integral AIFF sample rate")
    return mant >> shift


def encode_aiff(
    samples: "np.ndarray", sample_rate: int, bits: int = 16
) -> bytes:
    """Encode (n_frames[, n_channels]) int16 (bits=16) or int8 (bits=8)
    PCM as a canonical FORM/AIFF file (big-endian samples, 80-bit
    extended-float rate). Fixture builder, byte-exact with decode_aiff."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise AudioDecodeError(f"expected (frames[, channels]), got {a.shape}")
    n_frames, n_ch = a.shape
    if bits == 16:
        raw = a.astype(">i2").tobytes()
    elif bits == 8:
        raw = a.astype(np.int8).tobytes()  # AIFF 8-bit is SIGNED
    else:
        raise AudioDecodeError(f"bits must be 8 or 16, got {bits}")
    comm = struct.pack(">hIh", n_ch, n_frames, bits) + _f80_pack(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + raw

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack(">I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def _decode_aiff_raw(payload: bytes) -> tuple["np.ndarray", int, int]:
    """(raw integer samples (n_frames, n_channels) int64, rate, bits) —
    the big-endian twin of _decode_wav_raw. AIFF-C (compressed) is
    refused loudly."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise AudioDecodeError("not an IFF/FORM payload")
    form = payload[8:12]
    if form == b"AIFC":
        raise AudioDecodeError(
            "AIFF-C compression not supported (PCM AIFF only)"
        )
    if form != b"AIFF":
        raise AudioDecodeError(f"not an AIFF form (got {form!r})")
    comm = ssnd = None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = bytes(payload[pos : pos + 4])
        (size,) = struct.unpack_from(">I", payload, pos + 4)
        if pos + 8 + size > n:
            raise AudioDecodeError(f"truncated AIFF chunk {cid!r}")
        if cid == b"COMM" and comm is None:
            comm = bytes(payload[pos + 8 : pos + 8 + size])
        elif cid == b"SSND" and ssnd is None:
            ssnd = (pos + 8, size)
        pos += 8 + size + (size % 2)  # IFF chunks are word-aligned
    if comm is None or len(comm) < 18:
        raise AudioDecodeError("AIFF missing/short COMM chunk")
    if ssnd is None:
        raise AudioDecodeError("AIFF missing SSND chunk")
    n_ch, n_frames, bits = struct.unpack_from(">hIh", comm)
    rate = _f80_unpack(comm[8:18])
    if n_ch < 1 or rate < 1 or bits not in (8, 16):
        raise AudioDecodeError(
            f"bad AIFF params: channels={n_ch} rate={rate} bits={bits}"
        )
    off, size = ssnd
    data_off, _block = struct.unpack_from(">II", payload, off)
    start = off + 8 + data_off
    count = n_frames * n_ch
    if bits == 16:
        raw = np.frombuffer(payload, dtype=">i2", count=count, offset=start)
    else:
        raw = np.frombuffer(payload, dtype=np.int8, count=count, offset=start)
    return raw.astype(np.int64).reshape(n_frames, n_ch), rate, bits


def decode_aiff(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode a PCM AIFF payload to (float64 samples in [-1, 1] shaped
    (n_frames, n_channels), sample_rate)."""
    raw, rate, bits = _decode_aiff_raw(payload)
    scale = 32768.0 if bits == 16 else 128.0
    return raw.astype(np.float64) / scale, rate


# ---------------------------------------------------------------------------
# Dispatch


def decode_audio_meta(payload: bytes) -> dict:
    """The audio ``decoder=`` seam: real (sample_rate, duration_ms,
    n_channels) plus integer-exact sample stats — ``s_sum`` (sum of raw
    sample integers) and the position-weighted ``s_wsum`` (sum of
    i * sample[i] over the interleaved stream) — the same id-arithmetic
    oracle device image_stats uses: payloads whose samples are a closed
    form of the row id make both checksums SQL-computable without
    decoding. Dispatches on magic: RIFF/WAVE (little-endian PCM) and
    FORM/AIFF (big-endian PCM)."""
    if payload is None:
        return {
            "sample_rate": None,
            "duration_ms": None,
            "n_channels": None,
            "n_frames": None,
            "s_sum": None,
            "s_wsum": None,
        }
    if bytes(payload[:4]) == b"FORM":
        raw, rate, _bits = _decode_aiff_raw(payload)
    else:
        raw, rate, _bits = _decode_wav_raw(payload)
    n_frames, n_ch = raw.shape
    ints = raw.reshape(-1)
    idx = np.arange(ints.size, dtype=np.int64)
    return {
        "sample_rate": int(rate),
        "duration_ms": int(n_frames * 1000 // rate),
        "n_channels": int(n_ch),
        "n_frames": int(n_frames),
        "s_sum": int(ints.sum()),
        "s_wsum": int((ints * idx).sum()),
    }
