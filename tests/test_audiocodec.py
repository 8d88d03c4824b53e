"""Pure-stdlib WAV codec (operators/audiocodec.py) — spec-conformant
RIFF/WAVE payloads, no audio libraries."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.audiocodec import (
    AudioDecodeError,
    decode_audio_meta,
    decode_wav,
    encode_wav,
)


def test_wav_round_trip_16bit_stereo():
    rng = np.random.default_rng(71)
    a = rng.integers(-32768, 32768, size=(480, 2), dtype=np.int16)
    samples, rate = decode_wav(encode_wav(a, 48000))
    assert rate == 48000 and samples.shape == (480, 2)
    assert np.array_equal(np.rint(samples * 32768.0).astype(np.int16), a)


def test_wav_round_trip_8bit_mono_and_odd_pad():
    # odd data size exercises the RIFF word-alignment pad byte
    a = np.arange(101, dtype=np.uint8)[:, None]
    blob = encode_wav(a, 8000, bits=8)
    assert len(blob) % 2 == 0  # padded
    samples, rate = decode_wav(blob)
    assert rate == 8000 and samples.shape == (101, 1)
    assert np.allclose(samples[:, 0], (a[:, 0].astype(float) - 128) / 128)


def test_wav_hand_built_spec_payload():
    """Byte-by-byte per the public spec, independent of encode_wav:
    RIFF size field, WAVE tag, fmt chunk (PCM, mono, 4 Hz, 16-bit),
    data chunk with 3 known frames."""
    pcm = struct.pack("<3h", 1000, -2000, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 4, 8, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = decode_wav(blob)
    assert rate == 4
    assert np.rint(samples[:, 0] * 32768).astype(int).tolist() == [1000, -2000, 32767]
    m = decode_audio_meta(blob)
    assert m["sample_rate"] == 4 and m["n_frames"] == 3 and m["n_channels"] == 1
    assert m["duration_ms"] == 750  # 3 frames at 4 Hz
    assert m["s_sum"] == 1000 - 2000 + 32767
    assert m["s_wsum"] == 0 * 1000 + 1 * -2000 + 2 * 32767


def test_wav_extra_chunks_skipped():
    # LIST/INFO chunk before data, odd-size with pad — must be skipped
    a = np.array([[10, -10]], dtype=np.int16)
    blob = bytearray(encode_wav(a, 44100))
    # splice an odd-sized junk chunk right after "fmt "
    insert_at = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    blob[insert_at:insert_at] = junk
    struct.pack_into("<I", blob, 4, len(blob) - 8)
    samples, rate = decode_wav(bytes(blob))
    assert rate == 44100 and samples.shape == (1, 2)


def test_wav_refusals_are_loud():
    a = np.zeros((4, 1), dtype=np.int16)
    good = encode_wav(a, 16000)
    with pytest.raises(AudioDecodeError, match="RIFF"):
        decode_wav(b"NOPE" + good[4:])
    bad = bytearray(good)
    struct.pack_into("<H", bad, bad.index(b"fmt ") + 8, 85)  # wFormatTag=MP3
    with pytest.raises(AudioDecodeError, match="PCM"):
        decode_wav(bytes(bad))
    with pytest.raises(AudioDecodeError, match="truncated"):
        decode_wav(good[:-3])
    assert decode_audio_meta(None)["sample_rate"] is None


def test_audio_meta_id_arithmetic_device():
    """The oracle device: samples a closed form of an id -> s_sum/s_wsum
    computable in SQL without decoding (mirrors image_stats)."""
    did = 37
    n = 50
    vals = ((did * 31 + np.arange(n)) % 251).astype(np.int16)
    m = decode_audio_meta(encode_wav(vals[:, None], 1000))
    assert m["s_sum"] == int(vals.sum())
    assert m["s_wsum"] == int((vals.astype(np.int64) * np.arange(n)).sum())


def test_audio_stats_spark_seam(spark):
    """audio_stats end-to-end: real WAV payloads through the Arrow-
    batched mapInPandas seam; stats match the per-payload decode and
    null payloads stay null."""
    from vastdb_sdk_spark.operators.multimodal import audio_stats

    rng = np.random.default_rng(73)
    blobs = {
        1: encode_wav(rng.integers(-1000, 1000, size=(30, 1), dtype=np.int16), 16000),
        2: encode_wav(rng.integers(0, 256, size=(44, 2), dtype=np.uint8), 8000, bits=8),
    }
    rows = [(i, bytearray(b)) for i, b in blobs.items()] + [(3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in audio_stats(df).collect()}
    for i, blob in blobs.items():
        m = decode_audio_meta(blob)
        for k, v in m.items():
            assert got[i][k] == v, (i, k)
    assert got[3]["sample_rate"] is None and got[3]["s_sum"] is None
    assert got[1]["sample_rate"] == 16000 and got[2]["n_channels"] == 2


def test_aiff_round_trip_and_f80_rate():
    """AIFF: big-endian PCM, word-aligned IFF chunks, and the COMM
    chunk's 80-bit extended-float sample rate round-tripped for the
    rates that actually occur."""
    from vastdb_sdk_spark.operators.audiocodec import (
        _f80_pack,
        _f80_unpack,
        decode_aiff,
        encode_aiff,
    )

    for rate in (1, 8000, 16000, 22050, 44100, 48000, 96000):
        assert _f80_unpack(_f80_pack(rate)) == rate
    rng = np.random.default_rng(79)
    a = rng.integers(-32768, 32768, size=(321, 2), dtype=np.int16)
    samples, rate = decode_aiff(encode_aiff(a, 44100))
    assert rate == 44100 and samples.shape == (321, 2)
    assert np.array_equal(np.rint(samples * 32768.0).astype(np.int16), a)
    # 8-bit AIFF is SIGNED (unlike WAV's unsigned 8-bit)
    b = rng.integers(-128, 128, size=(101, 1)).astype(np.int8)
    samples8, rate8 = decode_aiff(encode_aiff(b, 8000, bits=8))
    assert rate8 == 8000
    assert np.array_equal(np.rint(samples8 * 128.0).astype(np.int8), b)


def test_aiff_hand_built_spec_payload_and_meta_dispatch():
    """Byte-by-byte per the AIFF-1.3 spec, independent of encode_aiff:
    FORM/AIFF, COMM (mono, 3 frames, 16-bit, rate 4 as 80-bit extended
    0x4001 8000...), SSND with offset 0. decode_audio_meta dispatches on
    the FORM magic and the stats match WAV's contract."""
    from vastdb_sdk_spark.operators.audiocodec import decode_audio_meta

    pcm = struct.pack(">3h", 1000, -2000, 32767)
    f80 = bytes([0x40, 0x01, 0x80, 0, 0, 0, 0, 0, 0, 0])  # 4.0
    comm = struct.pack(">hIh", 1, 3, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    blob = b"FORM" + struct.pack(">I", len(body)) + body
    m = decode_audio_meta(blob)
    assert m["sample_rate"] == 4 and m["n_frames"] == 3
    assert m["duration_ms"] == 750
    assert m["s_sum"] == 1000 - 2000 + 32767
    assert m["s_wsum"] == 0 * 1000 + 1 * -2000 + 2 * 32767


def test_aiff_refusals_are_loud():
    from vastdb_sdk_spark.operators.audiocodec import decode_aiff, encode_aiff

    good = encode_aiff(np.zeros((4, 1), dtype=np.int16), 16000)
    with pytest.raises(AudioDecodeError, match="FORM"):
        decode_aiff(b"NOPE" + good[4:])
    aifc = good[:8] + b"AIFC" + good[12:]
    with pytest.raises(AudioDecodeError, match="AIFF-C"):
        decode_aiff(aifc)
    with pytest.raises(AudioDecodeError, match="truncated"):
        decode_aiff(good[:-3])
