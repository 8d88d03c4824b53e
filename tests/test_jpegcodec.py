"""Pure-numpy baseline JPEG codec (operators/jpegcodec.py) —
spec-conformant ITU T.81 sequential-DCT streams, no image libraries.
Round trips are lossy, so exact cases (flat blocks), bounded cases
(smooth fields at high quality), and a hand-built bitstream replayed
against independent arithmetic pin both directions."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.jpegcodec import (
    JpegDecodeError,
    decode_jpeg,
    encode_jpeg,
)


def test_flat_gray_block_is_exact():
    # a flat block has only a DC coefficient; DC quantization at q16
    # rounds 8*(v-128)/16 — exact when v-128 is a multiple of 2
    a = np.full((8, 8), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(a, quality=50)), a)


def test_flat_color_is_exact():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :] = (120, 184, 72)
    d = decode_jpeg(encode_jpeg(img, quality=95))
    assert d.shape == (16, 16, 3)
    assert int(np.abs(d.astype(int) - img.astype(int)).max()) <= 1


def test_gray_gradient_round_trip_bounded():
    x = np.linspace(0, 255, 24)
    g = np.clip(
        np.rint(x[None, :] * 0.5 + x[:, None] * 0.5), 0, 255
    ).astype(np.uint8)[:17, :24]  # non-multiple-of-8 dims exercise padding
    d = decode_jpeg(encode_jpeg(g, quality=95))
    assert d.shape == g.shape
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 3


def test_color_444_and_420_round_trip_bounded():
    rng = np.random.default_rng(5)
    base = rng.integers(60, 190, (3, 4, 3)).astype(np.float64)
    img = np.clip(
        np.rint(np.kron(base, np.ones((8, 8, 1)))), 0, 255
    ).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(img, quality=95))
    assert int(np.abs(d444.astype(int) - img.astype(int)).max()) <= 2
    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert d420.shape == img.shape
    # 4:2:0 chroma averaging smears block-constant colors only at the
    # 16px MCU seams; interior pixels stay tight
    assert int(np.abs(d420.astype(int) - img.astype(int)).max()) <= 16
    assert (
        int(np.abs(d420[4:-4, 4:-4].astype(int) - img[4:-4, 4:-4].astype(int)).max())
        <= 16
    )


def test_restart_intervals_round_trip():
    rng = np.random.default_rng(7)
    base = rng.integers(40, 210, (4, 6)).astype(np.float64)
    g = np.clip(np.rint(np.kron(base, np.ones((8, 8)))), 0, 255).astype(
        np.uint8
    )
    blob = encode_jpeg(g, quality=90, restart_interval=5)
    assert b"\xff\xdd" in blob  # DRI present
    assert blob.count(b"\xff\xd0") >= 1  # RST0 actually emitted
    d = decode_jpeg(blob)
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 2
    # predictor resets are load-bearing: without honoring them the DC
    # chain would drift; also check >8 restarts wrap m3 -> m0 correctly
    blob2 = encode_jpeg(g, quality=90, restart_interval=2)
    d2 = decode_jpeg(blob2)
    assert int(np.abs(d2.astype(int) - g.astype(int)).max()) <= 2


def test_hand_built_bitstream_independent_arithmetic():
    """Byte-by-byte per T.81, independent of encode_jpeg: 8x8 gray,
    16-bit DQT (Pq=1, q0=16), one-code-per-table DHT (DC symbol 5 =
    code '0', AC EOB = code '0'), flat value 168 -> F00 = 8*(168-128)
    = 320 -> quantized 20 -> category 5, bits 10100. Entropy byte:
    0 10100 0 + pad 1 = 0x51."""
    dqt_vals = b"".join(
        struct.pack(">H", 16 if i == 0 else 1) for i in range(64)
    )
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10" + dqt_vals
    sof = b"\xff\xc0" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    dc_bits = bytes([1] + [0] * 15)
    dht_dc = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x00" + dc_bits + bytes([5])
    dht_ac = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x10" + dc_bits + bytes([0])
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    blob = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + b"\x51" + b"\xff\xd9"
    )
    d = decode_jpeg(blob)
    assert d.shape == (8, 8)
    assert np.array_equal(d, np.full((8, 8), 168, np.uint8))


def test_byte_stuffing_both_directions():
    """A value pattern whose entropy stream contains 0xFF bytes must be
    stuffed on encode and unstuffed on decode (spec B.1.1.5)."""
    found = None
    for seed in range(40):
        # per-pixel noise maximizes AC symbols/magnitude bits -> 0xFF
        # bytes appear in the entropy stream within a few seeds
        g = np.random.default_rng(seed).integers(
            0, 256, (24, 24), dtype=np.uint8
        )
        blob = encode_jpeg(g, quality=90)
        body = blob[blob.index(b"\xff\xda") + 14 : -2]
        if b"\xff\x00" in body:
            found = (g, blob)
            break
    assert found is not None, "no stuffed byte in 40 seeds — rework test"
    g, blob = found
    d = decode_jpeg(blob)
    assert d.shape == g.shape  # decode survives the stuffing


def test_refusals_are_loud():
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(JpegDecodeError, match="SOI"):
        decode_jpeg(b"JUNK" + good)
    # flip SOF0 -> SOF9 (arithmetic coding — genuinely unsupported)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9")
    with pytest.raises(JpegDecodeError, match="SOF9"):
        decode_jpeg(arith)
    # SOF2 with a baseline-shaped full-band interleaved scan is invalid
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(JpegDecodeError, match="DC and AC mixed"):
        decode_jpeg(prog)
    with pytest.raises(JpegDecodeError, match="truncated|no SOS"):
        decode_jpeg(good[: good.index(b"\xff\xda")])
    with pytest.raises(JpegDecodeError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)


def test_imagecodec_dispatch_and_multimodal_seams():
    """decode_rgb/decode_pixels dispatch on the JPEG magic, composing
    with phash: a JPEG re-encode of an image is a near-duplicate of its
    BMP original — the exact invariance class pHash exists for."""
    from vastdb_sdk_spark.operators.imagecodec import (
        decode_pixels,
        decode_rgb,
        encode_bmp,
    )

    def phash64(luma):
        # independent test-side pHash (same published recipe
        # multimodal.phash_images implements): 2-D DCT, top-left 8x8
        # low-frequency block, threshold against its median
        n = luma.shape[0]
        c = np.cos(
            (2 * np.arange(n)[None, :] + 1)
            * np.arange(n)[:, None]
            * np.pi
            / (2 * n)
        )
        freq = (c @ luma @ c.T)[:8, :8].reshape(-1)
        bits = freq > np.median(freq)
        return int("".join("1" if b else "0" for b in bits), 2)

    rng = np.random.default_rng(13)
    lo = rng.integers(0, 256, (8, 8)).astype(np.float64)
    img = np.clip(
        np.rint(
            np.kron(lo, np.ones((4, 4)))[..., None] * [0.9, 1.0, 0.8]
        ),
        0,
        255,
    ).astype(np.uint8)
    jb = encode_jpeg(img, quality=90)
    rgb = decode_rgb(jb)
    assert rgb.shape == img.shape
    assert int(np.abs(rgb.astype(int) - img.astype(int)).max()) <= 24
    h_bmp = phash64(decode_pixels(encode_bmp(img)))
    h_jpg = phash64(decode_pixels(jb))
    assert bin(h_bmp ^ h_jpg).count("1") <= 6


def test_mjpeg_avi_decodes_end_to_end():
    """The composition the codecs were built for: an AVI whose frames
    are JPEG payloads (MJPEG) — container walk extracts per-frame bytes,
    imagecodec dispatch decodes them, no dependencies anywhere."""
    from vastdb_sdk_spark.operators.imagecodec import decode_rgb
    from vastdb_sdk_spark.operators.videocodec import (
        encode_avi_dib,
        extract_avi_frames,
    )

    rng = np.random.default_rng(17)
    frames = np.clip(
        np.rint(
            np.kron(
                rng.integers(50, 200, (2, 2, 2, 1)),
                np.ones((1, 8, 8, 3)),
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    # build the MJPEG AVI by hand: encode each frame as JPEG, then
    # splice payloads into the container via the DIB writer's layout
    jpegs = [encode_jpeg(f, quality=95) for f in frames]

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    avih = struct.pack(
        "<IIIIIIIIII4I", 40_000, 0, 0, 0x10, len(jpegs), 0, 1, 0, 16, 16,
        0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + bytes(48)
    strf = struct.pack(
        "<IiiHHIIiiII", 40, 16, 16, 1, 24, 0x47504A4D, 0, 0, 0, 0, 0
    )
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs)
    )
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(body)) + body

    meta, payloads = extract_avi_frames(blob)
    assert meta["handler"] == "MJPG" and len(payloads) == 2
    for j, f in zip(payloads, frames):
        got = decode_rgb(j)
        assert int(np.abs(got.astype(int) - f.astype(int)).max()) <= 3


def test_progressive_matches_baseline_pixels():
    """Progressive (SOF2) and baseline streams of the same image carry
    the same quantized coefficients, so decode must be byte-identical —
    across gray, 4:4:4, and 4:2:0 with odd dims."""
    rng = np.random.default_rng(19)
    gray = np.clip(
        np.rint(
            np.add.outer(np.linspace(0, 255, 17), np.linspace(0, 255, 24)) / 2
        ),
        0,
        255,
    ).astype(np.uint8)
    color = np.clip(
        np.rint(
            np.kron(
                rng.integers(60, 190, (3, 3, 3)).astype(float),
                np.ones((8, 8, 1)),
            )
        ),
        0,
        255,
    ).astype(np.uint8)[:17, :21]
    for img, kw in [
        (gray, {"quality": 95}),
        (color, {"quality": 95}),
        (color, {"quality": 85, "subsampling": "420"}),
    ]:
        base = decode_jpeg(encode_jpeg(img, **kw))
        blob = encode_jpeg(img, progressive=True, **kw)
        assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") >= 3
        assert np.array_equal(decode_jpeg(blob), base)


def test_progressive_eob_runs():
    """A mostly-flat image makes long EOB runs across blocks (EOBn with
    n > 1) — the run accounting must place the few non-empty blocks at
    exactly the right positions."""
    g = np.full((64, 64), 128, np.uint8)
    g[20, 35] = 255  # one busy block among 64
    blob = encode_jpeg(g, quality=85, progressive=True)
    d = decode_jpeg(blob)
    base = decode_jpeg(encode_jpeg(g, quality=85))
    assert np.array_equal(d, base)
    assert abs(int(d[20, 35]) - 255) <= 90  # the spike survives (lossy)
    assert int(np.abs(d[:16, :16].astype(int) - 128).max()) <= 1


def test_progressive_hand_built_ac_refinement():
    """Byte-by-byte per T.81 Annex G, independent of encode_jpeg: one
    8x8 gray block, q=1, three scans — DC first (Al=0), AC first at
    Al=1 (toward-zero magnitudes: 5 -> +2, -3 -> -1, 1 -> absent), then
    an AC REFINEMENT scan (Ah=1 -> Al=0) carrying one newly-significant
    coefficient (k=10: run counts only the 7 ZERO-history positions),
    two interleaved correction bits (k=1: 4 -> 5, k=3: -2 -> -3), and a
    terminating EOB. Expected pixels computed with an independent
    cosine-sum IDCT."""
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes([1] * 64)
    sof = b"\xff\xc2" + struct.pack(">H", 11) + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    dc_bits = bytes([1] + [0] * 15)
    dht_dc = b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" + dc_bits + bytes([5])
    ac_bits = bytes([0, 0, 4] + [0] * 13)
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 23) + b"\x10" + ac_bits
        + bytes([0x00, 0x02, 0x11, 0x71])
    )

    def sos(ss, se, ahal, entropy):
        return (
            b"\xff\xda" + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, ss, se, ahal]) + entropy
        )

    blob = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
        + sos(0, 0, 0x00, b"\x53")          # DC 20: '0' + 10100, pad 11
        + sos(1, 63, 0x01, b"\x32\x0f")     # AC first at Al=1
        + sos(1, 63, 0x10, b"\x7c\x7f")     # AC refinement to Al=0
        + b"\xff\xd9"
    )
    d = decode_jpeg(blob)
    # independent IDCT: f(y,x) = sum_{u,v} a(u)a(v) F[u,v] cos(...) / 4
    zz = np.zeros(64)
    zz[0], zz[1], zz[3], zz[10] = 20, 5, -3, 1
    zigzag = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    F = np.zeros((8, 8))
    for k, z in enumerate(zigzag):
        F[z // 8, z % 8] = zz[k]
    exp = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = (1 / np.sqrt(2)) if u == 0 else 1.0
                    av = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (
                        au * av * F[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            exp[y, x] = s / 4 + 128
    exp = np.clip(np.rint(exp), 0, 255).astype(np.uint8)
    assert np.array_equal(d, exp)
