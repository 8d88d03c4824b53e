"""Pure-stdlib/numpy video codecs (operators/videocodec.py) —
spec-conformant Y4M and RIFF/AVI payloads, no video libraries."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.videocodec import (
    VideoDecodeError,
    decode_avi,
    decode_video_meta,
    decode_y4m,
    encode_avi_dib,
    encode_y4m,
    extract_avi_frames,
    iter_frame_luma,
    iter_y4m_frames,
    parse_avi,
    parse_y4m_header,
)


# ---------------------------------------------------------------------------
# Y4M


def test_y4m_round_trip_420():
    rng = np.random.default_rng(41)
    frames = rng.integers(0, 256, size=(5, 8, 12), dtype=np.uint8)
    got, meta = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert np.array_equal(got, frames)
    assert (meta["width"], meta["height"]) == (12, 8)
    assert (meta["fps_num"], meta["fps_den"]) == (30, 1)
    assert meta["colorspace"] == "420jpeg"


@pytest.mark.parametrize("cs", ["mono", "422", "444", "420mpeg2"])
def test_y4m_colorspace_plane_walk(cs):
    # wrong chroma-plane sizes would desync the FRAME markers and raise
    rng = np.random.default_rng(43)
    frames = rng.integers(0, 256, size=(3, 6, 10), dtype=np.uint8)
    got, meta = decode_y4m(encode_y4m(frames, colorspace=cs))
    assert np.array_equal(got, frames) and meta["colorspace"] == cs


def test_y4m_hand_built_spec_payload():
    """Byte-by-byte per the yuv4mpeg spec, independent of encode_y4m:
    header with A/X tags interleaved, C444, 2 frames of 2x2 with a
    parameterized FRAME header on the second."""
    y0 = bytes([1, 2, 3, 4])
    c0 = bytes([128] * 8)
    y1 = bytes([250, 251, 252, 253])
    blob = (
        b"YUV4MPEG2 W2 H2 F24:1 Ip A4:3 C444 XCOMMENT\n"
        + b"FRAME\n" + y0 + c0
        + b"FRAME Xextra\n" + y1 + c0
    )
    meta, off = parse_y4m_header(blob)
    assert (meta["width"], meta["height"]) == (2, 2)
    assert (meta["fps_num"], meta["fps_den"]) == (24, 1)
    frames = list(iter_y4m_frames(blob))
    assert len(frames) == 2
    assert frames[0].reshape(-1).tolist() == [1, 2, 3, 4]
    assert frames[1].reshape(-1).tolist() == [250, 251, 252, 253]
    m = decode_video_meta(blob)
    assert m["n_frames"] == 2 and m["duration_ms"] == 2 * 1000 // 24
    flat = np.array([1, 2, 3, 4, 250, 251, 252, 253], dtype=np.int64)
    assert m["v_sum"] == int(flat.sum())
    assert m["v_wsum"] == int((flat * np.arange(8)).sum())


def test_y4m_odd_dims_chroma_rounding():
    # 5x3 in 420: chroma planes are ceil(5/2) x ceil(3/2) = 3x2 per spec
    frames = np.arange(15, dtype=np.uint8).reshape(1, 3, 5)
    blob = encode_y4m(frames)
    got, _ = decode_y4m(blob)
    assert np.array_equal(got, frames)
    # hand-check the arithmetic: 15 luma + 2 * (3*2) chroma per frame
    header_len = blob.index(b"\n") + 1
    assert len(blob) == header_len + len(b"FRAME\n") + 15 + 12


def test_y4m_refusals_are_loud():
    good = encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8))
    with pytest.raises(VideoDecodeError, match="YUV4MPEG2"):
        decode_y4m(b"JUNK" + good)
    with pytest.raises(VideoDecodeError, match="truncated"):
        decode_y4m(good[:-5])
    with pytest.raises(VideoDecodeError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C410\nFRAME\n" + b"\x00" * 16)
    with pytest.raises(VideoDecodeError, match="dimensions"):
        decode_y4m(b"YUV4MPEG2 H2 F25:1\n")
    with pytest.raises(VideoDecodeError, match="FRAME"):
        # desync: frame data shorter than one plane, next marker misses
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME\n\x00\x00FRAME\n")


# ---------------------------------------------------------------------------
# AVI


def test_avi_round_trip_rgb():
    rng = np.random.default_rng(47)
    frames = rng.integers(0, 256, size=(4, 6, 5, 3), dtype=np.uint8)
    blob = encode_avi_dib(frames, usec_per_frame=50_000)
    got, meta = decode_avi(blob)
    assert np.array_equal(got, frames)
    assert (meta["width"], meta["height"]) == (5, 6)
    assert meta["n_frames"] == 4 and meta["usec_per_frame"] == 50_000
    assert meta["handler"] == "DIB" and meta["compression"] == 0
    m = decode_video_meta(blob)
    assert m["duration_ms"] == 4 * 50  # 20 fps
    flat = frames.reshape(-1).astype(np.int64)
    assert m["v_sum"] == int(flat.sum())
    assert m["v_wsum"] == int((flat * np.arange(flat.size)).sum())


def test_avi_hand_built_spec_payload():
    """Byte-by-byte per the public AVI spec, independent of encode_avi_dib:
    RIFF/AVI with hdrl(avih+strl(strh vids/DIB + strf BITMAPINFOHEADER))
    and a movi LIST holding one 2x2 00db frame (bottom-up BGR, rows
    padded to 4 bytes: 2*3=6 -> stride 8)."""

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    # pixel rows: top row [R(255,0,0), G(0,255,0)], bottom [B, white]
    top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"  # BGR + pad
    bot = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    dib = bot + top  # bottom-up storage
    avih = struct.pack("<IIIIIIIIII4I", 40_000, 0, 0, 0x10, 1, 0, 1, 16, 2, 2,
                       0, 0, 0, 0)
    strh = b"vids" + b"DIB " + bytes(48)
    strf = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    hdrl = chunk(
        b"LIST",
        b"hdrl" + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", dib))
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(body)) + body

    frames, meta = decode_avi(blob)
    assert frames.shape == (1, 2, 2, 3)
    assert frames[0, 0, 0].tolist() == [255, 0, 0]  # top-left red
    assert frames[0, 0, 1].tolist() == [0, 255, 0]
    assert frames[0, 1, 0].tolist() == [0, 0, 255]
    assert frames[0, 1, 1].tolist() == [255, 255, 255]
    assert meta["n_frames"] == 1 and meta["usec_per_frame"] == 40_000


def test_avi_frame_extraction_for_compressed_streams():
    """Container walk works for codecs we can't decode: MJPG chunks come
    back as opaque per-frame payloads, decode refuses loudly."""
    blob = bytearray(encode_avi_dib(np.zeros((2, 2, 2, 3), dtype=np.uint8)))
    # flip handler + biCompression to MJPG (fourcc 'MJPG' = 0x47504A4D)
    blob[blob.index(b"DIB ") : blob.index(b"DIB ") + 4] = b"MJPG"
    strf_off = blob.index(b"strf") + 8
    struct.pack_into("<I", blob, strf_off + 16, 0x47504A4D)
    meta, frames = extract_avi_frames(bytes(blob))
    assert meta["handler"] == "MJPG" and len(frames) == 2
    assert all(isinstance(f, bytes) and len(f) == 16 for f in frames)
    with pytest.raises(VideoDecodeError, match="BI_RGB"):
        decode_avi(bytes(blob))
    with pytest.raises(VideoDecodeError, match="compressed"):
        list(iter_frame_luma(bytes(blob)))


def test_avi_refusals_are_loud():
    good = encode_avi_dib(np.zeros((1, 2, 2, 3), dtype=np.uint8))
    with pytest.raises(VideoDecodeError, match="RIFF/AVI"):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(VideoDecodeError, match="truncated"):
        parse_avi(good[:-6])
    with pytest.raises(VideoDecodeError, match="unknown video payload"):
        decode_video_meta(b"\x89PNG\r\n\x1a\nnot a video")
    assert decode_video_meta(None)["v_sum"] is None


# ---------------------------------------------------------------------------
# Cross-format stream checksums + the id-arithmetic oracle device


def test_video_meta_id_arithmetic_device():
    """The oracle device extended to the time axis: frame f of doc d has
    luma[j] = (d*31 + f*97 + j) % 251 over a 4x4 plane, so v_sum/v_wsum
    (FRAME-MAJOR weighting, i = f*16 + j) are closed forms DuckDB can
    compute from the id alone — and a frame-order bug breaks v_wsum."""
    d, n_frames, hw = 37, 6, 4
    plane = hw * hw
    j = np.arange(plane, dtype=np.int64)
    frames = np.stack(
        [((d * 31 + f * 97 + j) % 251).astype(np.uint8).reshape(hw, hw)
         for f in range(n_frames)]
    )
    m = decode_video_meta(encode_y4m(frames, fps=(10, 1)))
    flat = frames.reshape(-1).astype(np.int64)
    assert m["v_sum"] == int(flat.sum())
    assert m["v_wsum"] == int((flat * np.arange(flat.size)).sum())
    assert m["n_frames"] == n_frames and m["duration_ms"] == n_frames * 100
    # frame order is load-bearing: swapping two frames must shift v_wsum
    swapped = frames[[1, 0] + list(range(2, n_frames))]
    m2 = decode_video_meta(encode_y4m(swapped, fps=(10, 1)))
    assert m2["v_sum"] == m["v_sum"] and m2["v_wsum"] != m["v_wsum"]


def test_iter_frame_luma_both_containers():
    rng = np.random.default_rng(53)
    luma = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    y4m_frames = list(iter_frame_luma(encode_y4m(luma)))
    assert len(y4m_frames) == 3
    assert np.array_equal(np.rint(y4m_frames[1]).astype(np.uint8), luma[1])
    # AVI gray frames: R=G=B=v -> BT.601 luma == v exactly
    rgb = np.repeat(luma[:, :, :, None], 3, axis=3)
    avi_frames = list(iter_frame_luma(encode_avi_dib(rgb)))
    assert len(avi_frames) == 3
    assert np.allclose(avi_frames[2], luma[2].astype(np.float64))


# ---------------------------------------------------------------------------
# Spark seams


def test_video_stats_spark_seam(spark):
    """video_stats end-to-end: real Y4M + AVI payloads through the
    Arrow-batched mapInPandas seam; stats match the per-payload decode
    and null payloads stay null."""
    from vastdb_sdk_spark.operators.multimodal import video_stats

    rng = np.random.default_rng(59)
    blobs = {
        1: encode_y4m(
            rng.integers(0, 256, size=(4, 6, 8), dtype=np.uint8), fps=(20, 1)
        ),
        2: encode_avi_dib(
            rng.integers(0, 256, size=(2, 3, 5, 3), dtype=np.uint8),
            usec_per_frame=100_000,
        ),
    }
    rows = [(i, bytearray(b)) for i, b in blobs.items()] + [(3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in video_stats(df).collect()}
    for i, blob in blobs.items():
        m = decode_video_meta(blob)
        for k in ("width", "height", "n_frames", "duration_ms", "v_sum", "v_wsum"):
            assert got[i][k] == m[k], (i, k)
    assert got[3]["width"] is None and got[3]["v_sum"] is None
    assert got[1]["n_frames"] == 4 and got[2]["n_frames"] == 2


def test_frame_stats_spark_seam(spark):
    """frame_stats: one row per sampled frame with per-frame checksums,
    stride honored, null payloads preserved as a null row."""
    from vastdb_sdk_spark.operators.multimodal import frame_stats

    rng = np.random.default_rng(61)
    luma = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    rows = [(1, bytearray(encode_y4m(luma))), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = frame_stats(df, stride=2).collect()
    by_frame = {
        (r["media_id"], r["frame_idx"]): r for r in got if r["media_id"] == 1
    }
    assert sorted(k[1] for k in by_frame) == [0, 2, 4]
    for f in (0, 2, 4):
        flat = luma[f].reshape(-1).astype(np.int64)
        assert by_frame[(1, f)]["f_sum"] == int(flat.sum())
        assert by_frame[(1, f)]["f_wsum"] == int(
            (flat * np.arange(flat.size)).sum()
        )
    nulls = [r for r in got if r["media_id"] == 2]
    assert len(nulls) == 1 and nulls[0]["frame_idx"] is None
