"""Pure-python GIF codec (operators/gifcodec.py) — spec-conformant
GIF87a/89a payloads with real LZW, no image libraries."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.gifcodec import (
    GifDecodeError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_round_trip_dense():
    rng = np.random.default_rng(19)
    for size in (2, 4, 8):
        px = rng.integers(0, 1 << size, 5000, dtype=np.uint8).tobytes()
        got = _lzw_decode(size, _lzw_encode(size, px), len(px))
        assert got == px, f"min_code_size={size}"


def test_lzw_dictionary_cap_reset():
    # long repetitive stream forces dictionary growth to the 4096 cap
    # and a clear-code reset mid-stream
    px = (bytes(range(256)) * 64)[:12000]
    got = _lzw_decode(8, _lzw_encode(8, px), len(px))
    assert got == px


def test_gif_single_frame_round_trip():
    rng = np.random.default_rng(23)
    img = (rng.integers(0, 6, (11, 13)) * 40).astype(np.uint8)
    rgb = np.stack([img, 255 - img, img // 2], axis=2)
    frames, meta = decode_gif(encode_gif(rgb))
    assert frames.shape == (1, 11, 13, 3)
    assert np.array_equal(frames[0], rgb)
    assert (meta["width"], meta["height"]) == (13, 11)


def test_gif_multi_frame_round_trip_and_delays():
    rng = np.random.default_rng(29)
    clips = (rng.integers(0, 4, (3, 6, 8, 1)) * 80).astype(np.uint8)
    clips = np.repeat(clips, 3, axis=3)
    blob = encode_gif(clips, delays_cs=[10, 20, 30])
    frames, meta = decode_gif(blob)
    assert frames.shape == (3, 6, 8, 3)
    assert np.array_equal(frames, clips)
    assert meta["delays_cs"] == [10, 20, 30] and meta["n_frames"] == 3


def test_gif_hand_built_spec_payload():
    """Byte-by-byte per the GIF89a spec, independent of encode_gif:
    2x2, 2-entry GCT (black/white), uncompressed-style LZW written by
    hand — min code 2, codes: clear(4) px0(0) px1(1) px1(1) px0(0)
    eoi(5), packed LSB-first at 3 bits."""
    # the decoder adds a dictionary entry per code AFTER the first, so
    # after codes [clear,0,1,1] its next_code hits 8 and the remaining
    # codes are read at 4 bits — pack widths accordingly
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    acc = n = 0
    data = bytearray()
    for c, width in codes:
        acc |= c << n
        n += width
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    blob = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])  # GCT, 2 entries
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2, len(data)]) + bytes(data) + b"\x00"
        + b"\x3b"
    )
    frames, meta = decode_gif(blob)
    assert frames.shape == (1, 2, 2, 3)
    assert frames[0, 0, 0].tolist() == [0, 0, 0]
    assert frames[0, 0, 1].tolist() == [255, 255, 255]
    assert frames[0, 1, 0].tolist() == [255, 255, 255]
    assert frames[0, 1, 1].tolist() == [0, 0, 0]


def test_gif_interlace():
    """Interlaced image: rows stored in the 4-pass order must come back
    in display order."""
    rng = np.random.default_rng(31)
    img = (rng.integers(0, 8, (9, 4)) * 30).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    blob = bytearray(encode_gif(rgb))
    # flip the interlace flag and reorder the pixel rows accordingly
    desc = blob.index(b"\x2c")
    blob[desc + 9] |= 0x40
    order = np.concatenate(
        [np.arange(s, 9, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    # re-encode the index rows in pass order
    colors = np.unique(rgb.reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(colors)}
    idx = np.array(
        [[lut[tuple(px)] for px in row] for row in rgb], dtype=np.uint8
    )
    min_code = blob[desc + 10]
    new_data = _lzw_encode(min_code, idx[order].tobytes())
    # splice: replace old sub-blocks with the reordered stream
    pos = desc + 11
    end = pos
    while blob[end]:
        end += 1 + blob[end]
    end += 1
    sub = bytearray()
    for i in range(0, len(new_data), 255):
        chunk = new_data[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    blob[pos:end] = sub
    frames, _ = decode_gif(bytes(blob))
    assert np.array_equal(frames[0], rgb)


def test_gif_transparency_and_disposal():
    """Frame 2 paints a transparent-marked sub-rect: transparent pixels
    must show frame 1's pixels (disposal none composites over)."""
    f1 = np.zeros((4, 4, 3), np.uint8)
    f1[:, :] = (10, 20, 30)
    blob = bytearray(encode_gif(np.stack([f1, f1]), delays_cs=[5, 5]))
    # mark color index of the second frame's pixels as transparent via
    # its graphic-control block (all pixels same color -> index 0)
    gcs = [i for i in range(len(blob) - 1) if blob[i : i + 2] == b"\x21\xf9"]
    assert len(gcs) == 2
    flag_off = gcs[1] + 3
    blob[flag_off] |= 0x01  # transparency on, index byte already 0
    frames, _ = decode_gif(bytes(blob))
    # every pixel of frame 2 is transparent -> shows frame 1 state
    assert np.array_equal(frames[1], frames[0])


def test_gif_refusals_are_loud():
    good = encode_gif(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(GifDecodeError, match="not a GIF"):
        decode_gif(b"JUNK" + good)
    with pytest.raises(GifDecodeError, match="truncated"):
        decode_gif(good[:-4])
    rng = np.random.default_rng(37)
    noisy = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    with pytest.raises(GifDecodeError, match="quantize"):
        encode_gif(noisy)  # > 256 distinct colors


def test_dispatch_image_and_video_tiers():
    """A GIF is both: decode_rgb takes the first frame; iter_frame_luma
    and decode_video_meta walk all composited frames."""
    from vastdb_sdk_spark.operators.imagecodec import decode_rgb
    from vastdb_sdk_spark.operators.videocodec import (
        decode_video_meta,
        iter_frame_luma,
    )

    rng = np.random.default_rng(41)
    clips = (rng.integers(0, 5, (3, 5, 7, 1)) * 50).astype(np.uint8)
    clips = np.repeat(clips, 3, axis=3)
    blob = encode_gif(clips, delays_cs=4)
    assert np.array_equal(decode_rgb(blob), clips[0])
    lumas = list(iter_frame_luma(blob))
    assert len(lumas) == 3
    # gray frames: BT.601 luma == the gray level exactly
    assert np.allclose(lumas[2], clips[2, :, :, 0].astype(np.float64))
    m = decode_video_meta(blob)
    assert m["n_frames"] == 3 and m["duration_ms"] == 120
    flat = clips.reshape(-1).astype(np.int64)
    assert m["v_sum"] == int(flat.sum())
    assert m["v_wsum"] == int((flat * np.arange(flat.size)).sum())
