"""Pure-numpy baseline TIFF codec (operators/tiffcodec.py) —
spec-conformant TIFF 6.0 strip files, both byte orders, no image
libraries."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.tiffcodec import (
    TiffDecodeError,
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    encode_tiff,
)


def test_packbits_round_trip_and_spec_cases():
    # spec example (TIFF 6.0 section 9 unpacking case)
    assert _packbits_decode(bytes([0xFE, 0xAA]), 3) == b"\xaa\xaa\xaa"
    assert _packbits_decode(bytes([0x02, 1, 2, 3]), 3) == bytes([1, 2, 3])
    rng = np.random.default_rng(83)
    for _ in range(5):
        # runs + noise mix
        data = b"".join(
            bytes([v]) * r
            for v, r in zip(
                rng.integers(0, 256, 40), rng.integers(1, 20, 40)
            )
        )
        assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_tiff_lzw_round_trip_incl_width_transitions():
    rng = np.random.default_rng(89)
    # dense noise forces >253 dictionary adds -> 9->10(->11) bit
    # transitions; misaligned EarlyChange rules fail loudly here
    for size in (300, 5000, 20000):
        px = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert _tiff_lzw_decode(_tiff_lzw_encode(px), len(px)) == px


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
def test_tiff_round_trip_matrix(big_endian, compression):
    rng = np.random.default_rng(97)
    gray = rng.integers(0, 256, (21, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, (10, 17, 3), dtype=np.uint8)
    for img in (gray, rgb):
        blob = encode_tiff(
            img, compression=compression, big_endian=big_endian,
            rows_per_strip=6,
        )
        got = decode_tiff(blob)
        assert np.array_equal(got, img), (big_endian, compression, img.shape)


def test_tiff_lzw_predictor():
    # smooth data is where predictor 2 pays; correctness must be exact
    x = np.linspace(0, 255, 40)
    img = np.clip(
        np.rint(np.add.outer(x[:19], x) / 2), 0, 255
    ).astype(np.uint8)
    blob = encode_tiff(img, compression="lzw", predictor=True)
    assert np.array_equal(decode_tiff(blob), img)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    blob3 = encode_tiff(rgb, compression="lzw", predictor=True)
    assert np.array_equal(decode_tiff(blob3), rgb)


def test_tiff_hand_built_spec_payload():
    """Byte-by-byte per TIFF 6.0, independent of encode_tiff: II header,
    one 2x2 gray uncompressed strip placed before a minimal IFD,
    photometric 0 (WhiteIsZero -> decode must invert)."""
    pixels = bytes([0, 64, 128, 255])
    # header(8) + pixels(4) -> IFD at 12
    ifd_entries = [
        (256, 3, 1, 2),   # width
        (257, 3, 1, 2),   # height
        (259, 3, 1, 1),   # no compression
        (262, 3, 1, 0),   # WhiteIsZero
        (273, 4, 1, 8),   # strip offset
        (278, 4, 1, 2),   # rows per strip
        (279, 4, 1, 4),   # strip byte count
    ]
    ifd = struct.pack("<H", len(ifd_entries))
    for tag, typ, count, val in ifd_entries:
        ifd += struct.pack("<HHII", tag, typ, count, val)
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 12) + pixels + ifd
    got = decode_tiff(blob)
    assert got.shape == (2, 2)
    assert got.reshape(-1).tolist() == [255, 191, 127, 0]  # inverted


def test_tiff_refusals_and_dispatch():
    from vastdb_sdk_spark.operators.imagecodec import decode_rgb

    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :] = (9, 18, 27)
    good = encode_tiff(img, compression="packbits")
    assert np.array_equal(decode_rgb(good), img)  # magic dispatch
    gray = encode_tiff(np.full((3, 3), 7, np.uint8), big_endian=True)
    assert decode_rgb(gray).shape == (3, 3, 3)
    with pytest.raises(TiffDecodeError, match="byte-order magic"):
        decode_tiff(b"XX*\x00" + good[4:])
    with pytest.raises(TiffDecodeError, match="truncated"):
        decode_tiff(good[:-10])
    bad = bytearray(good)
    # flip compression tag value to 7 (JPEG-in-TIFF)
    i = bad.find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", bad, i + 8, 7)
    with pytest.raises(TiffDecodeError, match="compression 7"):
        decode_tiff(bytes(bad))
