"""Pure-numpy image codecs (operators/imagecodec.py) + the multimodal
decode seams they plug into. No third-party image libraries required —
the BMP/PNM payloads in these tests are real spec-conformant bytes."""

import struct

import numpy as np
import pytest

from vastdb_sdk_spark.operators.imagecodec import (
    ImageDecodeError,
    decode_bmp,
    decode_meta,
    decode_pixels,
    decode_pnm,
    decode_rgb,
    encode_bmp,
    encode_pnm,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_round_trip_even_and_odd_widths():
    # odd widths exercise the 4-byte row padding; byte-exact round trip
    for h, w in [(5, 4), (3, 5), (1, 1), (7, 2), (16, 16)]:
        a = _img(h, w, seed=h * 100 + w)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a), (h, w)


def test_bmp_hand_built_spec_payload():
    """A 2x2 BMP assembled byte-by-byte from the public spec, independent
    of encode_bmp: bottom-up rows, BGR order, rows padded to 4 bytes.
    Pixels: top-left RED, top-right GREEN, bottom-left BLUE, bottom-right
    WHITE."""
    # rows are stored bottom-up: file row 0 = image bottom row
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    pixels = row_bottom + row_top
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    a = decode_bmp(header + info + pixels)
    assert a.shape == (2, 2, 3)
    assert a[0, 0].tolist() == [255, 0, 0]  # red
    assert a[0, 1].tolist() == [0, 255, 0]  # green
    assert a[1, 0].tolist() == [0, 0, 255]  # blue
    assert a[1, 1].tolist() == [255, 255, 255]  # white


def test_bmp_top_down_negative_height():
    a = _img(3, 3, seed=9)
    blob = bytearray(encode_bmp(a))
    # flip to top-down: negate biHeight and reorder the stored rows
    struct.pack_into("<i", blob, 22, -3)
    stride = 3 * 3 + ((-(3 * 3)) % 4)
    rows = [bytes(blob[54 + i * stride: 54 + (i + 1) * stride]) for i in range(3)]
    blob[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(blob)), a)


def test_bmp_error_paths():
    a = _img(4, 4)
    good = encode_bmp(a)
    with pytest.raises(ImageDecodeError, match="magic"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_bmp(good[:-8])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ImageDecodeError, match="24bpp"):
        decode_bmp(bytes(bad_bpp))


def test_pnm_round_trip_and_comments():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    assert np.array_equal(decode_pnm(encode_pnm(g)), g)
    c = _img(3, 4, seed=2)
    assert np.array_equal(decode_pnm(encode_pnm(c)), c)
    # header comments are legal and skipped
    with_comment = b"P5\n# a comment\n5 4\n255\n" + g.tobytes()
    assert np.array_equal(decode_pnm(with_comment), g)
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_pnm(encode_pnm(g)[:-3])


def test_decode_rgb_dispatch_and_luma():
    a = _img(6, 6, seed=3)
    assert np.array_equal(decode_rgb(encode_bmp(a)), a)
    assert np.array_equal(decode_rgb(encode_pnm(a)), a)
    gray = np.full((4, 4), 100, dtype=np.uint8)
    rgb = decode_rgb(encode_pnm(gray))
    assert rgb.shape == (4, 4, 3) and rgb.min() == rgb.max() == 100
    # BT.601 luma of pure gray == the gray level
    px = decode_pixels(encode_pnm(gray))
    assert px.shape == (4, 4)
    assert np.allclose(px, 100.0)
    assert decode_pixels(None) is None
    with pytest.raises(ImageDecodeError, match="unsupported image magic"):
        decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)  # no Pillow here


def test_decode_meta_exact_dims_and_mean():
    a = np.zeros((2, 3, 3), dtype=np.uint8)
    a[0, 0] = 255  # one white pixel among six
    m = decode_meta(encode_bmp(a))
    assert (m["width"], m["height"]) == (3, 2)
    assert m["mean_luma"] == round(255.0 / 6 / 255.0, 6)
    assert decode_meta(None) == {"width": None, "height": None, "mean_luma": None}


def test_phash_on_real_bmp_payloads(spark):
    """The pixels= seam end-to-end with REAL decoded images: a smooth
    gradient, a near-identical copy (tiny brightness shift — pHash is
    median-thresholded, so it must be robust to it), and a very
    different image. Near pair -> small hamming distance; far pair ->
    large."""
    from vastdb_sdk_spark.operators.multimodal import phash_images

    base = np.add.outer(np.arange(32) * 4, np.arange(32) * 3)
    base = np.minimum(base, 255).astype(np.uint8)
    near = np.clip(base.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(7)
    far = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)

    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_bmp(near))),
        (3, bytearray(encode_bmp(far))),
        (4, None),  # null payload -> null fingerprint
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    from vastdb_sdk_spark.operators.imagecodec import decode_pixels as px

    got = {r["media_id"]: r["phash"] for r in phash_images(df, pixels=px).collect()}
    assert got[4] is None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # measured: near pair = 8 (the +3 shift saturates some gradient cells,
    # a genuine small change), far pair = 44 — thresholds leave margin
    # both ways
    assert ham(got[1], got[2]) <= 10
    assert ham(got[1], got[3]) >= 24


def test_decode_images_with_real_decoder(spark):
    from vastdb_sdk_spark.operators.imagecodec import decode_meta as dm
    from vastdb_sdk_spark.operators.multimodal import decode_images

    imgs = {i: _img(4 + i, 6 + i, seed=i) for i in (1, 2)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in decode_images(df, decoder=dm).collect()}
    for i, a in imgs.items():
        assert (got[i]["width"], got[i]["height"]) == (a.shape[1], a.shape[0])
        luma = a.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        assert abs(got[i]["mean_luma"] - luma.mean() / 255.0) < 1e-5


def test_resize_rgb_bilinear_properties():
    from vastdb_sdk_spark.operators.imagecodec import resize_rgb

    a = _img(8, 6, seed=21)
    # identity resize is exact
    assert np.array_equal(resize_rgb(a, 6, 8), a)
    # constant image stays constant at any size
    const = np.full((5, 7, 3), 42, dtype=np.uint8)
    assert (resize_rgb(const, 13, 3) == 42).all()
    # 2x upscale of a horizontal step keeps left/right plateaus
    step = np.zeros((4, 4), dtype=np.uint8)
    step[:, 2:] = 200
    up = resize_rgb(step, 8, 8)
    assert up.shape == (8, 8)
    assert (up[:, :3] == 0).all() and (up[:, -3:] == 200).all()
    # interpolated band is monotone between the plateaus
    mid = up[0, 3:5].astype(int)
    assert 0 < mid[0] <= mid[1] < 200
    with pytest.raises(ImageDecodeError, match="positive"):
        resize_rgb(a, 0, 4)


def test_resize_images_with_real_resizer(spark):
    """The resizer= seam end-to-end: decode BMP -> bilinear 16x16 ->
    re-encode BMP; output payloads decode to the expected dims and the
    canonical decode->resize->phash pipeline runs on them."""
    from vastdb_sdk_spark.operators.imagecodec import (
        decode_bmp as dec,
        decode_pixels as px,
        make_resizer,
    )
    from vastdb_sdk_spark.operators.multimodal import phash_images, resize_images

    imgs = {1: _img(32, 24, seed=31), 2: _img(9, 40, seed=32)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    small = resize_images(df, 16, 16, resizer=make_resizer("bmp"))
    rows = {r["media_id"]: r for r in small.collect()}
    for i in imgs:
        assert (rows[i]["width"], rows[i]["height"]) == (16, 16)
        assert dec(bytes(rows[i]["payload"])).shape == (16, 16, 3)
    hashed = phash_images(small.select("media_id", "payload"), pixels=px)
    got = {r["media_id"]: r["phash"] for r in hashed.collect()}
    assert got[1] is not None and got[2] is not None and got[1] != got[2]


def test_pillow_fallback_when_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — absent in this container
    import io

    from PIL import Image

    a = _img(5, 5, seed=11)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    assert np.array_equal(decode_rgb(buf.getvalue()), a)
