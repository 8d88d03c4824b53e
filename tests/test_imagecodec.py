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
    # PNG and JPEG magics now dispatch to the built-in decoders, which
    # refuse garbage loudly rather than falling through to Pillow
    with pytest.raises(ImageDecodeError):
        decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ImageDecodeError, match="marker desync|no SOS"):
        decode_rgb(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # garbage JPEG
    with pytest.raises(ImageDecodeError, match="unsupported image magic"):
        decode_rgb(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 64)  # no Pillow


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


# -- PNG (stdlib-zlib decode, VERDICT r13 #5) --------------------------------


def _png_wrap(w, h, color_type, raw, plte=None, depth=8, interlace=0):
    """Assemble a spec-valid PNG around an already-filtered scanline
    stream — independent of encode_png, so filters/paths are exercised
    from hand-built bytes."""
    import zlib

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _png_filter_rows(a, ftypes):
    """Apply the PNG filter of ftypes[y] to each row of an (H, W, C)
    uint8 array — the test-side reference implementation of the spec's
    filter definitions (per-pixel python, independent of the decoder)."""
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch).astype(np.int32)
    out = b""
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int32)
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            upleft = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
            filt[x] = (row[x] - pred) & 0xFF
        out += bytes([ft]) + filt.astype(np.uint8).tobytes()
    return out


def test_png_round_trip_gray_and_rgb():
    from vastdb_sdk_spark.operators.imagecodec import decode_png, encode_png

    g = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    assert np.array_equal(decode_png(encode_png(g)), g)
    c = _img(7, 5, seed=41)
    assert np.array_equal(decode_png(encode_png(c)), c)
    # dispatch through the seam entry points
    assert np.array_equal(decode_rgb(encode_png(c)), c)
    px = decode_pixels(encode_png(np.full((3, 3), 77, dtype=np.uint8)))
    assert np.allclose(px, 77.0)


def test_png_all_filter_types_hand_built():
    """Every filter type (None/Sub/Up/Average/Paeth) unfiltered correctly,
    against a test-side per-pixel reference implementation of the spec."""
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    rng = np.random.default_rng(43)
    a = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = _png_filter_rows(a, ftypes)
        got = decode_png(_png_wrap(6, 10, 2, raw))
        assert np.array_equal(got, a), f"filters {ftypes}"
    # grayscale (1 channel) through the same filters
    g = rng.integers(0, 256, size=(8, 9, 1), dtype=np.uint8)
    raw = _png_filter_rows(g, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(_png_wrap(9, 8, 0, raw)), g[:, :, 0])


def test_png_palette_and_alpha_color_types():
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    # color type 3: 2x2 palette image, filter 0 rows
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    got = decode_png(_png_wrap(2, 2, 3, raw, plte=plte))
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]
    # color type 6 (RGBA): alpha dropped like PIL.convert("RGB")
    rgba = np.dstack([_img(3, 3, seed=44), np.full((3, 3), 128, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    got = decode_png(_png_wrap(3, 3, 6, raw))
    assert np.array_equal(got, rgba[:, :, :3])
    # color type 4 (gray+alpha)
    ga = np.dstack([np.arange(9, dtype=np.uint8).reshape(3, 3) * 20,
                    np.full((3, 3), 7, np.uint8)])
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(3))
    assert np.array_equal(decode_png(_png_wrap(3, 3, 4, raw)), ga[:, :, 0])


def test_png_refusals_are_loud():
    from vastdb_sdk_spark.operators.imagecodec import decode_png, encode_png

    good = encode_png(_img(4, 4, seed=45))
    with pytest.raises(ImageDecodeError, match="signature"):
        decode_png(b"NOPE" + good[4:])
    # corrupt a data byte inside IDAT -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ImageDecodeError, match="CRC"):
        decode_png(bytes(bad))
    g = np.zeros((2, 2), dtype=np.uint8)
    raw = b"\x00\x00\x00" * 2
    with pytest.raises(ImageDecodeError, match="interlace"):
        decode_png(_png_wrap(2, 2, 0, raw, interlace=2))
    with pytest.raises(ImageDecodeError, match="bit depth"):
        decode_png(_png_wrap(2, 2, 2, raw, depth=4))  # sub-8 RGB invalid
    with pytest.raises(ImageDecodeError, match="bit depth"):
        decode_png(_png_wrap(2, 2, 3, raw, depth=16))  # 16-bit palette
    with pytest.raises(ImageDecodeError, match="filter type"):
        decode_png(_png_wrap(2, 2, 0, b"\x09\x00\x00" + b"\x00\x00\x00"))
    with pytest.raises(ImageDecodeError, match="truncated PNG scanlines"):
        decode_png(_png_wrap(4, 4, 2, b"\x00\x00"))


def test_pnm_low_maxval_rescaled_like_pillow():
    # maxval 100 sample value 50 -> 128 after 8-bit rescale (ADVICE r13)
    payload = b"P5\n2 1\n100\n" + bytes([50, 100])
    got = decode_pnm(payload)
    assert got.tolist() == [[128, 255]]
    m = decode_meta(payload)
    assert m["mean_luma"] == round(((128 + 255) / 2) / 255.0, 6)


def test_bmp_offset_inside_headers_refused():
    good = bytearray(encode_bmp(_img(4, 4, seed=46)))
    struct.pack_into("<I", good, 10, 20)  # pixel offset inside the headers
    with pytest.raises(ImageDecodeError, match="offset"):
        decode_bmp(bytes(good))


def test_resize_pipeline_on_png_payloads(spark):
    """decode -> bilinear 16x16 -> re-encode PNG -> phash, end-to-end on
    real PNG payloads through the Spark seams (VERDICT r13 #5)."""
    from vastdb_sdk_spark.operators.imagecodec import (
        decode_png as dec,
        decode_pixels as px,
        encode_png,
        make_resizer,
    )
    from vastdb_sdk_spark.operators.multimodal import phash_images, resize_images

    imgs = {1: _img(20, 30, seed=51), 2: _img(33, 11, seed=52)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    small = resize_images(df, 16, 16, resizer=make_resizer("png"))
    rows = {r["media_id"]: r for r in small.collect()}
    for i in imgs:
        assert dec(bytes(rows[i]["payload"])).shape == (16, 16, 3)
    hashed = phash_images(small.select("media_id", "payload"), pixels=px)
    got = {r["media_id"]: r["phash"] for r in hashed.collect()}
    assert got[1] is not None and got[2] is not None and got[1] != got[2]


def test_png_16bit_high_byte_reduction():
    """16-bit PNGs (big-endian samples per spec) decode to the high byte
    — the standard 8-bit display reduction — including through the
    Sub filter, whose bpp stride is channels x 2 bytes for depth 16."""
    import struct as _st

    from vastdb_sdk_spark.operators.imagecodec import decode_png

    # 2x2 gray16, filter 0: samples 0x1234 0xABCD / 0xFF00 0x0080
    row0 = b"\x00" + _st.pack(">HH", 0x1234, 0xABCD)
    row1 = b"\x00" + _st.pack(">HH", 0xFF00, 0x0080)
    got = decode_png(_png_wrap(2, 2, 0, row0 + row1, depth=16))
    assert got.tolist() == [[0x12, 0xAB], [0xFF, 0x00]]

    # 1x3 RGB16 through the Sub filter: recon[x] = filt[x] + recon[x-6]
    recon = np.array(
        [[0x0102, 0x0304, 0x0506], [0x1112, 0x1314, 0x1516],
         [0x2122, 0x2324, 0x2526]], dtype=np.uint16
    )  # three pixels, channels as columns
    raw_bytes = recon.astype(">u2").tobytes()
    b = np.frombuffer(raw_bytes, dtype=np.uint8).astype(np.int32)
    filt = b.copy()
    filt[6:] = (b[6:] - b[:-6]) & 0xFF  # Sub with bpp=6
    scanline = b"\x01" + filt.astype(np.uint8).tobytes()
    got = decode_png(_png_wrap(3, 1, 2, scanline, depth=16))
    assert got.shape == (1, 3, 3)
    assert got[0].tolist() == [[0x01, 0x03, 0x05], [0x11, 0x13, 0x15],
                               [0x21, 0x23, 0x25]]

    # RGBA16: alpha dropped after high-byte reduction
    rgba = _st.pack(">HHHH", 0xAA00, 0xBB00, 0xCC00, 0xFFFF)
    got = decode_png(_png_wrap(1, 1, 6, b"\x00" + rgba, depth=16))
    assert got.tolist() == [[[0xAA, 0xBB, 0xCC]]]


def _adam7_stream(a, bytes_per_sample=1):
    """Test-side Adam7 encoder: independently emit each pass's sub-image
    with filter-0 rows, straight from the spec's pass geometry."""
    h, w = a.shape[:2]
    ch = 1 if a.ndim == 2 else a.shape[2]
    px = a.reshape(h, w, ch)
    out = b""
    for xs, ys, xstep, ystep in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                                 (0, 1, 1, 2)]:
        sub = px[ys::ystep, xs::xstep]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        dt = ">u2" if bytes_per_sample == 2 else np.uint8
        for row in sub.astype(dt):
            out += b"\x00" + row.tobytes()
    return out


def test_png_adam7_interlace_roundtrip():
    """Adam7 deinterlacing reassembles the exact image — gray and RGB,
    dims chosen so several passes are non-trivial and others empty."""
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    rng = np.random.default_rng(61)
    for h, w, ctype in [(10, 9, 2), (7, 5, 0), (1, 1, 0), (3, 16, 2), (8, 8, 2)]:
        shape = (h, w, 3) if ctype == 2 else (h, w)
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(_png_wrap(w, h, ctype, _adam7_stream(a), interlace=1))
        assert np.array_equal(got, a), (h, w, ctype)


def test_png_adam7_16bit():
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    rng = np.random.default_rng(62)
    a16 = rng.integers(0, 1 << 16, size=(6, 7), dtype=np.uint16)
    raw = _adam7_stream(a16, bytes_per_sample=2)
    got = decode_png(_png_wrap(7, 6, 0, raw, depth=16, interlace=1))
    assert np.array_equal(got, (a16 >> 8).astype(np.uint8))


def _pack_bits(vals, depth):
    """MSB-first bit-pack one row of sub-8-bit samples, zero-padded to a
    byte boundary (the spec's packed-scanline layout)."""
    bits = []
    for v in vals:
        bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
    while len(bits) % 8:
        bits.append(0)
    return np.packbits(np.array(bits, dtype=np.uint8)).tobytes()


def test_png_sub8_gray_and_palette():
    """1/2/4-bit PNGs: packed MSB-first rows, filter unit = 1 byte;
    gray scales to the exact full 8-bit range, palette indexes PLTE."""
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    # 1-bit gray, 10 px wide (crosses a byte boundary), 2 rows
    rows = [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1], [0] * 10]
    raw = b"".join(b"\x00" + _pack_bits(r, 1) for r in rows)
    got = decode_png(_png_wrap(10, 2, 0, raw, depth=1))
    assert got.tolist() == [[v * 255 for v in rows[0]], [0] * 10]

    # 2-bit gray: values 0..3 -> 0,85,170,255
    raw = b"\x00" + _pack_bits([0, 1, 2, 3, 3], 2)
    got = decode_png(_png_wrap(5, 1, 0, raw, depth=2))
    assert got.tolist() == [[0, 85, 170, 255, 255]]

    # 4-bit gray: value v -> v*17; Up filter on the second row
    r1 = _pack_bits([0, 7, 15], 4)
    r2_filt = bytes((b2 - b1) & 0xFF for b1, b2 in zip(r1, _pack_bits([1, 8, 15], 4)))
    raw = b"\x00" + r1 + b"\x02" + r2_filt
    got = decode_png(_png_wrap(3, 2, 0, raw, depth=4))
    assert got.tolist() == [[0, 119, 255], [17, 136, 255]]

    # 2-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = b"\x00" + _pack_bits([0, 1, 2, 3], 2)
    got = decode_png(_png_wrap(4, 1, 3, raw, plte=plte, depth=2))
    assert got[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]]

    # palette index out of range still loud at sub-8
    raw = b"\x00" + _pack_bits([3], 2)
    with pytest.raises(ImageDecodeError, match="palette index"):
        decode_png(_png_wrap(1, 1, 3, raw, plte=bytes([1, 2, 3]), depth=2))


def test_png_sub8_adam7():
    from vastdb_sdk_spark.operators.imagecodec import decode_png

    rng = np.random.default_rng(63)
    a = rng.integers(0, 2, size=(9, 11), dtype=np.uint8)  # 1-bit field
    out = b""
    for xs, ys, xstep, ystep in [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                                 (0, 1, 1, 2)]:
        sub = a[ys::ystep, xs::xstep]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + _pack_bits(row.tolist(), 1)
    got = decode_png(_png_wrap(11, 9, 0, out, depth=1, interlace=1))
    assert np.array_equal(got, a * 255)
