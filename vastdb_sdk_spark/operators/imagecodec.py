"""Pure-numpy image codecs for the multimodal decode seams.

The container ships no image libraries, and the reference treats media as
opaque blobs — but the multimodal operators (decode_images, phash_images,
resize_images) expose ``decoder=`` / ``pixels=`` seams that until r13 only
had deterministic fakes behind them. This module makes those seams
load-bearing WITHOUT third-party codecs by implementing the uncompressed
public formats a scanner actually needs, straight from their specs:

- **BMP** (Windows BITMAPINFOHEADER, 24bpp, BI_RGB): 14-byte file header
  ("BM", pixel-array offset at byte 10), 40-byte info header (int32
  width/height — negative height = top-down, biBitCount 24,
  biCompression 0), rows stored bottom-up in BGR order and padded to
  4-byte boundaries.
- **PNM** (netpbm P5 grayscale / P6 RGB, binary, maxval <= 255):
  whitespace-separated ASCII header (with ``#`` comments) + raw samples.

``decode_pixels`` is the drop-in for ``phash_images(pixels=...)`` —
grayscale float64 via the ITU-R BT.601 luma weights; ``decode_meta`` is
the drop-in for ``decode_images(decoder=...)``. Both dispatch on magic
bytes and fall back to Pillow when it is importable (the production
path), raising a loud error otherwise. ``encode_bmp``/``encode_pnm``
exist so tests and fixtures can build real byte-exact images with no
dependencies.

Everything here is per-payload Python invoked from Arrow-batched
mapInPandas pipelines (multimodal.py) — the Spark-side plumbing is
unchanged; this is the leaf the batches call.
"""

from __future__ import annotations

import struct

import numpy as np

#: ITU-R BT.601 luma weights (the classic RGB -> grayscale standard).
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float64)


class ImageDecodeError(ValueError):
    """Malformed or unsupported image payload (loud, never a fake)."""


# ---------------------------------------------------------------------------
# BMP


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Encode an (H, W, 3) uint8 RGB array (or (H, W) grayscale, expanded)
    as a 24bpp BI_RGB bottom-up BMP. Byte-exact round-trip with
    decode_bmp; used to build real fixtures without image libraries."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ImageDecodeError(f"expected (H, W, 3) or (H, W), got {a.shape}")
    a = a.astype(np.uint8, copy=False)
    h, w = a.shape[:2]
    row_len = w * 3
    pad = (-row_len) % 4
    # bottom-up rows, BGR order, each padded to a 4-byte boundary
    rows = []
    for y in range(h - 1, -1, -1):
        rows.append(a[y, :, ::-1].tobytes() + b"\x00" * pad)
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive = bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        len(pixels),
        2835,  # 72 DPI in px/metre
        2835,
        0,
        0,
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    return header + info + pixels


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode a 24bpp BI_RGB BMP to an (H, W, 3) uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative height)
    layouts and 4-byte row padding; refuses palettes/compression/other
    bit depths loudly."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ImageDecodeError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    bi_size = struct.unpack_from("<I", payload, 14)[0]
    if bi_size < 40:
        raise ImageDecodeError(f"unsupported BMP header size {bi_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ImageDecodeError(
            f"only 24bpp BI_RGB supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    if w <= 0 or h_signed == 0 or planes != 1:
        raise ImageDecodeError(f"bad BMP dims {w}x{h_signed}, planes={planes}")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ImageDecodeError(
            f"truncated BMP: need {need} bytes, have {len(payload)}"
        )
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, :row_len].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# PNM (P5 grayscale / P6 RGB, binary, 8-bit)


def encode_pnm(arr: "np.ndarray") -> bytes:
    """Encode (H, W) uint8 as P5 or (H, W, 3) uint8 as P6 (maxval 255)."""
    a = np.asarray(arr).astype(np.uint8, copy=False)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ImageDecodeError(f"expected (H, W) or (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _pnm_header_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens after the magic,
    skipping '#' comments; returns (tokens, offset-after-single-
    whitespace-terminator) per the netpbm spec."""
    i, toks = 2, []
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated PNM header")
        try:
            toks.append(int(payload[i:j]))
        except ValueError as e:
            raise ImageDecodeError(f"bad PNM header token {payload[i:j]!r}") from e
        i = j
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_pnm(payload: bytes) -> "np.ndarray":
    """Decode binary P5 -> (H, W) / P6 -> (H, W, 3) uint8 (maxval <= 255)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageDecodeError(f"not a binary PNM payload (magic {magic!r})")
    (w, h, maxval), off = _pnm_header_tokens(payload, 3)
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise ImageDecodeError(f"unsupported PNM dims/maxval {w}x{h}/{maxval}")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    if len(payload) < off + need:
        raise ImageDecodeError(
            f"truncated PNM: need {off + need} bytes, have {len(payload)}"
        )
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w) if ch == 1 else data.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# seam implementations


def decode_rgb(payload: bytes) -> "np.ndarray":
    """payload -> (H, W, 3) uint8 RGB (grayscale sources expanded),
    dispatching on magic bytes; Pillow fallback for compressed formats
    when importable, loud ImageDecodeError otherwise."""
    if payload is None:
        raise ImageDecodeError("null payload")
    head = bytes(payload[:2])
    if head == b"BM":
        return decode_bmp(payload)
    if head in (b"P5", b"P6"):
        a = decode_pnm(payload)
        return np.repeat(a[:, :, None], 3, axis=2) if a.ndim == 2 else a
    try:  # production path: real codecs via Pillow, if present
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        raise ImageDecodeError(
            f"unsupported image magic {head!r} and Pillow is not installed "
            "(built-in codecs: 24bpp BMP, binary P5/P6 PNM)"
        ) from None
    try:
        return np.asarray(Image.open(io.BytesIO(bytes(payload))).convert("RGB"))
    except Exception as e:
        raise ImageDecodeError(f"Pillow failed to decode payload: {e}") from e


def decode_pixels(payload: bytes) -> "np.ndarray | None":
    """The ``phash_images(pixels=...)`` seam: payload -> (H, W) float64
    grayscale via BT.601 luma. Null payloads stay null (phash emits a
    null fingerprint for them, matching the stub's contract)."""
    if payload is None:
        return None
    return decode_rgb(payload).astype(np.float64) @ _LUMA


def resize_rgb(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Bilinear resize of an (H, W[, C]) uint8 array to (height, width[, C])
    — the standard align-corners=False convention (sample at pixel
    centers, edge-clamped), matching what PIL/OpenCV do for BILINEAR.
    Pure-numpy separable implementation: one vectorized gather+lerp per
    axis, no Python per-pixel loops."""
    if width <= 0 or height <= 0:
        raise ImageDecodeError(f"target dims must be positive, got {width}x{height}")
    a = np.asarray(arr)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w = a.shape[:2]
    out = a.astype(np.float64)

    def axis_coords(src: int, dst: int) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
        centers = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        lo = np.clip(np.floor(centers).astype(int), 0, src - 1)
        hi = np.clip(lo + 1, 0, src - 1)
        frac = np.clip(centers - lo, 0.0, 1.0)
        return lo, hi, frac

    lo, hi, fr = axis_coords(h, height)
    out = out[lo] * (1 - fr)[:, None, None] + out[hi] * fr[:, None, None]
    lo, hi, fr = axis_coords(w, width)
    out = out[:, lo] * (1 - fr)[None, :, None] + out[:, hi] * fr[None, :, None]
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def make_resizer(fmt: str = "bmp"):
    """A real ``resize_images(resizer=...)`` seam implementation:
    payload -> decode (any supported format) -> bilinear resize ->
    re-encode as ``fmt`` ('bmp' or 'pnm'). Returns the callable."""
    if fmt not in ("bmp", "pnm"):
        raise ImageDecodeError(f"unsupported re-encode format {fmt!r}")
    enc = encode_bmp if fmt == "bmp" else encode_pnm

    def _resize(payload: bytes, width: int, height: int) -> bytes:
        return enc(resize_rgb(decode_rgb(payload), width, height))

    return _resize


def decode_meta(payload: bytes) -> dict:
    """The ``decode_images(decoder=...)`` seam: real (width, height,
    mean_luma) from the decoded pixels; mean_luma normalized to [0, 1]
    like the stub so downstream schemas/notebooks are unchanged."""
    if payload is None:
        return {"width": None, "height": None, "mean_luma": None}
    rgb = decode_rgb(payload)
    luma = rgb.astype(np.float64) @ _LUMA
    return {
        "width": int(rgb.shape[1]),
        "height": int(rgb.shape[0]),
        "mean_luma": round(float(luma.mean()) / 255.0, 6),
    }
