"""Pure-stdlib/numpy video codecs for the multimodal frame seams.

The container ships no video libraries (av/ffmpeg/opencv), and the
reference treats media as opaque blobs (vastdb/table.py blob columns) —
this module makes the VIDEO half of the multimodal tier load-bearing the
same way imagecodec.py did for images and audiocodec.py for audio: real
decoders for the uncompressed public formats a scanner actually meets,
straight from their specs:

- **Y4M (YUV4MPEG2)**, the mjpegtools interchange format: ASCII stream
  header (``YUV4MPEG2 W<w> H<h> F<num>:<den> [I?] [A?:?] [C<cs>]\\n``)
  followed by ``FRAME[ params]\\n`` + raw planar YCbCr per frame.
  Colorspaces 420(jpeg/mpeg2/paldv), 422, 444 and mono are parsed (the
  chroma planes are walked exactly so a subsampling bug shifts every
  later frame); decode returns the luma planes.
- **AVI (RIFF)**, the Microsoft container: nested LIST chunk walk
  (hdrl -> avih MainAVIHeader + strl/strh/strf stream headers, then the
  movi LIST whose ``00db``/``00dc`` chunks are stream-0 video frames,
  word-aligned like every RIFF). Frame PAYLOAD extraction works for any
  codec (an MJPEG AVI yields per-frame JPEG bytes for a downstream
  decoder seam); full pixel DECODE is implemented for the uncompressed
  case — BI_RGB 24bpp DIB frames, bottom-up BGR rows padded to 4 bytes
  (the same pixel-array layout decode_bmp handles, minus the file
  header).

``decode_video_meta`` is the ``decoder=`` seam for
``multimodal.video_stats``: real (width, height, n_frames, fps,
duration_ms) plus integer-exact checksums — ``v_sum`` (sum of all
decoded samples, frame-major) and the position-weighted ``v_wsum``
(sum of i * sample[i] over the frame-major flattening) — the same
id-arithmetic oracle device image_stats/audio_stats use. Because the
weighting runs ACROSS frames, a frame-order, frame-boundary, or chroma
plane-walk bug shifts ``v_wsum`` even when every frame's byte multiset
is right. ``iter_frame_luma`` feeds per-frame pipelines (sampling,
per-frame stats) without materializing the whole clip.
``encode_y4m``/``encode_avi_dib`` build spec-valid fixtures so tests
and gate queries need no media libraries.

Everything here is per-payload Python invoked from Arrow-batched
mapInPandas pipelines (multimodal.py) — the Spark-side plumbing is the
existing seam; this is the leaf the batches call.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from .imagecodec import ImageDecodeError


class VideoDecodeError(ImageDecodeError):
    """Malformed or unsupported video payload (loud, never a fake)."""


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)

#: colorspace tag -> (x_div, y_div) chroma subsampling divisors; None = no
#: chroma planes. 420 variants differ only in chroma siting, not layout.
_Y4M_CHROMA = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _y4m_frame_bytes(w: int, h: int, cs: str) -> tuple[int, int]:
    """(luma_bytes, total_frame_bytes) for one frame of w x h in cs."""
    luma = w * h
    div = _Y4M_CHROMA[cs]
    if div is None:
        return luma, luma
    cw = (w + div[0] - 1) // div[0]
    ch = (h + div[1] - 1) // div[1]
    return luma, luma + 2 * cw * ch


def parse_y4m_header(payload: bytes) -> tuple[dict, int]:
    """Parse the YUV4MPEG2 stream header -> (meta dict, body offset).
    meta: width, height, fps_num, fps_den, colorspace, interlace."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise VideoDecodeError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise VideoDecodeError("unterminated Y4M stream header")
    meta = {
        "width": None,
        "height": None,
        "fps_num": 25,
        "fps_den": 1,
        "colorspace": "420jpeg",
        "interlace": "p",
    }
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        try:
            if tag == "W":
                meta["width"] = int(val)
            elif tag == "H":
                meta["height"] = int(val)
            elif tag == "F":
                num, den = val.split(":")
                meta["fps_num"], meta["fps_den"] = int(num), int(den)
            elif tag == "C":
                meta["colorspace"] = val
            elif tag == "I":
                meta["interlace"] = val
            # A (aspect) and X (comment) tags are legal; ignored
        except (ValueError, IndexError) as e:
            raise VideoDecodeError(f"bad Y4M header token {tok!r}") from e
    w, h = meta["width"], meta["height"]
    if not w or not h or w <= 0 or h <= 0:
        raise VideoDecodeError(f"Y4M missing/bad dimensions W{w} H{h}")
    if meta["fps_num"] <= 0 or meta["fps_den"] <= 0:
        raise VideoDecodeError(
            f"bad Y4M frame rate {meta['fps_num']}:{meta['fps_den']}"
        )
    if meta["colorspace"] not in _Y4M_CHROMA:
        raise VideoDecodeError(
            f"unsupported Y4M colorspace C{meta['colorspace']} "
            f"(supported: {sorted(_Y4M_CHROMA)})"
        )
    return meta, nl + 1


def iter_y4m_frames(payload: bytes) -> Iterator["np.ndarray"]:
    """Walk the FRAME markers, yielding each frame's (H, W) uint8 luma
    plane. Chroma planes are validated and skipped exactly — a
    subsampling bug would desynchronize every subsequent FRAME magic and
    raise, not silently shift pixels."""
    meta, pos = parse_y4m_header(payload)
    w, h, cs = meta["width"], meta["height"], meta["colorspace"]
    luma, total = _y4m_frame_bytes(w, h, cs)
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise VideoDecodeError(
                f"expected FRAME marker at offset {pos} "
                "(corrupt stream or plane-size desync)"
            )
        nl = payload.find(b"\n", pos + 5)
        if nl < 0:
            raise VideoDecodeError("unterminated Y4M FRAME header")
        data = nl + 1
        if data + total > n:
            raise VideoDecodeError(
                f"truncated Y4M frame: need {total} bytes at {data}, "
                f"have {n - data}"
            )
        yield np.frombuffer(payload, np.uint8, luma, data).reshape(h, w)
        pos = data + total


def decode_y4m(payload: bytes) -> tuple["np.ndarray", dict]:
    """Decode a Y4M payload to ((N, H, W) uint8 luma planes, meta)."""
    meta, _ = parse_y4m_header(payload)
    frames = list(iter_y4m_frames(payload))
    stack = (
        np.stack(frames)
        if frames
        else np.empty((0, meta["height"], meta["width"]), np.uint8)
    )
    return stack, meta


def encode_y4m(
    frames: "np.ndarray",
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """Encode (N, H, W) uint8 luma planes as a spec-valid YUV4MPEG2
    stream (chroma planes written as neutral 128 for non-mono
    colorspaces). Byte-exact luma round-trip with decode_y4m; used to
    build real fixtures without video libraries."""
    a = np.asarray(frames)
    if a.ndim != 3:
        raise VideoDecodeError(f"expected (N, H, W) luma frames, got {a.shape}")
    if colorspace not in _Y4M_CHROMA:
        raise VideoDecodeError(f"unsupported colorspace {colorspace}")
    a = a.astype(np.uint8, copy=False)
    n, h, w = a.shape
    luma, total = _y4m_frame_bytes(w, h, colorspace)
    chroma = b"\x80" * (total - luma)
    out = [
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n".encode("ascii")
    ]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(a[i].tobytes())
        out.append(chroma)
    return b"".join(out)


# ---------------------------------------------------------------------------
# AVI (RIFF container)


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Walk RIFF chunks in payload[pos:end]: yields (fourcc, data_off,
    size). Word-aligned — odd sizes carry a pad byte (same spec detail
    as audiocodec's WAV walker)."""
    while pos + 8 <= end:
        cid = bytes(payload[pos : pos + 4])
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > end:
            raise VideoDecodeError(f"truncated AVI chunk {cid!r}")
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_avi(payload: bytes) -> tuple[dict, list[tuple[int, int, bytes]]]:
    """Parse an AVI container -> (meta, frames) where frames is a list of
    (data_offset, size, chunk_fourcc) for stream-0 video chunks in movi
    order. meta: width, height, n_frames, usec_per_frame, handler
    (strh fccHandler), bpp + compression (strf BITMAPINFOHEADER)."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise VideoDecodeError("not a RIFF/AVI payload")
    meta = {
        "width": None,
        "height": None,
        "n_frames": None,
        "usec_per_frame": None,
        "handler": None,
        "bpp": None,
        "compression": None,
    }
    frames: list[tuple[int, int, bytes]] = []
    in_video_strl = False
    # one flat walk with explicit LIST recursion (spec: LIST chunks nest)
    stack = [(12, len(payload))]
    while stack:
        lo, hi = stack.pop()
        for cid, off, size in _riff_chunks(payload, lo, hi):
            if cid == b"LIST":
                kind = bytes(payload[off : off + 4])
                if kind == b"strl":
                    in_video_strl = False  # decided by this list's strh
                stack.append((off + 4, off + size))
            elif cid == b"avih":
                if size < 40:
                    raise VideoDecodeError("short avih MainAVIHeader")
                upf, _mbs, _pad, _flags, total = struct.unpack_from(
                    "<IIIII", payload, off
                )
                w, h = struct.unpack_from("<II", payload, off + 32)
                meta["usec_per_frame"] = upf
                meta["n_frames"] = total
                meta["width"], meta["height"] = w, h
            elif cid == b"strh":
                if size < 8:
                    raise VideoDecodeError("short strh stream header")
                fcc_type = bytes(payload[off : off + 4])
                in_video_strl = fcc_type == b"vids"
                if in_video_strl:
                    meta["handler"] = (
                        bytes(payload[off + 4 : off + 8]).decode(
                            "ascii", "replace"
                        ).strip("\x00 ")
                    )
            elif cid == b"strf" and in_video_strl:
                if size < 40:
                    raise VideoDecodeError("short strf BITMAPINFOHEADER")
                bw, bh = struct.unpack_from("<ii", payload, off + 4)
                bpp, comp = struct.unpack_from("<H", payload, off + 14)[
                    0
                ], struct.unpack_from("<I", payload, off + 16)[0]
                meta["bpp"], meta["compression"] = bpp, comp
                if meta["width"] is None:
                    meta["width"], meta["height"] = bw, abs(bh)
            elif cid[:2] == b"00" and cid[2:] in (b"db", b"dc"):
                frames.append((off, size, cid))
    if meta["width"] is None or meta["height"] is None:
        raise VideoDecodeError("AVI missing avih/strf dimensions")
    # movi order == stack pops may interleave; RIFF order within one movi
    # LIST is preserved by the generator; sort by offset for safety
    frames.sort(key=lambda t: t[0])
    return meta, frames


def extract_avi_frames(payload: bytes) -> tuple[dict, list[bytes]]:
    """Container-level frame extraction: (meta, [frame payload bytes]) —
    works for ANY video codec (MJPEG chunks are per-frame JPEG bytes for
    a downstream decoder; DIB chunks are raw pixel arrays)."""
    meta, frames = parse_avi(payload)
    return meta, [bytes(payload[o : o + s]) for o, s, _ in frames]


def _decode_dib_frame(
    chunk: bytes, w: int, h: int, off: int = 0, size: int | None = None
) -> "np.ndarray":
    """Decode one BI_RGB 24bpp DIB frame (bottom-up BGR rows padded to
    4 bytes — the BMP pixel-array layout, headerless) -> (H, W, 3) RGB."""
    size = len(chunk) - off if size is None else size
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    if size < stride * h:
        raise VideoDecodeError(
            f"truncated DIB frame: need {stride * h} bytes, have {size}"
        )
    data = np.frombuffer(chunk, np.uint8, stride * h, off)
    rows = data.reshape(h, stride)[:, :row_len].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


def decode_avi(payload: bytes) -> tuple["np.ndarray", dict]:
    """Decode an UNCOMPRESSED AVI (BI_RGB 24bpp DIB frames) to
    ((N, H, W, 3) uint8 RGB, meta). Compressed AVIs (MJPEG etc.) are
    refused loudly — use extract_avi_frames + a frame decoder seam."""
    meta, frames = parse_avi(payload)
    if meta["compression"] not in (0, None) or meta["bpp"] not in (24, None):
        raise VideoDecodeError(
            f"only BI_RGB 24bpp AVI decode supported (bpp={meta['bpp']}, "
            f"compression={meta['compression']}, "
            f"handler={meta['handler']!r}); use extract_avi_frames for "
            "compressed streams"
        )
    w, h = meta["width"], meta["height"]
    out = [
        _decode_dib_frame(payload, w, h, off, size)
        for off, size, _ in frames
    ]
    stack = np.stack(out) if out else np.empty((0, h, w, 3), np.uint8)
    return stack, meta


def encode_avi_dib(
    frames: "np.ndarray", usec_per_frame: int = 40_000
) -> bytes:
    """Encode (N, H, W, 3) uint8 RGB frames as an uncompressed AVI
    (BI_RGB 24bpp '00db' chunks). Spec-valid fixture builder; byte-exact
    round-trip with decode_avi."""
    a = np.asarray(frames)
    if a.ndim != 4 or a.shape[3] != 3:
        raise VideoDecodeError(f"expected (N, H, W, 3) RGB frames, got {a.shape}")
    a = a.astype(np.uint8, copy=False)
    n, h, w = a.shape[:3]
    row_len = w * 3
    pad = (-row_len) % 4
    frame_size = (row_len + pad) * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, frame_size * 1_000_000 // max(usec_per_frame, 1),
        0, 0x10, n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIiI4h",
            0, 0, 0, 0, usec_per_frame, 1_000_000, 0, n, frame_size, -1, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        chunk(
            b"00db",
            b"".join(
                a[i, y, :, ::-1].tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            ),
        )
        for i in range(n)
    )
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Dispatch + the video_stats decoder seam


def iter_frame_luma(payload: bytes) -> Iterator["np.ndarray"]:
    """Per-frame (H, W) float64 luma iterator dispatching on magic
    (Y4M luma planes verbatim; AVI DIB frames through BT.601 weights) —
    the streaming leaf for frame sampling / per-frame stats without
    materializing the clip."""
    from .imagecodec import _LUMA

    if payload[:9] == b"YUV4MPEG2":
        for y in iter_y4m_frames(payload):
            yield y.astype(np.float64)
        return
    if payload[:4] == b"GIF8":  # animated GIF = third frame source
        from .gifcodec import decode_gif

        frames, _ = decode_gif(payload)
        for rgb in frames:
            yield rgb.astype(np.float64) @ _LUMA
        return
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        meta, frames = parse_avi(payload)
        if meta["compression"] not in (0, None) or meta["bpp"] not in (24, None):
            raise VideoDecodeError(
                f"cannot decode compressed AVI frames "
                f"(handler={meta['handler']!r}); route extract_avi_frames "
                "payloads through an image decoder seam instead"
            )
        w, h = meta["width"], meta["height"]
        for off, size, _ in frames:
            rgb = _decode_dib_frame(payload, w, h, off, size)
            yield rgb.astype(np.float64) @ _LUMA
        return
    raise VideoDecodeError("unknown video payload (not Y4M or AVI)")


def decode_video_meta(payload: bytes | None) -> dict:
    """The video ``decoder=`` seam for multimodal.video_stats: real
    (width, height, n_frames, fps_num, fps_den, duration_ms) plus
    integer-exact checksums over the decoded sample stream, frame-major —
    ``v_sum`` = sum of samples, ``v_wsum`` = sum(i * sample[i]). For Y4M
    the stream is the luma planes (chroma carries no fixture signal);
    for uncompressed AVI it is the decoded RGB bytes. Cross-frame
    position weighting makes frame order and frame boundaries part of
    the contract — the id-arithmetic oracle device image_stats and
    audio_stats use, extended to the time axis."""
    if payload is None:
        return {
            "width": None,
            "height": None,
            "n_frames": None,
            "fps_num": None,
            "fps_den": None,
            "duration_ms": None,
            "v_sum": None,
            "v_wsum": None,
        }
    if payload[:9] == b"YUV4MPEG2":
        frames, meta = decode_y4m(payload)
        flat = frames.reshape(-1).astype(np.int64)
        num, den = meta["fps_num"], meta["fps_den"]
        n = frames.shape[0]
    elif payload[:4] == b"GIF8":
        from .gifcodec import decode_gif

        frames, meta = decode_gif(payload)
        flat = frames.reshape(-1).astype(np.int64)
        n = frames.shape[0]
        num, den = None, None
        total_cs = sum(meta["delays_cs"])
        return {
            "width": int(meta["width"]),
            "height": int(meta["height"]),
            "n_frames": int(n),
            "fps_num": None,
            "fps_den": None,
            "duration_ms": int(total_cs * 10) if total_cs else None,
            "v_sum": int(flat.sum()),
            "v_wsum": int((flat * np.arange(flat.size)).sum()),
        }
    elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        frames, meta = decode_avi(payload)
        flat = frames.reshape(-1).astype(np.int64)
        upf = meta["usec_per_frame"] or 0
        num, den = (1_000_000, upf) if upf else (None, None)
        n = frames.shape[0]
    else:
        raise VideoDecodeError("unknown video payload (not Y4M or AVI)")
    dur = (
        int(n * 1000 * den // num) if num and den else None
    )
    return {
        "width": int(meta["width"]),
        "height": int(meta["height"]),
        "n_frames": int(n),
        "fps_num": int(num) if num else None,
        "fps_den": int(den) if den else None,
        "duration_ms": dur,
        "v_sum": int(flat.sum()),
        "v_wsum": int((flat * np.arange(flat.size)).sum()),
    }
