"""Pure-python GIF codec (GIF87a/GIF89a, LZW) for the multimodal seams.

GIFs are everywhere in scraped web corpora — and an *animated* GIF is
also a frame source, so this module feeds both the image tier
(imagecodec.decode_rgb dispatch, first frame) and the video tier
(videocodec.iter_frame_luma, every composited frame). Implemented
straight from the public GIF89a specification:

- **Decoder** (``decode_gif``): header + logical screen descriptor,
  global/local color tables, image descriptors (left/top offsets,
  interlace four-pass row order), variable-width LZW decompression
  (clear/EOI codes, dictionary growth to 4096), graphic-control
  extensions (frame delay, transparency index, disposal), and
  multi-frame compositing with disposal methods none/keep (1),
  background (2) and previous (3). Returns (frames (N, H, W, 3) uint8
  RGB composited onto the logical screen, meta with per-frame delays).
- **Encoder** (``encode_gif``): the fixture builder — real LZW
  compression (dictionary growth + clear-code resets), global color
  table built from the image's distinct colors (<= 256, refused loudly
  otherwise), single- or multi-frame with per-frame delays.

Per-payload Python invoked from Arrow-batched mapInPandas pipelines —
the Spark-side plumbing is the existing multimodal seam.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError


class GifDecodeError(ImageDecodeError):
    """Malformed or unsupported GIF payload (loud, never a fake)."""


# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """Variable-width LZW per the GIF spec: clear code resets the
    dictionary, EOI ends the stream, code width grows at 2^width until
    the 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first (GIF packs codes little-endian)
    acc = n = pos = 0

    def read_code(width: int) -> int | None:
        nonlocal acc, n, pos
        while n < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << n
            n += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        return code

    def reset() -> tuple[list[bytes | None], int, int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)]
        table += [None, None]  # clear, eoi placeholders
        return table, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifDecodeError(f"bad LZW code {code} (table {next_code})")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise GifDecodeError(
            f"short LZW stream: {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """Real LZW compression (dictionary growth, clear-code reset at the
    12-bit cap) producing streams any conforming decoder reads."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n = 0

    def write_code(code: int, width: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    def reset() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    write_code(clear, width)
    cur = b""
    for b in pixels:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        write_code(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder's dictionary lags ours by one add (its first
            # code after clear adds nothing), so it reaches 1<<width one
            # code LATER than we do — grow at (1<<width)+1 to stay
            # bit-aligned with the decoder's growth rule
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            write_code(clear, width)
            table, next_code, width = reset()
        cur = bytes([b])
    if cur:
        write_code(table[cur], width)
    write_code(eoi, width)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder

#: interlace pass (start row, step) per the spec
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple["np.ndarray", dict]:
    """Decode GIF87a/89a to ((N, H, W, 3) uint8 RGB frames composited
    onto the logical screen, meta {width, height, n_frames, delays_cs,
    loop}). Transparency composites over the prior frame state per the
    disposal method."""
    p = bytes(payload)
    if len(p) < 13 or p[:3] != b"GIF" or p[3:6] not in (b"87a", b"89a"):
        raise GifDecodeError("not a GIF payload")
    w, h = struct.unpack_from("<HH", p, 6)
    flags = p[10]
    bg_index = p[11]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 7)
        gct = np.frombuffer(p, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    if w <= 0 or h <= 0:
        raise GifDecodeError(f"bad logical screen {w}x{h}")

    screen = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        screen[:, :] = gct[bg_index]
    bg_screen = screen.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop = None
    transparent: int | None = None
    disposal = 0
    delay = 0

    def read_subblocks(pos: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if pos >= len(p):
                raise GifDecodeError("truncated sub-block stream")
            n = p[pos]
            pos += 1
            if n == 0:
                return b"".join(chunks), pos
            chunks.append(p[pos : pos + n])
            if pos + n > len(p):
                raise GifDecodeError("truncated sub-block")
            pos += n

    while pos < len(p):
        b = p[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = p[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = read_subblocks(pos)
                if len(blk) >= 4:
                    gflags = blk[0]
                    delay = struct.unpack_from("<H", blk, 1)[0]
                    transparent = blk[3] if gflags & 1 else None
                    disposal = (gflags >> 2) & 7
            elif label == 0xFF:  # application (NETSCAPE loop etc.)
                blk, pos = read_subblocks(pos)
                if blk[:11] == b"NETSCAPE2.0" and len(blk) >= 14:
                    loop = struct.unpack_from("<H", blk, 12)[0]
            else:  # comment / plain text: skip
                _, pos = read_subblocks(pos)
        elif b == 0x2C:  # image descriptor
            il, it, iw, ih = struct.unpack_from("<HHHH", p, pos)
            iflags = p[pos + 8]
            pos += 9
            ct = gct
            if iflags & 0x80:
                size = 2 << (iflags & 7)
                ct = np.frombuffer(p, np.uint8, size * 3, pos).reshape(
                    size, 3
                )
                pos += size * 3
            if ct is None:
                raise GifDecodeError("image with no color table")
            if il + iw > w or it + ih > h:
                raise GifDecodeError("image rect outside logical screen")
            min_code = p[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise GifDecodeError(f"bad LZW min code size {min_code}")
            data, pos = read_subblocks(pos)
            idx = np.frombuffer(
                _lzw_decode(min_code, data, iw * ih), np.uint8
            )
            if idx.max(initial=0) >= len(ct):
                raise GifDecodeError("pixel index outside color table")
            if iflags & 0x40:  # interlaced: reorder rows over 4 passes
                rows = idx.reshape(ih, iw)
                order = np.concatenate(
                    [np.arange(s, ih, st) for s, st in _INTERLACE]
                )
                un = np.empty_like(rows)
                un[order] = rows
                rows = un
            else:
                rows = idx.reshape(ih, iw)
            prev_state = screen.copy()
            region = screen[it : it + ih, il : il + iw]
            rgb = ct[rows]
            if transparent is not None:
                mask = rows != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append(screen.copy())
            delays.append(delay)
            if disposal == 2:  # restore background in the frame rect
                screen[it : it + ih, il : il + iw] = bg_screen[
                    it : it + ih, il : il + iw
                ]
            elif disposal == 3:  # restore previous
                screen = prev_state
            transparent = None
            disposal = 0
            delay = 0
        else:
            raise GifDecodeError(f"unknown GIF block {b:#x} at {pos - 1}")
    if not frames:
        raise GifDecodeError("GIF contains no image data")
    return np.stack(frames), {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "delays_cs": delays,
        "loop": loop,
    }


# ---------------------------------------------------------------------------
# Encoder (fixture builder)


def encode_gif(
    frames: "np.ndarray", delays_cs: "list[int] | int" = 4
) -> bytes:
    """Encode (H, W, 3) or (N, H, W, 3) uint8 RGB as a GIF89a with one
    global color table built from the distinct colors (<= 256, refused
    loudly otherwise — quantization is out of scope for a fixture
    builder). Real LZW; multi-frame payloads carry per-frame graphic
    control blocks with the given delays (centiseconds)."""
    a = np.asarray(frames)
    if a.ndim == 3:
        a = a[None]
    if a.ndim != 4 or a.shape[3] != 3:
        raise GifDecodeError(f"expected (N, H, W, 3) RGB, got {a.shape}")
    a = a.astype(np.uint8, copy=False)
    n, h, w = a.shape[:3]
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifDecodeError(
            f"{len(colors)} distinct colors (> 256): quantize first"
        )
    # GCT size field stores 2^(k+1) entries; pick smallest k that fits
    depth = max(1, int(len(colors) - 1).bit_length())
    k = depth - 1
    gct_entries = 2 << k
    full = np.zeros((gct_entries, 3), np.uint8)
    full[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(n, h, w)
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * n
    if len(delays_cs) != n:
        raise GifDecodeError("delays_cs length must match frame count")

    out = [b"GIF89a", struct.pack("<HH", w, h), bytes([0x80 | k, 0, 0])]
    out.append(full.tobytes())
    for f in range(n):
        out.append(
            b"\x21\xf9\x04"
            + bytes([0x00])
            + struct.pack("<H", delays_cs[f])
            + b"\x00\x00"
        )
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
        min_code = max(2, k + 1)
        out.append(bytes([min_code]))
        data = _lzw_encode(min_code, idx[f].tobytes())
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out.append(bytes([len(blk)]) + blk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)
