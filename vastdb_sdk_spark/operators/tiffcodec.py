"""Pure-numpy baseline TIFF codec (TIFF 6.0) for the multimodal seams.

TIFF is what scanned-document and scientific corpora ship as; this
module covers the baseline profile straight from the public spec:

- **Both byte orders** (``II*\\0`` little / ``MM\\0*`` big endian), IFD
  entry walk (inline values vs offsets, BYTE/SHORT/LONG types).
- **Strips** (StripOffsets / StripByteCounts / RowsPerStrip), chunky
  planar config, 8-bit samples, grayscale (photometric 0 white-is-zero
  inverted, 1 black-is-zero) and RGB (photometric 2, 3 samples/pixel).
- **Compressions**: none (1), LZW (5 — the TIFF variant: MSB-first bit
  packing and the EarlyChange code-width bump one entry before the
  table fills, unlike GIF's LSB-first late change), PackBits (32773).
- **Predictor 2** (horizontal differencing before LZW): undone with a
  per-channel cumulative sum.

``decode_tiff`` -> (H, W) or (H, W, 3) uint8; ``encode_tiff`` builds
spec-valid fixtures for every combination above. Unsupported shapes
(tiles, 16-bit, palettes, planar=2, JPEG-in-TIFF) are refused loudly.
Dispatched from ``imagecodec.decode_rgb`` on the TIFF magics.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError


class TiffDecodeError(ImageDecodeError):
    """Malformed or unsupported TIFF payload (loud, never a fake)."""


# ---------------------------------------------------------------------------
# TIFF-variant LZW (MSB-first, EarlyChange)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    clear, eoi = 256, 257
    out = bytearray()
    acc = n = pos = 0

    def read_code(width: int) -> int | None:
        nonlocal acc, n, pos
        while n < width:
            if pos >= len(data):
                return None
            acc = (acc << 8) | data[pos]
            n += 8
            pos += 1
        code = (acc >> (n - width)) & ((1 << width) - 1)
        n -= width
        return code

    def reset():
        return [bytes([i]) for i in range(256)] + [None, None], 258, 9

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
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
            raise TiffDecodeError(f"bad LZW code {code} (table {next_code})")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
        # EarlyChange: the DECODER bumps one entry earlier than the
        # encoder ((1<<w)-2 vs -1, libtiff's maxcode = MAXCODE(bits)-1)
        # because its dictionary lags the encoder's adds by one — the
        # two rules land the width change on the same code position
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) < expected:
        raise TiffDecodeError(
            f"short LZW strip: {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


def _tiff_lzw_encode(pixels: bytes) -> bytes:
    clear, eoi = 256, 257
    out = bytearray()
    acc = n = 0

    def write_code(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
        acc &= (1 << n) - 1

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    write_code(clear, width)
    cur = b""
    for b in pixels:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        write_code(table[cur], width)
        if next_code < 4094:
            table[nxt] = next_code
            next_code += 1
            # EarlyChange: bump when the NEXT code to assign would be
            # the last representable one
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        else:
            write_code(clear, width)
            table, next_code, width = reset()
        cur = bytes([b])
    if cur:
        write_code(table[cur], width)
    write_code(eoi, width)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        b = data[pos]
        pos += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[pos : pos + b + 1]
            pos += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if pos >= len(data):
                raise TiffDecodeError("truncated PackBits repeat")
            out += bytes([data[pos]]) * (257 - b)
            pos += 1
        # b == 128: no-op per spec
    if len(out) < expected:
        raise TiffDecodeError(
            f"short PackBits strip: {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
        else:  # literal run until next repeat of >= 3 (spec guidance)
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (
                    j + 2 < n and data[j] == data[j + 1] == data[j + 2]
                )
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# Container

_II = b"II*\x00"
_MM = b"MM\x00*"

#: tag type -> struct letter + size
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _read_ifd(p: bytes, bo: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(bo + "I", p, 4)
    if ifd_off + 2 > len(p):
        raise TiffDecodeError("truncated TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", p, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(p):
            raise TiffDecodeError("truncated TIFF IFD")
        tag, typ = struct.unpack_from(bo + "HH", p, off)
        (count,) = struct.unpack_from(bo + "I", p, off + 4)
        if typ not in _TYPES:
            continue  # RATIONAL etc. — not needed for baseline decode
        letter, size = _TYPES[typ]
        total = size * count
        if total <= 4:
            val_off = off + 8
        else:
            (val_off,) = struct.unpack_from(bo + "I", p, off + 8)
        if val_off + total > len(p):
            raise TiffDecodeError(f"truncated TIFF tag {tag}")
        tags[tag] = list(
            struct.unpack_from(bo + letter * count, p, val_off)
        )
    return tags


def decode_tiff(payload: bytes) -> "np.ndarray":
    """Decode a baseline strip TIFF to (H, W) gray or (H, W, 3) RGB
    uint8. See module docstring for the supported profile."""
    p = bytes(payload)
    if p[:4] == _II:
        bo = "<"
    elif p[:4] == _MM:
        bo = ">"
    else:
        raise TiffDecodeError("not a TIFF payload (bad byte-order magic)")
    tags = _read_ifd(p, bo)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffDecodeError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262)
    planar = one(284, 1)
    predictor = one(317, 1)
    if any(b != 8 for b in bits) or spp not in (1, 3) or planar != 1:
        raise TiffDecodeError(
            f"unsupported TIFF shape: bits={bits} spp={spp} planar={planar} "
            "(baseline 8-bit chunky only)"
        )
    if 322 in tags or 323 in tags:
        raise TiffDecodeError("tiled TIFF not supported (strips only)")
    if photo not in (0, 1, 2):
        raise TiffDecodeError(f"unsupported photometric {photo}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffDecodeError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)
    row_bytes = w * spp
    out = bytearray()
    for si, (soff, scount) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - si * rows_per_strip)
        if strip_rows <= 0:
            break
        expected = strip_rows * row_bytes
        raw = p[soff : soff + scount]
        if len(raw) < scount:
            raise TiffDecodeError(f"truncated TIFF strip {si}")
        if comp == 1:
            if len(raw) < expected:
                raise TiffDecodeError(f"short uncompressed strip {si}")
            data = raw[:expected]
        elif comp == 5:
            data = _tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            data = _packbits_decode(raw, expected)
        else:
            raise TiffDecodeError(
                f"unsupported TIFF compression {comp} "
                "(none/LZW/PackBits only)"
            )
        out += data
    a = np.frombuffer(bytes(out), np.uint8).reshape(h, w * spp)
    if predictor == 2:
        a = np.cumsum(
            a.reshape(h, w, spp).astype(np.int64), axis=1
        ) % 256
        a = a.astype(np.uint8).reshape(h, w * spp)
    elif predictor != 1:
        raise TiffDecodeError(f"unsupported predictor {predictor}")
    img = a.reshape(h, w, spp)
    if spp == 1:
        img = img[:, :, 0]
        if photo == 0:  # white-is-zero
            img = 255 - img
    return img.copy()


def encode_tiff(
    arr: "np.ndarray",
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int = 8,
    predictor: bool = False,
) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as a baseline strip
    TIFF (photometric 1 / 2). compression: "none" | "lzw" | "packbits";
    ``predictor`` applies horizontal differencing (LZW only, tag 317=2).
    Fixture builder, byte-exact round trip with decode_tiff."""
    a = np.asarray(arr).astype(np.uint8, copy=False)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise TiffDecodeError(f"expected (H, W) or (H, W, 3), got {a.shape}")
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp_id is None:
        raise TiffDecodeError(f"unknown compression {compression!r}")
    if predictor and comp_id != 5:
        raise TiffDecodeError("predictor=2 is paired with LZW here")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    bo = ">" if big_endian else "<"
    work = a.reshape(h, w, spp)
    if predictor:
        d = work.astype(np.int64)
        d = np.concatenate(
            [d[:, :1], (d[:, 1:] - d[:, :-1]) % 256], axis=1
        )
        work = d.astype(np.uint8)
    flat = work.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = flat[y0 : y0 + rows_per_strip].tobytes()
        if comp_id == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif comp_id == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    # layout: header(8) | strip data | IFD | out-of-line tag values
    entries: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries.append((256, 4, [w]))
    entries.append((257, 4, [h]))
    entries.append((258, 3, [8] * spp))
    entries.append((259, 3, [comp_id]))
    entries.append((262, 3, [1 if gray else 2]))
    entries.append((277, 3, [spp]))
    entries.append((278, 4, [rows_per_strip]))
    entries.append((284, 3, [1]))
    if predictor:
        entries.append((317, 3, [2]))

    data_start = 8
    offsets, pos = [], data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s) + (len(s) % 2)
    entries.append((273, 4, offsets))
    entries.append((279, 4, [len(s) for s in strips]))
    entries.sort()
    ifd_off = pos
    n_e = len(entries)
    extra_off = ifd_off + 2 + 12 * n_e + 4
    ifd = struct.pack(bo + "H", n_e)
    extra = bytearray()
    for tag, typ, vals in entries:
        letter, size = _TYPES[typ]
        packed = struct.pack(bo + letter * len(vals), *vals)
        ifd += struct.pack(bo + "HHI", tag, typ, len(vals))
        if len(packed) <= 4:
            ifd += packed + b"\x00" * (4 - len(packed))
        else:
            ifd += struct.pack(bo + "I", extra_off + len(extra))
            extra += packed
            if len(extra) % 2:
                extra += b"\x00"
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    out = bytearray((_MM if big_endian else _II))
    out += struct.pack(bo + "I", ifd_off)
    for s in strips:
        out += s
        if len(s) % 2:
            out += b"\x00"
    out += ifd + extra
    return bytes(out)
