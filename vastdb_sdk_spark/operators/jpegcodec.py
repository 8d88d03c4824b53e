"""Pure-numpy baseline JPEG codec (ITU T.81 sequential DCT) for the
multimodal decode seams.

JPEG is the format a real 100 TB multimodal corpus contains more of than
everything else combined, and the container ships no image libraries —
this module closes the last big gap in the dependency-free codec tier
(imagecodec.py: BMP / PNM / PNG), straight from the public spec:

- **Decoder** (``decode_jpeg``): marker walk (SOI, APPn/COM skipped, DQT
  8/16-bit, SOF0/SOF1, DHT, DRI, SOS, RSTn, EOI), canonical Huffman
  table construction from BITS/HUFFVAL (T.81 Annex C), entropy-coded
  segment bit reader with 0xFF00 byte unstuffing, per-MCU interleaved
  block decode (DC predictor + EXTEND, AC run/size with ZRL/EOB),
  dequantize -> inverse zigzag -> exact orthonormal 8x8 IDCT (matrix
  form, float64) -> level shift, restart-interval predictor resets,
  integer-ratio chroma upsampling, JFIF full-range BT.601 YCbCr->RGB.
  Grayscale (1 component) and YCbCr (3 component) baseline streams with
  arbitrary 1/2/4 sampling factors. Progressive (SOF2), arithmetic
  coding, and hierarchical modes are refused loudly.
- **Encoder** (``encode_jpeg``): the fixture builder — 4:4:4 or 4:2:0,
  Annex-K-style quality-scaled quantization, FDCT via the same
  orthonormal matrix, and GENERATED flat canonical Huffman tables (all
  DC categories at 4 bits, all 162 AC run/size symbols at 8 bits —
  valid per Annex C with the all-ones code unused, so any conforming
  decoder reads our streams; we trade compression for not embedding
  Annex K's 162-entry value lists).

Round trips are lossy by construction (quantization), so tests pin
decode(encode(x)) within the quantization error bound plus EXACT cases
(flat blocks quantize error-free) and hand-built bitstreams replayed
against an independent test-side IDCT. Per-payload Python invoked from
Arrow-batched mapInPandas pipelines — the Spark-side plumbing is the
existing multimodal seam; this is the leaf the batches call.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageDecodeError


class JpegDecodeError(ImageDecodeError):
    """Malformed or unsupported JPEG payload (loud, never a fake)."""


# ---------------------------------------------------------------------------
# Shared tables

#: zig-zag scan order (T.81 Figure 5): ZIGZAG[k] = raster index of the
#: k-th coefficient in transmission order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: orthonormal 8x8 DCT-II matrix: forward F = C @ f @ C.T, inverse
#: f = C.T @ F @ C (exact in float64 to ~1e-13).
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _C[_k] = _s * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)

#: Annex-K-shaped base quantization tables (the canonical public
#: luminance/chrominance matrices, raster order).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _quality_scale(base: "np.ndarray", quality: int) -> "np.ndarray":
    """The public libjpeg-style quality mapping (50 = base tables)."""
    if not 1 <= quality <= 100:
        raise JpegDecodeError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# Huffman tables (canonical, T.81 Annex C)


class _HuffTable:
    """Canonical Huffman decode table from (BITS[1..16], HUFFVAL): the
    spec's mincode/maxcode/valptr arrays — O(code length) per symbol."""

    def __init__(self, bits: list[int], values: bytes):
        if len(bits) != 16 or sum(bits) != len(values):
            raise JpegDecodeError(
                f"bad DHT: counts {sum(bits)} != values {len(values)}"
            )
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                self.maxcode[length] = code + n - 1
                code += n
                k += n
            code <<= 1
            if code > (1 << length + 1):
                raise JpegDecodeError("overfull Huffman table in DHT")


def _flat_huff(symbols: list[int], length: int) -> tuple[list[int], bytes]:
    """(BITS, HUFFVAL) putting every symbol at the same code length —
    valid canonical table when 2**length > len(symbols) (the all-ones
    code stays unused, as Annex C requires of length-16 codes)."""
    if len(symbols) >= (1 << length):
        raise JpegDecodeError("flat Huffman table too small")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, bytes(symbols)


_ENC_DC_BITS, _ENC_DC_VALS = _flat_huff(list(range(12)), 4)
# run/size symbols plus EOBn (r<<4 for r=0..14: EOB runs, progressive)
# and ZRL — 177 symbols, all at 8 bits (2**8 > 177 keeps it canonical)
_ENC_AC_BITS, _ENC_AC_VALS = _flat_huff(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
    8,
)


def _huff_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder (Annex C code gen)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# Bit I/O over entropy-coded segments


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; stops at any non-stuffing marker (RSTn handled by the
    MCU loop via expect_restart)."""

    def __init__(self, payload: bytes, pos: int):
        self.p = payload
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.p[self.pos]
        if b == 0xFF:
            nxt = self.p[self.pos + 1] if self.pos + 1 < len(self.p) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached: per F.2.2.5 missing bits read as 1s
                # (a correct stream never consumes them into coefficients)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.p):
                raise JpegDecodeError("truncated entropy-coded segment")
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, tbl: _HuffTable) -> int:
        code = self.read_bit()
        for length in range(1, 17):
            if code <= tbl.maxcode[length]:
                return tbl.values[
                    tbl.valptr[length] + code - tbl.mincode[length]
                ]
            code = (code << 1) | self.read_bit()
        raise JpegDecodeError("invalid Huffman code in entropy data")

    def expect_restart(self, m: int) -> None:
        """Byte-align and consume the RSTm marker (F.2.2.5)."""
        self.n = 0  # discard alignment bits
        if self.pos + 2 > len(self.p) or self.p[self.pos] != 0xFF:
            raise JpegDecodeError("expected restart marker")
        got = self.p[self.pos + 1]
        if got != 0xD0 + m:
            raise JpegDecodeError(
                f"restart marker out of order: got {got:#x}, "
                f"expected {0xD0 + m:#x}"
            )
        self.pos += 2


class _BitWriter:
    """MSB-first bit writer with 0xFF00 stuffing; 1-padded flush."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0xFF, 8 - self.n)  # pad with 1s per F.1.2.3
        return bytes(self.out)


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Size category: smallest t with |v| < 2**t."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Decode a baseline (SOF0/SOF1, sequential DCT) or PROGRESSIVE
    (SOF2: spectral selection + successive approximation, DC/AC first
    and refinement scans, EOB runs) Huffman JPEG to (H, W) uint8
    grayscale or (H, W, 3) uint8 RGB. Arithmetic coding / hierarchical /
    lossless / 12-bit modes refused loudly."""
    p = bytes(payload)
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        raise JpegDecodeError("not a JPEG payload (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    store = None  # progressive coefficient accumulator, per component
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise JpegDecodeError(f"marker desync at offset {pos}")
        marker = p[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", p, pos + 2)
        seg = p[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    raise JpegDecodeError(f"bad DQT precision {pq}")
                quant[tq] = tbl  # kept in zigzag (transmission) order
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise JpegDecodeError(f"only 8-bit precision (got {prec})")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {
                "w": w, "h": h, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegDecodeError(
                f"unsupported JPEG process SOF{marker - 0xC0} "
                "(baseline/extended sequential + progressive Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegDecodeError("SOS before SOF")
            ns = seg[0]
            data_pos = pos + 2 + seglen
            if not frame["progressive"]:
                scan = {}
                for c in range(ns):
                    cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                    scan[cid] = (tdta >> 4, tdta & 15)
                return _decode_scan(
                    p, data_pos, frame, scan, quant, huff_dc, huff_ac,
                    restart_interval,
                )
            scan_comps = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tdta >> 4, tdta & 15))
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 15
            if store is None:
                store = _alloc_store(frame)
            pos = _decode_progressive_scan(
                p, data_pos, frame, store, scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if frame is not None and frame["progressive"] and store is not None:
        return _render_coefficients(frame, store, quant)
    raise JpegDecodeError("no SOS marker (no image data)")


def _decode_scan(p, pos, frame, scan, quant, huff_dc, huff_ac, ri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0:
        raise JpegDecodeError(f"bad frame dims {w}x{h}")
    if len(comps) not in (1, 3) or len(scan) != len(comps):
        raise JpegDecodeError(
            f"only single-scan grayscale/YCbCr supported "
            f"({len(comps)} comps, {len(scan)} in scan)"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise JpegDecodeError(f"bad sampling {c['h']}x{c['v']}")
        if hmax % c["h"] or vmax % c["v"]:
            raise JpegDecodeError("non-integer chroma subsampling ratio")
        if c["tq"] not in quant:
            raise JpegDecodeError(f"missing quant table {c['tq']}")
        if c["id"] not in scan:
            raise JpegDecodeError(f"component {c['id']} missing from scan")
        td, ta = scan[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegDecodeError(f"missing Huffman table dc{td}/ac{ta}")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    preds = [0] * len(comps)
    br = _BitReader(p, pos)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if ri and m and m % ri == 0:
            br.expect_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            td, ta = scan[c["id"]]
            q = quant[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    t = br.decode_symbol(huff_dc[td])
                    if t > 11:
                        raise JpegDecodeError(f"bad DC category {t}")
                    preds[ci] += _extend(br.receive(t), t)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(huff_ac[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegDecodeError("AC index overflow")
                        zz[k] = _extend(br.receive(s), s)
                        k += 1
                    coefs = np.zeros(64)
                    # zz and q are both in zigzag order; scatter to raster
                    coefs[ZIGZAG] = (zz * q).astype(np.float64)
                    block = _C.T @ coefs.reshape(8, 8) @ _C + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for c, plane in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, 0), fx, 1)
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G): coefficients accumulate across
# scans in a per-component store (zigzag order per block), rendered once
# at EOI.


def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y) plus per-component padded block grid
    (MCU-interleaved geometry) and exact block grid (non-interleaved
    geometry, from the component's true sample dimensions)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0:
        raise JpegDecodeError(f"bad frame dims {w}x{h}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        geo.append(
            {
                "pad_bx": mcus_x * c["h"],
                "pad_by": mcus_y * c["v"],
                "bx": -(-cw // 8),
                "by": -(-ch // 8),
            }
        )
    return hmax, vmax, mcus_x, mcus_y, geo


def _alloc_store(frame):
    _, _, _, _, geo = _frame_geometry(frame)
    return [
        np.zeros((g["pad_by"], g["pad_bx"], 64), np.int32) for g in geo
    ]


def _decode_progressive_scan(
    p, pos, frame, store, scan_comps, ss, se, ah, al, huff_dc, huff_ac, ri
):
    """Decode one progressive scan into the coefficient store and return
    the stream position of the next marker. Implements DC first/refine
    (interleaved or single-component) and AC first/refine with EOB runs
    (always single-component per T.81 G.1.1.1.1)."""
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y, geo = _frame_geometry(frame)
    idx_of = {c["id"]: i for i, c in enumerate(comps)}
    members = []
    for cid, td, ta in scan_comps:
        if cid not in idx_of:
            raise JpegDecodeError(f"scan component {cid} not in frame")
        members.append((idx_of[cid], td, ta))
    if not 0 <= ss <= se <= 63 or ah > 13 or al > 13:
        raise JpegDecodeError(f"bad spectral params Ss={ss} Se={se}")
    if ss == 0 and se != 0:
        raise JpegDecodeError("DC and AC mixed in one progressive scan")
    if ss > 0 and len(members) != 1:
        raise JpegDecodeError("progressive AC scan must be single-component")
    br = _BitReader(p, pos)
    rst_state = {"rst": 0, "preds": [0] * len(comps), "eobrun": 0}

    def maybe_restart(unit):
        if ri and unit and unit % ri == 0:
            br.expect_restart(rst_state["rst"])
            rst_state["rst"] = (rst_state["rst"] + 1) & 7
            rst_state["preds"] = [0] * len(comps)
            rst_state["eobrun"] = 0

    if ss == 0:
        # ---- DC scan ----
        if len(members) > 1:
            units = mcus_x * mcus_y  # interleaved over MCUs
        else:
            ci0 = members[0][0]
            units = geo[ci0]["bx"] * geo[ci0]["by"]
        for u in range(units):
            maybe_restart(u)
            if len(members) > 1:
                my, mx = divmod(u, mcus_x)
                for ci, td, _ in members:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _dc_unit(
                                br, store[ci],
                                my * c["v"] + by, mx * c["h"] + bx,
                                huff_dc, td, ah, al, rst_state, ci,
                            )
            else:
                ci, td, _ = members[0]
                by, bx = divmod(u, geo[ci]["bx"])
                _dc_unit(br, store[ci], by, bx, huff_dc, td, ah, al,
                         rst_state, ci)
    else:
        # ---- AC scan (single component, exact block grid) ----
        ci, _, ta = members[0]
        if ta not in huff_ac:
            raise JpegDecodeError(f"missing Huffman table ac{ta}")
        tbl = huff_ac[ta]
        coef = store[ci]
        units = geo[ci]["bx"] * geo[ci]["by"]
        for u in range(units):
            maybe_restart(u)
            by, bx = divmod(u, geo[ci]["bx"])
            if ah == 0:
                _ac_first(br, coef[by, bx], tbl, ss, se, al, rst_state)
            else:
                _ac_refine(br, coef[by, bx], tbl, ss, se, al, rst_state)
    # resync: advance to the next real marker (skip stuffing + RSTn)
    pos = br.pos
    n = len(p)
    while pos + 1 < n:
        if p[pos] == 0xFF and p[pos + 1] not in (0x00, 0xFF) and not (
            0xD0 <= p[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _dc_unit(br, coef, by, bx, huff_dc, td, ah, al, rst_state, ci):
    if ah == 0:
        if td not in huff_dc:
            raise JpegDecodeError(f"missing Huffman table dc{td}")
        t = br.decode_symbol(huff_dc[td])
        if t > 11:
            raise JpegDecodeError(f"bad DC category {t}")
        rst_state["preds"][ci] += _extend(br.receive(t), t)
        coef[by, bx, 0] = rst_state["preds"][ci] << al
    else:
        if br.read_bit():
            coef[by, bx, 0] |= 1 << al


def _ac_first(br, zz, tbl, ss, se, al, rst_state):
    """AC first scan for one block (zz = that block's 64 zigzag coefs)."""
    if rst_state["eobrun"] > 0:
        rst_state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode_symbol(tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            rst_state["eobrun"] = (1 << r) - 1
            if r:
                rst_state["eobrun"] += br.receive(r)
            break
        k += r
        if k > se:
            raise JpegDecodeError("AC index past Se in progressive scan")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, zz, tbl, ss, se, al, rst_state):
    """AC refinement for one block (T.81 G.2 / the libjpeg-equivalent
    correction-bit walk): newly-significant coefficients arrive as +-1
    at bit position al; every nonzero-history coefficient passed on the
    way contributes one correction bit; EOB runs carry correction bits
    for the remainder of the band."""
    p1 = 1 << al
    k = ss
    if rst_state["eobrun"] == 0:
        while k <= se:
            rs = br.decode_symbol(tbl)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    rst_state["eobrun"] = (1 << r)
                    if r:
                        rst_state["eobrun"] += br.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegDecodeError(
                        f"AC refinement sent size {s} (must be 1)"
                    )
                val = p1 if br.read_bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit() and (abs(int(zz[k])) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    if r == 0:
                        if val:
                            zz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if rst_state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read_bit() and (abs(int(zz[k])) & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        rst_state["eobrun"] -= 1


def _render_coefficients(frame, store, quant):
    """Dequantize + IDCT the accumulated store into the final image
    (shared tail with the baseline path's per-block pipeline)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax, _, _, geo = _frame_geometry(frame)
    out_planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in quant:
            raise JpegDecodeError(f"missing quant table {c['tq']}")
        q = quant[c["tq"]]
        g = geo[ci]
        plane = np.zeros((g["pad_by"] * 8, g["pad_bx"] * 8))
        for by in range(g["pad_by"]):
            for bx in range(g["pad_bx"]):
                zz = store[ci][by, bx].astype(np.int64)
                if not zz.any():
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128.0
                    continue
                coefs = np.zeros(64)
                coefs[ZIGZAG] = (zz * q).astype(np.float64)
                block = _C.T @ coefs.reshape(8, 8) @ _C + 128.0
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, 0), fx, 1)
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g2 = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g2, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (fixture builder)


def _encode_block(
    wtr: _BitWriter,
    block: "np.ndarray",
    q: "np.ndarray",
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    coefs = _C @ (block - 128.0) @ _C.T
    zz = np.rint(coefs.reshape(64)[ZIGZAG] / q[ZIGZAG].astype(np.float64))
    zz = np.clip(zz, -1023, 1023).astype(np.int64)
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        v = int(zz[k])
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)
    return int(zz[0])


def _flush_eobrun(wtr, ac_codes, eobrun: int) -> int:
    """Emit a pending EOBn run (progressive AC): symbol (r<<4)|0 where
    eobrun in [2**r, 2**(r+1)), followed by r magnitude bits."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(eobrun - (1 << r), r)
    return 0


def _encode_progressive_scans(
    padded, comps, qts, mcus_x, mcus_y, w, h, hmax, vmax, dc_codes, ac_codes
):
    """Entropy-code the progressive scan sequence: DC first (interleaved,
    Al=1), DC refinement (raw bit per block), then one full-band AC scan
    per component (Al=0) with EOB-run accumulation. Returns
    [(sos_body, entropy_bytes), ...]."""
    store = []
    for c, plane, q in zip(comps, padded, qts):
        pad_by, pad_bx = plane.shape[0] // 8, plane.shape[1] // 8
        zzs = np.zeros((pad_by, pad_bx, 64), np.int64)
        qz = q[ZIGZAG].astype(np.float64)
        for by in range(pad_by):
            for bx in range(pad_bx):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coefs = _C @ (block - 128.0) @ _C.T
                zzs[by, bx] = np.clip(
                    np.rint(coefs.reshape(64)[ZIGZAG] / qz), -1023, 1023
                )
        store.append(zzs)

    def sos_body(members, ss, se, ah, al):
        body = bytes([len(members)])
        for cid, td, ta in members:
            body += bytes([cid, (td << 4) | ta])
        return body + bytes([ss, se, (ah << 4) | al])

    def dc_blocks():
        """(ci, by, bx) in interleaved MCU order — both DC scans and the
        decoder walk blocks identically."""
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield ci, my * c["v"] + by, mx * c["h"] + bx

    scans = []
    all_members = [(c["id"], 0, 0) for c in comps]
    # scan 1: DC first at Al=1 (successive approximation)
    wtr = _BitWriter()
    preds = [0] * len(comps)
    for ci, by, bx in dc_blocks():
        v = int(store[ci][by, bx, 0]) >> 1  # arithmetic shift per G.1.2.1
        diff = v - preds[ci]
        preds[ci] = v
        t = _category(diff)
        code, ln = dc_codes[t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    scans.append((sos_body(all_members, 0, 0, 0, 1), wtr.flush()))
    # scan 2: DC refinement — one raw bit (bit 0 of the value) per block
    wtr = _BitWriter()
    for ci, by, bx in dc_blocks():
        wtr.write(int(store[ci][by, bx, 0]) & 1, 1)
    scans.append((sos_body(all_members, 0, 0, 1, 0), wtr.flush()))
    # per-component AC scans: full band 1..63, Al=0, exact block grid
    for ci, c in enumerate(comps):
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        bx_n = -(-cw // 8)
        by_n = -(-ch // 8)
        wtr = _BitWriter()
        eobrun = 0
        for u in range(bx_n * by_n):
            by, bx = divmod(u, bx_n)
            zz = store[ci][by, bx]
            nz = np.nonzero(zz[1:])[0]
            if nz.size == 0:
                eobrun += 1
                if eobrun == 32767:
                    eobrun = _flush_eobrun(wtr, ac_codes, eobrun)
                continue
            eobrun = _flush_eobrun(wtr, ac_codes, eobrun)
            last = int(nz[-1]) + 1
            k, run = 1, 0
            while k <= last:
                v = int(zz[k])
                if v == 0:
                    run += 1
                else:
                    while run >= 16:
                        code, ln = ac_codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                k += 1
            if last < 63:
                eobrun += 1  # this block's EOB joins the next run
        _flush_eobrun(wtr, ac_codes, eobrun)
        scans.append(
            (sos_body([(c["id"], 0, 0)], 1, 63, 0, 0), wtr.flush())
        )
    return scans


def encode_jpeg(
    arr: "np.ndarray",
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W) uint8 grayscale or (H, W, 3) uint8 RGB as a
    baseline JFIF JPEG (4:4:4 or 4:2:0 for color; DRI + RSTn emitted
    when ``restart_interval`` > 0), or as a PROGRESSIVE (SOF2) stream
    when ``progressive=True``: DC-first-at-Al=1 + DC-refinement +
    per-component full-band AC scans with EOB runs — exercising the
    successive-approximation and spectral-selection decode paths with
    identical pixel results. Spec-valid streams any conforming decoder
    reads; lossy round trip with decode_jpeg bounded by the
    quantization tables at the given quality."""
    a = np.asarray(arr)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise JpegDecodeError(f"expected (H, W) or (H, W, 3), got {a.shape}")
    if subsampling not in ("444", "420"):
        raise JpegDecodeError(f"subsampling must be 444 or 420, got {subsampling}")
    a = a.astype(np.float64)
    h, w = a.shape[:2]
    if h <= 0 or w <= 0:
        raise JpegDecodeError(f"bad dims {w}x{h}")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    dc_codes = _huff_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _huff_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        planes = [a]
        qts = [ql]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average chroma over 2x2 (pad odd edges by replication)
            def half(p):
                py = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    py[0::2, 0::2] + py[1::2, 0::2]
                    + py[0::2, 1::2] + py[1::2, 1::2]
                ) / 4.0

            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
            planes = [y, half(cb), half(cr)]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
            planes = [y, cb, cr]
        qts = [ql, qc, qc]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for c, plane in zip(comps, planes):
        ph = mcus_y * c["v"] * 8
        pw = mcus_x * c["h"] * 8
        padded.append(
            np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
        )

    if progressive:
        if restart_interval:
            raise JpegDecodeError(
                "restart_interval with progressive not supported by this "
                "fixture encoder"
            )
        scans = _encode_progressive_scans(
            padded, comps, qts, mcus_x, mcus_y, w, h, hmax, vmax,
            dc_codes, ac_codes,
        )
    else:
        wtr = _BitWriter()
        preds = [0] * len(comps)
        rst = 0
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                wtr.out = bytearray(wtr.flush())  # byte-align (1-padded)
                wtr.acc = wtr.n = 0
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            my, mx = divmod(m, mcus_x)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        preds[ci] = _encode_block(
                            wtr,
                            padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                            qts[ci],
                            preds[ci],
                            dc_codes,
                            ac_codes,
                        )
        entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = [b"\xff\xd8"]
    out.append(
        seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    zl = ql[ZIGZAG]  # raster -> zigzag storage order
    out.append(seg(0xDB, bytes([0x00]) + bytes(zl.astype(np.uint8))))
    if not gray:
        zc = qc[ZIGZAG]
        out.append(seg(0xDB, bytes([0x01]) + bytes(zc.astype(np.uint8))))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c, _ in zip(comps, planes):
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out.append(seg(0xC2 if progressive else 0xC0, sof))
    out.append(
        seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS)
    )
    out.append(
        seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    )
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    if progressive:
        for sos_body, entropy in scans:
            out.append(seg(0xDA, sos_body))
            out.append(entropy)
    else:
        sos = bytes([len(comps)])
        for c in comps:
            sos += bytes([c["id"], 0x00])
        sos += bytes([0, 63, 0])
        out.append(seg(0xDA, sos))
        out.append(entropy)
    out.append(b"\xff\xd9")
    return b"".join(out)
