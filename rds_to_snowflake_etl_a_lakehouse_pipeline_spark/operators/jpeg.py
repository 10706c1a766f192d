"""Pure-Python baseline JPEG codec — the last dependency-free tier of
the multimodal decode ladder (see ``operators/multimodal.py``).

Implements the baseline sequential DCT process of ITU-T T.81 (the
format the overwhelming majority of real-world JPEGs use): marker
parse, DQT/DHT tables, Huffman entropy decode with byte-unstuffing and
restart markers, dequantize + dezigzag, 8x8 IDCT, chroma upsampling
(any h/v sampling factors incl. 4:2:0), YCbCr->RGB. The matching
encoder (4:4:4, quality-scaled Annex K quantization tables, standard
Annex K Huffman tables) exists so fixtures can be generated in a
container with no imaging libraries at all.

Progressive (SOF2) JPEGs dispatch to the sibling
``operators/jpeg_progressive.py`` (spectral selection + successive
approximation — same dependency-free tier). Out of scope (falls through
to the PIL tier when importable, else the deterministic stub):
arithmetic-coded JPEG, 12-bit precision, CMYK, hierarchical. These
return None from every function here — callers fall through, never
crash.

Performance note: this is per-blob CPU work inside an Arrow batch
(``mapInPandas``) — payload-bounded, never corpus-bounded. The IDCT is
a precomputed-cosine separable transform in plain Python; for bulk
100 TB decoding you would swap tier 2 (PIL/libjpeg-turbo) in, which is
why the tiering exists. Correctness, not throughput, is this tier's
job.
"""

from __future__ import annotations

import struct

# zigzag order -> natural (row-major) order, per T.81 Figure A.6
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 quantization tables (luminance, chrominance), natural order
_K1_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_K2_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS counts per code length 1-16,
# HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# precomputed IDCT/FDCT cosine table: C[u][x] = cn(u) * cos((2x+1)uπ/16)
import math as _math

_COS = [
    [
        ((1 / _math.sqrt(2)) if u == 0 else 1.0)
        * _math.cos((2 * x + 1) * u * _math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]

# numpy fast path for the per-block transforms and whole-plane color
# conversion — the semantics are identical to the pure-Python loops
# (same matrices, same rounding); numpy ships in this container, but
# the codec stays correct without it
try:  # pragma: no cover - numpy is present here
    import numpy as _np

    _M = _np.array(_COS, dtype=_np.float64)        # [u, x]
    _MT = _M.T.copy()
except ImportError:  # pragma: no cover
    _np = None


def _idct_2d(coef: list[float]):
    """Separable 8x8 inverse DCT + level shift + clamp to 0..255.
    Returns an indexable of ints (numpy uint8 array on the fast path,
    plain list on the fallback) — callers only slice + bytes() it."""
    if _np is not None:
        fm = _np.asarray(coef, dtype=_np.float64).reshape(8, 8)
        p = (_MT @ fm @ _M) / 4.0 + 128.0
        return _np.clip(_np.rint(p), 0, 255).astype(_np.uint8).reshape(64)
    # rows: tmp[y][x] = sum_u C[u][x] * coef[y*8+u]
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        base = y * 8
        row = coef[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    s += _COS[u][x] * c
            tmp[y][x] = s
    out = [0] * 64
    for x in range(8):
        col = [tmp[y][x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                c = col[v]
                if c:
                    s += _COS[v][y] * c
            val = int(round(s / 4 + 128))
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def _fdct_2d(px) -> list[float]:
    """Separable 8x8 forward DCT over level-shifted samples."""
    if _np is not None:
        s = _np.asarray(px, dtype=_np.float64).reshape(8, 8) - 128.0
        return ((_M @ s @ _MT) / 4.0).reshape(64).tolist()
    shifted = [p - 128 for p in px]
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        base = y * 8
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += _COS[u][x] * shifted[base + x]
            tmp[y][u] = s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += _COS[v][y] * tmp[y][u]
            out[v * 8 + u] = s / 4
    return out


class _HuffDecoder:
    """Canonical Huffman decoder built from (BITS, HUFFVAL): codes of
    each length are consecutive, starting from (prev_code+1)<<1."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: unstuffs
    0xFF00, stops at (and reports) restart/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.marker is not None or self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # restart / EOI / next segment
                return False
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # pad past marker, per T.81 F.2.2.5 behavior
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, huff: _HuffDecoder) -> int | None:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = huff.lut.get((ln, code))
            if sym is not None:
                return sym
        return None

    def align_restart(self) -> bool:
        """Consume an RSTn marker between restart intervals."""
        self.buf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None
            return True
        # marker not buffered yet: scan directly
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        if p + 1 < len(d) and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _next_marker(b: bytes, pos: int):
    """(marker_code, offset_after_marker) at ``pos``, skipping the
    OPTIONAL 0xFF fill bytes T.81 B.1.1.2 allows before any marker;
    None when ``pos`` doesn't sit on a marker."""
    if pos >= len(b) or b[pos] != 0xFF:
        return None
    while pos + 1 < len(b) and b[pos + 1] == 0xFF:
        pos += 1
    if pos + 1 >= len(b):
        return None
    return b[pos + 1], pos + 2


def parse_jpeg_header(b: bytes):
    """(width, height, n_components) from the SOF0/SOF2 of a baseline
    or progressive Huffman JPEG; None for non-JPEG, other processes
    (lossless, arithmetic, 12-bit) or truncated payloads — header walk
    only, no entropy decode, never raises."""
    try:
        return _parse_jpeg_header_inner(b)
    except (IndexError, struct.error):
        return None


def _parse_jpeg_header_inner(b: bytes):
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        nm = _next_marker(b, pos)
        if nm is None:
            return None
        m, after = nm
        if m == 0xD9:
            return None
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos = after
            continue
        (seglen,) = struct.unpack_from(">H", b, after)
        if m in (0xC0, 0xC2):  # baseline or progressive Huffman
            prec, h, w, nc = struct.unpack_from(">BHHB", b, after + 2)
            if prec != 8 or w == 0 or h == 0 or nc not in (1, 3):
                return None
            return w, h, nc
        if m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic
        pos = after + seglen
    return None


def decode_jpeg(b: bytes, max_pixels: int = 1 << 26):
    """(width, height, channels, top-down row-major pixel bytes) for a
    baseline sequential OR progressive Huffman JPEG — gray (1 ch) or
    YCbCr (3 ch, any h/v sampling incl. 4:2:0), restart markers
    supported; SOF2 dispatches to ``jpeg_progressive``. None when ``b``
    is neither (caller falls through a tier). Pixels may differ from
    the encoder's source by small quantization error — JPEG is lossy;
    tests pin a tolerance, not bytes."""
    try:
        return _decode_jpeg_inner(b, max_pixels)
    except (IndexError, struct.error, KeyError, ZeroDivisionError):
        return None


def _decode_jpeg_inner(b: bytes, max_pixels: int):
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = []  # (id, h, v, tq)
    w = h = 0
    restart_interval = 0
    pos = 2
    scan = None
    adobe_transform = None
    while pos + 4 <= len(b):
        nm = _next_marker(b, pos)
        if nm is None:
            return None
        m, after = nm
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos = after
            continue
        (seglen,) = struct.unpack_from(">H", b, after)
        seg = b[after + 2 : after + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    return None  # 16-bit tables: not baseline
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[i + k]
                qt[tq] = tbl
                i += 64
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif m == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                return None
            if w * h > max_pixels:
                return None
            for c in range(nc):
                # SOF0 body: precision(1) height(2) width(2) ncomp(1),
                # then 3 bytes per component
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append([cid, hv >> 4, hv & 15, tq])
        elif m == 0xC2:  # SOF2: progressive Huffman — own decode path
            from .jpeg_progressive import decode_progressive

            return decode_progressive(b, max_pixels)
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            return None  # not baseline/progressive Huffman
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xEE:  # APP14 (Adobe): carries the color transform
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            pos = after + seglen
            break
        pos = after + seglen
    if scan is None or not comps or w == 0:
        return None
    if len(comps) == 3:
        # tier-1 contract is correctness: only the YCbCr convention is
        # implemented, and a rare-but-spec-legal RGB-coded baseline
        # JPEG (Adobe APP14 transform=0, or 'R','G','B' component ids)
        # would decode with silently wrong colors — return None so it
        # falls through to the PIL tier / stub instead
        if adobe_transform == 0:
            return None
        if [c[0] for c in comps] == [0x52, 0x47, 0x42]:  # 'R','G','B'
            return None
    if len(comps) == 1:
        # a single-component scan is NON-interleaved (T.81 A.2.2):
        # sampling factors only express ratios vs other components, so
        # declared h/v > 1 (some encoders write 0x22) must not create
        # multi-block MCUs — the block grid is just ceil(w/8) x ceil(h/8)
        comps[0][1] = comps[0][2] = 1

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane at sampled resolution (MCU-padded)
    planes = []
    for _, ch, cv, _ in comps:
        planes.append(bytearray(mcux * ch * 8 * mcuy * cv * 8))
    scan_by_comp = {cs: (td, ta) for cs, td, ta in scan}

    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not br.align_restart():
                    return None
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_by_comp[cid]
                dct, act = huff_dc.get(td), huff_ac.get(ta)
                q = qt.get(tq)
                if dct is None or act is None or q is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        t = br.decode(dct)
                        if t is None:
                            return None
                        diff = _extend(br.read_bits(t), t)
                        pred[ci] += diff
                        coef = [0.0] * 64
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = br.decode(act)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            nat = ZIGZAG[k]
                            coef[nat] = _extend(br.read_bits(s), s) * q[nat]
                            k += 1
                        px = _idct_2d(coef)
                        # paste into the component plane
                        pw = mcux * ch * 8
                        ox = (mx * ch + bx) * 8
                        oy = (my * cv + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = oy + yy
                            dst = row * pw + ox
                            plane[dst : dst + 8] = bytes(
                                px[yy * 8 : yy * 8 + 8]
                            )
            mcu_count += 1

    return _finish_pixels(comps, planes, w, h, mcux, mcuy, hmax, vmax)


def _finish_pixels(comps, planes, w, h, mcux, mcuy, hmax, vmax):
    """Assemble decoded component planes into the output pixel buffer:
    crop the MCU padding, nearest-upsample chroma, YCbCr→RGB. Shared by
    the baseline and progressive decoders — the entropy layers differ,
    the pixel pipeline is identical."""
    nc = len(comps)
    if nc == 1:
        plane = planes[0]
        pw = mcux * comps[0][1] * 8
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = plane[y * pw : y * pw + w]
        return w, h, 1, bytes(out)
    # upsample chroma (nearest) + YCbCr -> RGB
    pws = [mcux * c[1] * 8 for c in comps]
    phs = [mcuy * c[2] * 8 for c in comps]
    if _np is not None:
        # whole-plane vectorized path: fancy-index the nearest
        # upsample, then one matrix of fused arithmetic per channel
        up = []
        for ci in range(3):
            p2 = _np.frombuffer(bytes(planes[ci]), dtype=_np.uint8).reshape(
                phs[ci], pws[ci]
            )
            ys = _np.arange(h) * comps[ci][2] // vmax
            xs = _np.arange(w) * comps[ci][1] // hmax
            up.append(p2[ys][:, xs].astype(_np.float64))
        yv, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
        r = yv + 1.402 * cr
        g = yv - 0.344136 * cb - 0.714136 * cr
        bl = yv + 1.772 * cb
        rgb = _np.stack(
            [_np.floor(ch + 0.5) for ch in (r, g, bl)], axis=-1
        )
        return w, h, 3, _np.clip(rgb, 0, 255).astype(_np.uint8).tobytes()
    out = bytearray(w * h * 3)
    for y in range(h):
        yrow = y * w * 3
        for x in range(w):
            yv = planes[0][
                (y * comps[0][2] // vmax) * pws[0] + (x * comps[0][1] // hmax)
            ]
            cb = planes[1][
                (y * comps[1][2] // vmax) * pws[1] + (x * comps[1][1] // hmax)
            ]
            cr = planes[2][
                (y * comps[2][2] // vmax) * pws[2] + (x * comps[2][1] // hmax)
            ]
            r = yv + 1.402 * (cr - 128)
            g = yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            bl = yv + 1.772 * (cb - 128)
            o = yrow + x * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[o + 2] = 0 if bl < 0 else (255 if bl > 255 else int(bl + 0.5))
    return w, h, 3, bytes(out)


# ------------------------------------------------------------------ encoder


class _HuffEncoder:
    def __init__(self, bits: list[int], vals: list[int]):
        self.code: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.code[vals[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, ln: int, code: int) -> None:
        self.buf = (self.buf << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # 1-fill per T.81


def _scale_qtable(base: list[int], quality: int) -> list[int]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (v * scale + 50) // 100)) for v in base]


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) encoding of a signed coefficient, T.81 F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _quant_block(
    plane: bytes, pw: int, ph: int, x0: int, y0: int, q: list[int]
) -> list[int]:
    """FDCT + quantize one 8x8 block sampled at (x0, y0) from a plane
    of size (pw, ph), edge-clamped — natural-order integer coefficients
    (shared by the baseline and progressive encoders, so both produce
    IDENTICAL coefficients for the same source and quality)."""
    block = [0] * 64
    for yy in range(8):
        sy = min(y0 + yy, ph - 1)
        for xx in range(8):
            sx = min(x0 + xx, pw - 1)
            block[yy * 8 + xx] = plane[sy * pw + sx]
    coef = _fdct_2d(block)
    if _np is not None:
        c = _np.asarray(coef) / _np.asarray(q, dtype=_np.float64)
        # round half away from zero, matching the pure-path int() trunc
        return _np.trunc(c + _np.where(c >= 0, 0.5, -0.5)).astype(int).tolist()
    quant = [0] * 64
    for k in range(64):
        c = coef[k] / q[k]
        quant[k] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
    return quant


def _encode_block(
    bw: _BitWriter,
    plane: bytes,
    pw: int,
    ph: int,
    x0: int,
    y0: int,
    q: list[int],
    enc_dc: _HuffEncoder,
    enc_ac: _HuffEncoder,
    pred: list[int],
    ci: int,
) -> None:
    """Huffman-encode one quantized 8x8 block (baseline sequential)."""
    quant = _quant_block(plane, pw, ph, x0, y0, q)
    diff = quant[0] - pred[ci]
    pred[ci] = quant[0]
    t, bits = _mag_bits(diff)
    ln, code = enc_dc.code[t]
    bw.write(ln, code)
    if t:
        bw.write(t, bits)
    run = 0
    zz = [quant[ZIGZAG[k]] for k in range(64)]
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = enc_ac.code[0xF0]  # ZRL
            bw.write(ln, code)
            run -= 16
        t, bits = _mag_bits(v)
        ln, code = enc_ac.code[(run << 4) | t]
        bw.write(ln, code)
        bw.write(t, bits)
        run = 0
    if last_nz < 63:
        ln, code = enc_ac.code[0x00]  # EOB
        bw.write(ln, code)


def _prepare_planes(
    width: int, height: int, pixels: bytes, channels: int,
    quality: int, subsampling: str,
):
    """Validate, color-convert, and (optionally) subsample the input
    into per-component planes with their quant tables and sampling
    factors — the shared front half of the baseline and progressive
    encoders. Returns (planes, dims, hv, qts, qluma, qchroma)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer must be width*height*channels bytes")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if subsampling == "420" and channels != 3:
        subsampling = "444"
    qluma = _scale_qtable(_K1_LUMA, quality)
    qchroma = _scale_qtable(_K2_CHROMA, quality)

    # color convert to per-component full-res planes
    if channels == 1:
        planes = [pixels]
        qts = [qluma]
    elif _np is not None:
        px = _np.frombuffer(pixels, dtype=_np.uint8).reshape(-1, 3).astype(
            _np.float64
        )
        r, g, bl = px[:, 0], px[:, 1], px[:, 2]
        yv = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128
        planes = [
            _np.clip(_np.floor(p + 0.5), 0, 255).astype(_np.uint8).tobytes()
            for p in (yv, cb, cr)
        ]
        qts = [qluma, qchroma, qchroma]
    else:
        n = width * height
        ybuf = bytearray(n)
        cbbuf = bytearray(n)
        crbuf = bytearray(n)
        for i in range(n):
            r, g, bl = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * bl
            cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128
            ybuf[i] = max(0, min(255, int(yv + 0.5)))
            cbbuf[i] = max(0, min(255, int(cb + 0.5)))
            crbuf[i] = max(0, min(255, int(cr + 0.5)))
        planes = [bytes(ybuf), bytes(cbbuf), bytes(crbuf)]
        qts = [qluma, qchroma, qchroma]

    if subsampling == "420":
        # box-average chroma down 2x in each dimension
        cw, chh = (width + 1) // 2, (height + 1) // 2
        small = []
        for plane in planes[1:]:
            sb = bytearray(cw * chh)
            for sy in range(chh):
                for sx in range(cw):
                    acc = cnt = 0
                    for dy in range(2):
                        for dx in range(2):
                            yy, xx = sy * 2 + dy, sx * 2 + dx
                            if yy < height and xx < width:
                                acc += plane[yy * width + xx]
                                cnt += 1
                    sb[sy * cw + sx] = (acc + cnt // 2) // cnt
            small.append(bytes(sb))
        planes = [planes[0]] + small
        dims = [(width, height), (cw, chh), (cw, chh)]
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        dims = [(width, height)] * channels
        hv = [(1, 1)] * channels
    return planes, dims, hv, qts, qluma, qchroma



def encode_jpeg(
    width: int, height: int, pixels: bytes, channels: int = 3,
    quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Serialize a top-down row-major 8-bit buffer (gray or RGB) as a
    BASELINE sequential JPEG (quality-scaled Annex K quant tables,
    standard Annex K Huffman tables) — the fixture-side inverse of
    :func:`decode_jpeg`, dependency-free. Lossy: roundtrip matches
    within quantization error, exactness is not the contract.

    ``subsampling``: ``"444"`` (one block per component per MCU) or
    ``"420"`` (RGB only: 2x2 luma blocks + one block each of 2x-
    downsampled Cb/Cr per MCU — the dominant real-world layout).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (resets DC prediction), exercising the decoder's resync
    path."""
    planes, dims, hv, qts, qluma, qchroma = _prepare_planes(
        width, height, pixels, channels, quality, subsampling
    )

    enc_dc = [_HuffEncoder(*_DC_LUMA), _HuffEncoder(*_DC_CHROMA)]
    enc_ac = [_HuffEncoder(*_AC_LUMA), _HuffEncoder(*_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * channels
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * channels
            for ci in range(channels):
                ch, cv = hv[ci]
                pw, ph = dims[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        _encode_block(
                            bw, planes[ci], pw, ph,
                            (mx * ch + bx) * 8, (my * cv + by) * 8,
                            qts[ci], enc_dc[tsel], enc_ac[tsel], pred, ci,
                        )
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT
    dqt = bytes([0x00]) + bytes(qluma[ZIGZAG[k]] for k in range(64))
    if channels == 3:
        dqt += bytes([0x01]) + bytes(qchroma[ZIGZAG[k]] for k in range(64))
    out += seg(0xDB, dqt)
    # SOF0 with per-component sampling factors
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sof += struct.pack(
            ">BBB", ci + 1, (hv[ci][0] << 4) | hv[ci][1],
            0 if ci == 0 else 1,
        )
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    # DHT
    dht = b""
    for cls, (bits, vals) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA)):
        dht += bytes([cls]) + bytes(bits) + bytes(vals)
    if channels == 3:
        for cls, (bits, vals) in ((0x01, _DC_CHROMA), (0x11, _AC_CHROMA)):
            dht += bytes([cls]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, dht)
    # SOS
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
