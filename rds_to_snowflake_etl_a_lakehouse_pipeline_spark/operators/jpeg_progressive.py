"""Pure-Python PROGRESSIVE JPEG codec — closes the last documented gap
in the dependency-free decode ladder (``operators/jpeg.py`` handles
baseline sequential; this module handles the SOF2 progressive DCT
process of ITU-T T.81 Annex G: spectral selection + successive
approximation, DC and AC first/refinement scans, EOB runs, Huffman
tables redefined between scans, restart markers).

Decode model: coefficients accumulate across scans into per-block
integer arrays; after the last scan everything dequantizes + IDCTs once
and reuses the baseline decoder's pixel pipeline (``_finish_pixels`` —
MCU-crop, chroma upsample, YCbCr→RGB), so the two processes share every
line below the entropy layer.

The matching encoder exists for the same reason the baseline one does:
fixtures must be generatable in a container with no imaging libraries.
It quantizes through the SAME ``_quant_block`` as the baseline encoder
— so a progressive encode of an image decodes to EXACTLY the pixels of
a baseline encode at the same quality (the round-trip equality the
tests pin) — and emits a classic 10-scan script (DC first at Al=1, AC
spectral bands at two approximation levels, DC+AC refinement scans)
with per-scan OPTIMAL Huffman tables built by the T.81 K.2 algorithm
(the Annex K baseline tables lack the EOBn symbols progressive AC
scans need).

Still out of scope (PIL tier / stub): arithmetic coding, 12-bit
precision, hierarchical. Per-blob CPU inside an Arrow batch — the
correctness tier, not the throughput tier (see jpeg.py's note).
"""

from __future__ import annotations

import struct

from .jpeg import (
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _extend,
    _finish_pixels,
    _idct_2d,
    _HuffDecoder,
    _HuffEncoder,
    _next_marker,
    _prepare_planes,
    _quant_block,
)


def decode_progressive(b: bytes, max_pixels: int = 1 << 26):
    """(width, height, channels, top-down row-major pixel bytes) for a
    progressive (SOF2) Huffman JPEG; None when ``b`` is not one or is
    structurally broken (caller falls through a tier)."""
    try:
        return _decode_inner(b, max_pixels)
    except (IndexError, struct.error, KeyError, ZeroDivisionError,
            ValueError):
        return None


def _skip_to_marker(b: bytes, pos: int) -> int:
    """First position at/after ``pos`` holding a real marker (0xFF
    followed by neither 0x00 stuffing nor another 0xFF fill)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _decode_inner(b: bytes, max_pixels: int):
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[list[int]] = []
    coefs: list[list[list[int]]] = []
    w = h = 0
    restart_interval = 0
    adobe_transform = None
    geom = None
    pos = 2
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
                    return None  # 16-bit tables: not 8-bit precision
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[i + k]
                qt[tq] = tbl
                i += 64
        elif m == 0xC4:  # DHT — tables are REDEFINED between scans
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif m == 0xC2:  # SOF2
            if comps:
                return None  # one frame only
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                return None
            if w * h > max_pixels:
                return None
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append([cid, hv >> 4, hv & 15, tq])
            if nc == 1:
                # non-interleaved single component: sampling factors are
                # ratios only (same convention as the baseline decoder)
                comps[0][1] = comps[0][2] = 1
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            geom = (hmax, vmax, mcux, mcuy)
            for _, ch, cv, _ in comps:
                coefs.append(
                    [[0] * 64 for _ in range(mcux * ch * mcuy * cv)]
                )
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            return None  # some other frame type snuck in
        elif m == 0xDD:  # DRI — may change between scans
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xEE:  # APP14 (Adobe) color transform
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif m == 0xDA:  # SOS — one of possibly many scans
            if geom is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos = _decode_scan(
                b, after + seglen, scan, ss, se, ah, al,
                comps, coefs, geom, huff_dc, huff_ac, restart_interval,
                w, h,
            )
            pos = _skip_to_marker(b, pos)
            continue
        pos = after + seglen
    if geom is None or not comps:
        return None
    if len(comps) == 3:
        # same RGB-coded guard as the baseline tier: only the YCbCr
        # convention is implemented
        if adobe_transform == 0:
            return None
        if [c[0] for c in comps] == [0x52, 0x47, 0x42]:
            return None
    hmax, vmax, mcux, mcuy = geom
    # all scans consumed: dequantize + IDCT every block into planes
    planes = []
    for ci, (_, ch, cv, tq) in enumerate(comps):
        q = qt.get(tq)
        if q is None:
            return None
        bw_i = mcux * ch
        pw = bw_i * 8
        plane = bytearray(pw * mcuy * cv * 8)
        for bi, blk in enumerate(coefs[ci]):
            deq = [blk[k] * q[k] for k in range(64)]
            px = _idct_2d(deq)
            ox = (bi % bw_i) * 8
            oy = (bi // bw_i) * 8
            for yy in range(8):
                dst = (oy + yy) * pw + ox
                plane[dst : dst + 8] = bytes(px[yy * 8 : yy * 8 + 8])
        planes.append(plane)
    return _finish_pixels(comps, planes, w, h, mcux, mcuy, hmax, vmax)


def _decode_scan(
    b, pos, scan, ss, se, ah, al, comps, coefs, geom,
    huff_dc, huff_ac, restart_interval, w, h,
):
    """Entropy-decode one scan's data into the coefficient arrays;
    returns the byte position where the entropy data ended."""
    hmax, vmax, mcux, mcuy = geom
    ids = {c[0]: i for i, c in enumerate(comps)}
    sel = [(ids[cs], td, ta) for cs, td, ta in scan]
    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    state = {"eobrun": 0}

    def restart(n: int) -> None:
        nonlocal pred
        if restart_interval and n and n % restart_interval == 0:
            if not br.align_restart():
                raise IndexError("missing restart marker")
            pred = [0] * len(comps)
            state["eobrun"] = 0

    if ss == 0:
        if se != 0:
            raise IndexError("progressive DC scan must have Se=0")
        if len(sel) > 1:
            # interleaved DC scan: MCU order across components
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    restart(n)
                    for ci, td, _ in sel:
                        _, ch, cv, _ = comps[ci]
                        bw_i = mcux * ch
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coefs[ci][
                                    (my * cv + by) * bw_i + mx * ch + bx
                                ]
                                _dc_one(br, blk, huff_dc.get(td), ah, al,
                                        pred, ci)
                    n += 1
        else:
            ci, td, _ = sel[0]
            cbw, cbh, bw_i = _comp_grid(comps[ci], w, h, hmax, vmax, mcux)
            n = 0
            for by in range(cbh):
                for bx in range(cbw):
                    restart(n)
                    _dc_one(br, coefs[ci][by * bw_i + bx],
                            huff_dc.get(td), ah, al, pred, ci)
                    n += 1
    else:
        if len(sel) != 1:
            raise IndexError("progressive AC scan must be single-component")
        ci, _, ta = sel[0]
        act = huff_ac.get(ta)
        if act is None:
            raise KeyError("missing AC table")
        cbw, cbh, bw_i = _comp_grid(comps[ci], w, h, hmax, vmax, mcux)
        n = 0
        for by in range(cbh):
            for bx in range(cbw):
                restart(n)
                blk = coefs[ci][by * bw_i + bx]
                if ah == 0:
                    _ac_first(br, blk, act, ss, se, al, state)
                else:
                    _ac_refine(br, blk, act, ss, se, al, state)
                n += 1
    return br.pos


def _comp_grid(comp, w, h, hmax, vmax, mcux):
    """Non-interleaved block grid of one component: (blocks wide,
    blocks high, allocated row stride in blocks)."""
    _, ch, cv, _ = comp
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (cw + 7) // 8, (chh + 7) // 8, mcux * ch


def _dc_one(br, blk, dct, ah, al, pred, ci):
    if ah == 0:  # first DC scan: Huffman-coded diffs of (coef >> Al)
        if dct is None:
            raise KeyError("missing DC table")
        t = br.decode(dct)
        if t is None:
            raise IndexError("bad DC code")
        pred[ci] += _extend(br.read_bits(t), t)
        blk[0] = pred[ci] << al
    else:  # refinement: one raw bit of added precision
        if br.read_bit():
            blk[0] |= 1 << al


def _ac_first(br, blk, act, ss, se, al, state):
    """T.81 G.2 / F.2.2: first AC scan of a spectral band — zero runs,
    magnitudes shifted up by Al, EOBn end-of-band run codes."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode(act)
        if rs is None:
            raise IndexError("bad AC code")
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > 63:
            raise IndexError("AC run past band end")
        blk[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
        k += 1


def _ac_refine(br, blk, act, ss, se, al, state):
    """T.81 G.2 AC successive-approximation refinement: newly
    significant coefficients arrive as ±1<<Al; every already-nonzero
    coefficient crossed on the way (and through the end of an EOB-run
    block) absorbs one correction bit."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = br.decode(act)
            if rs is None:
                raise IndexError("bad AC code")
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise IndexError("refinement magnitude must be 1")
                val = p1 if br.read_bit() else m1
            else:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break  # the tail loop below finishes this block
                # r == 15, s == 0: ZRL — skip 16 zero-history slots
            # advance over r zero-history coefficients, applying
            # correction bits to every nonzero-history one crossed
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    if br.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[z] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        # inside an EOB run: correction bits only, through band end
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                if br.read_bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


# ------------------------------------------------------------------ encoder


def _build_huffman(freq: list[int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited Huffman table from symbol frequencies —
    the T.81 K.2 code-length algorithm plus the K.3 16-bit limiting
    pass. Returns (BITS[16], HUFFVAL). One codepoint is reserved so no
    code is all ones (required by the spec)."""
    freq = list(freq) + [1]  # symbol 256 = reserved
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        c1 = c2 = None
        for i in range(257):
            f = freq[i]
            if f == 0:
                continue
            if c1 is None or f < c1 or (f == c1 and i > v1):
                c2, v2 = c1, v1
                c1, v1 = f, i
            elif c2 is None or f < c2 or (f == c2 and i > v2):
                c2, v2 = f, i
        if c2 is None:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # K.3: fold codes longer than 16 bits upward
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved codepoint (largest code)
    order = sorted((codesize[v], v) for v in range(256) if codesize[v])
    return bits[1:17], [v for _, v in order]


class _SymbolCounter:
    """First pass of two-pass scan encoding: counts symbol frequencies;
    raw bits are ignored."""

    def __init__(self):
        self.freq = [0] * 256

    def symbol(self, s: int) -> None:
        self.freq[s] += 1

    def bits(self, n: int, v: int) -> None:
        pass


class _SymbolWriter:
    """Second pass: emits Huffman codes + raw bits into a _BitWriter."""

    def __init__(self, bw: _BitWriter, table: _HuffEncoder):
        self.bw = bw
        self.table = table

    def symbol(self, s: int) -> None:
        ln, code = self.table.code[s]
        self.bw.write(ln, code)

    def bits(self, n: int, v: int) -> None:
        if n:
            self.bw.write(n, v)


class _RawBits:
    """Sink for Huffman-free scans (DC refinement): raw bits only."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw

    def symbol(self, s: int) -> None:  # pragma: no cover - never called
        raise AssertionError("DC refinement emits no symbols")

    def bits(self, n: int, v: int) -> None:
        if n:
            self.bw.write(n, v)


class _AcRunState:
    """Cross-block AC encoder state: the pending EOB run and the
    correction bits buffered inside it (flushed together, in order,
    when the run ends — T.81 G.1.2.3)."""

    def __init__(self, sink):
        self.sink = sink
        self.eobrun = 0
        self.buffered: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sink.symbol(nbits << 4)
            self.sink.bits(nbits, self.eobrun - (1 << nbits))
            self.eobrun = 0
        self.flush_bits()

    def flush_bits(self) -> None:
        for bit in self.buffered:
            self.sink.bits(1, bit)
        self.buffered = []

    def end_block(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _enc_dc_first(sink, coef0: int, al: int, pred: list[int], ci: int) -> None:
    t = coef0 >> al  # arithmetic shift, T.81 G.1.2.1
    diff = t - pred[ci]
    pred[ci] = t
    if diff == 0:
        nbits, raw = 0, 0
    else:
        a = abs(diff)
        nbits = a.bit_length()
        raw = diff if diff > 0 else diff + (1 << nbits) - 1
    sink.symbol(nbits)
    sink.bits(nbits, raw)


def _enc_ac_first(state: _AcRunState, blk: list[int], ss, se, al) -> None:
    sink = state.sink
    r = 0
    for k in range(ss, se + 1):
        v = blk[ZIGZAG[k]]
        mag = (v if v >= 0 else -v) >> al  # magnitude shift, G.1.2.2
        if mag == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            sink.symbol(0xF0)
            r -= 16
        nbits = mag.bit_length()
        sink.symbol((r << 4) | nbits)
        raw = mag if v >= 0 else (mag ^ ((1 << nbits) - 1))
        sink.bits(nbits, raw)
        r = 0
    if r > 0:
        state.end_block()


def _enc_ac_refine(state: _AcRunState, blk: list[int], ss, se, al) -> None:
    """Encoder half of :func:`_ac_refine`. The delicate part is
    correction-bit PLACEMENT: the decoder reads a history coefficient's
    correction bit at the moment it CROSSES that slot, and a ZRL's
    advance stops at its 16th zero-history slot — so bits for history
    slots beyond that boundary must ride with the NEXT symbol, not the
    ZRL (flushing them all with the ZRL desyncs the stream; caught by
    the adversarial scan-pair fuzz)."""
    sink = state.sink
    mags = [(abs(blk[ZIGZAG[k]]) >> al) for k in range(ss, se + 1)]
    zero_pos: list[int] = []  # zero-history slots since the last symbol
    pending: list[tuple[int, int]] = []  # (slot, bit) history corrections
    for k in range(ss, se + 1):
        m = mags[k - ss]
        if m == 0:
            zero_pos.append(k)
            continue
        if m > 1:
            # already-significant coefficient: correction bit buffered,
            # zero-run NOT broken
            pending.append((k, m & 1))
            continue
        # newly significant (refined magnitude exactly 1)
        while len(zero_pos) > 15:
            state.flush_eobrun()
            sink.symbol(0xF0)
            boundary = zero_pos[15]  # the ZRL's 16th zero slot
            zero_pos = zero_pos[16:]
            for _, bit in (p for p in pending if p[0] < boundary):
                sink.bits(1, bit)
            pending = [p for p in pending if p[0] > boundary]
        state.flush_eobrun()
        sink.symbol((len(zero_pos) << 4) | 1)
        sink.bits(1, 1 if blk[ZIGZAG[k]] >= 0 else 0)
        for _, bit in pending:
            sink.bits(1, bit)
        pending = []
        zero_pos = []
    if zero_pos or pending:
        state.buffered.extend(bit for _, bit in pending)
        state.end_block()


# the classic progressive scan script: DC first for everything at Al=1,
# luma AC split into two spectral bands at Al=2, chroma AC at Al=1,
# then refinement passes down to full precision. (ci=None ⇒ all
# components interleaved — only legal for DC.)
_SCRIPT_3 = [
    dict(ci=None, ss=0, se=0, ah=0, al=1),
    dict(ci=0, ss=1, se=5, ah=0, al=2),
    dict(ci=1, ss=1, se=63, ah=0, al=1),
    dict(ci=2, ss=1, se=63, ah=0, al=1),
    dict(ci=0, ss=6, se=63, ah=0, al=2),
    dict(ci=None, ss=0, se=0, ah=1, al=0),
    dict(ci=0, ss=1, se=63, ah=2, al=1),
    dict(ci=1, ss=1, se=63, ah=1, al=0),
    dict(ci=2, ss=1, se=63, ah=1, al=0),
    dict(ci=0, ss=1, se=63, ah=1, al=0),
]
_SCRIPT_1 = [
    dict(ci=None, ss=0, se=0, ah=0, al=1),
    dict(ci=0, ss=1, se=5, ah=0, al=2),
    dict(ci=0, ss=6, se=63, ah=0, al=2),
    dict(ci=None, ss=0, se=0, ah=1, al=0),
    dict(ci=0, ss=1, se=63, ah=2, al=1),
    dict(ci=0, ss=1, se=63, ah=1, al=0),
]


def encode_jpeg_progressive(
    width: int, height: int, pixels: bytes, channels: int = 3,
    quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Serialize a top-down row-major 8-bit buffer (gray or RGB) as a
    PROGRESSIVE (SOF2) JPEG. Quantizes through the same pipeline as the
    baseline :func:`~.jpeg.encode_jpeg`, so at equal quality the two
    files decode to identical pixels; each scan carries its own optimal
    Huffman table(s). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (DC scans) / blocks (AC scans) in EVERY scan —
    resetting DC prediction and EOB runs at each boundary, exercising
    the decoder's progressive resync path."""
    planes, dims, hv, qts, qluma, qchroma = _prepare_planes(
        width, height, pixels, channels, quality, subsampling
    )
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # quantized coefficients for every (MCU-padded) block
    coefs: list[list[list[int]]] = []
    for ci in range(channels):
        ch, cv = hv[ci]
        pw, ph = dims[ci]
        bw_i, bh_i = mcux * ch, mcuy * cv
        blocks = []
        for by in range(bh_i):
            for bx in range(bw_i):
                blocks.append(
                    _quant_block(planes[ci], pw, ph, bx * 8, by * 8, qts[ci])
                )
        coefs.append(blocks)

    script = _SCRIPT_3 if channels == 3 else _SCRIPT_1

    def run_scan(spec, sinks, bw=None) -> None:
        """Drive one scan through per-table-class sinks; deterministic,
        so the counting pass and the emitting pass see identical
        symbol streams. ``bw`` is the emitting pass's bit writer (None
        in the counting pass): restart markers flush + land there,
        while the entropy-state resets (DC pred, EOB run) happen in
        BOTH passes so the symbol streams stay identical."""
        rst = [0]

        def emit_rst() -> None:
            if bw is not None:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst[0]])
                rst[0] = (rst[0] + 1) % 8

        ri = restart_interval
        if spec["ss"] == 0 and spec["ci"] is None:
            pred = [0] * channels
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and n and n % ri == 0:
                        pred = [0] * channels
                        emit_rst()
                    for ci in range(channels):
                        ch, cv = hv[ci]
                        bw_i = mcux * ch
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coefs[ci][
                                    (my * cv + by) * bw_i + mx * ch + bx
                                ]
                                if spec["ah"] == 0:
                                    _enc_dc_first(
                                        sinks[min(ci, 1)], blk[0],
                                        spec["al"], pred, ci,
                                    )
                                else:
                                    sinks[0].bits(
                                        1, (blk[0] >> spec["al"]) & 1
                                    )
                    n += 1
        else:
            ci = spec["ci"]
            ch, cv = hv[ci]
            cw = (width * ch + hmax - 1) // hmax
            chh = (height * cv + vmax - 1) // vmax
            cbw, cbh = (cw + 7) // 8, (chh + 7) // 8
            bw_i = mcux * ch
            state = _AcRunState(sinks[0])
            fn = _enc_ac_first if spec["ah"] == 0 else _enc_ac_refine
            n = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if ri and n and n % ri == 0:
                        # an EOB run never spans a restart boundary
                        state.flush_eobrun()
                        emit_rst()
                    fn(state, coefs[ci][by * bw_i + bx],
                       spec["ss"], spec["se"], spec["al"])
                    n += 1
            state.flush_eobrun()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(qluma[ZIGZAG[k]] for k in range(64))
    if channels == 3:
        dqt += bytes([0x01]) + bytes(qchroma[ZIGZAG[k]] for k in range(64))
    out += seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sof += struct.pack(
            ">BBB", ci + 1, (hv[ci][0] << 4) | hv[ci][1],
            0 if ci == 0 else 1,
        )
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for spec in script:
        is_dc = spec["ss"] == 0
        is_refine = spec["ah"] != 0
        n_tables = (
            0 if (is_dc and is_refine)
            else (min(channels, 2) if (is_dc and spec["ci"] is None) else 1)
        )
        bw = _BitWriter()
        if n_tables == 0:
            run_scan(spec, [_RawBits(bw), _RawBits(bw)], bw=bw)
        else:
            counters = [_SymbolCounter() for _ in range(n_tables)]
            run_scan(spec, counters + counters[-1:])
            tables = [_build_huffman(c.freq) for c in counters]
            dht = b""
            tc = 0x00 if is_dc else 0x10
            for ti, (tbits, tvals) in enumerate(tables):
                dht += bytes([tc | ti]) + bytes(tbits) + bytes(tvals)
            out += seg(0xC4, dht)
            writers = [
                _SymbolWriter(bw, _HuffEncoder(tbits, tvals))
                for tbits, tvals in tables
            ]
            run_scan(spec, writers + writers[-1:], bw=bw)
        bw.flush()
        if spec["ci"] is None:
            sos = bytes([channels])
            for ci in range(channels):
                ti = min(ci, n_tables - 1) if n_tables else 0
                sos += bytes([ci + 1, (ti << 4) | ti])
        else:
            sos = bytes([1, spec["ci"] + 1, 0x00])
        sos += bytes([spec["ss"], spec["se"], (spec["ah"] << 4) | spec["al"]])
        out += seg(0xDA, sos)
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
