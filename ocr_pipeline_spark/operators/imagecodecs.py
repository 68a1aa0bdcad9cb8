"""Pure-Python image codecs (JPEG baseline, GIF) — no native deps.

Completes the multimodal pixel path (operators/multimodal.py): the
container ships no PIL/libjpeg, so these stdlib+numpy decoders make
JPEG and GIF pixel decode real, the same way dom.py's decode chain and
multimodal.decode_png make their formats real.  Scope is deliberately
the web-dominant subset:

* JPEG: baseline sequential DCT (SOF0/SOF1) and progressive (SOF2,
  spectral selection + successive approximation, EOB runs), 8-bit,
  Huffman, grayscale or YCbCr, restart markers, 4:4:4 / 4:2:0 / 4:2:2
  / 4:1:1 chroma subsampling.  Arithmetic coding and
  lossless/hierarchical frames raise ValueError — callers
  (image_features) degrade to the deterministic byte-histogram
  fallback, never crash.
* GIF: 87a/89a, global/local color tables, interlace, LZW; first
  frame of animations.

The matching encoders exist for deterministic fixtures/round-trip
tests only (encode_baseline_jpeg uses flat quantization so decode
error is bounded by DCT rounding; encode_gif is exact).

Reference analog: the reference renders pages to images and OCRs them
(/root/reference/src/stage2_ocr.py:406-442); this repo's multimodal
operators treat images as opaque binary columns with typed metadata —
these codecs are what turns "opaque" into pixels at feature time.
"""

from __future__ import annotations

import struct

import numpy as np

# Decode-bomb guard: a 2-byte header field can declare 65535x65535 and
# make a decoder attempt a multi-GB allocation BEFORE any pixel data is
# validated — on an executor that is an OOM-kill, not an exception.
# Real web images sit far below this cap (64 MPix ~ 12k x 5k).
_MAX_PIXELS = 1 << 26


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible image dimensions {w}x{h}")

# =========================================================================
# JPEG — baseline sequential DCT
# =========================================================================

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-III (inverse DCT) basis: spatial = M.T @ coeffs @ M
_IDCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _IDCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-unstuffing; stops at any real marker (restart handled by the
    scan loop)."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s per spec (decoder may read past final byte)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    # real marker: stop consuming, pad with 1s
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip to the byte after the next RSTn."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _build_huffman(bits: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per JPEG canonical code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG signed-magnitude extension (spec F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real (non-stuffed, non-RST) marker at or
    after pos — how the multi-scan parser steps over entropy data."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG -> (H, W, 3) uint8
    RGB (grayscale replicated).

    Raises ValueError on arithmetic-coded/hierarchical/12-bit streams
    and on malformed input — callers fall back, never crash.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) ; comps: [(cid, hs, vs, tq)]
    progressive = False
    coeffs: dict[int, np.ndarray] | None = None
    n_scans = 0
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[i + 1 : i + 65], np.uint8).astype(np.int64)
                qt[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                symbols = seg[i + 17 : i + 17 + cnt]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, symbols
                )
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                _check_dims(w, h)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                coeffs = {
                    cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int64)
                    for cid, hs, vs, _tq in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-sequential-DCT JPEG (arith/lossless)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cid, tda = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel.append((cid, tda >> 4, tda & 0xF))
            if not progressive:
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan_sel, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            end = _decode_scan_progressive(
                data, pos + 2 + seg_len, frame, scan_sel,
                (ss, se, ahal >> 4, ahal & 0xF), coeffs,
                huff_dc, huff_ac, restart_interval,
            )
            n_scans += 1
            pos = _next_marker(data, end)
            continue
        pos += 2 + seg_len
    if progressive and coeffs is not None and n_scans:
        return _finish_progressive(frame, coeffs, qt)
    raise ValueError("no scan data")


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    _check_dims(w, h)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    sel = {cid: (td, ta) for cid, td, ta in scan_sel}
    # MCU data is interleaved in SOS (scan) component order, which a
    # spec-legal stream may list differently from SOF order; iterate in
    # scan order and reject scan components absent from the frame.
    if len(scan_sel) != len(comps):
        raise ValueError("multi-scan (non-interleaved) baseline unsupported")
    by_cid = {c[0]: c for c in comps}
    try:
        scan_comps = [by_cid[cid] for cid, _td, _ta in scan_sel]
    except KeyError as exc:
        raise ValueError(f"SOS component {exc} not in frame") from None
    if len({cid for cid, *_ in scan_sel}) != len(scan_sel):
        raise ValueError("duplicate SOS component")
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), np.int64)
    br = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    m = _IDCT_M
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_to_marker()
                pred = {cid: 0 for cid in pred}
            mcu_count += 1
            for cid, hs, vs, tq in scan_comps:
                td, ta = sel[cid]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.int64)
                        t = _huff_decode(br, dc_tbl)
                        diff = _extend(br.read(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64, np.int64)
                        block[_ZIGZAG] = zz * q
                        spatial = m.T @ block.reshape(8, 8) @ m
                        px = np.clip(np.round(spatial) + 128, 0, 255)
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
    return _combine_planes(planes, comps, h, w, hmax, vmax)


def _combine_planes(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full MCU-grid resolution, crop
    to (h, w), and combine (grayscale replicate / YCbCr -> RGB)."""
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = full[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = (f.astype(np.float64) for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _comp_block_dims(frame, hs: int, vs: int) -> tuple[int, int]:
    """A component's ACTUAL block grid (spec A.1.1) — what a
    non-interleaved scan codes, which is smaller than the MCU-padded
    grid when the image doesn't fill the last MCU row/column."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    cw = (w * hs + hmax - 1) // hmax
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _refine_ac(br: _BitReader, block: np.ndarray, ss: int, se: int,
               al: int, eobrun: int, ac_tbl: dict) -> int:
    """AC successive-approximation refinement for one block (spec
    G.1.2.3 / libjpeg decode_mcu_AC_refine).  `block` is the zigzag
    coefficient vector; returns the updated EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement size")
                val = p1 if br.read(1) else m1
            # advance over r zero-history coefficients, appending a
            # correction bit to each nonzero-history one passed
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        # inside an EOB run the band stays as-is EXCEPT existing nonzero
        # coefficients still receive their correction bits
        while k <= se:
            c = int(block[k])
            if c != 0:
                if br.read(1) and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_progressive(data, pos, frame, scan_sel, spec, coeffs,
                             huff_dc, huff_ac, dri) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the stream position where entropy data ended (the caller then steps
    to the next marker).  spec = (Ss, Se, Ah, Al)."""
    h, w, comps = frame
    ss, se, ah, al = spec
    if not (0 <= ss <= se <= 63) or al > 13:
        raise ValueError("bad progressive spectral selection")
    by_cid = {c[0]: c for c in comps}
    try:
        scan_comps = [by_cid[cid] for cid, _td, _ta in scan_sel]
    except KeyError as exc:
        raise ValueError(f"SOS component {exc} not in frame") from None
    if len({cid for cid, *_ in scan_sel}) != len(scan_sel):
        raise ValueError("duplicate SOS component")
    sel = {cid: (td, ta) for cid, td, ta in scan_sel}
    br = _BitReader(data, pos)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC progressive scan must have Se=0")
    if not is_dc and len(scan_sel) != 1:
        raise ValueError("AC progressive scan must be non-interleaved")

    if is_dc:
        pred = {cid: 0 for cid, *_ in scan_comps}
        if len(scan_comps) > 1:
            # interleaved MCU order over the scan's components
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            units = [
                (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
            ]

            def blocks_of(unit):
                my, mx = unit
                for cid, hs, vs, _tq in scan_comps:
                    for by in range(vs):
                        for bx in range(hs):
                            yield cid, my * vs + by, mx * hs + bx
        else:
            cid0, hs0, vs0, _ = scan_comps[0]
            bh, bw = _comp_block_dims(frame, hs0, vs0)
            units = [(by, bx) for by in range(bh) for bx in range(bw)]

            def blocks_of(unit):
                yield cid0, unit[0], unit[1]

        count = 0
        for unit in units:
            if dri and count and count % dri == 0:
                br.align_to_marker()
                pred = {cid: 0 for cid in pred}
            count += 1
            for cid, by, bx in blocks_of(unit):
                block = coeffs[cid][by, bx]
                if ah == 0:
                    t = _huff_decode(br, huff_dc[sel[cid][0]])
                    diff = _extend(br.read(t), t) if t else 0
                    pred[cid] += diff
                    block[0] = pred[cid] << al
                else:
                    if br.read(1):
                        block[0] = int(block[0]) | (1 << al)
        return br.pos

    # AC scan: single component, its actual block grid, row-major
    cid0, hs0, vs0, _tq0 = scan_comps[0]
    bh, bw = _comp_block_dims(frame, hs0, vs0)
    ac_tbl = huff_ac[sel[cid0][1]]
    eobrun = 0
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and count and count % dri == 0:
                br.align_to_marker()
                eobrun = 0
            count += 1
            block = coeffs[cid0][by, bx]
            if ah != 0:
                eobrun = _refine_ac(br, block, ss, se, al, eobrun, ac_tbl)
                continue
            # first AC scan for this band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(br, ac_tbl)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                block[k] = _extend(br.read(s), s) << al
                k += 1
    return br.pos


def _finish_progressive(frame, coeffs, qt) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient store, then the
    shared upsample/color path."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    m = _IDCT_M
    planes = {}
    for cid, hs, vs, tq in comps:
        cf = coeffs[cid]
        q = qt[tq]
        bh, bw = cf.shape[0], cf.shape[1]
        plane = np.zeros((bh * 8, bw * 8), np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64, np.int64)
                block[_ZIGZAG] = cf[by, bx] * q
                spatial = m.T @ block.reshape(8, 8) @ m
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(spatial) + 128, 0, 255
                )
        planes[cid] = plane
    return _combine_planes(planes, comps, h, w, hmax, vmax)


# =========================================================================
# PNG — fixture encoder (decode lives in operators/multimodal.py)
# =========================================================================
def encode_png(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> 8-bit truecolor PNG (filter 0, one IDAT).
    Lossless: decode_png round-trips bit-exactly.  Fixture/test encoder."""
    import zlib

    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# =========================================================================
# GIF — LZW
# =========================================================================
def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    # spec range is 2..8 (color tables cap at 256 entries); an
    # unvalidated byte here is a decode bomb: 1 << 200 initial
    # dictionary entries (found by garbage fuzzing)
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader: LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi
        byte_i = bitpos >> 3
        v = int.from_bytes(data[byte_i : byte_i + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    width = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None:
            dictionary.append(prev + [entry[0]])
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF -> (H, W, 3) uint8 RGB (first frame of animations).

    Raises ValueError on malformed input; transparency index renders as
    its palette color (deterministic; no alpha channel in our feature
    path)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    _check_dims(sw, sh)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * size], np.uint8).reshape(-1, 3)
        pos += 3 * size
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if len(data) < pos + 10:
            raise ValueError("truncated image descriptor")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        _check_dims(iw, ih)
        pos += 10
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            table = np.frombuffer(
                data[pos : pos + 3 * size], np.uint8
            ).reshape(-1, 3)
            pos += 3 * size
        if table is None:
            raise ValueError("no color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, b"".join(chunks), iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("short GIF pixel data")
        arr = np.array(idx, np.int64).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows in 4 passes
            out_rows = np.zeros_like(arr)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, ih, step):
                    out_rows[y] = arr[src]
                    src += 1
            arr = out_rows
        arr = np.clip(arr, 0, len(table) - 1)
        frame = table[arr]
        # compose onto the logical screen (first frame only)
        if (left, top, iw, ih) == (0, 0, sw, sh):
            return frame
        screen = np.zeros((sh, sw, 3), np.uint8)
        screen[top : top + ih, left : left + iw] = frame
        return screen
    raise ValueError("no image data in GIF")


# =========================================================================
# Encoders — fixture generation / round-trip tests only
# =========================================================================
# standard luminance Huffman tables (JPEG spec K.3.1) reused for chroma:
# legal (tables are stream-declared) and simplest for a fixture encoder
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = bytes(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = bytes(
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
    ]
)


def _encode_huffman_codes(bits: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, raw bits) per JPEG signed magnitude coding."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    return t, v if v >= 0 else v + (1 << t) - 1


def encode_baseline_jpeg(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> baseline 4:4:4 JFIF bytes with FLAT (all-ones)
    quantization — decode error is then bounded by DCT rounding alone
    (|err| <= ~2), which the round-trip tests assert.  Fixture/test
    encoder; not a size-optimized production path."""
    h, w, _ = px.shape
    y = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]
    dc_codes = _encode_huffman_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _encode_huffman_codes(_STD_AC_BITS, _STD_AC_VALS)
    m = _IDCT_M  # forward DCT: coeffs = M @ spatial @ M.T
    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    planes = [y, cb, cr]
    for by in range(bh):
        for bx in range(bwid):
            for ci, plane in enumerate(planes):
                block = np.zeros((8, 8))
                ys, xs = by * 8, bx * 8
                tile = plane[ys : ys + 8, xs : xs + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                # edge replicate (right/bottom) keeps DCT energy low
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1][:, None]
                coeffs = m @ (block - 128.0) @ m.T
                q = np.rint(coeffs).astype(np.int64)
                # zz[i] = natural-order coefficient at zigzag position i,
                # the exact inverse of the decoder's block[_ZIGZAG] = zz
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, bits = _magnitude(diff)
                ln, code = dc_codes[t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                run = 0
                last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    t, bits = _magnitude(v)
                    ln, code = ac_codes[(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    flat_q = bytes([0]) + bytes([1] * 64)
    dht_dc = bytes([0x00]) + bytes(_STD_DC_BITS) + _STD_DC_VALS
    dht_ac = bytes([0x10]) + bytes(_STD_AC_BITS) + _STD_AC_VALS
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, flat_q)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xC0, sof)
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _block_coeffs(px: np.ndarray) -> tuple[list[np.ndarray], int, int]:
    """(H, W, 3) uint8 -> per-component (bh, bw, 64) zigzag coefficient
    arrays (4:4:4, flat quantization) — shared by the fixture encoders."""
    h, w, _ = px.shape
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]
    m = _IDCT_M
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    out = [np.zeros((bh, bwid, 64), np.int64) for _ in range(3)]
    for ci, plane in enumerate((y, cb, cr)):
        for by in range(bh):
            for bx in range(bwid):
                block = np.zeros((8, 8))
                ys, xs = by * 8, bx * 8
                tile = plane[ys : ys + 8, xs : xs + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1][:, None]
                q = np.rint(m @ (block - 128.0) @ m.T).astype(np.int64)
                out[ci][by, bx] = q.reshape(64)[_ZIGZAG]
    return out, bh, bwid


def _encode_ac_refine_block(bw, ac_codes, zz, ss: int, se: int, al: int) -> None:
    """Mirror of _refine_ac for the fixture encoder, following libjpeg's
    encode_mcu_AC_refine bit ordering: the ZRL flush runs at EVERY
    nonzero coefficient while r > 15 and k <= EOB (EOB = last
    newly-significant position) — pending correction bits attach to the
    symbol whose decoder-side advance actually passes their positions.
    Single-block EOB runs only; the decoder additionally handles
    EOBn > 1."""
    mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if mags[k - ss] == 1:
            eob = k
    p_bits: list[int] = []  # correction bits pending since last symbol
    r = 0
    for k in range(ss, se + 1):
        t = mags[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in p_bits:
                bw.write(b, 1)
            p_bits = []
        if t > 1:
            p_bits.append(t & 1)
            continue
        # newly significant at this bit position
        ln, code = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in p_bits:
            bw.write(b, 1)
        p_bits = []
        r = 0
    if r > 0 or p_bits:
        ln, code = ac_codes[0x00]  # EOB, run length 1
        bw.write(code, ln)
        for b in p_bits:
            bw.write(b, 1)


def encode_progressive_jpeg(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PROGRESSIVE (SOF2) 4:4:4 JFIF bytes with flat
    quantization and a libjpeg-style successive-approximation scan
    script: DC first (Al=1) -> DC refinement, then per component AC
    first (Ss=1..63, Al=1) -> AC refinement (Al=0).  All transmitted
    bits reconstruct the exact coefficients of the baseline encoder, so
    the round-trip error bound (DCT rounding only) is identical.
    Fixture/test encoder; not a size-optimized production path."""
    h, w, _ = px.shape
    coeffs, bh, bwid = _block_coeffs(px)
    dc_codes = _encode_huffman_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _encode_huffman_codes(_STD_AC_BITS, _STD_AC_VALS)

    def scan(fn) -> bytes:
        bw = _BitWriter()
        fn(bw)
        bw.flush()
        return bytes(bw.out)

    def dc_first(bw):
        pred = [0, 0, 0]
        for by in range(bh):
            for bx in range(bwid):
                for ci in range(3):
                    v = int(coeffs[ci][by, bx, 0]) >> 1  # point transform
                    diff = v - pred[ci]
                    pred[ci] = v
                    t, bits = _magnitude(diff)
                    ln, code = dc_codes[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(bits, t)

    def dc_refine(bw):
        for by in range(bh):
            for bx in range(bwid):
                for ci in range(3):
                    bw.write(int(coeffs[ci][by, bx, 0]) & 1, 1)

    def ac_first(ci):
        def fn(bw):
            for by in range(bh):
                for bx in range(bwid):
                    zz = coeffs[ci][by, bx]
                    run = 0
                    emitted_any = False
                    for k in range(1, 64):
                        v = int(zz[k])
                        vt = (abs(v) >> 1) * (1 if v >= 0 else -1)
                        if vt == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        t, bits = _magnitude(vt)
                        ln, code = ac_codes[(run << 4) | t]
                        bw.write(code, ln)
                        bw.write(bits, t)
                        run = 0
                        emitted_any = True
                    if run > 0 or not emitted_any:
                        ln, code = ac_codes[0x00]  # EOB
                        bw.write(code, ln)
        return fn

    def ac_refine(ci):
        def fn(bw):
            for by in range(bh):
                for bx in range(bwid):
                    _encode_ac_refine_block(
                        bw, ac_codes, coeffs[ci][by, bx], 1, 63, 0
                    )
        return fn

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    flat_q = bytes([0]) + bytes([1] * 64)
    dht_dc = bytes([0x00]) + bytes(_STD_DC_BITS) + _STD_DC_VALS
    dht_ac = bytes([0x10]) + bytes(_STD_AC_BITS) + _STD_AC_VALS
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out = (
        b"\xff\xd8"
        + seg(0xDB, flat_q)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xC2, sof)
        + sos([1, 2, 3], 0, 0, 0, 1) + scan(dc_first)
        + sos([1, 2, 3], 0, 0, 1, 0) + scan(dc_refine)
    )
    for ci, cid in enumerate((1, 2, 3)):
        out += sos([cid], 1, 63, 0, 1) + scan(ac_first(ci))
    for ci, cid in enumerate((1, 2, 3)):
        out += sos([cid], 1, 63, 1, 0) + scan(ac_refine(ci))
    return out + b"\xff\xd9"


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc  # LSB-first
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prefix: tuple[int, ...] = ()
    for sym in indices:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (sym,)
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> single-frame GIF89a with an exact 256-color
    table built from the image's unique colors (must be <= 256 — the
    fixture generator guarantees it).  Exact round-trip."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 unique colors")
    # color table size: power of two >= max(2, n)
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    size = 1 << bits
    table = np.zeros((size, 3), np.uint8)
    table[: len(colors)] = colors
    min_code_size = max(2, bits)
    lzw = _lzw_encode(min_code_size, [int(i) for i in inverse])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
