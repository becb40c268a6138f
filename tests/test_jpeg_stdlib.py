"""Baseline-JPEG stdlib decoder tests (round-7 verdict ask #8).

The encoder below is a MINIMAL test-side baseline-JPEG writer built
from the T.81 spec (canonical Huffman tables of our own construction,
byte stuffing, restart markers) — the decoder must invert real entropy-
coded streams, not fixtures it produced itself. Exactness is pinned
where the standard makes it unambiguous: DC-only blocks (IDCT of a
flat block is an integer), an AC block checked against an independent
brute-force IDCT, and a flat-chroma 4:2:0 color image against the
documented JFIF + Rec.601 arithmetic.
"""

from __future__ import annotations

import math

from etl_wrap_spark.operators.jpeg_stdlib import jpeg_gray_pixels

DC_COUNTS = [0, 0, 0, 12] + [0] * 12          # symbols 0..11 at length 4
AC_SYMS_BASE = [0x00]                          # EOB


class _W:
    """MSB-first bit writer with 0xFF00 stuffing and 1-bit padding."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, k):
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht(tc, th, counts, symbols):
    return _seg(0xC4, bytes([tc << 4 | th] + counts) + bytes(symbols))


def _cat(v):
    return abs(v).bit_length()


def _raw(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def enc_gray(w, h, block_coefs, q=None, restart=0):
    """block_coefs: list (MCU order) of {zigzag_pos: quantized value}."""
    q = q or ([4] * 64)
    ac_syms = list(AC_SYMS_BASE)
    for blk in block_coefs:
        prev = 0
        for k in sorted(kk for kk in blk if kk > 0):
            run = k - prev - 1
            prev = k
            while run > 15:
                if 0xF0 not in ac_syms:
                    ac_syms.append(0xF0)
                run -= 16
            sym = (run << 4) | _cat(blk[k])
            if sym not in ac_syms:
                ac_syms.append(sym)
    ac_counts = [0, 0, 0, len(ac_syms)] + [0] * 12
    ac_code = {s: (i, 4) for i, s in enumerate(ac_syms)}

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, DC_COUNTS, list(range(12)))
    out += _dht(1, 0, ac_counts, ac_syms)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = _W()
    pred = 0
    nrst = 0
    for bi, blk in enumerate(block_coefs):
        if restart and bi and bi % restart == 0:
            wtr.flush()
            out += wtr.out
            wtr = _W()
            out += bytes([0xFF, 0xD0 + (nrst % 8)])
            nrst += 1
            pred = 0
        dc = blk.get(0, 0)
        diff = dc - pred
        pred = dc
        t = _cat(diff)
        wtr.put(t, 4)  # DC table: symbol s has code s at length 4
        if t:
            wtr.put(_raw(diff, t), t)
        prev = 0
        for k in sorted(kk for kk in blk if kk > 0):
            run = k - prev - 1
            prev = k
            while run > 15:
                c, ln = ac_code[0xF0]
                wtr.put(c, ln)
                run -= 16
            s = _cat(blk[k])
            c, ln = ac_code[(run << 4) | s]
            wtr.put(c, ln)
            wtr.put(_raw(blk[k], s), s)
        if prev < 63:
            c, ln = ac_code[0x00]
            wtr.put(c, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def enc_color_flat_420(w, h, dcy, dccb, dccr, q=None):
    """Flat-color 3-component 4:2:0 baseline JPEG (DC-only blocks)."""
    q = q or ([8] * 64)
    ac_counts = [0, 0, 0, 1] + [0] * 12
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _dht(0, 0, DC_COUNTS, list(range(12)))
    out += _dht(1, 0, ac_counts, AC_SYMS_BASE)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    wtr = _W()
    mcux = (w + 15) // 16
    mcuy = (h + 15) // 16
    preds = {1: 0, 2: 0, 3: 0}
    for _my in range(mcuy):
        for _mx in range(mcux):
            for cid, nblk, dc in ((1, 4, dcy), (2, 1, dccb), (3, 1, dccr)):
                for _ in range(nblk):
                    diff = dc - preds[cid]
                    preds[cid] = dc
                    t = _cat(diff)
                    wtr.put(t, 4)
                    if t:
                        wtr.put(_raw(diff, t), t)
                    wtr.put(0, 4)  # EOB
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_dc_only_gray_exact():
    # two blocks: DC 16·q4 = 64 → 64/8 + 128 = 136; -32·4/8 + 128 = 112
    w, h, g = jpeg_gray_pixels(enc_gray(16, 8, [{0: 16}, {0: -32}]))
    assert (w, h) == (16, 8)
    assert all(g[y * 16 + x] == 136 for y in range(8) for x in range(8))
    assert all(g[y * 16 + 8 + x] == 112 for y in range(8) for x in range(8))


def test_jpeg_ac_block_matches_independent_idct():
    coefs = {0: 10, 1: 7, 5: -3, 17: 4}  # zigzag positions
    w, h, g = jpeg_gray_pixels(enc_gray(8, 8, [coefs]))
    assert (w, h) == (8, 8)
    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    fr = [[0.0] * 8 for _ in range(8)]
    for k, v in coefs.items():
        fr[zz[k] // 8][zz[k] % 8] = v * 4.0  # dequantized (q=4)

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    for y in range(8):
        for x in range(8):
            s = sum(
                c(u) * c(v) / 4 * fr[v][u]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for v in range(8)
                for u in range(8)
            )
            expect = min(255, max(0, int(math.floor(s + 0.5)) + 128))
            assert g[y * 8 + x] == expect, (x, y)


def test_jpeg_restart_markers_reset_prediction():
    blob = enc_gray(32, 8, [{0: 8}, {0: 16}, {0: 24}, {0: 32}], restart=2)
    w, h, g = jpeg_gray_pixels(blob)
    assert (w, h) == (32, 8)
    assert [g[0], g[8], g[16], g[24]] == [132, 136, 140, 144]


def test_jpeg_flat_420_color_luma_exact():
    blob = enc_color_flat_420(16, 16, -28, -8, 12)  # Y=100 Cb=120 Cr=140
    w, h, g = jpeg_gray_pixels(blob)
    assert (w, h) == (16, 16)
    yy, cb, cr = 100, 120, 140
    r = round(yy + 1.402 * (cr - 128))
    gg = round(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = round(yy + 1.772 * (cb - 128))
    expect = (19595 * r + 38470 * gg + 7471 * b + 0x8000) >> 16
    assert set(g) == {expect}


def test_jpeg_out_of_scope_and_malformed_return_none():
    good = enc_color_flat_420(16, 16, -28, -8, 12)
    assert jpeg_gray_pixels(b"\xff\xd8\x00") is None
    assert jpeg_gray_pixels(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    assert jpeg_gray_pixels(good[:40]) is None
    assert jpeg_gray_pixels(b"not a jpeg") is None


def test_decode_image_routes_baseline_jpeg():
    from etl_wrap_spark.operators import multimodal

    blob = enc_gray(16, 8, [{0: 16}, {0: -32}])
    if multimodal._pil() is not None:
        return  # Pillow env: the C decoder takes the route instead
    feat = multimodal.decode_image(blob, fake=False)
    # 4x4 center-of-cell sampling: left two columns hit the 136-gray
    # block, right two the 112-gray block
    expect = []
    for _y in range(4):
        for x in range(4):
            expect.append(round((136 if (2 * x + 1) * 16 // 8 < 8 else 112) / 255.0, 6))
    assert feat == expect


def test_jpeg_standalone_markers_and_fill_bytes_in_header_walk():
    # T.81 allows 0xFF fill bytes before any marker and standalone
    # (length-less) markers like TEM 0x01 between header segments; the
    # round-7 ADVICE found the walk parsed them as length-bearing and
    # silently lost the stdlib path. Splice them in after SOI and assert
    # the decode is identical to the clean stream.
    clean = enc_gray(16, 8, [{0: 16}, {0: -32}])
    assert clean[:2] == b"\xff\xd8"
    spliced = (
        clean[:2]
        + b"\xff"            # fill byte run before the next marker
        + b"\xff\x01"        # TEM — standalone, no length
        + b"\xff\xff\xff"    # more fill bytes
        + clean[2:]
    )
    assert jpeg_gray_pixels(spliced) == jpeg_gray_pixels(clean)
    assert jpeg_gray_pixels(clean) is not None


# ---------------------------------------------------------------- progressive
# Test-side progressive encoder (round-8 verdict ask #8): emits the
# T.81 G.1 four-scan progression — DC first (Al=1), DC refine, AC first
# (spectral 1-63, Al=1), AC refine — generically from the coefficient
# dicts, with EOB-run accumulation and the refinement correction-bit
# buffering the spec requires. Two-pass per scan: collect the op stream,
# derive a fixed-length-4 Huffman table from the symbols used, write.


def _ops_dc_first(blocks, al):
    ops = []
    pred = 0
    for blk in blocks:
        dcs = blk.get(0, 0) >> al  # arithmetic shift: DC point transform
        diff = dcs - pred
        pred = dcs
        t = _cat(diff)
        ops.append(("sym", t))
        if t:
            ops.append(("bits", _raw(diff, t), t))
    return ops


def _ops_dc_refine(blocks, al):
    return [("bits", (blk.get(0, 0) >> al) & 1, 1) for blk in blocks]


def _trunc(v, al):
    # AC point transform: divide with truncation toward zero
    return -((-v) >> al) if v < 0 else v >> al


def _flush_eob(ops, run, bitbuf):
    if run:
        r = run.bit_length() - 1
        ops.append(("sym", r << 4))
        if r:
            ops.append(("bits", run - (1 << r), r))
    ops.extend(bitbuf)
    return 0, []


def _ops_ac_first(blocks, al, ss=1, se=63):
    ops = []
    eobrun = 0
    for blk in blocks:
        shifted = {k: _trunc(v, al) for k, v in blk.items() if k >= ss}
        nz = sorted(k for k, v in shifted.items() if v and k <= se)
        if not nz:
            eobrun += 1
            continue
        eobrun, _ = _flush_eob(ops, eobrun, [])
        prev = ss - 1
        for k in nz:
            run = k - prev - 1
            prev = k
            while run > 15:
                ops.append(("sym", 0xF0))
                run -= 16
            s = _cat(shifted[k])
            ops.append(("sym", (run << 4) | s))
            ops.append(("bits", _raw(shifted[k], s), s))
        if prev < se:
            eobrun += 1
    _flush_eob(ops, eobrun, [])
    return ops


def _ops_ac_refine(blocks, al, ss=1, se=63):
    # history = what the AC-first scan (at al+1... here al_prev=al+1) left
    ops = []
    eobrun = 0
    bitbuf = []
    for blk in blocks:
        hist = {k: _trunc(blk.get(k, 0), al + 1) for k in range(ss, se + 1)}
        corr = {k: (abs(blk.get(k, 0)) >> al) & 1 for k in range(ss, se + 1)}
        new = sorted(
            k for k in range(ss, se + 1)
            if hist[k] == 0 and _trunc(blk.get(k, 0), al) != 0
        )
        if not new:
            eobrun += 1
            bitbuf.extend(("bits", corr[k], 1) for k in range(ss, se + 1) if hist[k])
            continue
        eobrun, bitbuf = _flush_eob(ops, eobrun, bitbuf)
        k = ss
        for np_ in new:
            r = 0
            buf = []
            for i in range(k, np_):
                if hist[i]:
                    buf.append(("bits", corr[i], 1))
                else:
                    if r == 16:
                        ops.append(("sym", 0xF0))
                        ops.extend(buf)
                        buf = []
                        r = 0
                    r += 1
            if r == 16:
                ops.append(("sym", 0xF0))
                ops.extend(buf)
                buf = []
                r = 0
            ops.append(("sym", (r << 4) | 1))
            sign = 1 if _trunc(blk.get(np_, 0), al) > 0 else 0
            ops.append(("bits", sign, 1))
            ops.extend(buf)
            k = np_ + 1
        if k <= se:
            eobrun += 1
            bitbuf.extend(("bits", corr[i], 1) for i in range(k, se + 1) if hist[i])
    _flush_eob(ops, eobrun, bitbuf)
    return ops


def _write_scan(ops):
    """Build a length-4 canonical table over the symbols used; return
    (counts, symbols, entropy_bytes)."""
    syms = []
    for op in ops:
        if op[0] == "sym" and op[1] not in syms:
            syms.append(op[1])
    assert len(syms) <= 16
    code = {s: (i, 4) for i, s in enumerate(syms)}
    w = _W()
    for op in ops:
        if op[0] == "sym":
            w.put(*code[op[1]])
        else:
            _, v, nb = op
            w.put(v, nb)
    w.flush()
    counts = [0, 0, 0, len(syms)] + [0] * 12
    return counts, syms, bytes(w.out)


def enc_gray_progressive(w, h, block_coefs, q=None):
    """Four-scan progressive grayscale JPEG over the same quantized
    coefficient dicts enc_gray takes (block MCU order, zigzag keys)."""
    q = q or ([4] * 64)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))
    out += _seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))
    scans = [
        (0, 0, 0, 1, _ops_dc_first(block_coefs, 1), 0),   # tc=0
        (0, 0, 1, 0, _ops_dc_refine(block_coefs, 0), None),
        (1, 63, 0, 1, _ops_ac_first(block_coefs, 1), 1),  # tc=1
        (1, 63, 1, 0, _ops_ac_refine(block_coefs, 0), 1),
    ]
    for ss, se, ah, al, ops, tc in scans:
        counts, syms, data = _write_scan(ops)
        if tc is not None:
            out += _dht(tc, 0, counts, syms)
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)


PROG_BLOCKS = [
    {0: 10, 1: 7, 5: -3, 17: 4},
    {0: -5, 2: 1, 9: -1, 40: 5},
    {0: 8},
    {0: -32},
]


def test_jpeg_progressive_matches_baseline_exactly():
    # same quantized coefficients through both codings must reconstruct
    # identical pixels — the progression is lossless re-ordering
    base = jpeg_gray_pixels(enc_gray(32, 8, PROG_BLOCKS))
    prog = jpeg_gray_pixels(enc_gray_progressive(32, 8, PROG_BLOCKS))
    assert base is not None and prog is not None
    assert prog == base


def test_jpeg_progressive_exercises_every_scan_kind():
    # the fixture genuinely hits all four decoders: DC refine bit set
    # (-5 is odd), new +1/-1 coefficients in AC refine (k2/k9 of block
    # 2), a crossed nonzero-history correction bit (k40), and an EOB
    # run spanning blocks 2-4 in both AC scans
    ops3 = _ops_ac_first(PROG_BLOCKS, 1)
    ops4 = _ops_ac_refine(PROG_BLOCKS, 0)
    assert ("sym", 0x10) in ops3  # EOBn with r=1 (run of 3)
    assert ("sym", 0x11) in ops4  # new coef after 1 zero-history slot
    assert ("sym", 0x61) in ops4  # new coef after 6 zero-history slots
    refine_bits = [op for op in ops4 if op[0] == "bits"]
    assert len(refine_bits) >= 6  # signs + correction bits


def test_jpeg_progressive_dc_only_color_interleaved():
    # interleaved progressive DC scan over 4:2:0 sampling; AC never
    # scanned (legal partial progression) — identical to the baseline
    # DC-only encoding of the same flat image
    q = [8] * 64
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))
    out += _seg(0xC2, bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
                + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _dht(0, 0, DC_COUNTS, list(range(12)))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0]))
    wtr = _W()
    preds = {1: 0, 2: 0, 3: 0}
    for cid, nblk, dc in ((1, 4, -28), (2, 1, -8), (3, 1, 12)):
        for _ in range(nblk):
            diff = dc - preds[cid]
            preds[cid] = dc
            t = _cat(diff)
            wtr.put(t, 4)
            if t:
                wtr.put(_raw(diff, t), t)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    got = jpeg_gray_pixels(bytes(out))
    want = jpeg_gray_pixels(enc_color_flat_420(16, 16, -28, -8, 12))
    assert got == want and got is not None


def test_jpeg_progressive_restart_markers():
    # DRI inside a progressive DC scan: predictors reset at each RSTn
    q = [4] * 64
    dcs = [8, 16, 24, 32]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q))
    out += _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (32).to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, DC_COUNTS, list(range(12)))
    out += _seg(0xDD, (2).to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    pred = 0
    nrst = 0
    wtr = _W()
    for bi, dc in enumerate(dcs):
        if bi and bi % 2 == 0:
            wtr.flush()
            out += wtr.out
            wtr = _W()
            out += bytes([0xFF, 0xD0 + (nrst % 8)])
            nrst += 1
            pred = 0
        diff = dc - pred
        pred = dc
        t = _cat(diff)
        wtr.put(t, 4)
        if t:
            wtr.put(_raw(diff, t), t)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    w, h, g = jpeg_gray_pixels(bytes(out))
    assert (w, h) == (32, 8)
    assert [g[0], g[8], g[16], g[24]] == [132, 136, 140, 144]


def test_jpeg_progressive_malformed_returns_none():
    good = enc_gray_progressive(32, 8, PROG_BLOCKS)
    assert jpeg_gray_pixels(good[:60]) is None
    # an AC scan claiming 2 components is illegal in progressive
    bad = good.replace(bytes([1, 1, 0x00, 1, 63]), bytes([2, 1, 0x00, 1, 63]), 1)
    assert jpeg_gray_pixels(bad) is None


def test_decode_image_routes_progressive_jpeg():
    from etl_wrap_spark.operators import multimodal

    if multimodal._pil() is not None:
        return  # Pillow env: the C decoder takes the route instead
    blob = enc_gray_progressive(32, 8, PROG_BLOCKS)
    feat = multimodal.decode_image(blob, fake=False)
    assert len(feat) == 16 and all(0.0 <= f <= 1.0 for f in feat)
    # must equal the baseline route's features for the same coefficients
    base = multimodal.decode_image(enc_gray(32, 8, PROG_BLOCKS), fake=False)
    assert feat == base
