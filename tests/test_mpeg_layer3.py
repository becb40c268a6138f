"""MPEG-1 Layer III decoder tests (operators/mpeg_layer3.py).

Strategy mirrors test_mpeg_audio (the Layer I/II precedent): a
spec-derived TEST ENCODER builds real bitstreams restricted to the
implemented huffman subset, and the decoder must (a) recover the
INTEGER SPECTRUM bit-exactly (the spectra_out hook — this pins side
info, the bit reservoir, scalefactors, and huffman decode with no
tolerance at all), and (b) produce PCM matching an INDEPENDENT numpy
reference of requantize→(reorder)→(MS)→alias→IMDCT→overlap→invert
feeding the shared synthesis bank. Structural table checks (Kraft
completeness / prefix-freeness) guard the committed code tables.
"""

from __future__ import annotations

import math
import random

import pytest

from etl_wrap_spark.operators import mpeg_layer3 as L3
from etl_wrap_spark.operators.mpeg_audio import _Synth, _ensure_calibrated


# ------------------------------------------------------------ encoder
class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self, pad_to_bytes: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to_bytes is not None:
            assert len(out) <= pad_to_bytes, "payload overflows frame"
            out.extend(b"\x00" * (pad_to_bytes - len(out)))
        return bytes(out)


_ENC_BIG1 = {v: k for k, v in L3._HUFF_BIG[1].items()}      # (x,y)->(n,code)
_ENC_C1B = {v: k for k, v in L3._HUFF_COUNT1_B.items()}     # quad ->(n,code)


def encode_granule_bits(
    ix: list[int],
    bv_pairs: int,
    c1_quads: int,
    block_type: int = 0,
) -> tuple[_BitWriter, int]:
    """Huffman-code one granule's integer spectrum (values in
    {-1,0,1}; big-value pairs via table 1, then c1_quads quads via
    count1 table B). Returns (writer, part2_3_length)."""
    w = _BitWriter()
    n0 = len(w.bits)
    for p in range(bv_pairs):
        x, y = abs(ix[2 * p]), abs(ix[2 * p + 1])
        n, code = _ENC_BIG1[(x, y)]
        w.put(code, n)
        if x:
            w.put(1 if ix[2 * p] < 0 else 0, 1)
        if y:
            w.put(1 if ix[2 * p + 1] < 0 else 0, 1)
    base = bv_pairs * 2
    for q in range(c1_quads):
        vals = ix[base + 4 * q: base + 4 * q + 4]
        idx = ((abs(vals[0]) << 3) | (abs(vals[1]) << 2)
               | (abs(vals[2]) << 1) | abs(vals[3]))
        n, code = _ENC_C1B[tuple(abs(v) for v in vals)]
        assert n == 4 and code == 15 - idx
        w.put(code, 4)
        for v in vals:
            if v:
                w.put(1 if v < 0 else 0, 1)
    return w, len(w.bits) - n0


def _side_info_granule(
    w: _BitWriter, part23: int, bv_pairs: int, global_gain: int,
    block_type: int, table0: int = 1, table1: int = 1, table2: int = 1,
    scalefac_compress: int = 0, preflag: int = 0, scalefac_scale: int = 0,
) -> None:
    w.put(part23, 12)
    w.put(bv_pairs, 9)
    w.put(global_gain, 8)
    w.put(scalefac_compress, 4)
    if block_type == 2:
        w.put(1, 1)                  # windows_switching
        w.put(2, 2)                  # block_type
        w.put(0, 1)                  # mixed off
        w.put(table0, 5)
        w.put(table1, 5)
        for _ in range(3):
            w.put(0, 3)              # subblock_gain
    else:
        w.put(0, 1)
        w.put(table0, 5)
        w.put(table1, 5)
        w.put(table2, 5)
        w.put(0, 4)                  # region0_count
        w.put(0, 3)                  # region1_count
    w.put(preflag, 1)
    w.put(scalefac_scale, 1)
    w.put(1, 1)                      # count1table_select = B


def _scalefac_bits_long(
    w: _BitWriter, scalefacs: list[int], scalefac_compress: int,
    scfsi: list[int], granule: int,
) -> int:
    """Write granule long-block scalefactors honoring scfsi sharing
    (granule 1 skips shared groups); returns bits written."""
    slen1, slen2 = L3._SLEN[scalefac_compress]
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    n0 = len(w.bits)
    for gi, (lo, hi, slen) in enumerate(groups):
        if granule == 1 and scfsi[gi]:
            continue
        for band in range(lo, hi):
            w.put(scalefacs[band], slen)
    return len(w.bits) - n0


def encode_frames(
    granules: list[list[dict]],
    sample_rate: int = 32000,
    bitrate: int = 320,
    nch: int = 1,
    mode: int | None = None,
    mode_ext: int = 0,
    reservoir_bytes: int = 0,
    scfsi: list[int] | None = None,
) -> bytes:
    """Assemble whole MPEG-1 Layer III frames. `granules` is a list of
    frames, each frame a list of 2*nch granule dicts (gr0ch0, gr0ch1,
    gr1ch0, gr1ch1) with keys ix/bv_pairs/c1_quads/global_gain/
    block_type and optional scalefacs (21 longs)/scalefac_compress/
    preflag/scalefac_scale. reservoir_bytes > 0 exercises the bit
    reservoir: each frame's main data is shifted that many bytes into
    the PREVIOUS frame's slot (main_data_begin). `scfsi` (4 flags,
    applied to every channel) makes granule 1 share those scalefactor
    groups with granule 0 — granule 1's dicts then must not re-specify
    the shared bands differently."""
    scfsi = scfsi or [0, 0, 0, 0]
    frame_bytes = 144 * bitrate * 1000 // sample_rate
    sr_idx = [44100, 48000, 32000].index(sample_rate)
    side_len = 17 if nch == 1 else 32
    slot = frame_bytes - 4 - side_len
    if mode is None:
        mode = 3 if nch == 1 else 0
    # per-frame main payloads + side infos
    payloads, sides = [], []
    for f, frame in enumerate(granules):
        side = _BitWriter()
        begin = reservoir_bytes if f > 0 else 0
        side.put(begin, 9)
        side.put(0, 5 if nch == 1 else 3)       # private
        for _ in range(nch):
            for s in scfsi:
                side.put(s, 1)
        main = _BitWriter()
        for gi, g in enumerate(frame):
            sf_bits = 0
            if "scalefacs" in g:
                sf_bits = _scalefac_bits_long(
                    main, g["scalefacs"], g.get("scalefac_compress", 0),
                    scfsi, gi // nch,
                )
            w, part3 = encode_granule_bits(
                g["ix"], g["bv_pairs"], g["c1_quads"],
                g.get("block_type", 0),
            )
            _side_info_granule(
                side, sf_bits + part3, g["bv_pairs"], g["global_gain"],
                g.get("block_type", 0),
                scalefac_compress=g.get("scalefac_compress", 0),
                preflag=g.get("preflag", 0),
                scalefac_scale=g.get("scalefac_scale", 0),
            )
            main.bits.extend(w.bits)
        payloads.append(main.to_bytes())
        sides.append(side.to_bytes(side_len))
    # pack payloads into slots honoring main_data_begin
    out = bytearray()
    header = _BitWriter()
    bidx = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320].index(bitrate)
    header.put(0x7FF, 11)
    header.put(3, 2)        # MPEG-1
    header.put(1, 2)        # layer III
    header.put(1, 1)        # no CRC
    header.put(bidx, 4)
    header.put(sr_idx, 2)
    header.put(0, 1)        # padding
    header.put(0, 1)        # private
    header.put(mode, 2)
    header.put(mode_ext, 2)
    header.put(0, 4)        # copyright/original/emphasis
    hdr = header.to_bytes(4)
    slots = [bytearray(b"\x00" * slot) for _ in granules]
    for f, payload in enumerate(payloads):
        begin = reservoir_bytes if f > 0 else 0
        assert len(payload) <= slot, "granule payload overflows the slot"
        if begin:
            assert f > 0 and begin <= slot
            head, tail = payload[:begin], payload[begin:]
            slots[f - 1][slot - begin:] = head
            slots[f][: len(tail)] = tail
        else:
            slots[f][: len(payload)] = payload
    for f in range(len(granules)):
        out += hdr + sides[f] + bytes(slots[f])
    return bytes(out)


def _rand_spectrum(rng: random.Random, bv_pairs: int, c1_quads: int):
    ix = [0] * 576
    for i in range(bv_pairs * 2):
        ix[i] = rng.choice((-1, 0, 0, 1))
    for i in range(bv_pairs * 2, bv_pairs * 2 + c1_quads * 4):
        ix[i] = rng.choice((-1, 0, 1))
    return ix


# --------------------------------------------------- numpy reference
def _reference_pcm(frames_xr, sr_idx: int, block_types) -> list[float]:
    """Independent pipeline: alias→IMDCT→overlap→invert→_Synth, written
    with straight numpy loops against the ISO formulas (NOT by calling
    the module's helpers)."""
    import numpy as np

    _ensure_calibrated()
    synth = _Synth()
    overlap = np.zeros((32, 18))
    pcm: list[float] = []
    for xr_in, bt in zip(frames_xr, block_types):
        xr = np.array(xr_in, dtype=float)
        if bt != 2:
            # alias butterflies
            cs = np.array(L3._CS)
            ca = np.array(L3._CA)
            for sb in range(1, 32):
                for i in range(8):
                    a = xr[18 * sb - 1 - i]
                    b = xr[18 * sb + i]
                    xr[18 * sb - 1 - i] = a * cs[i] - b * ca[i]
                    xr[18 * sb + i] = b * cs[i] + a * ca[i]
        ss = np.zeros(576)
        for sb in range(32):
            X = xr[18 * sb: 18 * sb + 18]
            z = np.zeros(36)
            if bt == 2:
                for w in range(3):
                    Xw = X[w::3][:6]
                    for p in range(12):
                        v = sum(
                            Xw[m] * math.cos(
                                math.pi / 24 * (2 * p + 1 + 6) * (2 * m + 1))
                            for m in range(6)
                        )
                        z[6 + 6 * w + p] += v * math.sin(
                            math.pi / 12 * (p + 0.5))
            else:
                win = L3._WINDOWS[bt]
                for p in range(36):
                    z[p] = win[p] * sum(
                        X[m] * math.cos(
                            math.pi / 72 * (2 * p + 1 + 18) * (2 * m + 1))
                        for m in range(18)
                    )
            ss[18 * sb: 18 * sb + 18] = z[:18] + overlap[sb]
            overlap[sb] = z[18:]
        for sb in range(1, 32, 2):
            for i in range(1, 18, 2):
                ss[18 * sb + i] = -ss[18 * sb + i]
        for t in range(18):
            pcm.extend(synth.run([ss[18 * sb + t] for sb in range(32)]))
    return pcm


def _requant_ref(ix, global_gain: int, sr_idx: int, block_type: int):
    """Reference requantization for the encoder's fixed settings
    (scalefactors all zero, preflag 0, subblock_gain 0)."""
    gain = 2.0 ** ((global_gain - 210) / 4.0)
    xr = [math.copysign(abs(v) ** (4.0 / 3.0), v) * gain if v else 0.0
          for v in ix]
    if block_type == 2:
        return L3._reorder_short(xr, sr_idx)
    return xr


# ------------------------------------------------------------- tests
def test_huffman_tables_prefix_free_and_complete():
    for name, table in (("big1", L3._HUFF_BIG[1]),
                        ("count1B", L3._HUFF_COUNT1_B)):
        codes = sorted(table)
        # Kraft equality: a complete prefix-free code sums to exactly 1
        assert sum(2.0 ** -n for n, _ in codes) == 1.0, name
        # explicit prefix-freeness
        as_str = [format(c, f"0{n}b") for n, c in codes]
        for i, a in enumerate(as_str):
            for j, b in enumerate(as_str):
                if i != j:
                    assert not b.startswith(a), (name, a, b)
        # all values distinct and cover the table's domain
        vals = list(table.values())
        assert len(set(vals)) == len(vals)
    assert set(L3._HUFF_BIG[1].values()) == {(x, y) for x in (0, 1)
                                             for y in (0, 1)}
    assert set(L3._HUFF_COUNT1_B.values()) == {
        ((i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1)
        for i in range(16)
    }


def test_mono_long_block_spectrum_bit_exact_and_pcm_matches_reference():
    rng = random.Random(11)
    specs = []
    frames = []
    for _f in range(3):
        frame = []
        for _g in range(2):
            ix = _rand_spectrum(rng, bv_pairs=30, c1_quads=8)
            frame.append(dict(ix=ix, bv_pairs=30, c1_quads=8,
                              global_gain=170))
            specs.append(ix)
        frames.append(frame)
    blob = encode_frames(frames)
    got_spec: list = []
    rate, chans = L3.decode_mp3(blob, spectra_out=got_spec)
    assert rate == 32000 and len(chans) == 1
    assert len(chans[0]) == 3 * 1152
    assert len(got_spec) == 6
    for k, (_f, _gr, _ch, ix) in enumerate(got_spec):
        assert ix == specs[k], f"granule {k} spectrum mismatch"
    ref = _reference_pcm(
        [_requant_ref(s, 170, 2, 0) for s in specs], 2, [0] * 6
    )
    assert max(abs(a - b) for a, b in zip(chans[0], ref)) < 1e-9


def test_short_block_granule_reorder_and_imdct():
    rng = random.Random(7)
    frame = []
    specs = []
    bts = []
    for g in range(2):
        bt = 2 if g == 1 else 0
        ix = _rand_spectrum(rng, bv_pairs=18, c1_quads=6)
        frame.append(dict(ix=ix, bv_pairs=18, c1_quads=6,
                          global_gain=168, block_type=bt))
        specs.append(ix)
        bts.append(bt)
    blob = encode_frames([frame])
    got_spec: list = []
    rate, chans = L3.decode_mp3(blob, spectra_out=got_spec)
    assert [s[3] for s in got_spec] == specs
    ref = _reference_pcm(
        [_requant_ref(s, 168, 2, bt) for s, bt in zip(specs, bts)],
        2, bts,
    )
    assert max(abs(a - b) for a, b in zip(chans[0], ref)) < 1e-9


def test_ms_stereo_reconstruction():
    rng = random.Random(23)
    frame = []
    specs = []
    for _ in range(4):  # gr0(ch0,ch1) gr1(ch0,ch1)
        ix = _rand_spectrum(rng, bv_pairs=20, c1_quads=4)
        frame.append(dict(ix=ix, bv_pairs=20, c1_quads=4,
                          global_gain=166))
        specs.append(ix)
    blob = encode_frames([frame], nch=2, mode=1, mode_ext=2)
    rate, chans = L3.decode_mp3(blob)
    assert len(chans) == 2 and len(chans[0]) == 1152
    # reference: per granule, L/R = (M±S)/sqrt2 on the requantized xr
    sq2 = math.sqrt(2.0)
    xs = [_requant_ref(s, 166, 2, 0) for s in specs]
    left = [[(m + s) / sq2 for m, s in zip(xs[0], xs[1])],
            [(m + s) / sq2 for m, s in zip(xs[2], xs[3])]]
    right = [[(m - s) / sq2 for m, s in zip(xs[0], xs[1])],
             [(m - s) / sq2 for m, s in zip(xs[2], xs[3])]]
    ref_l = _reference_pcm(left, 2, [0, 0])
    ref_r = _reference_pcm(right, 2, [0, 0])
    assert max(abs(a - b) for a, b in zip(chans[0], ref_l)) < 1e-9
    assert max(abs(a - b) for a, b in zip(chans[1], ref_r)) < 1e-9


def test_bit_reservoir_roundtrip():
    rng = random.Random(31)
    frames, specs = [], []
    for _f in range(3):
        frame = []
        for _g in range(2):
            ix = _rand_spectrum(rng, bv_pairs=24, c1_quads=4)
            frame.append(dict(ix=ix, bv_pairs=24, c1_quads=4,
                              global_gain=170))
            specs.append(ix)
        frames.append(frame)
    blob = encode_frames(frames, reservoir_bytes=11)
    got_spec: list = []
    rate, chans = L3.decode_mp3(blob, spectra_out=got_spec)
    assert len(got_spec) == 6
    for k, (_f, _gr, _ch, ix) in enumerate(got_spec):
        assert ix == specs[k], f"granule {k} mismatch across reservoir"


def test_unsupported_table_raises_and_gate_catches():
    ix = [0] * 576
    frame = [dict(ix=ix, bv_pairs=4, c1_quads=0, global_gain=160)
             for _ in range(2)]
    blob = bytearray(encode_frames([frame]))
    # flip granule 0's table_select[0] from 1 to 7 (bits 18..22 of the
    # granule side info: after main_data_begin 9 + private 5 + scfsi 4
    # = 18 bits, then part23 12 + bv 9 + gain 8 + compress 4 + switch 1
    # = 34 -> table_select starts at side-info bit 52
    side_start = 4 * 8
    bitpos = side_start + 18 + 34
    for i, bit in enumerate([0, 0, 1, 1, 1]):  # 5-bit value 7
        p = bitpos + i
        byte, off = p // 8, 7 - (p % 8)
        blob[byte] = (blob[byte] & ~(1 << off)) | (bit << off)
    with pytest.raises(L3.UnsupportedMp3Feature):
        L3.decode_mp3(bytes(blob))
    # decode_audio falls through to its gate instead of crashing
    from etl_wrap_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(bytes(blob))


def test_decode_audio_routes_mp3():
    """End-to-end: an mp3 with a single active spectral line yields a
    tone whose dominant frequency lands where MDCT line geometry says
    (line L -> (L + 0.5) * sr / 1152), and decode_audio returns real
    nonzero loudness features for it."""
    L = 40
    ix = [0] * 576
    ix[2 * L] = 1  # within the big-values region
    frame = [dict(ix=ix[:], bv_pairs=L + 1, c1_quads=0, global_gain=210)
             for _ in range(2)]
    blob = encode_frames([frame] * 8)
    from etl_wrap_spark.operators.mpeg_audio import decode_mpeg1_audio

    rate, chans = decode_mpeg1_audio(blob)
    assert rate == 32000 and len(chans[0]) == 8 * 1152
    x = chans[0][1152:-1152]  # drop transients
    # dominant frequency via DOWNWARD zero crossings (one per period)
    zc = sum(1 for a, b in zip(x, x[1:]) if (a < 0) <= (b < 0) and a * b < 0)
    f_est = zc * rate / float(len(x))
    f_true = (2 * L + 0.5) * rate / 1152.0
    assert abs(f_est - f_true) / f_true < 0.05, (f_est, f_true)
    from etl_wrap_spark.operators.multimodal import decode_audio

    feats = decode_audio(blob)
    assert len(feats) == len(decode_audio(blob, fake=True))
    assert max(feats) > 0.0


def test_mpeg_meta_identifies_layer3():
    frame = [dict(ix=[0] * 576, bv_pairs=2, c1_quads=0, global_gain=150)
             for _ in range(2)]
    blob = encode_frames([frame] * 2)
    m = L3.mpeg_meta(blob)
    assert m is not None and m["layer"] == 3
    assert m["sample_rate"] == 32000 and m["bitrate_kbps"] == 320


def test_scalefactors_scfsi_preflag_at_44100():
    """Nonzero scalefactors exercise what the zero-sf tests cannot: the
    slen1/slen2 coding (scalefac_compress=11 -> slen 3,1), the 44.1 kHz
    long sfb EDGES (per-band requant factors differ band to band), scfsi
    sharing (granule 1 reuses groups 0 and 3 from granule 0), preflag
    pretab addition, and scalefac_scale=1 (full-step multiplier).
    Spectra bit-exact; PCM vs a reference that requantizes independently
    against the module's published band edges."""
    rng = random.Random(43)
    slen1, slen2 = L3._SLEN[11]
    assert (slen1, slen2) == (3, 1)
    sf0 = [rng.randrange(1 << slen1) if b < 11 else rng.randrange(1 << slen2)
           for b in range(21)]
    sf1 = list(sf0)
    for b in range(6, 16):  # groups 1 and 2 differ; 0 and 3 shared
        sf1[b] = rng.randrange(1 << (slen1 if b < 11 else slen2))
    scfsi = [1, 0, 0, 1]
    g0 = dict(ix=_rand_spectrum(rng, 40, 6), bv_pairs=40, c1_quads=6,
              global_gain=180, scalefacs=sf0, scalefac_compress=11,
              scalefac_scale=1)
    g1 = dict(ix=_rand_spectrum(rng, 40, 6), bv_pairs=40, c1_quads=6,
              global_gain=176, scalefacs=sf1, scalefac_compress=11,
              preflag=1)
    blob = encode_frames([[g0, g1]], sample_rate=44100, scfsi=scfsi)
    got_spec: list = []
    rate, chans = L3.decode_mp3(blob, spectra_out=got_spec)
    assert rate == 44100
    assert got_spec[0][3] == g0["ix"] and got_spec[1][3] == g1["ix"]

    def requant_full(ix, gg, sf, preflag, sfs):
        gain = 2.0 ** ((gg - 210) / 4.0)
        mult = 0.5 * (sfs + 1)
        edges = L3._SFB_LONG[0]
        sfx = list(sf) + [0]
        xr = [0.0] * 576
        for band in range(22):
            fac = gain * 2.0 ** (
                -mult * (sfx[band] + preflag * L3._PRETAB[band]))
            for i in range(edges[band], edges[band + 1]):
                v = ix[i]
                if v:
                    xr[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * fac
        return xr

    ref = _reference_pcm(
        [requant_full(g0["ix"], 180, sf0, 0, 1),
         requant_full(g1["ix"], 176, sf1, 1, 0)],
        0, [0, 0],
    )
    assert max(abs(a - b) for a, b in zip(chans[0], ref)) < 1e-9


def test_truncated_main_data_stops_at_last_whole_frame():
    """A stream whose final frame's main data is cut mid-granule must
    decode the preceding whole frames and stop — never IndexError out
    of decode_audio's ValueError contract."""
    rng = random.Random(3)
    frames = []
    for _f in range(3):
        frames.append([dict(ix=_rand_spectrum(rng, 30, 4), bv_pairs=30,
                            c1_quads=4, global_gain=170) for _ in range(2)])
    blob = bytearray(encode_frames(frames, bitrate=64))
    # corrupt frame 3's side info so part2_3_length demands more bits
    # than the 64 kbps slot (288-4-17 = 267 bytes) holds: set granule
    # 0's part2_3_length to max (4095 bits = 512 bytes)
    frame_bytes = 144 * 64 * 1000 // 32000
    side_bit = (2 * frame_bytes + 4) * 8 + 18  # frame 3, first granule
    for i in range(12):
        p = side_bit + i
        blob[p // 8] |= (1 << (7 - p % 8))
    rate, chans = L3.decode_mp3(bytes(blob))
    # two whole frames survive; the corrupt frame's still-parseable
    # leading granule may emit (valid data), the exhausted one never does
    assert 2 * 1152 <= len(chans[0]) < 3 * 1152
