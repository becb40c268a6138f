"""MPEG-1 Audio Layer III (.mp3) decode — pure stdlib (round-10 verdict
ask #5; precedent: stdlib progressive JPEG r8, Layer I/II r10).

What is EXACT per ISO/IEC 11172-3 (spec-structured logic, no tabulated
filter data): frame/side-info bit layout (MPEG-1 mono 17-byte / stereo
32-byte side info), the bit reservoir (main_data_begin back-pointer
across frames), scfsi scalefactor sharing, the slen1/slen2
scalefac_compress table, scalefactor band edges per sample rate
(long + short), requantization ( |ix|^(4/3) * 2^((global_gain-210)/4)
* 2^(-sf_mult*(scalefac + preflag*pretab)) with sf_mult =
(scalefac_scale+1)/2 and short-block subblock_gain ), short-block
reorder, MS stereo ( (M±S)/sqrt(2) ), alias reduction (the 8 csi/cai
butterflies derived from the published ci coefficients), the 36/12
point IMDCT with all four block-type windows, overlap-add, frequency
inversion, and the polyphase synthesis shared with Layer I/II
(mpeg_audio._Synth — the derived-prototype deviation documented there
applies here identically).

What is a SUBSET (documented, fail-loud): the Huffman code tables.
ISO Table B.7 holds 32 big-value tables + 2 count1 tables (~1.5k
arbitrary (value, code) entries with no closed form and no in-container
ground truth to validate against). Implemented here: big-value table 0
(the empty table — zero-filled regions), big-value table 1 (4 codes),
and count1 table B (16 fixed 4-bit codes) — small enough to reproduce
confidently, and structurally VERIFIED prefix-free-complete (Kraft
equality) by the test suite. A stream whose side info selects any
other table raises UnsupportedMp3Feature naming the table, and
multimodal.decode_audio falls through to its soundfile gate — never a
silent wrong decode. Intensity stereo (mode_ext bit 0) is likewise
gated. The test-side encoder (tests/test_mpeg_layer3.py) restricts
itself to the implemented subset and round-trips bitstreams
bit-exactly down to the decoded integer spectrum, so everything EXCEPT
the missing table data is pinned.

Reference parity note: the reference ETL treats audio as opaque binary
(SURVEY §2 multimodal); this module narrows decode_audio's
dependency gate from {mp3, ogg} to {ogg, mp3-with-unimplemented-
huffman-tables}.
"""

from __future__ import annotations

import math

from etl_wrap_spark.operators.mpeg_audio import (
    _Bits,
    _Synth,
    _ensure_calibrated,
    mpeg_meta,
    parse_header,
)


class UnsupportedMp3Feature(ValueError):
    """A valid Layer III stream using a feature outside the implemented
    subset (huffman table > 1, count1 table A, intensity stereo)."""


# ------------------------------------------------------------ tables
# scalefac_compress -> (slen1, slen2)  [ISO 2.4.2.7]
_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# preemphasis per long scalefactor band [ISO 2.4.3.4]
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

# scalefactor band edges (start line of each band; last entry 576/192)
# indexed by the header sample-rate index: 0=44100, 1=48000, 2=32000
_SFB_LONG = {
    0: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
        162, 196, 238, 288, 342, 418, 576],
    1: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
        156, 190, 230, 276, 330, 384, 576],
    2: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
        194, 240, 296, 364, 448, 550, 576],
}
_SFB_SHORT = {
    0: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    1: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    2: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

# Implemented Huffman subset (see module docstring). Code maps are
# {(nbits, code_int): (x, y)}; tests assert Kraft completeness.
_HUFF_BIG = {
    0: {},  # table 0: region is all zeros, zero bits read
    1: {
        (1, 0b1): (0, 0),
        (2, 0b01): (1, 0),
        (3, 0b001): (0, 1),
        (3, 0b000): (1, 1),
    },
}
_HUFF_BIG_MAXLEN = {0: 0, 1: 3}
# count1 table B: 16 fixed 4-bit codes, code = one's complement of the
# (v,w,x,y) nibble (reconstructed from the public standard's structure;
# self-consistent with the test encoder either way)
_HUFF_COUNT1_B = {(4, 15 - i): (
    (i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1) for i in range(16)}

# alias-reduction butterflies [ISO 2.4.3.4 Table B.9]
_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
_CS = [1.0 / math.sqrt(1.0 + c * c) for c in _CI]
_CA = [c / math.sqrt(1.0 + c * c) for c in _CI]

_SQRT2 = math.sqrt(2.0)

# IMDCT cosine matrices (closed form, computed once)
_IMDCT36 = [
    [math.cos(math.pi / 72.0 * (2 * p + 1 + 18) * (2 * m + 1))
     for m in range(18)]
    for p in range(36)
]
_IMDCT12 = [
    [math.cos(math.pi / 24.0 * (2 * p + 1 + 6) * (2 * m + 1))
     for m in range(6)]
    for p in range(12)
]
_WIN_NORMAL = [math.sin(math.pi / 36.0 * (p + 0.5)) for p in range(36)]
_WIN_SHORT = [math.sin(math.pi / 12.0 * (p + 0.5)) for p in range(12)]
_WIN_START = (
    _WIN_NORMAL[:18]
    + [1.0] * 6
    + [math.sin(math.pi / 12.0 * (p - 18 + 0.5)) for p in range(24, 30)]
    + [0.0] * 6
)
_WIN_STOP = (
    [0.0] * 6
    + [math.sin(math.pi / 12.0 * (p - 6 + 0.5)) for p in range(6, 12)]
    + [1.0] * 6
    + _WIN_NORMAL[18:]
)
_WINDOWS = {0: _WIN_NORMAL, 1: _WIN_START, 3: _WIN_STOP}


# ------------------------------------------------------------ side info
def _read_side_info(bits: _Bits, nch: int) -> dict:
    si: dict = {"main_data_begin": bits.read(9)}
    bits.read(5 if nch == 1 else 3)  # private_bits
    si["scfsi"] = [[bits.read(1) for _ in range(4)] for _ in range(nch)]
    si["gr"] = []
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g: dict = {
                "part2_3_length": bits.read(12),
                "big_values": bits.read(9),
                "global_gain": bits.read(8),
                "scalefac_compress": bits.read(4),
                "windows_switching": bits.read(1),
            }
            if g["windows_switching"]:
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read(1)
                g["table_select"] = [bits.read(5) for _ in range(2)]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError("reserved block_type with switching")
                # switched blocks: fixed regions [ISO 2.4.2.7]
                g["region0_count"] = 8 if g["block_type"] == 2 else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5) for _ in range(3)]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = bits.read(1)
            g["scalefac_scale"] = bits.read(1)
            g["count1table_select"] = bits.read(1)
            chs.append(g)
        si["gr"].append(chs)
    return si


# ------------------------------------------------------------ main data
def _read_scalefactors(bits: _Bits, g: dict, scfsi, prev) -> dict:
    """Returns {'l': [21 ints], 's': [[3] x 12]} and consumes part2
    bits. scfsi sharing (granule 1, long blocks) copies from prev."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    sf = {"l": [0] * 22, "s": [[0, 0, 0] for _ in range(13)]}
    if g["windows_switching"] and g["block_type"] == 2:
        if g["mixed_block"]:
            raise UnsupportedMp3Feature("mixed blocks not implemented")
        for band in range(6):
            for w in range(3):
                sf["s"][band][w] = bits.read(slen1)
        for band in range(6, 12):
            for w in range(3):
                sf["s"][band][w] = bits.read(slen2)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (lo, hi, slen) in enumerate(groups):
            if prev is not None and scfsi[gi]:
                for band in range(lo, hi):
                    sf["l"][band] = prev["l"][band]
            else:
                for band in range(lo, hi):
                    sf["l"][band] = bits.read(slen)
    return sf


def _decode_huffman(bits: _Bits, g: dict, sr_idx: int, part3_end: int):
    """Integer spectrum ix[576] from the big-values pair regions + the
    count1 quad region, stopping at part3_end (bit position)."""
    ix = [0] * 576
    bv_lines = g["big_values"] * 2
    if bv_lines > 576:
        raise ValueError("big_values out of range")
    if g["windows_switching"]:
        region1_start = 36
        region2_start = 576  # no region 2
    else:
        long_edges = _SFB_LONG[sr_idx]
        region1_start = long_edges[min(g["region0_count"] + 1, 22)]
        region2_start = long_edges[
            min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)
        ]
    pos = 0
    while pos < bv_lines:
        if pos < region1_start:
            tsel = g["table_select"][0]
        elif pos < region2_start:
            tsel = g["table_select"][1]
        else:
            tsel = g["table_select"][2]
        if tsel not in _HUFF_BIG:
            raise UnsupportedMp3Feature(
                f"huffman table {tsel} not in the implemented subset "
                "(tables 0 and 1; see module docstring)"
            )
        table = _HUFF_BIG[tsel]
        if not table:  # table 0: zero pair, zero bits
            pos += 2
            continue
        maxlen = _HUFF_BIG_MAXLEN[tsel]
        code = 0
        n = 0
        while True:
            code = (code << 1) | bits.read(1)
            n += 1
            hit = table.get((n, code))
            if hit is not None:
                break
            if n > maxlen:
                raise ValueError("invalid huffman code in big values")
        x, y = hit
        if x and bits.read(1):
            x = -x
        if y and bits.read(1):
            y = -y
        ix[pos], ix[pos + 1] = x, y
        pos += 2
    # count1 region: quads until part3 bits are exhausted (a final quad
    # that overruns the boundary is discarded per the spec's stuffing
    # tolerance)
    if g["count1table_select"] == 0:
        if bits.pos < part3_end:
            raise UnsupportedMp3Feature(
                "count1 table A not in the implemented subset"
            )
    while bits.pos < part3_end and pos + 4 <= 576:
        code = 0
        n = 0
        quad = None
        while n < 4:
            code = (code << 1) | bits.read(1)
            n += 1
            quad = _HUFF_COUNT1_B.get((n, code))
            if quad is not None:
                break
        if quad is None:
            raise ValueError("invalid count1 code")
        vals = []
        for q in quad:
            if q and bits.pos < part3_end + 4:
                q = -q if bits.read(1) else q
            vals.append(q)
        if bits.pos > part3_end:  # overran: stuffing, discard the quad
            break
        for q in vals:
            ix[pos] = q
            pos += 1
    bits.pos = part3_end
    return ix, pos


def _requantize(ix, g: dict, sf: dict, sr_idx: int) -> list[float]:
    gain = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    sf_mult = 0.5 * (g["scalefac_scale"] + 1)
    xr = [0.0] * 576
    p43 = {}

    def pow43(v: int) -> float:
        a = p43.get(v)
        if a is None:
            a = abs(v) ** (4.0 / 3.0)
            p43[v] = a
        return math.copysign(a, v)

    if g["windows_switching"] and g["block_type"] == 2:
        edges = _SFB_SHORT[sr_idx]
        for band in range(12):
            lo, hi = edges[band], edges[band + 1]
            for w in range(3):
                fac = gain * 2.0 ** (
                    -2.0 * g["subblock_gain"][w]
                    - sf_mult * sf["s"][band][w]
                )
                base = lo * 3 + (hi - lo) * w
                for i in range(hi - lo):
                    v = ix[base + i]
                    if v:
                        xr[base + i] = pow43(v) * fac
    else:
        edges = _SFB_LONG[sr_idx]
        for band in range(22):
            fac = gain * 2.0 ** (
                -sf_mult * (
                    sf["l"][band]
                    + (g["preflag"] * _PRETAB[band] if band < 22 else 0)
                )
            )
            for i in range(edges[band], edges[band + 1]):
                v = ix[i]
                if v:
                    xr[i] = pow43(v) * fac
    return xr


def _reorder_short(xr, sr_idx: int) -> list[float]:
    """Short-block spectrum from scalefactor-band order (per-band, the
    3 windows consecutive) to subband line order (per line triple,
    windows interleaved) [ISO 2.4.3.4]."""
    out = [0.0] * 576
    edges = _SFB_SHORT[sr_idx]
    for band in range(12):
        lo, hi = edges[band], edges[band + 1]
        n = hi - lo
        src = lo * 3
        for w in range(3):
            for i in range(n):
                out[3 * (lo + i) + w] = xr[src + w * n + i]
    return out


def _alias_reduce(xr) -> None:
    for sb in range(1, 32):
        base = 18 * sb
        for i in range(8):
            a = xr[base - 1 - i]
            b = xr[base + i]
            xr[base - 1 - i] = a * _CS[i] - b * _CA[i]
            xr[base + i] = b * _CS[i] + a * _CA[i]


def _imdct_granule(xr, block_type: int, overlap) -> list[float]:
    """18 spectral lines per subband -> 18 time samples per subband,
    with the 36-sample window overlap-add state in `overlap` (32 lists
    of 18). Returns 576 time-domain subband samples (subband-major)."""
    out = [0.0] * 576
    for sb in range(32):
        X = xr[18 * sb:18 * sb + 18]
        if block_type == 2:
            z = [0.0] * 36
            for w in range(3):
                Xw = [X[3 * m + w] for m in range(6)]
                for p in range(12):
                    row = _IMDCT12[p]
                    v = (row[0] * Xw[0] + row[1] * Xw[1] + row[2] * Xw[2]
                         + row[3] * Xw[3] + row[4] * Xw[4] + row[5] * Xw[5])
                    z[6 + 6 * w + p] += v * _WIN_SHORT[p]
        else:
            win = _WINDOWS[block_type]
            z = [0.0] * 36
            for p in range(36):
                row = _IMDCT36[p]
                acc = 0.0
                for m in range(18):
                    acc += row[m] * X[m]
                z[p] = acc * win[p]
        prev = overlap[sb]
        for i in range(18):
            out[18 * sb + i] = z[i] + prev[i]
        overlap[sb] = z[18:]
    return out


def _freq_invert(ss) -> None:
    for sb in range(1, 32, 2):
        base = 18 * sb
        for i in range(1, 18, 2):
            ss[base + i] = -ss[base + i]


# ------------------------------------------------------------ decoder
def decode_mp3(
    content: bytes,
    max_frames: int | None = None,
    spectra_out: list | None = None,
):
    """Decode MPEG-1 Layer III to PCM → (sample_rate, [ch0, ch1...]),
    floats in ~[-1, 1]. Raises UnsupportedMp3Feature for streams using
    huffman tables / stereo modes outside the implemented subset (the
    caller falls through to its dependency gate) and plain ValueError
    for corrupt streams. ``spectra_out``, if given, receives one
    (frame, granule, channel, ix[576]) tuple per decoded granule — the
    tests' bit-exact integer-spectrum hook."""
    _ensure_calibrated()
    meta = mpeg_meta(content)
    if meta is None or meta["layer"] != 3:
        raise ValueError("no MPEG-1 Layer III sync found")
    sr_idx = [44100, 48000, 32000].index(meta["sample_rate"])
    nch = meta["channels"]
    synth = [_Synth() for _ in range(nch)]
    overlap = [[[0.0] * 18 for _ in range(32)] for _ in range(nch)]
    pcm: list[list[float]] = [[] for _ in range(nch)]
    reservoir = b""
    off = meta["first_frame_offset"]
    frames = 0
    while off + 4 <= len(content):
        h = parse_header(content, off)
        if h is None or h["layer"] != 3 or (
            h["sample_rate"] != meta["sample_rate"]
            or h["channels"] != nch  # mode switch would mis-size side info
        ):
            break
        end = off + h["frame_bytes"]
        if end > len(content):
            break
        if h["mode"] == 1 and (h["mode_ext"] & 1):
            raise UnsupportedMp3Feature("intensity stereo not implemented")
        body = content[off:end]
        side_off = 4 + (2 if h["protection"] else 0)
        side_len = 17 if nch == 1 else 32
        sbits = _Bits(body, side_off * 8)
        si = _read_side_info(sbits, nch)
        main = body[side_off + side_len:]
        start = len(reservoir) - si["main_data_begin"]
        if start < 0:
            # not enough reservoir yet (stream started mid-reservoir):
            # skip the frame's audio, keep its main data
            reservoir = (reservoir + main)[-511:]
            off = end
            continue
        data = reservoir[start:] + main
        bits = _Bits(data, 0)
        ms = h["mode"] == 1 and (h["mode_ext"] & 2)
        prev_sf = [None] * nch
        truncated = False
        for gr in range(2):
            xr_ch = []
            for ch in range(nch):
                g = si["gr"][gr][ch]
                part_start = bits.pos
                try:
                    sf = _read_scalefactors(
                        bits, g, si["scfsi"][ch],
                        prev_sf[ch] if gr == 1 else None,
                    )
                    if gr == 0:
                        prev_sf[ch] = sf
                    part3_end = part_start + g["part2_3_length"]
                    ix, _ = _decode_huffman(bits, g, sr_idx, part3_end)
                except IndexError:
                    # main data ran out mid-granule (corrupt/truncated
                    # stream) — stop at the last whole frame, the L1/L2
                    # dirty-blob convention
                    truncated = True
                    break
                if spectra_out is not None:
                    spectra_out.append((frames, gr, ch, list(ix)))
                xr = _requantize(ix, g, sf, sr_idx)
                if g["windows_switching"] and g["block_type"] == 2:
                    xr = _reorder_short(xr, sr_idx)
                xr_ch.append((xr, g))
            if truncated:
                break
            if ms:
                m, s = xr_ch[0][0], xr_ch[1][0]
                for i in range(576):
                    a, b = m[i], s[i]
                    m[i] = (a + b) / _SQRT2
                    s[i] = (a - b) / _SQRT2
            for ch in range(nch):
                xr, g = xr_ch[ch]
                if not (g["windows_switching"] and g["block_type"] == 2):
                    _alias_reduce(xr)
                ss = _imdct_granule(xr, g["block_type"], overlap[ch])
                _freq_invert(ss)
                for t in range(18):
                    pcm[ch].extend(
                        synth[ch].run([ss[18 * sb + t] for sb in range(32)])
                    )
        if truncated:
            break
        reservoir = (reservoir + main)[-511:]
        off = end
        frames += 1
        if max_frames is not None and frames >= max_frames:
            break
    if not frames:
        raise ValueError("no decodable Layer III frame")
    return meta["sample_rate"], pcm
