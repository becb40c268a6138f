"""MPEG-1 Audio Layer I/II (.mp2/.mp1) PCM decode — pure stdlib.

The last dependency-gated media format with a feasible no-dependency
path (round-9 VERDICT ask #5; precedent: the stdlib progressive-JPEG
decoder). Reference behavior: ETL pipelines treat audio blobs as opaque
binary + metadata (SURVEY §2 multimodal); this module gives
`decode_audio` REAL samples for the MPEG-1 layers whose data tables are
small enough to reproduce from the public standard's structure:

EXACT per ISO/IEC 11172-3 (bit-for-bit bitstream interpretation):
- frame sync/header fields, bitrate/samplerate tables, padding, CRC skip
- Layer I: 4-bit allocation, 6-bit scalefactors, 12 samples/subband
- Layer II: the four allocation tables (B.2a-d) with their
  rate/samplerate selection, scfsi scalefactor sharing, grouped
  (3/5/9-level) sample codes de-grouped base-`levels`
- scalefactors: scf[i] = 2 * 2^(-i/3) (closed form, i = 0..62)
- requantization: the spec's C*(s'''+D) dequant reduces ALGEBRAICALLY
  to the uniform midpoint (2*code + 1 - levels) / levels for every
  quantization class, grouped and ungrouped (derivation in
  `_dequant`'s docstring) — no C/D tables needed, identical values.

DERIVED (documented deviation): the 512-tap polyphase prototype window.
The ISO window is a TABULATED filter design (Annex B tables C/D, 512
optimized coefficients with no closed form); reproducing them from
memory is impossible and copying a decoder's tables is out of scope.
This module synthesizes with the spec's exact STRUCTURE — the
cos((16+i)(2k+1)pi/64) matrixing, the 1024-entry V FIFO, the windowed
16-block accumulation, the 481-sample delay — but a derived prototype
whose target magnitude |H(w)| = cos(16w) on the transition is EXACTLY
power-complementary between adjacent bands (closed-form inverse
transform; see _build_prototype), gain-calibrated lazily against a
band-center-tone round trip through the module's own analysis bank.
Consequence: decoded PCM deviates from a libmad/ffmpeg decode by a
small filterbank-mismatch term (analysis+synthesis noise round trip:
1.8e-3 relative RMS, measured); the segment-RMS loudness features
`decode_audio` exists to produce move ~0.2% relative — real envelopes,
not approximations of them. A parity probe against soundfile runs when
that library is importable (env-gated skip otherwise, the live-sshd
convention).

Layer III (.mp3): decoded by operators/mpeg_layer3.py since round 11 —
full spec-structured pipeline (side info, bit reservoir, scalefactors,
requantization, short-block reorder, MS stereo, alias reduction,
36/12-point IMDCT, this module's synthesis bank) with a documented
HUFFMAN-TABLE SUBSET: the ISO Table B.7 code tables are ~1.5k entries
of arbitrary tabulated data with no in-container ground truth, so only
the confidently-reproducible small tables ship (0, 1, count1 B) and a
stream selecting any other table raises UnsupportedMp3Feature, which
multimodal.decode_audio's soundfile gate catches — never a silent
wrong decode.
"""

from __future__ import annotations

import math

BITRATES_KBPS = {
    # MPEG-1, indexed by the 4-bit header field (0 = free format: reject)
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
SAMPLE_RATES = [44100, 48000, 32000]

# Layer II quantization classes: levels -> (bits per code, grouped).
# Grouped classes pack 3 consecutive samples into one base-`levels`
# code; ungrouped read one code per sample.
_L2_CLASS = {
    3: (5, True), 5: (7, True), 9: (10, True),
    7: (3, False), 15: (4, False), 31: (5, False), 63: (6, False),
    127: (7, False), 255: (8, False), 511: (9, False), 1023: (10, False),
    2047: (11, False), 4095: (12, False), 8191: (13, False),
    16383: (14, False), 32767: (15, False), 65535: (16, False),
}

# Layer II allocation tables (ISO 11172-3 B.2a-d): per subband, the
# list of step counts selectable by the `nbal`-bit allocation code
# (entry 0 = subband not transmitted). nbal = bit length of the index.
_ROW_HI = [0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
           16383, 32767, 65535]                      # sb 0-2   (nbal 4)
_ROW_MID = [0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 65535]                             # sb 3-10  (nbal 4)
_ROW_LOW = [0, 3, 5, 7, 9, 15, 31, 65535]            # sb 11-22 (nbal 3)
_ROW_TAIL = [0, 3, 5, 65535]                         # sb 23+   (nbal 2)
_ROW_LR0 = [0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 16383, 32767]                      # low-rate sb 0-1
_ROW_LR = [0, 3, 5, 9, 15, 31, 63, 127]              # low-rate sb 2+

_TABLE_A = [_ROW_HI] * 3 + [_ROW_MID] * 8 + [_ROW_LOW] * 12 + [_ROW_TAIL] * 4
_TABLE_B = [_ROW_HI] * 3 + [_ROW_MID] * 8 + [_ROW_LOW] * 12 + [_ROW_TAIL] * 7
_TABLE_C = [_ROW_LR0] * 2 + [_ROW_LR] * 6
_TABLE_D = [_ROW_LR0] * 2 + [_ROW_LR] * 10


def _l2_table(sample_rate: int, bitrate_kbps: int, channels: int):
    """ISO 11172-3 table selection by bitrate PER CHANNEL and rate."""
    bpc = bitrate_kbps // channels
    if (sample_rate == 48000 and bpc >= 56) or (56 <= bpc <= 80):
        return _TABLE_A
    if sample_rate != 48000 and bpc >= 96:
        return _TABLE_B
    if sample_rate != 32000 and bpc <= 48:
        return _TABLE_C
    return _TABLE_D


# scalefactors: scf[i] = 2 * 2^(-i/3), i = 0..62 (index 63 is illegal)
_SCALEFACTORS = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]


def _dequant(code: int, levels: int) -> float:
    """Requantize one code to a fraction in (-1, 1).

    The spec formulates this as s'' = C*(s''' + D) with per-class C/D
    tables (B.4), where s''' comes from the bits by MSB inversion
    (ungrouped) or base-`levels` de-grouping (grouped). Both cases
    reduce algebraically to the SAME uniform midpoint:

      ungrouped, levels = 2^nb - 1, C = 2^nb/levels, D = 2^(1-nb):
        s''' = (code - 2^(nb-1)) / 2^(nb-1)   (MSB inversion)
        C*(s'''+D) = (2*code + 2 - 2^nb)/levels = (2*code + 1 - levels)/levels
      grouped (3/5/9), C = 2^ceil(lg(levels+1))/levels, D = 1/2:
        s''' = code/(levels-1) - 1
        C*(s'''+D) = (2*code + 1 - levels)/levels   (same midpoint)

    so one closed form covers every class with values identical to the
    tabulated constants."""
    return (2 * code + 1 - levels) / levels


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


def parse_header(b: bytes, off: int = 0) -> dict | None:
    """Parse one MPEG-1 audio frame header at `off`; None if not a
    valid MPEG-1 Layer I/II/III header with a defined bitrate."""
    if off + 4 > len(b) or b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
        return None
    if (b[off + 1] >> 3) & 0x3 != 3:  # MPEG-1 only
        return None
    layer = 4 - ((b[off + 1] >> 1) & 0x3)  # 1, 2, 3 (field 0 reserved)
    if layer == 4:
        return None
    protection = not (b[off + 1] & 1)
    bidx = b[off + 2] >> 4
    sidx = (b[off + 2] >> 2) & 0x3
    if bidx in (0, 15) or sidx == 3:
        return None
    padding = (b[off + 2] >> 1) & 1
    mode = b[off + 3] >> 6
    mode_ext = (b[off + 3] >> 4) & 0x3
    bitrate = BITRATES_KBPS[layer][bidx] * 1000
    rate = SAMPLE_RATES[sidx]
    if layer == 1:
        size = (12 * bitrate // rate + padding) * 4
    else:
        size = 144 * bitrate // rate + padding
    return {
        "layer": layer,
        "bitrate_kbps": bitrate // 1000,
        "sample_rate": rate,
        "channels": 1 if mode == 3 else 2,
        "mode": mode,
        "mode_ext": mode_ext,
        "frame_bytes": size,
        "protection": protection,
    }


def mpeg_meta(content: bytes) -> dict | None:
    """First-frame metadata (the wav_meta sibling), scanning past an
    ID3v2 tag / leading junk for the first valid sync."""
    off = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        off = 10 + (
            ((content[6] & 0x7F) << 21) | ((content[7] & 0x7F) << 14)
            | ((content[8] & 0x7F) << 7) | (content[9] & 0x7F)
        )
    end = min(len(content) - 4, off + 65536)
    i = off
    while 0 <= i < end:
        # C-speed jump between 0xFF sync candidates: the two-header rule
        # no longer stops the scan at the first false sync, so a
        # per-offset Python loop over the 64 KiB window cost ~2.5x on
        # the multimodal feature pass (q28, round-11 bench) — find()
        # visits only the ~len/256 candidate offsets of random bytes.
        i = content.find(0xFF, i, end)
        if i < 0:
            break
        h = parse_header(content, i)
        if h is not None:
            # One valid-looking header false-syncs on random compressed
            # bytes at ~1e-4/offset over a 64 KiB scan (round-10
            # ADVICE): demand a SECOND consecutive valid header with
            # the same layer/sample-rate where the buffer has room for
            # one, so ogg/flac payloads fall through to soundfile
            # instead of decoding as garbage MPEG.
            nxt = i + h["frame_bytes"]
            if nxt + 4 > len(content) or (
                (h2 := parse_header(content, nxt)) is not None
                and h2["layer"] == h["layer"]
                and h2["sample_rate"] == h["sample_rate"]
            ):
                h["first_frame_offset"] = i
                return h
        i += 1
    return None


# ---------------------------------------------------------- filterbank
_SBLIMIT = 32


def _build_prototype() -> list[float]:
    """Derived near-PR pseudo-QMF prototype (see module docstring),
    closed form: the target magnitude is |H(w)| = cos(16w) on the
    transition 0 <= w <= pi/32 and 0 beyond — EXACTLY power
    complementary between adjacent cosine-modulated bands
    (cos^2(16w) + cos^2(pi/2 - 16w) = 1 for every transition
    frequency, so the analysis+synthesis cascade is flat by
    construction, not just at the -3 dB edge point). Its inverse
    transform is analytic:

        h[m] = [ sin(a(m+16))/(m+16) + sin(a(m-16))/(m-16) ] / (2*pi),
        a = pi/32

    truncated to 512 taps centered at n = 256 — INTEGER center, like
    the ISO windows: the modulation phases encode an integer group
    delay, and a half-sample-symmetric prototype (centered 255.5, the
    first draft) adds a half-sample phase error at every band edge
    that dominated the residual (measured 9e-3 noise round-trip RMS
    vs 1.8e-3 with the integer center). No taper: the cos-transition
    impulse decays fast enough that plain truncation beats every
    Kaiser variant tried (a taper bends the transition off the
    complementary curve). Unit-DC normalized. Deterministic, no
    tabulated data."""
    n_taps = 512
    a = math.pi / 32.0
    h = []
    for n in range(n_taps):
        m = n - 256.0
        v = 0.0
        for m0 in (m + 16.0, m - 16.0):
            v += a if abs(m0) < 1e-12 else math.sin(a * m0) / m0
        h.append(v / (2.0 * math.pi))
    g = sum(h)
    return [v / g for v in h]


_PROTO = _build_prototype()
# The ISO C/D tables are NOT the raw prototype: they carry a
# (-1)^(n//64) block-sign pattern that makes the spec's 64-entry
# folding (analysis) and V-FIFO skip-indexing (synthesis) equal a TRUE
# smooth-prototype modulated filterbank — cos((2k+1)(n-16)pi/64) gains
# a (-1)^i factor per 64-block i, and the extended synthesis V has the
# antisymmetry V[i+64] = -V[i]. Without the pattern the cascade is a
# period-64-aliased modulation and adjacent-band alias terms do NOT
# cancel (first draft: 30% multi-tone RMS error; with it: ~1e-3).
_PROTO_SIGNED = [(-1) ** (n // 64) * v for n, v in enumerate(_PROTO)]

# matrixing: N[i][k] = cos((16+i)(2k+1)pi/64), i=0..63, k=0..31 —
# closed form straight from the spec
_NMAT = [
    [math.cos((16 + i) * (2 * k + 1) * math.pi / 64.0) for k in range(32)]
    for i in range(64)
]


class _Synth:
    """Spec-structured polyphase synthesis: 32 subband samples in,
    32 PCM samples out, with the 1024-entry V FIFO and 16-block
    windowed accumulation (window = 32 * prototype, gain-calibrated)."""

    # calibration: set after class definition from a DC round trip
    GAIN = 1.0

    def __init__(self):
        self.v = [0.0] * 1024

    def run(self, s: list[float]) -> list[float]:
        v = self.v
        # shift FIFO by 64
        v[64:] = v[:-64]
        nm = _NMAT
        for i in range(64):
            row = nm[i]
            v[i] = sum(row[k] * s[k] for k in range(32))
        d = _PROTO_SIGNED
        out = []
        gain = 32.0 / _Synth.GAIN
        for j in range(32):
            acc = 0.0
            for b in range(8):
                # U mapping per spec: U[64b+j] = V[128b+j],
                # U[64b+32+j] = V[128b+96+j]; window and accumulate
                acc += d[64 * b + j] * v[128 * b + j]
                acc += d[64 * b + 32 + j] * v[128 * b + 96 + j]
            out.append(acc * gain)
        return out


def _analysis_matrix_row(k: int) -> list[float]:
    # M[k][n] = cos((2k+1)(n-16)pi/64), n = 0..63 (spec analysis phase)
    return [math.cos((2 * k + 1) * (n - 16) * math.pi / 64.0) for n in range(64)]


_MMAT = [_analysis_matrix_row(k) for k in range(32)]


class Analysis:
    """Matched analysis filterbank (the spec's encoder-side structure
    with the same derived prototype): 32 PCM samples in, 32 subband
    samples out. Public because (a) the round-trip tests need it and
    (b) subband-energy analysis is a useful feature extractor in its
    own right."""

    def __init__(self):
        self.x = [0.0] * 512

    def run(self, pcm32: list[float]) -> list[float]:
        x = self.x
        x[32:] = x[:-32]
        x[:32] = pcm32[::-1]
        c = _PROTO_SIGNED
        # no extra scaling: the unit-DC prototype is the same magnitude
        # class as the ISO C window (peak ~0.036), so subband amplitudes
        # land near what a spec encoder produces — which is what keeps
        # REAL-file synthesis gain right after the cascade calibration
        z = [x[i] * c[i] for i in range(512)]
        y = [sum(z[j + 64 * i] for i in range(8)) for j in range(64)]
        return [sum(_MMAT[k][n] * y[n] for n in range(64)) for k in range(32)]


_CALIBRATED = False


def _ensure_calibrated() -> None:
    """Cascade gain calibration, LAZY (first decode, not import — the
    tone round trip costs ~0.1 s of pure Python and most imports of
    this module never decode): run a band-8 center-frequency tone
    through the module's own analysis+synthesis and set the synthesis
    gain so the cascade is exactly unity at the spec's 481-sample
    delay. A band-CENTER tone, not DC: DC sits on the band-0 edge
    where the -3 dB crossover makes the projection degenerate (the
    first draft calibrated there and came out 33x off). The per-band
    probe shows one shared constant across all 32 bands (linear phase,
    integer delay 481 — matching the spec filterbank's delay), so one
    tone pins them all. Deterministic; sign is folded in (our
    modulation phases yield a negative cascade — a waveform inversion,
    irrelevant to energy features and inaudible)."""
    global _CALIBRATED
    if _CALIBRATED:
        return
    a, s = Analysis(), _Synth()
    _Synth.GAIN = 1.0
    w = (2 * 8 + 1) * math.pi / 64.0  # band-8 center, rad/sample
    n = 32 * 70
    x = [0.8 * math.sin(w * i) for i in range(n)]
    y: list[float] = []
    for b in range(n // 32):
        y.extend(s.run(a.run(x[b * 32:(b + 1) * 32])))
    lo, hi = 700, 1500
    num = sum(y[i + 481] * x[i] for i in range(lo, hi))
    den = sum(x[i] * x[i] for i in range(lo, hi))
    _Synth.GAIN = num / den
    _CALIBRATED = True


# ---------------------------------------------------------- layer I/II
def _decode_layer1_frame(bits: _Bits, h: dict) -> list[list[float]]:
    nch = h["channels"]
    bound = (h["mode_ext"] + 1) * 4 if h["mode"] == 1 else _SBLIMIT
    alloc = [[0] * _SBLIMIT for _ in range(nch)]
    for sb in range(_SBLIMIT):
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = bits.read(4)
        else:
            alloc[0][sb] = alloc[1][sb] = bits.read(4)
    scf = [[0] * _SBLIMIT for _ in range(nch)]
    for sb in range(_SBLIMIT):
        for ch in range(nch):
            if alloc[ch][sb]:
                scf[ch][sb] = bits.read(6)
    out = [[0.0] * (12 * _SBLIMIT) for _ in range(nch)]
    for t in range(12):
        for sb in range(_SBLIMIT):
            if sb < bound:
                for ch in range(nch):
                    a = alloc[ch][sb]
                    if a:
                        nb = a + 1
                        code = bits.read(nb)
                        out[ch][t * _SBLIMIT + sb] = (
                            _dequant(code, (1 << nb) - 1)
                            * _SCALEFACTORS[scf[ch][sb]]
                        )
            else:
                a = alloc[0][sb]
                if a:
                    nb = a + 1
                    code = bits.read(nb)
                    frac = _dequant(code, (1 << nb) - 1)
                    for ch in range(nch):
                        out[ch][t * _SBLIMIT + sb] = frac * _SCALEFACTORS[scf[ch][sb]]
    return out


def _decode_layer2_frame(bits: _Bits, h: dict) -> list[list[float]]:
    nch = h["channels"]
    table = _l2_table(h["sample_rate"], h["bitrate_kbps"], nch)
    sblimit = len(table)
    bound = min((h["mode_ext"] + 1) * 4 if h["mode"] == 1 else sblimit, sblimit)
    nbal = [max(1, (len(row) - 1).bit_length()) for row in table]
    alloc = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        if sb < bound:
            for ch in range(nch):
                alloc[ch][sb] = bits.read(nbal[sb])
        else:
            alloc[0][sb] = alloc[1][sb] = bits.read(nbal[sb])
    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = bits.read(2)
    scf = [[[0, 0, 0] for _ in range(sblimit)] for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            if si == 0:
                s0, s1, s2 = bits.read(6), bits.read(6), bits.read(6)
            elif si == 1:
                s0 = s1 = bits.read(6)
                s2 = bits.read(6)
            elif si == 2:
                s0 = s1 = s2 = bits.read(6)
            else:
                s0 = bits.read(6)
                s1 = s2 = bits.read(6)
            scf[ch][sb] = [s0, s1, s2]
    out = [[0.0] * (36 * _SBLIMIT) for _ in range(nch)]
    for gr in range(12):  # 12 granules x 3 samples
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                a = alloc[ch][sb]
                if not a:
                    continue
                levels = table[sb][a]
                cbits, grouped = _L2_CLASS[levels]
                if grouped:
                    c = bits.read(cbits)
                    codes = (c % levels, (c // levels) % levels,
                             c // (levels * levels))
                else:
                    codes = (bits.read(cbits), bits.read(cbits),
                             bits.read(cbits))
                sidx = scf[ch][sb][gr >> 2]
                chans = range(nch) if shared else (ch,)
                for cch in chans:
                    f = _SCALEFACTORS[scf[cch][sb][gr >> 2]] if shared else \
                        _SCALEFACTORS[sidx]
                    for t in range(3):
                        out[cch][(gr * 3 + t) * _SBLIMIT + sb] = (
                            _dequant(codes[t], levels) * f
                        )
    return out


def decode_mpeg1_audio(content: bytes, max_frames: int | None = None):
    """Decode MPEG-1 Layer I/II to PCM → (sample_rate, [ch0, ch1...])
    with samples as floats in ~[-1, 1]. Layer III raises (see module
    docstring). Stops at the first unparseable frame (truncated tail
    tolerance, the dirty-blob convention of decode_image)."""
    _ensure_calibrated()
    meta = mpeg_meta(content)
    if meta is None:
        raise ValueError("no MPEG-1 audio sync found")
    if meta["layer"] == 3:
        # round 11: Layer III decodes in mpeg_layer3.py (full pipeline;
        # huffman-table SUBSET — streams selecting unimplemented tables
        # raise UnsupportedMp3Feature, a ValueError the caller's
        # soundfile gate catches)
        from etl_wrap_spark.operators.mpeg_layer3 import decode_mp3

        return decode_mp3(content, max_frames=max_frames)
    off = meta["first_frame_offset"]
    nch = meta["channels"]
    synth = [_Synth() for _ in range(nch)]
    pcm: list[list[float]] = [[] for _ in range(nch)]
    frames = 0
    while off + 4 <= len(content):
        h = parse_header(content, off)
        if h is None or h["layer"] != meta["layer"] or \
                h["sample_rate"] != meta["sample_rate"]:
            break
        end = off + h["frame_bytes"]
        if end > len(content):
            break
        body = content[off:end]
        bits = _Bits(body, 32 + (16 if h["protection"] else 0))
        try:
            if h["layer"] == 1:
                sub = _decode_layer1_frame(bits, h)
                nblocks = 12
            else:
                sub = _decode_layer2_frame(bits, h)
                nblocks = 36
        except IndexError:  # corrupt frame body
            break
        for ch in range(nch):
            for t in range(nblocks):
                pcm[ch].extend(
                    synth[ch].run(sub[ch][t * _SBLIMIT:(t + 1) * _SBLIMIT])
                )
        off = end
        frames += 1
        if max_frames is not None and frames >= max_frames:
            break
    if not frames:
        raise ValueError("no decodable MPEG frame")
    return meta["sample_rate"], pcm
