"""Stdlib-vs-Pillow decode parity + the ETL_WRAP_IMAGE_DECODER route knob.

Round-7 ADVICE: the in-source comment claimed both decode paths were
bit-identical and pytest-asserted, but no test ran BOTH paths on the
same blob, and baseline JPEG genuinely differs from libjpeg's
fixed-point IDCT by up to ±1 sample level. This file is that test:

- PNG: stdlib route must equal the Pillow route EXACTLY (same integer
  Rec.601 luma + same nearest-neighbor cell selection).
- baseline JPEG: routes must agree within 1/255 per feature (the
  documented ±1-sample envelope).
- the env knob must force one route cluster-wide (and raise loudly when
  it names an unavailable one) so heterogeneous Pillow installs cannot
  silently mix decoders.

Both parity tests skip when Pillow is absent (this container); the knob
tests run everywhere.
"""

from __future__ import annotations

import pytest

from etl_wrap_spark.operators import multimodal

from tests.test_jpeg_stdlib import enc_gray
from tests.test_llm_operators import _encode_png

_HAS_PIL = multimodal._pil() is not None


def _routes(monkeypatch, blob):
    monkeypatch.setenv("ETL_WRAP_IMAGE_DECODER", "stdlib")
    stdlib = multimodal.decode_image(blob)
    monkeypatch.setenv("ETL_WRAP_IMAGE_DECODER", "pillow")
    pillow = multimodal.decode_image(blob)
    return stdlib, pillow


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not importable")
def test_png_route_parity_bit_identical(monkeypatch):
    px = [((x * 37 + y * 101 + 13) % 256) for y in range(8) for x in range(8)]
    blob = _encode_png(8, 8, 0, px, filters=[0, 1, 2, 3, 4, 4, 2, 1])
    stdlib, pillow = _routes(monkeypatch, blob)
    assert stdlib == pillow


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not importable")
def test_jpeg_route_parity_within_one_sample(monkeypatch):
    blob = enc_gray(16, 8, [{0: 16, 1: 5, 8: -3}, {0: -32, 2: 7}])
    stdlib, pillow = _routes(monkeypatch, blob)
    assert len(stdlib) == len(pillow) == multimodal.FEATURE_DIM
    assert max(abs(a - b) for a, b in zip(stdlib, pillow)) <= 1.0 / 255.0 + 1e-9


def test_knob_stdlib_forces_pure_python_route(monkeypatch):
    # force stdlib; even with Pillow importable the stdlib decoder must
    # produce the answer (identical call with and without the knob when
    # Pillow is absent).
    blob = enc_gray(16, 8, [{0: 16}, {0: -32}])
    monkeypatch.setenv("ETL_WRAP_IMAGE_DECODER", "stdlib")
    forced = multimodal.decode_image(blob)
    expect = []
    for _y in range(4):
        for x in range(4):
            expect.append(round((136 if (2 * x + 1) * 16 // 8 < 8 else 112) / 255.0, 6))
    assert forced == expect


def test_knob_pillow_without_pillow_raises(monkeypatch):
    if _HAS_PIL:
        pytest.skip("Pillow importable: the forced route works by definition")
    monkeypatch.setenv("ETL_WRAP_IMAGE_DECODER", "pillow")
    blob = enc_gray(8, 8, [{0: 0}])
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(blob)


def test_knob_stdlib_raises_loudly_on_out_of_scope_blob(monkeypatch):
    # under a forced stdlib route, an out-of-scope blob (progressive
    # JPEG marker) must raise — never a silent Pillow fallback.
    monkeypatch.setenv("ETL_WRAP_IMAGE_DECODER", "stdlib")
    blob = enc_gray(8, 8, [{0: 0}]).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(blob)
