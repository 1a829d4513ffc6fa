"""Unit tests for the pure-numpy image decoder (VERDICT r6 item 8).

x_multimodal_decode's DuckDB oracle hash-verifies the PPM path
end-to-end through Spark; these tests cover what the corpus weave
cannot reach — BMP stride padding, bottom-up vs top-down rows, BGR
ordering, header comments, and rejection of compressed formats.
"""

from __future__ import annotations

import numpy as np
import pytest

from hbasemapreduce_spark.operators.llm_multimodal import decode_image, weave_ppm


def _bmp(rgb: np.ndarray, *, top_down: bool = False) -> bytes:
    """Hand-assemble a 24-bit uncompressed BMP (BITMAPINFOHEADER)."""
    h, w, _ = rgb.shape
    stride = ((w * 3 + 3) // 4) * 4
    ys = range(h) if top_down else range(h - 1, -1, -1)
    rows = []
    for y in ys:
        row = rgb[y][:, ::-1].tobytes()  # RGB -> BGR on disk
        rows.append(row + b"\x00" * (stride - len(row)))
    pixdata = b"".join(rows)
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(pixdata)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + ((h if top_down is False else -h)).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + b"\x00" * 20
    )
    assert len(header) == off
    return header + pixdata


def test_ppm_header_with_comment_and_pixel_order():
    img = decode_image(b"P6\n# a comment\n3 2\n255\n" + bytes(range(18)))
    assert (img["format"], img["width"], img["height"]) == ("ppm", 3, 2)
    assert img["pixels"].shape == (2, 3, 3)
    assert img["pixels"][0, 0, 0] == 0
    assert img["pixels"][1, 2, 2] == 17  # row-major top-down RGB


def test_ppm_weave_roundtrip():
    data = b"hello world, this is payload"
    w, h = 5, 4
    d = decode_image(weave_ppm(data, w, h))
    need = w * h * 3
    reps = -(-need // len(data))
    exp = np.frombuffer((data * reps)[:need], dtype=np.uint8).reshape(h, w, 3)
    assert (d["pixels"] == exp).all()


def test_ppm_truncated_rejected():
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n4 4\n255\n" + b"\x01" * 10)


def test_bmp_bottom_up_bgr_and_stride_padding():
    # w=3 -> raw row 9 bytes, stride 12: 3 pad bytes per row exercised
    rgb = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    d = decode_image(_bmp(rgb))
    assert (d["format"], d["width"], d["height"]) == ("bmp", 3, 2)
    assert (d["pixels"] == rgb).all()


def test_bmp_top_down_negative_height():
    rgb = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    d = decode_image(_bmp(rgb, top_down=True))
    assert (d["pixels"] == rgb).all()


def test_compressed_formats_rejected():
    for bad in (b"\x89PNG\r\n\x1a\n....", b"\xff\xd8\xff\xe0JFIF"):
        with pytest.raises(ValueError, match="unsupported image format"):
            decode_image(bad)


def test_bmp_wrong_bpp_rejected():
    rgb = np.zeros((2, 3, 3), dtype=np.uint8)
    raw = bytearray(_bmp(rgb))
    raw[28:30] = (32).to_bytes(2, "little")
    with pytest.raises(ValueError, match="24-bit"):
        decode_image(bytes(raw))


def test_weave_bmp_roundtrip_equals_logical_weave():
    # weave_bmp encodes BGR + bottom-up + stride padding; decoding must
    # recover the LOGICAL cycled-payload array — i.e. exactly what
    # weave_ppm produces for the same payload and dims.
    from hbasemapreduce_spark.operators.llm_multimodal import weave_bmp, weave_ppm

    for payload in (b"hello, weave", b"\x00\xff" * 7, b"x"):
        for w, h in ((3, 2), (4, 4), (5, 7), (14, 6)):  # odd widths pad
            via_bmp = decode_image(weave_bmp(payload, w, h))
            via_ppm = decode_image(weave_ppm(payload, w, h))
            assert via_bmp["format"] == "bmp"
            assert (via_bmp["width"], via_bmp["height"]) == (w, h)
            assert (via_bmp["pixels"] == via_ppm["pixels"]).all()


def test_weave_bmp_empty_payload_is_black():
    from hbasemapreduce_spark.operators.llm_multimodal import weave_bmp

    d = decode_image(weave_bmp(b"", 5, 3))
    assert d["pixels"].sum() == 0 and d["pixels"].shape == (3, 5, 3)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    @given(
        st.binary(min_size=0, max_size=64),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
    )
    @settings(max_examples=60, deadline=None)
    def test_weave_decode_roundtrip_fuzz(payload, w, h):
        # Fuzz the full encode->decode loop for BOTH container formats:
        # decoded pixels must equal the cycled payload (the weave's
        # closed form) for every (payload, w, h) — including the pad-
        # heavy widths (w*3 % 4 != 0) and the empty payload.
        from hbasemapreduce_spark.operators.llm_multimodal import (
            weave_bmp,
            weave_ppm,
        )

        need = w * h * 3
        if payload:
            reps = -(-need // len(payload))
            expect = np.frombuffer(
                (payload * reps)[:need], dtype=np.uint8
            ).reshape(h, w, 3)
        else:
            expect = np.zeros((h, w, 3), dtype=np.uint8)
        for weave, fmt in ((weave_ppm, "ppm"), (weave_bmp, "bmp")):
            d = decode_image(weave(payload, w, h))
            assert d["format"] == fmt
            assert (d["width"], d["height"]) == (w, h)
            assert (d["pixels"] == expect).all(), fmt
