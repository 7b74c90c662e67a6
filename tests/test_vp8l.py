"""WebP-lossless (VP8L) conformance: round trips are BIT-EXACT (the format
is lossless, so there is zero rounding latitude), across every decoder
feature the spec-subset encoder can exercise — prefix-code forms, LZ77
runs, color cache, meta groups, and all four transforms in combination.
ImageIO has no WebP plugin in this environment, so (as with lossless JPEG)
the numpy decoder is the only decode route; the JVM cross-check skips
after confirming the rejection rather than silently passing.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.multimodal import decode_image, md5_pixels
from youbike_etl_pipeline_spark.operators.vp8l import (
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)

RGB_COMBOS = [
    dict(use_lz77=False),
    dict(),
    dict(use_subtract_green=True),
    dict(cache_bits=1),
    dict(cache_bits=6),
    dict(cache_bits=11),
    dict(predictor_bits=2),
    dict(predictor_bits=5),
    dict(color_bits=2),
    dict(color_bits=4),
    dict(meta_bits=2),
    dict(use_subtract_green=True, predictor_bits=3, cache_bits=4, meta_bits=3),
    dict(color_bits=3, predictor_bits=2, use_subtract_green=True),
    dict(color_bits=2, predictor_bits=2, use_subtract_green=True, cache_bits=5,
         meta_bits=2),
]


@pytest.mark.parametrize("kw", RGB_COMBOS, ids=lambda kw: "+".join(kw) or "plain")
def test_roundtrip_feature_matrix(kw):
    """37x29 (odd dims: partial tiles in every transform sub-image) and
    16x12 md5 images through every feature combination."""
    for img in (md5_pixels(1, 16, 12), md5_pixels(2, 37, 29)):
        out = decode_webp(encode_webp_lossless(img, **kw))
        assert np.array_equal(out, img), kw


def test_roundtrip_degenerate_shapes():
    for img in (md5_pixels(3, 1, 1), md5_pixels(4, 1, 9), md5_pixels(5, 9, 1)):
        for kw in (dict(), dict(predictor_bits=2), dict(use_subtract_green=True)):
            out = decode_webp(encode_webp_lossless(img, **kw))
            assert np.array_equal(out, img), (img.shape, kw)


@pytest.mark.parametrize("n_colors", [2, 3, 4, 5, 16, 17, 200])
def test_palette_bundling_matrix(n_colors):
    """COLOR_INDEXING across every bundling regime: ≤2 (8 px/byte), ≤4,
    ≤16 (sub-byte bundling with a ragged last byte — width 13 is not a
    multiple of any bundle), and >16 (no bundling). The palette is
    delta-coded, so non-monotonic color values stress the cumulative sum."""
    rng_vals = (md5_pixels(10 + n_colors, 13, 9).astype(np.int64).sum(axis=2))
    idx = (rng_vals % n_colors).astype(np.uint8)
    colors = md5_pixels(99, n_colors, 1)[0]  # (n_colors, 3) distinct-ish rows
    img = colors[idx]
    for kw in (dict(), dict(cache_bits=3), dict(predictor_bits=2)):
        out = decode_webp(encode_webp_lossless(img, use_palette=True, **kw))
        assert np.array_equal(out, img), (n_colors, kw)


def test_lz77_runs_cross_rows_and_borrow_distance_map():
    """A flat image becomes one long distance-1 run crossing every row
    boundary; the decoder's overlapping-copy loop must reproduce it."""
    img = np.full((24, 31, 3), 200, np.uint8)
    img[0, 0] = (1, 2, 3)  # one literal, then a ~740-pixel run
    out = decode_webp(encode_webp_lossless(img))
    assert np.array_equal(out, img)


def test_alpha_channel_roundtrip():
    rgba = np.dstack([md5_pixels(7, 16, 12), (md5_pixels(8, 16, 12)[:, :, 0])])
    payload = encode_webp_lossless(rgba, use_subtract_green=True)
    # VP8L chunk payload starts after RIFF(4)+size(4)+WEBP(4)+VP8L(4)+size(4)
    out_rgba = decode_vp8l(payload[20:])
    assert out_rgba.shape == (12, 16, 4)
    assert np.array_equal(out_rgba, rgba)


def test_decode_image_dispatch_and_lossy_gate():
    img = md5_pixels(9, 16, 12)
    payload = encode_webp_lossless(img, cache_bits=4)
    assert np.array_equal(decode_image(payload), img)
    assert np.array_equal(decode_image(payload, fmt="webp"), img)
    # lossy VP8 chunk: honest gate
    lossy = payload[:12] + b"VP8 " + payload[16:]
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_image(lossy)


def test_error_paths():
    img = md5_pixels(11, 8, 6)
    payload = encode_webp_lossless(img)
    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp(b"JUNK" + payload[4:])
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00" + payload[21:])
    # truncation fuzz: every cut raises ValueError (truncated bitstream /
    # bad prefix code), never IndexError
    for cut in range(21, len(payload) - 1, 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_webp(payload[:cut])


def test_jvm_or_gate(spark, tmpdir):
    """ImageIO has no WebP plugin: if the JVM declines, that CONFIRMS the
    numpy path serves a format the JVM route can't; if a plugin exists,
    pixels must agree bit-exactly."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(12, 16, 12)
    d = tmpdir.mkdir("jvmwebp")
    with open(os.path.join(str(d), "img.webp"), "wb") as fh:
        fh.write(encode_webp_lossless(img))
    rows = read_images(spark, str(d)).select("image.*").collect()
    if not rows or rows[0]["mode"] == -1 or rows[0]["height"] <= 0:
        pytest.skip("ImageIO rejects WebP (expected) — numpy path is the only route")
    nc = rows[0]["nChannels"]
    ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
        rows[0]["height"], rows[0]["width"], nc
    )[:, :, ::-1]
    assert np.array_equal(ref[:, :, :3], img)


# ----------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _images(draw):
    """Adversarial image shapes the md5 fixtures never produce: flat
    fields (maximal LZ77 runs), saturated channels (clamp boundaries in
    predictors 12/13), tiny dims, and plain noise."""
    w = draw(st.integers(1, 21))
    h = draw(st.integers(1, 17))
    kind = draw(st.sampled_from(["noise", "flat", "saturated", "gradient"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "noise":
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == "flat":
        img = np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    elif kind == "saturated":
        img = rng.choice(np.array([0, 255], np.uint8), (h, w, 3))
    else:
        img = (
            (np.arange(h)[:, None, None] * 7 + np.arange(w)[None, :, None] * 13)
            % 256
        ).astype(np.uint8).repeat(3, axis=2)
    return img


@given(
    img=_images(),
    kw=st.sampled_from(
        [
            dict(),
            dict(use_subtract_green=True),
            dict(predictor_bits=2),
            dict(color_bits=2),
            dict(cache_bits=5),
            dict(use_subtract_green=True, predictor_bits=2, cache_bits=3),
        ]
    ),
)
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_vp8l(img, kw):
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)), img)


@given(img=_images(), predictor=st.integers(1, 7), ri=st.sampled_from([0, 1, 7]))
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_jpeg_lossless(img, predictor, ri):
    from youbike_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    out = decode_jpeg(
        encode_jpeg_lossless(img, predictor=predictor, restart_interval=ri)
    )
    assert np.array_equal(out, img)


def test_round7_review_regressions():
    """Review findings pinned: (a) single-tile meta grids declare ONE
    group — the decoder counts groups from the meta image's max index;
    (b) dims beyond the 14-bit header fields raise instead of silently
    truncating; (c) the bit reader serves the 17/18-bit extra fields of
    distance prefix codes 36-39 (real large-image VP8L uses them even
    though the subset encoder never does)."""
    from youbike_etl_pipeline_spark.operators.vp8l import _LsbReader, _prefix_value

    img = md5_pixels(20, 3, 3)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, meta_bits=3)), img)
    with pytest.raises(ValueError, match="16384"):
        encode_webp_lossless(np.zeros((1, 16385, 3), np.uint8))
    # dist code 39: extra = 18 bits, offset = 3 << 18; all-ones extra
    br = _LsbReader(bytes([0xFF] * 4))
    assert _prefix_value(br, 39) == (3 << 18) + ((1 << 18) - 1) + 1


def test_simple_code_cannot_carry_wide_symbols():
    """A flat 1-wide image forces a 2-symbol green code containing an
    LZW length symbol >= 256 — it must take the full form (the simple
    form's 8-bit field would truncate it; hypothesis found the corrupt
    first pixel this produced)."""
    img = np.full((9, 1, 3), 217, np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_single_byte_corruption_fuzz():
    """Round-8 hardening: any single-bit flip must either raise the
    documented types or decode — never structural exceptions or hangs
    (VP8L's prefix-code reader is bounds-checked throughout)."""
    from youbike_etl_pipeline_spark.operators.multimodal import md5_pixels

    img = md5_pixels(23, 16, 12)
    for payload in (
        encode_webp_lossless(img, cache_bits=4),
        encode_webp_lossless(img, use_palette=True),
    ):
        for i in range(len(payload)):
            for bit in (0x01, 0x80):
                corrupted = bytearray(payload)
                corrupted[i] ^= bit
                try:
                    decode_webp(bytes(corrupted))
                except (ValueError, NotImplementedError):
                    pass
