"""Baseline-TIFF conformance. ImageIO decodes TIFF, so like GIF this
format has a third-party oracle in-environment: the JVM decode of our
LZW/PackBits files must match bit-exactly — which independently proves
the TIFF-LZW EARLY-CHANGE width convention is implemented to spec, not
merely self-consistently. Round trips cover both byte orders, striping,
the horizontal-differencing predictor, grayscale, and multi-page chains.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.multimodal import decode_image, md5_pixels
from youbike_etl_pipeline_spark.operators.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    decode_tiff,
    encode_tiff,
)


@pytest.mark.parametrize("compression", [1, 5, 32773], ids=["none", "lzw", "packbits"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("big_endian", [False, True], ids=["II", "MM"])
def test_roundtrip_matrix(compression, predictor, big_endian):
    for img, rps in ((md5_pixels(1, 16, 12), None), (md5_pixels(2, 19, 13), 4)):
        payload = encode_tiff(
            img,
            compression=compression,
            predictor=predictor,
            big_endian=big_endian,
            rows_per_strip=rps,
        )
        out = decode_tiff(payload)
        assert len(out) == 1 and np.array_equal(out[0], img)


def test_grayscale_and_multipage():
    g = md5_pixels(3, 10, 7)[:, :, 0]
    out = decode_tiff(encode_tiff(g, compression=5))
    assert np.array_equal(out[0], np.repeat(g[:, :, None], 3, axis=2))
    pages = [md5_pixels(4, 8, 6), md5_pixels(5, 8, 6), md5_pixels(6, 8, 6)]
    out = decode_tiff(encode_tiff(pages, compression=32773))
    assert len(out) == 3
    for a, b in zip(out, pages):
        assert np.array_equal(a, b)


def test_lzw_early_change_and_clear():
    """Sizes straddling every width bump (the 255-byte boundary found the
    original off-by-one) and a 60k stream forcing the 4094-entry clear."""
    rng = np.random.default_rng(0)
    for n in (1, 254, 255, 256, 510, 511, 512, 1021, 1022, 4000, 60000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), n) == data, n


def test_dispatch_and_error_paths():
    img = md5_pixels(7, 16, 12)
    payload = encode_tiff(img)
    assert np.array_equal(decode_image(payload), img)
    assert np.array_equal(decode_image(payload, fmt="tiff"), img)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"IX*\x00" + payload[4:])
    for cut in range(4, len(payload) - 1, 17):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_tiff(payload[:cut])


def test_jvm_imageio_conformance(spark, tmpdir):
    """The JVM must read our LZW and PackBits files and agree bit-exactly
    — external proof of the early-change convention and strip layout."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(8, 16, 12)
    big = md5_pixels(9, 40, 30)  # 3600-byte strips cross TWO width bumps —
    # the regression that calibrated the early-change off-by-one
    for tag, payload in (
        ("lzw", encode_tiff(img, compression=5, rows_per_strip=5)),
        ("lzw_pred", encode_tiff(img, compression=5, predictor=2)),
        ("packbits", encode_tiff(img, compression=32773)),
        ("mm_none", encode_tiff(img, compression=1, big_endian=True)),
        ("lzw_bumps", encode_tiff(big, compression=5)),
        ("lzw_bumps_pred", encode_tiff(big, compression=5, predictor=2)),
    ):
        d = tmpdir.mkdir(f"jvmtiff_{tag}")
        with open(os.path.join(str(d), "img.tiff"), "wb") as fh:
            fh.write(payload)
        rows = read_images(spark, str(d)).select("image.*").collect()
        if not rows or rows[0]["mode"] == -1 or rows[0]["height"] <= 0:
            pytest.skip(f"ImageIO rejected the {tag} TIFF in this JVM")
        nc = rows[0]["nChannels"]
        ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
            rows[0]["height"], rows[0]["width"], nc
        )
        ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
        assert np.array_equal(ref, big if tag.startswith("lzw_bumps") else img), tag


# ----------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _tiff_images(draw):
    w = draw(st.integers(1, 23))
    h = draw(st.integers(1, 19))
    kind = draw(st.sampled_from(["noise", "flat", "stripes"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    return (
        (np.arange(w)[None, :, None] % 2 * 255).astype(np.uint8).repeat(h, 0).repeat(3, 2)
    )


@given(
    img=_tiff_images(),
    compression=st.sampled_from([1, 5, 32773]),
    predictor=st.sampled_from([1, 2]),
    big_endian=st.booleans(),
    rps=st.sampled_from([None, 3]),
)
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_tiff(img, compression, predictor, big_endian, rps):
    out = decode_tiff(
        encode_tiff(
            img,
            compression=compression,
            predictor=predictor,
            big_endian=big_endian,
            rows_per_strip=rps,
        )
    )
    assert len(out) == 1 and np.array_equal(out[0], img)


def test_single_byte_corruption_fuzz():
    """Round-8 hardening (the JPEG family's corruption discipline applied
    to TIFF): flipping any single bit must either raise the documented
    types or decode to SOMETHING — TIFF has no CRC, so silent wrong
    pixels are acceptable, but IndexError/struct.error/KeyError leaks and
    hangs are not. Caught a real hole: a zero-count IFD entry stored an
    empty tag list and IndexError'd the [0] lookups."""
    img = md5_pixels(21, 16, 12)
    for payload in (
        encode_tiff(img, compression=5, predictor=2),
        encode_tiff(img, compression=32773, big_endian=True),
    ):
        for i in range(len(payload)):
            for bit in (0x01, 0x80):
                corrupted = bytearray(payload)
                corrupted[i] ^= bit
                try:
                    decode_tiff(bytes(corrupted))
                except (ValueError, NotImplementedError):
                    pass
