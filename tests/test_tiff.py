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


# ------------------------------------------------ round-8 extensions


@pytest.mark.parametrize(
    "kw",
    [
        dict(bits=16),
        dict(bits=16, predictor=2),
        dict(bits=16, big_endian=True, predictor=2),
        dict(planar=2),
        dict(planar=2, compression=32773),
        dict(planar=2, predictor=2, big_endian=True, rows_per_strip=5),
        dict(tile=(8, 8)),
        dict(tile=(5, 7), compression=32773),
        dict(tile=(8, 8), predictor=2),
        dict(tile=(32, 32)),
        dict(tile=(8, 8), planar=2, compression=1),
        dict(bits=16, tile=(8, 8)),
        dict(bits=16, planar=2, tile=(5, 5)),
    ],
    ids=lambda kw: "+".join(f"{k}={v}" for k, v in kw.items()),
)
def test_roundtrip_extended_matrix(kw):
    """Round-8 features: 16-bit samples (x257 scale -> high-byte
    inverse), planar configuration 2, and tiled layouts, crossed with
    compressions/predictor/endian."""
    for img in (md5_pixels(81, 16, 12), md5_pixels(83, 19, 13)):
        out = decode_tiff(encode_tiff(img, **kw))
        assert len(out) == 1 and np.array_equal(out[0], img), kw


def test_extended_default_bytes_identical():
    """The baseline writer path must not drift: extended kwargs at their
    defaults route through the ORIGINAL code, byte-for-byte (mm18's
    fixture stability)."""
    import hashlib

    img = md5_pixels(81, 16, 12)
    assert (
        hashlib.md5(encode_tiff(img, compression=5, predictor=2)).hexdigest()
        == hashlib.md5(
            encode_tiff(img, compression=5, predictor=2, bits=8, planar=1, tile=None)
        ).hexdigest()
    )


def test_jvm_imageio_conformance_extended(spark, tmpdir):
    """Tiled / planar-2 / 16-bit streams must match the JVM ImageIO
    decode bit-exactly. ImageIO REJECTS predictor 2 at 16 bits (spec-legal,
    common reader gap) — the recorded rejection is the evidence that the
    numpy decoder is the only in-env route for those streams."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(81, 16, 12)
    for tag, kw in {
        "tiled": dict(tile=(8, 8)),
        "tiled_odd": dict(tile=(5, 7), compression=32773),
        "planar2": dict(planar=2),
        "bits16": dict(bits=16),
        "bits16_be": dict(bits=16, big_endian=True),
        "tiled_planar": dict(tile=(8, 8), planar=2, compression=1),
    }.items():
        d = tmpdir.mkdir(f"jvmtiffx_{tag}")
        payload = encode_tiff(img, **kw)
        with open(os.path.join(str(d), "img.tiff"), "wb") as fh:
            fh.write(payload)
        rows = read_images(spark, str(d)).select("image.*").collect()
        assert rows and rows[0]["mode"] != -1, f"ImageIO rejected {tag}"
        nc = rows[0]["nChannels"]
        ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
            rows[0]["height"], rows[0]["width"], nc
        )
        ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
        mine = decode_tiff(payload)[0]
        assert np.array_equal(mine, ref), tag
        assert np.array_equal(mine, img), tag
    # the documented ImageIO gap: predictor 2 at 16 bits
    d = tmpdir.mkdir("jvmtiffx_pred16")
    payload = encode_tiff(img, bits=16, predictor=2)
    with open(os.path.join(str(d), "img.tiff"), "wb") as fh:
        fh.write(payload)
    rows = read_images(spark, str(d)).select("image.*").collect()
    # rejection surfaces as either a dropped row or an invalid-mode row
    assert not rows or rows[0]["mode"] == -1, "ImageIO unexpectedly accepts pred2@16"
    assert np.array_equal(decode_tiff(payload)[0], img)


def test_extended_corruption_fuzz():
    """The tiled/16-bit/planar paths inherit the corruption contract."""
    img = md5_pixels(84, 16, 12)
    for payload in (
        encode_tiff(img, tile=(8, 8), compression=5),
        encode_tiff(img, bits=16, planar=2, compression=32773),
    ):
        for i in range(len(payload)):
            corrupted = bytearray(payload)
            corrupted[i] ^= 0x01
            try:
                decode_tiff(bytes(corrupted))
            except (ValueError, NotImplementedError):
                pass


def test_palette_tiff_roundtrip_and_jvm(spark, tmpdir):
    """Photometric-3 palette TIFF (8-bit indices, 16-bit ColorMap):
    round trips across compressions/tiles/endian and agrees bit-exactly
    with the JVM ImageIO decode."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(85, 16, 12)
    for kw in (
        dict(palette=True),
        dict(palette=True, compression=32773),
        dict(palette=True, tile=(8, 8)),
        dict(palette=True, big_endian=True, predictor=2),
    ):
        out = decode_tiff(encode_tiff(img, **kw))
        assert np.array_equal(out[0], img), kw
    payload = encode_tiff(img, palette=True)
    d = tmpdir.mkdir("jvmtiff_pal")
    with open(os.path.join(str(d), "img.tiff"), "wb") as fh:
        fh.write(payload)
    rows = read_images(spark, str(d)).select("image.*").collect()
    assert rows and rows[0]["mode"] != -1
    nc = rows[0]["nChannels"]
    ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
        rows[0]["height"], rows[0]["width"], nc
    )
    ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
    assert np.array_equal(decode_tiff(payload)[0], ref)
    # validation: too many colors / wrong parameter combos
    noisy = np.arange(18 * 16 * 3, dtype=np.int64) % 251
    noisy = (noisy.reshape(18, 16, 3) + np.arange(3)).astype(np.uint8)
    if len(np.unique(noisy.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256 colors"):
            encode_tiff(noisy, palette=True)
    with pytest.raises(ValueError, match="palette TIFF needs"):
        encode_tiff(img, palette=True, bits=16)
    # decoder gate: missing ColorMap
    bad = bytearray(encode_tiff(img, palette=True))
    i = bad.find((320).to_bytes(2, "little"))
    # flip the ColorMap tag id to an ignored value -> ValueError
    bad[i : i + 2] = (32000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(bytes(bad))


def test_round8_review_allocation_bomb_guard():
    """Giant u32 ImageWidth/Length in a tiny file must be refused before
    the page array allocates."""
    import struct

    payload = bytearray(encode_tiff(md5_pixels(36, 8, 6)))
    ifd = struct.unpack_from("<I", payload, 4)[0]
    n = struct.unpack_from("<H", payload, ifd)[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack_from("<H", payload, e)[0] in (256, 257):
            struct.pack_into("<H", payload, e + 8, 65535)
    with pytest.raises(ValueError, match="exceed the decoder bound"):
        decode_tiff(bytes(payload))


def test_round9_advisor_tile_allocation_bomb_guard():
    """The inflate target is sized from TILE dims (tags 322/323), which
    the image-dim guard never sees. Round-10 advisor rescope: TIFF 6.0
    §15 explicitly allows tiles LARGER than the image (real writers use
    fixed 1024x1024 tiles on small images), so the guard is an absolute
    allocation cap — a u32-max tile claim is refused, while a merely
    tile-larger-than-image claim whose DATA is short fails as the
    truncation it is, not as a layout error."""
    import struct

    def retag(payload: bytearray, value: int) -> bytes:
        ifd = struct.unpack_from("<I", payload, 4)[0]
        n = struct.unpack_from("<H", payload, ifd)[0]
        for i in range(n):
            e = ifd + 2 + 12 * i
            if struct.unpack_from("<H", payload, e)[0] in (322, 323):
                struct.pack_into("<H", payload, e + 8, value)
        return bytes(payload)

    base = md5_pixels(91, 16, 16)
    # 32768x32768 claimed tiles → 1 GiB buffer → allocation cap
    bomb = retag(bytearray(encode_tiff(base, tile=(16, 16))), 32768)
    with pytest.raises(ValueError, match="exceeds the decoder bound"):
        decode_tiff(bomb)
    # 1024x1024 claimed tiles over 16x16 of data: spec-legal layout,
    # truncated payload — typed truncation error, not a layout error
    short = retag(bytearray(encode_tiff(base, tile=(16, 16))), 1024)
    with pytest.raises(ValueError, match="ended early|truncated"):
        decode_tiff(short)
    # a REAL writer's oversized-tile file (full tile data, padded) must
    # decode — this is the spec-legal shape the round-9 guard rejected
    rt = decode_tiff(encode_tiff(md5_pixels(93, 16, 16), tile=(1024, 1024)))
    assert np.array_equal(rt[0], md5_pixels(93, 16, 16))
    # the floor: fixed 256x256 tiles on a small image are a real-writer
    # convention, not corruption — still decodable end-to-end
    rt = decode_tiff(encode_tiff(md5_pixels(92, 16, 16), tile=(16, 16)))
    assert np.array_equal(rt[0], md5_pixels(92, 16, 16))
