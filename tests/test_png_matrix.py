"""PNG spec-matrix conformance (round 8): the decoder covers the full
legal (color type × bit depth) grid of PNG §11.2.2 plus Adam7, and —
because ImageIO decodes every PNG variant — each one gets bit-exact
third-party conformance against Spark's JVM ``format("image")`` source,
the same external-oracle discipline as GIF/TIFF/JPEG. The default
encoder output is hash-pinned: mm10's fixture bytes must never drift."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.multimodal import (
    decode_png,
    encode_png,
    md5_pixels,
)


def _gray(seed: int, w: int = 16, h: int = 12, depth: int = 8) -> "np.ndarray":
    levels = (1 << min(depth, 8)) - 1
    g = (md5_pixels(seed, w, h)[:, :, 0].astype(np.int64) % (levels + 1)) * 255 // levels
    return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)


def _paletted(seed: int, ncolors: int, w: int = 16, h: int = 12) -> "np.ndarray":
    pal = md5_pixels(seed, ncolors, 1)[0]
    return pal[md5_pixels(seed + 1, w, h).astype(np.int64).sum(axis=2) % ncolors]


def test_default_encoder_bytes_pinned():
    """encode_png defaults MUST stay byte-identical across refactors —
    the mm10 oracle re-derives pixels from the md5 stream, so a silent
    fixture change would shift the graded corpus."""
    assert (
        hashlib.md5(encode_png(md5_pixels(7, 16, 12))).hexdigest()
        == "2a73521325042d744b56c53a7ee70b9c"
    )
    assert (
        hashlib.md5(encode_png(md5_pixels(9, 19, 13))).hexdigest()
        == "d918bf59fc422cedf660d93479dd668b"
    )


@pytest.mark.parametrize("ctype", [2, 6])
@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_truecolor(ctype, depth, interlace):
    for img in (md5_pixels(41, 16, 12), md5_pixels(47, 19, 13)):
        out = decode_png(encode_png(img, depth=depth, ctype=ctype, interlace=interlace))
        assert np.array_equal(out, img), (ctype, depth, interlace)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette(depth, interlace):
    img = _paletted(50 + depth, 1 << depth)
    out = decode_png(encode_png(img, depth=depth, ctype=3, interlace=interlace))
    assert np.array_equal(out, img), (depth, interlace)


@pytest.mark.parametrize("depth,ctype", [(1, 0), (2, 0), (4, 0), (8, 0), (16, 0), (8, 4), (16, 4)])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_grayscale(depth, ctype, interlace):
    img = _gray(60, depth=depth)
    out = decode_png(encode_png(img, depth=depth, ctype=ctype, interlace=interlace))
    assert np.array_equal(out, img), (depth, ctype, interlace)


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (7, 5), (5, 7), (8, 8), (9, 9)])
def test_interlace_odd_shapes(shape):
    """Adam7 passes go empty/ragged at small dims — every shape class
    must reassemble exactly (pass 1 alone for 1x1; missing columns for
    w<5; etc.)."""
    h, w = shape
    img = md5_pixels(70 + h * 16 + w, w, h)
    out = decode_png(encode_png(img, interlace=True))
    assert np.array_equal(out, img), shape
    img2 = _paletted(90 + h * 16 + w, 16, w=w, h=h)
    out2 = decode_png(encode_png(img2, depth=4, ctype=3, interlace=True))
    assert np.array_equal(out2, img2), shape


def test_encoder_validation():
    img = md5_pixels(41, 16, 12)
    with pytest.raises(ValueError, match="does not allow depth"):
        encode_png(img, depth=16, ctype=3)
    with pytest.raises(ValueError, match="palette PNG at depth"):
        encode_png(img, depth=2, ctype=3)  # 192 colors >> 4
    with pytest.raises(ValueError, match="R==G==B"):
        encode_png(img, ctype=0)
    with pytest.raises(ValueError, match="level values"):
        encode_png(np.full((4, 4, 3), 7, np.uint8), depth=1, ctype=0)


def test_decoder_error_paths():
    img = _paletted(100, 16)
    payload = bytearray(encode_png(img, depth=4, ctype=3))
    # strip PLTE: palette image without a palette is malformed
    i = payload.index(b"PLTE") - 4
    ln = int.from_bytes(payload[i : i + 4], "big")
    del payload[i : i + 12 + ln]
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(bytes(payload))


def test_single_byte_corruption_fuzz():
    """Any single-bit flip must raise ValueError or decode (PNG's zlib
    stream makes most flips loud; the remainder surface as size/filter/
    palette-range errors, all typed)."""
    img = md5_pixels(41, 16, 12)
    pimg = _paletted(100, 16)
    for payload in (
        encode_png(img),
        encode_png(img, depth=16, interlace=True),
        encode_png(pimg, depth=4, ctype=3, interlace=True),
    ):
        for i in range(len(payload)):
            for bit in (0x01, 0x80):
                corrupted = bytearray(payload)
                corrupted[i] ^= bit
                try:
                    decode_png(bytes(corrupted))
                except (ValueError, NotImplementedError):
                    pass


def test_jvm_imageio_conformance(spark, tmpdir):
    """ImageIO decodes every PNG variant — bit-exact agreement required
    (palette/gray expansion and the 16→8 high-byte convention included;
    the 16-bit fixture writes v·257 samples, on which every reasonable
    16→8 convention returns v, so the comparison is convention-free)."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(41, 16, 12)
    cases = [
        ("rgb16", encode_png(img, depth=16), img),
        ("rgb8_il", encode_png(img, interlace=True), img),
        ("pal8", encode_png(_paletted(110, 192), depth=8, ctype=3), _paletted(110, 192)),
        ("pal4_il", encode_png(_paletted(112, 16), depth=4, ctype=3, interlace=True), _paletted(112, 16)),
        ("gray4", encode_png(_gray(61, depth=4), depth=4, ctype=0), _gray(61, depth=4)),
        ("gray16", encode_png(_gray(62), depth=16, ctype=0), _gray(62)),
    ]
    for tag, payload, want in cases:
        d = tmpdir.mkdir(f"jvmpng_{tag}")
        with open(os.path.join(str(d), "img.png"), "wb") as fh:
            fh.write(payload)
        rows = read_images(spark, str(d)).select("image.*").collect()
        assert rows and rows[0]["mode"] != -1, f"ImageIO rejected {tag} PNG"
        nc = rows[0]["nChannels"]
        ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
            rows[0]["height"], rows[0]["width"], nc
        )
        ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
        mine = decode_png(payload)
        assert np.array_equal(mine, ref), tag
        assert np.array_equal(mine, want), tag


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _png_images(draw):
    w = draw(st.integers(1, 21))
    h = draw(st.integers(1, 17))
    kind = draw(st.sampled_from(["noise", "flat", "stripes", "gray"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    if kind == "gray":
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return (
        (np.arange(w)[None, :, None] % 2 * 255).astype(np.uint8).repeat(h, 0).repeat(3, 2)
    )


@given(
    img=_png_images(),
    depth=st.sampled_from([8, 16]),
    ctype=st.sampled_from([2, 3, 6]),
    interlace=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_png(img, depth, ctype, interlace):
    """Hypothesis over adversarial shapes (flat / 1-wide / stripes /
    gray) across the truecolor+palette grid — the lesson that found
    VP8L's 2-symbol-prefix overflow applies to every codec."""
    if ctype == 3:
        depth = 8  # palette caps at 8; distinct colors bound by 21*17 < 256
        if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
            ctype = 2
    out = decode_png(encode_png(img, depth=depth, ctype=ctype, interlace=interlace))
    assert np.array_equal(out, img)
