"""BMP variant conformance (round 8): decode_bmp grew from 24-bit-only
to the common BITMAPINFOHEADER matrix — 32-bit BGRA, 1/4/8-bit palette,
Microsoft RLE8, both row orders — each bit-exact against the JVM ImageIO
decode (the GIF/TIFF/PNG external-oracle discipline), with a real
RLE8-writing conformance encoder."""

from __future__ import annotations

import os

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    md5_pixels,
)


def _two_tone(h: int = 12, w: int = 16) -> "np.ndarray":
    return np.repeat(
        np.where((np.arange(h * w).reshape(h, w, 1) % 2) == 0, 10, 240).astype(
            np.uint8
        ),
        3,
        axis=2,
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(top_down=True),
        dict(bpp=32),
        dict(bpp=32, top_down=True),
        dict(bpp=8),
        dict(bpp=8, top_down=True),
        dict(bpp=8, rle=True),
    ],
    ids=lambda kw: "+".join(f"{k}={v}" for k, v in kw.items()) or "b24",
)
def test_roundtrip_matrix(kw):
    for img in (md5_pixels(95, 16, 12), md5_pixels(98, 19, 13)):
        assert np.array_equal(decode_bmp(encode_bmp(img, **kw)), img), kw


def test_subbyte_palettes_and_rle_runs():
    two = _two_tone()
    for bpp in (1, 4):
        for td in (False, True):
            out = decode_bmp(encode_bmp(two, bpp=bpp, top_down=td))
            assert np.array_equal(out, two), (bpp, td)
    # odd widths stress the MSB-first bit packing + row padding
    odd = np.ascontiguousarray(_two_tone(7, 9)[:, :7])
    assert np.array_equal(decode_bmp(encode_bmp(odd, bpp=1)), odd)
    # RLE8 on a flat image compresses to long runs; on noise, to literal
    # pairs — both shapes must round-trip
    flat = np.full((7, 9, 3), 200, np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(flat, bpp=8, rle=True)), flat)


def test_validation_and_gates():
    img = md5_pixels(95, 16, 12)  # ~192 distinct colors
    with pytest.raises(ValueError, match="colors"):
        encode_bmp(img, bpp=4)
    with pytest.raises(ValueError, match="8-bit only"):
        encode_bmp(img, bpp=24, rle=True)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(60))
    # 16-bit and BITFIELDS stay honestly gated
    payload = bytearray(encode_bmp(img))
    payload[28:30] = (16).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="unsupported BMP"):
        decode_bmp(bytes(payload))
    payload = bytearray(encode_bmp(img, bpp=32))
    payload[30:34] = (3).to_bytes(4, "little")  # BI_BITFIELDS
    with pytest.raises(NotImplementedError, match="unsupported BMP"):
        decode_bmp(bytes(payload))


def test_single_byte_corruption_fuzz():
    img = md5_pixels(95, 16, 12)
    for payload in (
        encode_bmp(img, bpp=8, rle=True),
        encode_bmp(img, bpp=8),
        encode_bmp(_two_tone(), bpp=1),
    ):
        for i in range(len(payload)):
            for bit in (0x01, 0x80):
                corrupted = bytearray(payload)
                corrupted[i] ^= bit
                try:
                    decode_bmp(bytes(corrupted))
                except (ValueError, NotImplementedError):
                    pass


def test_jvm_imageio_conformance(spark, tmpdir):
    from youbike_etl_pipeline_spark.sources.readers import read_images

    img = md5_pixels(95, 16, 12)
    two = _two_tone()
    for tag, im, kw in (
        ("b24", img, dict()),
        ("b32", img, dict(bpp=32)),
        ("pal8", img, dict(bpp=8)),
        ("rle8", img, dict(bpp=8, rle=True)),
        ("pal4", two, dict(bpp=4)),
        ("pal1", two, dict(bpp=1)),
        ("td", img, dict(top_down=True)),
    ):
        d = tmpdir.mkdir(f"jvmbmp_{tag}")
        payload = encode_bmp(im, **kw)
        with open(os.path.join(str(d), "img.bmp"), "wb") as fh:
            fh.write(payload)
        rows = read_images(spark, str(d)).select("image.*").collect()
        assert rows and rows[0]["mode"] != -1, f"ImageIO rejected {tag} BMP"
        nc = rows[0]["nChannels"]
        ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
            rows[0]["height"], rows[0]["width"], nc
        )
        ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
        mine = decode_bmp(payload)
        assert np.array_equal(mine, ref), tag
        assert np.array_equal(mine, im), tag


def test_round8_review_rle_allocation_bomb_guard():
    """RLE8 output size comes from header fields alone — giant declared
    dims in a tiny file must be refused before the index allocates."""
    import struct

    payload = bytearray(encode_bmp(md5_pixels(95, 8, 6), bpp=8, rle=True))
    struct.pack_into("<ii", payload, 18, 60000, 60000)
    with pytest.raises(ValueError, match="exceed the decoder bound"):
        decode_bmp(bytes(payload))


def test_round9_advisor_rle_truncation_contract():
    """RLE8 corruption must raise like the raw paths do: a data_offset
    past EOF previously decoded silently as all-palette[0], and a stream
    exhausted before the end-of-bitmap escape decoded whatever prefix it
    had (round-9 advisor)."""
    import struct

    img = md5_pixels(96, 8, 6)
    payload = bytearray(encode_bmp(img, bpp=8, rle=True))
    bad = bytearray(payload)
    struct.pack_into("<I", bad, 10, len(payload) + 16)
    with pytest.raises(ValueError, match="truncated BMP pixel data"):
        decode_bmp(bytes(bad))
    # strip the trailing end-of-bitmap escape (0x00 0x01)
    assert payload[-2:] == b"\x00\x01"
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(bytes(payload[:-2]))
    # the intact stream still round-trips
    assert np.array_equal(decode_bmp(bytes(payload)), img)
