"""GIF decoder conformance. Unlike lossless JPEG / WebP, ImageIO DOES
decode GIF, so this format gets real third-party conformance: the numpy
decode must match Spark's JVM ``format("image")`` decode bit-exactly
(palette decode has zero rounding latitude). Round trips, the LZW KwKwK
edge, interlacing, local palettes, delta-frame transparency compositing,
and truncation fuzz cover the rest.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from youbike_etl_pipeline_spark.operators.multimodal import decode_image, md5_pixels


@pytest.mark.parametrize(
    "kw",
    [dict(), dict(interlace=True), dict(local_palettes=True),
     dict(interlace=True, local_palettes=True)],
    ids=lambda kw: "+".join(kw) or "plain",
)
def test_roundtrip_still(kw):
    # palette formats need ≤255 distinct colors: 19x13 = 247 pixels bounds
    # the md5 noise, and the odd dims stress the interlace pass rows
    for img in (md5_pixels(1, 16, 12), md5_pixels(2, 19, 13)):
        out = decode_gif(encode_gif(img, **kw))
        assert len(out) == 1 and np.array_equal(out[0], img), kw


def test_roundtrip_animation_with_delta_frames():
    f0 = md5_pixels(3, 16, 12)
    f1 = f0.copy()
    f1[3:6, 4:9] = md5_pixels(4, 5, 3)
    f2 = f1.copy()
    f2[0, 0] = (9, 9, 9)
    for kw in (
        dict(),
        dict(transparent_runs=True),
        dict(interlace=True, transparent_runs=True),
        dict(local_palettes=True, transparent_runs=True),
    ):
        out = decode_gif(encode_gif([f0, f1, f2], **kw))
        assert len(out) == 3, kw
        for got, want in zip(out, (f0, f1, f2)):
            assert np.array_equal(got, want), kw


def test_disposal_methods_roundtrip():
    """Round-8 advisor fix: the GCE disposal method (bits 2-4) is
    honored. The encoder simulates the decoder's canvas (background
    start, per-frame disposal) when computing delta masks, so a
    bit-exact round trip under transparent_runs PROVES the compositing:
    a decoder that ignored disposal would read stale canvas pixels
    through the transparency holes and produce wrong frames."""
    f0 = md5_pixels(31, 16, 12)
    f1 = f0.copy()
    f1[2:5, 3:8] = md5_pixels(32, 5, 3)
    f2 = f1.copy()
    f2[7, 1] = (200, 100, 50)
    for disp in (2, 3, [0, 2, 3], [2, 3, 0], [3, 2, 1]):
        for kw in (dict(), dict(local_palettes=True), dict(interlace=True)):
            out = decode_gif(
                encode_gif([f0, f1, f2], transparent_runs=True, disposal=disp, **kw)
            )
            assert len(out) == 3, (disp, kw)
            for i, (got, want) in enumerate(zip(out, (f0, f1, f2))):
                assert np.array_equal(got, want), (disp, kw, i)
    with pytest.raises(ValueError, match="disposal"):
        encode_gif([f0, f1], disposal=4)
    with pytest.raises(ValueError, match="disposal"):
        encode_gif([f0, f1], disposal=[0])


def test_reserved_disposal_raises():
    """Reserved disposal methods 4-7 are honestly gated, not silently
    decoded as keep-in-place."""
    payload = bytearray(encode_gif(md5_pixels(33, 8, 6), disposal=1))
    i = payload.index(b"\x21\xf9\x04")
    payload[i + 3] = (payload[i + 3] & ~0x1C) | (5 << 2)
    with pytest.raises(NotImplementedError, match="disposal method 5"):
        decode_gif(bytes(payload))


def test_first_frame_transparency_over_background():
    """Round-8 advisor fix: first-frame transparency must composite over
    the logical-screen BACKGROUND color, not a zero canvas. The fixture
    pins a nonzero color that sorts first (palette slot 0 == the LSD
    background entry) so the pre-fix zero-canvas behavior would decode
    those pixels black and fail."""
    img = np.clip(md5_pixels(34, 16, 12), 10, 255)
    img[4:8, 2:6] = (1, 2, 3)  # sorts before every clipped noise color
    payload = encode_gif(img, transparent_runs=True)
    assert b"\x21\xf9\x04" in payload  # frame 0 carries a GCE now
    out = decode_gif(payload)
    assert len(out) == 1 and np.array_equal(out[0], img)


def test_lzw_kwkwk_case():
    """The code==len(table) self-referential entry (KwKwK): a run of one
    symbol forces it immediately — decode must synthesize prev+prev[0]."""
    idx = np.zeros(64, dtype=np.uint8)  # aaaa... is the canonical trigger
    assert np.array_equal(_lzw_decode(2, _lzw_encode(2, idx), 64), idx)
    # alternating + runs mixture, all widths exercised via 200 symbols
    idx = (np.arange(200) % 3).astype(np.uint8)
    assert np.array_equal(_lzw_decode(2, _lzw_encode(2, idx), 200), idx)


def test_lzw_dictionary_overflow_clears():
    """>4096 dictionary entries force the encoder's mid-stream clear; the
    decoder must follow the reset."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 200, 30_000).astype(np.uint8)
    assert np.array_equal(_lzw_decode(8, _lzw_encode(8, idx), 30_000), idx)


def test_degenerate_shapes_and_dispatch():
    for img in (md5_pixels(5, 1, 1), md5_pixels(6, 1, 9), md5_pixels(7, 9, 1)):
        out = decode_gif(encode_gif(img))
        assert np.array_equal(out[0], img)
    img = md5_pixels(8, 16, 12)
    assert np.array_equal(decode_image(encode_gif(img)), img)
    assert np.array_equal(decode_image(encode_gif(img), fmt="gif"), img)


def test_error_paths_and_truncation_fuzz():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF00a" + b"\x00" * 16)
    payload = encode_gif(md5_pixels(9, 16, 12), interlace=True)
    for cut in range(6, len(payload) - 1, 7):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_jvm_imageio_conformance(spark, tmpdir):
    """ImageIO decodes GIF — the numpy decode must agree bit-exactly on
    stills, interlaced or not, INCLUDING a 64x48 stream whose LZW crosses
    the 512/1024 code-width bumps (the TIFF-LZW calibration found an
    off-by-one exactly there that self-round-trips could never catch)."""
    from youbike_etl_pipeline_spark.sources.readers import read_images

    pal = md5_pixels(7, 200, 1)[0]
    big = pal[md5_pixels(123, 64, 48).astype(np.int64).sum(axis=2) % 200]
    for tag, payload, img in (
        ("plain", encode_gif(md5_pixels(10, 16, 12)), md5_pixels(10, 16, 12)),
        (
            "interlace",
            encode_gif(md5_pixels(11, 16, 12), interlace=True),
            md5_pixels(11, 16, 12),
        ),
        ("width_bumps", encode_gif(big), big),
    ):
        d = tmpdir.mkdir(f"jvmgif_{tag}")
        with open(os.path.join(str(d), "img.gif"), "wb") as fh:
            fh.write(payload)
        rows = read_images(spark, str(d)).select("image.*").collect()
        assert rows and rows[0]["mode"] != -1, f"ImageIO rejected {tag} GIF"
        nc = rows[0]["nChannels"]
        ref = np.frombuffer(bytes(rows[0]["data"]), np.uint8).reshape(
            rows[0]["height"], rows[0]["width"], nc
        )
        ref = ref[:, :, :3][:, :, ::-1] if nc >= 3 else np.repeat(ref, 3, axis=2)
        mine = decode_gif(payload)[0]
        assert np.array_equal(mine, ref), tag
        assert np.array_equal(mine, img), tag


def test_round7_review_png_zero_dim_bomb():
    """(Housed here with the other image-format regressions:) a PNG
    declaring h=0 must be rejected BEFORE the inflate — zlib treats
    max_length=0 as unlimited, re-opening the bomb the round-6 bound
    closed."""
    import struct
    import zlib

    from youbike_etl_pipeline_spark.operators.multimodal import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 0, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000, 9))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="zero dimension"):
        decode_png(bomb)


def test_single_byte_corruption_fuzz():
    """Round-8 hardening: any single-bit flip must either raise the
    documented types (ValueError/NotImplementedError) or decode — GIF
    has no CRC, so silent wrong pixels are acceptable, but structural
    exceptions (IndexError/KeyError/struct.error) and hangs are not."""
    payload = encode_gif(md5_pixels(22, 16, 12), interlace=True)
    for i in range(len(payload)):
        for bit in (0x01, 0x80):
            corrupted = bytearray(payload)
            corrupted[i] ^= bit
            try:
                decode_gif(bytes(corrupted))
            except (ValueError, NotImplementedError):
                pass


def test_round8_review_allocation_bomb_guard():
    """A tiny payload claiming giant logical-screen dimensions must be
    refused BEFORE the canvas allocates (the PNG bounded-inflate posture
    applied to header-driven allocations)."""
    import struct

    payload = bytearray(encode_gif(md5_pixels(35, 8, 6)))
    struct.pack_into("<HH", payload, 6, 65535, 65535)
    with pytest.raises(ValueError, match="exceed the decoder bound"):
        decode_gif(bytes(payload))


def test_round9_advisor_total_frame_bytes_cap():
    """decode_gif snapshots the FULL canvas per frame, so a canvas under
    the w*h bound plus many tiny frame blocks amplifies a few-KB file
    to frames*canvas bytes — total decoded pixels must be bounded, not
    just the canvas (round-9 advisor)."""
    import struct

    one = np.zeros((1, 1, 3), dtype=np.uint8)
    payload = bytearray(encode_gif([one] * 5))
    # 4096*4096 = 2^24 px canvas passes the per-canvas guard; the 5th
    # full-canvas snapshot crosses the 2^26 total-pixel posture
    struct.pack_into("<HH", payload, 6, 4096, 4096)
    with pytest.raises(ValueError, match="total decoded frame pixels"):
        decode_gif(bytes(payload))
