"""FLAC codec conformance: round trips are BIT-EXACT (lossless, zero
rounding latitude) across every subframe type, stereo decorrelation mode,
Rice method, partition layout, and frame split the spec-subset encoder can
write — and the decoder's OWN integrity machinery (CRC-8 header check,
CRC-16 frame check, STREAMINFO MD5 of the decoded PCM) must catch
single-byte corruption anywhere in the stream."""

from __future__ import annotations

import numpy as np
import pytest

from youbike_etl_pipeline_spark.operators.flac import (
    _read_coded_number,
    _write_coded_number,
    _MsbReader,
    _MsbWriter,
    decode_flac,
    encode_flac,
)
from youbike_etl_pipeline_spark.operators.multimodal import md5_samples


@pytest.mark.parametrize(
    "mode", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"]
)
def test_mono_subframe_matrix(mode):
    x = md5_samples(1, 256)
    rate, out = decode_flac(encode_flac(x, mode=mode))
    assert rate == 16000
    assert np.array_equal(out, x.astype(np.int64))


def test_constant_subframe():
    flat = np.full(192, -123, np.int16)
    _, out = decode_flac(encode_flac(flat, mode="constant"))
    assert np.array_equal(out, flat.astype(np.int64))


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_matrix(stereo):
    st = np.stack([md5_samples(2, 256), md5_samples(3, 256)], axis=1)
    _, out = decode_flac(encode_flac(st, mode="fixed2", stereo=stereo))
    assert np.array_equal(out, st.astype(np.int64))


@pytest.mark.parametrize(
    "kw",
    [
        dict(blocksize=256, partition_order=2),
        dict(blocksize=128, method=1),
        dict(escape_first=True),
        dict(blocksize=256, partition_order=1, method=1, escape_first=True),
    ],
    ids=lambda kw: "+".join(f"{k}={v}" for k, v in kw.items()),
)
def test_frames_partitions_methods(kw):
    x = md5_samples(4, 1024)
    _, out = decode_flac(encode_flac(x, mode="fixed1", **kw))
    assert np.array_equal(out, x.astype(np.int64))


def test_saturated_and_edge_values():
    """int16 extremes stress the side channel's bps+1 bit width and the
    Rice zigzag at its widest."""
    x = np.array([32767, -32768, 32767, -32768] * 64, np.int16)
    for stereo in ("left_side", "mid_side"):
        st = np.stack([x, x[::-1].copy()], axis=1)
        _, out = decode_flac(encode_flac(st, mode="verbatim", stereo=stereo))
        assert np.array_equal(out, st.astype(np.int64)), stereo


def test_coded_number_roundtrip():
    """The UTF-8-style frame number across every byte-length regime."""
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 2**31, 2**36 - 1):
        bw = _MsbWriter()
        _write_coded_number(bw, v)
        bw.align()
        assert _read_coded_number(_MsbReader(bytes(bw.out))) == v, v


def test_integrity_checks_catch_corruption():
    """Flipping any single byte must fail SOME check (CRC-8, CRC-16,
    STREAMINFO MD5, or structural) — never return wrong samples
    silently, and never escape as IndexError."""
    x = md5_samples(5, 256)
    payload = bytearray(encode_flac(x, mode="fixed2"))
    want = x.astype(np.int64)
    silent_wrong = 0
    for i in range(4, len(payload)):
        corrupted = bytearray(payload)
        corrupted[i] ^= 0x01
        try:
            _, out = decode_flac(bytes(corrupted))
        except ValueError:
            continue
        except NotImplementedError:
            continue
        if not np.array_equal(out, want):
            silent_wrong += 1
    assert silent_wrong == 0


def test_truncation_fuzz():
    payload = encode_flac(md5_samples(6, 512), mode="fixed1", blocksize=128)
    for cut in range(4, len(payload) - 1, 11):
        with pytest.raises(ValueError):
            decode_flac(payload[:cut])


def test_error_paths():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + b"\x00" * 40)


def test_spark_feature_dispatch(spark):
    """decode_audio_features dispatches FLAC payloads and the distributed
    features equal the local ground truth."""
    from youbike_etl_pipeline_spark.operators.multimodal import (
        attach_flac_payloads,
        decode_audio_features,
    )

    df = spark.range(0, 90, 10).withColumnRenamed("id", "doc_id")
    rows = decode_audio_features(attach_flac_payloads(df)).collect()
    assert len(rows) == 9
    for r in rows:
        x = md5_samples(r["doc_id"], 256).astype(np.int64)
        assert r["n_samples"] == 256
        assert r["peak"] == int(np.abs(x).max())
        assert r["zero_crossings"] == int(((x[:-1] * x[1:]) < 0).sum())
        assert abs(r["rms"] - float(np.sqrt((x * x).sum() / 256))) < 1e-9


def test_round7_review_escape_width():
    """Escape-partition raw width is sized from the residuals: fixed
    orders 3-4 on full-scale input exceed the old hardcoded 18 bits and
    silently wrapped into an MD5-mismatching stream."""
    x = np.array([32767, -32768] * 256, np.int16)
    for mode in ("fixed3", "fixed4"):
        _, out = decode_flac(encode_flac(x, mode=mode, escape_first=True))
        assert np.array_equal(out, x.astype(np.int64)), mode


# -------------------------------------------------- MS-ADPCM (same family)


def test_msadpcm_state_machine_anchors():
    """Hand-computed anchors for the MS-ADPCM recursion: coefficient pair
    0 (c1=256, c2=0 → pred == s1), nibble arithmetic, both clamps."""
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import (
        _ms_adpcm_decode_block,
    )

    # header: ci=0, delta=100, s1=1000, s2=-500; nibbles: +1, -1 (0x1F)
    block = struct.pack("<Bhhh", 0, 100, 1000, -500) + bytes([0x1F])
    out = _ms_adpcm_decode_block(block)
    # samples: s2, s1, then:
    #   n=1: pred = s1 = 1000; new = 1000 + 1*100 = 1100; delta = max(16, 230*100>>8) = 89
    #   n=15 (signed -1): pred = floor((1100*256 + 1000*0)/256) = 1100; new = 1100 - 89 = 1011
    assert list(out) == [-500, 1000, 1100, 1011]
    # sample clamp: big delta drives past int16
    block = struct.pack("<Bhhh", 0, 32000, 32000, 0) + bytes([0x77])
    out = _ms_adpcm_decode_block(block)
    assert out[2] == 32767  # 32000 + 7*32000 clamps
    # delta floor at 16
    block = struct.pack("<Bhhh", 0, 16, 0, 0) + bytes([0x00, 0x00])
    out = _ms_adpcm_decode_block(block)
    assert len(out) == 6
    # C-style truncation toward zero (round-8 advisor fix): ci=3
    # (c1=192, c2=64), s1=1, s2=-4 → sum = 192 - 256 = -64;
    # trunc(-64/256) = 0 (floor would give -1). Nibble 0 → sample = pred.
    block = struct.pack("<Bhhh", 3, 16, 1, -4) + bytes([0x00])
    out = _ms_adpcm_decode_block(block)
    assert list(out) == [-4, 1, 0, 0]
    # delta may legally exceed 32767 mid-block (round-8 advisor fix: the
    # spec clamps the LOWER bound only): nibble 8 adapts by 768/256 = 3×.
    # ci=2 (c1=c2=0 → pred always 0), delta=30000, nibbles 0x88:
    #   n=8: signed=-8 → sample clamp -32768; delta → 30000*3 = 90000
    #   n=8: sample = 0 - 8*90000 → clamp -32768; delta → 270000
    block = struct.pack("<Bhhh", 2, 30000, 0, 0) + bytes([0x88, 0x00])
    out = _ms_adpcm_decode_block(block)
    assert list(out) == [0, 0, -32768, -32768, 0, 0]
    with pytest.raises(ValueError, match="coefficient index"):
        _ms_adpcm_decode_block(struct.pack("<Bhhh", 7, 16, 0, 0) + b"\x00")


def test_msadpcm_spark_dispatch_matches_local(spark):
    from youbike_etl_pipeline_spark.operators.multimodal import (
        _ms_adpcm_decode_block,
        attach_msadpcm_payloads,
        decode_audio_features,
        decode_wav,
    )

    df = spark.range(0, 70, 10).withColumnRenamed("id", "doc_id")
    payload_rows = attach_msadpcm_payloads(df).collect()
    feat_rows = {r["doc_id"]: r for r in decode_audio_features(
        attach_msadpcm_payloads(df)
    ).collect()}
    assert len(feat_rows) == 7  # doc_ids 0..60 cover all 7 coefficient pairs
    for r in payload_rows:
        rate, x = decode_wav(bytes(r["payload"]))
        xl = x.astype(np.int64)
        f = feat_rows[r["doc_id"]]
        assert f["n_samples"] == len(x) == 252
        assert f["peak"] == int(np.abs(xl).max())
        assert f["zero_crossings"] == int(((xl[:-1] * xl[1:]) < 0).sum())


# -------------------------------------------------- float-PCM WAV (round 8)


def test_float_wav_roundtrip_matrix():
    """Format-3 WAV is bit reinterpretation: every width x header-shape
    combination must round-trip bit-exactly, including special values
    (inf/nan/-0.0/subnormals) that scaling-based decoders would mangle."""
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav_float,
        md5_samples,
    )

    x = md5_samples(11, 256).astype(np.float64) / 32768.0
    for bits, dt in ((32, np.float32), (64, np.float64)):
        for ext in (False, True):
            rate, back = decode_wav(encode_wav_float(x, 22050, bits=bits, extensible=ext))
            assert rate == 22050 and back.dtype == dt, (bits, ext)
            assert np.array_equal(back, x.astype(dt)), (bits, ext)
    special = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-40, -1e-40, 2.0, -2.0],
        dtype=np.float64,
    )
    for bits in (32, 64):
        _, back = decode_wav(encode_wav_float(special, bits=bits))
        want = special.astype(np.float32 if bits == 32 else np.float64)
        assert back.tobytes() == want.tobytes(), bits  # bit-level incl. nan/-0.0
    with pytest.raises(ValueError, match="32- or 64-bit"):
        encode_wav_float(special, bits=16)


def test_extensible_header_unwrap_and_gates():
    """WAVE_FORMAT_EXTENSIBLE wraps ANY classic code: a PCM16 payload
    behind an 0xFFFE header must decode identically; truncated fmt and
    non-KSDATAFORMAT GUIDs raise."""
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import (
        _WAVE_EXT_GUID_TAIL,
        decode_wav,
        encode_wav,
        md5_samples,
    )

    x = md5_samples(12, 64)
    # hand-build an extensible PCM16 container around the same data
    data = x.astype("<i2").tobytes()
    fmt_body = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22, 16, 4
    ) + struct.pack("<H", 1) + b"\x00\x00" + _WAVE_EXT_GUID_TAIL
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, back = decode_wav(wav)
    assert rate == 8000 and np.array_equal(back, x)
    # truncated extensible fmt chunk (no GUID)
    short_fmt = fmt_body[:18]
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(short_fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(ValueError, match="extensible"):
        decode_wav(bad)
    # foreign GUID (e.g. Dolby) is honestly gated, not misread as PCM
    foreign_fmt = fmt_body[:24] + b"\x92\x00\x00\x00" + b"\xde\xad" * 6
    bad2 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(foreign_fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(foreign_fmt)) + foreign_fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(NotImplementedError, match="GUID"):
        decode_wav(bad2)


def test_float_wav_spark_dispatch_matches_local(spark):
    """Distributed == local for the full mm20 path, covering all four
    header rotations (32/64-bit x classic/extensible), and the int
    feature path REFUSES float payloads instead of truncating."""
    from youbike_etl_pipeline_spark.operators.multimodal import (
        attach_float_wav_payloads,
        decode_audio_features,
        decode_wav,
    )

    df = spark.range(0, 70, 10).withColumnRenamed("id", "doc_id")
    payload_rows = attach_float_wav_payloads(df).collect()
    feat_rows = {
        r["doc_id"]: r
        for r in decode_audio_features(
            attach_float_wav_payloads(df), float_features=True
        ).collect()
    }
    assert len(feat_rows) == 7
    seen_formats = set()
    for r in payload_rows:
        seen_formats.add(r["media_meta"]["format"])
        rate, x = decode_wav(bytes(r["payload"]))
        xf = x.astype(np.float64)
        f = feat_rows[r["doc_id"]]
        assert f["n_samples"] == len(x) == 256
        assert f["n_bytes"] == len(r["payload"])
        assert f["peak"] == float(np.abs(xf).max())
        assert f["zero_crossings"] == int(((xf[:-1] * xf[1:]) < 0).sum())
        assert abs(f["rms"] - float(np.sqrt((xf * xf).sum() / len(x)))) < 1e-12
    assert seen_formats == {"float32-wav", "float64-wav"}
    with pytest.raises(Exception, match="float_features=True"):
        decode_audio_features(attach_float_wav_payloads(df)).collect()


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _flac_signals(draw):
    n = draw(st.integers(16, 700))
    kind = draw(st.sampled_from(["noise", "flat", "ramp", "saturated", "sine-ish"]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "noise":
        x = rng.integers(-32768, 32768, n)
    elif kind == "flat":
        x = np.full(n, int(rng.integers(-32768, 32768)))
    elif kind == "ramp":
        x = (np.arange(n) * int(rng.integers(-300, 300)) % 65536) - 32768
    elif kind == "saturated":
        x = np.where(np.arange(n) % 2 == 0, 32767, -32768)
    else:  # low-order-predictable, the LPC sweet spot
        x = (20000 * np.sin(np.arange(n) / draw(st.integers(2, 40)))).astype(int)
    mono = x.astype(np.int16)
    if draw(st.booleans()):
        other = rng.integers(-32768, 32768, n).astype(np.int16)
        return np.stack([mono, other], axis=1)
    return mono


@given(
    x=_flac_signals(),
    mode=st.sampled_from(
        ["verbatim", "constant", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"]
    ),
    stereo=st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    method=st.sampled_from([0, 1]),
    partition_order=st.sampled_from([0, 1, 2]),
    escape_first=st.booleans(),
    blocksize=st.sampled_from([64, 192, 256]),
)
@settings(max_examples=40, deadline=None)
def test_property_roundtrip_flac(
    x, mode, stereo, method, partition_order, escape_first, blocksize
):
    """Hypothesis twin of the TIFF property matrix (round-7 verdict item
    7): any signal shape x any encoder strategy must survive the full
    CRC-8/CRC-16/MD5-checked round trip bit-exactly."""
    if mode == "constant" and (x.ndim > 1 or len(np.unique(x)) > 1):
        mode = "verbatim"  # constant subframes need a constant signal
    if len(x) % blocksize:
        blocksize = len(x)  # encoder contract: blocksize | n
    while partition_order and (
        blocksize % (1 << partition_order) or (blocksize >> partition_order) < 32
    ):
        partition_order -= 1  # partitions must divide bs and exceed the order
    payload = encode_flac(
        x,
        mode=mode,
        stereo=stereo,
        method=method,
        partition_order=partition_order,
        escape_first=escape_first,
        blocksize=blocksize,
    )
    _, out = decode_flac(payload)
    assert np.array_equal(out, x.astype(np.int64))


# ------------------------------------------------- multichannel WAV (round 8)


def test_stereo_wav_roundtrip_and_gates():
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        md5_samples,
    )

    frames = md5_samples(77, 256).reshape(128, 2)
    rate, back = decode_wav(encode_wav(frames, rate=22050))
    assert rate == 22050 and back.shape == (128, 2)
    assert np.array_equal(back, frames)
    # mono output of the extended encoder is byte-identical (fixture
    # stability for attach_wav_payloads / mm3)
    mono = md5_samples(78, 64)
    payload = encode_wav(mono)
    assert struct.unpack_from("<H", payload, 22)[0] == 1  # nChannels
    _, back_m = decode_wav(payload)
    assert back_m.ndim == 1 and np.array_equal(back_m, mono)
    # 3-channel PCM and stereo G.711 also decode (interleaved formats)
    tri = md5_samples(79, 99).reshape(33, 3)
    _, back3 = decode_wav(encode_wav(tri))
    assert back3.shape == (33, 3) and np.array_equal(back3, tri)
    g711 = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 7, 2, 8000, 16000, 2, 8)
        + b"data" + struct.pack("<I", 8) + bytes(range(8))
    )
    _, g = decode_wav(g711)
    assert g.shape == (4, 2)
    # multichannel ADPCM stays honestly gated (per-channel block state)
    adpcm2 = (
        b"RIFF" + struct.pack("<I", 36 + 12) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 0x11, 2, 8000, 8000, 8, 4)
        + b"data" + struct.pack("<I", 12) + bytes(12)
    )
    with pytest.raises(NotImplementedError, match="multi-channel ADPCM"):
        decode_wav(adpcm2)
    # zero channels is malformed, not a crash
    zch = bytearray(encode_wav(mono))
    zch[22:24] = b"\x00\x00"
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav(bytes(zch))


def test_stereo_channel_features_spark_matches_local(spark):
    from youbike_etl_pipeline_spark.operators.multimodal import (
        attach_stereo_wav_payloads,
        decode_audio_channel_features,
        md5_samples,
    )

    df = spark.range(0, 50, 10).withColumnRenamed("id", "doc_id")
    rows = decode_audio_channel_features(attach_stereo_wav_payloads(df)).collect()
    assert len(rows) == 10  # 5 docs x 2 channels
    for r in rows:
        frames = md5_samples(r["doc_id"], 256).reshape(128, 2)
        xc = frames[:, r["channel"]].astype(np.int64)
        assert r["n_samples"] == 128
        assert r["peak"] == int(np.abs(xc).max())
        assert r["zero_crossings"] == int(((xc[:-1] * xc[1:]) < 0).sum())
        assert abs(r["rms"] - float(np.sqrt((xc * xc).sum() / 128))) < 1e-9
    # the mono feature path flattens multichannel payloads (FLAC
    # convention), so n_samples doubles rather than erroring
    from youbike_etl_pipeline_spark.operators.multimodal import (
        decode_audio_features,
    )

    flat = decode_audio_features(attach_stereo_wav_payloads(df)).collect()
    assert all(r["n_samples"] == 256 for r in flat)


def test_pcm8_and_pcm24_wav_decode():
    """8-bit PCM is unsigned with a 128 bias; 24-bit is little-endian
    signed kept at full int32 precision — both anchored by hand."""
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import decode_wav

    def wav(fmt_code, ch, rate, block, bits, data):
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack(
                "<IHHIIHH", 16, fmt_code, ch, rate, rate * block, block, bits
            )
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # u8: 0 -> -32768, 128 -> 0, 255 -> +32512
    _, x = decode_wav(wav(1, 1, 8000, 1, 8, bytes([0, 128, 255])))
    assert x.dtype == np.int16 and list(x) == [-32768, 0, 32512]
    # s24: 0x000001=1, 0x7FFFFF=max, 0x800000=min, 0xFFFFFF=-1
    data = (
        b"\x01\x00\x00" + b"\xff\xff\x7f" + b"\x00\x00\x80" + b"\xff\xff\xff"
    )
    _, y = decode_wav(wav(1, 1, 48000, 3, 24, data))
    assert y.dtype == np.int32
    assert list(y) == [1, 8388607, -8388608, -1]
    # stereo 24-bit frames
    _, z = decode_wav(wav(1, 2, 48000, 6, 24, data))
    assert z.shape == (2, 2) and z[0, 0] == 1 and z[1, 1] == -1


def test_round8_review_truncated_fmt_chunk():
    """A fmt chunk shorter than the 16-byte WAVEFORMATEX core leaked
    struct.error (found by crafted-truncation review probes); it must
    raise the documented ValueError."""
    import struct

    from youbike_etl_pipeline_spark.operators.multimodal import decode_wav

    for fmt_size, fmt_body in ((4, b"\x01\x00\x01\x00"),
                               (12, struct.pack("<HHII", 1, 1, 8000, 16000))):
        wav = (
            b"RIFF" + struct.pack("<I", 16 + fmt_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", fmt_size) + fmt_body
            + b"data" + struct.pack("<I", 2) + b"\x00\x00"
        )
        with pytest.raises(ValueError, match="truncated WAV fmt"):
            decode_wav(wav)
