"""Minimal baseline-JPEG ENCODER used only to generate conformance
fixtures for ``operators.multimodal.decode_jpeg`` (round-6 verdict item 7:
the 4:2:2 / restart-interval / 16-bit-quant decoder branches existed but
only truncation was fuzzed — generated fixtures let the matrix pin them
against Spark's JVM ImageIO decode and against analytic expectations).

Spec-faithful ITU-T T.81 subset: SOF0 baseline, MCU-interleaved single
scan, the Annex K.3.3 standard luminance Huffman tables for every
component (legal — SOS just maps table ids), optional 4:2:2/4:2:0 box
downsampling, optional DRI/RSTn restart markers, and 8- or 16-bit (Pq=1)
quantization tables. NOT a production encoder: no rate control, no trellis,
no optimized tables — just valid bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from youbike_etl_pipeline_spark.operators.multimodal import _IDCT_M, _ZIGZAG

# ITU-T T.81 Annex K.3.3.1/K.3.3.2 — standard luminance tables
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _build_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = self.n = 0

    def align_ones(self) -> None:
        while self.n:
            self.write(1, 1)


def _category(v: int) -> tuple[int, int]:
    """(size, appended-bits) per F.1.2.1: negative values emit v-1's
    low bits (one's-complement form)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(bw: _BitWriter, zz: "np.ndarray", pred: int) -> int:
    dc = int(zz[0])
    s, bits = _category(dc - pred)
    length, code = _DC_CODES[s]
    bw.write(length, code)
    if s:
        bw.write(s, bits)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            length, code = _AC_CODES[0xF0]  # ZRL
            bw.write(length, code)
            run -= 16
        s, bits = _category(v)
        length, code = _AC_CODES[(run << 4) | s]
        bw.write(length, code)
        bw.write(s, bits)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]  # EOB
        bw.write(length, code)
    return dc


def _fdct_quant(plane: "np.ndarray", q_zz: "np.ndarray") -> "np.ndarray":
    """All blocks of a (H8, W8) plane → (H8/8, W8/8, 64) quantized zigzag
    coefficients. Forward DCT is the transpose pair of the decoder's
    orthonormal IDCT basis."""
    bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    f = np.einsum("uy,bxyv,vc->bxuc", _IDCT_M, blocks, _IDCT_M.T)
    flat = f.reshape(bh, bw_, 64)
    zz = flat[:, :, _ZIGZAG]  # natural -> zigzag
    return np.rint(zz / q_zz).astype(np.int64)


def _pad_to(plane: "np.ndarray", ph: int, pw: int) -> "np.ndarray":
    return np.pad(
        plane,
        ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
        mode="edge",
    )


def _box_down(plane: "np.ndarray", fh: int, fv: int) -> "np.ndarray":
    """Box-average downsample by (fh horizontal, fv vertical), edge-padding
    odd dimensions first."""
    h, w = plane.shape
    p = _pad_to(plane, -(-h // fv) * fv, -(-w // fh) * fh).astype(np.float64)
    p = p.reshape(p.shape[0] // fv, fv, p.shape[1] // fh, fh).mean(axis=(1, 3))
    return np.rint(p)


def encode_jpeg(
    rgb: "np.ndarray",
    sampling: str = "444",
    restart_interval: int = 0,
    quant: "np.ndarray | int" = 4,
    quant_16bit: bool = False,
    grayscale: bool = False,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB (or its BT.601 luma when ``grayscale``)
    as a baseline JFIF JPEG. ``sampling`` ∈ {"444", "422", "420"};
    ``quant`` is a scalar or a 64-entry zigzag table; ``quant_16bit``
    writes the SAME values with DQT precision Pq=1 (two bytes per entry,
    required once any value exceeds 255)."""
    h, w = rgb.shape[:2]
    q_zz = (
        np.full(64, int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64)
    )
    if q_zz.max() > 255 and not quant_16bit:
        raise ValueError("quant values > 255 need quant_16bit=True")

    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = np.rint(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.rint(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
    cr = np.rint(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)

    if grayscale:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": y}]
    else:
        fh, fv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sampling]
        comps = [
            {"id": 1, "h": fh, "v": fv, "plane": y},
            {"id": 2, "h": 1, "v": 1, "plane": _box_down(cb, fh, fv)},
            {"id": 3, "h": 1, "v": 1, "plane": _box_down(cr, fh, fv)},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["coef"] = _fdct_quant(
            _pad_to(
                np.clip(c["plane"], 0, 255), mcuy * c["v"] * 8, mcux * c["h"] * 8
            ),
            q_zz,
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if quant_16bit:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + bytes([0x10])
        out += q_zz.astype(">u2").tobytes()
    else:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0x00])
        out += q_zz.astype(np.uint8).tobytes()
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.align_ones()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            for vy in range(c["v"]):
                for hx in range(c["h"]):
                    zz = c["coef"][my * c["v"] + vy, mx * c["h"] + hx]
                    preds[ci] = _encode_block(bw, zz, preds[ci])
    bw.align_ones()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def test_image(h: int = 29, w: int = 37, seed: int = 3) -> "np.ndarray":
    """Deterministic smooth-but-not-flat RGB: gradients + low-frequency
    sinusoids so every block carries a few AC coefficients (a flat image
    would never exercise run-length/ZRL paths)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 96 + 64 * np.sin(xx / 6.0) + 2.0 * yy
    g = 80 + 50 * np.cos(yy / 5.0) + 1.5 * xx
    b = 128 + 40 * np.sin((xx + yy) / 9.0)
    rng = np.random.default_rng(seed)
    noise = rng.integers(-4, 5, size=(h, w, 3))
    img = np.stack([r, g, b], axis=2) + noise
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)
