"""Baseline JPEG decoder (operators/jpeg.py) vs hand-encoded T.81 streams.

The tests carry a minimal spec-side ENCODER (canonical Huffman code
assignment per Annex C, category/EXTEND inverse per F.1.2.1, byte
stuffing, restart markers) so every decoded pixel is checked against an
independently-computed IDCT — not against the decoder's own math.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rdf_dtdl_fabric_ontology_converter_spark.operators.jpeg import jpeg_decode

# ---------------------------------------------------------------------------
# minimal encoder-side helpers (inverse of the decoder, straight from T.81)
# ---------------------------------------------------------------------------

# tiny custom tables: DC = categories 0..7 at code length 4,
# AC = the handful of symbols the tests emit, all at code length 4
DC_BITS = [0, 0, 0, 8] + [0] * 12
DC_VALS = bytes(range(8))
AC_SYMS = [0x00, 0x01, 0x02, 0x03, 0x11, 0x12, 0x13, 0x21, 0x22, 0x23,
           0x31, 0x32, 0x33, 0x83, 0xF0]
AC_BITS = [0, 0, 0, 0, len(AC_SYMS)] + [0] * 11
AC_VALS = bytes(AC_SYMS)


def canonical_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = canonical_codes(DC_BITS, DC_VALS)
AC_CODES = canonical_codes(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def to_bytes(self):
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(1)          # pad with 1s (T.81 F.1.2.3)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)    # byte stuffing
        return bytes(out)


def cat(v):
    a, k = abs(v), 0
    while a:
        k += 1
        a >>= 1
    return k


def magnitude_bits(v, k):
    return v if v >= 0 else v + (1 << k) - 1


def encode_block(wr, coefz, pred):
    """coefz: 64 quantized coefficients in ZIGZAG order."""
    diff = coefz[0] - pred
    k = cat(diff)
    ln, c = DC_CODES[k]
    wr.write(c, ln)
    if k:
        wr.write(magnitude_bits(diff, k), k)
    last = max((i for i in range(1, 64) if coefz[i]), default=0)
    run = 0
    for i in range(1, last + 1):
        v = coefz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, c = AC_CODES[0xF0]
            wr.write(c, ln)
            run -= 16
        s = cat(v)
        ln, c = AC_CODES[(run << 4) | s]
        wr.write(c, ln)
        wr.write(magnitude_bits(v, s), s)
        run = 0
    if last < 63:
        ln, c = AC_CODES[0x00]      # EOB
        wr.write(c, ln)
    return coefz[0]


def seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def dqt(tq, table64):
    return seg(0xDB, bytes([tq]) + bytes(table64))


def dht(tc, th, bits, vals):
    return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)


def sof0(w, h, comps):
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return seg(0xC0, body)


def sos(scomps):
    body = bytes([len(scomps)])
    for cid, td, ta in scomps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([0, 63, 0])
    return seg(0xDA, body)


def gray_jpeg(w, h, blocks_zigzag, quant=16, dri=0, rst_between=()):
    """Grayscale baseline JPEG from per-block zigzag coefficient lists
    (blocks in MCU order, one block per MCU)."""
    head = (b"\xff\xd8" + dqt(0, [quant] * 64) +
            dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS))
    if dri:
        head += seg(0xDD, struct.pack(">H", dri))
    head += sof0(w, h, [(1, 1, 1, 0)]) + sos([(1, 0, 0)])
    data = b""
    wr = BitWriter()
    pred = 0
    for bi, coefz in enumerate(blocks_zigzag):
        if bi in rst_between:
            data += wr.to_bytes() + bytes([0xFF, 0xD0 + ((bi // dri - 1) & 7)])
            wr = BitWriter()
            pred = 0
        pred = encode_block(wr, coefz, pred)
    data += wr.to_bytes()
    return head + data + b"\xff\xd9"


def ref_idct(coefz, quant=16):
    """Independent IDCT (double sum, A.3.3) from zigzag coefficients."""
    zz = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
          (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
          (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
          (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
          (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
          (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
          (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
          (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7)]
    S = np.zeros((8, 8))
    for k, v in enumerate(coefz):
        S[zz[k]] = v * quant
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (cu * cv / 4.0 * S[u, v] *
                          np.cos((2 * x + 1) * v * np.pi / 16) *
                          np.cos((2 * y + 1) * u * np.pi / 16))
            out[y, x] = s
    return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_dc_only_flat_block():
    # DC=4, quant 16 → coefficient 64 → flat 64/8 = 8 over the mean → 136
    z = [0] * 64
    z[0] = 4
    w, h, nch, px = jpeg_decode(gray_jpeg(8, 8, [z]))
    assert (w, h, nch) == (8, 8, 1)
    assert px.shape == (8, 8, 1)
    assert np.all(px == 136)


def test_dc_prediction_across_blocks():
    z1, z2 = [0] * 64, [0] * 64
    z1[0], z2[0] = 4, 2   # second block stores DIFF −2 → DC 2 → 132
    w, h, _, px = jpeg_decode(gray_jpeg(16, 8, [z1, z2]))
    assert (w, h) == (16, 8)
    assert np.all(px[:, :8, 0] == 136) and np.all(px[:, 8:, 0] == 132)


def test_ac_coefficients_match_reference_idct():
    z = [0] * 64
    z[0], z[1], z[2], z[5] = 3, -2, 5, 1   # DC + three ACs incl. a zero run
    px = jpeg_decode(gray_jpeg(8, 8, [z]))[3]
    assert np.array_equal(px[:, :, 0], ref_idct(z))


def test_zero_run_length_and_eob():
    z = [0] * 64
    z[0] = 1
    z[20] = -1   # 19 zeros → ZRL + run 3
    px = jpeg_decode(gray_jpeg(8, 8, [z]))[3]
    assert np.array_equal(px[:, :, 0], ref_idct(z))


def test_color_444_flat():
    # flat Y/Cb/Cr DCs → one exact RGB triple everywhere (601 full-range)
    comps = []
    for dc in (4, 2, -2):   # Y=136, Cb=132, Cr=124 after quant+IDCT+shift
        z = [0] * 64
        z[0] = dc
        comps.append(z)
    head = (b"\xff\xd8" + dqt(0, [16] * 64) +
            dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS) +
            sof0(8, 8, [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]) +
            sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)]))
    wr = BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for cid, z in zip((1, 2, 3), comps):
        pred[cid] = encode_block(wr, z, pred[cid])
    jpg = head + wr.to_bytes() + b"\xff\xd9"
    w, h, nch, px = jpeg_decode(jpg)
    assert (w, h, nch) == (8, 8, 3)
    y, cb, cr = 136.0, 132.0, 124.0
    exp = (round(y + 1.402 * (cr - 128)),
           round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
           round(y + 1.772 * (cb - 128)))
    assert tuple(px[0, 0]) == exp and tuple(px[7, 7]) == exp


def test_color_420_chroma_upsample_layout():
    # 16x16, Y sampled 2x2 (4 blocks per MCU), Cb/Cr 1x1: four distinct
    # luma quadrants under flat neutral chroma → grayscale quadrants
    ydcs = [2, 4, 6, 8]   # TL, TR, BL, BR block order within the MCU
    head = (b"\xff\xd8" + dqt(0, [16] * 64) +
            dht(0, 0, DC_BITS, DC_VALS) + dht(1, 0, AC_BITS, AC_VALS) +
            sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]) +
            sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)]))
    wr = BitWriter()
    pred = 0
    for dc in ydcs:
        z = [0] * 64
        z[0] = dc
        pred = encode_block(wr, z, pred)
    for _cid in (2, 3):     # neutral chroma: DC 0 → 128
        z = [0] * 64
        encode_block(wr, z, 0)
    jpg = head + wr.to_bytes() + b"\xff\xd9"
    w, h, nch, px = jpeg_decode(jpg)
    assert (w, h, nch) == (16, 16, 3)
    lum = {(0, 0): 132, (0, 8): 136, (8, 0): 140, (8, 8): 144}
    for (y0, x0), v in lum.items():
        q = px[y0:y0 + 8, x0:x0 + 8]
        assert np.all(q[..., 0] == v) and np.all(q[..., 1] == v) \
            and np.all(q[..., 2] == v)


def test_restart_interval():
    z1, z2 = [0] * 64, [0] * 64
    z1[0], z2[0] = 4, 4    # predictor resets at RST → second diff is 4 again
    jpg = gray_jpeg(16, 8, [z1, z2], dri=1, rst_between={1})
    w, h, _, px = jpeg_decode(jpg)
    assert np.all(px == 136)


def test_progressive_raises_typed():
    z = [0] * 64
    jpg = bytearray(gray_jpeg(8, 8, [z]))
    idx = jpg.find(b"\xff\xc0")
    jpg[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF 0xC2"):
        jpeg_decode(bytes(jpg))


def test_byte_stuffing_and_marker_guard():
    # the test tables' canonical codes all start with a 0 bit, so a
    # natural 0xFF byte cannot arise in their streams — exercise the
    # unstuffing path at the reader level instead (T.81 F.1.2.3)
    from rdf_dtdl_fabric_ontology_converter_spark.operators.jpeg import (
        _BitReader)
    r = _BitReader(b"\xff\x00\x80")
    assert [r.bit() for _ in range(8)] == [1] * 8     # 0xFF, stuffing eaten
    assert r.bit() == 1 and r.receive(7) == 0         # then 0x80
    # a non-stuffed marker inside the scan is a typed error, not garbage
    r2 = _BitReader(b"\xff\xd9")
    with pytest.raises(ValueError, match="marker"):
        r2.bit()


def test_stdlib_decoder_jpeg_pixel_feature():
    """The multimodal stdlib tier must use REAL pixels for decodable
    baseline JPEGs (top-bin histogram for a flat near-white image) and
    fall back to metadata-level for header-only payloads."""
    from rdf_dtdl_fabric_ontology_converter_spark.operators.multimodal import (
        stdlib_decoder)
    z = [0] * 64
    z[0] = 63   # DC 63*16/8 = 126 over mean → 254: top luma bin
    d = stdlib_decoder("x.jpg", gray_jpeg(8, 8, [z]))
    assert (d["width"], d["height"]) == (8, 8)
    assert d["feature"][7] == 1.0
