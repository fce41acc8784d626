"""Baseline JPEG pixel decode with numpy only (no codec libraries).

Implements the ITU-T T.81 baseline sequential DCT process end-to-end:
marker parse (DQT/DHT/SOF0/SOS/DRI), canonical Huffman decode (Annex C),
DC prediction + EXTEND (F.2.2.1), AC run-length with ZRL/EOB (F.2.2.2),
dequantization, zigzag reorder, 2-D IDCT (A.3.3, as two 8x8 basis-matrix
multiplies), per-component plane assembly with sampling-factor
upsampling, and YCbCr→RGB (JFIF/CCIR 601 full-range).

Scope: SOF0 (baseline) and SOF1 (extended sequential, 8-bit) frames,
1 or 3 components, any sampling factors, restart intervals. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise a typed error so
the multimodal batch path records a decode_error row.

This closes the round-4 "compressed-stream pixel codecs remain
env-blocked" gap for JPEG: the pixels are really decoded here, with the
stdlib+numpy already in the container. The reference never decodes media
at all (refs pass through opaque), so there is no reference twin; parity
target is the T.81 spec itself.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: position k in the scan → (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# IDCT basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16); pixels = C^T S C
_C = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 *
                np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


class _HuffTable:
    """Canonical Huffman table per T.81 Annex C: BITS[1..16] + HUFFVAL."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data; unstuffs 0xFF00 and
    stops at (reports) RST/other markers."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.cur = 0
        self.n = 0

    def _next_byte(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("JPEG: entropy stream exhausted")
        b = self.d[self.i]
        self.i += 1
        if b == 0xFF:
            if self.i >= len(self.d):
                raise ValueError("JPEG: dangling 0xFF at stream end")
            nxt = self.d[self.i]
            if nxt == 0x00:
                self.i += 1          # byte stuffing
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("JPEG: hit restart marker mid-symbol")
            else:
                raise ValueError(f"JPEG: marker 0xFF{nxt:02X} inside scan")
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.cur = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def receive(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, which: int) -> None:
        """Consume padding bits + the RSTn marker at a restart boundary."""
        self.n = 0
        if self.i + 2 > len(self.d) or self.d[self.i] != 0xFF or \
                self.d[self.i + 1] != 0xD0 + (which & 7):
            raise ValueError("JPEG: expected RST marker at restart interval")
        self.i += 2


def _huff_decode(bits: _BitReader, table: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code (no match in 16 bits)")


def _extend(v: int, k: int) -> int:
    """T.81 F.2.2.1 EXTEND: map k received bits to the signed value."""
    if k == 0:
        return 0
    return v if v >= (1 << (k - 1)) else v - (1 << k) + 1


def _decode_block(bits: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable,
                  qtab: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block → (spatial pixels before level shift, new DC pred)."""
    s = _huff_decode(bits, dc_tab)
    diff = _extend(bits.receive(s), s)
    dc = pred + diff
    coef = np.zeros((8, 8))
    coef[0, 0] = dc * qtab[0]
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_tab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:       # ZRL: run of 16 zeros
                k += 16
                continue
            break             # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past end of block")
        coef[_ZIGZAG[k]] = _extend(bits.receive(size), size) * qtab[k]
        k += 1
    return _idct2(coef), dc


def jpeg_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG → ``(width, height, n_components, pixels)`` with
    ``pixels`` a uint8 array of shape (height, width, n_components) —
    RGB for 3-component YCbCr frames, grayscale plane for 1-component."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}   # (class, id)
    frame = None
    restart = 0
    pos = 2
    scan = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:       # EOI before SOS
            break
        if pos + 2 > len(payload):
            raise ValueError("JPEG: truncated segment header")
        seg_len, = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:       # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tab = np.frombuffer(body[i:i + 128],
                                        dtype=">u2").astype(np.int64)
                    i += 128
                qt[tq] = tab.astype(np.int64)
        elif marker == 0xC4:     # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits16 = list(body[i + 1:i + 17])
                nv = sum(bits16)
                vals = body[i + 17:i + 17 + nv]
                huff[(tc, th)] = _HuffTable(bits16, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):   # SOF0/SOF1: baseline family
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"JPEG: {prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF 0x{marker:02X} (progressive/arithmetic/"
                "hierarchical) unsupported — baseline only")
        elif marker == 0xDD:     # DRI
            restart, = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:     # SOS: scan header then entropy data
            ns = body[0]
            scomps = []
            for si in range(ns):
                cs, tt = struct.unpack_from(">BB", body, 1 + 2 * si)
                scomps.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            scan = (scomps, pos + seg_len)
            break
        pos += seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF or SOS")
    scomps, data_start = scan
    # entropy data runs to the next non-RST marker (usually EOI)
    end = len(payload)
    j = data_start
    while j + 1 < len(payload):
        if payload[j] == 0xFF and payload[j + 1] not in (0x00,) and \
                not (0xD0 <= payload[j + 1] <= 0xD7):
            end = j
            break
        j += 1
    bits = _BitReader(payload[data_start:end])

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scomps:
        c = by_id[sc["id"]]
        c["dc_tab"] = huff.get((0, sc["td"]))
        c["ac_tab"] = huff.get((1, sc["ta"]))
        if c["dc_tab"] is None or c["ac_tab"] is None:
            raise ValueError("JPEG: scan references undefined Huffman table")
        if c["tq"] not in qt:
            raise ValueError("JPEG: component references undefined DQT")
        # dequant table in zigzag order, matching the coefficient stream
        c["q"] = qt[c["tq"]]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        c["pred"] = 0
    n_mcu = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n_mcu and n_mcu % restart == 0:
                bits.align_and_expect_rst(rst_idx)
                rst_idx = (rst_idx + 1) & 7
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, c["pred"] = _decode_block(
                            bits, c["dc_tab"], c["ac_tab"], c["q"],
                            c["pred"])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            n_mcu += 1
    # level shift, upsample to full resolution, crop
    full = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray[:, :, None]
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"JPEG: {len(full)}-component frame unsupported")
