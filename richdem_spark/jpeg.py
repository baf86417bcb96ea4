"""Baseline JPEG (JFIF) codec, pure stdlib + numpy.

The reference ingests imagery through GDAL's codec stack
(``common/Array2D.hpp:418-431`` routes any GDAL-readable format); this
container has no codec libraries, so the multimodal column operators
ship their own decoders (PNG/WAV in :mod:`richdem_spark.multimodal`).
This module adds the other format a web corpus actually contains:
baseline sequential JPEG.

Scope (honest errors outside it):

* decode — baseline DCT (SOF0), 8-bit, grayscale or YCbCr with any
  sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart markers.
  Progressive (SOF2), arithmetic coding, and 12-bit raise
  ``NotImplementedError``.
* encode — baseline, quality-scaled Annex-K quantization, the spec's
  example Huffman tables, 4:4:4 (no subsampling loss beyond
  quantization) or 4:2:0.

The entropy decoder is a table-driven bit reader in Python (fast
enough for corpus thumbnails; the DCT/color stages are vectorized
numpy).  Used per-batch inside ``mapInPandas`` — one executor decodes
only its own rows, so the scale shape matches the PNG path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (natural order)
_QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 example Huffman tables: (bits[1..16], values)
_HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HT_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
     0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
     0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
     0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
     0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
     0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
     0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# orthonormal 8x8 DCT-II basis: spatial = C.T @ coeff @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _build_decode_table(bits, values):
    """(length, code) -> symbol map per the canonical-code construction
    (ITU T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any marker (restart handling is the caller's
    job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed 0 bits (T.81 F.2.2.5 pads with 1s; any
                # fill value works because decode stops at the marker)
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next marker (restart interval)."""
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        p = self.pos
        while d[p] != 0xFF or d[p + 1] == 0x00:
            p += 1
        self.pos = p + 2


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to HxW (grayscale) or HxWx3 RGB
    uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    H = W = 0
    restart = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:          # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:          # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8) \
                        .astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2") \
                        .astype(np.int64)
                    p += 128
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = tbl
                qt[tq] = nat
        elif marker == 0xC0:        # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            H, W = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (only baseline "
                "sequential SOF0 is supported)")
        elif marker == 0xC4:        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                t = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = t
                p += 17 + nv
        elif marker == 0xDD:        # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:        # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i: 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            data_pos = pos + seglen
            return _decode_scan(payload, data_pos, scan, qt, huff_dc,
                                huff_ac, H, W, restart)
        pos += seglen
    raise ValueError("JPEG truncated before SOS")


def _decode_scan(data, pos, scan, qt, huff_dc, huff_ac, H, W, restart):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx = (W + mcu_w - 1) // mcu_w
    my = (H + mcu_h - 1) // mcu_h
    planes = []
    for c, _, _ in scan:
        pw, ph = mx * c["h"] * 8, my * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    pred = [0] * len(scan)
    br = _BitReader(data, pos)
    since_restart = 0
    for m in range(mx * my):
        if restart and m and since_restart == restart:
            br.align_to_marker()
            pred = [0] * len(scan)
            since_restart = 0
        mxi, myi = m % mx, m // mx
        for ci, (c, td, ta) in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeff = np.zeros(64, dtype=np.float64)
                    s = _decode_huff(br, huff_dc[td])
                    diff = _extend(br.receive(s), s)
                    pred[ci] += diff
                    coeff[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(br, huff_ac[ta])
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:
                                k += 16
                                continue
                            break               # EOB
                        k += r
                        coeff[ZIGZAG[k]] = _extend(br.receive(size),
                                                   size)
                        k += 1
                    block = coeff * qt[c["tq"]]
                    spat = _C.T @ block.reshape(8, 8) @ _C
                    y0 = (myi * c["v"] + by) * 8
                    x0 = (mxi * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = spat
        since_restart += 1
    out_planes = []
    for ci, (c, _, _) in enumerate(scan):
        p = planes[ci] + 128.0
        # upsample to full MCU-grid resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:H, :W])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, \
        out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _quality_tables(quality: int):
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QL_BASE, _QC_BASE):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out


def _build_encode_table(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int):
    a = abs(v)
    s = a.bit_length()
    if v < 0:
        v = v + (1 << s) - 1
    return s, v


def _encode_block(bw, coeff_q, pred, dc_tbl, ac_tbl):
    zz = coeff_q[ZIGZAG]
    diff = int(zz[0]) - pred
    s, bitsv = _magnitude(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(bitsv, s)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]        # ZRL
            bw.write(code, ln)
            run -= 16
        s, bitsv = _magnitude(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bitsv, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]            # EOB
        bw.write(code, ln)
    return int(zz[0])


def jpeg_encode(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart: int = 0) -> bytes:
    """Encode HxW (grayscale) or HxWx3 RGB uint8 to baseline JFIF.
    ``subsample=True`` writes 4:2:0 chroma (exercises the decoder's
    upsampling path); default is 4:4:4.  ``restart`` > 0 writes a DRI
    segment and RSTn markers every that many MCUs."""
    a = np.asarray(img)
    gray = a.ndim == 2
    H, W = a.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [a.astype(np.float64) - 128.0]
        qts = [ql]
        samp = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:
            def ds(p):
                ph = (H + 1) // 2 * 2
                pw = (W + 1) // 2 * 2
                pp = np.pad(p, ((0, ph - H), (0, pw - W)), "edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            planes = [y - 0.0, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        planes[0] -= 128.0
        qts = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx = (W + mcu_w - 1) // mcu_w
    my = (H + mcu_h - 1) // mcu_h
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = my * sv * 8, mx * sh * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge"))

    dc_l = _build_encode_table(*_HT_DC_LUM)
    ac_l = _build_encode_table(*_HT_AC_LUM)
    dc_c = _build_encode_table(*_HT_DC_CHR)
    ac_c = _build_encode_table(*_HT_AC_CHR)

    bw = _BitWriter()
    pred = [0] * len(planes)
    rst = 0
    for m in range(mx * my):
        if restart and m and m % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred = [0] * len(planes)
        mxi, myi = m % mx, m // mx
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            qtbl = qts[ci]
            dc_t = dc_l if ci == 0 else dc_c
            ac_t = ac_l if ci == 0 else ac_c
            for by in range(sv):
                for bx in range(sh):
                    y0 = (myi * sv + by) * 8
                    x0 = (mxi * sh + bx) * 8
                    block = p[y0:y0 + 8, x0:x0 + 8]
                    coeff = _C @ block @ _C.T
                    q = np.round(coeff.ravel() / qtbl.reshape(8, 8)
                                 .ravel()).astype(np.int64)
                    pred[ci] = _encode_block(bw, q, pred[ci], dc_t,
                                             ac_t)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zl = np.empty(64, np.uint8)
    zl[:] = ql[ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + zl.tobytes())
    if not gray:
        zc = np.empty(64, np.uint8)
        zc[:] = qc[ZIGZAG]
        out += seg(0xDB, bytes([0x01]) + zc.tobytes())
    nc = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", H, W) + bytes([nc])
    for i in range(nc):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += seg(0xC0, bytes(sof))
    for tc, th, (bits, vals) in ((0, 0, _HT_DC_LUM), (1, 0, _HT_AC_LUM),
                                 (0, 1, _HT_DC_CHR),
                                 (1, 1, _HT_AC_CHR)):
        if gray and th == 1:
            continue
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
