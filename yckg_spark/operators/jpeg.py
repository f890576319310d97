"""Baseline JPEG (JFIF) decoder — pure Python, no codec library.

JPEG's baseline process is Huffman coding + an 8×8 DCT, both plain
arithmetic, so like PNG (stdlib DEFLATE) and GIF (hand-rolled LZW) it
is decodable here without any media dependency. Supported: baseline
and extended-sequential Huffman SOFs (SOF0/SOF1), 8-bit precision,
grayscale or 3-component YCbCr, any h/v sampling factors up to 4
(4:4:4, 4:2:2, 4:2:0, ...), restart intervals, multi-table DQT/DHT
segments, byte stuffing. Not supported (raise ValueError): progressive
(SOF2), arithmetic coding, 12-bit precision, CMYK.

The decode path mirrors the spec directly: marker walk → per-MCU
Huffman decode of zigzag coefficient blocks → dequantize → IDCT →
level shift → chroma upsample → YCbCr→RGB. The IDCT is the separable
float transform; all other stages are integer-exact, so a constant
block round-trips bit-exactly through the matching test encoder.

Reference parity note: the reference pipeline never decodes media
(single-node pandas+rdflib, Code/create_yelp_nt_files.py operates on
JSON only); this module exists for the training-data multimodal
operators (SURVEY.md "multimodal columns"), giving ``extract_features``
/ ``resize_images`` a real decode for the dominant web image format.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable IDCT basis: C[u][x] = c(u)/2 * cos((2x+1)u*pi/16)
_IDCT_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]

_SOF_HUFFMAN = (0xC0, 0xC1)  # baseline, extended sequential
_SOF_UNSUPPORTED = (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops at any real marker and reports it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: the spec pads with 1-bits
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial bits and return the pending marker (consuming it)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward for the next marker
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        m = self.marker
        self.marker = None
        return m


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, per the canonical code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG signed-magnitude EXTEND: t-bit value v → signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef: list[float]) -> list[int]:
    """2-D separable IDCT on a dequantized (natural-order) block →
    level-shifted, clamped 0..255 samples."""
    tmp = [0.0] * 64
    for y in range(8):  # rows: 1-D IDCT over u
        base = y * 8
        row = coef[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                if row[u]:
                    s += row[u] * _IDCT_C[u][x]
            tmp[base + x] = s
    out = [0] * 64
    for x in range(8):  # cols: 1-D IDCT over v
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                if col[v]:
                    s += col[v] * _IDCT_C[v][y]
            p = int(round(s)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def is_jpeg(payload: bytes | None) -> bool:
    """True if the payload is a Huffman sequential (baseline/extended)
    JFIF we decode for real. Progressive and arithmetic-coded streams
    return False (they'd raise in ``jpeg_rgb``)."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return False
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return False
        marker = payload[pos + 1]
        if marker in _SOF_HUFFMAN:
            return True
        if marker in _SOF_UNSUPPORTED or marker == 0xD9:
            return False
        size = struct.unpack_from(">H", payload, pos + 2)[0]
        pos += 2 + size
    return False


def jpeg_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """REAL decode of a sequential-Huffman JPEG to a top-down row-major
    RGB byte string."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (width, height, comps) with comps = [(id, h, v, tq)]
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        size = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + size]
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                qtables[tq] = list(body[i : i + 64])
                i += 64
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = body[i + 1 : i + 17]
                n = sum(counts)
                symbols = body[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker in _SOF_HUFFMAN:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (width, height, comps)
            pos += size
        elif marker in _SOF_UNSUPPORTED:
            raise ValueError("progressive/arithmetic/lossless JPEG not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                payload, pos + size, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        if marker not in _SOF_HUFFMAN:
            pos += size
    raise ValueError("JPEG without a scan")


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan,
    qtables,
    huff_dc,
    huff_ac,
    restart_interval: int,
) -> tuple[int, int, bytes]:
    width, height, comps = frame
    if width <= 0 or height <= 0:
        raise ValueError("JPEG with non-positive dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component sample planes at their own resolution
    planes = []
    for _cid, h, v, _tq in comps:
        planes.append(bytearray(mcux * h * 8 * mcuy * v * 8))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                m = r.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing JPEG restart marker")
                pred = [0] * len(comps)
            for ci, (cid, h, v, tq) in enumerate(comps):
                if cid not in scan:
                    raise ValueError("JPEG scan missing a frame component")
                dc_t = huff_dc.get(scan[cid][0])
                ac_t = huff_ac.get(scan[cid][1])
                q = qtables.get(tq)
                if dc_t is None or ac_t is None or q is None:
                    raise ValueError("JPEG scan references an undefined table")
                pw = mcux * h * 8  # plane row stride
                for by in range(v):
                    for bx in range(h):
                        # Huffman-decode one 8x8 block of coefficients
                        t = _decode_symbol(r, dc_t)
                        diff = _extend(r.bits(t), t)
                        pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_t)
                            rrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrr
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(r.bits(ssss), ssss) * q[k]
                            k += 1
                        coef = [0.0] * 64
                        for i in range(64):
                            if zz[i]:
                                coef[ZIGZAG[i]] = float(zz[i])
                        block = _idct_block(coef)
                        x0 = (mx * h + bx) * 8
                        y0 = (my * v + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row0 = (y0 + yy) * pw + x0
                            plane[row0 : row0 + 8] = bytes(block[yy * 8 : yy * 8 + 8])
            n_mcu += 1
    return _planes_to_rgb(width, height, comps, planes, mcux, hmax, vmax)


def _planes_to_rgb(width, height, comps, planes, mcux, hmax, vmax) -> tuple[int, int, bytes]:
    rgb = bytearray(width * height * 3)
    if len(comps) == 1:
        pw = mcux * comps[0][1] * 8
        plane = planes[0]
        for y in range(height):
            for x in range(width):
                g = plane[y * pw + x]
                d = (y * width + x) * 3
                rgb[d] = rgb[d + 1] = rgb[d + 2] = g
        return width, height, bytes(rgb)
    if len(comps) != 3:
        raise ValueError("only grayscale and 3-component YCbCr supported")
    strides = [mcux * c[1] * 8 for c in comps]
    for y in range(height):
        for x in range(width):
            samples = []
            for ci, (_cid, h, v, _tq) in enumerate(comps):
                # nearest-neighbor chroma upsample to full resolution
                sx = x * h // hmax
                sy = y * v // vmax
                samples.append(planes[ci][sy * strides[ci] + sx])
            yy, cb, cr = samples
            rr = yy + 1.402 * (cr - 128)
            gg = yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            bb = yy + 1.772 * (cb - 128)
            d = (y * width + x) * 3
            rgb[d] = 0 if rr < 0 else (255 if rr > 255 else int(rr + 0.5))
            rgb[d + 1] = 0 if gg < 0 else (255 if gg > 255 else int(gg + 0.5))
            rgb[d + 2] = 0 if bb < 0 else (255 if bb > 255 else int(bb + 0.5))
    return width, height, bytes(rgb)
