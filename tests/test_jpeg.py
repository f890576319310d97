"""Baseline-JPEG decoder tests: a minimal matching *encoder* lives here
(FDCT + canonical fixed-length Huffman + byte stuffing), so the decoder
is exercised by genuine entropy-coded streams. With all-ones quant
tables a constant block round-trips bit-exactly (its DCT is a lone
integer DC coefficient); structured images round-trip to within DCT
rounding, pinned with tight tolerances."""

import math
import struct

import pytest

from yckg_spark.operators.jpeg import _IDCT_C, ZIGZAG, is_jpeg, jpeg_rgb


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _fdct(block):
    """Forward 8x8 DCT (exact transpose of the decoder's IDCT basis):
    input natural-order level-shifted samples, output F[v*8+u]."""
    tmp = [
        [sum(block[y * 8 + x] * _IDCT_C[v][y] for y in range(8)) for x in range(8)]
        for v in range(8)
    ]
    return [
        sum(tmp[v][x] * _IDCT_C[u][x] for x in range(8))
        for v in range(8)
        for u in range(8)
    ]


def _cat(v):
    a, t = abs(v), 0
    while a:
        t += 1
        a >>= 1
    return t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self):
        """Byte-align with 1-bits (the spec's padding)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _block_symbols(zz):
    """(dc_category, ac_symbols) the block will need, plus the encoded
    (symbol, extra_bits, n_extra) stream for the AC part."""
    ac = []
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            ac.append((0x00, 0, 0))  # EOB
            break
        while run > 15:
            ac.append((0xF0, 0, 0))  # ZRL
            run -= 16
        v = zz[k]
        t = _cat(v)
        bits = v if v >= 0 else v + (1 << t) - 1
        ac.append(((run << 4) | t, bits, t))
        k += 1
    return ac


def _canonical_fixed(symbols):
    """counts/symbols arrays giving every symbol the same code length
    (enough slots that the all-ones code stays unused), plus the
    symbol→(code, length) map."""
    syms = sorted(set(symbols))
    length = 1
    while (1 << length) < len(syms) + 1:
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return bytes(counts), bytes(syms), {s: (i, length) for i, s in enumerate(syms)}


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _rgb_to_ycbcr(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else int(v + 0.5))
    return clamp(y), clamp(cb), clamp(cr)


def make_jpeg(width, height, rgb_rows, gray=False, sampling=(1, 1), dri=0, qval=1):
    """Assemble a baseline JFIF stream. ``rgb_rows`` is height rows of
    (r,g,b) tuples. ``sampling`` is the luma (h,v) factor (chroma is
    always (1,1)), so (2,2) = 4:2:0. ``qval`` fills both quant tables."""
    hs, vs = (1, 1) if gray else sampling
    hmax, vmax = hs, vs
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # component planes, edge-replicated to the MCU grid
    def plane(get, pw, ph, sw, sh):
        p = [[0] * pw for _ in range(ph)]
        for y in range(ph):
            for x in range(pw):
                p[y][x] = get(min(x, sw - 1), min(y, sh - 1))
        return p

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [
            plane(lambda x, y: rgb_rows[y][x][0], mcux * 8, mcuy * 8, width, height)
        ]
    else:
        ycc = [[_rgb_to_ycbcr(*px) for px in row] for row in rgb_rows]
        comps = [(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [
            plane(lambda x, y: ycc[y][x][0], mcux * hs * 8, mcuy * vs * 8, width, height)
        ]
        # chroma at 1/hs x 1/vs resolution: box-average the full-res samples
        cw, ch = (width + hs - 1) // hs, (height + vs - 1) // vs
        for ci in (1, 2):
            def get(x, y, ci=ci):
                acc = n = 0
                for dy in range(vs):
                    for dx in range(hs):
                        sx, sy = x * hs + dx, y * vs + dy
                        if sx < width and sy < height:
                            acc += ycc[sy][sx][ci]
                            n += 1
                return int(acc / n + 0.5)
            planes.append(plane(get, mcux * 8, mcuy * 8, cw, ch))

    q = [qval] * 64

    # pass 1: quantized zigzag blocks in MCU emission order
    blocks = []  # (comp_index, zz)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_cid, h, v, _tq) in enumerate(comps):
                for by in range(v):
                    for bx in range(h):
                        p = planes[ci]
                        x0, y0 = (mx * h + bx) * 8, (my * v + by) * 8
                        blk = [
                            p[y0 + yy][x0 + xx] - 128
                            for yy in range(8)
                            for xx in range(8)
                        ]
                        f = _fdct(blk)
                        zz = [int(round(f[ZIGZAG[i]] / q[i])) for i in range(64)]
                        blocks.append((ci, zz))

    # pass 2: symbol inventory -> shared Huffman tables (id 0 for all)
    dc_syms, ac_syms = set(), set()
    pred = [0] * len(comps)
    per_mcu = sum(c[1] * c[2] for c in comps)
    for i, (ci, zz) in enumerate(blocks):
        if dri and i % (per_mcu * dri) == 0 and i:
            pred = [0] * len(comps)
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        dc_syms.add(_cat(diff))
        for sym, _b, _t in _block_symbols(zz):
            ac_syms.add(sym)
    dc_counts, dc_symbols, dc_map = _canonical_fixed(dc_syms)
    ac_counts, ac_symbols, ac_map = _canonical_fixed(ac_syms)

    # pass 3: entropy-coded data
    w = _BitWriter()
    pred = [0] * len(comps)
    rst = 0
    for i, (ci, zz) in enumerate(blocks):
        if dri and i and i % (per_mcu * dri) == 0:
            w.pad()
            w.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(comps)
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        t = _cat(diff)
        code, ln = dc_map[t]
        w.write(code, ln)
        if t:
            bits = diff if diff >= 0 else diff + (1 << t) - 1
            w.write(bits, t)
        for sym, bits, nb in _block_symbols(zz):
            code, ln = ac_map[sym]
            w.write(code, ln)
            if nb:
                w.write(bits, nb)
    w.pad()

    out = bytearray(b"\xff\xd8")
    zzq = bytes(q)  # all-equal table: zigzag reorder is the identity
    out += _seg(0xDB, bytes([0x00]) + zzq + bytes([0x01]) + zzq)
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_symbols
                + bytes([0x10]) + ac_counts + ac_symbols)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for cid, _h, _v, _tq in comps:
        sos += bytes([cid, 0x00])  # dc table 0, ac table 0 for everyone
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _gray_rows(width, height, fn):
    return [[(fn(x, y),) * 3 for x in range(width)] for y in range(height)]


def test_jpeg_gray_constant_exact():
    """A constant grayscale image is a lone integer DC coefficient per
    block with q=1 — the decode is bit-exact."""
    jp = make_jpeg(16, 8, _gray_rows(16, 8, lambda x, y: 77), gray=True)
    assert is_jpeg(jp)
    w, h, rgb = jpeg_rgb(jp)
    assert (w, h) == (16, 8)
    assert rgb == bytes([77] * (16 * 8 * 3))


def test_jpeg_gray_gradient_close():
    """Non-multiple-of-8 dims (edge-replicated padding, cropped decode)
    and real AC coefficients: q=1 round-trip within DCT rounding."""
    jp = make_jpeg(10, 6, _gray_rows(10, 6, lambda x, y: 20 * x + 10 * y), gray=True)
    w, h, rgb = jpeg_rgb(jp)
    assert (w, h) == (10, 6)
    for y in range(6):
        for x in range(10):
            assert abs(rgb[(y * 10 + x) * 3] - (20 * x + 10 * y)) <= 1


def test_jpeg_color_444():
    """Solid-color 4:4:4 blocks: exact through the DCT, so the only
    error is the YCbCr round-trip rounding (<= 2 per channel)."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 64, 32)]
    rows = [
        [colors[(x // 8 + y // 8) % 4] for x in range(16)] for y in range(16)
    ]
    jp = make_jpeg(16, 16, rows)
    w, h, rgb = jpeg_rgb(jp)
    assert (w, h) == (16, 16)
    for y in range(16):
        for x in range(16):
            want = colors[(x // 8 + y // 8) % 4]
            got = rgb[(y * 16 + x) * 3 : (y * 16 + x) * 3 + 3]
            assert all(abs(a - b) <= 2 for a, b in zip(got, want))


def test_jpeg_420_subsampled():
    """4:2:0 with spatially constant chroma: subsampling is lossless, so
    error stays at YCbCr rounding even through the 2x2 luma MCUs."""
    # one hue, luma varying by 8x8 block -> chroma constant per image
    rows = [
        [(200 if (x // 8) % 2 else 80,) * 3 for x in range(32)] for y in range(16)
    ]
    jp = make_jpeg(32, 16, rows, sampling=(2, 2))
    w, h, rgb = jpeg_rgb(jp)
    assert (w, h) == (32, 16)
    for y in range(16):
        for x in range(32):
            want = 200 if (x // 8) % 2 else 80
            got = rgb[(y * 32 + x) * 3 : (y * 32 + x) * 3 + 3]
            assert all(abs(c - want) <= 2 for c in got)


def test_jpeg_restart_markers():
    """DRI=1 inserts an RSTn between every MCU; the decoder must realign
    and reset DC predictors, reproducing the no-DRI decode exactly."""
    rows = _gray_rows(24, 8, lambda x, y: (x * 11 + y * 3) % 256)
    plain = jpeg_rgb(make_jpeg(24, 8, rows, gray=True))
    with_rst = jpeg_rgb(make_jpeg(24, 8, rows, gray=True, dri=1))
    assert with_rst == plain


def test_jpeg_coarse_quantization_still_decodes():
    """qval=16: lossy for real. The decode must stay within the
    worst-case quantization bound for a smooth ramp."""
    rows = _gray_rows(8, 8, lambda x, y: 8 * x + 100)
    w, h, rgb = jpeg_rgb(make_jpeg(8, 8, rows, gray=True, qval=16))
    for y in range(8):
        for x in range(8):
            assert abs(rgb[(y * 8 + x) * 3] - (8 * x + 100)) <= 24


def test_is_jpeg_rejects_progressive_and_junk():
    rows = _gray_rows(8, 8, lambda x, y: 10)
    good = make_jpeg(8, 8, rows, gray=True)
    assert is_jpeg(good)
    # flip SOF0 (0xC0) to SOF2 (0xC2 progressive)
    i = good.index(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    assert not is_jpeg(prog)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_rgb(prog)
    assert not is_jpeg(b"\xff\xd8-fake-2")
    with pytest.raises(ValueError):
        jpeg_rgb(good[: len(good) // 2] + b"\xff\xd9")


def test_jpeg_in_spark_and_resample(spark):
    """fake=False feature extraction and the real resample both accept
    JPEG payloads; stats match the direct decode at float32 precision."""
    from yckg_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _rgb_stats,
        decode_jpeg,
        extract_features,
        is_bmp,
        resize_images,
    )

    rows = [
        [((x * 16) % 256, (y * 32) % 256, 90) for x in range(16)] for y in range(16)
    ]
    jp = make_jpeg(16, 16, rows)
    media = spark.createDataFrame(
        [("j1", "image", "image/jpeg", jp, 16, 16, None)], MEDIA_SCHEMA
    )
    feat = extract_features(media, fake=False).collect()[0]
    assert list(feat["feature"]) == pytest.approx(decode_jpeg(jp)[2], rel=1e-6)
    resized = resize_images(media, max_side=8, fake=False).collect()[0]
    assert (resized["width"], resized["height"]) == (8, 8)
    assert is_bmp(bytes(resized["payload"]))
