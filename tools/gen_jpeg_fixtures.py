#!/usr/bin/env python3
"""Author fixtures/images_jpeg/*.jpg and
fixtures/images_jpeg_expected.parquet — the q359/q360 JPEG perceptual
image-dedup oracle.

Discipline (gen_png_fixtures.py's, adapted to a LOSSY format): the
pixels that matter are the ones a decoder RECONSTRUCTS, so the
expected hash is computed by this script's own INDEPENDENT baseline
JPEG decoder (marker walk → Huffman decode → dequantize → the shared
integer IDCT below) over the bytes it wrote — never by the Spark
decoder. The Scala side (graft.ext.Jpeg.parseJpegDHash) implements
the same written spec independently; hash equality certifies both.

SHARED DECODE SPEC (implemented twice, here and in Jpeg.scala):
  - Baseline sequential DCT (SOF0), 8-bit precision, 1 component
    (grayscale) or 3 (YCbCr), Y must carry the max sampling factors,
    factors in {1, 2}; one scan covering all frame components (or the
    single component); DRI/RSTn honored (byte-align, reset DC preds).
  - Entropy decode ALL components (the bitstream interleaves them)
    but IDCT ONLY component 0 (Y) — dHash needs luma alone; luma of a
    reconstructed Y sample g is g*1000 (the r=g=b case of the shared
    cell spec).
  - INTEGER IDCT, bit-exact by construction: with the 64-entry basis
    table A[u][x] = round(C(u)·cos((2x+1)uπ/16)/2 · 8192), C(0)=1/√2
    else 1 (the literal table below, PINNED in both implementations):
      S(x,y) = Σ_u Σ_v A[u][x]·A[v][y]·F(u,v)   (64-bit exact)
      sample  = clamp(((S + 2^25) >> 26) + 128, 0, 255)
    (">>" is an arithmetic/floor shift in both languages.)
  - Out of contract (decoder SKIPS the file): SOF1/SOF2/SOF9+
    (progressive/extended/arithmetic), 12-bit precision, 16-bit DQT
    entries, sampling factors outside {1,2}, Y not at max factors,
    truncated entropy data, missing EOI scan structure, sub-grid
    images (w<9 or h<8 — the shared rule).

The ENCODER here is free to use float math (the file is the fixture;
only DECODE must be bit-exact across implementations). Huffman tables
are built canonical-from-frequencies with the libjpeg dummy-symbol
trick (reserves the all-ones code), so the decoders' generic DHT
paths are load-bearing — no Annex-K shortcut.
"""
import math
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images_jpeg"
EXPECTED = "/root/repo/fixtures/images_jpeg_expected.parquet"
W = H = 64

# ── the shared integer-IDCT basis (PINNED; Jpeg.scala mirrors it) ──
A = [
    [2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896],
    [4017, 3406, 2276, 799, -799, -2276, -3406, -4017],
    [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784],
    [3406, -799, -4017, -2276, 2276, 4017, 799, -3406],
    [2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896],
    [2276, -4017, 799, 3406, -3406, -799, 4017, -2276],
    [1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567],
    [799, -2276, 3406, -4017, 4017, -3406, 2276, -799],
]
# regenerate and assert — the literals must never drift from the formula
for u in range(8):
    cu = (1 / math.sqrt(2)) if u == 0 else 1.0
    for x in range(8):
        assert A[u][x] == round(cu * math.cos((2 * x + 1) * u * math.pi / 16)
                                / 2 * 8192), (u, x)

# zigzag: natural index of the k-th coefficient in scan order,
# generated algorithmically (no transcription risk)
def make_zigzag():
    order, r, c, up = [], 0, 0, True
    for _ in range(64):
        order.append(r * 8 + c)
        if up:
            if c == 7: r += 1; up = False
            elif r == 0: c += 1; up = False
            else: r -= 1; c += 1
        else:
            if r == 7: c += 1; up = True
            elif c == 0: r += 1; up = True
            else: r += 1; c -= 1
    return order

ZZ = make_zigzag()
assert ZZ[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24] and len(set(ZZ)) == 64

# quant tables (natural order), gentle — high quality keeps the
# perceptual geometry of the shared luma formulas intact
QLUM = [[2 + r + c for c in range(8)] for r in range(8)]
QCHR = [[8] * 8 for _ in range(8)]


def fdct_quant(block, q):
    """float forward DCT + quantize; encoder-side only."""
    out = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            cv = (1 / math.sqrt(2)) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (block[y][x] - 128) * \
                        math.cos((2 * x + 1) * u * math.pi / 16) * \
                        math.cos((2 * y + 1) * v * math.pi / 16)
            out[v][u] = int(round(0.25 * cu * cv * s / q[v][u]))
    return out


def idct_int(coef):
    """THE SHARED SPEC: integer IDCT over dequantized coefficients
    coef[v][u] (natural order)."""
    px = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0
            for u in range(8):
                for v in range(8):
                    s += A[u][x] * A[v][y] * coef[v][u]
            px[y][x] = max(0, min(255, ((s + (1 << 25)) >> 26) + 128))
    return px


# ── Huffman: canonical from frequencies, 16-bit cap, all-ones code
# reserved via the dummy-symbol trick ──
def build_huffman(freqs):
    """freqs: {symbol: count}. Returns (bits[1..16], symbol list in
    code order, {symbol: (code, length)})."""
    import heapq
    DUMMY = 256
    # real counts scaled x2 so the dummy is UNIQUELY smallest: it then
    # merges first, lands at MAX depth, sorts last there (256 > any
    # real symbol), and owns the all-ones code — droppable without
    # leaving a canonical gap (a tied dummy at a shallower depth left
    # a gap the decoder's canonical reconstruction collapsed — the
    # encoder/decoder code mismatch this comment memorializes)
    items = [(2 * c, s) for s, c in freqs.items() if c > 0] + [(1, DUMMY)]
    heap = [(c, i, [s]) for i, (c, s) in enumerate(sorted(items))]
    heapq.heapify(heap)
    depth = {s: 0 for _, _, ss in heap for s in ss}
    nxt = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, nxt, s1 + s2))
        nxt += 1
    if len(freqs) == 0:
        raise ValueError("empty huffman")
    if len(depth) == 1:  # single real symbol + dummy impossible here
        depth = {list(depth)[0]: 1}
    assert max(depth.values()) <= 16, "code too deep; re-tune tables"
    # canonical: sort by (length, symbol); dummy (256) sorts LAST among
    # its length class, so it owns the all-ones code — then drop it
    order = sorted(depth.items(), key=lambda kv: (kv[1], kv[0]))
    codes, code, prev_len = {}, 0, 0
    for sym, ln in order:
        code <<= (ln - prev_len)
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    codes.pop(DUMMY, None)
    bits = [0] * 17
    for sym, (c, ln) in codes.items():
        bits[ln] += 1
    vals = [s for s, _ in sorted(codes.items(),
                                 key=lambda kv: (kv[1][1], kv[1][0]))]
    return bits[1:], vals, codes


def mag_cat(v):
    """JPEG magnitude category + the appended bits."""
    if v == 0:
        return 0, 0
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def align(self):  # pad with 1s to a byte boundary
        while self.n:
            self.put(1, 1)


def blocks_of(plane, bw, bh):
    """Split a 2D plane (list of rows) into 8x8 blocks, edge-replicated."""
    h, w = len(plane), len(plane[0])
    out = {}
    for by in range(bh):
        for bx in range(bw):
            blk = [[plane[min(by * 8 + y, h - 1)][min(bx * 8 + x, w - 1)]
                    for x in range(8)] for y in range(8)]
            out[(bx, by)] = blk
    return out


def encode_jpeg(w, h, comps, dri=0):
    """comps: list of (plane, (Hf, Vf), qtable, qid). Component 0 is Y.
    Single interleaved scan (or single-component scan when len==1)."""
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    # per-component quantized blocks
    qblocks, bdims = [], []
    for plane, (hf, vf), q, _ in comps:
        cw = -(-w * hf // hmax)
        chh = -(-h * vf // vmax)
        bw, bh = -(-cw // 8), -(-chh // 8)
        # pad plane to component size by edge replication
        p = [[plane[min(y, len(plane) - 1)][min(x, len(plane[0]) - 1)]
              for x in range(cw)] for y in range(chh)]
        qblocks.append({k: [r[:] for r in fdct_quant(b, q)]
                        for k, b in blocks_of(p, bw, bh).items()})
        bdims.append((bw, bh))

    interleaved = len(comps) > 1
    if interleaved:
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        # MCU block-dims per component: mcux*Hf wide (may exceed bw — pad)
        for ci, (_, (hf, vf), _, _) in enumerate(comps):
            for by in range(mcuy * vf):
                for bx in range(mcux * hf):
                    if (bx, by) not in qblocks[ci]:
                        qblocks[ci][(bx, by)] = [[0] * 8 for _ in range(8)]

    def mcu_stream():
        """yields (comp_index, block) in scan order, with restart cuts."""
        if interleaved:
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and n and n % dri == 0:
                        yield ("RST", None)
                    n += 1
                    for ci, (_, (hf, vf), _, _) in enumerate(comps):
                        for v in range(vf):
                            for hh in range(hf):
                                yield (ci, qblocks[ci][(mx * hf + hh,
                                                        my * vf + v)])
        else:
            bw, bh = bdims[0]
            n = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and n and n % dri == 0:
                        yield ("RST", None)
                    n += 1
                    yield (0, qblocks[0][(bx, by)])

    # pass 1: symbol stats (tables per class: 0 = luma/comp0, 1 = chroma)
    def tclass(ci):
        return 0 if ci == 0 else 1

    dcf = [{}, {}]
    acf = [{}, {}]
    pred = [0] * len(comps)
    for ci, blk in mcu_stream():
        if ci == "RST":
            pred = [0] * len(comps)
            continue
        zz = [blk[ZZ[k] // 8][ZZ[k] % 8] for k in range(64)]
        t = tclass(ci)
        d = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s, _ = mag_cat(d)
        dcf[t][s] = dcf[t].get(s, 0) + 1
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                acf[t][0xF0] = acf[t].get(0xF0, 0) + 1
                run -= 16
            s, _ = mag_cat(zz[k])
            sym = (run << 4) | s
            acf[t][sym] = acf[t].get(sym, 0) + 1
            run = 0
        if run:
            acf[t][0x00] = acf[t].get(0x00, 0) + 1

    ncls = 1 if len(comps) == 1 else 2
    dct = [build_huffman(dcf[t]) for t in range(ncls)]
    act = [build_huffman(acf[t]) for t in range(ncls)]

    # pass 2: entropy-coded data
    bwriter = BitWriter()
    pred = [0] * len(comps)
    rstn = 0
    for ci, blk in mcu_stream():
        if ci == "RST":
            bwriter.align()
            bwriter.out += bytes([0xFF, 0xD0 + (rstn % 8)])
            rstn += 1
            pred = [0] * len(comps)
            continue
        zz = [blk[ZZ[k] // 8][ZZ[k] % 8] for k in range(64)]
        t = tclass(ci)
        d = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s, extra = mag_cat(d)
        c, ln = dct[t][2][s]
        bwriter.put(c, ln)
        if s:
            bwriter.put(extra, s)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                c, ln = act[t][2][0xF0]
                bwriter.put(c, ln)
                run -= 16
            s, extra = mag_cat(zz[k])
            c, ln = act[t][2][(run << 4) | s]
            bwriter.put(c, ln)
            bwriter.put(extra, s)
            run = 0
        if run:
            c, ln = act[t][2][0x00]
            bwriter.put(c, ln)
    bwriter.align()

    # ── container ──
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    def dqt(tid, q):
        zz = bytes(q[ZZ[k] // 8][ZZ[k] % 8] for k in range(64))
        return seg(0xDB, bytes([tid]) + zz)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, QLUM)
    if len(comps) > 1:
        out += dqt(1, QCHR)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for ci, (_, (hf, vf), _, qid) in enumerate(comps):
        sof += bytes([ci + 1, (hf << 4) | vf, qid])
    out += seg(0xC0, sof)
    for t in range(ncls):
        out += dht(0, t, dct[t][0], dct[t][1])
        out += dht(1, t, act[t][0], act[t][1])
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        t = tclass(ci)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwriter.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ───────────────────── independent DECODER (the oracle side) ─────────
class BitReader:
    def __init__(self, data, pos):
        self.d, self.p, self.acc, self.n = data, pos, 0, 0

    def bit(self):
        if self.n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                m = self.d[self.p]
                if m == 0x00:
                    self.p += 1
                else:
                    raise EOFError("marker in entropy data")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_rst(self):
        self.n = 0
        assert self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7
        self.p += 2


def huff_decode_table(bits, vals):
    """(code, length) -> symbol map."""
    table, code, vi = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(code, ln)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def read_sym(br, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if (code, ln) in table:
            return table[(code, ln)]
    raise ValueError("bad huffman code")


def extend(v, t):
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_luma(b):
    """Independent baseline decode → (w, h, Y rows). Raises on
    out-of-contract input (the generator only calls it on in-contract
    fixtures)."""
    assert b[:2] == b"\xff\xd8"
    p = 2
    qt, hufdc, hufac = {}, {}, {}
    w = h = None
    comps = []  # (cid, hf, vf, tq)
    dri = 0
    scomp = None
    while p < len(b):
        assert b[p] == 0xFF
        m = b[p + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", b[p + 2:p + 4])[0]
        pay = b[p + 4:p + 2 + ln]
        if m == 0xDB:
            i = 0
            while i < len(pay):
                pq, tq = pay[i] >> 4, pay[i] & 15
                assert pq == 0
                tab = [0] * 64
                for k in range(64):
                    tab[ZZ[k]] = pay[i + 1 + k]
                qt[tq] = tab
                i += 65
        elif m == 0xC0:
            assert pay[0] == 8
            h, w = struct.unpack(">HH", pay[1:5])
            nf = pay[5]
            for ci in range(nf):
                o = 6 + 3 * ci
                comps.append((pay[o], pay[o + 1] >> 4, pay[o + 1] & 15,
                              pay[o + 2]))
        elif m == 0xC4:
            i = 0
            while i < len(pay):
                tc, th = pay[i] >> 4, pay[i] & 15
                bits = list(pay[i + 1:i + 17])
                nv = sum(bits)
                vals = list(pay[i + 17:i + 17 + nv])
                (hufdc if tc == 0 else hufac)[th] = \
                    huff_decode_table(bits, vals)
                i += 17 + nv
        elif m == 0xDD:
            dri = struct.unpack(">H", pay)[0]
        elif m == 0xDA:
            ns = pay[0]
            scomp = [(pay[1 + 2 * i], pay[2 + 2 * i] >> 4,
                      pay[2 + 2 * i] & 15) for i in range(ns)]
            p = p + 2 + ln
            break
        p = p + 2 + ln

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    ybw, ybh = -(-w // 8), -(-h // 8)
    ypix = [[0] * (ybw * 8) for _ in range(ybh * 8)]
    br = BitReader(b, p)
    pred = {c[0]: 0 for c in comps}

    def decode_block(cid, td, ta):
        s = read_sym(br, hufdc[td])
        diff = extend(br.bits(s), s) if s else 0
        pred[cid] += diff
        zz = [0] * 64
        zz[0] = pred[cid]
        k = 1
        while k < 64:
            sym = read_sym(br, hufac[ta])
            if sym == 0x00:
                break
            r, s = sym >> 4, sym & 15
            if sym == 0xF0:
                k += 16
                continue
            k += r
            zz[k] = extend(br.bits(s), s)
            k += 1
        return zz

    def place_y(bx, by, zz, tq):
        coef = [[0] * 8 for _ in range(8)]
        for k in range(64):
            nat = ZZ[k]
            coef[nat // 8][nat % 8] = zz[k] * qt[tq][nat]
        px = idct_int(coef)
        for y in range(8):
            for x in range(8):
                ypix[by * 8 + y][bx * 8 + x] = px[y][x]

    interleaved = len(scomp) > 1
    n = 0
    if interleaved:
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and n and n % dri == 0:
                    br.align_to_rst()
                    for k in pred:
                        pred[k] = 0
                n += 1
                for (cid, td, ta) in scomp:
                    _, hf, vf, tq = next(c for c in comps if c[0] == cid)
                    for v in range(vf):
                        for hh in range(hf):
                            zz = decode_block(cid, td, ta)
                            if cid == comps[0][0]:
                                bx, by = mx * hf + hh, my * vf + v
                                if bx < ybw and by < ybh:
                                    place_y(bx, by, zz, tq)
    else:
        cid, td, ta = scomp[0]
        tq = comps[0][3]
        for by in range(ybh):
            for bx in range(ybw):
                if dri and n and n % dri == 0:
                    br.align_to_rst()
                    for k in pred:
                        pred[k] = 0
                n += 1
                place_y(bx, by, decode_block(cid, td, ta), tq)
    return w, h, [row[:w] for row in ypix[:h]]


# ═══════════════ PROGRESSIVE (SOF2) — round 18 ═══════════════
# Spectral selection + successive approximation per ITU T.81 annex G
# (the libjpeg formulation). The progression re-orders ENTROPY only:
# the reconstructed coefficients equal the baseline ones exactly once
# every band is refined to Al=0, so a progressive re-encode of a
# baseline fixture is a DISTANCE-0 cluster member (asserted below).
#
# Point transforms: DC uses an ARITHMETIC shift (>> Al, floor); AC
# shifts the MAGNITUDE (abs(v) >> Al, toward zero) with the sign kept
# aside — the refinement correction bits then converge exactly.

def encode_jpeg_progressive(w, h, comps, script, stats=None):
    """comps as encode_jpeg; script: list of (comp_ids, Ss, Se, Ah, Al).
    DC scans (Ss==0) may interleave several components; AC scans are
    single-component (T.81 G.1.1.1). One DHT right before each SOS
    that needs a table; no DRI (out of the progressive contract).
    `stats` counts the load-bearing symbol classes so a fixture can
    ASSERT it exercises them (the lzw_stats discipline)."""
    def bump(key):
        if stats is not None:
            stats[key] = stats.get(key, 0) + 1
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    qblocks, bdims = [], []
    for plane, (hf, vf), q, _ in comps:
        cw = -(-w * hf // hmax)
        chh = -(-h * vf // vmax)
        bw, bh = -(-cw // 8), -(-chh // 8)
        p = [[plane[min(y, len(plane) - 1)][min(x, len(plane[0]) - 1)]
              for x in range(cw)] for y in range(chh)]
        qblocks.append({k: [r[:] for r in fdct_quant(b, q)]
                        for k, b in blocks_of(p, bw, bh).items()})
        bdims.append((bw, bh))
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for ci, (_, (hf, vf), _, _) in enumerate(comps):
        for by in range(mcuy * vf):
            for bx in range(mcux * hf):
                if (bx, by) not in qblocks[ci]:
                    qblocks[ci][(bx, by)] = [[0] * 8 for _ in range(8)]

    def zz_of(blk):
        return [blk[ZZ[k] // 8][ZZ[k] % 8] for k in range(64)]

    pred = [0] * len(comps)  # DC predictors persist across scans? NO:
    # each DC scan resets its own predictors (one first scan per
    # component in a valid script, so a plain reset per scan is exact)

    def scan_blocks(comp_ids):
        """block iteration order for this scan (T.81: MCU order when
        interleaved, the component's OWN grid when single)."""
        if len(comp_ids) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_ids:
                        _, (hf, vf), _, _ = comps[ci]
                        for v in range(vf):
                            for hh in range(hf):
                                yield ci, (mx * hf + hh, my * vf + v)
        else:
            ci = comp_ids[0]
            bw, bh = bdims[ci]
            for by in range(bh):
                for bx in range(bw):
                    yield ci, (bx, by)

    def encode_scan(comp_ids, Ss, Se, Ah, Al):
        """Returns (events, uses_dc_table, uses_ac_table): events are
        ('sym', ci, s) and ('bits', v, n) in emission order."""
        events = []

        def sym(ci, s):
            events.append(("sym", ci, s))

        def bits(v, n):
            if n:
                events.append(("bits", v, n))

        if Ss == 0:  # ── DC scan ──
            assert Se == 0
            if Ah == 0:
                for ci in comp_ids:
                    pred[ci] = 0
                for ci, key in scan_blocks(comp_ids):
                    v = zz_of(qblocks[ci][key])[0] >> Al  # arithmetic
                    diff = v - pred[ci]
                    pred[ci] = v
                    s, extra = mag_cat(diff)
                    sym(ci, s)
                    bits(extra, s)
                return events, True, False
            for ci, key in scan_blocks(comp_ids):  # DC refinement
                bits((zz_of(qblocks[ci][key])[0] >> Al) & 1, 1)
            return events, False, False

        # ── AC scan: single component ──
        assert len(comp_ids) == 1 and Ss >= 1
        ci = comp_ids[0]
        eobrun = 0
        pend = []  # correction bits pending behind the open EOB run

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun > 0:
                nb = eobrun.bit_length() - 1
                if eobrun > 1:
                    bump("eob_run_gt1")
                if pend:
                    bump("pend_bits_behind_eob")
                sym(ci, nb << 4)
                bits(eobrun - (1 << nb), nb)
                for bb in pend:
                    bits(bb, 1)
                eobrun, pend = 0, []

        if Ah == 0:  # first pass over this band
            for _, key in scan_blocks(comp_ids):
                zz = zz_of(qblocks[ci][key])
                r = 0
                for k in range(Ss, Se + 1):
                    v = zz[k]
                    t = abs(v) >> Al
                    if t == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        sym(ci, 0xF0)
                        r -= 16
                        bump("zrl_first")
                    s, extra = mag_cat(t if v > 0 else -t)
                    sym(ci, (r << 4) | s)
                    bits(extra, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            return events, False, True

        # AC refinement (the libjpeg encode_mcu_AC_refine shape)
        for _, key in scan_blocks(comp_ids):
            zz = zz_of(qblocks[ci][key])
            t = [abs(zz[k]) >> Al for k in range(Ss, Se + 1)]
            eob_idx = -1
            for j, tv in enumerate(t):
                if tv == 1:
                    eob_idx = j
            r = 0
            br = []
            for j, tv in enumerate(t):
                if tv == 0:
                    r += 1
                    continue
                while r > 15 and j <= eob_idx:
                    flush_eob()
                    sym(ci, 0xF0)
                    r -= 16
                    bump("zrl_refine")
                    for bb in br:
                        bits(bb, 1)
                    br = []
                if tv > 1:  # history coefficient: one correction bit
                    br.append(tv & 1)
                    bump("refine_history")
                    continue
                flush_eob()
                bump("refine_new")
                sym(ci, (r << 4) | 1)
                bits(1 if zz[Ss + j] > 0 else 0, 1)
                for bb in br:
                    bits(bb, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return events, False, True

    # ── container ──
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    qids = sorted({c[3] for c in comps})
    for qid in qids:
        q = next(c[2] for c in comps if c[3] == qid)
        zzq = bytes(q[ZZ[k] // 8][ZZ[k] % 8] for k in range(64))
        out += seg(0xDB, bytes([qid]) + zzq)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for ci, (_, (hf, vf), _, qid) in enumerate(comps):
        sof += bytes([ci + 1, (hf << 4) | vf, qid])
    out += seg(0xC2, sof)  # SOF2: progressive
    for comp_ids, Ss, Se, Ah, Al in script:
        events, use_dc, use_ac = encode_scan(comp_ids, Ss, Se, Ah, Al)
        # per-scan canonical tables from this scan's own symbol stats;
        # component ci uses table id min(ci,1) of the scan's class
        codes = {}
        if use_dc or use_ac:
            tc = 0 if use_dc else 1
            freqs = {}
            for ev in events:
                if ev[0] == "sym":
                    tid = min(ev[1], 1)
                    freqs.setdefault(tid, {})
                    freqs[tid][ev[2]] = freqs[tid].get(ev[2], 0) + 1
            for tid, fr in sorted(freqs.items()):
                hbits, hvals, hcodes = build_huffman(fr)
                out += seg(0xC4, bytes([(tc << 4) | tid]) + bytes(hbits)
                           + bytes(hvals))
                codes[tid] = hcodes
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = min(ci, 1)
            td = tid if Ss == 0 and Ah == 0 else 0
            ta = tid if Ss > 0 else 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += seg(0xDA, sos)
        bw = BitWriter()
        for ev in events:
            if ev[0] == "sym":
                c, ln = codes[min(ev[1], 1)][ev[2]]
                bw.put(c, ln)
            else:
                bw.put(ev[1], ev[2])
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_luma_prog(b):
    """Independent SOF2 decoder (the oracle side): full coefficient
    accumulation across scans for EVERY component, then the shared
    integer IDCT on Y. Raises on malformed input."""
    assert b[:2] == b"\xff\xd8"
    p = 2
    qt, hufdc, hufac = {}, {}, {}
    w = h = None
    comps = []
    coef = []  # per comp: {(bx,by): [64 coefficients, natural order]}
    bdims = []
    eoi = False
    while not eoi:
        assert b[p] == 0xFF
        m = b[p + 1]
        if m == 0xD9:
            eoi = True
            break
        ln = struct.unpack(">H", b[p + 2:p + 4])[0]
        pay = b[p + 4:p + 2 + ln]
        nxt = p + 2 + ln
        if m == 0xDB:
            i = 0
            while i < len(pay):
                tq = pay[i] & 15
                tab = [0] * 64
                for k in range(64):
                    tab[ZZ[k]] = pay[i + 1 + k]
                qt[tq] = tab
                i += 65
        elif m == 0xC2:
            assert pay[0] == 8
            h, w = struct.unpack(">HH", pay[1:5])
            nf = pay[5]
            hmax = vmax = 1
            for ci in range(nf):
                o = 6 + 3 * ci
                comps.append((pay[o], pay[o + 1] >> 4, pay[o + 1] & 15,
                              pay[o + 2]))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, hf, vf, _ in comps:
                cw = -(-w * hf // hmax)
                chh = -(-h * vf // vmax)
                bw_, bh_ = -(-cw // 8), -(-chh // 8)
                bdims.append((bw_, bh_))
                coef.append({})
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        elif m == 0xC4:
            i = 0
            while i < len(pay):
                tc, th = pay[i] >> 4, pay[i] & 15
                hbits = list(pay[i + 1:i + 17])
                nv = sum(hbits)
                vals = list(pay[i + 17:i + 17 + nv])
                (hufdc if tc == 0 else hufac)[th] = \
                    huff_decode_table(hbits, vals)
                i += 17 + nv
        elif m == 0xDA:
            ns = pay[0]
            scomp = [(pay[1 + 2 * i] - 1, pay[2 + 2 * i] >> 4,
                      pay[2 + 2 * i] & 15) for i in range(ns)]
            Ss, Se, AhAl = pay[1 + 2 * ns:4 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 15
            br = BitReader(b, nxt)
            eobrun = 0

            def blk(ci, key):
                return coef[ci].setdefault(key, [0] * 64)

            def blocks(ids):
                if len(ids) > 1:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for ci in ids:
                                _, hf, vf, _ = comps[ci]
                                for v in range(vf):
                                    for hh in range(hf):
                                        yield ci, (mx * hf + hh,
                                                   my * vf + v)
                else:
                    ci = ids[0]
                    bw_, bh_ = bdims[ci]
                    for by in range(bh_):
                        for bx in range(bw_):
                            yield ci, (bx, by)

            ids = [s[0] for s in scomp]
            tds = {s[0]: s[1] for s in scomp}
            tas = {s[0]: s[2] for s in scomp}
            if Ss == 0:
                assert Se == 0
                predl = {ci: 0 for ci in ids}
                for ci, key in blocks(ids):
                    cb = blk(ci, key)
                    if Ah == 0:
                        s = read_sym(br, hufdc[tds[ci]])
                        diff = extend(br.bits(s), s) if s else 0
                        predl[ci] += diff
                        cb[0] = predl[ci] << Al
                    else:
                        if br.bit():
                            cb[0] |= (1 << Al)
            else:
                assert len(ids) == 1
                ci = ids[0]
                tab = hufac[tas[ci]]
                p1, m1 = (1 << Al), -(1 << Al)
                for _, key in blocks(ids):
                    cb = blk(ci, key)
                    if Ah == 0:  # ── first pass ──
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = Ss
                        while k <= Se:
                            sym = read_sym(br, tab)
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r)
                                if r:
                                    eobrun += br.bits(r)
                                eobrun -= 1
                                break
                            k += r
                            assert k <= Se, "band overrun"
                            cb[ZZ[k]] = extend(br.bits(s), s) << Al
                            k += 1
                    else:  # ── refinement (libjpeg shape) ──
                        k = Ss
                        if eobrun == 0:
                            while k <= Se:
                                sym = read_sym(br, tab)
                                r, s = sym >> 4, sym & 15
                                newval = 0
                                if s:
                                    assert s == 1, "refine s must be 1"
                                    newval = p1 if br.bit() else m1
                                elif r != 15:
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += br.bits(r)
                                    break
                                while k <= Se:
                                    if cb[ZZ[k]] != 0:
                                        if br.bit() and \
                                                (cb[ZZ[k]] & p1) == 0:
                                            cb[ZZ[k]] += p1 \
                                                if cb[ZZ[k]] >= 0 else m1
                                    else:
                                        r -= 1
                                        if r < 0:
                                            break
                                    k += 1
                                if newval:
                                    assert k <= Se, "refine overrun"
                                    cb[ZZ[k]] = newval
                                k += 1
                        if eobrun > 0:
                            while k <= Se:
                                if cb[ZZ[k]] != 0:
                                    if br.bit() and (cb[ZZ[k]] & p1) == 0:
                                        cb[ZZ[k]] += p1 \
                                            if cb[ZZ[k]] >= 0 else m1
                                k += 1
                            eobrun -= 1
            # scan must end cleanly at the next marker
            br.n = 0
            nxt = br.p
            assert b[nxt] == 0xFF and b[nxt + 1] != 0x00, "scan overrun"
            p = nxt
            continue
        p = nxt
    assert eoi
    # reconstruct Y
    ybw, ybh = bdims[0]
    tq = comps[0][3]
    ypix = [[0] * (ybw * 8) for _ in range(ybh * 8)]
    for (bx, by), cb in coef[0].items():
        if bx >= ybw or by >= ybh:
            continue  # interleaved-DC padding blocks
        dq = [[cb[v * 8 + u] * qt[tq][v * 8 + u] for u in range(8)]
              for v in range(8)]
        px = idct_int(dq)
        for y in range(8):
            for x in range(8):
                ypix[by * 8 + y][bx * 8 + x] = px[y][x]
    return w, h, [row[:w] for row in ypix[:h]]


def dhash_rows(w, h, rows):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            cx, cy = x * 9 // w, y * 8 // h
            sums[cy][cx] += 1000 * rows[y][x]
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > \
                    sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


# ─────────────────────────── fixture authoring ───────────────────────
def base_l(k, x, y):
    if k == 0:
        return min(255, 2 * x + y // 8)
    if k == 1:
        return max(0, min(255, 128 - 2 * x + y // 8))
    if k == 2:
        return min(255, 2 * x + y // 8) if (y // 8) % 2 == 0 \
            else max(0, min(255, 128 - 2 * x + y // 8))
    return min(255, 3 * abs(x - 32) + y // 8)


def luma_at(k, near, x, y):
    l = base_l(k, x, y)
    if near and 29 <= x < 36 and 0 <= y < 8:
        l = min(255, l + 40)
    return l


def formula_dhash(lum):
    return dhash_rows(W, H, [[lum(x, y) for x in range(W)]
                             for y in range(H)])


os.makedirs(OUT, exist_ok=True)
rows_out = []  # (name, width, height, dhash)

def author(name, w, h, comps, dri=0):
    data = encode_jpeg(w, h, comps, dri)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)
    dw, dh, rows = decode_jpeg_luma(data)
    assert (dw, dh) == (w, h), name
    hsh = dhash_rows(dw, dh, rows)
    rows_out.append((name, w, h, hsh))
    return hsh

hashes = {}
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.jpg"
        plane = [[luma_at(k, near, x, y) for x in range(W)]
                 for y in range(H)]
        chroma = [[(x * 5 + y * 3) % 256 for x in range(W)]
                  for y in range(H)]
        if k == 0:
            comps, dri = [(plane, (1, 1), QLUM, 0)], 0
        elif k == 1:  # grayscale + restart markers every 2 MCUs
            comps, dri = [(plane, (1, 1), QLUM, 0)], 2
        elif k == 2:  # YCbCr 4:4:4, chroma noise the decoder must skip
            comps, dri = [(plane, (1, 1), QLUM, 0),
                          (chroma, (1, 1), QCHR, 1),
                          (chroma, (1, 1), QCHR, 1)], 0
        else:  # YCbCr 4:2:0 — 4 Y blocks per MCU
            half = [[128 for _ in range(W // 2)] for _ in range(H // 2)]
            comps, dri = [(plane, (2, 2), QLUM, 0),
                          (half, (1, 1), QCHR, 1),
                          (half, (1, 1), QCHR, 1)], 0
        hashes[name] = author(name, W, H, comps, dri)

# a non-multiple-of-8 grayscale (partial edge blocks discarded); the
# quadratic formula (the q220 value-spread lesson) keeps its hash far
# from every planted pattern — a monotone gradient would COLLIDE with
# pattern 0's all-ones hash and pollute the q360 pair set
author("jodd.jpg", 35, 19,
       [([[((x * x + 3 * y) % 17) * 15 for x in range(35)]
          for y in range(19)], (1, 1), QLUM, 0)])


# ── PROGRESSIVE (SOF2) members — round 18. Same planes, same quant
# tables, a different ENTROPY ORDER: once every band refines to Al=0
# the coefficients equal the baseline ones EXACTLY, so prog_k is a
# distance-0 member of cluster k (asserted below, not assumed). ──
def author_prog(name, w, h, comps, script):
    data = encode_jpeg_progressive(w, h, comps, script)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)
    dw, dh, rows = decode_jpeg_luma_prog(data)
    assert (dw, dh) == (w, h), name
    hsh = dhash_rows(dw, dh, rows)
    rows_out.append((name, w, h, hsh))
    return hsh

prog_hashes = {}
for k in range(4):
    plane = [[luma_at(k, False, x, y) for x in range(W)]
             for y in range(H)]
    chroma = [[(x * 5 + y * 3) % 256 for x in range(W)]
              for y in range(H)]
    if k == 0:
        # grayscale, FULL successive approximation on DC and AC
        comps = [(plane, (1, 1), QLUM, 0)]
        script = [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
                  ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0)]
    elif k == 1:
        # grayscale, PURE spectral selection (no successive approx)
        comps = [(plane, (1, 1), QLUM, 0)]
        script = [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0),
                  ([0], 10, 63, 0, 0)]
    elif k == 2:
        # YCbCr 4:4:4 — interleaved DC, Y bands split, CHROMA AC
        # scans INTERLEAVED BETWEEN the Y scans (the Spark decoder
        # must skip them mid-sequence, not just at the tail)
        comps = [(plane, (1, 1), QLUM, 0),
                 (chroma, (1, 1), QCHR, 1),
                 (chroma, (1, 1), QCHR, 1)]
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 1),
                  ([1], 1, 63, 0, 0),
                  ([0], 6, 63, 0, 1),
                  ([2], 1, 63, 0, 0),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([0], 1, 63, 1, 0)]
    else:
        # YCbCr 4:2:0 — interleaved DC over the MCU-PADDED grid but
        # single-component AC scans over Y's OWN (non-padded) grid:
        # the grid-discipline divergence that breaks naive ports
        half = [[128 for _ in range(W // 2)] for _ in range(H // 2)]
        comps = [(plane, (2, 2), QLUM, 0),
                 (half, (1, 1), QCHR, 1),
                 (half, (1, 1), QCHR, 1)]
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([0], 1, 63, 0, 1),
                  ([1], 1, 63, 0, 0),
                  ([0], 1, 63, 1, 0),
                  ([2], 1, 63, 0, 0)]
    prog_hashes[k] = author_prog(f"prog{k}.jpg", W, H, comps, script)

# progressive twin of the odd-dimensioned singleton (partial edge
# blocks on the non-interleaved grid)
author_prog("progodd.jpg", 35, 19,
            [([[((x * x + 3 * y) % 17) * 15 for x in range(35)]
               for y in range(19)], (1, 1), QLUM, 0)],
            [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
             ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0)])

# ZRL-coverage singleton: per-block checkerboard (+/-8 around a
# quadratically varying base) puts ONE strong coefficient at zigzag 63
# behind 62 zeros — the smooth-gradient fixtures never leave a >15-zero
# gap, so the ZRL paths (first pass AND refinement), the refinement's
# new-nonzero placements, history correction bits, and the
# pending-bits-behind-EOBRUN flush were all reachable-but-unexercised
# until this fixture (found by symbol-level coverage probing, round 18)
def zrl_l(x, y):
    base = 60 + (((x // 8) * (x // 8) + 3 * (y // 8)
                  + (x // 8) * (y // 8)) % 23) * 6
    # every other block-row is FLAT: whole-band-zero blocks in runs of
    # 8, so first-pass AND refinement EOB runs exceed 1
    amp = 0 if (y // 8) % 2 == 1 else 8
    return max(0, min(255, base + (amp if (x + y) % 2 == 0 else -amp)))

zrl_stats = {}
zrl_plane = [[zrl_l(x, y) for x in range(W)] for y in range(H)]
zrl_script = [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
              ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0)]
data = encode_jpeg_progressive(W, H, [(zrl_plane, (1, 1), QLUM, 0)],
                               zrl_script, stats=zrl_stats)
with open(f"{OUT}/progzrl.jpg", "wb") as f:
    f.write(data)
dw, dh, zrl_rows = decode_jpeg_luma_prog(data)
assert (dw, dh) == (W, H)
rows_out.append(("progzrl.jpg", W, H, dhash_rows(W, H, zrl_rows)))
# the whole point: every subtle symbol class must actually occur
for key in ("zrl_first", "zrl_refine", "refine_new", "refine_history",
            "eob_run_gt1", "pend_bits_behind_eob"):
    assert zrl_stats.get(key, 0) > 0, (key, zrl_stats)

# post-scan misc segments: T.81 allows COM/APPn between the scan data
# and EOI (a real encoder appending a trailer comment emits exactly
# this); the decoder length-skips them and still requires EOI after
# (round-19 advice fix — the round-18 strict EOI gate dropped such
# legal files). Same entropy bytes as base0, so the expected hash is
# base0's; the independent decode below re-proves it.
ok = open(f"{OUT}/base0.jpg", "rb").read()
postcom = (ok[:-2]
           + b"\xff\xfe" + struct.pack(">H", 10) + b"trailer!"
           + b"\xff\xe9" + struct.pack(">H", 4) + b"zz"
           + b"\xff\xd9")
with open(f"{OUT}/postcom.jpg", "wb") as f:
    f.write(postcom)
dw, dh, pc_rows = decode_jpeg_luma(postcom)
assert (dw, dh) == (W, H)
pc_hash = dhash_rows(dw, dh, pc_rows)
assert pc_hash == hashes["base0.jpg"], "postcom/base0 divergence"
rows_out.append(("postcom.jpg", W, H, pc_hash))
# hostile sibling: a post-scan COM whose declared length overruns the
# file — must SKIP (spec-arm only, never in the expected parquet)
with open(f"{OUT}/postcombad.jpg", "wb") as f:
    f.write(ok[:-2] + b"\xff\xfe\x40\x00short")

# out-of-contract fixtures (decoder must SKIP)
sof_at = ok.index(b"\xff\xc0")
with open(f"{OUT}/progressive.jpg", "wb") as f:  # SOF2
    f.write(ok[:sof_at] + b"\xff\xc2" + ok[sof_at + 2:])
with open(f"{OUT}/arith.jpg", "wb") as f:  # SOF9 (arithmetic)
    f.write(ok[:sof_at] + b"\xff\xc9" + ok[sof_at + 2:])
with open(f"{OUT}/prec12.jpg", "wb") as f:  # 12-bit precision
    body = bytearray(ok)
    body[sof_at + 4] = 12
    f.write(bytes(body))
with open(f"{OUT}/trunc.jpg", "wb") as f:  # entropy data cut mid-flight
    sos_at = ok.index(b"\xff\xda")
    f.write(ok[:sos_at + 40])
with open(f"{OUT}/notjpeg.jpg", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
# sub-grid (w<9): valid baseline bytes, skipped by the shared rule
author("tiny_8x4.jpg", 8, 4,
       [([[7 * x for x in range(8)] for _ in range(4)], (1, 1), QLUM, 0)])
rows_out = [r for r in rows_out if r[0] != "tiny_8x4.jpg"]

# planted-pair geometry + cross-format story (q360): the lossy decode
# must keep each jpeg hash within the banded join's exact-recall band
# of its FORMULA hash, near-pairs within [1,3] of their base, and
# cross-pattern pairs far outside
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    for near in (False, True):
        nm = f"{'near' if near else 'base'}{k}.jpg"
        lum = (lambda kk, nn: lambda x, y: luma_at(kk, nn, x, y))(k, near)
        d = dist(hashes[nm], formula_dhash(lum))
        assert d <= 3, f"{nm}: jpeg-vs-formula dist {d} > 3 (retune Q)"
for k in range(4):
    d = dist(hashes[f"base{k}.jpg"], hashes[f"near{k}.jpg"])
    assert 1 <= d <= 3, f"base{k}/near{k} dist {d} outside [1,3]"
for a in range(4):
    for bq in range(a + 1, 4):
        for sa in ("base", "near"):
            for sb in ("base", "near"):
                d = dist(hashes[f"{sa}{a}.jpg"], hashes[f"{sb}{bq}.jpg"])
                assert d > 3, f"{sa}{a}/{sb}{bq} dist {d} <= 3"
# jodd must not collide into any planted cluster (q360 cleanliness)
jodd = next(r[3] for r in rows_out if r[0] == "jodd.jpg")
for k in range(4):
    for s in ("base", "near"):
        d = dist(jodd, hashes[f"{s}{k}.jpg"])
        assert d > 3, f"jodd vs {s}{k} dist {d} <= 3"

# progressive re-encodes reconstruct the IDENTICAL coefficients, so
# they are EXACT cluster members (distance 0 — stronger than the
# baseline-vs-formula <=3 bound) and progodd pairs exactly with jodd
for k in range(4):
    assert prog_hashes[k] == hashes[f"base{k}.jpg"], \
        f"prog{k}: progressive decode diverges from baseline"
progodd = next(r[3] for r in rows_out if r[0] == "progodd.jpg")
assert progodd == jodd, "progodd/jodd divergence"
# the ZRL singleton joins NO cluster (q370 cleanliness)
progzrl = next(r[3] for r in rows_out if r[0] == "progzrl.jpg")
for k in range(4):
    for s in ("base", "near"):
        d = dist(progzrl, hashes[f"{s}{k}.jpg"])
        assert d > 3, f"progzrl vs {s}{k} dist {d} <= 3"
assert dist(progzrl, jodd) > 3

# hostile progressive arms: DRI under SOF2 (out of contract) and a
# scan cut mid-codes
pdata = open(f"{OUT}/prog0.jpg", "rb").read()
sof2_at = pdata.index(b"\xff\xc2")
with open(f"{OUT}/progdri.jpg", "wb") as f:
    dri = b"\xff\xdd\x00\x04\x00\x02"
    f.write(pdata[:sof2_at] + dri + pdata[sof2_at:])
with open(f"{OUT}/progtrunc.jpg", "wb") as f:
    last_sos = pdata.rindex(b"\xff\xda")
    f.write(pdata[:last_sos + 20])

# ═══════════════ EXIF ORIENTATION (tag 274) — round 19 ═══════════════
# Real photo corpora carry capture-time rotation in APP1/EXIF; the
# decoder must hash the UPRIGHT image so a rotated phone photo pairs
# with its upright re-encode at distance 0. Shared spec (implemented
# twice — here and Jpeg.scala): FIRST APP1 "Exif\0\0" wins; IFD0 only
# (an IFD1/thumbnail orientation never rotates the main image); tag
# 274 must be SHORT, count 1, value 1..8 — ANY anomaly ignores the
# TAG (never the file). Upright(x,y) ← stored(sx,sy), stored dims w×h:
#   1 (x,y)  2 (w-1-x,y)  3 (w-1-x,h-1-y)  4 (x,h-1-y)
#   5 (y,x)  6 (y,h-1-x)  7 (w-1-y,h-1-x)  8 (w-1-y,x)
# Distance-0 membership is BY CONSTRUCTION: mirrors flip DCT
# coefficient signs ((-1)^u), transposes transpose them; QLUM = 2+r+c
# is symmetric and python round() is sign-symmetric, so the stored
# encode's reconstruction is exactly the transform of the upright
# reconstruction — asserted below for all 8 values.

def exif_transform(o, w, h, rows):
    """Upright view of a STORED w×h grid per tag-274 value o — the
    generator's INDEPENDENT transform (the oracle side)."""
    uw, uh = (h, w) if o >= 5 else (w, h)
    def src(x, y):
        sx = {2: w-1-x, 3: w-1-x, 5: y, 6: y, 7: w-1-y, 8: w-1-y}.get(o, x)
        sy = {3: h-1-y, 4: h-1-y, 5: x, 6: h-1-x, 7: h-1-x, 8: x}.get(o, y)
        return rows[sy][sx]
    return uw, uh, [[src(x, y) for x in range(uw)] for y in range(uh)]

def inverse_store(o, uw, uh, upright):
    """The stored grid whose exif_transform(o) is `upright` (bijection
    inverted cell-by-cell; sanity-asserted)."""
    w, h = (uh, uw) if o >= 5 else (uw, uh)
    stored = [[None] * w for _ in range(h)]
    for y in range(uh):
        for x in range(uw):
            sx = {2: w-1-x, 3: w-1-x, 5: y, 6: y, 7: w-1-y, 8: w-1-y}.get(o, x)
            sy = {3: h-1-y, 4: h-1-y, 5: x, 6: h-1-x, 7: h-1-x, 8: x}.get(o, y)
            stored[sy][sx] = upright[y][x]
    assert all(v is not None for r in stored for v in r), "not a bijection"
    assert exif_transform(o, w, h, stored)[2] == upright, "inverse slip"
    return w, h, stored

def exif_app1(orientation, little=True, typ=3, lead=True):
    e = "<" if little else ">"
    hdr = (b"II" if little else b"MM") + struct.pack(e + "H", 42) \
        + struct.pack(e + "I", 8)
    entries = []
    if lead:  # an unrelated entry the walker must step past
        entries.append(struct.pack(e + "HHI", 256, 3, 1)
                       + struct.pack(e + "H", 64) + b"\x00\x00")
    if typ == 3:  # SHORT inline: value in the FIRST two slot bytes
        val = struct.pack(e + "H", orientation) + b"\x00\x00"
    else:  # LONG-typed arm (out of the scan's trust — tag ignored)
        val = struct.pack(e + "I", orientation)
    entries.append(struct.pack(e + "HHI", 274, typ, 1) + val)
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) \
        + struct.pack(e + "I", 0)
    pay = b"Exif\x00\x00" + hdr + ifd
    return b"\xff\xe1" + struct.pack(">H", len(pay) + 2) + pay

# a fresh quadratic pattern (the q220 spread rule) so the orientation
# family forms its OWN capstone cluster, colliding with nothing
EXIF_W, EXIF_H = 64, 64
exif_upright = [[((x * x + 5 * y * y + 3 * x) % 23) * 11
                 for x in range(EXIF_W)] for y in range(EXIF_H)]
orients = {}  # name → effective orientation (1 where the tag is ignored)

def author_exif(name, app1s, o_eff, content_o, upright=exif_upright):
    """content_o stores the plane; o_eff is what a CORRECT decoder
    applies (1 for the ignore arms). The expected hash comes from this
    script's independent decode + independent transform."""
    uw0, uh0 = len(upright[0]), len(upright)
    w, h, stored = inverse_store(content_o, uw0, uh0, upright)
    data = encode_jpeg(w, h, [(stored, (1, 1), QLUM, 0)])
    data = data[:2] + b"".join(app1s) + data[2:]
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)
    dw, dh, rows = decode_jpeg_luma(data)
    assert (dw, dh) == (w, h), name
    uw, uh, up = exif_transform(o_eff, dw, dh, rows)
    hsh = dhash_rows(uw, uh, up)
    rows_out.append((name, uw, uh, hsh))
    orients[name] = o_eff
    return hsh

exif_hashes = {}
for o in range(1, 9):
    little = o % 2 == 1
    exif_hashes[o] = author_exif(
        f"exif{o}.jpg", [exif_app1(o, little=little)], o, o)
# DISTANCE 0 ACROSS ALL EIGHT: the whole feature's contract. exif1 is
# the plain upright encode, so equality proves the rotated re-encodes
# reconstruct the transform of the upright reconstruction exactly.
for o in range(2, 9):
    assert exif_hashes[o] == exif_hashes[1], \
        f"exif{o}: oriented re-encode not distance 0 from upright"
# dim-swap + partial-edge-block member: jodd's 35×19 pattern stored
# 19×35 under orientation 6 must land exactly on jodd's hash (the
# stored grid pads 24×40 by edge replication — the transpose of the
# upright pad, so reconstruction still commutes)
jodd_up = [[((x * x + 3 * y) % 17) * 15 for x in range(35)]
           for y in range(19)]
h6 = author_exif("exif6odd.jpg", [exif_app1(6)], 6, 6, upright=jodd_up)
assert h6 == jodd, "exif6odd: dim-swapped member diverged from jodd"
# ignore arms — the tag (not the file) must be skipped; content is
# upright, so a decoder that WRONGLY honors the tag rotates an upright
# image and q359 catches the hash:
#   corrupt TIFF header after Exif\0\0
junk = b"Exif\x00\x00" + b"JUNKJUNKJUNK"
exif_bad = b"\xff\xe1" + struct.pack(">H", len(junk) + 2) + junk
assert author_exif("exifbad.jpg", [exif_bad], 1, 1) == exif_hashes[1]
#   LONG-typed tag 274 (out of the scan's trust)
assert author_exif("exiflong.jpg", [exif_app1(6, typ=3 + 1)], 1, 1) \
    == exif_hashes[1]
#   value 0 (outside 1..8)
assert author_exif("exifzero.jpg", [exif_app1(0)], 1, 1) == exif_hashes[1]
#   two APP1 segments: the FIRST wins (content stored under 3; a
#   last-wins decoder would apply 6 and diverge)
assert author_exif("exifdup.jpg",
                   [exif_app1(3), exif_app1(6)], 3, 3) == exif_hashes[1]
#   orientation only in IFD1 (the thumbnail IFD): IFD0 carries no tag
#   274 but LINKS to an IFD1 that does — must be ignored
e = "<"
ifd1 = struct.pack(e + "H", 1) \
    + struct.pack(e + "HHI", 274, 3, 1) + struct.pack(e + "H", 3) \
    + b"\x00\x00" + struct.pack(e + "I", 0)
ifd0_end = 8 + 2 + 12 + 4  # header + 1-entry IFD0 + next ptr
ifd0 = struct.pack(e + "H", 1) \
    + struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "H", 64) \
    + b"\x00\x00" + struct.pack(e + "I", ifd0_end)
tiff = b"II" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8) \
    + ifd0 + ifd1
pay = b"Exif\x00\x00" + tiff
exif_thumb = b"\xff\xe1" + struct.pack(">H", len(pay) + 2) + pay
assert author_exif("exifthumb.jpg", [exif_thumb], 1, 1) == exif_hashes[1]
# cluster cleanliness: the orientation family collides with nothing
for k in range(4):
    for s in ("base", "near"):
        d = dist(exif_hashes[1], hashes[f"{s}{k}.jpg"])
        assert d > 3, f"exif vs {s}{k} dist {d} <= 3"
assert dist(exif_hashes[1], jodd) > 3 and dist(exif_hashes[1], progzrl) > 3

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, "
    "orientation INT, dhash BIGINT)")
for n, w, h, hsh in rows_out:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?, ?)",
                [n, w, h, orients.get(n, 1), hsh])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(rows_out), "expected rows to", EXPECTED)
for n, w, h, hsh in rows_out:
    print(f"  {n} {w}x{h}: {hsh:#018x}" if hsh >= 0
          else f"  {n} {w}x{h}: -{-hsh:#017x}")
