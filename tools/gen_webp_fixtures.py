#!/usr/bin/env python3
"""Author fixtures/images_webp/*.webp and
fixtures/images_webp_expected.parquet — the q369/q370 WebP-lossless
(VP8L) perceptual image-dedup oracle (the gen_png_fixtures.py
discipline: expected hashes from the formula pixels; the script
independently re-DECODES the bytes it wrote — RIFF walk, prefix-code
reconstruction, LZ77 + color cache — and asserts pixel-exact
provenance before writing the parquet).

SHARED DECODE SPEC (implemented here and in graft.ext.Vp8l
independently — the WebP lossless bitstream, RFC 9649 §3):
  - RIFF/WEBP container with a VP8L chunk (0x2F signature byte);
    lossy VP8 and extended VP8X forms are OUT (skip);
  - LSB-first bit reading; prefix codes canonical, code bits read
    most-significant-first (the DEFLATE convention);
  - SIMPLE prefix codes (1-2 symbols) and NORMAL codes (code-length
    codes with 16/17/18 RLE, kCodeLengthCodeOrder), both load-bearing
    in the fixtures;
  - pixel stream: green symbol < 256 = literal (g, then r, b, a);
    256..279 = LZ77 length prefix + distance code (the 120-entry 2D
    neighbor map, then raw dist-120); >= 280 = color-cache index;
    the cache (hash 0x1e35a7bd, shifted) updates on EVERY emitted
    pixel including copied ones;
  - transforms: SUBTRACT-GREEN is decoded (r+=g, b+=g mod 256);
    predictor / color / color-indexing transforms and a meta prefix
    image (spatially varying codes) are OUT of contract (skip);
  - luma per pixel r*299 + g*587 + b*114 (alpha ignored), the shared
    9x8 dHashOfGrid fold — so a VP8L re-encode of a BMP/PNG/JPEG/GIF/
    TIFF sibling is a DISTANCE-0 member of its cluster.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images_webp"
EXPECTED = "/root/repo/fixtures/images_webp_expected.parquet"
W = H = 64


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


def dhash(lum):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(H):
        for x in range(W):
            cx, cy = x * 9 // W, y * 8 // H
            sums[cy][cx] += 1000 * lum(x, y)
            cnts[cy][cx] += 1
    h = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > sums[cy][cx] * cnts[cy][cx + 1]:
                h |= 1 << (cy * 8 + cx)
    return h - (1 << 64) if h >= (1 << 63) else h


# ── the 120-entry 2D distance map (RFC 9649 §3.4.2.2, verbatim) ──
DIST2D = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(DIST2D) == 120
CLCODE_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                11, 12, 13, 14, 15]
HASH_MUL = 0x1E35A7BD


def prefix_encode(value):
    """LZ77 length/distance prefix coding: value >= 1 ->
    (code, extra_bits_count, extra_bits_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nb = v.bit_length() - 1  # highest bit
    second = (v >> (nb - 1)) & 1
    code = 2 * nb + second
    offset = (2 + second) << (nb - 1)
    return code, nb - 1, value - offset - 1


def prefix_decode_value(code, read):
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + read(extra) + 1


# sanity: prefix coding round-trips on the whole usable range
for v in list(range(1, 300)) + [4096, 40000]:
    c, nb, eb = prefix_encode(v)
    got = prefix_decode_value(c, lambda n: eb if n == nb else 1 / 0)
    assert got == v, (v, c, nb, eb, got)


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):  # LSB-first
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code, length):  # prefix code: MSB of code first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


class BitReader:
    def __init__(self, data):
        self.d, self.p = data, 0

    def read(self, n):  # LSB-first
        v = 0
        for i in range(n):
            byte = self.d[self.p >> 3]
            v |= ((byte >> (self.p & 7)) & 1) << i
            self.p += 1
        return v


def canonical_codes(lengths):
    """DEFLATE-convention canonical codes from lengths (0 = unused)."""
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes, code, prev = {}, 0, 0
    for ln, s in pairs:
        code <<= (ln - prev)
        codes[s] = (code, ln)
        code += 1
        prev = ln
    return codes


def build_lengths(freqs, maxlen):
    """Depth-limited Huffman lengths via the dummy-symbol trick
    (gen_jpeg_fixtures discipline); freqs: {sym: count}."""
    import heapq
    syms = [s for s, c in freqs.items() if c > 0]
    if len(syms) == 0:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    items = sorted((2 * freqs[s], s) for s in syms)
    heap = [(c, i, [s]) for i, (c, s) in enumerate(items)]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    nxt = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, nxt, s1 + s2))
        nxt += 1
    assert max(depth.values()) <= maxlen, "re-tune fixture entropy"
    return depth


class SymWriter:
    """Collects (channel, symbol) + raw-bit events; two-pass emit."""

    def __init__(self):
        self.events = []

    def sym(self, ch, s):
        self.events.append(("s", ch, s))

    def bits(self, v, n):
        if n:
            self.events.append(("b", v, n))


def emit_prefix_code(bw, lengths_list):
    """Emit one prefix code (normal form) for the given per-symbol
    length list. Uses simple form when <= 2 symbols are used."""
    used = [(s, ln) for s, ln in enumerate(lengths_list) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s, _ in used):
        bw.put(1, 1)  # simple code
        bw.put(len(used) - 1, 1)
        s0 = used[0][0]
        if s0 <= 1 and len(used) == 1:
            bw.put(0, 1)  # 1-bit first symbol
            bw.put(s0, 1)
        else:
            bw.put(1, 1)  # 8-bit first symbol
            bw.put(s0, 8)
        if len(used) == 2:
            bw.put(used[1][0], 8)
        return
    bw.put(0, 1)  # normal code
    # RLE the length list into code-length symbols
    rle = []  # (sym, extra_value, extra_bits)
    i = 0
    n = len(lengths_list)
    # trim trailing zeros is NOT done (no max_symbol): emit them via 18s
    while i < n:
        ln = lengths_list[i]
        if ln == 0:
            j = i
            while j < n and lengths_list[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                rle.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                rle.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                rle.append((0, 0, 0))
            i = j
        else:
            rle.append((ln, 0, 0))
            j = i + 1
            run = 0
            while j < n and lengths_list[j] == ln:
                j += 1
                run += 1
            while run >= 3:
                r = min(run, 6)
                rle.append((16, r - 3, 2))
                run -= r
            for _ in range(run):
                rle.append((ln, 0, 0))
            i = j
    clfreq = {}
    for s, _, _ in rle:
        clfreq[s] = clfreq.get(s, 0) + 1
    cldepth = build_lengths(clfreq, 7)
    if len(cldepth) == 1:  # a single code-length symbol still needs 1 bit
        cldepth = {list(cldepth)[0]: 1}
    clcodes = canonical_codes(
        [cldepth.get(s, 0) for s in range(19)])
    # how many of CLCODE_ORDER we must cover
    need = max(CLCODE_ORDER.index(s) for s in cldepth) + 1
    num = max(4, need)
    bw.put(num - 4, 4)
    for s in CLCODE_ORDER[:num]:
        bw.put(cldepth.get(s, 0), 3)
    bw.put(0, 1)  # no max_symbol
    for s, ev, eb in rle:
        c, ln = clcodes[s]
        bw.put_code(c, ln)
        if eb:
            bw.put(ev, eb)


def encode_vp8l(w, h, argb, *, cache_bits=0, subtract_green=False,
                prefer_raw_dist=False):
    """argb: row-major list of (a, r, g, b). A deliberately simple but
    SPEC-VALID encoder: greedy LZ77 over {dist = w (the 2D (0,1)
    code), dist = 1} plus color-cache hits, literals otherwise."""
    px = list(argb)
    if subtract_green:
        px = [(a, (r - g) % 256, g, (b - g) % 256) for (a, r, g, b) in px]
    n = len(px)
    cache = [None] * (1 << cache_bits) if cache_bits else None

    def cache_key(p):
        a, r, g, b = p
        v = (a << 24) | (r << 16) | (g << 8) | b
        return ((v * HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)

    sw = SymWriter()
    GREEN, RED, BLUE, ALPHA, DIST = 0, 1, 2, 3, 4
    i = 0
    while i < n:
        # longest match at dist w (row above) or 1 (left)
        best_d, best_l = 0, 0
        for d in ((w, 1) if not prefer_raw_dist else (w,)):
            if i >= d:
                l = 0
                while i + l < n and l < 4096 and px[i + l] == px[i + l - d]:
                    l += 1
                if l > best_l:
                    best_d, best_l = d, l
        if best_l >= 5:
            code, nb, eb = prefix_encode(best_l)
            sw.sym(GREEN, 256 + code)
            sw.bits(eb, nb)
            # distance: 2D code when in the map and not prefer_raw
            d2 = None
            if not prefer_raw_dist:
                for ci, (dx, dy) in enumerate(DIST2D):
                    if dy * w + dx == best_d:
                        d2 = ci + 1
                        break
            dcode = d2 if d2 is not None else best_d + 120
            code, nb, eb = prefix_encode(dcode)
            sw.sym(DIST, code)
            sw.bits(eb, nb)
            if cache is not None:
                for j in range(i, i + best_l):
                    cache[cache_key(px[j])] = px[j]
            i += best_l
            continue
        p = px[i]
        if cache is not None and cache[cache_key(p)] == p:
            sw.sym(GREEN, 256 + 24 + cache_key(p))
        else:
            a, r, g, b = p
            sw.sym(GREEN, g)
            sw.sym(RED, r)
            sw.sym(BLUE, b)
            sw.sym(ALPHA, a)
            if cache is not None:
                cache[cache_key(p)] = p
        i += 1

    # per-channel prefix codes from the scan's stats
    sizes = [256 + 24 + ((1 << cache_bits) if cache_bits else 0),
             256, 256, 256, 40]
    freqs = [{} for _ in range(5)]
    for ev in sw.events:
        if ev[0] == "s":
            freqs[ev[1]][ev[2]] = freqs[ev[1]].get(ev[2], 0) + 1
    lens, codes = [], []
    for ch in range(5):
        if not freqs[ch]:
            freqs[ch] = {0: 1}  # unused channel: 1-symbol simple code
        dep = build_lengths(freqs[ch], 15)
        ll = [dep.get(s, 0) for s in range(sizes[ch])]
        lens.append(ll)
        if len(dep) == 1:
            # single-symbol code: ZERO bits per occurrence (the
            # decoder resolves it without reading)
            codes.append({list(dep)[0]: (0, 0)})
        else:
            codes.append(canonical_codes(ll))

    bw = BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    if subtract_green:
        bw.put(1, 1)          # a transform follows
        bw.put(2, 2)          # SUBTRACT_GREEN
    bw.put(0, 1)              # no (more) transforms
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    bw.put(0, 1)              # no meta prefix image
    for ch in range(5):
        # single-symbol channels take the simple form only when the
        # symbol fits 8 bits; green's alphabet is wider, but our
        # single-symbol case only arises for alpha/red/blue
        emit_prefix_code(bw, lens[ch])
    for ev in sw.events:
        if ev[0] == "s":
            c, ln = codes[ev[1]][ev[2]]
            bw.put_code(c, ln)
        else:
            bw.put(ev[1], ev[2])
    payload = b"\x2f" + bw.bytes()
    if len(payload) % 2:
        payload += b"\x00"  # RIFF even padding
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ── independent decoder (the oracle side) ──
def decode_vp8l_luma(data):
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    p = 12
    payload = None
    while p + 8 <= len(data):
        tag = data[p:p + 4]
        ln = struct.unpack("<I", data[p + 4:p + 8])[0]
        if tag == b"VP8L":
            payload = data[p + 8:p + 8 + ln]
            break
        p += 8 + ln + (ln & 1)
    assert payload is not None and payload[0] == 0x2F
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    assert br.read(3) == 0
    subtract_green = False
    while br.read(1):  # transforms
        t = br.read(2)
        assert t == 2, "only subtract-green in contract"
        subtract_green = True
    if br.read(1):
        cache_bits = br.read(4)
        # RFC 9649: color_cache_code_bits in 1..11 when the flag is
        # set (libwebp rejects 0) — mirrors the Scala decoder's reject
        assert 1 <= cache_bits <= 11, "color_cache_code_bits out of range"
    else:
        cache_bits = 0
    assert br.read(1) == 0, "meta prefix image out of contract"

    def read_code(codes_by_len):
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            assert ln <= 15
            if (code, ln) in codes_by_len:
                return codes_by_len[(code, ln)]

    def read_prefix_code(alphabet):
        if br.read(1):  # simple
            nsym = br.read(1) + 1
            s0 = br.read(8) if br.read(1) else br.read(1)
            syms = [s0]
            if nsym == 2:
                syms.append(br.read(8))
            if nsym == 1:
                return {(0, 0): syms[0]}, True
            return {(0, 1): syms[0], (1, 1): syms[1]}, False
        num = 4 + br.read(4)
        cl = [0] * 19
        for s in CLCODE_ORDER[:num]:
            cl[s] = br.read(3)
        assert br.read(1) == 0, "max_symbol form unused by the encoder"
        clc = canonical_codes(cl)
        cl_by = {(c, ln): s for s, (c, ln) in clc.items()}
        lengths = [0] * alphabet
        i = 0
        prev = 8
        while i < alphabet:
            s = read_code(cl_by)
            if s < 16:
                lengths[i] = s
                if s:
                    prev = s
                i += 1
            elif s == 16:
                r = 3 + br.read(2)
                for _ in range(r):
                    lengths[i] = prev
                    i += 1
            elif s == 17:
                i += 3 + br.read(3)
            else:
                i += 11 + br.read(7)
        assert i == alphabet
        codes = canonical_codes(lengths)
        single = len(codes) == 1
        if single:
            return {(0, 0): list(codes)[0]}, True
        return {(c, ln): s for s, (c, ln) in codes.items()}, False

    def rd(codes_single):
        codes, single = codes_single
        if single:
            return codes[(0, 0)]
        return read_code(codes)

    sizes = [256 + 24 + ((1 << cache_bits) if cache_bits else 0),
             256, 256, 256, 40]
    chans = [read_prefix_code(sizes[i]) for i in range(5)]
    n = w * h
    px = [None] * n
    cache = [None] * (1 << cache_bits) if cache_bits else None

    def cache_put(p_):
        if cache is not None:
            a, r, g, b = p_
            v = (a << 24) | (r << 16) | (g << 8) | b
            cache[((v * HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)] = p_

    i = 0
    while i < n:
        g = rd(chans[0])
        if g < 256:
            r = rd(chans[1])
            b = rd(chans[2])
            a = rd(chans[3])
            px[i] = (a, r, g, b)
            cache_put(px[i])
            i += 1
        elif g < 256 + 24:
            length = prefix_decode_value(g - 256, br.read)
            dcode = prefix_decode_value(rd(chans[4]), br.read)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = DIST2D[dcode - 1]
                dist = max(1, dy * w + dx)
            assert dist <= i and i + length <= n, "backref out of range"
            for _ in range(length):
                px[i] = px[i - dist]
                cache_put(px[i])
                i += 1
        else:
            assert cache is not None
            px[i] = cache[g - 256 - 24]
            assert px[i] is not None, "cold cache slot"
            cache_put(px[i])
            i += 1
    lum = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            a, r, g, b = px[y * w + x]
            if subtract_green:
                r = (r + g) % 256
                b = (b + g) % 256
            lum[y][x] = r * 299 + g * 587 + b * 114
    return w, h, lum


os.makedirs(OUT, exist_ok=True)
names, hashes = [], {}
variants = {
    0: dict(),                                   # plain literals+LZ77
    1: dict(cache_bits=6),                       # color cache
    2: dict(subtract_green=True, cache_bits=4),  # transform + cache
    3: dict(prefer_raw_dist=True),               # raw distances only
}
for k in range(4):
    name = f"webp{k}.webp"
    lum = (lambda kk: lambda x, y: luma_at(kk, False, x, y))(k)
    argb = [(255, lum(x, y), lum(x, y), lum(x, y))
            for y in range(H) for x in range(W)]
    data = encode_vp8l(W, H, argb, **variants[k])
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)
    names.append(name)
    hashes[name] = dhash(lum)

# the near-pattern singleton rides variant 1 (cache) for a full
# base/near planted pair within the webp corpus itself
for k in range(4):
    name = f"webpnear{k}.webp"
    lum = (lambda kk: lambda x, y: luma_at(kk, True, x, y))(k)
    argb = [(255, lum(x, y), lum(x, y), lum(x, y))
            for y in range(H) for x in range(W)]
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(encode_vp8l(W, H, argb, **variants[k]))
    names.append(name)
    hashes[name] = dhash(lum)

# out-of-contract / hostile fixtures
ok = open(f"{OUT}/webp0.webp", "rb").read()
with open(f"{OUT}/notwebp.webp", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
with open(f"{OUT}/lossy.webp", "wb") as f:  # VP8 (lossy) chunk: out
    f.write(ok.replace(b"VP8L", b"VP8 ", 1))
with open(f"{OUT}/trunc.webp", "wb") as f:
    f.write(ok[:len(ok) // 2])
with open(f"{OUT}/predictor.webp", "wb") as f:
    # a PREDICTOR transform bit set right after the header: out
    bw = BitWriter()
    bw.put(W - 1, 14)
    bw.put(H - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(1, 1)  # transform present
    bw.put(0, 2)  # PREDICTOR
    bw.put(3, 3)  # size bits
    payload = b"\x2f" + bw.bytes()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
with open(f"{OUT}/tiny_8x4.webp", "wb") as f:
    argb = [(255, 7 * x, 7 * x, 7 * x) for _ in range(4) for x in range(8)]
    f.write(encode_vp8l(8, 4, argb))

# provenance: independent decode == formula, pixel for pixel
for k in range(4):
    for near, stem in ((False, "webp"), (True, "webpnear")):
        name = f"{stem}{k}.webp"
        w, h, lum = decode_vp8l_luma(open(f"{OUT}/{name}", "rb").read())
        assert (w, h) == (W, H), name
        for y in range(H):
            for x in range(W):
                want = (luma_at(k, near, x, y) * 299
                        + luma_at(k, near, x, y) * 587
                        + luma_at(k, near, x, y) * 114)
                assert lum[y][x] == want, (name, x, y)

# planted geometry
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    d = dist(hashes[f"webp{k}.webp"], hashes[f"webpnear{k}.webp"])
    assert 1 <= d <= 3, f"webp{k} near dist {d}"
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("webp", "webpnear"):
            for sb in ("webp", "webpnear"):
                d = dist(hashes[f"{sa}{a}.webp"], hashes[f"{sb}{b}.webp"])
                assert d > 3, (a, b, sa, sb, d)

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n2 in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n2, W, H, hashes[n2]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows to", EXPECTED)
for n2 in names:
    h2 = hashes[n2]
    print(f"  {n2}: {h2:#018x}" if h2 >= 0 else f"  {n2}: -{-h2:#017x}")
