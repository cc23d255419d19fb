#!/usr/bin/env python3
"""Author fixtures/audio_formats/*.{aif,au} and
fixtures/audio_formats_expected.parquet — the q364/q365/q366 audio
container/codec oracle (the image-quad discipline on the audio arc).

Two new real-world containers next to the certified WAV leg:

AIFF (lossless, big-endian IFF): fbase/fnear 0-3 are 16-bit BE mono
re-encodes of the audio_ahash WAV fixtures' EXACT sample formulas, so
their aHashes must equal the WAV hashes VERBATIM — the cross-container
re-encode story (q366). scaled8.aif exercises the SIGNED 8-bit AIFF
leg (unlike WAV's unsigned 8-bit) with its own isolated pattern.
Expected hashes come from the formula (lossless — the PNG/GIF
discipline); the script re-parses its own bytes (chunk walk + BE
samples + the 80-bit extended-float sample rate) and asserts
sample-exact provenance.

Sun .au (the μ-LAW leg — a real lossy telephony codec, G.711): the
decoder must implement the standard μ-law expansion
    u' = ~u;  t = (((u' & 0x0F) << 3) + 0x84) << ((u' & 0x70) >> 4)
    amp = t − 0x84, sign from bit 0x80
so the expected hash is computed from the DECODED samples (the JPEG
discipline: lossy ⇒ expected = independent decode of the written
bytes). Envelopes are GEOMETRIC (7%/window) so the ±3% μ-law
half-step cannot flip inter-window comparisons — asserted. lin16.au
exercises encoding 3 (16-bit BE linear) with an isolated pattern.

aHash SPEC: parseWavAHash's verbatim (65 windows over |amplitude| in
storage order, strict cross-multiplied average comparisons, <65
samples skipped).
"""
import math
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/audio_formats"
EXPECTED = "/root/repo/fixtures/audio_formats_expected.parquet"
N = 4096
RATE = 8000


def win(i, n=N):
    return i * 65 // n


# ── the WAV fixture formulas, VERBATIM (gen_ahash_fixtures.py) ──
def wav_base_amp(k, w):
    if k == 0:
        return 100 + 25 * w
    if k == 1:
        return 100 + 25 * (64 - w)
    if k == 2:
        return 500 + 400 * (w % 2)
    return 100 + 30 * abs(w - 32)


def wav_amp_at(k, near, i):
    w = win(i)
    a = wav_base_amp(k, w)
    if near and w == 10:
        a += 500
    return a


def signed_sample(amp, i):
    return amp if i % 2 == 0 else -amp


# ── μ-law envelopes: aHash encodes only the COMPARISON SHAPE, so a
# monotone envelope would collide with the WAV arc's monotone
# patterns (a legitimate aHash match — but the capstone wants the AU
# clusters separable). These four shapes are comparison-distinct
# from the WAV set AND each other, with inter-window gaps ≥ 15% so
# the μ-law ±3% half-step cannot flip a bit (asserted below). ──
def au_base_amp(k, w):
    if k == 0:  # period-3 alternation (WAV's alternator is period-2)
        return [500, 1500, 4500][w % 3]
    if k == 1:  # zigzag, period 8
        s = w % 8
        return 300 * (1 << min(s, 8 - s))
    if k == 2:  # period-4 staircase
        return [400, 800, 3200, 1600][w % 4]
    # two-valley W shape (WAV's valley pattern has one)
    return int(200 * 1.15 ** min(abs(w - 16), abs(w - 48)))


def au_amp_at(k, near, i):
    w = win(i)
    a = au_base_amp(k, w)
    if near and w == 10:
        # per-pattern perturbation sized to flip 1-3 comparison bits
        # (a uniform x2 is swallowed by some neighbors): k0 x4 crosses
        # the 4500 neighbor, k1 x2 TIES the 2400 neighbor (strictness
        # flips), k2 /8 drops below both, k3 x2 crosses one side
        a = a // 8 if k == 2 else a * (4 if k == 0 else 2)
    return a


def ahash(amp, n=N):
    sums = [0] * 65
    cnts = [0] * 65
    for i in range(n):
        w = win(i, n)
        sums[w] += amp(i)
        cnts[w] += 1
    h = 0
    for j in range(64):
        if sums[j + 1] * cnts[j] > sums[j] * cnts[j + 1]:
            h |= 1 << j
    return h - (1 << 64) if h >= (1 << 63) else h


# ── G.711 μ-law (16-bit domain; BIAS 0x84) ──
def mulaw_encode(x):
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), CLIP) + BIAS
    seg = x.bit_length() - 8  # x >= 0x84 so bit_length >= 8
    seg = max(0, min(7, seg))
    mant = (x >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant)) & 0xFF


def mulaw_decode(u):
    u = (~u) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    amp = t - 0x84
    return -amp if (u & 0x80) else amp


# sanity: expansion inverts compression to within the segment step
for v in (0, 1, 100, 1000, 8000, 30000, -5, -2500):
    d = mulaw_decode(mulaw_encode(v))
    assert abs(d - max(-32635, min(32635, v))) <= \
        max(4, abs(v) * 0.07), (v, d)


# ── G.711 A-law (13-bit domain, even bits inverted by 0x55; the
# spandsp/Sun g711.c formulation on the 16-bit interface) ──
def alaw_encode(x):
    if x >= 0:
        mask = 0xD5  # sign bit 0x80 set = POSITIVE in A-law
        v = x >> 3
    else:
        mask = 0x55
        v = (-x - 1) >> 3
    seg_aend = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    seg = 0
    while seg < 8 and v > seg_aend[seg]:
        seg += 1
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (v >> (1 if seg < 2 else seg)) & 0x0F
    return aval ^ mask


def alaw_decode(a):
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t += 0x108
        t <<= seg - 1
    return t if (a & 0x80) else -t


for v in (0, 1, 100, 1000, 8000, 30000, -5, -2500):
    d = alaw_decode(alaw_encode(v))
    assert abs(d - v) <= max(16, abs(v) * 0.07), (v, d)


# ── AIFF container ──
def ext80(rate):
    """80-bit IEEE extended float for an integer sample rate."""
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def aiff_bytes(samples, bits):
    ch = 1
    frames = len(samples)
    comm = struct.pack(">hIh", ch, frames, bits) + ext80(RATE)
    if bits == 16:
        data = b"".join(struct.pack(">h", s) for s in samples)
    else:  # 8-bit AIFF is SIGNED
        data = b"".join(struct.pack(">b", s) for s in samples)
    ssnd = struct.pack(">II", 0, 0) + data

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack(">I", len(payload)) + payload + pad
    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


# ── AU container ──
def au_bytes(payload, encoding):
    return struct.pack(">4sIIIII", b".snd", 24, len(payload), encoding,
                       RATE, 1) + payload


os.makedirs(OUT, exist_ok=True)
rows = []  # (name, sample_rate, n_samples, ahash)

# AIFF 16-bit re-encodes of the WAV formulas (hashes must equal WAV's)
wav_expected = {}
for k in range(4):
    for near in (False, True):
        name = f"{'fnear' if near else 'fbase'}{k}.aif"
        samples = [signed_sample(wav_amp_at(k, near, i), i)
                   for i in range(N)]
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(aiff_bytes(samples, 16))
        hsh = ahash((lambda kk, nn: lambda i: wav_amp_at(kk, nn, i))(k, near))
        rows.append((name, RATE, N, hsh))
        wav_expected[name] = hsh

# signed-8-bit AIFF leg: quadratic isolated pattern, |amp| <= 120
def s8_amp(i):
    return 5 + ((win(i) * win(i) + 3) % 23) * 5

with open(f"{OUT}/scaled8.aif", "wb") as f:
    f.write(aiff_bytes([signed_sample(s8_amp(i), i) for i in range(N)], 8))
rows.append(("scaled8.aif", RATE, N, ahash(s8_amp)))

# AU μ-law: geometric envelopes; expected = DECODE of the written bytes
au_hashes = {}
for k in range(4):
    for near in (False, True):
        name = f"{'unear' if near else 'ubase'}{k}.au"
        lin = [signed_sample(au_amp_at(k, near, i), i) for i in range(N)]
        enc = bytes(mulaw_encode(s) for s in lin)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(au_bytes(enc, 1))
        dec = [abs(mulaw_decode(u)) for u in enc]
        hsh = ahash(lambda i: dec[i])
        rows.append((name, RATE, N, hsh))
        au_hashes[name] = hsh

# AU 16-bit BE linear leg: isolated pattern
def lin16_amp(i):
    return 50 + ((win(i) * 7 + win(i) * win(i)) % 37) * 40

lin = [signed_sample(lin16_amp(i), i) for i in range(N)]
with open(f"{OUT}/lin16.au", "wb") as f:
    f.write(au_bytes(b"".join(struct.pack(">h", s) for s in lin), 3))
rows.append(("lin16.au", RATE, N, ahash(lin16_amp)))

# AU G.711 A-law (encoding 27, round 18): the SAME geometric envelope
# formulas re-encoded through the OTHER telephony codec; expected =
# DECODE of the written bytes (each lossy codec certifies against its
# own reconstruction)
alaw_hashes = {}
for k in range(4):
    for near in (False, True):
        name = f"{'gnear' if near else 'gbase'}{k}.au"
        lin = [signed_sample(au_amp_at(k, near, i), i) for i in range(N)]
        enc = bytes(alaw_encode(s) for s in lin)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(au_bytes(enc, 27))
        dec = [abs(alaw_decode(u)) for u in enc]
        hsh = ahash(lambda i: dec[i])
        rows.append((name, RATE, N, hsh))
        alaw_hashes[name] = hsh

# AU 8-bit SIGNED linear leg (encoding 2, round 18): isolated pattern,
# |amp| <= 127 (lossless -- expected straight from the formula)
def lin8_amp(i):
    return 3 + ((win(i) * 11 + win(i) * win(i) * 5) % 25) * 5

with open(f"{OUT}/lin8.au", "wb") as f:
    f.write(au_bytes(b"".join(
        struct.pack(">b", signed_sample(lin8_amp(i), i))
        for i in range(N)), 2))
rows.append(("lin8.au", RATE, N, ahash(lin8_amp)))

# ═══════════════ FLAC (round 18) ═══════════════
# The free-lossless-audio-codec subset the 100-TB audio arc decodes:
# mono 16-bit fixed-blocksize streams with CONSTANT / VERBATIM /
# FIXED(0-4) / LPC subframes, rice-coded residuals with partitions
# and the escape hatch, UTF-8 frame numbers, and BOTH CRCs (8-bit
# header, 16-bit frame) written and verified. Lossless: the decoded
# samples equal the formula samples exactly, so a FLAC re-encode of
# a WAV joins its cluster at distance 0.

def crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def utf8_coded(n):
    if n < 0x80:
        return bytes([n])
    out, bits = [], []
    while True:
        bits.append(n & 0x3F)
        n >>= 6
        marker = (0xFF << (7 - len(bits))) & 0xFF
        if n < (1 << (6 - len(bits))):
            lead = marker | n
            return bytes([lead] + [0x80 | b for b in reversed(bits)])


class FlacBits:
    def __init__(self):
        self.bits = []

    def put(self, v, n):  # MSB-first (FLAC convention)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put_signed(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def put_bytes(self, bs):
        for b in bs:
            self.put(b, 8)

    def bytes_align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << (7 - j)
            out.append(b)
        return bytes(out)


def rice_write(fb, residuals, param):
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        fb.unary(u >> param)
        if param:
            fb.put(u & ((1 << param) - 1), param)


def fixed_residuals(samples, warm, order):
    full = warm + samples
    o = order
    res = []
    for i in range(len(samples)):
        j = i + o  # index into full... but warm has length o
        s = full[o + i]
        past = full[i:o + i]
        if o == 0:
            p = 0
        elif o == 1:
            p = past[-1]
        elif o == 2:
            p = 2 * past[-1] - past[-2]
        elif o == 3:
            p = 3 * past[-1] - 3 * past[-2] + past[-3]
        else:
            p = 4 * past[-1] - 6 * past[-2] + 4 * past[-3] - past[-4]
        res.append(s - p)
    return res


# RFC 9639 table-coded sample rates (codes 6/7/8 are the three the
# round-18 review found misdecoded as trailing-byte forms)
RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
              22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
              96000: 11}


def write_subframe(fb, block, bs, bps, kind, part_order, escape_parts,
                   method1=False):
    """One subframe at bps bits (17 for a SIDE channel)."""
    if kind == "constant" and len(set(block)) > 1:
        kind = "fixed"
    if kind == "constant":
        fb.put(0, 1)
        fb.put(0, 6)
        fb.put(0, 1)
        fb.put_signed(block[0], bps)
    elif kind == "verbatim":
        fb.put(0, 1)
        fb.put(1, 6)
        fb.put(0, 1)
        for s in block:
            fb.put_signed(s, bps)
    elif kind == "lpc":
        # order-2 LPC with pinned coefficients [3, -1], shift 1:
        # prediction = (3*s[i-1] - 1*s[i-2]) >> 1 (floor shift)
        order = 2
        fb.put(0, 1)
        fb.put(32 + (order - 1), 6)
        fb.put(0, 1)
        for s in block[:order]:
            fb.put_signed(s, bps)
        fb.put(4 - 1, 4)   # precision 4 bits
        fb.put(1, 5)       # shift 1
        fb.put_signed(3, 4)
        fb.put_signed(-1, 4)
        res = []
        for i in range(order, bs):
            p = (3 * block[i - 1] - block[i - 2]) >> 1
            res.append(block[i] - p)
        write_residual(fb, res, bs, order, part_order, escape_parts,
                       method1)
    else:  # fixed: pick the best order 0-2 by |residual| sum
        best, besto = None, 0
        for o in range(3):
            if bs <= o:
                continue
            r = fixed_residuals(block[o:], block[:o], o)
            c = sum(abs(x) for x in r)
            if best is None or c < best[0]:
                best, besto = (c, r), o
        o, res = besto, best[1]
        fb.put(0, 1)
        fb.put(8 + o, 6)
        fb.put(0, 1)
        for s in block[:o]:
            fb.put_signed(s, bps)
        write_residual(fb, res, bs, o, part_order, escape_parts,
                       method1)


def encode_flac(samples, rate, *, blocksize=512, strategy="fixed",
                part_order=0, escape_parts=False, right=None, ca=0,
                method1=False):
    """16-bit mono, or stereo when `right` is given: ca 1 =
    independent, 8 = left/side, 9 = side/right, 10 = mid/side (side
    subframes one bit deeper; mid = (L+R)>>1 with the dropped sum bit
    recovered from the side's parity). strategy: fixed | verbatim |
    lpc | mixed."""
    n = len(samples)
    nch = 2 if right is not None else 1
    assert nch == 1 or ca in (1, 8, 9, 10)
    fb_out = bytearray(b"fLaC")
    # STREAMINFO (last-block flag set, type 0, 34 bytes)
    si = FlacBits()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(15, 5)  # bits - 1
    si.put(n, 36)
    sib = si.bytes_align() + b"\x00" * 16  # md5 unset
    fb_out += bytes([0x80]) + (34).to_bytes(3, "big") + sib
    fidx = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        fb = FlacBits()
        fb.put(0b11111111111110, 14)
        fb.put(0, 1)  # reserved
        fb.put(0, 1)  # fixed blocksize stream
        fb.put(0b0111, 4)  # blocksize: 16-bit value - 1 follows
        fb.put(RATE_CODES[rate], 4)  # table-coded sample rate
        fb.put(0 if nch == 1 else ca, 4)
        fb.put(0b100, 3)  # 16-bit
        fb.put(0, 1)
        fb.put_bytes(utf8_coded(fidx))
        fb.put(bs - 1, 16)
        hdr = fb.bytes_align()
        fb = FlacBits()
        fb.put_bytes(hdr)
        fb.put(crc8(hdr), 8)
        kind = strategy
        if strategy == "mixed":
            kind = ("constant", "fixed", "verbatim", "lpc")[fidx % 4]
        if nch == 1:
            write_subframe(fb, samples[pos:pos + bs], bs, 16, kind,
                           part_order, escape_parts, method1)
        else:
            lb = samples[pos:pos + bs]
            rb = right[pos:pos + bs]
            side = [l - r for l, r in zip(lb, rb)]
            subs = {1: [(lb, 16), (rb, 16)],
                    8: [(lb, 16), (side, 17)],
                    9: [(side, 17), (rb, 16)],
                    10: [([(l + r) >> 1 for l, r in zip(lb, rb)], 16),
                         (side, 17)]}[ca]
            for blk, bps in subs:
                write_subframe(fb, blk, bs, bps, kind, part_order,
                               escape_parts, method1)
        body = fb.bytes_align()
        fb_out += body + struct.pack(">H", crc16(body))
        pos += bs
        fidx += 1
    return bytes(fb_out)


def best_rice_param(res):
    best, bestp = None, 0
    for p in range(15):
        c = sum((((r << 1) ^ (r >> 63)) if r >= 0 else ((-r) << 1) - 1)
                >> p for r in res) + len(res) * (p + 1)
        if best is None or c < best:
            best, bestp = c, p
    return bestp


def write_residual(fb, res, bs, order, part_order, escape_parts,
                   method1=False):
    # rice method 0 (4-bit params) or 1 (5-bit params — round 19; the
    # escape code widens with the field)
    fb.put(1 if method1 else 0, 2)
    pbits = 5 if method1 else 4
    fb.put(part_order, 4)
    nparts = 1 << part_order
    assert bs % nparts == 0 and bs // nparts > order
    at = 0
    for pi in range(nparts):
        cnt = bs // nparts - (order if pi == 0 else 0)
        part = res[at:at + cnt]
        at += cnt
        if escape_parts and pi == nparts - 1:
            fb.put((1 << pbits) - 1, pbits)  # escape: raw residuals
            raw_bits = max(max((abs(r).bit_length() + 1) for r in part),
                           2) if part else 2
            fb.put(raw_bits, 5)
            for r in part:
                fb.put_signed(r, raw_bits)
        else:
            p = best_rice_param(part)
            if method1:
                # force a param method 0 CANNOT express, so the 5-bit
                # path is load-bearing (suboptimal coding is legal)
                p = max(p, 16)
            fb.put(p, pbits)
            rice_write(fb, part, p)
    assert at == len(res)


# ── independent FLAC decoder (the oracle side) ──
def decode_flac(data):
    assert data[:4] == b"fLaC"
    p = 4
    rate = nch = bits = total = None
    while True:
        last = data[p] & 0x80
        typ = data[p] & 0x7F
        ln = int.from_bytes(data[p + 1:p + 4], "big")
        if typ == 0:
            body = data[p + 4:p + 4 + ln]
            rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 7) + 1
            bits = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | \
                int.from_bytes(body[14:18], "big")
        p += 4 + ln
        if last:
            break
    assert nch in (1, 2) and bits == 16

    class RD:
        def __init__(self, d, byte):
            self.d, self.pos = d, byte * 8

        def read(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | ((self.d[self.pos >> 3] >>
                                 (7 - (self.pos & 7))) & 1)
                self.pos += 1
            return v

        def sread(self, n):
            v = self.read(n)
            return v - (1 << n) if v >= (1 << (n - 1)) else v

        def unary(self):
            q = 0
            while self.read(1) == 0:
                q += 1
            return q

    out = []  # INTERLEAVED samples (frames x channels)
    rd = RD(data, p)
    fidx = 0

    def read_subframe(bs, bps):
        assert rd.read(1) == 0
        typ = rd.read(6)
        assert rd.read(1) == 0, "wasted bits out of contract"
        if typ == 0:
            return [rd.sread(bps)] * bs
        if typ == 1:
            return [rd.sread(bps) for _ in range(bs)]
        if 8 <= typ <= 12 or typ >= 32:
            if typ >= 32:
                order = typ - 32 + 1
                warm = [rd.sread(bps) for _ in range(order)]
                prec = rd.read(4) + 1
                shift = rd.read(5)
                coefs = [rd.sread(prec) for _ in range(order)]
            else:
                order = typ - 8
                warm = [rd.sread(bps) for _ in range(order)]
            method = rd.read(2)
            assert method in (0, 1)
            pbits = 4 + method
            porder = rd.read(4)
            nparts = 1 << porder
            res = []
            for pi in range(nparts):
                cnt = bs // nparts - (order if pi == 0 else 0)
                prm = rd.read(pbits)
                if prm == (1 << pbits) - 1:
                    raw = rd.read(5)
                    res += [rd.sread(raw) for _ in range(cnt)]
                else:
                    for _ in range(cnt):
                        q = rd.unary()
                        u = (q << prm) | (rd.read(prm) if prm else 0)
                        res.append((u >> 1) ^ -(u & 1))
            block = list(warm)
            for r in res:
                if typ >= 32:
                    pred = sum(coefs[j] * block[-1 - j]
                               for j in range(order)) >> shift
                elif order == 0:
                    pred = 0
                elif order == 1:
                    pred = block[-1]
                elif order == 2:
                    pred = 2 * block[-1] - block[-2]
                elif order == 3:
                    pred = 3 * block[-1] - 3 * block[-2] + block[-3]
                else:
                    pred = 4 * block[-1] - 6 * block[-2] + \
                        4 * block[-3] - block[-4]
                block.append(pred + r)
            return block
        raise ValueError("subframe type")

    frames_done = 0
    while frames_done < total:
        fstart = rd.pos // 8
        assert rd.read(14) == 0b11111111111110
        assert rd.read(1) == 0
        assert rd.read(1) == 0  # fixed blocksize
        bsc = rd.read(4)
        src = rd.read(4)
        ca = rd.read(4)
        assert (ca == 0 and nch == 1) or \
            (ca in (1, 8, 9, 10) and nch == 2)
        assert rd.read(3) == 0b100  # 16-bit
        assert rd.read(1) == 0
        lead = rd.read(8)  # utf8 frame number
        extra = 0
        if lead >= 0xC0:
            t = lead
            while t & 0x40:
                extra += 1
                t <<= 1
        num = lead & (0x3F >> extra) if extra else lead
        for _ in range(extra):
            c = rd.read(8)
            assert c & 0xC0 == 0x80
            num = (num << 6) | (c & 0x3F)
        assert num == fidx
        assert bsc == 0b0111
        bs = rd.read(16) + 1
        # RFC 9639: codes 1-11 are table rates (no trailing bytes);
        # 12/13/14 carry 8/16/16 trailing bits
        if src == 12:
            rd.read(8)
        elif src in (13, 14):
            rd.read(16)
        else:
            assert 1 <= src <= 11
        hdr_end = rd.pos // 8
        assert crc8(data[fstart:hdr_end]) == rd.read(8)
        if nch == 1:
            frame = read_subframe(bs, 16)
        else:
            side_idx = {1: None, 8: 1, 9: 0, 10: 1}[ca]
            a = read_subframe(bs, 17 if side_idx == 0 else 16)
            bch = read_subframe(bs, 17 if side_idx == 1 else 16)
            frame = []
            for i in range(bs):
                if ca == 1:
                    l, r = a[i], bch[i]
                elif ca == 8:
                    l = a[i]
                    r = a[i] - bch[i]
                elif ca == 9:
                    r = bch[i]
                    l = bch[i] + a[i]
                else:  # mid/side: recover the dropped sum bit from
                    # the side's parity
                    side = bch[i]
                    mid2 = (a[i] << 1) | (side & 1)
                    l = (mid2 + side) >> 1
                    r = (mid2 - side) >> 1
                assert -32768 <= l <= 32767 and -32768 <= r <= 32767
                frame += [l, r]
        # frame footer: byte-align + CRC-16 over the whole frame
        if rd.pos % 8:
            assert rd.read(8 - rd.pos % 8) == 0
        fend = rd.pos // 8
        assert crc16(data[fstart:fend]) == rd.read(16)
        out += frame
        frames_done += bs
        fidx += 1
    assert len(out) == total * nch
    assert rd.pos == len(data) * 8, "trailing bytes after the last frame"
    return rate, out


# FLAC members of the WAV clusters: the SAME signed samples as the
# fbase/fnear AIFF re-encodes, four subframe strategies
flac_variants = {
    0: dict(strategy="fixed"),
    1: dict(strategy="verbatim", blocksize=256),
    2: dict(strategy="lpc", part_order=2),
    3: dict(strategy="mixed", part_order=1, escape_parts=True),
}
for k in range(4):
    for near in (False, True):
        name = f"{'cnear' if near else 'cbase'}{k}.flac"
        samples = [signed_sample(wav_amp_at(k, near, i), i)
                   for i in range(N)]
        data = encode_flac(samples, RATE, **flac_variants[k])
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(data)
        # lossless provenance: independent decode == the samples
        drate, dsamp = decode_flac(data)
        assert drate == RATE and dsamp == samples, name
        hsh = ahash((lambda kk, nn: lambda i: wav_amp_at(kk, nn, i))(k, near))
        rows.append((name, RATE, N, hsh))

# a 22.05 kHz member (rate code 6 — one of the three table codes the
# round-18 review found misdecoded as trailing-byte forms; this
# fixture makes the whole 1-11 table path load-bearing). Same samples
# as cbase0, so it joins wavfam0 at distance 0; only sample_rate
# differs in the expected row.
c22k_samples = [signed_sample(wav_amp_at(0, False, i), i)
                for i in range(N)]
c22k = encode_flac(c22k_samples, 22050, strategy="fixed")
with open(f"{OUT}/c22k.flac", "wb") as f:
    f.write(c22k)
drate, dsamp = decode_flac(c22k)
assert drate == 22050 and dsamp == c22k_samples
rows.append(("c22k.flac", 22050, N,
             ahash(lambda i: wav_amp_at(0, False, i))))

# rice METHOD 1 member (round 19): cbase0's samples with 5-bit rice
# params forced ≥ 16 — a stream method 0 CANNOT express (its 4-bit
# field tops out at 14), so decoding it proves the 5-bit path, not
# just a tolerated flag. Joins wavfam0 at distance 0.
m1_samples = [signed_sample(wav_amp_at(0, False, i), i)
              for i in range(N)]
m1 = encode_flac(m1_samples, RATE, strategy="fixed", part_order=1,
                 method1=True)
with open(f"{OUT}/m1.flac", "wb") as f:
    f.write(m1)
drate, dsamp = decode_flac(m1)
assert drate == RATE and dsamp == m1_samples
# the stream really carries a 5-bit-only param (wire-level check:
# method bits == 01 somewhere is too weak — re-encode under method 0
# and require DIFFERENT bytes plus a larger method-1 stream)
m0 = encode_flac(m1_samples, RATE, strategy="fixed", part_order=1)
assert m1 != m0 and len(m1) > len(m0)
rows.append(("m1.flac", RATE, N,
             ahash(lambda i: wav_amp_at(0, False, i))))

# STEREO (round 18): the SAME left/right audio encoded through all
# FOUR channel assignments -- independent, left/side, side/right,
# mid/side (side subframes one bit deeper; floor-mid + side-parity
# reconstruction) -- must land on ONE hash: a 4-member distance-0
# cluster that certifies every decorrelation path against the same
# truth. The envelope hashes INTERLEAVED |samples| (the WAV decoder's
# storage-order convention), so the formula lives on the interleaved
# index.
def st_int(j):
    w = win(j, 2 * N)
    return 150 + ((w * 13 + w * w * 3) % 27) * 110

stL = [signed_sample(st_int(2 * i), 2 * i) for i in range(N)]
stR = [signed_sample(st_int(2 * i + 1), 2 * i + 1) for i in range(N)]
st_hash = ahash(st_int, 2 * N)
st_inter = [v for pair in zip(stL, stR) for v in pair]
for name, ca, kw in (
        ("stind.flac", 1, dict(strategy="fixed")),
        ("stls.flac", 8, dict(strategy="verbatim", blocksize=256)),
        ("stsr.flac", 9, dict(strategy="lpc", part_order=2)),
        ("stms.flac", 10, dict(strategy="mixed", part_order=1,
                               escape_parts=True))):
    data = encode_flac(stL, RATE, right=stR, ca=ca, **kw)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)
    drate, dsamp = decode_flac(data)
    assert drate == RATE and dsamp == st_inter, name
    rows.append((name, RATE, 2 * N, st_hash))

# hostile / out-of-contract FLAC arms
okf = open(f"{OUT}/cbase0.flac", "rb").read()
with open(f"{OUT}/notflac.flac", "wb") as f:
    f.write(b"NOPE" + okf[4:64])
with open(f"{OUT}/trunc.flac", "wb") as f:
    f.write(okf[:len(okf) // 2])
with open(f"{OUT}/badcrc.flac", "wb") as f:
    bad = bytearray(okf)
    bad[-1] ^= 0x5A  # last frame's CRC-16 low byte
    f.write(bytes(bad))

# hostile / out-of-contract fixtures
with open(f"{OUT}/notaiff.aif", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
ok = open(f"{OUT}/fbase0.aif", "rb").read()
with open(f"{OUT}/trunc.aif", "wb") as f:
    f.write(ok[:len(ok) // 2])
with open(f"{OUT}/short_64.aif", "wb") as f:  # sub-window
    f.write(aiff_bytes([100] * 64, 16))
with open(f"{OUT}/notau.au", "wb") as f:
    f.write(b"NOPE" + b"\x00" * 60)
with open(f"{OUT}/float.au", "wb") as f:  # encoding 6 (float): out
    f.write(au_bytes(b"\x3f" * 256, 6))
with open(f"{OUT}/trunc.au", "wb") as f:
    f.write(au_bytes(b"\x7f" * 32, 1))  # 32 samples < 65 windows

# ── provenance: re-parse the AIFF bytes independently ──
def decode_aiff(b):
    assert b[:4] == b"FORM" and b[8:12] == b"AIFF"
    p = 12
    comm = ssnd = None
    while p + 8 <= len(b):
        cid = b[p:p + 4]
        ln = struct.unpack(">I", b[p + 4:p + 8])[0]
        pay = b[p + 8:p + 8 + ln]
        if cid == b"COMM":
            comm = pay
        elif cid == b"SSND":
            ssnd = pay
        p += 8 + ln + (ln & 1)
    ch, frames, bits = struct.unpack(">hIh", comm[:8])
    exp, mant = struct.unpack(">HQ", comm[8:18])
    rate = mant >> (63 - (exp - 16383))
    off = struct.unpack(">I", ssnd[:4])[0]
    data = ssnd[8 + off:]
    if bits == 16:
        samples = [struct.unpack(">h", data[2 * i:2 * i + 2])[0]
                   for i in range(frames * ch)]
    else:
        samples = [struct.unpack(">b", data[i:i + 1])[0]
                   for i in range(frames * ch)]
    return ch, frames, bits, rate, samples

for k in range(4):
    name = f"fbase{k}.aif"
    ch, fr, bits, rate, samples = decode_aiff(open(f"{OUT}/{name}", "rb").read())
    assert (ch, fr, bits, rate) == (1, N, 16, RATE), name
    for i in range(0, N, 97):
        assert samples[i] == signed_sample(wav_amp_at(k, False, i), i), \
            (name, i)

# the cross-container story: AIFF hashes equal the WAV expected hashes
wavs = duckdb.sql(
    "SELECT name, ahash FROM "
    "read_parquet('/root/repo/fixtures/audio_ahash_expected.parquet')"
).fetchall()
wavmap = dict(wavs)
for k in range(4):
    for near in (False, True):
        wn = f"{'anear' if near else 'abase'}{k}.wav"
        an = f"{'fnear' if near else 'fbase'}{k}.aif"
        assert wav_expected[an] == wavmap[wn], (an, wn)

# planted geometry: μ-law base/near within [1,3]; every cross-pattern
# and cross-arc distance > 3; the isolated legs isolated
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

allh = {n: h for (n, _, _, h) in rows}
for k in range(4):
    d = dist(allh[f"ubase{k}.au"], allh[f"unear{k}.au"])
    assert 1 <= d <= 3, f"ubase{k}/unear{k} dist {d}"
    d = dist(allh[f"gbase{k}.au"], allh[f"gnear{k}.au"])
    assert 1 <= d <= 3, f"gbase{k}/gnear{k} dist {d}"
    # CROSS-CODEC: the two telephony codecs quantize differently, but
    # the envelope formulas carry enough headroom that no window
    # comparison flips -- the A-law re-encode is an EXACT member of
    # the mu-law cluster (checked, not assumed)
    assert allh[f"gbase{k}.au"] == allh[f"ubase{k}.au"], k
    assert allh[f"gnear{k}.au"] == allh[f"unear{k}.au"], k
keys = sorted(allh)
import itertools
def family(n):
    if n in ("stind.flac", "stls.flac", "stsr.flac", "stms.flac"):
        return "stfam"
    for k in range(4):
        if n in (f"fbase{k}.aif", f"fnear{k}.aif",
                 f"cbase{k}.flac", f"cnear{k}.flac") or \
                (k == 0 and n in ("c22k.flac", "m1.flac")):
            return f"wavfam{k}"
        if n in (f"ubase{k}.au", f"unear{k}.au",
                 f"gbase{k}.au", f"gnear{k}.au"):
            return f"aufam{k}"
    return n  # isolated legs
for a, b in itertools.combinations(keys, 2):
    if family(a) != family(b):
        assert dist(allh[a], allh[b]) > 3, (a, b, dist(allh[a], allh[b]))

con = duckdb.connect()
con.execute("CREATE TABLE e (name VARCHAR, sample_rate INT, "
            "n_samples BIGINT, ahash BIGINT)")
for n, r, ns, h in rows:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, r, ns, h])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(rows), "expected rows to", EXPECTED)
for n, r, ns, h in rows:
    print(f"  {n}: {h:#018x}" if h >= 0 else f"  {n}: -{-h:#017x}")
