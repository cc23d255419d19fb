#!/usr/bin/env python3
"""Author fixtures/images_png/*.png and
fixtures/images_png_expected.parquet — the q357/q358 PNG perceptual
image-dedup oracle (the gen_dhash_fixtures.py discipline: expected
rows are computed from the pixel GENERATOR FORMULA by an independent
python dHash implementation, never by running the Spark decoder; the
script then re-DECODES the bytes it wrote — zlib inflate + filter
inversion, an independent python PNG decoder — and asserts the
reconstructed pixels match the formula before writing the parquet).

dHash SPEC: identical to gen_dhash_fixtures.py (shared contract with
Multimodal.dHashOfGrid): 9x8 floor-mapped cells, per-cell integer
luma sum (gray g -> 1000*g; RGB -> r*299+g*587+b*114), bit (cy*8+cx)
set iff cell (cx+1,cy)'s average strictly exceeds (cx,cy)'s by
cross-multiplied sums. The luma formulas are the BMP fixture set's
VERBATIM, so base_k.png hashes EQUAL base_k.bmp — which is exactly
what makes the q358 cross-format near-dup join non-vacuous (a PNG
re-encode of a BMP is a distance-0 pair).

Fixture plan (64x64, color type varies to exercise every contract
leg; per-row filter type = y % 5 so ALL FIVE filters are
load-bearing in the Spark decoder):
  base0/near0: color type 0 (gray)
  base1/near1: color type 2 (RGB, r=g=b=l)
  base2/near2: color type 6 (RGBA, alpha = (x*7+y)%256 — noise the
               decoder must IGNORE)
  base3/near3: color type 4 (gray+alpha, alpha = (x*3+2*y)%256)
  pal0..pal3:  color type 3 (palette) re-encodes of the BASE
               patterns -- REVERSED gray palette (entry i = 255-i)
               with INVERTED indices (index = 255-l), so palette
               APPLICATION, not index pass-through, is what makes
               them distance-0 members of their clusters (the GIF
               base3 trap, round 18)
Out-of-contract fixtures (must be SKIPPED by the decoder):
  interlaced.png (Adam7 flag), deep16.png (16-bit), palette.png
  (color type 3 whose indices overrun its 2-entry PLTE -- hostile),
  badplte.png (PLTE length not a multiple of 3), trunc.png (IDAT cut
  mid-stream), notpng.png (bad magic), tiny_8x4.png (sub-grid),
  bomb.png (header claims 1e10 px).
"""
import os
import struct
import zlib
import duckdb

OUT = "/root/repo/fixtures/images_png"
EXPECTED = "/root/repo/fixtures/images_png_expected.parquet"
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


def dhash(lum, w=W, h=H):
    """Formula dHash, signed 64-bit (gen_dhash_fixtures.py verbatim)."""
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            cx, cy = x * 9 // w, y * 8 // h
            sums[cy][cx] += 1000 * lum(x, y)
            cnts[cy][cx] += 1
    h = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > sums[cy][cx] * cnts[cy][cx + 1]:
                h |= 1 << (cy * 8 + cx)
    return h - (1 << 64) if h >= (1 << 63) else h


def chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data)))


SIG = b"\x89PNG\r\n\x1a\n"


def ihdr(w, h, depth, ct, interlace=0):
    return chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0,
                                      interlace))


def pixel_bytes(ct, lum, x, y):
    l = lum(x, y)
    if ct == 0:
        return bytes([l])
    if ct == 2:
        return bytes([l, l, l])
    if ct == 4:
        return bytes([l, (x * 3 + 2 * y) % 256])
    return bytes([l, l, l, (x * 7 + y) % 256])  # ct 6


CH = {0: 1, 2: 3, 4: 2, 6: 4}


def filter_row(ft, cur, prev, ch):
    """FORWARD per-row filtering (encoder side of the spec)."""
    out = bytearray()
    for i, x in enumerate(cur):
        a = cur[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ft == 0:
            v = x
        elif ft == 1:
            v = x - a
        elif ft == 2:
            v = x - b
        elif ft == 3:
            v = x - (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            v = x - pred
        out.append(v % 256)
    return bytes(out)


def png_bytes(w, h, ct, lum, plte=None):
    """ct 3 stores INDEX bytes (index = 255 - l against the reversed
    palette below); other types store pixel_bytes."""
    ch = 1 if ct == 3 else CH[ct]
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        if ct == 3:
            cur = bytes(255 - lum(x, y) for x in range(w))
        else:
            cur = b"".join(pixel_bytes(ct, lum, x, y) for x in range(w))
        ft = y % 5  # every filter type exercised
        raw.append(ft)
        raw += filter_row(ft, cur, prev, ch)
        prev = cur
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (SIG + ihdr(w, h, 8, ct) + plte_chunk
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


# the reversed gray palette: entry i holds gray 255-i, so index
# pass-through hashes the NEGATIVE image (the GIF base3 discipline)
REV_PLTE = bytes(v for i in range(256) for v in (255 - i,) * 3)

# ── Adam7 (round 19): seven (x0, y0, dx, dy) passes; each non-empty
# pass is an INDEPENDENT filtered sub-image (own filter bytes, first
# row against a zero row, per-pass width); an empty pass contributes
# zero bytes. ──
ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def adam7_plan(w, h, ch):
    plan = []
    for (x0, y0, dx, dy) in ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw > 0 and ph > 0:
            plan.append((x0, y0, dx, dy, pw, ph))
    return plan


def png_bytes_adam7(w, h, ct, lum, plte=None):
    """Interlaced encoder: same pixel/index conventions as png_bytes,
    rows re-ordered into the seven passes; the rolling y%5-style
    filter-type schedule keeps all five filters exercised ACROSS
    passes (including filter-vs-zero-prev on each pass's first row)."""
    ch = 1 if ct == 3 else CH[ct]
    raw = bytearray()
    r = 0
    for (x0, y0, dx, dy, pw, ph) in adam7_plan(w, h, ch):
        prev = bytes(pw * ch)
        for j in range(ph):
            y = y0 + j * dy
            if ct == 3:
                cur = bytes(255 - lum(x0 + i * dx, y) for i in range(pw))
            else:
                cur = b"".join(pixel_bytes(ct, lum, x0 + i * dx, y)
                               for i in range(pw))
            ft = r % 5
            r += 1
            raw.append(ft)
            raw += filter_row(ft, cur, prev, ch)
            prev = cur
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (SIG + ihdr(w, h, 8, ct, interlace=1) + plte_chunk
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_png(b):
    """INDEPENDENT decoder for provenance: inflate + filter inversion.
    Returns (w, h, ct, rows of reconstructed pixel bytes)."""
    assert b[:8] == SIG
    off = 8
    idat = b""
    w = h = depth = ct = il = None
    plte = None
    while off + 12 <= len(b):
        ln = struct.unpack(">I", b[off:off + 4])[0]
        typ = b[off + 4:off + 8]
        if typ == b"IHDR":
            w, h, depth, ct, _, _, il = struct.unpack(
                ">IIBBBBB", b[off + 8:off + 21])
        elif typ == b"PLTE":
            plte = b[off + 8:off + 8 + ln]
        elif typ == b"IDAT":
            idat += b[off + 8:off + 8 + ln]
        elif typ == b"IEND":
            break
        off += 12 + ln
    assert depth == 8 and il in (0, 1)
    ch = 1 if ct == 3 else CH[ct]
    raw = zlib.decompress(idat)

    def unfilter(ft, line, prev):
        cur = bytearray()
        for i, x in enumerate(line):
            a = cur[i - ch] if i >= ch else 0
            up = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + up
            elif ft == 3:
                v = x + (a + up) // 2
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                v = x + (a if pa <= pb and pa <= pc else
                         (up if pb <= pc else c))
            cur.append(v % 256)
        return cur

    plan = [(0, 0, 1, 1, w, h)] if il == 0 else adam7_plan(w, h, ch)
    assert len(raw) == sum(ph * (1 + pw * ch) for *_, pw, ph in plan)
    full = [bytearray(w * ch) for _ in range(h)]
    pos = 0
    for (x0, y0, dx, dy, pw, ph) in plan:
        prev = bytearray(pw * ch)
        for j in range(ph):
            ft = raw[pos]
            cur = unfilter(ft, raw[pos + 1:pos + 1 + pw * ch], prev)
            pos += 1 + pw * ch
            y = y0 + j * dy
            for i in range(pw):
                full[y][(x0 + i * dx) * ch:(x0 + i * dx) * ch + ch] = \
                    cur[i * ch:(i + 1) * ch]
            prev = cur
    rows = [bytes(r) for r in full]
    return w, h, ct, rows, plte


os.makedirs(OUT, exist_ok=True)

CTS = {0: 0, 1: 2, 2: 6, 3: 4}  # pattern k -> color type
names, hashes = [], {}
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.png"
        lum = (lambda kk, nn: lambda x, y: luma_at(kk, nn, x, y))(k, near)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(png_bytes(W, H, CTS[k], lum))
        names.append(name)
        hashes[name] = dhash(lum)

# palette re-encodes of the BASE patterns -- reversed palette +
# inverted indices (distance-0 cluster members iff the decoder
# APPLIES the palette)
for k in range(4):
    name = f"pal{k}.png"
    lum = (lambda kk: lambda x, y: luma_at(kk, False, x, y))(k)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(png_bytes(W, H, 3, lum, plte=REV_PLTE))
    names.append(name)
    hashes[name] = dhash(lum)

# ── Adam7 interlaced members (round 19): lossless re-orderings of
# the base patterns — exact cluster members iff every pass lands its
# pixels on the right full-image coordinates ──
dims = {}
ia_members = [("ia0.png", 0, 0, None),        # gray
              ("ia2.png", 2, 6, None),        # RGBA (alpha ignored)
              ("iapal1.png", 1, 3, REV_PLTE)]  # palette under Adam7
for name, k, ct, plte in ia_members:
    lum = (lambda kk: lambda x, y: luma_at(kk, False, x, y))(k)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(png_bytes_adam7(W, H, ct, lum, plte=plte))
    names.append(name)
    hashes[name] = dhash(lum)
# minimal-dims member: 9×8 drives passes down to 1 px wide / 1 row
# tall (p2 is 1×1); own quadratic pattern (the q220 spread rule) so
# it joins no cluster. scaled to the 9×8 grid: every cell is one px.
def iamin_l(x, y):
    return (x * x * 13 + y * y * 7 + 5 * x * y + 3 * x) % 256
with open(f"{OUT}/iamin.png", "wb") as f:
    f.write(png_bytes_adam7(9, 8, 0, iamin_l))
names.append("iamin.png")
dims["iamin.png"] = (9, 8)
hashes["iamin.png"] = dhash(iamin_l, w=9, h=8)
# hostile interlace arms: value 2 (undefined) and a truncated
# interlaced stream — both drop
ia0_bytes = open(f"{OUT}/ia0.png", "rb").read()
with open(f"{OUT}/ia2x.png", "wb") as f:
    f.write(SIG + ihdr(W, H, 8, 0, interlace=2) + ia0_bytes[8 + 25:])
with open(f"{OUT}/iatrunc.png", "wb") as f:
    ln = struct.unpack(">I", ia0_bytes[8 + 25:8 + 29])[0]
    cut = ia0_bytes[8 + 25 + 8:8 + 25 + 8 + ln // 2]
    f.write(SIG + ihdr(W, H, 8, 0, interlace=1) + chunk(b"IDAT", cut)
            + chunk(b"IEND", b""))

# out-of-contract fixtures
ok_gray = png_bytes(W, H, 0, lambda x, y: (2 * x + y) % 256)
with open(f"{OUT}/interlaced.png", "wb") as f:
    # Adam7 FLAG over a SEQUENTIAL-layout IDAT: the per-pass size sum
    # (4216 for 64×64 gray) exceeds the sequential 4160, so the
    # stream is short for what the header claims — malformed, drops
    # (was the round-17 out-of-contract arm; the flag alone is now IN
    # contract)
    f.write(SIG + ihdr(W, H, 8, 0, interlace=1) +
            ok_gray[8 + 25:])  # reuse IDAT+IEND of the gray image
with open(f"{OUT}/deep16.png", "wb") as f:
    f.write(SIG + ihdr(W, H, 16, 0) + ok_gray[8 + 25:])
with open(f"{OUT}/palette.png", "wb") as f:
    # color type 3 whose gray-image indices overrun the 2-entry PLTE:
    # HOSTILE since the round-18 palette leg (was merely
    # out-of-contract before) -- the decoder must drop, never index
    # past the palette
    f.write(SIG + ihdr(W, H, 8, 3) +
            chunk(b"PLTE", bytes(range(3)) * 2) + ok_gray[8 + 25:])
with open(f"{OUT}/badplte.png", "wb") as f:
    # PLTE length not a multiple of 3 -- structurally broken palette
    f.write(SIG + ihdr(W, H, 8, 3) +
            chunk(b"PLTE", bytes(4)) + ok_gray[8 + 25:])
with open(f"{OUT}/trunc.png", "wb") as f:
    full = png_bytes(W, H, 0, lambda x, y: (x + y) % 256)
    idat_off = 8 + 25
    # keep header + HALF the IDAT chunk, then a well-formed IEND; the
    # zlib stream inside is cut mid-flight
    ln = struct.unpack(">I", full[idat_off:idat_off + 4])[0]
    cut = full[idat_off + 8:idat_off + 8 + ln // 2]
    f.write(SIG + ihdr(W, H, 8, 0) + chunk(b"IDAT", cut) + chunk(b"IEND", b""))
with open(f"{OUT}/notpng.png", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
with open(f"{OUT}/tiny_8x4.png", "wb") as f:
    f.write(png_bytes(8, 4, 0, lambda x, y: 7 * x))
with open(f"{OUT}/bomb.png", "wb") as f:  # claims 10^10 px
    f.write(SIG + ihdr(100000, 100000, 8, 0) +
            chunk(b"IDAT", zlib.compress(b"\x00" * 64)) + chunk(b"IEND", b""))

# planted-pair geometry (same assertions as the BMP set: near within
# the banded join's exact-recall band, cross-pattern far outside)
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    d = dist(hashes[f"base{k}.png"], hashes[f"near{k}.png"])
    assert 1 <= d <= 3, f"base{k}/near{k} dist {d} outside [1,3]"
    # palette re-encode of the base pattern: exact cluster member
    assert hashes[f"pal{k}.png"] == hashes[f"base{k}.png"], k
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("base", "near", "pal"):
            for sb in ("base", "near", "pal"):
                d = dist(hashes[f"{sa}{a}.png"], hashes[f"{sb}{b}.png"])
                assert d > 3, f"{sa}{a}/{sb}{b} dist {d} <= 3"

# provenance: independently DECODE each written file and assert every
# pixel's luma matches the formula (filters inverted, alpha ignored,
# palette APPLIED)
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.png"
        w, h, ct, rows, _ = decode_png(open(f"{OUT}/{name}", "rb").read())
        assert (w, h, ct) == (W, H, CTS[k]), name
        ch = CH[ct]
        for y in range(H):
            for x in range(W):
                got = rows[y][x * ch]  # first channel = gray/r
                assert got == luma_at(k, near, x, y), (name, x, y, got)
                if ct in (2, 6):  # g and b mirror r in the formula
                    assert rows[y][x * ch + 1] == got
                    assert rows[y][x * ch + 2] == got
for k in range(4):
    name = f"pal{k}.png"
    w, h, ct, rows, plte = decode_png(open(f"{OUT}/{name}", "rb").read())
    assert (w, h, ct) == (W, H, 3), name
    for y in range(H):
        for x in range(W):
            idx = rows[y][x]
            # stored index is the INVERSE; only the applied palette
            # entry matches the formula
            assert idx == 255 - luma_at(k, False, x, y), (name, x, y)
            r, g, bl = plte[idx * 3], plte[idx * 3 + 1], plte[idx * 3 + 2]
            assert r == g == bl == luma_at(k, False, x, y), (name, x, y)
# Adam7 members: independent decode (the mirror re-assembles the
# seven passes onto full-image coordinates) reproduces every pixel;
# lossless, so exact cluster membership
for name, k, ct, plte_in in ia_members:
    w, h, ct2, rows, plte = decode_png(open(f"{OUT}/{name}", "rb").read())
    assert (w, h, ct2) == (W, H, ct), name
    ch = 1 if ct == 3 else CH[ct]
    for y in range(H):
        for x in range(W):
            want = luma_at(k, False, x, y)
            got = rows[y][x * ch]
            if ct == 3:
                assert got == 255 - want, (name, x, y, got)
            else:
                assert got == want, (name, x, y, got)
    assert hashes[name] == hashes[f"base{k}.png"], name
w, h, ct2, rows, _ = decode_png(open(f"{OUT}/iamin.png", "rb").read())
assert (w, h, ct2) == (9, 8, 0)
for y in range(8):
    for x in range(9):
        assert rows[y][x] == iamin_l(x, y), ("iamin", x, y)
for n in names:
    if n != "iamin.png":
        d = dist(hashes["iamin.png"], hashes[n])
        assert d > 3, f"iamin vs {n} dist {d} <= 3"

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n in names:
    dw, dh = dims.get(n, (W, H))
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, dw, dh, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows to", EXPECTED)
for n in names:
    print(f"  {n}: {hashes[n]:#018x}")
