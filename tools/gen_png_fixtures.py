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
Out-of-contract fixtures (must be SKIPPED by the decoder):
  interlaced.png (Adam7 flag), deep16.png (16-bit), palette.png
  (color type 3), trunc.png (IDAT cut mid-stream), notpng.png (bad
  magic), tiny_8x4.png (sub-grid), bomb.png (header claims 1e10 px).
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


def dhash(lum):
    """Formula dHash, signed 64-bit (gen_dhash_fixtures.py verbatim)."""
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


def png_bytes(w, h, ct, lum):
    ch = CH[ct]
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        cur = b"".join(pixel_bytes(ct, lum, x, y) for x in range(w))
        ft = y % 5  # every filter type exercised
        raw.append(ft)
        raw += filter_row(ft, cur, prev, ch)
        prev = cur
    return (SIG + ihdr(w, h, 8, ct) + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_png(b):
    """INDEPENDENT decoder for provenance: inflate + filter inversion.
    Returns (w, h, ct, rows of reconstructed pixel bytes)."""
    assert b[:8] == SIG
    off = 8
    idat = b""
    w = h = depth = ct = il = None
    while off + 12 <= len(b):
        ln = struct.unpack(">I", b[off:off + 4])[0]
        typ = b[off + 4:off + 8]
        if typ == b"IHDR":
            w, h, depth, ct, _, _, il = struct.unpack(
                ">IIBBBBB", b[off + 8:off + 21])
        elif typ == b"IDAT":
            idat += b[off + 8:off + 8 + ln]
        elif typ == b"IEND":
            break
        off += 12 + ln
    assert depth == 8 and il == 0
    ch = CH[ct]
    raw = zlib.decompress(idat)
    assert len(raw) == h * (1 + w * ch)
    rows, prev = [], bytearray(w * ch)
    for y in range(h):
        base = y * (1 + w * ch)
        ft = raw[base]
        line = raw[base + 1:base + 1 + w * ch]
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
        rows.append(bytes(cur))
        prev = cur
    return w, h, ct, rows


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

# out-of-contract fixtures
ok_gray = png_bytes(W, H, 0, lambda x, y: (2 * x + y) % 256)
with open(f"{OUT}/interlaced.png", "wb") as f:  # Adam7 flag set
    f.write(SIG + ihdr(W, H, 8, 0, interlace=1) +
            ok_gray[8 + 25:])  # reuse IDAT+IEND of the gray image
with open(f"{OUT}/deep16.png", "wb") as f:
    f.write(SIG + ihdr(W, H, 16, 0) + ok_gray[8 + 25:])
with open(f"{OUT}/palette.png", "wb") as f:
    f.write(SIG + ihdr(W, H, 8, 3) +
            chunk(b"PLTE", bytes(range(3)) * 2) + ok_gray[8 + 25:])
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
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("base", "near"):
            for sb in ("base", "near"):
                d = dist(hashes[f"{sa}{a}.png"], hashes[f"{sb}{b}.png"])
                assert d > 3, f"{sa}{a}/{sb}{b} dist {d} <= 3"

# provenance: independently DECODE each written file and assert every
# pixel's luma matches the formula (filters inverted, alpha ignored)
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.png"
        w, h, ct, rows = decode_png(open(f"{OUT}/{name}", "rb").read())
        assert (w, h, ct) == (W, H, CTS[k]), name
        ch = CH[ct]
        for y in range(H):
            for x in range(W):
                got = rows[y][x * ch]  # first channel = gray/r
                assert got == luma_at(k, near, x, y), (name, x, y, got)
                if ct in (2, 6):  # g and b mirror r in the formula
                    assert rows[y][x * ch + 1] == got
                    assert rows[y][x * ch + 2] == got

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, W, H, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows to", EXPECTED)
for n in names:
    print(f"  {n}: {hashes[n]:#018x}")
