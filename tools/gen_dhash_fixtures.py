#!/usr/bin/env python3
"""Author fixtures/images_dhash/*.bmp and
fixtures/images_dhash_expected.parquet — the q325/q326 perceptual
image-dedup oracle (the gen_bmp_fixtures.py discipline: expected rows
are computed from the pixel GENERATOR FORMULA by an independent python
dHash implementation, never by running the Spark decoder; the script
re-parses the bytes it wrote and asserts they match the formula before
writing the parquet).

dHash SPEC (shared contract with Multimodal.parseBmpDHash — both sides
implement this paragraph independently):
  - 9 columns x 8 rows of cells over the image; pixel (x, y) belongs to
    cell (cx, cy) = (x*9 // w, y*8 // h) — integer floor, image-space
    coords (x right, y DOWN from the top-left).
  - per-cell integer luma sum: L = sum over pixels of r*299+g*587+b*114.
  - bit (cy*8 + cx), cx in 0..7: set iff cell (cx+1, cy)'s AVERAGE luma
    strictly exceeds cell (cx, cy)'s, compared by cross-multiplied
    integer sums (L2*n1 > L1*n2) — no division, engine-exact.
  - images narrower than 9 px or shorter than 8 px are SKIPPED (an
    empty cell would make the comparison undefined).

Fixture plan (all 64x64 24bpp bottom-up, r=g=b=l so luma = 1000*l):
  base0  l = min(255, 2x + y//8)        ascending rows
  base1  l = min(255, 128 - 2x + y//8)  descending rows (l clamped >=0)
  base2  l = ascending on even row-blocks, descending on odd
  base3  l = min(255, 3*|x-32| + y//8)  valley at the center
  near0..near3: the matching base with +40 luma on the single cell
    (cx, cy) = (4, 0) — x in [29, 36), y in [0, 8) — which perturbs
    only the (3,4) and (4,5) comparisons of cell row 0, flipping 1..3
    dHash bits (ASSERTED per pair below)
  tiny_8x4.bmp: smaller than the cell grid — must be SKIPPED
  rle8_dh.bmp:  compressed — must be SKIPPED

The script asserts each (base_k, near_k) hamming distance is in [1, 3]
(the banded join's exact-recall band) and each cross-base distance
exceeds 3, so q326's pair set is closed-form: exactly the four planted
pairs.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images_dhash"
EXPECTED = "/root/repo/fixtures/images_dhash_expected.parquet"
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
    """lum: function (x, y) -> 0..255. Returns the 64-bit dHash as a
    SIGNED 64-bit int (two's complement — BIGINT in both engines)."""
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


def info_header(w, h_signed, bits, compression=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h_signed, 1, bits,
                       compression, 0, 2835, 2835, 0, 0)


def file_header(pixel_bytes):
    off = 14 + 40
    return struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)


def bmp_bytes(w, h, lum):
    stride = (w * 3 + 3) // 4 * 4
    out = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            l = lum(x, y)
            row += bytes([l, l, l])
        row += b"\x00" * (stride - len(row))
        out += row
    return file_header(len(out)) + info_header(w, h, 24) + bytes(out)


os.makedirs(OUT, exist_ok=True)

names, hashes = [], {}
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.bmp"
        lum = (lambda kk, nn: lambda x, y: luma_at(kk, nn, x, y))(k, near)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(bmp_bytes(W, H, lum))
        names.append(name)
        hashes[name] = dhash(lum)

# skipped fixtures: smaller than the 9x8 grid, and compressed
with open(f"{OUT}/tiny_8x4.bmp", "wb") as f:
    f.write(bmp_bytes(8, 4, lambda x, y: 7 * x))
with open(f"{OUT}/rle8_dh.bmp", "wb") as f:
    f.write(file_header(64) + info_header(8, 8, 8, compression=1) +
            b"\x00" * 64)


def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# planted-pair geometry: near-dups within the banded join's exact-recall
# band, cross-base pairs far outside it
for k in range(4):
    d = dist(hashes[f"base{k}.bmp"], hashes[f"near{k}.bmp"])
    assert 1 <= d <= 3, f"base{k}/near{k} dist {d} outside [1,3]"
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("base", "near"):
            for sb in ("base", "near"):
                d = dist(hashes[f"{sa}{a}.bmp"], hashes[f"{sb}{b}.bmp"])
                assert d > 3, f"{sa}{a}/{sb}{b} dist {d} <= 3"

# provenance: re-parse each written file and assert the pixels match
# the formula (bottom-up, 4-byte stride, BGR order)
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.bmp"
        b = open(f"{OUT}/{name}", "rb").read()
        off = struct.unpack("<I", b[10:14])[0]
        stride = (W * 3 + 3) // 4 * 4
        for y in range(H):
            srow = H - 1 - y
            for x in range(0, W, 17):
                p = off + srow * stride + x * 3
                assert b[p] == b[p + 1] == b[p + 2] == \
                    luma_at(k, near, x, y), (name, x, y)

con = duckdb.connect()
con.execute("CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, W, H, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", EXPECTED)
print({n: hex(hashes[n] & ((1 << 64) - 1)) for n in names})
