#!/usr/bin/env python3
"""Author fixtures/images_tiff/*.tif and
fixtures/images_tiff_expected.parquet — the q367/q368 TIFF perceptual
image-dedup oracle (lossless, so the gen_png_fixtures.py discipline:
expected hashes from the formula pixels; the script independently
re-parses its own bytes — IFD walk in BOTH byte orders, strip
reassembly, photometric application — and asserts pixel-exact
provenance).

SHARED DECODE SPEC (implemented here and in Multimodal.parseTiffDHash
independently):
  - classic TIFF, BOTH byte orders ("II"*little / "MM"*big, magic 42);
    FIRST IFD only;
  - 8-bit samples, Compression 1 (none), PhotometricInterpretation
    0 (WhiteIsZero — sample v carries luma (255−v), the photometric
    must be APPLIED, not passed through), 1 (BlackIsZero) or 2 (RGB,
    SamplesPerPixel 3, chunky); strips via StripOffsets/
    StripByteCounts/RowsPerStrip (SHORT or LONG arrays, inline when
    they fit the 4-byte value slot);
  - luma: gray g → g·1000 (inverted first under photometric 0),
    RGB → r·299 + g·587 + b·114 — the shared weighting;
  - out of contract (SKIP): any compression ≠ 1, bits ≠ 8, photometric
    ≥ 3 (palette TIFF is tag-structured differently anyway), planar
    configuration 2, tiled files (no strip tags), strip data past EOF,
    sub-grid (w<9 or h<8).
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images_tiff"
EXPECTED = "/root/repo/fixtures/images_tiff_expected.parquet"
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


def tiff_bytes(w, h, lum, *, big=False, rgb=False, white_is_zero=False,
               rows_per_strip=None, compression=1, bits=8):
    """Author a classic TIFF. Strip data follows the IFD."""
    e = ">" if big else "<"
    spp = 3 if rgb else 1
    photometric = 2 if rgb else (0 if white_is_zero else 1)
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        row_bytes = bytearray()
        for y in range(y0, min(y0 + rps, h)):
            for x in range(w):
                l = lum(x, y)
                v = (255 - l) if white_is_zero else l
                row_bytes += bytes([v] * spp if rgb else [v])
        strips.append(bytes(row_bytes))
    nstrips = len(strips)

    entries = []  # (tag, type, count, value_bytes_or_int, extra_data)

    def short_vals(vals):
        return b"".join(struct.pack(e + "H", v) for v in vals)

    def long_vals(vals):
        return b"".join(struct.pack(e + "I", v) for v in vals)

    # layout: header(8) + IFD + extra data region + strip data.
    # two passes: sizes first, then offsets.
    tags = []
    tags.append((256, 3, 1, [w]))            # ImageWidth SHORT
    tags.append((257, 3, 1, [h]))            # ImageLength
    tags.append((258, 3, spp, [bits] * spp)) # BitsPerSample
    tags.append((259, 3, 1, [compression]))
    tags.append((262, 3, 1, [photometric]))
    tags.append((273, 4, nstrips, None))     # StripOffsets (patched)
    tags.append((277, 3, 1, [spp]))
    tags.append((278, 3, 1, [rps]))
    tags.append((279, 4, nstrips, [len(s) for s in strips]))
    tags.sort(key=lambda t: t[0])
    n = len(tags)
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    extra_off = ifd_off + ifd_size
    # extras: any value list wider than 4 bytes
    extra = bytearray()
    placed = {}
    for tag, typ, cnt, vals in tags:
        size = cnt * (2 if typ == 3 else 4)
        if size > 4 and vals is not None:
            placed[tag] = extra_off + len(extra)
            extra += short_vals(vals) if typ == 3 else long_vals(vals)
    # strip offsets come after extras (reserve room for the offsets
    # array itself when nstrips > 1)
    so_extra = None
    if nstrips * 4 > 4:
        so_extra = extra_off + len(extra)
        extra += b"\x00" * (4 * nstrips)
    data_off = extra_off + len(extra)
    offs = []
    run = data_off
    for s in strips:
        offs.append(run)
        run += len(s)
    if so_extra is not None:
        extra[so_extra - extra_off:so_extra - extra_off + 4 * nstrips] = \
            long_vals(offs)

    out = bytearray()
    out += (b"MM" if big else b"II") + struct.pack(e + "H", 42) + \
        struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n)
    for tag, typ, cnt, vals in tags:
        ent = struct.pack(e + "HHI", tag, typ, cnt)
        if tag == 273:
            if nstrips == 1:
                ent += struct.pack(e + "I", offs[0])
            else:
                ent += struct.pack(e + "I", so_extra)
        else:
            size = cnt * (2 if typ == 3 else 4)
            if size <= 4:
                raw = short_vals(vals) if typ == 3 else long_vals(vals)
                ent += raw + b"\x00" * (4 - len(raw))
            else:
                ent += struct.pack(e + "I", placed[tag])
        out += ent
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    out += extra
    for s in strips:
        out += s
    return bytes(out)


# ── independent decoder (the oracle side) ──
def decode_tiff_luma(b):
    if b[:2] == b"II":
        e = "<"
    elif b[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("magic")
    assert struct.unpack(e + "H", b[2:4])[0] == 42
    ifd = struct.unpack(e + "I", b[4:8])[0]
    n = struct.unpack(e + "H", b[ifd:ifd + 2])[0]
    tags = {}
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", b[o:o + 8])
        size = cnt * (2 if typ == 3 else 4)
        if size <= 4:
            raw = b[o + 8:o + 8 + size]
        else:
            off = struct.unpack(e + "I", b[o + 8:o + 12])[0]
            raw = b[off:off + size]
        fmt = "H" if typ == 3 else "I"
        tags[tag] = list(struct.unpack(e + fmt * cnt, raw))
    w, h = tags[256][0], tags[257][0]
    assert tags.get(259, [1])[0] == 1
    photometric = tags[262][0]
    spp = tags.get(277, [1])[0]
    rps = tags.get(278, [h])[0]
    offs, cnts = tags[273], tags[279]
    data = b"".join(b[o:o + c] for o, c in zip(offs, cnts))
    lum = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            p = (y * w + x) * spp
            if spp == 3:
                lum[y][x] = data[p] * 299 + data[p + 1] * 587 + \
                    data[p + 2] * 114
            else:
                v = data[p]
                if photometric == 0:
                    v = 255 - v
                lum[y][x] = v * 1000
    return w, h, lum


os.makedirs(OUT, exist_ok=True)
names, hashes = [], {}
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.tif"
        lum = (lambda kk, nn: lambda x, y: luma_at(kk, nn, x, y))(k, near)
        if k == 0:    # little-endian gray, single strip
            data = tiff_bytes(W, H, lum)
        elif k == 1:  # BIG-endian gray, multi-strip (4 strips)
            data = tiff_bytes(W, H, lum, big=True, rows_per_strip=16)
        elif k == 2:  # RGB chunky, little-endian
            data = tiff_bytes(W, H, lum, rgb=True)
        else:         # WhiteIsZero: stored samples are INVERTED
            data = tiff_bytes(W, H, lum, white_is_zero=True,
                              rows_per_strip=8)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(data)
        names.append(name)
        hashes[name] = dhash(lum)

# out-of-contract fixtures
with open(f"{OUT}/nottiff.tif", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
with open(f"{OUT}/lzw.tif", "wb") as f:  # compression 5
    f.write(tiff_bytes(W, H, lambda x, y: x % 256, compression=5))
with open(f"{OUT}/deep16.tif", "wb") as f:  # 16-bit samples claimed
    f.write(tiff_bytes(W, H, lambda x, y: x % 256, bits=16))
ok = open(f"{OUT}/base1.tif", "rb").read()
with open(f"{OUT}/trunc.tif", "wb") as f:  # strip data past EOF
    f.write(ok[:len(ok) - 600])
with open(f"{OUT}/tiny_8x4.tif", "wb") as f:
    f.write(tiff_bytes(8, 4, lambda x, y: 7 * x))

# provenance: independently decode every in-contract file
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.tif"
        w, h, lum = decode_tiff_luma(open(f"{OUT}/{name}", "rb").read())
        assert (w, h) == (W, H), name
        for y in range(H):
            for x in range(W):
                want = 1000 * luma_at(k, near, x, y)
                assert lum[y][x] == want, (name, x, y, lum[y][x], want)

# planted-pair geometry (matches the other formats by construction)
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    d = dist(hashes[f"base{k}.tif"], hashes[f"near{k}.tif"])
    assert 1 <= d <= 3
con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n2 in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n2, W, H, hashes[n2]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows")
