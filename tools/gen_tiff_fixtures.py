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


# ── TIFF LZW (spec §13): MSB-first code packing, EARLY-CHANGE width
# bump (the table reaching 2^w - 1 entries grows the width -- one
# code EARLIER than GIF; libtiff's maxcodep rule). The encoder uses
# the gen_gif_fixtures.py decoder-mirror trick: it simulates the
# canonical decoder's dictionary state and sizes every emitted code
# to the width the decoder will hold when reading it, killing the
# encoder/decoder off-by-one divergence class by construction. ──
CLEAR, EOI = 256, 257


def lzw_encode(data, stats=None):
    bits = []
    dec = {"len": 258, "width": 9, "first": True}

    def emit(code):
        for i in range(dec["width"] - 1, -1, -1):  # MSB-first
            bits.append((code >> i) & 1)

    def emit_data(code):
        emit(code)
        if dec["first"]:
            dec["first"] = False
        elif dec["len"] < 4094:
            dec["len"] += 1
            if dec["len"] == (1 << dec["width"]) - 1 and dec["width"] < 12:
                dec["width"] += 1
                if stats is not None:
                    stats["max_width"] = max(stats.get("max_width", 9),
                                             dec["width"])

    def emit_clear():
        emit(CLEAR)
        dec["len"] = 258
        dec["width"] = 9
        dec["first"] = True

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit_clear()
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
        else:
            emit_data(table[w])
            table[wk] = nxt
            nxt += 1
            w = bytes([ch])
            if nxt == 4094:  # table full: reset (the decoder contract)
                emit_clear()
                table = {bytes([i]): i for i in range(256)}
                nxt = 258
                if stats is not None:
                    stats["resets"] = stats.get("resets", 0) + 1
    if w:
        emit_data(table[w])
    emit(EOI)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i:i + 8]):
            byte |= bit << (7 - j)
        out.append(byte)
    return bytes(out)


def lzw_decode(data, expect):
    """Independent decoder (the oracle side of the pair): raises on
    any malformed stream, returns exactly `expect` bytes."""
    pos = 0
    width = 9
    nbits = len(data) * 8

    def read():
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("truncated")
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        return v

    # next-to-assign index == len(table); 256/257 are placeholders
    table = [bytes([i]) for i in range(256)] + [None, None]
    if read() != CLEAR:
        raise ValueError("stream must open with a Clear")
    out = bytearray()
    prev = None
    while len(out) < expect:
        code = read()
        if code == EOI:
            raise ValueError("short stream")
        if code == CLEAR:
            del table[258:]
            width = 9
            prev = None
            continue
        if code > len(table) or (code == len(table) and prev is None):
            raise ValueError("beyond next-to-assign")
        if prev is None:
            if code >= 256:
                raise ValueError("first code after clear must be literal")
            s = table[code]
        elif len(table) < 4094:
            if code == len(table):  # KwKwK
                s = table[prev] + table[prev][:1]
                table.append(s)
            else:
                s = table[code]
                table.append(table[prev] + s[:1])
            # EARLY CHANGE: bump at 2^w - 1 (511/1023/2047)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        else:
            if code == len(table):
                raise ValueError("capped table cannot KwKwK")
            s = table[code]
        out += s
        if len(out) > expect:
            raise ValueError("overflows the strip budget")
        prev = code
    if read() != EOI:
        raise ValueError("exactly-full must be followed by EOI")
    return bytes(out)


def tiff_bytes(w, h, lum, *, big=False, rgb=False, white_is_zero=False,
               rows_per_strip=None, compression=1, bits=8,
               strips_override=None, lzw_stats=None, predictor=1):
    """Author a classic TIFF. Strip data follows the IFD. predictor=2
    forward-differences each row per sample channel (TIFF 6.0 §14)
    before the LZW pass — the real-world LZW shape (round 19)."""
    e = ">" if big else "<"
    spp = 3 if rgb else 1
    photometric = 2 if rgb else (0 if white_is_zero else 1)
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        row_bytes = bytearray()
        for y in range(y0, min(y0 + rps, h)):
            row = bytearray()
            for x in range(w):
                l = lum(x, y)
                v = (255 - l) if white_is_zero else l
                row += bytes([v] * spp if rgb else [v])
            if predictor == 2:
                # forward delta, right-to-left so each sample deltas
                # against the SAME channel one pixel left
                for i in range(len(row) - 1, spp - 1, -1):
                    row[i] = (row[i] - row[i - spp]) & 0xFF
            row_bytes += row
        strips.append(bytes(row_bytes))
    if compression == 5:
        strips = [lzw_encode(s, lzw_stats) for s in strips]
    if strips_override is not None:
        strips = strips_override(strips)
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
    if predictor != 1:
        tags.append((317, 3, 1, [predictor]))
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
    comp = tags.get(259, [1])[0]
    assert comp in (1, 5)
    photometric = tags[262][0]
    spp = tags.get(277, [1])[0]
    rps = tags.get(278, [h])[0]
    offs, cnts = tags[273], tags[279]
    pred = tags.get(317, [1])[0]
    assert pred == 1 or (pred == 2 and comp == 5)
    if comp == 5:
        # every strip is an independent LZW stream decoding to exactly
        # its rows' bytes
        parts = []
        for i, (o, c) in enumerate(zip(offs, cnts)):
            rows = min(rps, h - i * rps)
            parts.append(lzw_decode(b[o:o + c], rows * w * spp))
        data = b"".join(parts)
    else:
        data = b"".join(b[o:o + c] for o, c in zip(offs, cnts))
    if pred == 2:
        # inverse horizontal differencing: per row, per sample channel
        buf = bytearray(data)
        for y in range(h):
            base = y * w * spp
            for i in range(spp, w * spp):
                buf[base + i] = (buf[base + i] + buf[base + i - spp]) & 0xFF
        data = bytes(buf)
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

# ── LZW members of the clusters (round 18): each base pattern
# re-encoded with Compression 5, exercising byte order x strips x
# photometric UNDER the codec ──
lzw_specs = {
    0: dict(),                                     # LE gray, 1 strip
    1: dict(big=True, rows_per_strip=16),          # BE gray, 4 strips
    2: dict(rgb=True),                             # RGB chunky
    3: dict(white_is_zero=True, rows_per_strip=8), # inverted samples
}
lzw_stats = {}
for k in range(4):
    name = f"lzw{k}.tif"
    lum = (lambda kk: lambda x, y: luma_at(kk, False, x, y))(k)
    st = {}
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(tiff_bytes(W, H, lum, compression=5, lzw_stats=st,
                           **lzw_specs[k]))
    lzw_stats[name] = st
    names.append(name)
    hashes[name] = dhash(lum)
# the RGB member (12288 symbols) must cross the first EARLY-CHANGE
# boundary, or the width schedule is untested
assert lzw_stats["lzw2.tif"].get("max_width", 9) >= 10, lzw_stats

# high-entropy singleton: pushes the dictionary to 4094 (mid-stream
# CLEAR + width 12 both load-bearing); quadratic/hash-style formula
# per the fixture-spread discipline
def noise_l(x, y):
    return (x * x * 31 + y * y * 17 + x * y * 7 + x + 3 * y) % 256

st = {}
with open(f"{OUT}/lzwnoise.tif", "wb") as f:
    f.write(tiff_bytes(W, H, noise_l, rgb=True, rows_per_strip=64,
                       compression=5, lzw_stats=st))
assert st.get("max_width", 9) == 12 and st.get("resets", 0) >= 1, st
names.append("lzwnoise.tif")
hashes["lzwnoise.tif"] = dhash(noise_l)

# ── Predictor 2 (horizontal differencing) members — round 19: the
# variant real scanned-document corpora actually emit (the delta is
# what makes LZW compress continuous-tone data). Gray single-strip,
# BIG-endian multi-strip, RGB chunky (the per-SAMPLE delta: R deltas
# against R, G against G, B against B — a byte-wise delta would smear
# channels), and the high-entropy noise pattern (mod-256 wraparound
# deltas under the full width schedule). All lossless → exact members
# of their clusters. ──
p2_specs = {
    "p2lzw0.tif": (0, dict()),
    "p2lzw1.tif": (1, dict(big=True, rows_per_strip=16)),
    "p2lzw2.tif": (2, dict(rgb=True)),
}
for name, (k, spec) in p2_specs.items():
    lum = (lambda kk: lambda x, y: luma_at(kk, False, x, y))(k)
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(tiff_bytes(W, H, lum, compression=5, predictor=2, **spec))
    names.append(name)
    hashes[name] = dhash(lum)
with open(f"{OUT}/p2noise.tif", "wb") as f:
    f.write(tiff_bytes(W, H, noise_l, rgb=True, rows_per_strip=64,
                       compression=5, predictor=2))
names.append("p2noise.tif")
hashes["p2noise.tif"] = dhash(noise_l)
# hostile predictor arms: predictor 2 WITHOUT LZW and an unknown
# predictor value — both out of contract, must drop
with open(f"{OUT}/p2raw.tif", "wb") as f:
    f.write(tiff_bytes(W, H, lambda x, y: luma_at(0, False, x, y),
                       predictor=2))
with open(f"{OUT}/p2bad.tif", "wb") as f:
    f.write(tiff_bytes(W, H, lambda x, y: luma_at(0, False, x, y),
                       compression=5, predictor=3))

# out-of-contract fixtures
with open(f"{OUT}/nottiff.tif", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
# compression 5 whose strip bytes are NOT an LZW stream (the raw
# pixels -- the first 9 bits are not a ClearCode): hostile, must drop
raw_gray = bytes(bytearray(x % 256 for y in range(H) for x in range(W)))
with open(f"{OUT}/lzw.tif", "wb") as f:
    f.write(tiff_bytes(W, H, lambda x, y: x % 256, compression=5,
                       strips_override=lambda s: [raw_gray]))
# a VALID stream truncated mid-codes (the byte count matches the cut,
# so only the decode itself can reject it)
with open(f"{OUT}/lzwtrunc.tif", "wb") as f:
    f.write(tiff_bytes(W, H, lambda x, y: luma_at(0, False, x, y),
                       compression=5,
                       strips_override=lambda s: [s[0][:len(s[0]) // 2]]))
# an OVERSUBSCRIBED code right after the Clear: 9-bit codes
# [Clear=256, 65, 300] -- 300 > next-to-assign 259 -- then padding
with open(f"{OUT}/lzwover.tif", "wb") as f:
    over_bits = "".join(format(c, "09b") for c in (256, 65, 300))
    over_bits += "0" * (-len(over_bits) % 8)
    over = bytes(int(over_bits[i:i + 8], 2)
                 for i in range(0, len(over_bits), 8))
    f.write(tiff_bytes(W, H, lambda x, y: luma_at(0, False, x, y),
                       compression=5,
                       strips_override=lambda s: [over]))
with open(f"{OUT}/deep16.tif", "wb") as f:  # 16-bit samples claimed
    f.write(tiff_bytes(W, H, lambda x, y: x % 256, bits=16))
ok = open(f"{OUT}/base1.tif", "rb").read()
with open(f"{OUT}/trunc.tif", "wb") as f:  # strip data past EOF
    f.write(ok[:len(ok) - 600])
with open(f"{OUT}/tiny_8x4.tif", "wb") as f:
    f.write(tiff_bytes(8, 4, lambda x, y: 7 * x))

# provenance: independently decode every in-contract file (the LZW
# members re-decode through the independent lzw_decode mirror)
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.tif"
        w, h, lum = decode_tiff_luma(open(f"{OUT}/{name}", "rb").read())
        assert (w, h) == (W, H), name
        for y in range(H):
            for x in range(W):
                want = 1000 * luma_at(k, near, x, y)
                assert lum[y][x] == want, (name, x, y, lum[y][x], want)
for k in range(4):
    name = f"lzw{k}.tif"
    w, h, lum = decode_tiff_luma(open(f"{OUT}/{name}", "rb").read())
    assert (w, h) == (W, H), name
    for y in range(H):
        for x in range(W):
            want = 1000 * luma_at(k, False, x, y)
            assert lum[y][x] == want, (name, x, y, lum[y][x], want)
w, h, lum = decode_tiff_luma(open(f"{OUT}/lzwnoise.tif", "rb").read())
assert (w, h) == (W, H)
for y in range(H):
    for x in range(W):
        nl = noise_l(x, y)
        want = nl * 299 + nl * 587 + nl * 114
        assert lum[y][x] == want, ("lzwnoise", x, y, lum[y][x], want)
# predictor-2 members: independent decode (inverse delta applied by
# the MIRROR decoder, never the encoder's buffer) must reproduce the
# formula pixels exactly
for name, (k, spec) in p2_specs.items():
    w, h, lum = decode_tiff_luma(open(f"{OUT}/{name}", "rb").read())
    assert (w, h) == (W, H), name
    for y in range(H):
        for x in range(W):
            l = luma_at(k, False, x, y)
            want = (l * 299 + l * 587 + l * 114) if "rgb" in spec \
                else l * 1000
            assert lum[y][x] == want, (name, x, y, lum[y][x], want)
w, h, lum = decode_tiff_luma(open(f"{OUT}/p2noise.tif", "rb").read())
assert (w, h) == (W, H)
for y in range(H):
    for x in range(W):
        nl = noise_l(x, y)
        want = nl * 299 + nl * 587 + nl * 114
        assert lum[y][x] == want, ("p2noise", x, y, lum[y][x], want)
# and the delta actually changed the wire bytes (non-vacuity)
assert open(f"{OUT}/p2lzw0.tif", "rb").read() != \
    open(f"{OUT}/lzw0.tif", "rb").read()

# planted-pair geometry (matches the other formats by construction)
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    d = dist(hashes[f"base{k}.tif"], hashes[f"near{k}.tif"])
    assert 1 <= d <= 3
    # LZW re-encode of the base pattern: exact cluster member
    assert hashes[f"lzw{k}.tif"] == hashes[f"base{k}.tif"], k
for name, (k, spec) in p2_specs.items():
    # predictor-2 re-encodes are exact cluster members
    assert hashes[name] == hashes[f"base{k}.tif"], name
assert hashes["p2noise.tif"] == hashes["lzwnoise.tif"]
# the noise pair joins NO planted cluster
for n2 in names:
    if n2 not in ("lzwnoise.tif", "p2noise.tif"):
        assert dist(hashes["lzwnoise.tif"], hashes[n2]) > 3, n2
con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n2 in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n2, W, H, hashes[n2]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows")
