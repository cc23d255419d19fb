#!/usr/bin/env python3
"""Author fixtures/images_gif/*.gif and
fixtures/images_gif_expected.parquet — the q361/q362 GIF perceptual
image-dedup oracle (the gen_png_fixtures.py discipline: lossless
format, so the expected hash comes from the formula pixels; the
script also independently DECODES the bytes it wrote — sub-block
reassembly + LSB-first LZW + palette application + interlace
reordering — and asserts pixel-exact provenance before writing the
parquet).

SHARED DECODE SPEC (implemented here and in Multimodal.parseGifDHash
independently):
  - GIF87a / GIF89a; logical screen descriptor; extensions (0x21)
    skipped sub-block-wise; the FIRST image descriptor is decoded and
    the file's hash is the FIRST FRAME's (animation = frame stream;
    dedup keys on the poster frame).
  - The first frame must sit at (0,0) with the logical screen's full
    size (a partial first frame is out of contract — skipped).
  - Color table: local overrides global; no table at all → skip.
    Luma of palette entry (r,g,b) = r·299 + g·587 + b·114 (the shared
    weighting; transparency is IGNORED — the indexed color is used).
  - LZW: LSB-first bit packing across sub-blocks, initial code size
    from the image data's min-code-size byte, CLEAR/EOI codes,
    dictionary growth to 4096 with the KwKwK case, code width grows
    at 2^width (max 12), deferred-clear tolerated. Truncated streams
    or streams that end before w·h pixels → skip.
  - INTERLACED images are SUPPORTED (the four-pass row order
    0/8, 4/8, 2/4, 1/2 — trivial next to PNG's Adam7, and real GIFs
    use it).
  - Sub-grid (w<9 or h<8) skipped — the shared rule.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images_gif"
EXPECTED = "/root/repo/fixtures/images_gif_expected.parquet"
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


def dhash_lum(w, h, lum):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            cx, cy = x * 9 // w, y * 8 // h
            sums[cy][cx] += 1000 * lum(x, y)
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > \
                    sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


# ── LZW (encoder side): standard GIF variant, LSB-first packing.
# The WIDTH schedule is DECODER-DRIVEN: the encoder simulates the
# canonical decoder's dictionary state (one add per code read except
# the first after a clear; bump when len == 2^width) and sizes every
# emitted code to the width the decoder will be holding when it reads
# it — which kills the classic encoder/decoder off-by-one divergence
# class by construction. ──
def lzw_encode(indices, mcs):
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = eoi + 1
    out_bits = []
    # decoder-mirror state
    dec = {"len": base, "width": mcs + 1, "first": True}

    def emit(code):
        for i in range(dec["width"]):
            out_bits.append((code >> i) & 1)

    def emit_data(code):
        emit(code)
        # the decoder, upon reading this code, adds one entry (unless
        # it is the first code after a clear) and maybe bumps width
        if dec["first"]:
            dec["first"] = False
        elif dec["len"] < 4096:
            dec["len"] += 1
            if dec["len"] == (1 << dec["width"]) and dec["width"] < 12:
                dec["width"] += 1

    def emit_clear():
        emit(clear)
        dec["len"] = base
        dec["width"] = mcs + 1
        dec["first"] = True

    dict_ = {(i,): i for i in range(1 << mcs)}
    nxt = base
    emit_clear()
    w = ()
    for px in indices:
        wk = w + (px,)
        if wk in dict_:
            w = wk
        else:
            emit_data(dict_[w])
            dict_[wk] = nxt
            nxt += 1
            if nxt >= 4096:
                emit_clear()
                dict_ = {(i,): i for i in range(1 << mcs)}
                nxt = base
            w = (px,)
    if w:
        emit_data(dict_[w])
    emit(eoi)
    # pack LSB-first into bytes
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        b = 0
        for j, bit in enumerate(out_bits[i:i + 8]):
            b |= bit << j
        data.append(b)
    # sub-blocks of <=255 bytes
    out = bytearray([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


INTERLACE_ROWS = lambda h: \
    list(range(0, h, 8)) + list(range(4, h, 8)) + \
    list(range(2, h, 4)) + list(range(1, h, 2))


def gif_bytes(w, h, index_of, palette, version=b"89a", interlace=False,
              local_table=False, extensions=False, extra_frame=None):
    """index_of(x, y) -> palette index. palette: list of (r,g,b), len
    a power of two >= 2. extra_frame: (index_of2, palette2) appended
    as a SECOND image (animation; decoder hashes only the first)."""
    nbits = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF" + version)
    gct = not local_table
    packed = (0x80 if gct else 0) | ((nbits - 1) & 7)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    def table(pal):
        t = bytearray()
        for i in range(1 << nbits):
            r, g, b = pal[i] if i < len(pal) else (0, 0, 0)
            t += bytes([r, g, b])
        return t
    if gct:
        out += table(palette)
    if extensions:
        # graphic control + comment extensions — must be SKIPPED
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        out += bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    def frame(idx_of, pal, il):
        f = bytearray([0x2C])
        ipacked = (0x80 if local_table else 0) | (0x40 if il else 0) | \
            ((nbits - 1) & 7 if local_table else 0)
        f += struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
        if local_table:
            f += table(pal)
        rows = INTERLACE_ROWS(h) if il else list(range(h))
        indices = [idx_of(x, y) for y in rows for x in range(w)]
        f += lzw_encode(indices, max(2, nbits))
        return f
    out += frame(index_of, palette, interlace)
    if extra_frame is not None:
        out += frame(extra_frame[0], extra_frame[1], False)
    out += bytes([0x3B])  # trailer
    return bytes(out)


# ── independent decoder (the oracle side) ──
def decode_gif_first_luma(b):
    assert b[:3] == b"GIF" and b[3:6] in (b"87a", b"89a")
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    p = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = [(b[p + 3 * i], b[p + 3 * i + 1], b[p + 3 * i + 2])
               for i in range(n)]
        p += 3 * n
    while True:
        blk = b[p]
        if blk == 0x21:  # extension: label + sub-blocks
            p += 2
            while b[p] != 0:
                p += 1 + b[p]
            p += 1
        elif blk == 0x2C:
            break
        else:
            raise ValueError("unexpected block")
    il, it, iw, ih = struct.unpack("<HHHH", b[p + 1:p + 9])
    ipacked = b[p + 9]
    p += 10
    assert (il, it, iw, ih) == (0, 0, w, h)
    table = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 7)
        table = [(b[p + 3 * i], b[p + 3 * i + 1], b[p + 3 * i + 2])
                 for i in range(n)]
        p += 3 * n
    interlaced = (ipacked & 0x40) != 0
    mcs = b[p]
    p += 1
    data = bytearray()
    while b[p] != 0:
        n = b[p]
        data += b[p + 1:p + 1 + n]
        p += 1 + n
    # LZW decode, LSB-first
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0
    width = mcs + 1
    dict_ = [(i,) for i in range(1 << mcs)] + [None, None]
    out = []
    prev = None

    def read_code():
        nonlocal pos
        v = 0
        for i in range(width):
            byte = data[pos >> 3]
            v |= ((byte >> (pos & 7)) & 1) << i
            pos += 1
        return v

    need = w * h
    while len(out) < need:
        code = read_code()
        if code == clear:
            dict_ = [(i,) for i in range(1 << mcs)] + [None, None]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = dict_[code]
        else:
            if code < len(dict_):
                entry = dict_[code]
            else:  # KwKwK: the code being defined right now
                assert code == len(dict_), "LZW code out of range"
                entry = dict_[prev] + (dict_[prev][0],)
            if len(dict_) < 4096:  # deferred-clear: adds stop at 4096
                dict_.append(dict_[prev] + (entry[0],))
                if len(dict_) == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = code  # valid: a KwKwK code was just appended at `code`
    assert len(out) >= need, "short LZW stream"
    out = out[:need]
    rows = INTERLACE_ROWS(h) if interlaced else list(range(h))
    lum = [[0] * w for _ in range(h)]
    for ri, y in enumerate(rows):
        for x in range(w):
            r, g, bb = table[out[ri * w + x]]
            lum[y][x] = (r * 299 + g * 587 + bb * 114)
    return w, h, lum


def dhash_rows1000(w, h, lum):
    """lum rows already carry the 299/587/114-weighted luma."""
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            cx, cy = x * 9 // w, y * 8 // h
            sums[cy][cx] += lum[y][x]
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > \
                    sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


os.makedirs(OUT, exist_ok=True)
GRAY = [(i, i, i) for i in range(256)]
REV = [(255 - i, 255 - i, 255 - i) for i in range(256)]

names, hashes = [], {}
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.gif"
        lum = (lambda kk, nn: lambda x, y: luma_at(kk, nn, x, y))(k, near)
        if k == 0:    # 87a, global gray palette
            data = gif_bytes(W, H, lum, GRAY, version=b"87a")
        elif k == 1:  # 89a with extensions to skip
            data = gif_bytes(W, H, lum, GRAY, extensions=True)
        elif k == 2:  # INTERLACED
            data = gif_bytes(W, H, lum, GRAY, interlace=True)
        else:         # LOCAL reversed palette: index 255-l -> luma l
            lf = (lambda f: lambda x, y: 255 - f(x, y))(lum)
            data = gif_bytes(W, H, lf, REV, local_table=True)
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(data)
        names.append(name)
        hashes[name] = dhash_lum(W, H, lum)

# animation: 2 frames, FIRST is a quadratic pattern (isolated in
# q362), second is pattern 0 — hashing the second would collide
quad = lambda x, y: ((x * x + 3 * y) % 17) * 15
with open(f"{OUT}/ganim.gif", "wb") as f:
    f.write(gif_bytes(W, H, quad, GRAY,
                      extra_frame=(lambda x, y: luma_at(0, False, x, y),
                                   GRAY)))
names.append("ganim.gif")
hashes["ganim.gif"] = dhash_lum(W, H, quad)

# out-of-contract fixtures
ok = open(f"{OUT}/base0.gif", "rb").read()
with open(f"{OUT}/notgif.gif", "wb") as f:
    f.write(b"JUNKJUNKJUNKJUNK" * 8)
with open(f"{OUT}/trunc.gif", "wb") as f:
    f.write(ok[:len(ok) // 2])
with open(f"{OUT}/tiny_8x4.gif", "wb") as f:
    f.write(gif_bytes(8, 4, lambda x, y: 7 * x, GRAY))
with open(f"{OUT}/offset_frame.gif", "wb") as f:  # frame not at 0,0 full
    d = bytearray(gif_bytes(W, H, lambda x, y: x % 256, GRAY))
    at = d.index(0x2C, 13 + 768)
    d[at + 1:at + 3] = struct.pack("<H", 4)  # left = 4
    d[at + 5:at + 7] = struct.pack("<H", W - 4)
    f.write(bytes(d))
with open(f"{OUT}/notable.gif", "wb") as f:  # no color table anywhere
    d = gif_bytes(W, H, lambda x, y: x % 4, [(i, i, i) for i in range(4)])
    # clear the GCT flag and excise the table (4 entries x 3 bytes)
    d2 = bytearray(d)
    d2[10] &= 0x7F
    f.write(bytes(d2[:13]) + bytes(d2[13 + 12:]))

# provenance: independently DECODE every in-contract file and assert
# the luma matches the formula through palette + LZW + interlace
for k in range(4):
    for near in (False, True):
        name = f"{'near' if near else 'base'}{k}.gif"
        w, h, lum = decode_gif_first_luma(open(f"{OUT}/{name}", "rb").read())
        assert (w, h) == (W, H)
        for y in range(H):
            for x in range(W):
                want = 1000 * luma_at(k, near, x, y)
                assert lum[y][x] == want, (name, x, y, lum[y][x], want)
        assert dhash_rows1000(w, h, lum) == hashes[name], name
wq, hq, lq = decode_gif_first_luma(open(f"{OUT}/ganim.gif", "rb").read())
assert dhash_rows1000(wq, hq, lq) == hashes["ganim.gif"]

# planted-pair geometry + the q362 quad-capstone cleanliness
def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

for k in range(4):
    d = dist(hashes[f"base{k}.gif"], hashes[f"near{k}.gif"])
    assert 1 <= d <= 3, f"base{k}/near{k} dist {d}"
for a in range(4):
    for bq in range(a + 1, 4):
        for sa in ("base", "near"):
            for sb in ("base", "near"):
                assert dist(hashes[f"{sa}{a}.gif"],
                            hashes[f"{sb}{bq}.gif"]) > 3
for k in range(4):
    for s in ("base", "near"):
        assert dist(hashes["ganim.gif"], hashes[f"{s}{k}.gif"]) > 3

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, width INT, height INT, dhash BIGINT)")
for n in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, W, H, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", len(names), "expected rows to", EXPECTED)
for n in names:
    print(f"  {n}: {hashes[n]:#018x}" if hashes[n] >= 0
          else f"  {n}: -{-hashes[n]:#017x}")
