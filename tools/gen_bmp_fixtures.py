#!/usr/bin/env python3
"""Author fixtures/images/*.bmp and fixtures/images_expected.parquet — the
q178 BMP-decode oracle (same discipline as gen_wav_fixtures.py: the
expected rows are computed from the pixel GENERATOR FORMULA, never by
running the Spark decoder, so the oracle is independent of the code
under test; the script re-parses the bytes it wrote and asserts they
match the formula before writing the parquet).

Valid fixtures (must decode):
  rgb24_37x25.bmp          24bpp bottom-up, width 37 → row stride 111
                           padded to 112 (exercises 4-byte row padding)
  rgb24_16x8_topdown.bmp   24bpp with NEGATIVE biHeight (top-down rows)
  rgb32_10x10.bmp          32bpp BI_RGB bottom-up (BGRA, alpha ignored)

Adversarial fixtures (must be SKIPPED, not fail the scan):
  rle8.bmp         biCompression=1 (BI_RLE8) — unsupported compression
  truncated.bmp    pixel array claims more bytes than present

Pixel formulas (all-integer, image-space coords: x right, y DOWN from
the top-left — bottom-up files store row y=h-1 first):
  b(x,y) = (x*7  + y*13)       % 256
  g(x,y) = (x*3  + y*5  + 17)  % 256
  r(x,y) = (x*11 + y*2  + 101) % 256
  a(x,y) = (x + y) % 256            (32bpp only; never in features)

Features (all-integer): n_px, per-channel sums, peak_luma_milli =
max over pixels of r*299 + g*587 + b*114 (ITU-R 601 luma ×1000 — kept
integer, never divided), and top_row_sum_r = Σ_x r(x, 0), which is
orientation-SENSITIVE: a decoder that forgets bottom-up row order gets
the bottom row's reds here and fails the oracle.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/images"
EXPECTED = "/root/repo/fixtures/images_expected.parquet"


def bchan(x, y):
    return (x * 7 + y * 13) % 256


def gchan(x, y):
    return (x * 3 + y * 5 + 17) % 256


def rchan(x, y):
    return (x * 11 + y * 2 + 101) % 256


def achan(x, y):
    return (x + y) % 256


def info_header(w, h_signed, bits, compression=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h_signed, 1, bits,
                       compression, 0, 2835, 2835, 0, 0)


def file_header(pixel_bytes):
    off = 14 + 40
    return struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)


def rows_bytes(w, h, bits, top_down):
    """Pixel array in STORAGE order (bottom-up unless top_down)."""
    px = 3 if bits == 24 else 4
    stride = (w * px + 3) // 4 * 4
    ys = range(h) if top_down else range(h - 1, -1, -1)
    out = bytearray()
    for y in ys:
        row = bytearray()
        for x in range(w):
            row += bytes([bchan(x, y), gchan(x, y), rchan(x, y)])
            if bits == 32:
                row.append(achan(x, y))
        row += b"\x00" * (stride - len(row))
        out += row
    return bytes(out)


def write(name, data):
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)


os.makedirs(OUT, exist_ok=True)

specs = [("rgb24_37x25.bmp", 37, 25, 24, False),
         ("rgb24_16x8_topdown.bmp", 16, 8, 24, True),
         ("rgb32_10x10.bmp", 10, 10, 32, False)]

for name, w, h, bits, td in specs:
    pix = rows_bytes(w, h, bits, td)
    write(name, file_header(len(pix)) +
          info_header(w, -h if td else h, bits) + pix)

# adversarial: RLE8-compressed (must be skipped)
write("rle8.bmp", file_header(64) + info_header(8, 8, 8, compression=1) +
      b"\x00" * 64)

# adversarial: pixel array overruns the file (must be skipped) — header
# and bfOffBits claim a 24bpp 50x50 image but only 8 pixel bytes follow
write("truncated.bmp", file_header(50 * 50 * 3) + info_header(50, 50, 24) +
      b"\x00" * 8)


def expect(w, h):
    sum_r = sum(rchan(x, y) for x in range(w) for y in range(h))
    sum_g = sum(gchan(x, y) for x in range(w) for y in range(h))
    sum_b = sum(bchan(x, y) for x in range(w) for y in range(h))
    peak = max(rchan(x, y) * 299 + gchan(x, y) * 587 + bchan(x, y) * 114
               for x in range(w) for y in range(h))
    top = sum(rchan(x, 0) for x in range(w))
    return w * h, sum_r, sum_g, sum_b, peak, top


rows = [(name, w, h, bits) + expect(w, h) for name, w, h, bits, _ in specs]

# Provenance: re-parse the written valid files and assert the pixel
# bytes reproduce the formula in image-space coordinates.
for name, w, h, bits, td in specs:
    b = open(f"{OUT}/{name}", "rb").read()
    assert b[:2] == b"BM", name
    off = struct.unpack("<I", b[10:14])[0]
    bw, bh = struct.unpack("<ii", b[18:26])
    assert bw == w and abs(bh) == h and (bh < 0) == td, name
    px = 3 if bits == 24 else 4
    stride = (w * px + 3) // 4 * 4
    for y in range(h):
        srow = y if td else h - 1 - y
        base = off + srow * stride
        for x in range(w):
            p = base + x * px
            assert b[p] == bchan(x, y) and b[p + 1] == gchan(x, y) \
                and b[p + 2] == rchan(x, y), (name, x, y)
            if bits == 32:
                assert b[p + 3] == achan(x, y), (name, x, y)

con = duckdb.connect()
con.execute("""CREATE TABLE t (name VARCHAR, width INTEGER, height INTEGER,
               bits INTEGER, n_px BIGINT, sum_r BIGINT, sum_g BIGINT,
               sum_b BIGINT, peak_luma_milli BIGINT, top_row_sum_r BIGINT)""")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?,?,?,?)", rows)
con.execute(f"COPY t TO '{EXPECTED}' (FORMAT parquet)")
print("wrote", rows)
