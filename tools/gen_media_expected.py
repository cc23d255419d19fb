#!/usr/bin/env python3
"""Author fixtures/media_expected.parquet — the q31 multimodal oracle.

The expected rows are computed from the GRF1 fixture GENERATOR formula
(pixel(x, y, ch) = (x*7 + y*13 + ch*31) % 256, pinned in MultimodalSpec),
NOT by running the Spark query — so the oracle is independent of the
code under test. As a provenance check, the script also re-parses the
actual fixtures/media/*.grf image payloads and asserts their bytes match
the formula before writing anything.
"""
import struct, sys
import duckdb

IMAGES = [("img_4x4x1.grf", 4, 4, 1),
          ("img_16x8x3.grf", 16, 8, 3),
          ("img_8x8x3.grf", 8, 8, 3)]


def formula_bytes(w, h, c):
    return sorted((x * 7 + y * 13 + ch * 31) % 256
                  for y in range(h) for x in range(w) for ch in range(c))


def file_payload(path):
    b = open(path, "rb").read()
    assert b[:4] == b"GRF1" and b[4] == 0, path
    w, h, c = struct.unpack(">iii", b[5:17])
    return w, h, c, sorted(b[17:17 + w * h * c])


rows = []
for name, w, h, c in IMAGES:
    fw, fh, fc, payload = file_payload(f"/root/repo/fixtures/media/{name}")
    assert (fw, fh, fc) == (w, h, c), name
    assert payload == formula_bytes(w, h, c), f"{name}: bytes != generator formula"
    mean = sum(formula_bytes(w, h, c)) / (w * h * c)
    rows.append((name, w, h, c, mean))

con = duckdb.connect()
con.execute("""CREATE TABLE t (name VARCHAR, width INTEGER, height INTEGER,
               channels INTEGER, meanIntensity DOUBLE)""")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
con.execute("COPY t TO '/root/repo/fixtures/media_expected.parquet' (FORMAT parquet)")
print("wrote", rows)
