#!/usr/bin/env python3
"""Author fixtures/video_avi/* and fixtures/video_avi_expected.parquet
— the q374/q375 MJPEG-in-AVI oracle.

RUN AFTER gen_jpeg_fixtures.py: the AVI frames ARE the certified JPEG
fixtures' bytes, containered verbatim (asserted), so the expected
per-frame hashes come from images_jpeg_expected.parquet — already the
product of that generator's INDEPENDENT decoder. No JPEG codec lives
here; the provenance chain is:
  jpeg generator encodes + independently decodes → expected hash
  this script embeds the SAME BYTES in an AVI           (byte-assert)
  Spark decodes the container + frames                  (q374 gate)

CONTAINER (AVI RIFF 1.0, little-endian): RIFF 'AVI ' → LIST hdrl
(avih + one LIST strl per stream: strh/strf) → LIST movi with 'NNdc'
frame chunks (NN = stream number, strh order) → idx1. Chunks pad to
EVEN length with a byte OUTSIDE the declared size (an odd JUNK chunk
pins the rule even when every JPEG is even-sized). An interleaved
'01wb' audio chunk between frames must not shift frame indices.

CROSS-ARC PAIR (q375): gstub.grf is the GRF1-stub re-encode of
cam0.avi — raw formula frames, same patterns — so the MJPEG capture
and the raw-codec copy pair at ALIGNED DISTANCE 0 (the q360 lossy
round-trip exactness, now on moving pictures). camnear.avi uses the
near patterns: distances in [1,3] per frame → also pairs.

Videos: 6 frames each, 64×64, sampled every 2 (q374's everyN) →
expected parquet carries frame indices 0, 2, 4.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/video_avi"
EXPECTED = "/root/repo/fixtures/video_avi_expected.parquet"
JPG = "/root/repo/fixtures/images_jpeg"
JPG_EXPECTED = "/root/repo/fixtures/images_jpeg_expected.parquet"
W = H = 64
SAMPLE_EVERY = 2

# the jpeg generator's pattern formulas (shared across the fixture
# family — gen_png/gen_tiff carry the same copies)
def base_l(k, x, y):
    if k == 0:
        return min(255, 2 * x + y // 8)
    if k == 1:
        return max(0, min(255, 128 - 2 * x + y // 8))
    if k == 2:
        return min(255, 2 * x + y // 8) if (y // 8) % 2 == 0 \
            else max(0, min(255, 128 - 2 * x + y // 8))
    return min(255, 3 * abs(x - 32) + y // 8)


def dhash_rows(w, h, rows):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        for x in range(w):
            cx, cy = x * 9 // w, y * 8 // h
            sums[cy][cx] += 1000 * rows[y][x]
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > \
                    sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


# ── container builders ──
def chunk(fourcc, payload):
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF pad, OUTSIDE the declared size
    return out


def lst(listtype, payload):
    return chunk(b"LIST", listtype + payload)


def strh(fcctype, handler):
    return chunk(b"strh", fcctype + handler + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 6, 0, 10000, 0)
        + struct.pack("<hhhh", 0, 0, W, H))


def strf_video():
    # BITMAPINFOHEADER with biCompression 'MJPG'
    return chunk(b"strf", struct.pack("<IiiHH", 40, W, H, 1, 24)
                 + b"MJPG" + struct.pack("<IiiII", W * H * 3, 0, 0, 0, 0))


def strf_audio():
    return chunk(b"strf", struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8))


def avih(n_streams, n_frames):
    return chunk(b"avih", struct.pack(
        "<IIIIIIIIII", 40000, 0, 0, 0, n_frames, 0, n_streams, 0, W, H)
        + b"\x00" * 16)


def avi_bytes(frames, *, handler=b"MJPG", with_audio=True,
              extra_vids=False, junk=True):
    strls = lst(b"strl", strh(b"vids", handler) + strf_video())
    n_streams = 1
    if with_audio:
        strls += lst(b"strl", strh(b"auds", b"\x00\x00\x00\x00")
                     + strf_audio())
        n_streams += 1
    if extra_vids:  # hostile: a second video stream
        strls += lst(b"strl", strh(b"vids", handler) + strf_video())
        n_streams += 1
    hdrl = lst(b"hdrl", avih(n_streams, len(frames)) + strls)
    movi = b"movi"
    for i, fb in enumerate(frames):
        movi += chunk(b"00dc", fb)
        if with_audio and i == 1:
            # interleaved audio between frames: must not shift indices
            movi += chunk(b"01wb", bytes(321))  # odd → pad exercised
    movi = chunk(b"LIST", movi)
    idx1 = chunk(b"idx1", b"\x00" * 16 * len(frames))
    junk_chunk = chunk(b"JUNK", b"odd") if junk else b""  # odd pad pin
    body = b"AVI " + hdrl + junk_chunk + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


os.makedirs(OUT, exist_ok=True)
jpg = {n: open(f"{JPG}/{n}.jpg", "rb").read()
       for n in ["base0", "base1", "base2", "base3",
                 "near0", "near1", "near2", "near3", "prog0"]}

cam0_frames = [jpg[n] for n in
               ["base0", "base1", "base2", "base3", "base0", "base1"]]
camnear_frames = [jpg[n] for n in
                  ["near0", "near1", "near2", "near3", "near0", "near1"]]
with open(f"{OUT}/cam0.avi", "wb") as f:
    f.write(avi_bytes(cam0_frames))
with open(f"{OUT}/camnear.avi", "wb") as f:
    f.write(avi_bytes(camnear_frames))
# the GRF1-stub re-encode: raw formula frames of the same patterns
gpx = bytearray()
for k in [0, 1, 2, 3, 0, 1]:
    for y in range(H):
        for x in range(W):
            gpx.append(base_l(k, x, y))
with open(f"{OUT}/gstub.grf", "wb") as f:
    f.write(b"GRF1" + bytes([2]) + struct.pack(">III", 6, W, H)
            + bytes(gpx))

# hostile / boundary arms — all must DROP
with open(f"{OUT}/h264.avi", "wb") as f:  # inter-frame codec: boundary
    f.write(avi_bytes(cam0_frames, handler=b"H264"))
with open(f"{OUT}/badframe.avi", "wb") as f:  # frame 2 is garbage
    f.write(avi_bytes(cam0_frames[:2] + [b"JUNK" * 64] + cam0_frames[3:]))
with open(f"{OUT}/progframe.avi", "wb") as f:  # SOF2 frame: not MJPEG
    f.write(avi_bytes(cam0_frames[:2] + [jpg["prog0"]] + cam0_frames[3:]))
with open(f"{OUT}/twovids.avi", "wb") as f:  # second video stream
    f.write(avi_bytes(cam0_frames, extra_vids=True))
cam0_bytes = open(f"{OUT}/cam0.avi", "rb").read()
with open(f"{OUT}/trunc.avi", "wb") as f:  # movi LIST overruns EOF
    f.write(cam0_bytes[:len(cam0_bytes) - 900])
with open(f"{OUT}/notavi.avi", "wb") as f:  # RIFF but not AVI
    f.write(b"RIFF" + struct.pack("<I", 20) + b"WAVE" + bytes(16))

# byte-provenance: every embedded frame payload is the certified jpg
# verbatim (walk the container back out)
def extract_00dc(b):
    frames, p = [], 12
    def walk(p, end):
        while p + 8 <= end:
            fid = b[p:p + 4]
            ln = struct.unpack("<I", b[p + 4:p + 8])[0]
            if fid == b"LIST":
                walk(p + 12, p + 8 + ln)
            elif fid == b"00dc":
                frames.append(b[p + 8:p + 8 + ln])
            p += 8 + ln + (ln & 1)
    walk(12, len(b))
    return frames

assert extract_00dc(cam0_bytes) == cam0_frames
assert extract_00dc(open(f"{OUT}/camnear.avi", "rb").read()) \
    == camnear_frames

# expected hashes: the jpeg generator's independent-decode results
con = duckdb.connect()
jhash = dict(con.execute(
    f"SELECT name, dhash FROM read_parquet('{JPG_EXPECTED}')").fetchall())
SAMPLED = [0, 2, 4]
plan = {  # name → sampled-frame hash sources
    "cam0.avi": [jhash["base0.jpg"], jhash["base2.jpg"], jhash["base0.jpg"]],
    "camnear.avi": [jhash["near0.jpg"], jhash["near2.jpg"],
                    jhash["near0.jpg"]],
}
# gstub: formula hashes — and they must EQUAL the jpeg ones (the
# lossy round trip is dHash-exact: the cross-arc distance-0 claim)
fhash = {k: dhash_rows(W, H, [[base_l(k, x, y) for x in range(W)]
                              for y in range(H)]) for k in (0, 2)}
assert fhash[0] == jhash["base0.jpg"], "pattern0 jpeg/formula slip"
assert fhash[2] == jhash["base2.jpg"], "pattern2 jpeg/formula slip"
plan["gstub.grf"] = [fhash[0], fhash[2], fhash[0]]


def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

# pair geometry: cam0↔gstub aligned distance 0; ↔camnear in [1,3]
for i in range(3):
    assert dist(plan["cam0.avi"][i], plan["gstub.grf"][i]) == 0
    d = dist(plan["cam0.avi"][i], plan["camnear.avi"][i])
    assert 1 <= d <= 3, (i, d)

con.execute("CREATE TABLE e (name VARCHAR, frame_index INT, "
            "width INT, height INT, dhash BIGINT)")
for name, hs in plan.items():
    for fi, hv in zip(SAMPLED, hs):
        con.execute("INSERT INTO e VALUES (?, ?, ?, ?, ?)",
                    [name, fi, W, H, hv])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", 3 * len(SAMPLED), "expected rows to", EXPECTED)
for name, hs in plan.items():
    print(" ", name, ["%#x" % (h & ((1 << 64) - 1)) for h in hs])
