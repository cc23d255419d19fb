#!/usr/bin/env python3
"""Author fixtures/video_seq/*.grf and
fixtures/video_seq_expected.parquet — the q335 time-shifted video
copy-detection oracle (the gen_vhash_fixtures.py discipline: expected
per-frame hashes computed by an independent python dHash from the
generator formula; files re-parsed and asserted before the parquet is
written).

WHY A SEPARATE FIXTURE SET: q331/q332's aligned-frame near-dup is
certified over video_vhash and must stay byte-stable; the SHIFTED
copies here would extend that oracle, so the sequence family gets its
own directory.

SEQUENCE CONTRACT (q335, k = 3, minShared = 2): each video's sampled
frame hashes, ordered by frame index, are shingled into k-tuples
joined as ':'-separated decimal strings; videos a < b pair iff they
share >= minShared DISTINCT shingles. A time-shifted UNEDITED copy
shares exact frame content, hence exact frame hashes, hence shingles —
regardless of offset; per-frame edits need the q332 aligned-hamming
rule instead (the two operators are complements).

Fixture plan (the gen_vhash formulas, frames addressed by FORMULA
index so a shifted copy reuses its donor's exact frames):
  sbase0..sbase3   frames f = formula(k, f), f in 0..11
  sshift0          frames f = formula(0, f + 2)  — sampled sequence
                   [g2 g4 g6 g8 g10 g12] vs sbase0's [g0 ... g10]:
                   3 shared 3-shingles -> PAIR (asserted)
  sshift2          frames f = formula(2, f + 4)  — 2 shared shingles
                   with sbase2: the minShared BOUNDARY from above
  snoshare0        frames f = formula(0, 2*f + 1) — every frame from
                   the sbase0 FAMILY but no 3 consecutive sampled
                   hashes align -> 0 shared shingles (negative probe)
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/video_seq"
EXPECTED = "/root/repo/fixtures/video_seq_expected.parquet"
W = H = 64
FRAMES = 12
SAMPLE_EVERY = 2
K = 3
MIN_SHARED = 2


def clamp(v):
    return max(0, min(255, v))


def formula(k, f, x, y):
    xf = (x + 5 * f) % W
    if k == 0:
        return clamp(2 * xf + y // 8)
    if k == 1:
        return clamp(128 - 2 * xf + y // 8)
    if k == 2:
        return clamp(2 * xf + y // 8) if (y // 8) % 2 == 0 \
            else clamp(128 - 2 * xf + y // 8)
    return clamp(3 * abs(x - 32 + 2 * f) + y // 8)


def frame_of(video, f):
    """-> (pattern k, formula frame index) for frame f of `video`."""
    if video.startswith("sbase"):
        return int(video[5]), f
    if video == "sshift0":
        return 0, f + 2
    if video == "sshift2":
        return 2, f + 4
    if video == "snoshare0":
        return 0, 2 * f + 1
    raise ValueError(video)


def dhash_frame(k, ff, w=W, h=H):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        cy = y * 8 // h
        for x in range(w):
            cx = x * 9 // w
            sums[cy][cx] += 1000 * formula(k, ff, x, y)
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


def grf_video(video):
    px = bytearray()
    for f in range(FRAMES):
        k, ff = frame_of(video, f)
        for y in range(H):
            for x in range(W):
                px.append(formula(k, ff, x, y))
    return b"GRF1" + bytes([2]) + struct.pack(">III", FRAMES, W, H) + bytes(px)


VIDEOS = [f"sbase{k}" for k in range(4)] + ["sshift0", "sshift2", "snoshare0"]

os.makedirs(OUT, exist_ok=True)
for v in VIDEOS:
    with open(f"{OUT}/{v}.grf", "wb") as fh:
        fh.write(grf_video(v))

SAMPLED = list(range(0, FRAMES, SAMPLE_EVERY))
hashes = {(v, f): dhash_frame(*frame_of(v, f)) for v in VIDEOS for f in SAMPLED}


def shingles(v):
    seq = [hashes[(v, f)] for f in SAMPLED]
    return {tuple(seq[i:i + K]) for i in range(len(seq) - K + 1)}


def shared(a, b):
    return len(shingles(a) & shingles(b))


# the planted geometry, asserted end to end
assert shared("sbase0", "sshift0") == 3, shared("sbase0", "sshift0")
assert shared("sbase2", "sshift2") == MIN_SHARED, shared("sbase2", "sshift2")
assert shared("sbase0", "snoshare0") == 0, shared("sbase0", "snoshare0")
pairs = set()
for i, a in enumerate(sorted(VIDEOS)):
    for b in sorted(VIDEOS)[i + 1:]:
        if shared(a, b) >= MIN_SHARED:
            pairs.add((a, b, shared(a, b)))
WANT = {("sbase0", "sshift0", 3), ("sbase2", "sshift2", 2)}
assert pairs == WANT, pairs ^ WANT

# shingle keys must be unambiguous: no video carries duplicate
# shingles (DISTINCT would silently change counts otherwise)
for v in VIDEOS:
    seq = [hashes[(v, f)] for f in SAMPLED]
    tups = [tuple(seq[i:i + K]) for i in range(len(seq) - K + 1)]
    assert len(tups) == len(set(tups)), v

# provenance: re-parse written files against the formula
for v in VIDEOS:
    b = open(f"{OUT}/{v}.grf", "rb").read()
    frames, w, h = struct.unpack(">III", b[5:17])
    assert (frames, w, h) == (FRAMES, W, H)
    for f in range(0, FRAMES, 5):
        k, ff = frame_of(v, f)
        for y in range(0, H, 13):
            for x in range(0, W, 7):
                assert b[17 + f * W * H + y * W + x] == formula(k, ff, x, y), \
                    (v, f, x, y)

con = duckdb.connect()
con.execute("CREATE TABLE e (name VARCHAR, frame_index INT, dhash BIGINT)")
for v in VIDEOS:
    for f in SAMPLED:
        con.execute("INSERT INTO e VALUES (?, ?, ?)",
                    [f"{v}.grf", f, hashes[(v, f)]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", EXPECTED, "pairs:", sorted(pairs))
