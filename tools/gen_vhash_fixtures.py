#!/usr/bin/env python3
"""Author fixtures/video_vhash/*.grf and
fixtures/video_vhash_expected.parquet — the q331/q332 perceptual
video-dedup oracle (the gen_dhash_fixtures.py discipline: expected rows
are computed from the frame GENERATOR FORMULA by an independent python
dHash implementation, never by running the Spark decoder; the script
re-parses the bytes it wrote and asserts they match the formula before
writing the parquet).

CONTAINER: the GRF1 video stub ("GRF1" | kind=2 | >III frames,w,h |
frames*w*h gray bytes) — Multimodal.frameSample's format. Frames are
sampled every SAMPLE_EVERY (= 2), matching the q331 query, so the
expected parquet carries ONLY sampled frame indices 0,2,...,10.

PER-FRAME dHash SPEC (shared contract with Multimodal.dHashFrames —
both sides implement this paragraph independently): the BMP dHash
grid verbatim — 9 cols x 8 rows, pixel (x, y) in cell (x*9 // w,
y*8 // h), per-cell luma sum with a gray pixel g counting g*1000
(the r=g=b case of the 299/587/114 weighting), bit (cy*8 + cx) set
iff cell (cx+1, cy)'s average strictly exceeds cell (cx, cy)'s by
cross-multiplied integer sums. Frames narrower than 9 or shorter
than 8 px are SKIPPED.

VIDEO NEAR-DUP CONTRACT (q332, tau = 1/2, maxDist = 3): videos a < b
pair iff  2 * |{sampled f : dist(h_a[f], h_b[f]) <= 3}| >= min(n_a, n_b).

Fixture plan (64x64, 12 frames, temporal phase drives per-frame
variation so the 6 sampled hashes per video are NOT all identical —
asserted):
  vbase0  l = min(255, 2x + y//8 + 6f)            ascending, brightening
  vbase1  l = clamp(128 - 2x + y//8 + 6f)         descending, brightening
  vbase2  row-blocks alternate the two gradients  (with the 6f term)
  vbase3  l = min(255, 3*|x - 32 + f| + y//8)     drifting valley
  vnear0..3: the matching base with +40 luma on cell (4, 0) — x in
    [29, 36), y in [0, 8) — on EVERY frame; per-sampled-frame distance
    asserted <= 3 (a 0 at some phases is fine — still a match — but
    at least one frame must differ), so matched = 6/6 -> pair.
  vpart0: frames 0..6 = vnear0's frames, frames 7..11 = vbase1's
    frames. Sampled matches vs vbase0/vnear0 at f = 0,2,4,6 -> 4/6,
    2*4 >= 6 -> PAIRS; vs vbase1 at f = 8,10 -> 2/6 -> no pair.
  vfrag0: frames 0..3 = vnear0's frames, frames 4..11 = vbase3's
    frames SHIFTED (+3 on the valley term) so they are far from
    everything (asserted > 3). Sampled matches vs vbase0/vnear0 at
    f = 0,2 -> 2/6 -> NO pair: the sub-threshold negative probe.
  tiny_6x4.grf: 6x4 frames — sub-grid, every frame SKIPPED.
  notvideo.grf: kind=0 image payload — frameSample drops it.

Expected pair set (id_a < id_b lexicographic), asserted below by a
brute-force all-pairs pass with no knowledge of the banding:
  (vbase0, vnear0) (vbase1, vnear1) (vbase2, vnear2) (vbase3, vnear3)
  (vbase0, vpart0) (vnear0, vpart0)
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/video_vhash"
EXPECTED = "/root/repo/fixtures/video_vhash_expected.parquet"
W = H = 64
FRAMES = 12
SAMPLE_EVERY = 2


def clamp(v):
    return max(0, min(255, v))


def base_l(k, f, x, y):
    # temporal variation is a HORIZONTAL PHASE (the gradient's wrap
    # point slides across cells with f) — a uniform brightness ramp
    # would leave every cross-multiplied comparison unchanged and the
    # per-frame hashes vacuously static (asserted below)
    xf = (x + 5 * f) % W
    if k == 0:
        return clamp(2 * xf + y // 8)
    if k == 1:
        return clamp(128 - 2 * xf + y // 8)
    if k == 2:
        return clamp(2 * xf + y // 8) if (y // 8) % 2 == 0 \
            else clamp(128 - 2 * xf + y // 8)
    return clamp(3 * abs(x - 32 + 2 * f) + y // 8)


def bump(l, x, y):
    return clamp(l + 40) if (29 <= x < 36 and 0 <= y < 8) else l


def luma_at(video, f, x, y):
    """The one formula both the file writer and the expected-hash
    computation share."""
    if video.startswith("vbase"):
        return base_l(int(video[5]), f, x, y)
    if video.startswith("vnear"):
        return bump(base_l(int(video[5]), f, x, y), x, y)
    if video == "vpart0":
        return bump(base_l(0, f, x, y), x, y) if f <= 6 \
            else base_l(1, f, x, y)
    if video == "vfrag0":
        return bump(base_l(0, f, x, y), x, y) if f <= 3 \
            else clamp(3 * abs(x - 32 + 2 * f + 7) + y // 8 + 17)
    raise ValueError(video)


def dhash_frame(video, f, w=W, h=H):
    sums = [[0] * 9 for _ in range(8)]
    cnts = [[0] * 9 for _ in range(8)]
    for y in range(h):
        cy = y * 8 // h
        for x in range(w):
            cx = x * 9 // w
            sums[cy][cx] += 1000 * luma_at(video, f, x, y)
            cnts[cy][cx] += 1
    hh = 0
    for cy in range(8):
        for cx in range(8):
            if sums[cy][cx + 1] * cnts[cy][cx] > sums[cy][cx] * cnts[cy][cx + 1]:
                hh |= 1 << (cy * 8 + cx)
    return hh - (1 << 64) if hh >= (1 << 63) else hh


def grf_video(video, frames=FRAMES, w=W, h=H):
    px = bytearray()
    for f in range(frames):
        for y in range(h):
            for x in range(w):
                px.append(luma_at(video, f, x, y))
    return b"GRF1" + bytes([2]) + struct.pack(">III", frames, w, h) + bytes(px)


VIDEOS = [f"vbase{k}" for k in range(4)] + [f"vnear{k}" for k in range(4)] \
    + ["vpart0", "vfrag0"]

os.makedirs(OUT, exist_ok=True)
for v in VIDEOS:
    with open(f"{OUT}/{v}.grf", "wb") as fh:
        fh.write(grf_video(v))

# skipped fixtures: sub-grid frames, and a non-video payload
tiny = b"GRF1" + bytes([2]) + struct.pack(">III", 2, 6, 4) + bytes(48)
with open(f"{OUT}/tiny_6x4.grf", "wb") as fh:
    fh.write(tiny)
img = b"GRF1" + bytes([0]) + struct.pack(">III", 8, 8, 1) + bytes(64)
with open(f"{OUT}/notvideo.grf", "wb") as fh:
    fh.write(img)

SAMPLED = list(range(0, FRAMES, SAMPLE_EVERY))
hashes = {(v, f): dhash_frame(v, f) for v in VIDEOS for f in SAMPLED}


def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# per-frame temporal variation is real (not all 6 hashes identical)
for v in VIDEOS:
    assert len({hashes[(v, f)] for f in SAMPLED}) >= 2, f"{v} static"

# planted near pairs: every sampled frame within the band (a 0 on
# some phase is fine — still a match — but the pair must not be a
# vacuous byte-identical copy: at least one frame must differ)
for k in range(4):
    ds = [dist(hashes[(f"vbase{k}", f)], hashes[(f"vnear{k}", f)])
          for f in SAMPLED]
    assert all(d <= 3 for d in ds), (k, ds)
    assert max(ds) >= 1, (k, ds)

# cross-pattern aligned distances all exceed the band (so partial
# videos match ONLY their intended donor frames)
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("vbase", "vnear"):
            for sb in ("vbase", "vnear"):
                for f in SAMPLED:
                    d = dist(hashes[(f"{sa}{a}", f)], hashes[(f"{sb}{b}", f)])
                    assert d > 3, (f"{sa}{a}", f"{sb}{b}", f, d)

# vfrag0's tail frames are far from EVERY other video's aligned frame
for v in VIDEOS:
    if v == "vfrag0":
        continue
    for f in SAMPLED:
        if f >= 4:
            d = dist(hashes[("vfrag0", f)], hashes[(v, f)])
            assert d > 3, (v, f, d)

# the brute-force pair pass (tau = 1/2, maxDist = 3) — no banding
n = len(SAMPLED)
pairs = set()
for i, a in enumerate(sorted(VIDEOS)):
    for b in sorted(VIDEOS)[i + 1:]:
        m = sum(1 for f in SAMPLED if dist(hashes[(a, f)], hashes[(b, f)]) <= 3)
        if 2 * m >= n:
            pairs.add((a, b))
WANT = {("vbase0", "vnear0"), ("vbase1", "vnear1"), ("vbase2", "vnear2"),
        ("vbase3", "vnear3"), ("vbase0", "vpart0"), ("vnear0", "vpart0")}
assert pairs == WANT, pairs ^ WANT

# provenance: re-parse each written file and assert pixels match the
# formula (header 4+1+12 bytes, then frames*w*h grays)
for v in VIDEOS:
    b = open(f"{OUT}/{v}.grf", "rb").read()
    frames, w, h = struct.unpack(">III", b[5:17])
    assert (frames, w, h) == (FRAMES, W, H)
    for f in range(0, FRAMES, 5):
        for y in range(0, H, 13):
            for x in range(0, W, 7):
                got = b[17 + f * W * H + y * W + x]
                assert got == luma_at(v, f, x, y), (v, f, x, y, got)

con = duckdb.connect()
con.execute("CREATE TABLE e (name VARCHAR, frame_index INT, width INT, "
            "height INT, dhash BIGINT)")
for v in VIDEOS:
    for f in SAMPLED:
        con.execute("INSERT INTO e VALUES (?, ?, ?, ?, ?)",
                    [f"{v}.grf", f, W, H, hashes[(v, f)]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", EXPECTED, "videos:", len(VIDEOS), "pairs:", sorted(pairs))
