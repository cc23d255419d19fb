#!/usr/bin/env python3
"""Author fixtures/audio_ahash/*.wav and
fixtures/audio_ahash_expected.parquet — the q327/q328 audio
near-dup oracle (the gen_dhash_fixtures.py discipline on the audio
modality: expected rows computed from the sample GENERATOR FORMULA by
an independent python implementation of the shared hash spec, never by
running the Spark decoder; bytes re-parsed and asserted before the
parquet is written).

aHash SPEC (shared contract with Multimodal.parseWavAHash — both sides
implement this paragraph independently):
  - operates on |amplitude| per SAMPLE in storage (interleaved) order:
    |s| for 16-bit signed PCM, |v - 128| for 8-bit unsigned;
  - 65 windows; sample i of n belongs to window i*65 // n (floor);
  - per-window integer |amplitude| sum;
  - bit j (0..63): set iff window j+1's AVERAGE strictly exceeds
    window j's, compared by cross-multiplied integer sums
    (S2*n1 > S1*n2) — no division, engine-exact, and GAIN-INVARIANT
    (an exact scalar gain scales both sides of every comparison);
  - files with fewer than 65 samples are SKIPPED (empty window).

Fixture plan (16-bit mono 8 kHz, 4096 samples, sign alternating per
sample so |amp| exercises abs):
  abase0  |amp| = 100 + 25*w          ascending envelope
  abase1  |amp| = 100 + 25*(64 - w)   descending
  abase2  |amp| = 500 + 400*(w % 2)   alternating windows
  abase3  |amp| = 100 + 30*|w - 32|   valley at the center
  anear0..anear3: the matching base with +500 on window 10's samples
    only — perturbs the (9,10) and (10,11) comparisons, flipping 1..3
    bits (ASSERTED per pair)
  short_64.wav: 64 samples — sub-window, must be SKIPPED
  float32_ah.wav: fmt code 3 — must be SKIPPED

The script asserts each (abase_k, anear_k) distance is in [1, 3] and
every cross-pattern distance exceeds 3, so q328's pair set is exactly
the four planted pairs.
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/audio_ahash"
EXPECTED = "/root/repo/fixtures/audio_ahash_expected.parquet"
N = 4096
RATE = 8000


def win(i, n=N):
    return i * 65 // n


def base_amp(k, w):
    if k == 0:
        return 100 + 25 * w
    if k == 1:
        return 100 + 25 * (64 - w)
    if k == 2:
        return 500 + 400 * (w % 2)
    return 100 + 30 * abs(w - 32)


def amp_at(k, near, i):
    w = win(i)
    a = base_amp(k, w)
    if near and w == 10:
        a += 500
    return a


def sample(k, near, i):
    a = amp_at(k, near, i)
    return a if i % 2 == 0 else -a


def ahash(amp, n=N):
    sums = [0] * 65
    cnts = [0] * 65
    for i in range(n):
        w = win(i, n)
        sums[w] += amp(i)
        cnts[w] += 1
    h = 0
    for j in range(64):
        if sums[j + 1] * cnts[j] > sums[j] * cnts[j + 1]:
            h |= 1 << j
    return h - (1 << 64) if h >= (1 << 63) else h


def chunk(cid, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def fmt_chunk(code, ch, rate, bits):
    block = ch * bits // 8
    return chunk(b"fmt ", struct.pack("<HHIIHH", code, ch, rate,
                                      rate * block, block, bits))


def riff(*chunks):
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


os.makedirs(OUT, exist_ok=True)

names, hashes = [], {}
for k in range(4):
    for near in (False, True):
        name = f"{'anear' if near else 'abase'}{k}.wav"
        data = b"".join(struct.pack("<h", sample(k, near, i))
                        for i in range(N))
        with open(f"{OUT}/{name}", "wb") as f:
            f.write(riff(fmt_chunk(1, 1, RATE, 16), chunk(b"data", data)))
        names.append(name)
        hashes[name] = ahash(
            (lambda kk, nn: lambda i: amp_at(kk, nn, i))(k, near))

# skipped fixtures: sub-window length, and a float-format file
short = b"".join(struct.pack("<h", 100) for _ in range(64))
with open(f"{OUT}/short_64.wav", "wb") as f:
    f.write(riff(fmt_chunk(1, 1, RATE, 16), chunk(b"data", short)))
with open(f"{OUT}/float32_ah.wav", "wb") as f:
    f.write(riff(fmt_chunk(3, 1, RATE, 16), chunk(b"data", short)))


def dist(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


for k in range(4):
    d = dist(hashes[f"abase{k}.wav"], hashes[f"anear{k}.wav"])
    assert 1 <= d <= 3, f"abase{k}/anear{k} dist {d} outside [1,3]"
for a in range(4):
    for b in range(a + 1, 4):
        for sa in ("abase", "anear"):
            for sb in ("abase", "anear"):
                d = dist(hashes[f"{sa}{a}.wav"], hashes[f"{sb}{b}.wav"])
                assert d > 3, f"{sa}{a}/{sb}{b} dist {d} <= 3"

# provenance: re-parse each written file and assert samples match the
# formula (little-endian int16, data chunk at a fixed RIFF layout)
for k in range(4):
    for near in (False, True):
        name = f"{'anear' if near else 'abase'}{k}.wav"
        b = open(f"{OUT}/{name}", "rb").read()
        doff = b.index(b"data") + 8
        for i in range(0, N, 97):
            (v,) = struct.unpack("<h", b[doff + 2 * i: doff + 2 * i + 2])
            assert v == sample(k, near, i), (name, i, v)

con = duckdb.connect()
con.execute(
    "CREATE TABLE e (name VARCHAR, sample_rate INT, n_samples BIGINT, ahash BIGINT)")
for n in names:
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, RATE, N, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", EXPECTED)
print({n: hex(hashes[n] & ((1 << 64) - 1)) for n in names})
