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

# ═══════════ float-32 + IMA-ADPCM members — round 19 ═══════════
# Float (format 3): f = s / 32768.0; the decoder's amplitude is
# rint(|f|·32768) — the EXACT inverse (powers of two are exact in
# binary float), so the float re-encode hashes IDENTICALLY. The
# independent decode below re-derives the amps from the written bytes.
for k in (0, 3):
    name = f"fl{k}.wav"
    data = b"".join(struct.pack("<f", sample(k, False, i) / 32768.0)
                    for i in range(N))
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(riff(fmt_chunk(3, 1, RATE, 32), chunk(b"data", data)))
    b = open(f"{OUT}/{name}", "rb").read()
    doff = b.index(b"data") + 8
    amps = []
    for i in range(N):
        (fv,) = struct.unpack("<f", b[doff + 4 * i: doff + 4 * i + 4])
        # python round() and JVM Math.rint are both half-even; clamp
        # at full scale (over-range floats saturate — both sides)
        amps.append(min(32768, round(abs(fv) * 32768.0)))
        assert amps[-1] == abs(sample(k, False, i)), (name, i)
    names.append(name)
    hashes[name] = ahash(lambda i: amps[i])
    assert hashes[name] == hashes[f"abase{k}.wav"], f"{name} not exact"

# IMA/DVI ADPCM (format 17, mono): LOSSY — the oracle hash is the
# INDEPENDENT DECODE of the written nibbles (the q359 lossy-format
# discipline), and the planted envelopes have enough headroom that
# the member must still land within the cluster band (asserted).
IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767]
IMA_ADV = [-1, -1, -1, -1, 2, 4, 6, 8]
BA = 256                       # blockAlign
SPB = (BA - 4) * 2 + 1         # 505 samples per block
NB = 8                         # blocks
NA = NB * SPB                  # 4040 samples


def ima_step_update(pred, idx, n):
    """The DECODER's arithmetic — the encoder mirrors it so its state
    can never drift from a correct decoder (the gen_gif
    decoder-mirror discipline)."""
    step = IMA_STEP[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_ADV[n & 7]))
    return pred, idx


def ima_encode(samples):
    """Block predictor = the exact first sample; the first block's
    header index is seeded near the signal's step size so adaptation
    error never pollutes window 0."""
    first_delta = abs(samples[1] - samples[0]) or 1
    idx = max([i for i in range(89) if IMA_STEP[i] <= first_delta],
              default=0)
    out = bytearray()
    for b0 in range(0, len(samples), SPB):
        blk = samples[b0:b0 + SPB]
        pred = blk[0]
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in blk[1:]:
            step = IMA_STEP[idx]
            delta = s - pred
            n = 0
            if delta < 0:
                n = 8
                delta = -delta
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            pred, idx = ima_step_update(pred, idx, n)
            nibbles.append(n)
        for j in range(0, len(nibbles), 2):
            out.append(nibbles[j] | (nibbles[j + 1] << 4))
    return bytes(out)


def ima_decode_amps(data):
    amps = []
    for b0 in range(0, len(data), BA):
        pred, idx, _ = struct.unpack("<hBB", data[b0:b0 + 4])
        assert idx <= 88
        amps.append(abs(pred))
        for byte in data[b0 + 4:b0 + BA]:
            for n in (byte & 0x0F, byte >> 4):
                pred, idx = ima_step_update(pred, idx, n)
                amps.append(abs(pred))
    return amps


def fmt_adpcm():
    return chunk(b"fmt ", struct.pack("<HHIIHHHH", 17, 1, RATE,
                                      RATE * BA // SPB, BA, 4, 2, SPB))


for k in (0, 2):
    name = f"ad{k}.wav"
    # the ENVELOPE depends only on |amp| per window, so the ADPCM
    # member may carry a codec-friendly sign pattern (flip every 32
    # samples instead of every sample — per-sample alternation is a
    # full-swing square wave no delta codec tracks, measured 15 bits
    # adrift); the per-window averages equal the base pattern's, so
    # the expected cluster membership is unchanged
    src = [(lambda a, i: a if (i // 32) % 2 == 0 else -a)(
        base_amp(k, i * 65 // NA), i) for i in range(NA)]
    data = ima_encode(src)
    assert len(data) == NB * BA
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(riff(fmt_adpcm(), chunk(b"data", data)))
    amps = ima_decode_amps(open(f"{OUT}/{name}", "rb").read()
                           .split(b"data", 1)[1][4:])
    assert len(amps) == NA
    names.append(name)
    hashes[name] = ahash(lambda i: amps[i], n=NA)
    d0 = bin((hashes[name] ^ hashes[f"abase{k}.wav"])
             & ((1 << 64) - 1)).count("1")
    assert d0 <= 3, f"{name}: ADPCM drifted out of the cluster ({d0})"

# hostile ADPCM / float arms — all must DROP
with open(f"{OUT}/adstereo.wav", "wb") as f:  # stereo ADPCM: out
    f.write(riff(chunk(b"fmt ", struct.pack(
        "<HHIIHHHH", 17, 2, RATE, RATE, BA, 4, 2, SPB)),
        chunk(b"data", bytes(BA))))
with open(f"{OUT}/adshort.wav", "wb") as f:  # partial block
    f.write(riff(fmt_adpcm(), chunk(b"data", bytes(BA + 10))))
with open(f"{OUT}/adbadspb.wav", "wb") as f:  # spb/blockAlign mismatch
    f.write(riff(chunk(b"fmt ", struct.pack(
        "<HHIIHHHH", 17, 1, RATE, RATE, BA, 4, 2, SPB + 1)),
        chunk(b"data", bytes(BA))))
with open(f"{OUT}/adbadidx.wav", "wb") as f:  # header step index 90
    bad = struct.pack("<hBB", 0, 90, 0) + bytes(BA - 4)
    f.write(riff(fmt_adpcm(), chunk(b"data", bad)))
with open(f"{OUT}/flnan.wav", "wb") as f:  # a NaN sample: drop loudly
    data = b"".join(struct.pack("<f", 0.25) for _ in range(100))
    data = data[:200] + struct.pack("<f", float("nan")) + data[204:]
    f.write(riff(fmt_chunk(3, 1, RATE, 32), chunk(b"data", data)))

# skipped fixtures: sub-window length, and a MALFORMED float file
# (format 3 claiming 16-bit — float is 32-bit by definition)
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
# round-19 members stay clean of the WRONG clusters
for m, home in (("fl0.wav", 0), ("fl3.wav", 3), ("ad0.wav", 0),
                ("ad2.wav", 2)):
    for k in range(4):
        if k == home:
            continue
        for s in ("abase", "anear"):
            d = dist(hashes[m], hashes[f"{s}{k}.wav"])
            assert d > 3, f"{m} vs {s}{k} dist {d} <= 3"

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
    ns = NA if n.startswith("ad") else N
    con.execute("INSERT INTO e VALUES (?, ?, ?, ?)", [n, RATE, ns, hashes[n]])
con.execute(f"COPY e TO '{EXPECTED}' (FORMAT PARQUET)")
print("wrote", EXPECTED)
print({n: hex(hashes[n] & ((1 << 64) - 1)) for n in names})
