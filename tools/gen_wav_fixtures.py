#!/usr/bin/env python3
"""Author fixtures/audio/*.wav and fixtures/audio_expected.parquet — the
q170 WAV-decode oracle (same discipline as gen_media_expected.py: the
expected rows are computed from the sample GENERATOR FORMULA, never by
running the Spark decoder, so the oracle is independent of the code
under test; the script re-parses the bytes it wrote and asserts they
match the formula before writing the parquet).

Valid fixtures (must decode):
  pcm16_mono_8k.wav    16-bit mono 8 kHz, 2048 frames, plus a LIST
                       metadata chunk with an ODD payload size before
                       `data` (exercises chunk skipping + word padding)
  pcm16_stereo_44k.wav 16-bit stereo 44.1 kHz, 1000 frames
  pcm8_mono_11k.wav    8-bit unsigned mono 11025 Hz, 500 frames

Adversarial fixtures (must be SKIPPED, not fail the scan):
  float32.wav          fmt code 3 (IEEE float) — unsupported format
  truncated.wav        data chunk header claims more bytes than present

Sample formulas (all-integer):
  16-bit: s(i, ch) = ((i*773 + ch*131) % 4001) - 2000
  8-bit:  v(i)     = (i*37 + 11) % 256   (amplitude = v - 128)
"""
import struct
import duckdb

OUT = "/root/repo/fixtures/audio"
EXPECTED = "/root/repo/fixtures/audio_expected.parquet"


def s16(i, ch):
    return ((i * 773 + ch * 131) % 4001) - 2000


def v8(i):
    return (i * 37 + 11) % 256


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


def write(name, data):
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)


import os
os.makedirs(OUT, exist_ok=True)

# pcm16 mono with an odd-sized LIST chunk before data
mono = b"".join(struct.pack("<h", s16(i, 0)) for i in range(2048))
write("pcm16_mono_8k.wav", riff(
    chunk(b"LIST", b"INFOmeta!"),          # 9 bytes: odd, gets a pad byte
    fmt_chunk(1, 1, 8000, 16),
    chunk(b"data", mono)))

# pcm16 stereo: frames interleave ch0, ch1
stereo = b"".join(struct.pack("<hh", s16(i, 0), s16(i, 1)) for i in range(1000))
write("pcm16_stereo_44k.wav", riff(fmt_chunk(1, 2, 44100, 16),
                                   chunk(b"data", stereo)))

# pcm8 unsigned mono
p8 = bytes(v8(i) for i in range(500))
write("pcm8_mono_11k.wav", riff(fmt_chunk(1, 1, 11025, 8),
                                chunk(b"data", p8)))

# adversarial: float format code (must be skipped)
write("float32.wav", riff(fmt_chunk(3, 1, 8000, 32),
                          chunk(b"data", b"\x00" * 64)))

# adversarial: data chunk size overruns the file (must be skipped)
trunc = riff(fmt_chunk(1, 1, 8000, 16),
             b"data" + struct.pack("<I", 10_000) + b"\x00" * 8)
write("truncated.wav", trunc)

# Expected rows from the FORMULA (names sorted for readability only)
def expect16(n, nch):
    amps = [abs(s16(i, ch)) for i in range(n) for ch in range(nch)]
    return sum(amps), max(amps)


def expect8(n):
    amps = [abs(v8(i) - 128) for i in range(n)]
    return sum(amps), max(amps)


rows = []
sa, pk = expect16(2048, 1)
rows.append(("pcm16_mono_8k.wav", 8000, 1, 16, 2048, sa, pk))
sa, pk = expect16(1000, 2)
rows.append(("pcm16_stereo_44k.wav", 44100, 2, 16, 1000, sa, pk))
sa, pk = expect8(500)
rows.append(("pcm8_mono_11k.wav", 11025, 1, 8, 500, sa, pk))

# Provenance: re-parse the written valid files and assert the payload
# bytes reproduce the formula.
for name, rate, ch, bits, nframes, _, _ in rows:
    b = open(f"{OUT}/{name}", "rb").read()
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE", name
    off, data = 12, None
    while off + 8 <= len(b):
        cid, size = b[off:off + 4], struct.unpack("<I", b[off + 4:off + 8])[0]
        if cid == b"data":
            data = b[off + 8:off + 8 + size]
            break
        off += 8 + size + (size % 2)
    assert data is not None, name
    if bits == 16:
        got = list(struct.unpack(f"<{nframes * ch}h", data))
        want = [s16(i, c) for i in range(nframes) for c in range(ch)]
    else:
        got, want = list(data), [v8(i) for i in range(nframes)]
    assert got == want, f"{name}: written bytes != generator formula"

con = duckdb.connect()
con.execute("""CREATE TABLE t (name VARCHAR, sample_rate INTEGER,
               channels INTEGER, bits INTEGER, n_frames BIGINT,
               sum_abs BIGINT, peak_abs INTEGER)""")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?)", rows)
con.execute(f"COPY t TO '{EXPECTED}' (FORMAT parquet)")
print("wrote", rows)
