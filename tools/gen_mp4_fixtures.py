#!/usr/bin/env python3
"""Author fixtures/video/*.mp4 and fixtures/video_expected.parquet — the
q184 MP4-metadata oracle (same discipline as gen_wav_fixtures.py /
gen_bmp_fixtures.py: expected rows come from the GENERATOR SPEC, never
from the Spark decoder; the script re-walks the bytes it wrote and
asserts the box tree matches the spec before writing the parquet).

ISO base-media (ISO/IEC 14496-12, public spec) box structure only —
no codec payloads, which is the realistic shape for metadata scans:
ftyp (brand), moov > mvhd (timescale/duration), moov > trak > tkhd
(track id, 16.16 fixed-point width/height), skipped free/mdat.

Valid fixtures (must decode):
  vid_isom.mp4    ftyp isom, mvhd v0 timescale=1000 duration=7425,
                  2 traks (video 640x360, audio 0x0), free + mdat boxes
  vid_large.mp4   mdat uses the 64-bit LARGESIZE form (size==1) BEFORE
                  moov (exercises largesize walk), mvhd v0
                  timescale=90000 duration=123456, 1 trak 1920x1080
  vid_v1.mp4      mvhd and tkhd VERSION 1 (64-bit times/duration),
                  timescale=600 duration=3000, 1 trak 320x240

Adversarial fixtures (must be SKIPPED, not fail the scan):
  trunc.mp4       moov box size overruns the file
  notmp4.bin      not a box structure at all
"""
import os
import struct
import duckdb

OUT = "/root/repo/fixtures/video"
EXPECTED = "/root/repo/fixtures/video_expected.parquet"


def box(btype, payload, largesize=False):
    if largesize:
        return struct.pack(">I", 1) + btype + \
            struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def ftyp(brand):
    return box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")


def mvhd(timescale, duration, version=0):
    if version == 0:
        body = struct.pack(">BBBB", 0, 0, 0, 0) + \
            struct.pack(">IIII", 0, 0, timescale, duration)
    else:
        body = struct.pack(">BBBB", 1, 0, 0, 0) + \
            struct.pack(">QQIQ", 0, 0, timescale, duration)
    body += struct.pack(">i", 0x00010000)       # rate 1.0
    body += struct.pack(">h", 0x0100)           # volume 1.0
    body += b"\x00" * 10                        # reserved
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += b"\x00" * 24                        # pre_defined
    body += struct.pack(">I", 99)               # next_track_ID
    return box(b"mvhd", body)


def tkhd(track_id, duration, w, h, version=0):
    if version == 0:
        body = struct.pack(">BBBB", 0, 0, 0, 7) + \
            struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    else:
        body = struct.pack(">BBBB", 1, 0, 0, 7) + \
            struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8                         # reserved
    body += struct.pack(">hhhh", 0, 0, 0, 0)    # layer, group, volume, rsvd
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed point
    return box(b"tkhd", body)


def trak(track_id, duration, w, h, version=0):
    return box(b"trak", tkhd(track_id, duration, w, h, version))


def write(name, data):
    with open(f"{OUT}/{name}", "wb") as f:
        f.write(data)


os.makedirs(OUT, exist_ok=True)

write("vid_isom.mp4",
      ftyp(b"isom") +
      box(b"free", b"\x00" * 13) +
      box(b"moov", mvhd(1000, 7425) +
          trak(1, 7425, 640, 360) + trak(2, 7425, 0, 0)) +
      box(b"mdat", b"\xAB" * 200))

write("vid_large.mp4",
      ftyp(b"iso2") +
      box(b"mdat", b"\xCD" * 64, largesize=True) +
      box(b"moov", mvhd(90000, 123456) + trak(1, 123456, 1920, 1080)))

write("vid_v1.mp4",
      ftyp(b"isom") +
      box(b"moov", mvhd(600, 3000, version=1) +
          trak(7, 3000, 320, 240, version=1)))

# adversarial: moov size overruns the file
good = ftyp(b"isom") + box(b"moov", mvhd(1000, 10) + trak(1, 10, 64, 64))
bad = bytearray(good)
moov_off = len(ftyp(b"isom"))
bad[moov_off:moov_off + 4] = struct.pack(">I", 100000)
write("trunc.mp4", bytes(bad))

write("notmp4.bin", b"this is not an iso-bmff file, just bytes" * 3)

# (name, brand, timescale, duration_units, duration_ms, n_tracks, w, h)
rows = [
    ("vid_isom.mp4", "isom", 1000, 7425, 7425 * 1000 // 1000, 2, 640, 360),
    ("vid_large.mp4", "iso2", 90000, 123456, 123456 * 1000 // 90000, 1, 1920, 1080),
    ("vid_v1.mp4", "isom", 600, 3000, 3000 * 1000 // 600, 1, 320, 240),
]

# Provenance: independently re-walk the written box trees and assert
# brand/timescale/duration/tracks/dims reproduce the spec.
def walk(b, off, end):
    while off + 8 <= end:
        size = struct.unpack(">I", b[off:off + 4])[0]
        btype = b[off + 4:off + 8]
        payload = off + 8
        if size == 1:
            size = struct.unpack(">Q", b[off + 8:off + 16])[0]
            payload = off + 16
        if size < 8 or off + size > end:
            raise ValueError("bad box")
        yield btype, payload, off + size
        off += size


for name, brand, ts, dur, _, ntrk, w, h in rows:
    b = open(f"{OUT}/{name}", "rb").read()
    got = {"tracks": 0, "w": 0, "h": 0}
    for t, p, e in walk(b, 0, len(b)):
        if t == b"ftyp":
            assert b[p:p + 4].decode() == brand, name
        elif t == b"moov":
            for t2, p2, e2 in walk(b, p, e):
                if t2 == b"mvhd":
                    v = b[p2]
                    if v == 0:
                        got["ts"], got["dur"] = struct.unpack(">II", b[p2 + 12:p2 + 20])
                    else:
                        got["ts"] = struct.unpack(">I", b[p2 + 20:p2 + 24])[0]
                        got["dur"] = struct.unpack(">Q", b[p2 + 24:p2 + 32])[0]
                elif t2 == b"trak":
                    got["tracks"] += 1
                    for t3, p3, _ in walk(b, p2, e2):
                        if t3 == b"tkhd":
                            v = b[p3]
                            base = p3 + (24 if v == 0 else 36)
                            tw, th = struct.unpack(">II", b[base + 52:base + 60])
                            got["w"] = max(got["w"], tw >> 16)
                            got["h"] = max(got["h"], th >> 16)
    assert (got["ts"], got["dur"], got["tracks"], got["w"], got["h"]) == \
        (ts, dur, ntrk, w, h), (name, got)

con = duckdb.connect()
con.execute("""CREATE TABLE t (name VARCHAR, brand VARCHAR,
               timescale INTEGER, duration_units BIGINT, duration_ms BIGINT,
               n_tracks INTEGER, width INTEGER, height INTEGER)""")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?,?)", rows)
con.execute(f"COPY t TO '{EXPECTED}' (FORMAT parquet)")
print("wrote", rows)
