#!/usr/bin/env python3
"""Author fixtures/embeddings_clustered.parquet — the adversarial
hub-and-spoke corpus for the q171 ANN recall contract (round-7 audit
item #7: q46's recall contract runs on a uniform corpus; IVF's failure
modes live on CLUSTERED, SIZE-SKEWED data, where seed-anchor sampling
is size-proportional, so the dominant hub absorbs several anchors and
its queries' true top-k split across inverted lists).

Every value sits on a power-of-two grid (/16 and /64), so float32
storage is exact, every dot-product term is exact in float64, and the
64-term sums are exact — the brute-force truth is bit-identical across
engines with NO dependence on fold order. Ties break on neighbor_id.

Structure: 8 hubs in R^64 with skewed sizes (500 down to 20) PLUS
boundary "bridge" vectors at hub-pair midpoints — the IVF failure
mode: a bridge is equidistant from two anchors, so jitter alone
decides its inverted list; bridges of one pair SPLIT across the two
lists, and a bridge query's true top-k (its sibling bridges) straddles
the split. nprobe=1 structurally misses the far half.

  hub(h)[d]        = ((h*97 + d*53 + 13) % 33 - 16) / 16
  jitter(h,i)[d]   = ((i*31 + d*7 + h*11) % 9 - 4) / 64
  bridge(p,j)[d]   = (hub(a)+hub(b))/2 + ((j*29 + d*13 + p*17) % 9 - 4) / 64
                     for pair p = (a, b) in (0,1) (2,3) (4,5) (6,7)
"""
import duckdb

DIM = 64
SIZES = [500, 250, 120, 60, 40, 30, 25, 20]  # skew: hub 0 dominates
PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7)]
BRIDGES_PER_PAIR = 16


def hub(h, d):
    return ((h * 97 + d * 53 + 13) % 33 - 16) / 16.0


def jitter(h, i, d):
    return ((i * 31 + d * 7 + h * 11) % 9 - 4) / 64.0


def bridge(p, j, d):
    a, b = PAIRS[p]
    return (hub(a, d) + hub(b, d)) / 2.0 + ((j * 29 + d * 13 + p * 17) % 9 - 4) / 64.0


rows = []
vec_id = 0
for h, n in enumerate(SIZES):
    for i in range(n):
        rows.append((vec_id, h,
                     [hub(h, d) + jitter(h, i, d) for d in range(DIM)]))
        vec_id += 1
for p in range(len(PAIRS)):
    for j in range(BRIDGES_PER_PAIR):
        rows.append((vec_id, 100 + p,
                     [bridge(p, j, d) for d in range(DIM)]))
        vec_id += 1

con = duckdb.connect()
con.execute("CREATE TABLE t (vec_id BIGINT, hub INTEGER, embedding FLOAT[])")
con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
con.execute("""COPY (SELECT * FROM t ORDER BY vec_id)
               TO '/root/repo/fixtures/embeddings_clustered.parquet'
               (FORMAT parquet)""")
print(f"wrote {len(rows)} vectors, {len(SIZES)} hubs, sizes {SIZES}")
