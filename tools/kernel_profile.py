"""Single-thread kernel profile of the flagship sketch-update path.

Mirrors the per-task loop of `build_sketches_from_parquet` (spark/files.py):
one int32 token batch -> update HLL p=14, CMS 2^18x4, Bloom 2^24, bottom-k
MinHash 1024 -- the 4-sketch flagship. Reports ns/token per sketch and for
the whole set, plus a breakdown of hashing vs scatter within each kernel.

Run on a quiet box:  taskset -c 0 python tools/kernel_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sketch_spark.hashing import CHUNK, clz64, hash_tokens, seeded_hashes, splitmix64, wanghash
from sketch_spark.sketches.base import make_sketch

N = 16_000_000  # tokens per measured pass
rng = np.random.default_rng(7)
tokens = rng.integers(0, 50_000, size=N, dtype=np.int32)  # zipf-ish small vocab


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, secs):
    print(f"{name:42s} {secs:7.3f} s   {secs / N * 1e9:7.2f} ns/tok   {N / secs / 1e6:8.2f} M tok/s")


specs = {
    "hll": make_sketch("hll", p=14),
    "cms": make_sketch("cms", l2sz=18, nh=4),
    "bloom": make_sketch("bloom", l2sz=24, nh=3),
    "minhash": make_sketch("minhash", k=1024),
}

print(f"N = {N:,} tokens, CHUNK = {CHUNK}")
for name, sk in specs.items():
    report(name + ".update", timeit(lambda sk=sk: sk.update(tokens)))

# whole flagship set in one pass over chunks (the files.py shape: each sketch
# updates from the same array)
def flagship():
    for sk in specs.values():
        sk.update(tokens)

report("flagship (4 sketches)", timeit(flagship))

# --- sub-kernel breakdown on one CHUNK-sized slice, scaled ---
chunk = tokens[:CHUNK]
M = N // CHUNK  # number of chunks per pass

def scaled(name, per_chunk_fn):
    t = timeit(lambda: [per_chunk_fn() for _ in range(64)]) / 64 * M
    report("  " + name, t)

print("\nsub-kernels (per-chunk cost x chunks/pass):")
scaled("wanghash (1 pass)", lambda: wanghash(chunk.astype(np.uint64)))
scaled("hash_tokens (cast+hash)", lambda: hash_tokens(chunk))
seeds4 = splitmix64(123, 4)
scaled("seeded_hashes nh=4 (CMS)", lambda: seeded_hashes(chunk.astype(np.uint64), seeds4))
nh_bloom = specs["bloom"].nh if hasattr(specs["bloom"], "nh") else len(getattr(specs["bloom"], "_seeds", []))
seedsb = splitmix64(321, max(1, int(nh_bloom)))
scaled(f"seeded_hashes nh={len(seedsb)} (Bloom)", lambda: seeded_hashes(chunk.astype(np.uint64), seedsb))
h = hash_tokens(chunk)
scaled("clz64", lambda: clz64(h))

# HLL scatter: idx/rank + maximum.at
p = 14
idx = (h >> np.uint64(64 - p)).astype(np.int64)
rank = clz64(h << np.uint64(p)) + 1
regs = np.zeros(1 << p, dtype=np.uint8)
scaled("hll scatter (maximum.at)", lambda: np.maximum.at(regs, idx, rank.astype(np.uint8)))

print("\nsketch internals (introspection):")
for name, sk in specs.items():
    print(f"  {name}: {type(sk).__name__}, nh={getattr(sk, 'nh', None)}")
