"""Jaccard-accuracy sweep — the analog of the reference's benchmark/acc.cpp
(:19-116): true JI = 1/3 geometry, trials × sketch sizes, MSE / MAE / bias
per sketch family (HLL inclusion-exclusion, HLL joint-MLE, bottom-k
MinHash, one-permutation b-bit MinHash, SuperMinHash — the full acc.cpp
column set: the reference prints HLL vs BBMH{16,8,4,2} vs SMH).

Usage: python tools/accuracy_sweep.py [--trials 20] [--n 100000]
Prints a markdown table (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sketch_spark.sketches.bbmh import BBitMinHash
from sketch_spark.sketches.hll import HyperLogLog
from sketch_spark.sketches.icws import ICWS
from sketch_spark.sketches.minhash import BottomKMinHash
from sketch_spark.sketches.phll import PackedHLL
from sketch_spark.sketches.pmh import PMinHash
from sketch_spark.sketches.smh import SuperMinHash

TRUE_JI = 1.0 / 3.0


def one_trial(n: int, seed: int, make_pair):
    """A, B with |A|=|B|=n, |A∩B|=n/2 → JI = 1/3 (acc.cpp geometry:
    seeded RNG draws; overlap by construction)."""
    rng = np.random.default_rng(1337 * (seed + 1))
    base = rng.integers(0, 2**62, 2 * n, dtype=np.int64)
    shared = base[: n // 2]
    a_vals = np.concatenate([shared, base[n // 2 : n]])
    b_vals = np.concatenate([shared, base[n : n + n // 2]])
    sa, sb = make_pair(seed)
    sa.update(a_vals)
    sb.update(b_vals)
    return sa, sb


def sweep(trials: int, n: int):
    rows = []
    for lg in (9, 10, 11):  # acc.cpp sweeps m = 2^9..2^11
        m = 1 << lg
        fams = {
            f"hll p={lg} (incl-excl)": (
                lambda s, lg=lg: (HyperLogLog(p=lg), HyperLogLog(p=lg)),
                lambda a, b: a.jaccard_index(b),
            ),
            f"hll p={lg} (joint MLE)": (
                lambda s, lg=lg: (HyperLogLog(p=lg), HyperLogLog(p=lg)),
                lambda a, b: (lambda j: j[2] / max(sum(j), 1e-12))(a.joint_estimate(b)),
            ),
            f"minhash k={m}": (
                lambda s, m=m: (BottomKMinHash(k=m), BottomKMinHash(k=m)),
                lambda a, b: a.jaccard_index(b),
            ),
            f"bbmh p={lg} b=16": (
                lambda s, lg=lg: (BBitMinHash(p=lg, b=16), BBitMinHash(p=lg, b=16)),
                lambda a, b: a.jaccard_index(b),
            ),
            f"smh m={m}": (
                lambda s, m=m: (SuperMinHash(m=m), SuperMinHash(m=m)),
                lambda a, b: a.jaccard_index(b),
            ),
            # round 3: the weighted samplers at unit weights, where both
            # J_P (pmh) and Σmin/Σmax (icws) reduce to the classic Jaccard
            f"pmh m={m}": (
                lambda s, m=m: (PMinHash(m=m), PMinHash(m=m)),
                lambda a, b: a.jaccard(b),
            ),
            f"icws m={m}": (
                lambda s, m=m: (ICWS(m=m), ICWS(m=m)),
                lambda a, b: a.jaccard(b),
            ),
            # round 3: phll at the same register count (4-bit registers ⇒
            # m/2 bytes of state, the smallest footprint in the table)
            f"phll m={m}": (
                lambda s, m=m: (PackedHLL(p=int(np.log2(m))), PackedHLL(p=int(np.log2(m)))),
                lambda a, b: a.jaccard_index(b),
            ),
        }
        for name, (make_pair, score) in fams.items():
            errs = []
            for t in range(trials):
                sa, sb = one_trial(n, t, make_pair)
                errs.append(score(sa, sb) - TRUE_JI)
            e = np.array(errs)
            rows.append((name, float((e**2).mean()), float(np.abs(e).mean()), float(e.mean())))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()
    rows = sweep(args.trials, args.n)
    print(f"| sketch | MSE | MAE | bias |  (true JI=1/3, n={args.n}, {args.trials} trials)")
    print("|---|---|---|---|")
    for name, mse, mae, bias in rows:
        print(f"| {name} | {mse:.2e} | {mae:.4f} | {bias:+.4f} |")


if __name__ == "__main__":
    main()
