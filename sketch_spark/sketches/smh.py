"""SuperMinHash — fixed-size MinHash with Fisher-Yates register offsets.

Mirrors the capability of the reference's SuperMinHash (/root/reference/
include/sketch/bbmh.h:470-697, benchmarked against HLL and BBMH in
benchmark/acc.cpp:19-116), re-derived from the published algorithm (Ertl,
"SuperMinHash — A New Minwise Hashing Algorithm for Jaccard Similarity
Estimation", arXiv:1706.05698):

  * each element d deterministically proposes one candidate value per
    register: candidate[π_d(j)] = u_d[j] + j, where u_d is an iid U[0,1)
    vector and π_d a uniform random permutation of {0..m−1}, both seeded by
    hash(d). Every integer offset 0..m−1 is used exactly once per element —
    the structured offsets are what cuts the estimator variance below plain
    one-permutation hashing at small set sizes (Ertl §4: RMSE factor
    √(1−J)·α(m,n) < 1 vs k-minwise);
  * the signature is the elementwise min over elements → merge is
    elementwise min: associative, commutative, byte-identical under any
    partitioning (same invariant class as hll/bloom/minhash here);
  * Jaccard = fraction of equal registers (exact float equality is sound:
    a register value is a deterministic function of the element that
    produced it, so equal values ⇔ same minimizing element w.h.p.).

The reference implementation packs registers to b bits for SIMD compare;
we keep float64 registers (NumPy compares are already vectorized, and the
state is ~8·m bytes — tiny next to any shuffle).

The per-element permutation is vectorized as argsort over a second
counter-based uniform matrix — O(n·m·log m) per batch, heavier per element
than bottom-k MinHash; SuperMinHash's niche is small-to-medium sets where
its variance advantage matters (the reference benchmarks it at m = 2^9..2^11).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import hash_tokens, wanghash
from sketch_spark.sketches.base import Sketch, register, subbatched

_U64 = np.uint64
_GOLD = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)


def _mix(seeds: np.ndarray, cols: int, stream: int) -> np.ndarray:
    """(n, cols) uint64 matrix, counter-based (splitmix64 finalizer) — row e
    depends only on seeds[e], column j only on the counter j, so entry
    [e, j] is identical no matter how many columns are materialized (the
    early-stop slicing below relies on this prefix consistency)."""
    with np.errstate(over="ignore"):
        ctr = _GOLD * np.arange(1, cols + 1, dtype=np.uint64)[None, :]
        z = (seeds[:, None] + _U64(stream) * _GOLD) + ctr
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        z ^= z >> _U64(31)
    return z


@register
class SuperMinHash(Sketch):
    kind = "smh"

    def __init__(self, m: int = 1024, seed: int = 0):
        if not 16 <= m <= (1 << 20):
            raise ValueError("m must be in [16, 2^20]")
        self.m = int(m)
        self.seed = int(seed)
        self.sig = np.full(self.m, np.inf, dtype=np.float64)

    # -- monoid ops ----------------------------------------------------------
    @subbatched
    def update(self, values: np.ndarray) -> "SuperMinHash":
        if len(values) == 0:
            return self
        hashed = hash_tokens(values, self.seed)
        # duplicate elements propose identical candidates — drop them early
        hashed = np.unique(hashed)
        m = self.m
        # keep the (chunk × m) proposal matrices ~16 MB
        chunk = max(32, (1 << 21) // m)
        for i in range(0, len(hashed), chunk):
            s = hashed[i : i + chunk]
            # EXACT early stop (the batch analog of Ertl's Alg. 1 stopping
            # rule): a proposal u+j at any register can only win if
            # u+j < max(sig), so offsets j ≥ ceil(max(sig)) are dead. Only
            # the first `a` entries of each element's permutation are
            # materialized; the counter-based uniforms make that prefix
            # identical whatever `a` is, so results stay byte-identical
            # under any partitioning / merge order.
            if np.isinf(self.sig).any():
                a = m
            else:
                a = min(m, int(np.max(self.sig)) + 1)
            # permutation order defined on the raw uint64 stream (injective
            # w.h.p., no float-rounding ties)
            g = _mix(s, m, stream=2)
            if a <= m // 4:
                part = np.argpartition(g, a, axis=1)[:, :a]
                order = np.argsort(np.take_along_axis(g, part, axis=1), axis=1, kind="stable")
                prefix = np.take_along_axis(part, order, axis=1)
            else:
                prefix = np.argsort(g, axis=1, kind="stable")[:, :a]
            u = _mix(s, a, stream=1).astype(np.float64) * (2.0**-64)
            vals = u + np.arange(a, dtype=np.float64)[None, :]
            np.minimum.at(self.sig, prefix.ravel(), vals.ravel())
        return self

    def merge(self, other: "SuperMinHash") -> "SuperMinHash":
        self._check_mergeable(other)
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    # -- queries -------------------------------------------------------------
    def jaccard_index(self, other: "SuperMinHash") -> float:
        self._check_mergeable(other)
        # never-updated registers sit at +inf on both sides; no evidence
        if not np.isfinite(self.sig).any() or not np.isfinite(other.sig).any():
            return 0.0
        return float((self.sig == other.sig).mean())

    # -- state ---------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"m": self.m, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"sig": self.sig}

    @classmethod
    def _from_state(cls, params, arrays) -> "SuperMinHash":
        obj = cls(**params)
        obj.sig = arrays["sig"].astype(np.float64)
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"SuperMinHash(m={self.m}, seed={self.seed})"


__all__ = ["SuperMinHash"]
