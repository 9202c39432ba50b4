"""Sampled multiplicity histogram — the ntcard capability, Spark-native.

The reference's ntcard port (`Card`/`VecCard`, /root/reference/include/
sketch/mult.h:175-330) estimates the full token-multiplicity histogram
(F0 and f1..fmax: how many distinct tokens occur exactly i times) from a
fixed counter table over hash-sampled items (top-bits filter mult.h:246-249)
with an unbiasing recurrence (mult.h:308-317) to undo table collisions.

This implementation keeps the same sampling design — a token enters the
sketch iff the top ``r`` bits of its 64-bit hash are zero, a deterministic
2^-r uniform sample over *distinct* tokens — but stores exact per-sampled-
token counts in a (values, counts) pair vector instead of a lossy fixed
table, so no collision-correction recurrence is needed and the merge is the
exact elementwise union-sum the reference's `+=` performs (mult.h:221-242).
Estimates scale counts-of-counts by 2^r.

Memory is bounded by |distinct| / 2^r entries; pick r so that fits (e.g.
r=16 → one entry per 65k distinct tokens: a 10^12-distinct corpus needs
~15M entries ≈ 240 MB at the driver — use r≥20 there).

Published error: each f_i is a binomial sample of the true f_i at rate
2^-r, so relative error ~ 1/sqrt(f_i * 2^-r).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, hash_tokens
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64


@register
class SampledMultiplicity(Sketch):
    kind = "multiplicity"

    def __init__(self, r: int = 8, seed: int = 0):
        if not 0 <= r <= 32:
            raise ValueError("r must be in [0, 32]")
        self.r = int(r)
        self.seed = int(seed)
        self.values = np.empty(0, dtype=np.uint64)  # sorted sampled hashes
        self.counts = np.empty(0, dtype=np.int64)

    # -- monoid ops ----------------------------------------------------------
    def update(self, values: np.ndarray) -> "SampledMultiplicity":
        if len(values) == 0:
            return self
        v = np.asarray(values)
        sampled = []
        for i in range(0, len(v), CHUNK):  # chunked hash, tiny sampled residue
            hashed = hash_tokens(v[i : i + CHUNK], self.seed)
            if self.r:
                hashed = hashed[(hashed >> _U64(64 - self.r)) == 0]
            if len(hashed):
                sampled.append(hashed)
        if not sampled:
            return self
        uniq, cnt = np.unique(np.concatenate(sampled), return_counts=True)
        return self._absorb(uniq, cnt.astype(np.int64))

    def _absorb(self, uniq: np.ndarray, cnt: np.ndarray) -> "SampledMultiplicity":
        allv = np.concatenate([self.values, uniq])
        allc = np.concatenate([self.counts, cnt])
        order = np.argsort(allv, kind="stable")
        allv, allc = allv[order], allc[order]
        newv, start = np.unique(allv, return_index=True)
        self.values = newv
        self.counts = np.add.reduceat(allc, start)
        return self

    def merge(self, other: "SampledMultiplicity") -> "SampledMultiplicity":
        self._check_mergeable(other)
        if len(other.values):
            self._absorb(other.values, other.counts)
        return self

    # -- queries -------------------------------------------------------------
    def scale(self) -> float:
        return float(1 << self.r)

    def distinct_estimate(self) -> float:
        """F0 = #distinct sampled × 2^r."""
        return len(self.values) * self.scale()

    def total_estimate(self) -> float:
        """Stream length estimate = Σ counts × 2^r (hash-sampling is uniform
        over distinct values, not occurrences — unbiased because every
        occurrence of a sampled value is counted)."""
        return float(self.counts.sum()) * self.scale()

    def histogram(self, max_mult: int = 64) -> np.ndarray:
        """f[i] ≈ # distinct tokens occurring exactly i times, i ∈ [1, max_mult];
        f[0] aggregates multiplicities > max_mult (reference prints f1..fmax,
        mult.h:175-330)."""
        h = np.zeros(max_mult + 1, dtype=np.float64)
        if len(self.counts) == 0:
            return h
        clipped = np.where(self.counts <= max_mult, self.counts, 0)
        h += np.bincount(clipped, minlength=max_mult + 1).astype(np.float64)
        return h * self.scale()

    # -- state ---------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"r": self.r, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"values": self.values, "counts": self.counts}

    @classmethod
    def _from_state(cls, params, arrays) -> "SampledMultiplicity":
        obj = cls(**params)
        obj.values = arrays["values"].astype(np.uint64)
        obj.counts = arrays["counts"].astype(np.int64)
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"SampledMultiplicity(r={self.r}, sampled={len(self.values)})"
