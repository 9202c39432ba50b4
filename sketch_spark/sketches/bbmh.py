"""One-permutation b-bit MinHash — vectorized NumPy kernel.

Mirrors the reference `BBitMinHasher`/`FinalBBitMinHash` (/root/reference/
include/sketch/bbmh.h:836-1100, 233-), re-derived from the published
sources (Li & König, "b-Bit Minwise Hashing", WWW 2010; Shrivastava,
"Optimal Densification for One Permutation Hashing", ICML 2017):

  * one permutation: a single 64-bit hash per item; top p bits pick one of
    m = 2^p buckets, the low 64−p bits are the value; each bucket keeps its
    minimum (bbmh.h splits identically — `num = 2^(64-lg m)` in the
    harmonic estimator implies bucket-local values)
  * merge = elementwise min with EMPTY = 2^64−1 as identity → an exact-state
    mergeable monoid, byte-identical under any partitioning
  * cardinality = harmonic estimate m² / Σ(vᵢ/2^(64−p)) over densified
    minima (bbmh.h:55-78)
  * empty buckets are filled by optimal densification — bucket i borrows
    from the bucket selected by iterated universal hashes of (i, attempt)
    (bbmh.h:29-52 `densifybin`); deterministic, so densified comparisons
    are reproducible
  * b-bit comparison: Jaccard = (match_fraction − 2^−b)/(1 − 2^−b) over the
    low b bits of densified minima (Li-König collision correction)

Accuracy targets from the reference tests (testsrc/bbmhtest.cpp:149-165):
cardinality within 5%, Jaccard within ±0.05 at JI = 1/3.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import hash_tokens, wanghash
from sketch_spark.sketches import base as _base
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64
_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


@register
class BBitMinHash(Sketch):
    kind = "bbmh"

    def __init__(self, p: int = 10, b: int = 16, seed: int = 0):
        if not 4 <= p <= 20:
            raise ValueError("p must be in [4, 20]")
        if not 1 <= b <= 64 - p:
            raise ValueError("b must be in [1, 64-p]")
        self.p = int(p)
        self.b = int(b)
        self.seed = int(seed)
        self.m = 1 << p
        self.vals = np.full(self.m, _EMPTY, dtype=np.uint64)

    # -- monoid ops ----------------------------------------------------------
    def update(self, values: np.ndarray) -> "BBitMinHash":
        if len(values) == 0:
            return self
        q = 64 - self.p
        # min-monoid: sub-batching is byte-identical; bounds hash/index
        # temporaries to O(UPDATE_SUPER) for file-unit-sized batches
        for s in range(0, len(values), _base.UPDATE_SUPER):
            hashed = hash_tokens(values[s : s + _base.UPDATE_SUPER], self.seed)
            idx = (hashed >> _U64(q)).astype(np.int64)
            val = hashed & _U64((1 << q) - 1)
            np.minimum.at(self.vals, idx, val)
        return self

    def merge(self, other: "BBitMinHash") -> "BBitMinHash":
        self._check_mergeable(other)
        np.minimum(self.vals, other.vals, out=self.vals)
        return self

    # -- queries -------------------------------------------------------------
    def _densified(self) -> np.ndarray:
        """Optimal densification (bbmh.h:29-52): every empty bucket copies
        the value of a non-empty bucket found by iterated (i, attempt)
        universal-hash probing. Deterministic."""
        out = self.vals.copy()
        empty = out == _EMPTY
        if not empty.any():
            return out
        if empty.all():
            return out  # fully empty: caller handles
        filled_src = self.vals  # probe against the ORIGINAL fill pattern
        for i in np.flatnonzero(empty):
            attempt = 0
            j = int(i)
            while filled_src[j] == _EMPTY:
                attempt += 1
                j = int(
                    wanghash(np.array([(int(i) << 32) ^ attempt], dtype=np.uint64))[0]
                    % _U64(self.m)
                )
            out[i] = filled_src[j]
        return out

    def cardinality_estimate(self) -> float:
        """Harmonic estimate m²/Σ(vᵢ/2^(64−p)) when every bucket is filled
        (bbmh.h:55-78); below fill, linear counting on the empty-bucket
        fraction (−m·ln(m_empty/m)) — densified harmonic is strongly biased
        there because borrowed values masquerade as observations."""
        n_empty = int((self.vals == _EMPTY).sum())
        if n_empty == self.m:
            return 0.0
        if n_empty > 0:
            import math

            return -self.m * math.log(n_empty / self.m)
        # per-bucket value range: 2^(64-p) here, 2^64/nbuckets in the Div
        # subclass (exactly equal for power-of-2 m)
        num = 2.0**64 / self.m
        s = float((self.vals.astype(np.float64) / num).sum())
        return (self.m * self.m) / s if s else 0.0

    def finalize(self, b: int | None = None) -> np.ndarray:
        """Densified minima truncated to the low b bits (the FinalBBitMinHash
        register array; packing to a bit-matrix is a storage detail — the
        comparison semantics live here)."""
        b = b or self.b
        return self._densified() & _U64((1 << b) - 1)

    def jaccard_index(self, other: "BBitMinHash") -> float:
        """b-bit match fraction with the Li-König collision correction.

        Empty sketches carry no evidence: densification would leave every
        bucket at the sentinel and spuriously report J≈1, so either side
        being empty returns 0.0."""
        self._check_mergeable(other)
        if bool((self.vals == _EMPTY).all()) or bool((other.vals == _EMPTY).all()):
            return 0.0
        a = self.finalize()
        bb = other.finalize()
        match = float((a == bb).mean())
        c = 2.0 ** (-self.b)
        return max(0.0, min(1.0, (match - c) / (1.0 - c)))

    def union_size(self, other: "BBitMinHash") -> float:
        return self.copy().merge(other).cardinality_estimate()

    def intersection_size(self, other: "BBitMinHash") -> float:
        return self.jaccard_index(other) * self.union_size(other)

    # -- state ---------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"p": self.p, "b": self.b, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"vals": self.vals}

    @classmethod
    def _from_state(cls, params, arrays) -> "BBitMinHash":
        obj = cls(**params)
        obj.vals = arrays["vals"].astype(np.uint64)
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"BBitMinHash(p={self.p}, b={self.b}, filled={(self.vals != _EMPTY).sum()})"


@register
class DivBBitMinHash(BBitMinHash):
    """b-bit minhash with an ARBITRARY bucket count (reference
    DivBBitMinHasher, bbmh.h:705-774): bucket = hash mod nbuckets, value =
    hash div nbuckets, min-monoid per bucket — lets the register count
    match a memory budget exactly instead of rounding to a power of two.

    The reference reaches for Schismatic fastmod (div.h:83-141) because
    scalar C++ division is slow; NumPy's vectorized ``%``/``//`` are
    already one multiply-class op per element, so plain operators here.
    Divergences: (1) the reference silently rounds nbuckets up to a
    multiple of 64 for its SIMD compare blocks (bbmh.h:714-721 — its
    ctor warning admits it); we honor the requested count exactly.
    (2) its merge story is finalize-then-compare only; the live core is
    the same elementwise-min monoid as BBitMinHash, so we inherit the
    byte-identical partition merge. Estimation (harmonic + linear-count
    below fill), optimal densification, and the Li-König b-bit collision
    correction are shared with the parent — the quotient's low b bits
    stay ~uniform while 2^64/nbuckets ≫ 2^b, which the b bound enforces."""

    kind = "divbbmh"

    def __init__(self, nbuckets: int = 1000, b: int = 16, seed: int = 0):
        if not 16 <= nbuckets <= (1 << 26):
            raise ValueError("nbuckets must be in [16, 2^26]")
        # keep ≥ 8 spare uniform bits above the compared b bits
        max_b = 64 - int(np.ceil(np.log2(nbuckets))) - 8
        if not 1 <= b <= max_b:
            raise ValueError(f"b must be in [1, {max_b}] for nbuckets={nbuckets}")
        self.b = int(b)
        self.seed = int(seed)
        self.m = int(nbuckets)
        self.p = 0  # unused; bucketing is mod-based
        self.vals = np.full(self.m, _EMPTY, dtype=np.uint64)

    def update(self, values: np.ndarray) -> "DivBBitMinHash":
        if len(values) == 0:
            return self
        nb = _U64(self.m)
        # min-monoid: sub-batching byte-identical, transients O(UPDATE_SUPER)
        for s in range(0, len(values), _base.UPDATE_SUPER):
            hashed = hash_tokens(values[s : s + _base.UPDATE_SUPER], self.seed)
            idx = (hashed % nb).astype(np.int64)
            np.minimum.at(self.vals, idx, hashed // nb)
        return self

    def _params(self) -> dict[str, Any]:
        return {"nbuckets": self.m, "b": self.b, "seed": self.seed}
