"""HyperMinHash — cardinality AND Jaccard in one HLL-sized sketch.

The reference ships a DRAFT HyperMinHash (/root/reference/include/sketch/
mh.h:943-1283; README.md:25 "draft ... not thoroughly vetted"); this is a
working implementation re-derived from the published algorithm (Yu & Weber,
"HyperMinHash: MinHash in LogLog space", arXiv:1710.08436):

  * 2^p buckets; per element, hash₁ gives (bucket index, HLL rank ρ) exactly
    as our HLL does (hll.py::_register_updates — same semantics as the
    draft's lzt, mh.h:1190-1191), and an independent hash₂ contributes an
    r-bit "minhash fraction";
  * a bucket keeps the lexicographically best (max ρ, then MIN fraction)
    pair. Encoding the register as (ρ << r) | (~frac & mask) turns that
    order into plain integer max, so the whole sketch is an
    elementwise-max monoid — associative, commutative, byte-identical
    under any partitioning (the draft instead keeps the max fraction on ρ
    ties, mh.h:1194-1196 — one of the reasons it is unvetted; min-fraction
    is what the published collision analysis assumes);
  * cardinality = Ertl MLE over the ρ histogram (identical estimator to our
    HLL; the draft calls the same ertl_ml_estimate, mh.h:1091);
  * Jaccard = (C − E[collisions]) / N over filled buckets, where C counts
    full-register matches, N buckets filled in either, and E[collisions]
    is the paper's exact double sum over (ρ, fraction) cells (the draft's
    `expected_collisions` second branch, mh.h:1246-1258), vectorized.

vs keeping separate HLL + MinHash: one state, one update pass, and the
Jaccard resolution scales with 2^p while still giving HLL-grade cardinality.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import hash_tokens, wanghash
from sketch_spark.sketches.base import Sketch, register
from sketch_spark.sketches.hll import _register_updates, ertl_mle_estimate

_U64 = np.uint64
_FRAC_SEED = _U64(0xB0BAF377C001D00D)  # draft's arbitrary second-seed constant


@register
class HyperMinHash(Sketch):
    kind = "hmh"

    def __init__(self, p: int = 12, r: int = 8, seed: int = 0):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        if not 2 <= r <= 20:
            raise ValueError("r must be in [2, 20]")  # 6-bit rho + r ≤ 26 fits uint32
        self.p = int(p)
        self.r = int(r)
        self.seed = int(seed)
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint32)

    # -- monoid ops ----------------------------------------------------------
    def update(self, values: np.ndarray) -> "HyperMinHash":
        if len(values) == 0:
            return self
        h1 = hash_tokens(values, self.seed)
        idx, rank = _register_updates(h1, self.p)
        with np.errstate(over="ignore"):
            h2 = wanghash(h1 ^ (_FRAC_SEED + _U64(self.seed)))
        mask = np.uint32((1 << self.r) - 1)
        frac = h2.astype(np.uint32) & mask
        enc = (rank.astype(np.uint32) << np.uint32(self.r)) | (mask - frac)
        np.maximum.at(self.regs, idx, enc)
        return self

    def merge(self, other: "HyperMinHash") -> "HyperMinHash":
        self._check_mergeable(other)
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    # -- queries -------------------------------------------------------------
    def _counts(self) -> np.ndarray:
        q = 64 - self.p
        return np.bincount(self.regs >> np.uint32(self.r), minlength=q + 2)

    def estimate(self) -> float:
        return ertl_mle_estimate(self._counts(), self.p, q=64 - self.p)

    def relative_error(self) -> float:
        return 1.03896 / np.sqrt(self.m)

    def expected_collisions(self, n: float, m: float) -> float:
        """Exact expected count of spurious full-register matches between
        independent sets of sizes n and m (Yu-Weber; the reference draft's
        slow branch, mh.h:1246-1258), vectorized over the (ρ, fraction)
        cell grid."""
        r2 = 1 << self.r
        i = np.arange(1, 65, dtype=np.float64)[:, None]  # rho cells
        j = np.arange(1, r2 + 1, dtype=np.float64)[None, :]
        scale = np.ldexp(1.0, (-(self.p + self.r) - i).astype(np.int64))
        b1 = np.where(i != 64, (r2 + j) * scale, j * scale * 2.0)
        b2 = np.where(i != 64, (r2 + j + 1) * scale, (j + 1) * scale * 2.0)
        b1 = np.clip(b1, 0.0, 1.0)
        b2 = np.clip(b2, 0.0, 1.0)
        prx = np.power(1.0 - b2, n) - np.power(1.0 - b1, n)
        pry = np.power(1.0 - b2, m) - np.power(1.0 - b1, m)
        return float((prx * pry).sum() * self.m)

    def jaccard_index(self, other: "HyperMinHash") -> float:
        self._check_mergeable(other)
        both = (self.regs != 0) & (other.regs != 0)
        c = int((both & (self.regs == other.regs)).sum())
        n_union = int(((self.regs != 0) | (other.regs != 0)).sum())
        if n_union == 0:
            return 0.0
        ec = self.expected_collisions(self.estimate(), other.estimate())
        return max((c - ec) / n_union, 0.0)

    def intersection_size(self, other: "HyperMinHash") -> float:
        j = self.jaccard_index(other)
        u = self.copy().merge(other).estimate()
        return j * u

    # -- state ---------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"p": self.p, "r": self.r, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"regs": self.regs}

    @classmethod
    def _from_state(cls, params, arrays) -> "HyperMinHash":
        obj = cls(**params)
        obj.regs = arrays["regs"].astype(np.uint32)
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"HyperMinHash(p={self.p}, r={self.r}, seed={self.seed})"


__all__ = ["HyperMinHash"]
