"""phll: packed 16-register-state ("partitioned") HLL — 4-bit base-16
registers, two per byte (reference phll_t, bbmh.h:136-230).

Structure parity with the reference: m = 2^p register slots; each slot
keeps a 4-bit quantized summary of the MINIMUM hash value that landed in
it (one-permutation bucketing, produced there by
``BBitMinHasher::make_packed16hll`` bbmh.h:1085-1100); the wire layout is
two registers per byte, high nibble first (bbmh.h:1098); merge is
nibble-wise max (bbmh.h:202-221 ``operator+=``) — exact with respect to
min-merging the underlying hash values because the quantizer is monotone
decreasing, so phll is a true max-monoid: any partitioning ∘ any merge
order is byte-identical to a single pass.

Two deliberate divergences, both because the reference's estimation side
is unfinished (its producer prints "TODO: update estimation…" at every
call, bbmh.h:1086):

* **Quantizer** — the reference maps ``min(15, uint8(15 − ceil(log16 x)))``
  (bbmh.h:1091-1096), which *wraps* for x > 16^15: any bucket whose min
  hash exceeds 2^60 (i.e. fewer than ~16 items landed in it) reads as
  register 15, the "most full" value, inverting the statistic for sparse
  buckets. We use the well-defined base-16 rank on the sub-bucket bits:
  ``r = min(15, ⌊nlz/4⌋ + 1)`` with nlz = leading zeros of the (64−p)
  low bits (0 = empty slot) — the base-16 analogue of the HLL rank,
  computed exactly from clz64 (⌊a/4⌋∘⌊·⌋ nests, so no float log).
* **Estimator** — instead of the uncalibrated ``m/Σ·139.8695…``
  (bbmh.h:195-200, whose base even disagrees with the producer's for
  m ≤ 256: make_base vs the hardcoded 16), cardinality is the Poisson
  maximum-likelihood fit: register k has probability
  e^{−λ16^{−k}} − e^{−λ16^{−(k−1)}} (k=1..14), e^{−λ} for 0, and
  1 − e^{−λ16^{−14}} for the saturated 15; λ̂ solves the one-dimensional
  score equation by bisection and est = m·λ̂ (the Ertl-MLE recipe our
  HLL already uses, re-derived for base 16). Measured: unbiased with
  σ ≈ 1.5/√m across n = 10^2..3·10^6 (tests/test_phll.py).

Set algebra follows the reference's shape: union via registerwise max,
Jaccard by inclusion–exclusion over (card_a, card_b, card_union)
(full_set_comparison, bbmh.h:155-167).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, clz64, hash_tokens
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64
_B = 16.0


def _mle_lambda(counts: np.ndarray) -> float:
    """Solve the Poisson score equation for the per-bucket rate λ.

    counts = histogram over register values 0..15. The score is strictly
    decreasing in λ, so geometric bisection converges unconditionally."""
    m = counts.sum()
    if m == 0 or counts[0] == m:
        return 0.0
    ks = np.arange(1, 15, dtype=np.float64)
    bk = _B**-ks
    bk1 = _B ** -(ks - 1.0)
    c_mid = counts[1:15].astype(np.float64)
    c0 = float(counts[0])
    c15 = float(counts[15])
    b14 = _B**-14.0

    def score(lam: float) -> float:
        ek = np.exp(-lam * bk)
        ek1 = np.exp(-lam * bk1)
        pk = np.maximum(ek - ek1, 1e-300)
        d = -c0 + float((c_mid * (-bk * ek + bk1 * ek1) / pk).sum())
        if c15:
            e14 = np.exp(-lam * b14)
            d += c15 * (b14 * e14) / max(1.0 - e14, 1e-300)
        return d

    lo, hi = 1e-9, 1e18
    for _ in range(120):
        mid = float(np.sqrt(lo * hi))
        if score(mid) > 0:
            lo = mid
        else:
            hi = mid
    return float(np.sqrt(lo * hi))


@register
class PackedHLL(Sketch):
    kind = "phll"

    def __init__(self, p: int = 12, seed: int = 0):
        if not 4 <= p <= 26:
            raise ValueError("p must be in [4, 26]")
        self.p = int(p)
        self.seed = int(seed)
        self.m = 1 << self.p
        self.regs = np.zeros(self.m, dtype=np.uint8)  # unpacked nibbles in memory

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"p": self.p, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        # wire parity: two registers per byte, high nibble first (bbmh.h:1098)
        packed = (self.regs[0::2] << 4) | self.regs[1::2]
        return {"packed": packed}

    @classmethod
    def _from_state(cls, params, arrays) -> "PackedHLL":
        obj = cls(**params)
        packed = arrays["packed"].astype(np.uint8)
        obj.regs = np.empty(obj.m, dtype=np.uint8)
        obj.regs[0::2] = packed >> 4
        obj.regs[1::2] = packed & 0x0F
        return obj

    # ---- monoid ops --------------------------------------------------------
    def update(self, values: np.ndarray) -> "PackedHLL":
        v = np.asarray(values)
        for i in range(0, len(v), CHUNK):
            h = hash_tokens(v[i : i + CHUNK], self.seed)
            idx = (h >> _U64(64 - self.p)).astype(np.int64)
            with np.errstate(over="ignore"):
                rem = h << _U64(self.p)  # sub-bucket bits in the high positions
            nlz = clz64(rem).astype(np.int64)  # 64 ⇔ rem == 0
            r = np.minimum(15, (nlz >> 2) + 1).astype(np.uint8)
            np.maximum.at(self.regs, idx, r)
        return self

    def merge(self, other: "PackedHLL") -> "PackedHLL":
        self._check_mergeable(other)
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    # ---- queries -----------------------------------------------------------
    def estimate(self) -> float:
        counts = np.bincount(self.regs, minlength=16)
        return self.m * _mle_lambda(counts)

    def cardinality_estimate(self) -> float:
        return self.estimate()

    def union_size(self, other: "PackedHLL") -> float:
        self._check_mergeable(other)
        counts = np.bincount(np.maximum(self.regs, other.regs), minlength=16)
        return self.m * _mle_lambda(counts)

    def full_set_comparison(self, other: "PackedHLL") -> tuple[float, float, float]:
        """(only_a, only_b, intersection) by inclusion-exclusion
        (bbmh.h:155-163)."""
        a, b = self.estimate(), other.estimate()
        u = self.union_size(other)
        inter = max(a + b - u, 0.0)
        return (max(a - inter, 0.0), max(b - inter, 0.0), inter)

    def jaccard_index(self, other: "PackedHLL") -> float:
        only_a, only_b, inter = self.full_set_comparison(other)
        denom = only_a + only_b + inter
        return inter / denom if denom else 0.0

    def relative_error(self) -> float:
        """Measured envelope of the base-16 MLE (≈1.5/√m; the 4-bit
        quantization costs ~1.5× over a full-width HLL's 1.04/√m)."""
        return 1.6 / float(np.sqrt(self.m))
