"""ICWS: Improved Consistent Weighted Sampling (reference bbmh.h:775-832).

Estimates the standard weighted Jaccard

    J_W(S, T) = Σ_k min(S_k, T_k) / Σ_k max(S_k, T_k)

via Ioffe's scheme ("Improved Consistent Sampling, Weighted Minhash and L1
Sketching", ICDM 2010): for slot j and feature k with weight S_k > 0 draw

    r, c ~ Gamma(2, 1),  β ~ U(0, 1)      (keyed on (k, j, seed) ONLY)
    t = ⌊ln S_k / r + β⌋,  y = e^{r(t−β)},  a = c / (y·e^r)

and keep the (k, t) of the minimal a per slot; two sketches agree on a
slot's (k, t) with probability exactly J_W. Complements P-MinHash
(sketches/pmh.py), which estimates the scale-invariant probability Jaccard
— ICWS is the Σmin/Σmax multiset shape the counting-minhash gate checks
exactly.

DIVERGENCE from the reference: bbmh.h:796-800 constructs a DEFAULT-SEEDED
RNG inside addh, so every feature draws the identical (r, c, β) sequence —
consistent sampling requires the draws be keyed on the feature identity
(Ioffe §3, and the same class of bug as the reference's P-MinHash). Draws
here are counter-based splitmix of (feature, slot, seed): Gamma(2,1) =
−ln(u₁u₂), five independent uniforms per (feature, slot).

Merge monoid: elementwise min of a with its (k, t) payload. CONTRACT: a
feature's weight must be consistent wherever it appears (pre-aggregate
additive weights per feature first — one groupBy — or partition
feature-disjointly). Unlike P-MinHash, a(w) is not monotone in w, so
min-merging the SAME feature under two different weights corresponds to
neither max- nor sum-combination; under the contract the merge is exact
and byte-identical under any partitioning/merge order.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import wanghash
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64

_TARGET_CELLS = 1 << 19  # 5 (m, chunk) float64 temps ≈ 20 MB at this size


def _u64ify(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values)
    if v.dtype == np.uint64:
        return v
    if v.dtype.kind in "iu":
        return v.astype(np.int64).view(np.uint64)
    raise TypeError(f"icws features must be integer ids, got {v.dtype}")


@register
class ICWS(Sketch):
    """m-slot consistent weighted sample; ``jaccard`` estimates J_W."""

    kind = "icws"

    def __init__(self, m: int = 256, seed: int = 137):
        if m < 1:
            raise ValueError("m must be >= 1")
        self.m = int(m)
        self.seed = int(seed)
        self.slot_keys = np.zeros(self.m, dtype=np.uint64)
        self.slot_t = np.zeros(self.m, dtype=np.int64)
        self.slot_vals = np.full(self.m, np.inf, dtype=np.float64)

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"m": self.m, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {
            "slot_keys": self.slot_keys,
            "slot_t": self.slot_t,
            "slot_vals": self.slot_vals,
        }

    @classmethod
    def _from_state(cls, params, arrays):
        obj = cls(**params)
        obj.slot_keys = arrays["slot_keys"].astype(np.uint64)
        obj.slot_t = arrays["slot_t"].astype(np.int64)
        obj.slot_vals = arrays["slot_vals"].astype(np.float64)
        return obj

    # ---- draws ------------------------------------------------------------
    def _uniforms(self, feats: np.ndarray, which: int) -> np.ndarray:
        """(m, n) uniforms in (0,1), keyed on (feature, slot, seed, which)."""
        n = len(feats)
        with np.errstate(over="ignore"):
            slot = np.arange(self.m, dtype=np.uint64)[:, None]
            z = (
                _U64(self.seed)
                + _U64(0x9E3779B97F4A7C15) * (feats[None, :] + _U64(1))
                + _U64(0xBF58476D1CE4E5B9) * (slot + _U64(1))
                + _U64(0xD6E8FEB86659FD93) * _U64(which + 1)
            )
            z = wanghash(z.ravel()).reshape(self.m, n)
        return (z.astype(np.float64) + 0.5) * (2.0**-64)

    # ---- monoid ops --------------------------------------------------------
    def _take_better(self, vals, keys, ts) -> None:
        better = vals < self.slot_vals
        tie = (vals == self.slot_vals) & (keys < self.slot_keys)
        take = better | tie
        self.slot_vals = np.where(take, vals, self.slot_vals)
        self.slot_keys = np.where(take, keys, self.slot_keys)
        self.slot_t = np.where(take, ts, self.slot_t)

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "ICWS":
        """Absorb (feature, weight) pairs; weights default to 1.0 (where J_W
        reduces to classic set Jaccard). Non-positive weights are skipped
        (the reference's count<=0 guard, bbmh.h:794)."""
        v = _u64ify(values)
        if counts is None:
            w = np.ones(len(v), dtype=np.float64)
        else:
            w = np.asarray(counts, dtype=np.float64)
            if len(w) != len(v):
                raise ValueError("values and counts must align")
        pos = w > 0
        if not pos.all():
            v, w = v[pos], w[pos]
        if len(v) == 0:
            return self
        chunk = max(1, _TARGET_CELLS // self.m)
        for i in range(0, len(v), chunk):
            vc, wc = v[i : i + chunk], w[i : i + chunk]
            lw = np.log(wc)[None, :]  # (1, c)
            r = -np.log(self._uniforms(vc, 0) * self._uniforms(vc, 1))  # Gamma(2,1)
            c = -np.log(self._uniforms(vc, 2) * self._uniforms(vc, 3))
            b = self._uniforms(vc, 4)
            t = np.floor(lw / r + b)
            y = np.exp(r * (t - b))
            a = c / (y * np.exp(r))  # (m, c)
            j = a.argmin(axis=1)
            rows = np.arange(self.m)
            self._take_better(a[rows, j], vc[j], t[rows, j].astype(np.int64))
        return self

    def merge(self, other: "ICWS") -> "ICWS":
        self._check_mergeable(other)
        self._take_better(other.slot_vals, other.slot_keys, other.slot_t)
        return self

    # ---- queries -----------------------------------------------------------
    def jaccard(self, other: "ICWS") -> float:
        """Weighted-Jaccard estimate: fraction of slots agreeing on (k, t)
        (variance J_W(1−J_W)/m, Ioffe Thm. 1)."""
        self._check_mergeable(other)
        both = np.isfinite(self.slot_vals) & np.isfinite(other.slot_vals)
        match = (self.slot_keys == other.slot_keys) & (self.slot_t == other.slot_t)
        return float(np.mean(match & both))

    def n_filled(self) -> int:
        return int(np.isfinite(self.slot_vals).sum())


def exact_weighted_jaccard(xa: dict[int, float], xb: dict[int, float]) -> float:
    """Σ min / Σ max oracle for tests/gates."""
    keys = set(xa) | set(xb)
    smin = sum(min(xa.get(k, 0.0), xb.get(k, 0.0)) for k in keys)
    smax = sum(max(xa.get(k, 0.0), xb.get(k, 0.0)) for k in keys)
    return smin / smax if smax else 0.0
