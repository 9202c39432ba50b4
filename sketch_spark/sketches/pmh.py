"""P-MinHash: fixed-size weighted-set similarity sketch (probability Jaccard).

The reference's ``jp::PMinHasher`` (pmh.h:80-140) — consistent weighted
sampling via exponential draws: slot j of the signature holds
``argmin_i  -ln(u_{i,j}) / w_i`` over the set's features i with weights
w_i > 0, where u_{i,j} is a uniform keyed on (feature, slot, seed) only.
Two sketches agree on slot j with probability exactly the probability
Jaccard

    J_P(x, y) = Σ_{i : x_i>0, y_i>0}  1 / Σ_k max(x_k/x_i, y_k/y_i)

(Moulton & Jiang, "Maximally Consistent Sampling and the Jaccard Index of
Probability Distributions", arXiv:1809.04052) — scale-invariant in each
argument, and equal to the classic set Jaccard when all weights are equal.
This is the tf-weighted document-similarity shape that CountingBottomK
MinHash only covers at k ≥ vocabulary size: state here is fixed at m slots
regardless of vocabulary.

DIVERGENCE from the reference: pmh.h:100-106 seeds its uniform with
(weight value, slot seed) and never mixes in the feature index, so two
distinct features with equal weights draw IDENTICAL values in every slot
and the argmin tie-breaks arbitrarily — consistent sampling requires the
draw be keyed on the feature identity (the published algorithm's u_{i,j}).
We key on (feature, slot) and divide by the weight.

Merge monoid: elementwise min of (draw value, feature id). Because u_{i,j}
depends only on (feature, slot, seed), ``min(-ln u/w1, -ln u/w2) =
-ln u / max(w1, w2)`` — so merging partial sketches computes the sketch of
the elementwise-MAX-weight union of the inputs (the weighted analog of set
union, exactly how unweighted MinHash unions). A weight that is SPLIT
across partitions (e.g. additive tf counts sharded by row) is therefore
max-combined, not sum-combined: aggregate weights per feature first (one
groupBy) when sum semantics are required. Byte-identity invariant: any
partitioning of a (feature, weight) multiset ∘ any merge order ==
single-pass bytes (ties broken toward the smaller feature id).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import seeded_hashes, splitmix64
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64

# per-call temporaries are (m, chunk) float64; keep them ~16 MB so the hash
# and draw arrays stay cache/TLB-friendly (same motivation as hashing.CHUNK)
_TARGET_CELLS = 1 << 21


def _u64ify(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values)
    if v.dtype == np.uint64:
        return v
    if v.dtype.kind in "iu":
        return v.astype(np.int64).view(np.uint64)
    raise TypeError(f"pmh features must be integer ids, got {v.dtype}")


@register
class PMinHash(Sketch):
    """m-slot consistent weighted sample; ``jaccard`` estimates J_P."""

    kind = "pmh"

    def __init__(self, m: int = 256, seed: int = 137):
        if m < 1:
            raise ValueError("m must be >= 1")
        self.m = int(m)
        self.seed = int(seed)
        self._seeds = splitmix64(self.seed, self.m)
        self.slot_ids = np.zeros(self.m, dtype=np.uint64)
        self.slot_vals = np.full(self.m, np.inf, dtype=np.float64)

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"m": self.m, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"slot_ids": self.slot_ids, "slot_vals": self.slot_vals}

    @classmethod
    def _from_state(cls, params, arrays):
        obj = cls(**params)
        obj.slot_ids = arrays["slot_ids"].astype(np.uint64)
        obj.slot_vals = arrays["slot_vals"].astype(np.float64)
        return obj

    # ---- updates ----------------------------------------------------------
    def _take_better(self, cand_vals: np.ndarray, cand_ids: np.ndarray) -> None:
        better = cand_vals < self.slot_vals
        tie = (cand_vals == self.slot_vals) & (cand_ids < self.slot_ids)
        take = better | tie
        self.slot_vals = np.where(take, cand_vals, self.slot_vals)
        self.slot_ids = np.where(take, cand_ids, self.slot_ids)

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "PMinHash":
        """Absorb (feature id, weight) pairs; ``counts`` are the positive
        float weights (defaults to 1.0 — unweighted sets, where J_P reduces
        to the classic Jaccard). Zero/negative-weight pairs are ignored,
        matching the reference's for_each_nonzero (pmh.h:17-27)."""
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
            hs = seeded_hashes(vc, self._seeds)  # (m, c) uint64
            u = (hs.astype(np.float64) + 0.5) * (2.0**-64)  # (0, 1)
            draws = -np.log(u) / wc  # Exp(rate w) per (slot, feature)
            j = draws.argmin(axis=1)
            rows = np.arange(self.m)
            self._take_better(draws[rows, j], vc[j])
        return self

    def merge(self, other: "PMinHash") -> "PMinHash":
        self._check_mergeable(other)
        self._take_better(other.slot_vals, other.slot_ids)
        return self

    # ---- queries ----------------------------------------------------------
    def jaccard(self, other: "PMinHash") -> float:
        """Probability-Jaccard estimate: fraction of slots whose sampled
        feature agrees (variance J_P(1-J_P)/m)."""
        self._check_mergeable(other)
        both = np.isfinite(self.slot_vals) & np.isfinite(other.slot_vals)
        return float(np.mean((self.slot_ids == other.slot_ids) & both))

    def n_filled(self) -> int:
        return int(np.isfinite(self.slot_vals).sum())


def exact_probability_jaccard(xa: dict[int, float], xb: dict[int, float]) -> float:
    """Exact J_P oracle for tests/gates (quadratic; small inputs only)."""
    keys = sorted(set(xa) | set(xb))
    a = np.array([xa.get(k, 0.0) for k in keys])
    b = np.array([xb.get(k, 0.0) for k in keys])
    total = 0.0
    for i in range(len(keys)):
        if a[i] > 0 and b[i] > 0:
            total += 1.0 / np.maximum(a / a[i], b / b[i]).sum()
    return float(total)
