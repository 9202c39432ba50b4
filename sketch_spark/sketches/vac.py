"""VACSketch: geometric level-subsampled sketch ensemble (reference vac.h:20-57).

Each occurrence draws a geometric depth ``end = min(ctz(rand) + 1, n)`` and
inserts into levels 0..end-1 of an n-level HLL stack (vac.h:37-42 addh):
level i therefore sees each occurrence independently with probability 2^-i,
so level-i's distinct estimate converges to Σ_v (1 − (1 − 2^-i)^c_v) — the
sampled multiplicity CDF that lets one stack discriminate heavy values
(which survive deep levels) from singletons (which die off as 2^-i).
Level 0 is always inserted (the reference's do-while), so it IS a plain
HLL over the full stream — byte-identical to one, which anchors the whole
stack's cardinality to the standard HLL bound.

Merge is levelwise register max (vac.h:44-51 ``+=``) — each level is an
independent HLL max-monoid, so merged partials estimate the union at every
level. Determinism: the reference draws from a thread-local RNG
(occurrence-level randomness, not reproducible); here draws are
counter-based splitmix of (seed, update-round, position) with the round
counter carried in the serialized state (the pccm recipe) — a fixed batch
sequence reproduces exactly and kill/resume continues the draw stream, but
like pccm/t-digest the sketch is guarantee-level, not merge-order
byte-identical, across different partitionings (sampling draws depend on
which partition saw the occurrence).

The reference's vac.h defines only addh and merge — no estimator ships
with it — so ``level_estimates()`` (per-level Ertl estimates) plus
``expected_level(counts)`` (the exact E[] curve for validation) constitute
the query surface here.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, hash_tokens, splitmix64
from sketch_spark.sketches.base import Sketch, register
from sketch_spark.sketches.hll import _register_updates, ertl_improved_estimate

_U64 = np.uint64


def _draw_depths(seed: int, rnd: int, n_items: int, n_levels: int) -> np.ndarray:
    """ctz(splitmix(seed, round, position)) + 1, capped at n_levels."""
    with np.errstate(over="ignore"):
        z = (
            _U64(seed)
            + _U64(0x9E3779B97F4A7C15) * (np.arange(n_items, dtype=np.uint64) + _U64(1))
            + _U64(0xD6E8FEB86659FD93) * _U64(rnd + 1)
        )
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z ^= z >> _U64(31)
        # ctz via the isolated lowest set bit's log2; z==0 → full depth
        low = z & (~z + _U64(1))
    ctz = np.where(z == 0, 64, np.log2(low.astype(np.float64)).astype(np.int64))
    return np.minimum(ctz + 1, n_levels).astype(np.int64)


@register
class VACSketch(Sketch):
    kind = "vac"

    def __init__(self, p: int = 12, n_levels: int = 16, seed: int = 137):
        if not 4 <= p <= 24:
            raise ValueError("p must be in [4, 24]")
        if not 2 <= n_levels <= 64:
            raise ValueError("n_levels must be in [2, 64] (vac.h:29 requires n >= 2)")
        self.p = int(p)
        self.n_levels = int(n_levels)
        self.seed = int(seed)
        self.regs = np.zeros((self.n_levels, 1 << self.p), dtype=np.uint8)
        self.rounds = 0

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"p": self.p, "n_levels": self.n_levels, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"regs": self.regs, "rounds": np.array([self.rounds], dtype=np.uint64)}

    @classmethod
    def _from_state(cls, params, arrays):
        obj = cls(**params)
        obj.regs = arrays["regs"].astype(np.uint8).reshape(obj.n_levels, 1 << obj.p)
        obj.rounds = int(arrays["rounds"][0]) if "rounds" in arrays else 0
        return obj

    # ---- monoid ops --------------------------------------------------------
    def update(self, values: np.ndarray) -> "VACSketch":
        v = np.asarray(values)
        if len(v) == 0:
            return self
        rnd = self.rounds
        self.rounds += 1
        depths = _draw_depths(self.seed, rnd, len(v), self.n_levels)
        for i in range(0, len(v), CHUNK):
            chunk = v[i : i + CHUNK]
            d = depths[i : i + CHUNK]
            hashed = hash_tokens(chunk, self.seed)
            idx, rank = _register_updates(hashed, self.p)
            order = np.argsort(d, kind="stable")
            d_sorted = d[order]
            idx_s, rank_s = idx[order], rank[order]
            # level ℓ receives every occurrence with depth > ℓ: one suffix
            # slice per level instead of n_levels boolean masks
            starts = np.searchsorted(d_sorted, np.arange(self.n_levels) + 1, side="left")
            for lvl in range(self.n_levels):
                s = starts[lvl] if lvl > 0 else 0
                if s >= len(d_sorted):
                    break
                np.maximum.at(self.regs[lvl], idx_s[s:], rank_s[s:])
        return self

    def merge(self, other: "VACSketch") -> "VACSketch":
        self._check_mergeable(other)
        np.maximum(self.regs, other.regs, out=self.regs)
        self.rounds = max(self.rounds, other.rounds)
        return self

    # ---- queries -----------------------------------------------------------
    def level_estimates(self) -> np.ndarray:
        """Per-level Ertl distinct estimates; level i → Σ_v (1−(1−2^-i)^c_v)."""
        return np.array(
            [
                ertl_improved_estimate(
                    np.bincount(self.regs[lvl], minlength=64 - self.p + 2), self.p
                )
                for lvl in range(self.n_levels)
            ]
        )

    def estimate(self) -> float:
        """Full-stream distinct cardinality = level-0 (always-inserted) HLL."""
        return float(self.level_estimates()[0])

    def relative_error(self) -> float:
        import math

        return 1.03896 / math.sqrt(1 << self.p)

    @staticmethod
    def expected_level(counts: np.ndarray, n_levels: int) -> np.ndarray:
        """Exact E[level-i distinct] for a multiplicity vector (validation)."""
        c = np.asarray(counts, dtype=np.float64)
        out = np.empty(n_levels)
        for i in range(n_levels):
            out[i] = (1.0 - (1.0 - 2.0**-i) ** c).sum()
        return out
