"""Counting Bloom filter stack (reference cbfbase_t/cbf_t, cbf.h:33-110).

NOT the classic increment/decrement counting Bloom: the reference counts in
LOG SCALE via a stack of plain Bloom filters. An occurrence of x first
inserts into bf[0]; once x is contained in levels 0..d-1 but not d, each
further occurrence flips a coin with probability 2^-d and promotes x into
bf[d] on heads (cbf.h:58-76 addh). The count estimate is therefore
``2^(deepest containing level − 1)`` (cbf.h:80-85 est_count) — a Morris
counter per item realized as Bloom membership, with level sizes shrinking
one power of two per level (detail::pcbf_bf_mgen, cbf.h:21-29) because
level d holds ~2^-d of the items.

Distributed restatement: levels merge by Bloom OR — the merged stack's
depth for x is the max depth across partials (Morris max-merge without the
tie increment, so merged estimates run low by up to one level per merge,
the same envelope as pccm's distributed path). Per-occurrence coin flips
collapse to vectorized geometric jumps exactly like MorrisCMS: a value at
depth d with h remaining hits promotes iff Geometric(2^-d) ≤ h. Draws are
counter-based (seed, value, depth, round, epoch) with the update-round
counter carried in the serialized state — a fixed batch sequence is
reproducible and kill/resume continues the stream; like pccm the sketch is
guarantee-level, not merge-order byte-identical.

``may_contain`` (= bf[0] membership, cbf.h:77-79) has NO false negatives;
Bloom false positives can only inflate counts (one-sided, like CMS).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import splitmix64, wanghash
from sketch_spark.sketches.base import Sketch, register
from sketch_spark.sketches.bloom import BloomFilter

_U64 = np.uint64


@register
class CountingBloomStack(Sketch):
    kind = "cbf"

    def __init__(
        self,
        l2sz: int = 16,
        n_levels: int = 12,
        nh: int = 4,
        seed: int = 1337,
        shrink: bool = True,
    ):
        if not 2 <= n_levels <= 32:
            raise ValueError("n_levels must be in [2, 32]")
        self.l2sz = int(l2sz)
        self.n_levels = int(n_levels)
        self.nh = int(nh)
        self.seed = int(seed)
        self.shrink = bool(shrink)
        lvl_seeds = splitmix64(self.seed, self.n_levels)
        self.levels = [
            BloomFilter(l2sz=self._lvl_l2sz(i), nh=self.nh, seed=int(lvl_seeds[i]))
            for i in range(self.n_levels)
        ]
        self.rounds = 0

    def _lvl_l2sz(self, i: int) -> int:
        # pcbf_bf_mgen: shrink one power of two per level, floor at 10
        return max(self.l2sz - i, 10) if self.shrink else self.l2sz

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {
            "l2sz": self.l2sz,
            "n_levels": self.n_levels,
            "nh": self.nh,
            "seed": self.seed,
            "shrink": self.shrink,
        }

    def _arrays(self) -> dict[str, np.ndarray]:
        out = {f"w{i}": bf.words for i, bf in enumerate(self.levels)}
        out["rounds"] = np.array([self.rounds], dtype=np.uint64)
        return out

    @classmethod
    def _from_state(cls, params, arrays):
        obj = cls(**params)
        for i, bf in enumerate(obj.levels):
            bf.words = arrays[f"w{i}"].astype(np.uint64)
        obj.rounds = int(arrays["rounds"][0]) if "rounds" in arrays else 0
        return obj

    # ---- draws ------------------------------------------------------------
    def _uniforms(self, vals: np.ndarray, depth: np.ndarray, rnd: int, epoch: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            z = (
                _U64(self.seed)
                + _U64(0x9E3779B97F4A7C15) * (vals + _U64(1))
                + _U64(0xBF58476D1CE4E5B9) * (depth.astype(np.uint64) + _U64(rnd << 8))
                + _U64(0xD6E8FEB86659FD93) * _U64(epoch + 1)
            )
            z = wanghash(z)
        return (z.astype(np.float64) + 0.5) * (2.0**-64)

    # ---- level hooks (pcbf overrides both) -----------------------------------
    def _level_contains(self, lvl: int, vals: np.ndarray) -> np.ndarray:
        return self.levels[lvl].may_contain(vals)

    def _insert_level(self, lvl: int, vals: np.ndarray) -> None:
        self.levels[lvl].update(vals.view(np.int64))

    # ---- monoid ops --------------------------------------------------------
    def _depths(self, vals: np.ndarray) -> np.ndarray:
        """Consecutive containing levels from 0 (0 = absent from bf[0])."""
        depth = np.zeros(len(vals), dtype=np.int64)
        alive = np.ones(len(vals), dtype=bool)
        for i in range(self.n_levels):
            if not alive.any():
                break
            hit = np.zeros(len(vals), dtype=bool)
            hit[alive] = self._level_contains(i, vals[alive])
            depth[alive & hit] = i + 1
            alive &= hit
        return depth

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "CountingBloomStack":
        v = np.asarray(values)
        if v.dtype.kind not in "iu":
            raise TypeError("cbf takes integer ids (hash strings upstream)")
        if len(v) == 0:
            return self
        epoch = self.rounds
        self.rounds += 1
        u64 = v.astype(np.int64).view(np.uint64)
        if counts is None:
            uniq, hits = np.unique(u64, return_counts=True)
            hits = hits.astype(np.float64)
        else:
            c = np.asarray(counts, dtype=np.float64)
            uniq, inv = np.unique(u64, return_inverse=True)
            hits = np.bincount(inv, weights=c, minlength=len(uniq))
        depth = self._depths(uniq)
        # first-ever hit inserts into bf[0] deterministically (cbf.h:59-61)
        fresh = (depth == 0) & (hits > 0)
        if fresh.any():
            self._insert_level(0, uniq[fresh])
            depth[fresh] = 1
            hits[fresh] -= 1
        rem = hits
        rnd = 0
        while True:
            active = (rem > 0) & (depth < self.n_levels)
            if not active.any():
                break
            u = self._uniforms(uniq, depth, rnd, epoch)
            p = np.exp2(-depth.astype(np.float64))
            with np.errstate(divide="ignore", over="ignore"):
                g = np.ceil(np.log(u) / np.log1p(-p))
            g = np.where(np.isfinite(g) & (g >= 1.0), g, np.inf)
            promote = active & (g <= rem)
            if promote.any():
                for lvl in np.unique(depth[promote]):
                    sel = promote & (depth == lvl)
                    self._insert_level(int(lvl), uniq[sel])
            rem = np.where(promote, rem - g, 0.0)
            depth[promote] += 1
            rnd += 1
        return self

    def merge(self, other: "CountingBloomStack") -> "CountingBloomStack":
        self._check_mergeable(other)
        for a, b in zip(self.levels, other.levels):
            np.bitwise_or(a.words, b.words, out=a.words)
        self.rounds = max(self.rounds, other.rounds)
        return self

    # ---- queries -----------------------------------------------------------
    def may_contain(self, values: np.ndarray) -> np.ndarray:
        """bf[0] membership (cbf.h:77-79) — no false negatives."""
        return self.levels[0].may_contain(np.asarray(values))

    def est_count(self, values: np.ndarray) -> np.ndarray:
        """2^(deepest containing level − 1); 0 when absent (cbf.h:80-85)."""
        d = self._depths(np.asarray(values).astype(np.int64).view(np.uint64))
        return np.where(d > 0, np.exp2((d - 1).astype(np.float64)), 0.0)


@register
class ProbabilisticCountingBloom(CountingBloomStack):
    """pcbf_t (reference cbf.h:115-201): the cbf stack with a seeded HLL
    paired to each Bloom level. Level membership is the AND of the pair
    (bf.may_contain AND hll.may_contain, cbf.h:167/175 — the HLL register
    acts as a second, differently-seeded weak filter, cutting the stack's
    false-positive-driven depth inflation), promotions insert into BOTH,
    and each level's HLL additionally reports HOW MANY distinct items
    reached that depth — the per-level cardinality curve the plain cbf
    cannot answer ("provides cardinality estimates for the number of
    elements reaching each stage", cbf.h:116-117).

    Merge: levelwise Bloom OR + levelwise HLL register max. Same
    guarantee-level envelope and counter-based draw determinism as cbf.
    """

    kind = "pcbf"

    def __init__(
        self,
        l2sz: int = 16,
        n_levels: int = 12,
        nh: int = 4,
        seed: int = 1337,
        shrink: bool = True,
        hllp: int = 10,
    ):
        super().__init__(l2sz=l2sz, n_levels=n_levels, nh=nh, seed=seed, shrink=shrink)
        if not 4 <= hllp <= 18:
            raise ValueError("hllp must be in [4, 18]")
        self.hllp = int(hllp)
        hseeds = splitmix64(self.seed ^ 0x5EEDFACE, self.n_levels)
        from sketch_spark.sketches.hll import HyperLogLog

        self.hlls = [
            HyperLogLog(p=self.hllp, seed=int(hseeds[i])) for i in range(self.n_levels)
        ]

    def _params(self) -> dict[str, Any]:
        out = super()._params()
        out["hllp"] = self.hllp
        return out

    def _arrays(self) -> dict[str, np.ndarray]:
        out = super()._arrays()
        for i, h in enumerate(self.hlls):
            out[f"h{i}"] = h.regs
        return out

    @classmethod
    def _from_state(cls, params, arrays):
        obj = super()._from_state(params, arrays)
        for i, h in enumerate(obj.hlls):
            h.regs = arrays[f"h{i}"].astype(np.uint8)
        return obj

    def _level_contains(self, lvl: int, vals: np.ndarray) -> np.ndarray:
        return self.levels[lvl].may_contain(vals) & self.hlls[lvl].may_contain(
            vals.view(np.int64)
        )

    def _insert_level(self, lvl: int, vals: np.ndarray) -> None:
        super()._insert_level(lvl, vals)
        self.hlls[lvl].update(vals.view(np.int64))

    def merge(self, other: "ProbabilisticCountingBloom") -> "ProbabilisticCountingBloom":
        super().merge(other)
        for a, b in zip(self.hlls, other.hlls):
            np.maximum(a.regs, b.regs, out=a.regs)
        return self

    def level_cardinalities(self) -> np.ndarray:
        """Distinct items that reached each depth (per-level HLL estimates)
        — ≈ #items with count ≳ 2^i at level i (the multiplicity curve)."""
        return np.array([h.estimate() for h in self.hlls])
