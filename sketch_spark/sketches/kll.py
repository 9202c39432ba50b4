"""KLL quantile sketch — implemented from the published algorithm.

The reference ships only an *unfinished* DDSketch (/root/reference/include/
sketch/dd.h:137 — `grow_right` unconditionally throws, no quantile method),
so per SURVEY.md §2.1 #8 we implement the quantile capability from scratch
following Karnin–Lang–Liberty (FOCS 2016, arXiv:1603.05346): a stack of
compactors, level h holding items of weight 2^h; capacity of level h is
ceil(k·c^(H-h)) with c = 2/3; a full level sorts itself and promotes every
other element (random even/odd offset) to level h+1.

Distributed-merge model (what DDSketch's bin-wise `+` merge, dd.h:59-85,
is the template for): merge = levelwise concatenation followed by the same
compaction loop — associative up to the sketch's rank-error guarantee, and
deterministic here because compaction coin-flips come from a counter-seeded
splitmix64 stream carried in the state.

Guarantee: rank error ≤ ε·n with ε ≈ O(1/k) (empirically ~1.7/k at c=2/3 per
the paper's analysis); we assert rank error against exact oracles in tests.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np


from sketch_spark.sketches.base import Sketch, register

_C = 2.0 / 3.0


@register
class KLL(Sketch):
    kind = "kll"

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0  # total items absorbed
        self.coin = 0  # compaction counter → deterministic coin stream

    # -- internals -------------------------------------------------------------
    def _capacity(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(math.ceil(self.k * (_C**depth))))

    def _coin_flip(self) -> int:
        z = (self.seed ^ 0x5EED) + 0x9E3779B97F4A7C15 * (self.coin + 1) & (1 << 64) - 1
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        self.coin += 1
        return (z ^ (z >> 31)) & 1

    def _compact(self) -> None:
        """Compact any over-capacity level, bottom-up."""
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._capacity(h):
                buf = np.sort(self.levels[h])
                if len(buf) % 2 == 1:
                    # keep one item at this level so weights stay exact
                    keep_idx = self._coin_flip() * (len(buf) - 1)
                    keep = buf[keep_idx : keep_idx + 1]
                    buf = np.delete(buf, keep_idx)
                else:
                    keep = np.empty(0, dtype=np.float64)
                offset = self._coin_flip()
                promoted = buf[offset::2]
                self.levels[h] = keep
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    # -- monoid ops --------------------------------------------------------------
    # values absorbed per compaction pass: level capacities are O(k) (a few
    # hundred), so feeding 1M at a time keeps transients ~8 MB instead of
    # materializing a whole file-unit batch (19M values = ~450 MB measured)
    # in level 0 before the first compaction. KLL state is batch-boundary
    # dependent by contract (estimates-only parity — see tests), so the
    # sub-batching changes no guarantee.
    _SUB = 1 << 20

    def update(self, values: np.ndarray) -> "KLL":
        raw = np.asarray(values)
        for s in range(0, len(raw), self._SUB):
            v = np.asarray(raw[s : s + self._SUB], dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) == 0:
                continue
            self.levels[0] = np.concatenate([self.levels[0], v])
            self.n += len(v)
            self._compact()
        return self

    def merge(self, other: "KLL") -> "KLL":
        self._check_mergeable(other)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if len(lvl):
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.n += other.n
        self.coin ^= other.coin  # decorrelate future flips of merged lineages
        self._compact()
        return self

    # -- queries -------------------------------------------------------------------
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q ∈ [0,1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, wt = self._items_weights()
        if len(it) == 0:
            out = np.full(len(qs), np.nan)
            return out if np.ndim(q) else float(out[0])
        cum = np.cumsum(wt)
        targets = np.clip(qs, 0.0, 1.0) * cum[-1]
        pos = np.searchsorted(cum, targets, side="left")
        pos = np.clip(pos, 0, len(it) - 1)
        out = it[pos]
        return out if np.ndim(q) else float(out[0])

    def rank(self, values) -> np.ndarray | float:
        """Estimated normalized rank(s) of value(s): fraction of stream ≤ v."""
        vs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        it, wt = self._items_weights()
        if len(it) == 0:
            out = np.full(len(vs), np.nan)
            return out if np.ndim(values) else float(out[0])
        cum = np.concatenate([[0], np.cumsum(wt)])
        pos = np.searchsorted(it, vs, side="right")
        out = cum[pos] / cum[-1]
        return out if np.ndim(values) else float(out[0])

    def cdf(self, split_points: np.ndarray) -> np.ndarray:
        return np.asarray(self.rank(np.asarray(split_points)))

    def epsilon(self) -> float:
        """Empirical rank-error envelope ~1.7/k for c=2/3 (KLL paper §5)."""
        return 1.7 / self.k

    # -- state -------------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"k": self.k, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        arrs: dict[str, np.ndarray] = {
            "meta": np.array([self.n, self.coin, len(self.levels)], dtype=np.int64)
        }
        for h, lvl in enumerate(self.levels):
            arrs[f"l{h}"] = lvl
        return arrs

    @classmethod
    def _from_state(cls, params, arrays) -> "KLL":
        obj = cls(**params)
        n, coin, nlev = arrays["meta"]
        obj.n, obj.coin = int(n), int(coin)
        obj.levels = [arrays[f"l{h}"].astype(np.float64) for h in range(int(nlev))]
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"KLL(k={self.k}, n={self.n}, levels={len(self.levels)})"
