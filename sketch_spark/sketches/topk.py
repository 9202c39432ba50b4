"""Misra-Gries heavy-hitters summary — the top-k capability, mergeable.

The reference's top-k structure is HeavyKeeper (/root/reference/include/
sketch/hk.h:21-460), but its merge is broken in the reference itself (typo
`seccond` at hk.h:224 — cannot compile if instantiated — and the author
marks the merge "Not rigorous", hk.h:234). Per SURVEY.md §2.2 we therefore
ship the top-k capability on a summary with a *proven* merge: Misra-Gries,
whose mergeability (combine counters, then subtract the (m+1)-th largest
and drop non-positives) is established in Agarwal, Cormode, Huang, Phillips,
Wei, Yi — "Mergeable Summaries" (PODS 2012): after any sequence of merges
the summary keeps the MG guarantee

    true_count(x) - N/(m+1)  <=  est(x)  <=  true_count(x)

so every item with frequency > N/(m+1) is guaranteed present. Updates are
vectorized: np.unique the batch, union-sum with the state (same pair-vector
fold as counting minhash), then one quantile cut.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.sketches.base import Sketch, register


@register
class MisraGries(Sketch):
    kind = "topk"

    def __init__(self, m: int = 1024, seed: int = 0, track_values: bool = True):
        """m: capacity (error ≤ N/(m+1)). Keys are stored as raw token ids
        (int64) so results are directly reportable; the seed is only used
        when callers pre-hash."""
        if m < 1:
            raise ValueError("m must be >= 1")
        self.m = int(m)
        self.seed = int(seed)
        self.track_values = bool(track_values)
        self.keys = np.empty(0, dtype=np.int64)    # sorted
        self.counts = np.empty(0, dtype=np.int64)  # aligned, > 0
        self.decremented = 0  # total weight subtracted (for bound reporting)

    # -- internals -----------------------------------------------------------
    def _reduce(self) -> None:
        """MG reduction: if over capacity, subtract the (m+1)-th largest
        count from everyone and drop non-positive counters."""
        if len(self.keys) <= self.m:
            return
        kth = np.partition(self.counts, len(self.counts) - self.m - 1)[
            len(self.counts) - self.m - 1
        ]
        self.decremented += int(kth) * 1  # lower-bound slack grows by kth
        keep = self.counts > kth
        self.keys = self.keys[keep]
        self.counts = self.counts[keep] - kth

    def _absorb(self, keys: np.ndarray, cnt: np.ndarray) -> "MisraGries":
        allk = np.concatenate([self.keys, keys])
        allc = np.concatenate([self.counts, cnt])
        order = np.argsort(allk, kind="stable")
        allk, allc = allk[order], allc[order]
        newk, start = np.unique(allk, return_index=True)
        self.keys = newk
        self.counts = np.add.reduceat(allc, start)
        self._reduce()
        return self

    # -- monoid ops ----------------------------------------------------------
    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "MisraGries":
        if len(values) == 0:
            return self
        v = np.asarray(values)
        if v.dtype.kind == "f":
            v = v.astype(np.int64)
        if counts is None:
            uniq, cnt = np.unique(v, return_counts=True)
            cnt = cnt.astype(np.int64)
        else:
            c = np.asarray(counts)
            uniq, inv = np.unique(v, return_inverse=True)
            if c.dtype.kind in "iub":
                # integer weights: exact int64 accumulation (no float64
                # round-trip, which silently truncates above 2^53)
                cnt = np.zeros(len(uniq), dtype=np.int64)
                np.add.at(cnt, inv, c.astype(np.int64))
            else:
                # fractional weights: accumulate in float64, then round to
                # nearest (not truncate) — a batch of 0.9s contributes ~0.9n,
                # not 0. Counts are integral by contract; document rounding.
                acc = np.bincount(inv, weights=c.astype(np.float64), minlength=len(uniq))
                cnt = np.rint(acc).astype(np.int64)
        return self._absorb(uniq.astype(np.int64), cnt)

    def merge(self, other: "MisraGries") -> "MisraGries":
        self._check_mergeable(other)
        self.decremented += other.decremented
        if len(other.keys):
            self._absorb(other.keys, other.counts)
        elif len(self.keys) > self.m:  # pragma: no cover
            self._reduce()
        return self

    # -- queries -------------------------------------------------------------
    def query(self, values: np.ndarray) -> np.ndarray:
        """Estimated counts (0 for untracked keys). Underestimates by at most
        N/(m+1)."""
        v = np.asarray(values, dtype=np.int64)
        pos = np.searchsorted(self.keys, v)
        pos = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        if len(self.keys) == 0:
            return np.zeros(len(v), dtype=np.int64)
        hit = self.keys[pos] == v
        return np.where(hit, self.counts[pos], 0)

    def topk(self, k: int) -> list[tuple[int, int]]:
        """[(key, est_count)] for the k largest counters, count-descending
        (ties by key ascending, deterministic)."""
        if len(self.keys) == 0:
            return []
        order = np.lexsort((self.keys, -self.counts))[:k]
        return [(int(self.keys[i]), int(self.counts[i])) for i in order]

    def error_bound(self) -> int:
        """Max undercount across all keys (≤ N/(m+1); tracked exactly as the
        total decremented weight)."""
        return int(self.decremented)

    # -- state ---------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"m": self.m, "seed": self.seed, "track_values": self.track_values}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {
            "keys": self.keys,
            "counts": self.counts,
            "meta": np.array([self.decremented], dtype=np.int64),
        }

    @classmethod
    def _from_state(cls, params, arrays) -> "MisraGries":
        obj = cls(**params)
        obj.keys = arrays["keys"].astype(np.int64)
        obj.counts = arrays["counts"].astype(np.int64)
        obj.decremented = int(arrays["meta"][0])
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"MisraGries(m={self.m}, tracked={len(self.keys)})"
