"""HeavyKeeper: fingerprint + counter heavy-hitter registers
(reference hk.h:21-253; HeavyKeeper paper, Yang et al., USENIX ATC'18).

Layout parity: nh subtables of nbuckets cells, each cell a
(count: ctrbits, fingerprint: fpbits) pair (hk.h:86-100 encode/decode;
defaults fp=32/ctr=32 per ``HeavyKeeper<32,32>``); an item's position and
fingerprint come from division of its per-row hash (hk.h:141-144
divmod) — bucket = h mod nbuckets, fp = (h div nbuckets) & fp_mask.
Query = max over rows of the count where the fingerprint matches
(hk.h:196-208).

Two deliberate restatements, both forced by distribution:

* **Update** — the reference decays the incumbent with probability
  b^(−count) per colliding item (hk.h:130-139, 155-190): stream-order-
  dependent and RNG-per-occurrence, hence not reproducible across
  partitionings (the same class of divergence documented for realccm's
  per-item decay). Here each batch is aggregated EXACTLY per cell
  (np.unique), the batch's majority fingerprint challenges with
  count = (its batch total) − (all other batch totals in the cell), and
  the result folds into the incumbent with the same competition rule as
  merge below. Deterministic, order-invariant within a batch, and the
  same Frequent-algorithm-style guarantee: a key with cell-majority
  traffic keeps an undercount-bounded counter; others decay.
* **Merge** — the reference's ``operator|=`` cannot compile (typo
  ``seccond`` hk.h:224) and is flagged "Not rigorous" (hk.h:234) by its
  author; we implement its evident intent, vectorized: matching
  fingerprints add counts (saturating), differing ones keep the larger
  count's fingerprint with count = max − min (empty on a tie). Like the
  reference's own rule this is commutative (smaller fp wins count ties)
  but NOT associative — guarantee-level, the pccm/t-digest class, with
  heavy-hitter recovery asserted under shuffled merge orders.

With nbuckets sized ≳ 4× the distinct-key count, cells are singly
occupied whp and per-key counts are EXACT (the value-exact gate shape).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, _u64, splitmix64, wanghash
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64


@register
class HeavyKeeper(Sketch):
    kind = "hk"

    def __init__(self, nbuckets: int = 4096, nh: int = 4, fpbits: int = 32, ctrbits: int = 32, seed: int = 137):
        if not 16 <= nbuckets <= (1 << 26):
            raise ValueError("nbuckets must be in [16, 2^26]")
        if not 1 <= nh <= 8:
            raise ValueError("nh must be in [1, 8]")
        if not (1 <= fpbits <= 32 and 1 <= ctrbits <= 32):
            raise ValueError("fpbits and ctrbits must be in [1, 32]")
        self.nbuckets = int(nbuckets)
        self.nh = int(nh)
        self.fpbits = int(fpbits)
        self.ctrbits = int(ctrbits)
        self.seed = int(seed)
        self._seeds = splitmix64(self.seed, self.nh)
        self.counts = np.zeros((self.nh, self.nbuckets), dtype=np.uint64)
        self.fps = np.zeros((self.nh, self.nbuckets), dtype=np.uint64)

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {
            "nbuckets": self.nbuckets,
            "nh": self.nh,
            "fpbits": self.fpbits,
            "ctrbits": self.ctrbits,
            "seed": self.seed,
        }

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"counts": self.counts, "fps": self.fps}

    @classmethod
    def _from_state(cls, params, arrays) -> "HeavyKeeper":
        obj = cls(**params)
        obj.counts = arrays["counts"].astype(np.uint64).reshape(obj.nh, obj.nbuckets)
        obj.fps = arrays["fps"].astype(np.uint64).reshape(obj.nh, obj.nbuckets)
        return obj

    # ---- hashing ----------------------------------------------------------
    def _pos_fp(self, v: np.ndarray, row: int) -> tuple[np.ndarray, np.ndarray]:
        with np.errstate(over="ignore"):
            h = wanghash(v ^ _U64(self._seeds[row]))
        nb = _U64(self.nbuckets)
        pos = (h % nb).astype(np.int64)
        fp = (h // nb) & _U64((1 << self.fpbits) - 1)
        return pos, fp

    # ---- the competition rule (shared by update-fold and merge) -----------
    def _fold_cell(self, row: int, pos: np.ndarray, fp: np.ndarray, cnt: np.ndarray) -> None:
        """Fold (pos, fp, cnt) challengers — at most one per position —
        into row ``row``: same fp adds (saturating), different fp keeps
        the larger count's fp with count = max − min; ties clear the cell
        (the reference's evident |= intent, hk.h:214-245 with the typo
        fixed)."""
        maxc = _U64((1 << self.ctrbits) - 1)
        inc_c = self.counts[row, pos]
        inc_f = self.fps[row, pos]
        same = (inc_f == fp) | (inc_c == 0)
        with np.errstate(over="ignore"):
            added = np.minimum(inc_c + cnt, maxc)
        win_ch = (~same) & (cnt > inc_c)
        win_in = (~same) & (inc_c > cnt)
        tie = (~same) & (inc_c == cnt)
        new_c = np.where(same, added, np.where(win_ch, cnt - inc_c, np.where(win_in, inc_c - cnt, _U64(0))))
        new_f = np.where(same, fp, np.where(win_ch, fp, np.where(win_in, inc_f, _U64(0))))
        new_c = np.where(tie, _U64(0), new_c)
        self.counts[row, pos] = new_c
        self.fps[row, pos] = np.where(new_c == 0, _U64(0), new_f)

    # ---- monoid ops --------------------------------------------------------
    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "HeavyKeeper":
        v = _u64(np.asarray(values))
        if len(v) == 0:
            return self
        w = (
            np.ones(len(v), dtype=np.uint64)
            if counts is None
            else np.asarray(counts, dtype=np.uint64)
        )
        for row in range(self.nh):
            # exact per-(pos, fp) batch aggregation
            pos, fp = self._pos_fp(v, row)
            key = (pos.astype(np.uint64) << _U64(self.fpbits)) | fp
            uk, inv = np.unique(key, return_inverse=True)
            tot = np.bincount(inv, weights=w.astype(np.float64)).astype(np.uint64)
            upos = (uk >> _U64(self.fpbits)).astype(np.int64)
            ufp = uk & _U64((1 << self.fpbits) - 1)
            # per position: majority fp challenges with (its total − others)
            order = np.lexsort((ufp, -tot.astype(np.int64), upos))
            upos_s, ufp_s, tot_s = upos[order], ufp[order], tot[order]
            first = np.ones(len(upos_s), dtype=bool)
            first[1:] = upos_s[1:] != upos_s[:-1]
            starts = np.flatnonzero(first)
            pos_tot = np.add.reduceat(tot_s, starts)  # all traffic in the cell
            win_tot = tot_s[starts]  # majority fp's traffic
            others = pos_tot - win_tot
            net = np.where(win_tot > others, win_tot - others, _U64(0))
            keep = net > 0
            self._fold_cell(row, upos_s[starts][keep], ufp_s[starts][keep], net[keep])
        return self

    def merge(self, other: "HeavyKeeper") -> "HeavyKeeper":
        self._check_mergeable(other)
        for row in range(self.nh):
            occupied = np.flatnonzero(other.counts[row] > 0)
            self._fold_cell(
                row, occupied, other.fps[row, occupied], other.counts[row, occupied]
            )
        return self

    # ---- queries -----------------------------------------------------------
    def query(self, values: np.ndarray) -> np.ndarray:
        """Point estimates: max over rows of the matching-fingerprint count
        (hk.h:196-208)."""
        v = _u64(np.asarray(values))
        if len(v) == 0:
            return np.zeros(0, dtype=np.int64)
        est = np.zeros(len(v), dtype=np.uint64)
        for row in range(self.nh):
            pos, fp = self._pos_fp(v, row)
            hit = self.fps[row, pos] == fp
            est = np.maximum(est, np.where(hit, self.counts[row, pos], _U64(0)))
        return est.astype(np.int64)

    def est_count(self, values: np.ndarray) -> np.ndarray:
        return self.query(values)
