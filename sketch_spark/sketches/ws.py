"""WeightedSketcher: multiset → set-expansion adapter over any set sketch.

Mirrors the reference ``wj::WeightedSketcher`` (/root/reference/include/
sketch/mult.h:345-420): a counting sketch tracks how many times each item
has been seen; on the c-th occurrence of x the pair hash ``h(x, c)`` is
inserted into a base *set* sketch (mult.h:375-385 ``add``). The expanded
set {(x, 1), …, (x, n_x)} turns multiset (weighted-Jaccard) similarity
into plain set similarity: J(expand(A), expand(B)) = Σ min(a_x, b_x) /
Σ max(a_x, b_x) exactly, so any set sketch (bottom-k minhash, b-bit
minhash, SuperMinHash, HLL…) estimates the weighted Jaccard at its usual
variance. The pair hasher is the reference's default ``WangPairHasher``
(mult.h:335-342): ``wanghash(x) ^ count`` — bit-exact parity; the base
sketch re-hashes the pair value on insert just as ``sketch_.addh`` does.
``pair_hasher="xxh3"`` selects the reference's alternative
``XXH3PairHasher`` (hash.h:812-820): ``XXH3_64bits_withSeed(&x, 8,
count)`` — also bit-exact, via the vectorized public-XXH3 short-key
kernel in ``hashing.xxh3_u64`` (verified against libxxhash).

Counting sketch: the reference defaults to HeavyKeeper (whose merge cannot
compile there — hk.h:224 typo); we use the mergeable Count-Min sketch,
which the reference also supports (``CWSketch``/cmsketch variants,
mult.h:427-438). CMS overestimates under collision, which can shift an
item's occurrence indices and cost a matched pair — identical failure
mode to the reference's approximate counter; size ``l2sz`` ≥
log2(expected distinct items) + 2 to make it negligible.

Distribution semantics (the reference has NO merge for this adapter; this
is our addition): merging two WeightedSketchers unions the expanded sets,
so an item seen in BOTH shards contributes max(c_shard1, c_shard2) — not
the sum — because both shards number its occurrences from 1. Merge is
therefore exact for key-partitioned data (each item's occurrences in one
shard, e.g. after ``sketch_by_key`` or a pre-aggregation) and a
documented max-of-shard-weights approximation otherwise. For global
weights on raw streams, pre-aggregate counts (one groupBy) and feed them
through ``update(values, counts=...)`` — the one-pass 100 TB shape.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import _u64, wanghash, xxh3_u64
from sketch_spark.sketches.base import Sketch, from_bytes, make_sketch, register, subbatched
from sketch_spark.sketches.cms import CountMinSketch

_U64 = np.uint64
_SLAB = 1 << 20  # max expanded pairs materialized per slab


@register
class WeightedSketcher(Sketch):
    kind = "ws"

    def __init__(
        self,
        base_kind: str = "minhash",
        base_params: dict | None = None,
        l2sz: int = 18,
        nh: int = 4,
        seed: int = 137,
        pair_hasher: str = "wang",
    ):
        if pair_hasher not in ("wang", "xxh3"):
            raise ValueError("pair_hasher must be 'wang' or 'xxh3'")
        self.base_kind = str(base_kind)
        self.base_params = dict(base_params or {})
        self.l2sz = int(l2sz)
        self.nh = int(nh)
        self.seed = int(seed)
        self.pair_hasher = str(pair_hasher)
        self.base = make_sketch(self.base_kind, **self.base_params)
        # decouple the counter's hash family from the base sketch's
        self.counter = CountMinSketch(l2sz=self.l2sz, nh=self.nh, seed=self.seed ^ 0x5CA1AB1E)

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {
            "base_kind": self.base_kind,
            "base_params": self.base_params,
            "l2sz": self.l2sz,
            "nh": self.nh,
            "seed": self.seed,
            "pair_hasher": self.pair_hasher,
        }

    def _arrays(self) -> dict[str, np.ndarray]:
        return {
            "counter": np.frombuffer(self.counter.to_bytes(), dtype=np.uint8),
            "base": np.frombuffer(self.base.to_bytes(), dtype=np.uint8),
        }

    @classmethod
    def _from_state(cls, params, arrays) -> "WeightedSketcher":
        obj = cls(**params)
        obj.counter = from_bytes(arrays["counter"].tobytes())
        obj.base = from_bytes(arrays["base"].tobytes())
        return obj

    # ---- monoid ops --------------------------------------------------------
    @subbatched
    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "WeightedSketcher":
        """Absorb a batch of item ids; ``counts`` = pre-aggregated weights.

        Occurrence numbering continues across calls: the CMS is queried for
        each distinct item's prior count (mult.h:378 reads the counter
        before inserting the pair), so feeding one item in two batches
        produces the same expanded pairs as one batch with the summed
        count — regression-tested byte-identical."""
        v = _u64(np.asarray(values))
        if len(v) == 0:
            return self
        c = (
            np.ones(len(v), dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )
        uniq, inv = np.unique(v, return_inverse=True)
        cnt = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        keep = cnt > 0
        uniq, cnt = uniq[keep], cnt[keep]
        if len(uniq) == 0:
            return self
        prior = self.counter.query(uniq)
        base_hash = wanghash(uniq) if self.pair_hasher == "wang" else None
        # expand to (item, occurrence) pairs in bounded slabs
        ends = np.cumsum(cnt)
        total = int(ends[-1])
        starts = ends - cnt
        for lo in range(0, total, _SLAB):
            hi = min(lo + _SLAB, total)
            pos = np.arange(lo, hi, dtype=np.int64)
            # which unique item owns each expanded position
            owner = np.searchsorted(ends, pos, side="right")
            occ = pos - starts[owner] + prior[owner] + 1
            with np.errstate(over="ignore"):
                if self.pair_hasher == "xxh3":
                    # XXH3PairHasher: hash the RAW item value, occurrence
                    # count as the xxh3 seed (hash.h:815)
                    pairs = xxh3_u64(uniq[owner], occ.astype(np.uint64))
                else:
                    pairs = base_hash[owner] ^ occ.astype(np.uint64)
            self.base.update(pairs)
        self.counter.update(uniq, counts=cnt)
        return self

    def merge(self, other: "WeightedSketcher") -> "WeightedSketcher":
        self._check_mergeable(other)
        self.counter.merge(other.counter)
        self.base.merge(other.base)
        return self

    # ---- queries -----------------------------------------------------------
    def weighted_jaccard(self, other: "WeightedSketcher") -> float:
        """Σmin/Σmax weighted Jaccard estimate via the base set sketch."""
        self._check_mergeable(other)
        for name in ("jaccard_index", "jaccard"):
            fn = getattr(self.base, name, None)
            if fn is not None:
                return float(fn(other.base))
        raise TypeError(f"base sketch {self.base_kind!r} has no Jaccard query")

    def total_mass(self) -> float:
        """Estimated Σ_x n_x (the expanded set's cardinality = the total
        weighted mass of the multiset)."""
        return float(self.base.cardinality_estimate())

    def est_count(self, values: np.ndarray) -> np.ndarray:
        """CMS point estimates of per-item weights absorbed so far."""
        return self.counter.query(_u64(np.asarray(values)))
