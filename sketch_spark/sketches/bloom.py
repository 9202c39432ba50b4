"""Bloom filter over a uint64 bit-word array — vectorized NumPy kernel.

Semantics mirror the reference `bfbase_t` (/root/reference/include/sketch/
bf.h:40-745): m = 2^l2sz bits held in uint64 words, nh seeded subhashes per
element (bf.h:364-381 derives several index fields per hash word; we derive
one index per seeded WangHash — same guarantee, simpler layout), merge =
bitwise OR (bf.h:486-511), plus the popcount-based estimates:

  * false-positive-rate estimate (popcount/m)^nh  (bf.h:199-202)
  * cardinality from fill ratio  -m/nh * log1p(-popcount/m)  (bf.h:73-76)
  * set algebra |, &, ^ and Jaccard/union/intersection size estimates via
    popcounts of combined filters (bf.h:232-361, 435-520)

optimal nh for a target n: ln2 * m / n (bf.h:15-20).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, double_hashes, splitmix64
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64


def _popcount(words: np.ndarray) -> int:
    """Total set bits (numpy<2 has no bitwise_count; unpackbits on the byte
    view is a single vectorized pass)."""
    return int(np.unpackbits(words.view(np.uint8)).sum())


def optimal_nhashes(m_bits: int, n_items: int) -> int:
    return max(1, round(math.log(2) * m_bits / max(n_items, 1)))


@register
class BloomFilter(Sketch):
    kind = "bloom"
    # bit positions come from KM double hashing since round 4 — tag the wire
    # state so pre-KM persisted states refuse to load (see base.hash_family)
    hash_family = "km2008"

    def __init__(self, l2sz: int = 20, nh: int = 4, seed: int = 1337):
        if not 6 <= l2sz <= 36:
            raise ValueError("l2sz must be in [6, 36]")
        self.l2sz = int(l2sz)
        self.nh = int(nh)
        self.seed = int(seed)
        self.m = 1 << l2sz
        self.words = np.zeros(self.m >> 6, dtype=np.uint64)
        self._seeds = splitmix64(self.seed, self.nh)
        # Kirsch–Mitzenmacher base-hash seeds (hashing.double_hashes) — the
        # construction KM 2008 proves FPR-preserving for exactly this use.
        self._dhseeds = splitmix64(self.seed ^ 0xD1B54A32D192ED03, 2)

    # -- monoid ops ----------------------------------------------------------
    def _indices(self, values: np.ndarray) -> np.ndarray:
        """(nh, n) bit indices in [0, m)."""
        hs = double_hashes(
            np.asarray(values), int(self._dhseeds[0]), int(self._dhseeds[1]), self.nh
        )
        return (hs & _U64(self.m - 1)).astype(np.int64)

    # Byte-flag scatter path: above this filter size the transient 1-byte-
    # per-bit array (m bytes) is too much memory per task; below it, but
    # with too little work to amortize the unpack+pack (~0.7 ns/bit), the
    # direct bitwise_or path wins — hence the work gate in update().
    _FLAGS_MAX_BITS = 1 << 28

    def update(self, values: np.ndarray) -> "BloomFilter":
        v = np.asarray(values)
        if len(v) == 0:
            return self
        # Two exact, bit-identical scatter strategies (OR is idempotent and
        # order-free): for big batches, unpack the filter to one byte per
        # bit once, fancy-store 1s (a plain scatter store — ~6× faster than
        # bitwise_or.at, which has no NumPy indexed-loop fast path), repack;
        # for small batches the unpack+pack overhead (~0.7 ns/bit) would
        # dominate, so OR bytes in place.
        use_flags = self.m <= self._FLAGS_MAX_BITS and len(v) * self.nh >= (self.m >> 6)
        if use_flags:
            flags = np.unpackbits(self.words.view(np.uint8), bitorder="little")
            for i in range(0, len(v), CHUNK):
                idx = self._indices(v[i : i + CHUNK]).ravel()
                flags[idx] = 1
            self.words = np.packbits(flags, bitorder="little").view(np.uint64)
        else:
            w8 = self.words.view(np.uint8)
            for i in range(0, len(v), CHUNK):
                idx = self._indices(v[i : i + CHUNK]).ravel()
                np.bitwise_or.at(
                    w8, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
                )
        return self

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_mergeable(other)
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        """Bitwise AND (reference `&=` bf.h:439): a filter that may-contain
        only items present in both (superset of the true intersection)."""
        self._check_mergeable(other)
        np.bitwise_and(self.words, other.words, out=self.words)
        return self

    def symmetric_difference(self, other: "BloomFilter") -> "BloomFilter":
        """Bitwise XOR (reference `^=` bf.h:465): bit-level symmetric
        difference (popcount ≈ bits unique to either side)."""
        self._check_mergeable(other)
        np.bitwise_xor(self.words, other.words, out=self.words)
        return self

    # -- queries ---------------------------------------------------------------
    def may_contain(self, values: np.ndarray) -> np.ndarray:
        """Boolean array: False = definitely absent (no false negatives)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(values)  # (nh, n)
        word, bit = idx >> 6, idx & 63
        bits = (self.words[word] >> bit.astype(np.uint64)) & _U64(1)
        return bits.all(axis=0).astype(bool)

    def popcount(self) -> int:
        return _popcount(self.words)

    def est_fpr(self) -> float:
        """(popcount/m)^nh (reference bf.h:199-202)."""
        return (self.popcount() / self.m) ** self.nh

    def cardinality_estimate(self) -> float:
        """-m/nh * ln(1 - fill) (reference bf.h:73-76)."""
        fill = self.popcount() / self.m
        if fill >= 1.0:
            return math.inf
        return -(self.m / self.nh) * math.log1p(-fill)

    @staticmethod
    def _card_from_popcount(pc: int, m: int, nh: int) -> float:
        fill = pc / m
        if fill >= 1.0:
            return math.inf
        return -(m / nh) * math.log1p(-fill)

    def union_size(self, other: "BloomFilter") -> float:
        self._check_mergeable(other)
        pc = _popcount(self.words | other.words)
        return self._card_from_popcount(pc, self.m, self.nh)

    def intersection_size(self, other: "BloomFilter") -> float:
        """Inclusion-exclusion on fill-ratio cardinalities (bf.h:232-361)."""
        return max(
            0.0,
            self.cardinality_estimate()
            + other.cardinality_estimate()
            - self.union_size(other),
        )

    def jaccard_index(self, other: "BloomFilter") -> float:
        u = self.union_size(other)
        if u <= 0.0:
            return 0.0
        return max(0.0, min(1.0, self.intersection_size(other) / u))

    # -- state -------------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"l2sz": self.l2sz, "nh": self.nh, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"words": self.words}

    @classmethod
    def _from_state(cls, params, arrays) -> "BloomFilter":
        obj = cls(**params)
        obj.words = arrays["words"].astype(np.uint64)
        return obj

    def __repr__(self) -> str:  # pragma: no cover
        return f"BloomFilter(l2sz={self.l2sz}, nh={self.nh}, fill={self.popcount()/self.m:.4f})"
