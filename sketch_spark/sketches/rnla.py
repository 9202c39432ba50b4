"""RNLA CountSketch vector compression (reference rnla.h:35-243).

The reference's randomized-numerical-linear-algebra utilities center on
the CountSketch linear transform: ``cs_compress`` (rnla.h:35-54) folds a
d-dimensional vector into ns independent rows of newdim signed-sum
buckets using a 4-wise-independent polynomial hasher set
(KWiseHasherSet<4>, the same family as our cs4w), with
``bucket = (h >> 1) mod newdim`` and ``sign = h & 1`` (rnla.h:47-49);
``cs_decompress`` (rnla.h:176-196) recovers any coordinate as the median
over rows of sign·bucket-value; ``top_indices_from_compressed``
(rnla.h:209-243) enumerates candidate coordinates and returns the top-k
recovered values. The transform is LINEAR, so compressed partials ADD —
which is exactly what makes it distributable: each partition compresses
its local (index, weight) contributions and the merge is elementwise sum,
giving a global compressed view of a vector no single machine ever
materializes (the 100 TB shape for heavy-coordinate recovery).

Here that trio is a registered sketch kind (``csvec``) so the whole Spark
path — mapInArrow partials, tree merges, weighted builds, checkpointing —
applies unchanged. Layout divergence (documented): the reference
interleaves rows as ``ret[bucket*ns + j]`` for SIMD locality
(rnla.h:48); we store the equivalent row-major (ns, newdim) matrix.

``WZVector`` (kind ``wzcs``) is the ``wz_compress`` / ``wz_decompress``
exponential-sampling variant (rnla.h:88-174, Transform::WoodruffZhang,
rnla.h:16): instead of a ±1 sign, each (coordinate, row) pair gets a
DETERMINISTIC multiplier ``sign(quot & 1) · Exp_p(seed = quot >> 1)``
where ``quot = h // newdim`` is the hash quotient (rnla.h:100-105), and
decompression divides the same multiplier back out and takes the median
over rows (rnla.h:160-166). The transform stays LINEAR, so partials
still ADD. Divergence (documented, same class as phll/pmh/icws): the
reference draws the exponential from blaze::RNG seeded per element —
platform-defined mt19937 output with no cross-language bit contract —
so we derive it by inverse CDF from a wanghash-seeded uniform,
``-log(u)/p`` with ``u = (wanghash(quot >> 1) + 0.5) / 2^64``: same
distribution, same determinism guarantee, vectorizable.

``TensorSketch`` (kind ``tensorsketch``) is the FFT tensor sketch the
reference lists in its own TODO and never implements (rnla.h:26-31:
"FFT and IFFT for tensor sketch" / "Tensor sketch: see fast polynomial
kernels"). We ship the published algorithm (Pham & Pagh, KDD'13; Pagh,
TOCT'13): the degree-q sketch of ``x ⊗ x ⊗ … ⊗ x`` is the circular
convolution of q independent CountSketches of x, computed in
O(q·d_out·log d_out) via rfft/irfft. The transform is LINEAR in the
outer-product tensor, so accumulated sketches of row sets merge by
elementwise addition — ``ts(Σᵢ xᵢ^⊗q)`` is a mergeable monoid, and
``a.dot(b)`` estimates the Frobenius inner product of the two
accumulated moment tensors, ``Σᵢⱼ ⟨xᵢ, yⱼ⟩^q`` (the polynomial-kernel
Gram energy no single machine ever materializes).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sketch_spark.hashing import CHUNK, _u64, kwise_coefficients, poly_hash_mersenne, wanghash
from sketch_spark.sketches.base import Sketch, register

_U64 = np.uint64


@register
class CSVector(Sketch):
    kind = "csvec"

    def __init__(self, d_out: int = 4096, ns: int = 4, seed: int = 137):
        if not 2 <= d_out <= (1 << 26):
            raise ValueError("d_out must be in [2, 2^26]")
        if not 1 <= ns <= 16:
            raise ValueError("ns must be in [1, 16]")
        self.d_out = int(d_out)
        self.ns = int(ns)
        self.seed = int(seed)
        # one degree-3 polynomial per row — 4-wise independence, matching
        # the reference's KWiseHasherSet<4> default
        self._coeffs = kwise_coefficients(4, self.ns, self.seed)
        self.table = np.zeros((self.ns, self.d_out), dtype=np.float64)

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {"d_out": self.d_out, "ns": self.ns, "seed": self.seed}

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"table": self.table}

    @classmethod
    def _from_state(cls, params, arrays) -> "CSVector":
        obj = cls(**params)
        obj.table = arrays["table"].astype(np.float64).reshape(obj.ns, obj.d_out)
        return obj

    # ---- hashing ----------------------------------------------------------
    def _bucket_sign(self, idx: np.ndarray, row: int) -> tuple[np.ndarray, np.ndarray]:
        h = poly_hash_mersenne(idx, self._coeffs[row])
        bucket = ((h >> _U64(1)) % _U64(self.d_out)).astype(np.int64)
        sign = 1.0 - 2.0 * (h & _U64(1)).astype(np.float64)
        return bucket, sign

    # ---- monoid ops --------------------------------------------------------
    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "CSVector":
        """Absorb (coordinate-index, weight) contributions; weights default
        to 1 per occurrence (cs_compress rnla.h:44-50 with v = in[i])."""
        v = _u64(np.asarray(values))
        if len(v) == 0:
            return self
        w = (
            np.ones(len(v), dtype=np.float64)
            if counts is None
            else np.asarray(counts, dtype=np.float64)
        )
        for j in range(self.ns):
            for i in range(0, len(v), CHUNK):
                bucket, sign = self._bucket_sign(v[i : i + CHUNK], j)
                self.table[j] += np.bincount(
                    bucket, weights=sign * w[i : i + len(bucket)], minlength=self.d_out
                )
        return self

    def merge(self, other: "CSVector") -> "CSVector":
        """Linearity: compressed partials add (the distributed story).

        Guarantee-level, not byte-identical across partitionings: bucket
        values are float64 sums, and summation ORDER differs between a
        single pass and a partition merge, so tables agree to ULP
        (~1e-15 relative), not bit-for-bit — same class as t-digest.
        Integer-weight streams that stay below 2^53 per bucket ARE exact."""
        self._check_mergeable(other)
        self.table += other.table
        return self

    # ---- queries -----------------------------------------------------------
    def decompress(self, indices: np.ndarray) -> np.ndarray:
        """Recover requested coordinates: median over rows of
        sign·bucket-value (cs_decompress, rnla.h:176-196)."""
        idx = _u64(np.asarray(indices))
        est = np.empty((self.ns, len(idx)), dtype=np.float64)
        for j in range(self.ns):
            bucket, mult = self._bucket_sign(idx, j)
            # dividing by the multiplier inverts compression exactly: for
            # the ±1 CountSketch sign, x/±1 == ±1·x bit-for-bit in IEEE,
            # and for wz it is the rnla.h:163 ``in[...] / gen(rng) · sign``
            est[j] = self.table[j, bucket] / mult
        return np.median(est, axis=0)

    def top_indices(self, olddim: int, k: int, absolute: bool = False) -> tuple[np.ndarray, np.ndarray]:
        """Top-k recovered coordinates over the dense domain [0, olddim)
        (top_indices_from_compressed, rnla.h:209-243; ``absolute`` is the
        AbsMax functor variant rnla.h:204-207). Chunked enumeration keeps
        the working set bounded at any olddim."""
        best_vals = np.empty(0, dtype=np.float64)
        best_idx = np.empty(0, dtype=np.int64)
        for lo in range(0, olddim, 1 << 20):
            hi = min(lo + (1 << 20), olddim)
            cand = np.arange(lo, hi, dtype=np.int64)
            est = self.decompress(cand)
            key = np.abs(est) if absolute else est
            take = min(k, len(cand))
            sel = np.argpartition(key, -take)[-take:]
            best_vals = np.concatenate([best_vals, est[sel]])
            best_idx = np.concatenate([best_idx, cand[sel]])
            if len(best_vals) > k:
                bkey = np.abs(best_vals) if absolute else best_vals
                keep = np.argpartition(bkey, -k)[-k:]
                best_vals, best_idx = best_vals[keep], best_idx[keep]
        order = np.argsort(-(np.abs(best_vals) if absolute else best_vals), kind="stable")
        return best_vals[order], best_idx[order]

    def dot(self, other: "CSVector") -> float:
        """Inner-product estimate of the two compressed vectors: each row's
        <row_j, row_j> is unbiased for <x, y> under shared hashes; the
        median over rows tames heavy-tailed collision noise."""
        self._check_mergeable(other)
        return float(np.median((self.table * other.table).sum(axis=1)))

    def l2(self) -> float:
        """||x||₂ estimate: median over rows of the row norm."""
        return float(np.sqrt(np.median((self.table**2).sum(axis=1))))


@register
class WZVector(CSVector):
    """Woodruff–Zhang exponential-sampling CountSketch (wz_compress /
    wz_decompress, rnla.h:88-174; Transform::WoodruffZhang, rnla.h:16).

    Identical bucket layout and linear merge as ``csvec``; the per-
    (coordinate, row) multiplier is ``sign · Exp_p(seed)`` instead of
    ±1, with bucket/sign/seed all derived from one hash exactly as the
    reference does: ``bucket = h mod d_out``, ``quot = h // d_out``,
    ``sign = quot & 1``, ``seed = quot >> 1`` (rnla.h:100-105). The
    exponential amplitude implements the WZ importance-sampling scheme
    for sublinear lp-moment estimation: large multipliers make rare
    coordinates visible in some rows while the median over rows keeps
    single-coordinate recovery robust.

    ``dot``/``l2`` are deliberately unsupported: under Exp multipliers
    E[mult²] = 2/p² ≠ 1, so the CountSketch inner-product identity does
    not transfer (the reference offers no wz dot either)."""

    kind = "wzcs"

    def __init__(self, d_out: int = 4096, ns: int = 4, seed: int = 137, p: float = 1.0):
        if not 0.0 < p <= 1e6:
            raise ValueError("p (exponential rate) must be in (0, 1e6]")
        super().__init__(d_out=d_out, ns=ns, seed=seed)
        self.p = float(p)

    def _params(self) -> dict[str, Any]:
        return {**super()._params(), "p": self.p}

    def _bucket_sign(self, idx: np.ndarray, row: int) -> tuple[np.ndarray, np.ndarray]:
        h = poly_hash_mersenne(idx, self._coeffs[row])
        d = _U64(self.d_out)
        bucket = (h % d).astype(np.int64)
        quot = h // d
        sign = 1.0 - 2.0 * (quot & _U64(1)).astype(np.float64)
        # deterministic Exp(p) draw by inverse CDF from a wanghash-seeded
        # uniform in (0,1) — the blaze::RNG(quot >> 1) restatement
        u = (wanghash(quot >> _U64(1)).astype(np.float64) + 0.5) * 2.0**-64
        return bucket, sign * (-np.log(u) / self.p)

    def dot(self, other: "CSVector") -> float:
        raise ValueError("dot is not defined for wzcs (E[mult^2] != 1); use csvec")

    def l2(self) -> float:
        raise ValueError("l2 is not defined for wzcs (E[mult^2] != 1); use csvec")


@register
class TensorSketch(Sketch):
    """FFT tensor sketch (Pham & Pagh, KDD'13) — the reference's own TODO
    (rnla.h:26-31), shipped working here.

    For input vectors of fixed dimension ``d``, each of ``ns`` independent
    repetitions holds ``degree`` CountSketches (bucket/sign from one 4-wise
    polynomial hash each, the rnla.h:47-49 derivation); the degree-q sketch
    of one vector is ``irfft(∏ₜ rfft(CSₜ(x)))`` — circular convolution of
    the q CountSketches, which equals CountSketch of the order-q outer
    product x^⊗q under the combined hash. ``update`` accumulates the
    (optionally weighted) SUM of per-row sketches, so the state represents
    ``ts(Σᵢ wᵢ·xᵢ^⊗q)``; linearity makes ``merge`` elementwise addition
    and any partitioning exact up to float summation order (same class as
    csvec). ``dot`` takes the median over repetitions of the rowwise inner
    product — an unbiased estimate of ``Σᵢⱼ wᵢwⱼ'⟨xᵢ, xⱼ'⟩^q`` per row,
    with per-row variance ≲ (2+3^q)/d_out · (Σᵢⱼ ⟨xᵢ,xⱼ'⟩^q + ΠΣ‖·‖^q
    cross-terms) (Pham & Pagh Lemma 7's two-vector bound, summed
    bilinearly)."""

    kind = "tensorsketch"
    consumes_vectors = True  # update() takes (n, d) matrices, not flat values

    def __init__(self, d: int = 64, d_out: int = 4096, degree: int = 2, ns: int = 4, seed: int = 101):
        if not 1 <= d <= (1 << 20):
            raise ValueError("d (input dimension) must be in [1, 2^20]")
        if not 2 <= d_out <= (1 << 22):
            raise ValueError("d_out must be in [2, 2^22]")
        if not 1 <= degree <= 8:
            raise ValueError("degree must be in [1, 8]")
        if not 1 <= ns <= 16:
            raise ValueError("ns must be in [1, 16]")
        self.d = int(d)
        self.d_out = int(d_out)
        self.degree = int(degree)
        self.ns = int(ns)
        self.seed = int(seed)
        # the projection tensor is built LAZILY on first update(): it is a
        # pure function of the params (never serialized), and merge/dot/
        # from_bytes never touch it — phase-2 state merges and per-key
        # accumulator dicts would otherwise pay ns·degree·d·d_out·8 bytes
        # (~25 MB at the gate params) per instance for nothing
        self._proj_cache: np.ndarray | None = None
        self.table = np.zeros((self.ns, self.d_out), dtype=np.float64)

    @property
    def _proj(self) -> np.ndarray:
        if self._proj_cache is None:
            # one 4-wise polynomial per (repetition, factor) — factors must
            # be mutually independent for the convolution identity to hold.
            # Dense P[j,t] : (d, d_out) with P[i, bucket(i)] = sign(i);
            # CSₜ(X) is then one BLAS matmul X @ P (rnla.h:47-49 derivation).
            coeffs = kwise_coefficients(4, self.ns * self.degree, self.seed)
            idx = np.arange(self.d, dtype=np.uint64)
            proj = np.zeros((self.ns, self.degree, self.d, self.d_out), dtype=np.float64)
            for j in range(self.ns):
                for t in range(self.degree):
                    h = poly_hash_mersenne(idx, coeffs[j * self.degree + t])
                    bucket = ((h >> _U64(1)) % _U64(self.d_out)).astype(np.int64)
                    sign = 1.0 - 2.0 * (h & _U64(1)).astype(np.float64)
                    proj[j, t, np.arange(self.d), bucket] = sign
            self._proj_cache = proj
        return self._proj_cache

    # ---- state ------------------------------------------------------------
    def _params(self) -> dict[str, Any]:
        return {
            "d": self.d,
            "d_out": self.d_out,
            "degree": self.degree,
            "ns": self.ns,
            "seed": self.seed,
        }

    def _arrays(self) -> dict[str, np.ndarray]:
        return {"table": self.table}

    @classmethod
    def _from_state(cls, params, arrays) -> "TensorSketch":
        obj = cls(**params)
        obj.table = arrays["table"].astype(np.float64).reshape(obj.ns, obj.d_out)
        return obj

    # ---- monoid ops --------------------------------------------------------
    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> "TensorSketch":
        """Absorb a batch of vectors: ``values`` is (n, d) — or (d,) for a
        single vector — and ``counts`` optional per-vector weights. Adds
        ``Σᵢ wᵢ · ts(xᵢ^⊗q)`` to the accumulator."""
        X = np.asarray(values, dtype=np.float64)
        if X.ndim == 1:
            X = X[None, :]
        if X.ndim != 2 or X.shape[1] != self.d:
            raise ValueError(f"expected (n, {self.d}) vectors, got shape {X.shape}")
        if len(X) == 0:
            return self
        w = None if counts is None else np.asarray(counts, dtype=np.float64)
        for j in range(self.ns):
            # ∏ₜ rfft(X @ Pₜ) then irfft = per-row circular convolution
            prod = np.fft.rfft(X @ self._proj[j, 0], axis=1)
            for t in range(1, self.degree):
                prod *= np.fft.rfft(X @ self._proj[j, t], axis=1)
            rows = np.fft.irfft(prod, n=self.d_out, axis=1)
            self.table[j] += rows.sum(axis=0) if w is None else w @ rows
        return self

    def merge(self, other: "TensorSketch") -> "TensorSketch":
        """Linearity: accumulated tensor-moment sketches add. Guarantee
        level matches csvec: float64 summation order differs across
        partitionings, so tables agree to ULP, not bit-for-bit."""
        self._check_mergeable(other)
        self.table += other.table
        return self

    # ---- queries -----------------------------------------------------------
    def dot(self, other: "TensorSketch") -> float:
        """Median over repetitions of ⟨rowⱼ(self), rowⱼ(other)⟩ — the
        polynomial-kernel Gram energy ``Σᵢⱼ wᵢwⱼ'⟨xᵢ, yⱼ⟩^q`` between the
        two accumulated vector sets."""
        self._check_mergeable(other)
        return float(np.median((self.table * other.table).sum(axis=1)))

    def frobenius_energy(self) -> float:
        """Self inner product: ``Σᵢⱼ wᵢwⱼ⟨xᵢ, xⱼ⟩^q`` — for q=2 this is
        ‖Σᵢ wᵢ xᵢxᵢᵀ‖²_F, the second-moment Frobenius energy."""
        return float(np.median((self.table**2).sum(axis=1)))
