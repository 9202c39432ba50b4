"""Vectorized 64-bit hashing kernels (NumPy, elementwise over uint64 batches).

The reference library funnels every input item through a 64-bit integer hash
before it touches any sketch ("the actual point of entry ... is a 64-bit
integer hash function", /root/reference/include/sketch/hll.h:679-680). Its
default is Thomas Wang's 64-bit mix (public algorithm, see
https://naml.us/blog/tag/thomas-wang; reference:
/root/reference/include/sketch/hash.h:34-55), which is a bijection on
[0, 2^64). We reimplement it as ~10 elementwise NumPy ops per batch — the
same work the reference does with AVX2 intrinsics (hash.h:67-88), minus the
hand-written SIMD: NumPy vectorizes it for us.

Seeded hash families come in two strengths, chosen per sketch by what its
estimator actually needs:

- `seeded_hashes` — nh full mixes (key xor per-row splitmix64 seed, then
  wanghash). Used where cross-row independence carries the analysis:
  CountSketch's median estimator, minhash permutations. Seeds are part of
  sketch identity and are serialized with the state (reference analog:
  mt19937_64-drawn seed vectors, bf.h:94-111, ccm.h:221-222).
- `double_hashes` — Kirsch–Mitzenmacher h1 + r·h2 (2 mixes total). Used for
  Bloom and Count-Min row families, whose guarantees need only within-row
  pairwise independence; KM 2008 proves the Bloom FPR asymptotically
  unchanged. 2-2.8× faster at nh ∈ {3,4} — the flagship hashing budget.
- `kwise_coefficients` + `poly_hash_mersenne` — provably k-wise polynomial
  hashes over GF(2^61−1) for cs4w, where the variance proof demands it.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

# Kernel chunk size: updates process values in chunks of this many elements
# so hash temporaries (~10 per wanghash call) stay L2/L3-resident. Measured
# on the 32-core sandbox: chunked hashing is ~1.7x faster single-task and
# scales at 0.93 efficiency 2→8 workers vs 0.79 unchunked (DRAM-bandwidth
# relief — the same reason the reference processes fixed-size file chunks,
# mpiParallelIO.cpp:113-175).
CHUNK = 1 << 16

# numpy intentionally warns on uint64 overflow-by-design ops; silence locally.
_ERRSTATE = {"over": "ignore"}


def _u64(x) -> np.ndarray:
    """View/cast any integer array as uint64 without copying when possible."""
    a = np.asarray(x)
    if a.dtype == np.uint64:
        return a
    if a.dtype.kind in "iu" and a.dtype.itemsize == 8:
        return a.view(np.uint64)
    return a.astype(np.uint64)


def wanghash(x) -> np.ndarray:
    """Thomas Wang 64-bit mix, vectorized. Bijective on uint64.

    Bit-exact with the reference's default hash (hash.h:36-45): verified by
    tests/test_hashing.py against a scalar Python oracle and hardcoded
    vectors.
    """
    with np.errstate(**_ERRSTATE):
        key = _u64(x).copy()
        key = (~key) + (key << _U64(21))
        key ^= key >> _U64(24)
        key = (key + (key << _U64(3))) + (key << _U64(8))  # key * 265
        key ^= key >> _U64(14)
        key = (key + (key << _U64(2))) + (key << _U64(4))  # key * 21
        key ^= key >> _U64(28)
        key = key + (key << _U64(31))
    return key


def wanghash_scalar(key: int) -> int:
    """Scalar oracle for tests (pure-Python port of the published algorithm)."""
    M = (1 << 64) - 1
    key &= M
    key = ((~key) + (key << 21)) & M
    key ^= key >> 24
    key = ((key + (key << 3)) + (key << 8)) & M
    key ^= key >> 14
    key = ((key + (key << 2)) + (key << 4)) & M
    key ^= key >> 28
    key = (key + (key << 31)) & M
    return key


def murfinhash(x) -> np.ndarray:
    """MurmurHash3 64-bit finalizer (public; reference hash.h:428-460)."""
    with np.errstate(**_ERRSTATE):
        k = _u64(x).copy()
        k ^= k >> _U64(33)
        k *= _U64(0xFF51AFD7ED558CCD)
        k ^= k >> _U64(33)
        k *= _U64(0xC4CEB9FE1A85EC53)
        k ^= k >> _U64(33)
    return k


def splitmix64(seed: int, n: int) -> np.ndarray:
    """Deterministic seed stream (public splitmix64 constants).

    Used to derive per-row / per-hash-function seeds so that a sketch's whole
    hash family is identified by one integer ``seed`` carried in its header.
    """
    with np.errstate(**_ERRSTATE):
        z = (_U64(seed) + _U64(0x9E3779B97F4A7C15) * np.arange(1, n + 1, dtype=np.uint64))
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z ^= z >> _U64(31)
    return z


def seeded_hashes(x, seeds: np.ndarray) -> np.ndarray:
    """Family of hashes: shape (len(seeds), len(x)) uint64.

    h_i(x) = wanghash(x ^ seed_i). Each member is a bijection composed with a
    fixed xor mask, so members are pairwise-independent enough for
    Bloom/CMS-style index derivation (reference seeds subhashes similarly,
    bf.h:364-381).
    """
    xs = _u64(x)
    with np.errstate(**_ERRSTATE):
        out = np.empty((len(seeds), xs.shape[0]), dtype=np.uint64)
        for i, s in enumerate(seeds):
            out[i] = wanghash(xs ^ _U64(s))
    return out


def double_hashes(x, s0: int, s1: int, nh: int) -> np.ndarray:
    """Kirsch–Mitzenmacher family: h_r(x) = h1(x) + r·h2(x) (uint64
    wraparound), h1 = wanghash(x ^ s0), h2 = murfinhash(x ^ s1).

    Two full mixes yield an nh-member index family ("Less Hashing, Same
    Performance", Kirsch & Mitzenmacher, RSA 2008): row 0 IS h1, so
    marginal uniformity and per-row pairwise collision probability are
    exactly those of the underlying mix, and the Bloom-filter FPR is
    asymptotically unchanged (the paper's theorem). Cross-row joint events
    are mildly positively correlated (rows are affine in two base hashes);
    the empirical FPR / CMS-overshoot regression tests gate that this never
    shows at the configured table sizes. Cost: 2 mixes + (nh−1) vector adds
    per batch vs nh full mixes — this is the flagship Bloom/CMS hashing
    budget at 10^12 tokens, measured 2.0-2.8× faster at nh ∈ {3,4}.
    """
    xs = _u64(x)
    with np.errstate(**_ERRSTATE):
        h1 = wanghash(xs ^ _U64(s0))
        out = np.empty((nh, xs.shape[0]), dtype=np.uint64)
        out[0] = h1
        if nh > 1:
            h2 = murfinhash(xs ^ _U64(s1))
            acc = h1
            for r in range(1, nh):
                acc = acc + h2
                out[r] = acc
    return out


_MERS61 = _U64((1 << 61) - 1)


def _mod61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values mod the Mersenne prime 2^61-1 (branch-free)."""
    with np.errstate(**_ERRSTATE):
        x = (x >> _U64(61)) + (x & _MERS61)
        return np.where(x >= _MERS61, x - _MERS61, x)


def mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod 2^61-1 for a,b < 2^61-1, vectorized without 128-bit ints.

    Split a = a1·2^31 + a0, b = b1·2^31 + b0; using 2^61 ≡ 1 (mod p):
    a·b ≡ 2·a1·b1 + fold(mid·2^31) + a0·b0 where mid = a1·b0 + a0·b1.
    Every intermediate fits in uint64. Same trick as the reference's
    CWtrick64 (hash.h siam namespace), NumPy-vectorized.
    """
    with np.errstate(**_ERRSTATE):
        a1, a0 = a >> _U64(31), a & _U64((1 << 31) - 1)
        b1, b0 = b >> _U64(31), b & _U64((1 << 31) - 1)
        hi = _mod61(a1 * b1 << _U64(1))  # a1·b1·2^62 ≡ 2·a1·b1
        mid = a1 * b0 + a0 * b1  # < 2^62, fits
        m1, m0 = mid >> _U64(30), mid & _U64((1 << 30) - 1)
        # mid·2^31 = m1·2^61 + m0·2^31 ≡ m1 + m0·2^31
        midr = _mod61(m1 + (m0 << _U64(31)))
        lo = _mod61(a0 * b0)
        return _mod61(hi + midr + lo)


def poly_hash_mersenne(x, coeffs: np.ndarray) -> np.ndarray:
    """k-wise-independent polynomial hash over GF(2^61-1):
    h(x) = c_{k-1}·x^{k-1} + … + c_1·x + c_0 (mod 2^61-1), Horner form.

    With k random coefficients this family is k-wise independent — the
    construction behind the reference's `KWiseIndependentPolynomialHash`
    (hash.h:304-351) used by the 4-wise count sketch (`cs4wbase_t`,
    ccm.h:558-741).
    """
    xs = _mod61(_u64(x))
    h = np.full(xs.shape, _U64(int(coeffs[-1])), dtype=np.uint64)
    with np.errstate(**_ERRSTATE):
        for c in coeffs[-2::-1]:
            h = _mod61(mulmod61(h, xs) + _U64(int(c)))
    return h


def kwise_coefficients(k: int, nh: int, seed: int) -> np.ndarray:
    """(nh, k) coefficient matrix, each row an independent degree-(k-1)
    polynomial; drawn deterministically from splitmix64(seed) mod 2^61-1."""
    raw = splitmix64(seed, nh * k).reshape(nh, k)
    return _mod61(raw)


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of each uint64, vectorized (clz(0) = 64).

    Float-exponent extraction WITH round-up correction — the raw trick is
    inexact when the uint64→float64 conversion rounds a 53+-bit value up to
    the next power of two (then the exponent overshoots by one), so after
    reading e = biased_exponent − 1023 we decrement wherever ``x >> e == 0``
    (or e == 64, the 2^64 round-up). One conversion + a handful of vector
    ops, measured ~5× the 6-round branch-free binary search it replaces —
    this is the hot kernel of every HLL-family update (rank = clz of the
    low hash bits), i.e. the flagship path at 10^12 tokens. Exactness is
    regression-tested against the binary-search oracle on random values and
    every power-of-two neighborhood (tests/test_hashing.py).
    """
    x = _u64(x)
    f = x.astype(np.float64)
    e = ((f.view(np.uint64) >> _U64(52)) & _U64(0x7FF)).astype(np.int64) - 1023
    shift = np.clip(e, 0, 63).astype(np.uint64)
    e -= (e >= 64) | ((x >> shift) == 0)
    return np.where(x == 0, 64, 63 - e).astype(np.uint8)


def hash_tokens(values, seed: int = 0) -> np.ndarray:
    """Hash a batch of item ids (any int dtype) to uint64 sketch inputs.

    seed=0 is the identity-xor default (pure WangHash) to match the
    reference's unseeded `addh` path (hll.h:816-819).
    """
    v = _u64(values)
    if seed:
        with np.errstate(**_ERRSTATE):
            v = v ^ _U64(seed)
    return wanghash(v)


# ---- XXH3 (64-bit, fixed 8-byte input) --------------------------------------
# Constants from the PUBLIC xxHash library (BSD-2, Yann Collet), len-4-to-8
# short-key path: bitflip halves are the default-secret words at offsets 8
# and 16 (little-endian), PRIME_MX2 is the rrmxmx multiplier. Verified
# bit-exact against the system libxxhash 0.8.1 (tests/test_hashing.py).
_XXH3_SECRET_W8 = _U64(0x1CAD21F72C81017C)  # LE64(kSecret + 8)
_XXH3_SECRET_W16 = _U64(0xDB979083E96DD4DE)  # LE64(kSecret + 16)
_XXH3_PRIME_MX2 = _U64(0x9FB21C651E98DF25)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def xxh3_u64(x, seed=0) -> np.ndarray:
    """XXH3_64bits_withSeed over one little-endian uint64 — the reference's
    XXH3PairHasher contract (hash.h:812-820: ``XXH3_64bits_withSeed(&x,
    sizeof(x), count)``), vectorized. ``seed`` may be a scalar or an array
    broadcastable against ``x`` (the pair hasher seeds with the occurrence
    COUNT, so per-element seeds are the hot shape).

    Implements the public XXH3 len-4-to-8 path for len = 8: seed folding
    ``seed ^= swap32(lo32(seed)) << 32``, input halves swapped into
    ``input64``, xor with the secret-derived bitflip minus seed, then the
    rrmxmx avalanche with len = 8. Bit-exact vs libxxhash (golden vectors
    + ctypes fuzz in the test suite)."""
    xs = _u64(np.asarray(x))
    s = np.asarray(seed, dtype=np.uint64)
    with np.errstate(**_ERRSTATE):
        # seed ^= XXH_swap32((xxh_u32)seed) << 32
        lo = s & _U64(0xFFFFFFFF)
        swapped = (
            ((lo & _U64(0x000000FF)) << _U64(24))
            | ((lo & _U64(0x0000FF00)) << _U64(8))
            | ((lo & _U64(0x00FF0000)) >> _U64(8))
            | ((lo & _U64(0xFF000000)) >> _U64(24))
        )
        s = s ^ (swapped << _U64(32))
        # input1 = LE32(bytes 0-3) = lo32(x); input2 = LE32(bytes 4-7) = hi32(x)
        # input64 = input2 + (input1 << 32)  — halves swapped
        input64 = (xs >> _U64(32)) + ((xs & _U64(0xFFFFFFFF)) << _U64(32))
        keyed = input64 ^ ((_XXH3_SECRET_W8 ^ _XXH3_SECRET_W16) - s)
        # XXH3_rrmxmx(keyed, len=8)
        h = keyed ^ (_rotl64(keyed, 49) ^ _rotl64(keyed, 24))
        h = h * _XXH3_PRIME_MX2
        h = h ^ ((h >> _U64(35)) + _U64(8))
        h = h * _XXH3_PRIME_MX2
        return h ^ (h >> _U64(28))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Hash a sequence/array of strings to uint64 via a vectorized FNV-1a
    over the UTF-8 bytes, finalized with WangHash.

    Strings enter the reference through std::hash (hll.h:820-823); we use
    FNV-1a (public) for cross-platform determinism, computed columnarly on
    the padded byte matrix so there is no per-row Python in the hot path.

    Caveat: the fixed-width ``np.bytes_`` packing strips TRAILING NUL
    bytes before the length suffix is computed, so strings that differ
    only by trailing ``"\\x00"`` collide (``"a"`` vs ``"a\\x00"``).
    Interior NULs are preserved. Irrelevant for real text columns.
    """
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = np.char.encode(arr.astype(str), "utf-8")
    b = encoded.astype(np.bytes_)
    maxlen = b.dtype.itemsize
    mat = np.frombuffer(b.tobytes(), dtype=np.uint8).reshape(len(b), maxlen)
    lens = np.char.str_len(b).astype(np.int64)  # byte lengths
    h = np.full(len(b), 0xCBF29CE484222325, dtype=np.uint64)
    prime = _U64(0x100000001B3)
    with np.errstate(**_ERRSTATE):
        for j in range(maxlen):
            active = lens > j
            if not active.any():
                break
            col = mat[:, j].astype(np.uint64)
            hj = (h ^ col) * prime
            h = np.where(active, hj, h)
        h ^= lens.view(np.uint64)  # length-suffix so "a\0" != "a"
    if seed:
        with np.errstate(**_ERRSTATE):
            h = h ^ _U64(seed)
    return wanghash(h)
