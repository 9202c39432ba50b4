"""Hash kernels: bit-exactness vs scalar oracles (SURVEY.md §5 test class 1;
reference analog: the hash is the reproducibility contract, hash.h:34-55)."""

import numpy as np

from sketch_spark.hashing import (
    clz64,
    hash_strings,
    hash_tokens,
    murfinhash,
    seeded_hashes,
    splitmix64,
    wanghash,
    wanghash_scalar,
    xxh3_u64,
)

RNG = np.random.default_rng(42)


def test_wanghash_matches_scalar_oracle():
    batch = np.concatenate(
        [
            np.array([0, 1, 2, 137, 1337, 2**31, 2**63, 2**64 - 1], dtype=np.uint64),
            RNG.integers(0, 2**64, 1000, dtype=np.uint64),
        ]
    )
    got = wanghash(batch)
    want = np.array([wanghash_scalar(int(x)) for x in batch], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_wanghash_is_injective_on_sample():
    batch = RNG.integers(0, 2**64, 100_000, dtype=np.uint64)
    assert len(np.unique(wanghash(np.unique(batch)))) == len(np.unique(batch))


def test_murfinhash_known_property():
    # murmur finalizer is bijective: distinct in -> distinct out
    batch = np.arange(10_000, dtype=np.uint64)
    assert len(np.unique(murfinhash(batch))) == len(batch)


def test_clz64_exact_for_all_magnitudes():
    vals = [0, 1, 2, 3, 2**31, 2**32 - 1, 2**63, 2**64 - 1] + [
        int(x) for x in RNG.integers(0, 2**64, 500, dtype=np.uint64)
    ]
    batch = np.array(vals, dtype=np.uint64)
    got = clz64(batch)
    want = np.array([64 if v == 0 else 64 - int(v).bit_length() for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_clz64_exact_at_every_float_roundup_boundary():
    """The float-exponent fast path must stay exact where uint64→float64
    rounds UP to the next power of two (exponent overshoot): every 2^k
    neighborhood, the 53-bit mantissa edges, and 20k random values checked
    against the pure-Python bit_length oracle."""
    vals = []
    for k in range(64):
        for d in (-2, -1, 0, 1, 2):
            v = (1 << k) + d
            if 0 <= v < 2**64:
                vals.append(v)
    for k in (53, 54, 62, 63):
        vals += [(1 << k) - 1, (1 << k) | ((1 << 11) - 1), 2**64 - 1, 2**64 - 2**10]
    vals += [int(x) for x in RNG.integers(0, 2**64, 20_000, dtype=np.uint64)]
    batch = np.array(vals, dtype=np.uint64)
    want = np.array([64 if v == 0 else 64 - int(v).bit_length() for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(clz64(batch), want)


def test_splitmix64_deterministic_and_distinct():
    a = splitmix64(1234, 64)
    b = splitmix64(1234, 64)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 64
    assert not np.array_equal(a, splitmix64(1235, 64))


def test_seeded_hashes_family_shape_and_independence():
    seeds = splitmix64(7, 4)
    x = RNG.integers(0, 2**63, 1000, dtype=np.int64)
    h = seeded_hashes(x, seeds)
    assert h.shape == (4, 1000)
    # different seeds must give (essentially always) different hashes
    assert (h[0] != h[1]).mean() > 0.999


def test_hash_tokens_seed_changes_output():
    x = np.arange(1000, dtype=np.int64)
    assert not np.array_equal(hash_tokens(x, 0), hash_tokens(x, 99))
    np.testing.assert_array_equal(hash_tokens(x, 0), wanghash(x.astype(np.uint64)))


def test_hash_strings_deterministic_and_collision_free_on_sample():
    words = np.array([f"tok{i}" for i in range(20_000)] + ["", "a", "ab", "ba"])
    h1 = hash_strings(words)
    h2 = hash_strings(words)
    np.testing.assert_array_equal(h1, h2)
    assert len(np.unique(h1)) == len(words)  # no collisions on this sample


def test_hash_strings_order_is_elementwise():
    a = hash_strings(np.array(["x", "y"]))
    b = hash_strings(np.array(["y", "x"]))
    assert a[0] == b[1] and a[1] == b[0]


# ---- XXH3 8-byte short-key kernel (XXH3PairHasher contract) -----------------

# golden vectors generated with the system libxxhash 0.8.1:
# XXH3_64bits_withSeed(&x, 8, seed) over one little-endian u64
_XXH3_GOLDEN = [
    (0x0000000000000000, 0x0000000000000000, 0xC77B3ABB6F87ACD9),
    (0x0000000000000001, 0x0000000000000000, 0x2FBC593564DB792E),
    (0x0000000000000000, 0x0000000000000001, 0x9E51AD6D2F3E695C),
    (0x00000000DEADBEEF, 0x0000000000000003, 0x9C6C19B00F8E5D99),
    (0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF, 0xDA8F77A4D5C399EA),
    (0x000000000000002A, 0x00000000000003E8, 0x43F720EDA39434B2),
    (0x0123456789ABCDEF, 0x0000000000ABCDEF, 0xB996D987E25760AE),
]


def test_xxh3_u64_golden_vectors():
    """Bit-exact vs libxxhash golden vectors (the reference's
    XXH3PairHasher, hash.h:812-820)."""
    xs = np.array([g[0] for g in _XXH3_GOLDEN], dtype=np.uint64)
    ss = np.array([g[1] for g in _XXH3_GOLDEN], dtype=np.uint64)
    exp = np.array([g[2] for g in _XXH3_GOLDEN], dtype=np.uint64)
    np.testing.assert_array_equal(xxh3_u64(xs, ss), exp)


def test_xxh3_u64_fuzz_vs_system_lib():
    """10k random (x, seed) pairs vs the real libxxhash via ctypes —
    skipped where the shared library is absent (golden vectors above
    still pin the kernel)."""
    import ctypes
    import ctypes.util
    import struct

    import pytest

    name = ctypes.util.find_library("xxhash") or "libxxhash.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        pytest.skip("libxxhash not available")
    lib.XXH3_64bits_withSeed.restype = ctypes.c_uint64
    lib.XXH3_64bits_withSeed.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
    rng = np.random.default_rng(17)
    x = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    s = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    ref = np.array(
        [lib.XXH3_64bits_withSeed(struct.pack("<Q", int(a)), 8, int(b)) for a, b in zip(x, s)],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(xxh3_u64(x, s), ref)
    # scalar-seed broadcast path
    ref7 = np.array(
        [lib.XXH3_64bits_withSeed(struct.pack("<Q", int(a)), 8, 7) for a in x[:500]],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(xxh3_u64(x[:500], 7), ref7)


def test_double_hashes_is_affine_in_two_base_mixes():
    """Kirsch–Mitzenmacher contract: row r == h1 + r*h2 (uint64 wrap),
    row 0 IS wanghash(x ^ s0) — so marginal per-row quality is exactly the
    base mix's."""
    from sketch_spark.hashing import double_hashes

    batch = RNG.integers(0, 2**64, 50_000, dtype=np.uint64)
    s0, s1 = 0x1234ABCD, 0x9E3779B97F4A7C15
    hs = double_hashes(batch, s0, s1, 5)
    assert hs.shape == (5, len(batch))
    h1 = wanghash(batch ^ np.uint64(s0))
    h2 = murfinhash(batch ^ np.uint64(s1))
    np.testing.assert_array_equal(hs[0], h1)
    with np.errstate(over="ignore"):
        for r in range(1, 5):
            np.testing.assert_array_equal(hs[r], h1 + np.uint64(r) * h2)


def test_double_hashes_rows_pairwise_uniform():
    """Each row individually behaves like a uniform 64-bit hash: bucket
    occupancy over 2^12 buckets within chi-square-ish tolerance."""
    from sketch_spark.hashing import double_hashes

    batch = np.arange(200_000, dtype=np.uint64)  # adversarially sequential
    hs = double_hashes(batch, 7, 11, 4)
    nb = 1 << 12
    for r in range(4):
        counts = np.bincount((hs[r] & np.uint64(nb - 1)).astype(np.int64), minlength=nb)
        mean = len(batch) / nb  # ~48.8
        # Poisson sd ~ 7; allow 6 sigma on max deviation across 4096 bins
        assert counts.min() > mean - 6 * np.sqrt(mean)
        assert counts.max() < mean + 6 * np.sqrt(mean)
