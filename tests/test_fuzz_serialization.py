"""Hypothesis fuzz: for every sketch kind, random parameters × random data
must round-trip byte-identically through to_bytes/from_bytes, and the
restored sketch must keep updating identically to the original (SURVEY.md
§5 item 5 generalized across the whole registry)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketch_spark.sketches.base import _REGISTRY, from_bytes, make_sketch

PARAM_STRATEGIES = {
    "hll": st.fixed_dictionaries({"p": st.integers(4, 14)}),
    "bloom": st.fixed_dictionaries({"l2sz": st.integers(6, 18), "nh": st.integers(1, 6)}),
    "cms": st.fixed_dictionaries({"l2sz": st.integers(4, 14), "nh": st.integers(1, 6)}),
    "countsketch": st.fixed_dictionaries({"l2sz": st.integers(4, 14), "nh": st.integers(1, 7)}),
    "cs4w": st.fixed_dictionaries({"l2sz": st.integers(4, 14), "nh": st.integers(1, 7)}),
    "minhash": st.fixed_dictionaries({"k": st.integers(1, 2048)}),
    "counting_minhash": st.fixed_dictionaries({"k": st.integers(1, 2048)}),
    "kminhash": st.fixed_dictionaries({"k": st.integers(1, 512)}),
    "kll": st.fixed_dictionaries({"k": st.integers(8, 400)}),
    "tdigest": st.fixed_dictionaries({"delta": st.floats(10, 500)}),
    "topk": st.fixed_dictionaries({"m": st.integers(1, 512)}),
    "multiplicity": st.fixed_dictionaries({"r": st.integers(0, 12)}),
    "bbmh": st.fixed_dictionaries({"p": st.integers(4, 12), "b": st.integers(1, 16)}),
    "divbbmh": st.fixed_dictionaries(
        {"nbuckets": st.integers(16, 4096), "b": st.integers(1, 16)}
    ),
    "smh": st.fixed_dictionaries({"m": st.integers(16, 512)}),
    "hmh": st.fixed_dictionaries({"p": st.integers(4, 12), "r": st.integers(2, 14)}),
    "dhll": st.fixed_dictionaries({"p": st.integers(4, 14)}),
    "modsketch": st.fixed_dictionaries({"m": st.integers(1, 4096)}),
    "pccm": st.fixed_dictionaries(
        {"l2sz": st.integers(4, 14), "nh": st.integers(1, 6), "nbits": st.integers(2, 8)}
    ),
    "csvec": st.fixed_dictionaries({"d_out": st.integers(2, 4096), "ns": st.integers(1, 8)}),
    "wzcs": st.fixed_dictionaries(
        {
            "d_out": st.integers(2, 4096),
            "ns": st.integers(1, 8),
            "p": st.floats(0.1, 10.0, allow_nan=False),
        }
    ),
    "phll": st.fixed_dictionaries({"p": st.integers(4, 14)}),
    "pmh": st.fixed_dictionaries({"m": st.integers(1, 512)}),
    "icws": st.fixed_dictionaries({"m": st.integers(1, 512)}),
    "hk": st.fixed_dictionaries(
        {
            "nbuckets": st.integers(16, 4096),
            "nh": st.integers(1, 4),
            "fpbits": st.integers(8, 32),
            "ctrbits": st.integers(8, 32),
        }
    ),
    "hlf": st.fixed_dictionaries({"p": st.integers(4, 12), "l2ss": st.integers(0, 4)}),
    "vac": st.fixed_dictionaries({"p": st.integers(4, 12), "n_levels": st.integers(2, 20)}),
    "ddsketch": st.fixed_dictionaries(
        {"alpha": st.floats(0.005, 0.1), "maxbins": st.integers(8, 2048)}
    ),
    "cbf": st.fixed_dictionaries(
        {"l2sz": st.integers(10, 16), "n_levels": st.integers(2, 12), "nh": st.integers(1, 4)}
    ),
    "pcbf": st.fixed_dictionaries(
        {"l2sz": st.integers(10, 16), "n_levels": st.integers(2, 10), "nh": st.integers(1, 4), "hllp": st.integers(6, 12)}
    ),
    "realccm": st.fixed_dictionaries(
        {"l2sz": st.integers(4, 14), "nh": st.integers(1, 6), "gamma": st.floats(0.5, 1.0)}
    ),
    "tensorsketch": st.fixed_dictionaries(
        {
            "d": st.integers(1, 64),
            "d_out": st.integers(2, 1024),
            "degree": st.integers(1, 4),
            "ns": st.integers(1, 6),
        }
    ),
    "ws": st.fixed_dictionaries(
        {
            "base_kind": st.sampled_from(["minhash", "bbmh", "smh"]),
            "base_params": st.just({}),
            "l2sz": st.integers(10, 16),
            "nh": st.integers(1, 4),
            "pair_hasher": st.sampled_from(["wang", "xxh3"]),
        }
    ),
}


def test_every_registered_kind_has_a_fuzz_strategy():
    assert set(PARAM_STRATEGIES) == set(_REGISTRY)


@pytest.mark.parametrize("kind", sorted(PARAM_STRATEGIES))
@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_roundtrip_and_resume(kind, data):
    params = data.draw(PARAM_STRATEGIES[kind])
    seed = data.draw(st.integers(0, 2**31))
    n = data.draw(st.integers(0, 5000))
    rng = np.random.default_rng(seed)
    if kind == "tensorsketch":
        # vector-set sketch: (n, d) float matrices, not 1-D streams
        vals = rng.normal(size=(min(n, 64), params["d"]))
        more = rng.normal(size=(8, params["d"]))
    elif kind in ("kll", "tdigest"):
        vals = rng.lognormal(0, 2, n)
        more = rng.lognormal(1, 1, 100)
    else:
        vals = rng.integers(0, 2**40, n, dtype=np.int64)
        more = rng.integers(0, 2**40, 100, dtype=np.int64)
    sk = make_sketch(kind, **params).update(vals)
    blob = sk.to_bytes()
    back = from_bytes(blob)
    assert back.to_bytes() == blob
    # the restored sketch must keep evolving identically
    assert back.update(more).to_bytes() == sk.update(more).to_bytes()


# ---- hash-family wire guard -------------------------------------------------
# Bloom/CMS bit positions moved from nh seeded WangHashes to Kirsch-
# Mitzenmacher double hashing in round 4. States persisted by pre-KM code
# (checkpoint resume dirs) carry no "hf" tag; loading one into KM code and
# merging would silently mix unrelated bit positions. from_bytes() must
# refuse instead.

import json as _json
import zlib as _zlib

import pytest as _pytest

from sketch_spark.sketches import base as _base_mod
from sketch_spark.sketches.base import from_bytes as _from_bytes
from sketch_spark.sketches.base import make_sketch as _make_sketch


def _strip_hf(buf: bytes) -> bytes:
    """Rewrite a state frame as pre-KM code would have written it (no hf)."""
    hlen = int.from_bytes(buf[6:10], "little")
    header = _json.loads(buf[10 : 10 + hlen].decode())
    header["params"].pop("hf")
    h2 = _json.dumps(header, separators=(",", ":"), sort_keys=True).encode()
    return buf[:6] + len(h2).to_bytes(4, "little") + h2 + buf[10 + hlen :]


@_pytest.mark.parametrize(
    "kind,kw",
    [
        ("bloom", {"l2sz": 10, "nh": 4}),
        ("cms", {"l2sz": 8, "nh": 4}),
        ("pccm", {"l2sz": 8, "nh": 4}),
        ("realccm", {"l2sz": 8, "nh": 4}),
    ],
)
def test_pre_km_states_refuse_to_load(kind, kw):
    import numpy as _np

    sk = _make_sketch(kind, **kw).update(_np.arange(100, dtype=_np.int64))
    buf = sk.to_bytes()
    assert _from_bytes(buf) == sk  # tagged round-trip still fine
    with _pytest.raises(ValueError, match="hash-family mismatch"):
        _from_bytes(_strip_hf(buf))


def test_hf_tag_rides_in_params_only_for_km_kinds():
    import numpy as _np

    km = _make_sketch("bloom", l2sz=10, nh=4)
    untagged = _make_sketch("hll", p=10)
    for sk, expect in ((km, "km2008"), (untagged, None)):
        buf = sk.to_bytes()
        hlen = int.from_bytes(buf[6:10], "little")
        header = _json.loads(buf[10 : 10 + hlen].decode())
        assert header["params"].get("hf") == expect
