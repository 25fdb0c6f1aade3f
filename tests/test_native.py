"""Native C++ host runtime (native/zkpos_native.cpp via utils/native.py):
field arithmetic, digit bridge, Poseidon — all vs the python oracle."""

import random

import numpy as np
import pytest

from zkpos_tpu.crypto.bn254 import P, R
from zkpos_tpu.utils import native

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native toolchain unavailable")

rng = random.Random(9)


def _roundtrip_field(which, mod):
    import ctypes
    L = native.lib()
    a = [rng.randrange(mod) for _ in range(32)]
    b = [rng.randrange(mod) for _ in range(32)]
    al, bl = native.ints_to_limbs(a, mod), native.ints_to_limbs(b, mod)
    am, bm, pm, ps = (np.empty_like(al) for _ in range(4))
    p = lambda x: native._p(x, ctypes.c_uint64)
    L.zk_to_mont_batch(which, p(al), p(am), 32)
    L.zk_to_mont_batch(which, p(bl), p(bm), 32)
    L.zk_mont_mul_batch(which, p(am), p(bm), p(pm), 32)
    L.zk_from_mont_batch(which, p(pm), p(ps), 32)
    assert native.limbs_to_ints(ps) == [(x * y) % mod for x, y in zip(a, b)]
    L.zk_add_batch(which, p(al), p(bl), p(ps), 32)
    assert native.limbs_to_ints(ps) == [(x + y) % mod for x, y in zip(a, b)]
    L.zk_sub_batch(which, p(al), p(bl), p(ps), 32)
    assert native.limbs_to_ints(ps) == [(x - y) % mod for x, y in zip(a, b)]


def test_fr_arith():
    _roundtrip_field(native.FR_IDX, R)


def test_fp_arith():
    _roundtrip_field(native.FP_IDX, P)


def test_digit_bridge_roundtrip():
    vals = [rng.randrange(R) for _ in range(300)]
    dig = native.u256_to_digits(native.ints_to_limbs(vals, R))
    assert dig.shape == (34, 300)
    back = native.limbs_to_ints(native.digits_to_u256(dig.astype(np.float64)))
    assert back == vals


def test_digit_bridge_lazy_values():
    """Lazy digit vectors (values up to ~16p, digits up to 2^20) reduce
    correctly mod p."""
    vals = [rng.randrange(R) for _ in range(8)]
    dig = native.u256_to_digits(native.ints_to_limbs(vals, R))
    lazy = dig.astype(np.float64)
    lazy[0] += 256.0 * 1000        # +1000 carried into digit 1's place
    lazy[1] -= 1000
    back = native.limbs_to_ints(native.digits_to_u256(lazy))
    assert back == vals


def test_poseidon_matches_oracle():
    from zkpos_tpu.crypto.poseidon_ref import poseidon
    a = [rng.randrange(R) for _ in range(6)]
    b = [rng.randrange(R) for _ in range(6)]
    got = native.poseidon2_batch(a, b)
    assert got == [poseidon([x, y]) for x, y in zip(a, b)]
