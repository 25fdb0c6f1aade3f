"""Kernel-vs-oracle tests for limbed Fr arithmetic and batched Poseidon."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto import poseidon_ref as pr
from zkpos_tpu.ops import fr
from zkpos_tpu.ops import poseidon as pos

rng = random.Random(1234)


def rand_elems(n):
    return [rng.randrange(MOD) for _ in range(n)]


def test_limb_roundtrip():
    vals = rand_elems(17) + [0, 1, MOD - 1]
    assert fr.limbs_to_ints(fr.ints_to_limbs(vals)) == vals


def test_add_sub():
    a, b = rand_elems(64), rand_elems(64)
    aj, bj = jnp.asarray(fr.ints_to_limbs(a)), jnp.asarray(fr.ints_to_limbs(b))
    assert fr.limbs_to_ints(np.asarray(fr.add(aj, bj))) == [
        (x + y) % MOD for x, y in zip(a, b)]
    assert fr.limbs_to_ints(np.asarray(fr.sub(aj, bj))) == [
        (x - y) % MOD for x, y in zip(a, b)]


def test_mont_mul():
    a, b = rand_elems(64), rand_elems(64)
    a += [0, 1, MOD - 1, MOD - 1]
    b += [MOD - 1, MOD - 1, MOD - 1, 1]
    aj, bj = jnp.asarray(fr.ints_to_limbs(a)), jnp.asarray(fr.ints_to_limbs(b))
    am, bm = fr.to_mont(aj), fr.to_mont(bj)
    prod = fr.from_mont(fr.mont_mul(am, bm))
    assert fr.limbs_to_ints(np.asarray(prod)) == [
        (x * y) % MOD for x, y in zip(a, b)]


def test_mont_roundtrip():
    a = rand_elems(32)
    aj = jnp.asarray(fr.ints_to_limbs(a))
    assert fr.limbs_to_ints(np.asarray(fr.from_mont(fr.to_mont(aj)))) == a


def test_poseidon_hash2_matches_oracle():
    n = 33
    a, b = rand_elems(n), rand_elems(n)
    got = pos.hash_batch([a, b])
    want = [pr.poseidon([x, y]) for x, y in zip(a, b)]
    assert got == want


def test_poseidon_hash5_matches_oracle():
    n = 9
    cols = [rand_elems(n) for _ in range(5)]
    got = pos.hash_batch(cols)
    want = [pr.poseidon([c[i] for c in cols]) for i in range(n)]
    assert got == want


def test_poseidon_hash16_matches_oracle():
    n = 4
    cols = [rand_elems(n) for _ in range(16)]
    got = pos.hash_batch(cols)
    want = [pr.poseidon([c[i] for c in cols]) for i in range(n)]
    assert got == want
