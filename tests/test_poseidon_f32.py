"""poseidon_f32 (digit engine) vs the python oracle and the u32 engine."""
import numpy as np
import jax.numpy as jnp

from zkpos_tpu.crypto.bn254 import R as P
from zkpos_tpu.crypto.poseidon_ref import poseidon
from zkpos_tpu.ops import fr_f32 as fd
from zkpos_tpu.ops import poseidon_f32 as pf


def rand_ints(n, seed=0):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]


def test_hash2_matches_oracle():
    xs, ys = rand_ints(8, 1), rand_ints(8, 2)
    a = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    b = fd.to_mont(jnp.asarray(fd.ints_to_digits(ys)))
    got = fd.digits_to_ints(fd.from_mont(pf.hash2_mont(a, b)))
    want = [poseidon([x, y]) for x, y in zip(xs, ys)]
    assert got == want


def test_hash5_matches_oracle():
    rows = [rand_ints(4, 10 + i) for i in range(5)]
    got = pf.hash_batch(rows)
    want = [poseidon([rows[i][j] for i in range(5)]) for j in range(4)]
    assert got == want


def test_hash_chain_matches_u32_engine():
    # wide-arity chain rule must agree with the existing engine (COMPAT rule)
    from zkpos_tpu.ops.poseidon import hash_batch as hash_batch_u32
    rows = [rand_ints(2, 50 + i) for i in range(40)]
    assert pf.hash_batch(rows) == hash_batch_u32(rows)


def test_nil_account_hash():
    # NilAccountHash = Poseidon(0,0,0,0,0) — constants.go:103-106 analog
    rows = [[0], [0], [0], [0], [0]]
    assert pf.hash_batch(rows) == [poseidon([0, 0, 0, 0, 0])]
