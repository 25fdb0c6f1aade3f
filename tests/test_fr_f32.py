"""fr_f32 digit engine vs python bigint oracle (exactness of the f32 path)."""
import numpy as np
import jax.numpy as jnp

from zkpos_tpu.crypto.bn254 import R as P
from zkpos_tpu.ops import fr_f32 as fd


def rand_ints(n, seed=0):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(n)]


def test_roundtrip():
    xs = rand_ints(5) + [0, 1, P - 1]
    d = fd.ints_to_digits(xs)
    assert fd.digits_to_ints(d) == xs


def test_mont_mul_matches_oracle():
    xs, ys = rand_ints(64, 1), rand_ints(64, 2)
    a = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    b = fd.to_mont(jnp.asarray(fd.ints_to_digits(ys)))
    got = fd.digits_to_ints(fd.from_mont(fd.mont_mul(a, b)))
    want = [(x * y) % P for x, y in zip(xs, ys)]
    assert got == want


def test_long_mul_chain_stays_exact():
    # 200 chained muls: checks the lazy (1+eps)p bound never drifts
    xs = rand_ints(8, 3)
    a = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    acc, want = a, xs[:]
    for i in range(200):
        acc = fd.mont_mul(acc, a)
        want = [(w * x) % P for w, x in zip(want, xs)]
    got = fd.digits_to_ints(fd.from_mont(acc))
    assert got == want
    # digits stayed in-range for the next conv (lazy bound)
    assert float(jnp.max(acc)) <= 255.0


def test_add_and_const_mul():
    xs, ys = rand_ints(16, 4), rand_ints(16, 5)
    a = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    b = fd.to_mont(jnp.asarray(fd.ints_to_digits(ys)))
    s = fd.digits_to_ints(fd.from_mont(fd.add(a, b)))
    assert s == [(x + y) % P for x, y in zip(xs, ys)]
    k = 0x1234567890ABCDEF1234567890ABCDEF
    kc = fd.const_digits(k)
    got = fd.digits_to_ints(fd.from_mont(fd.mul_const(kc, a)))
    assert got == [(k * x) % P for x in xs]


def test_edge_values():
    xs = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, 1 << 253]
    a = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    sq = fd.digits_to_ints(fd.from_mont(fd.mont_mul(a, a)))
    assert sq == [(x * x) % P for x in xs]
