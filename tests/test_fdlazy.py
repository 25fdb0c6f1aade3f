"""Ripple-free field/EC engine (ops/fdlazy.py, ops/ec_lazy.py) vs the
python bn254 oracle: exactness of the parallel-redistribute Montgomery
reduce, add/sub laziness, and long chained point-add stationarity.
"""
import random

import numpy as np
import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.ops import ec_f32 as ecf
from zkpos_tpu.ops import ec_lazy as ecl
from zkpos_tpu.ops.fd32 import FP
from zkpos_tpu.ops.fdlazy import LE

rng = random.Random(11)
P = bn.P
R272 = 1 << 272


def _wrap_ints(vals, vB=1.0):
    """Canonical Montgomery digits of ints -> LE."""
    import jax.numpy as jnp
    mont = [(v * FP.r_mont) % P for v in vals]
    return ecl.FPL.wrap(jnp.asarray(FP.ints_to_digits(mont)), 255.0, vB)


def _read(le: LE):
    """LE -> list of ints mod p (standard domain)."""
    d = ecl.FPL.to_nonneg(le)
    rinv = pow(FP.r_mont, P - 2, P)
    return [(v * rinv) % P for v in FP.digits_to_ints(np.asarray(d))]


def test_mul_many_exact():
    a = [rng.randrange(P) for _ in range(64)]
    b = [rng.randrange(P) for _ in range(64)]
    la, lb = _wrap_ints(a), _wrap_ints(b)
    (out,) = ecl.FPL.mul_many([(la, lb)])
    assert _read(out) == [(x * y) % P for x, y in zip(a, b)]


def test_add_sub_chain_exact():
    a = [rng.randrange(P) for _ in range(32)]
    b = [rng.randrange(P) for _ in range(32)]
    c = [rng.randrange(P) for _ in range(32)]
    la, lb, lc = _wrap_ints(a), _wrap_ints(b), _wrap_ints(c)
    # (a + b - c) * a  without intermediate normalization
    s = ecl.FPL.sub(ecl.FPL.add(la, lb), lc)
    (out,) = ecl.FPL.mul_many([(s, la)])
    want = [((x + y - z) * x) % P for x, y, z in zip(a, b, c)]
    assert _read(out) == want


def test_mul_const_b3():
    a = [rng.randrange(P) for _ in range(16)]
    la = _wrap_ints(a)
    out = ecl.F1L.mul_b3(la)
    assert _read(out) == [(9 * x) % P for x in a]


def _g1_lazy(points):
    fes = ecf.g1_to_device(points)
    return tuple(ecl.FPL.wrap(fe.d, 255.0, 1.01) for fe in fes)


def _g1_read(pt):
    import jax.numpy as jnp
    ds = tuple(ecl.FPL.to_nonneg(c) for c in pt)
    fes = tuple(ecf.F1.wrap(d, 1.0) for d in ds)
    return ecf.g1_from_device(fes)


def test_point_add_batch_vs_oracle():
    n = 24
    pts1 = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    pts2 = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    # include doubling, inverse pair and identity lanes
    pts2[0] = pts1[0]
    pts2[1] = bn.g1_neg(pts1[1])
    pts2[2] = None
    pts1[3] = None
    out = ecl.point_add(ecl.F1L, _g1_lazy(pts1), _g1_lazy(pts2))
    got = _g1_read(out)
    want = [bn.g1_add(p, q) for p, q in zip(pts1, pts2)]
    assert got == want


def test_point_add_chain_stationary():
    """128 sequential adds: digit/value bounds must stay inside the
    stationary band (the asserts in fdlazy fire at trace time if not) and
    the result must match the oracle."""
    n = 4
    pts = [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    acc_dev = _g1_lazy(pts)
    step = _g1_lazy(pts)
    want = list(pts)
    for _ in range(127):
        acc_dev = ecl.point_add(ecl.F1L, acc_dev, step)
        want = [bn.g1_add(w, p) for w, p in zip(want, pts)]
    assert _g1_read(acc_dev) == want


def test_g2_point_add_vs_oracle():
    n = 8
    pts1 = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    pts2 = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(n)]
    pts2[0] = pts1[0]
    pts2[1] = None

    def wrap2(points):
        fes = ecf.g2_to_device(points)
        return tuple((ecl.FPL.wrap(c0.d, 255.0, 1.01),
                      ecl.FPL.wrap(c1.d, 255.0, 1.01))
                     for c0, c1 in fes)

    out = ecl.point_add(ecl.F2L, wrap2(pts1), wrap2(pts2))
    ds = tuple(tuple(ecl.FPL.to_nonneg(c) for c in comp) for comp in out)
    fes = tuple(tuple(ecf.F1.wrap(d, 1.0) for d in comp) for comp in ds)
    got = ecf.g2_from_device(fes)
    want = [bn.g2_add(p, q) for p, q in zip(pts1, pts2)]
    assert got == want
