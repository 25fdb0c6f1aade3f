"""Device EC kernels vs the python oracle (crypto.bn254)."""
import random

import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.ops import ec

rng = random.Random(99)


def rand_g1(n):
    return [bn.g1_mul(bn.G1_GEN, rng.randrange(1, bn.R)) for _ in range(n)]


def test_msm_g1_small():
    pts = rand_g1(5) + [None]
    scalars = [rng.randrange(bn.R) for _ in range(5)] + [12345]
    got = ec.msm_g1(pts, scalars)
    want = None
    for p, s in zip(pts, scalars):
        want = bn.g1_add(want, bn.g1_mul(p, s))
    assert got == want


def test_msm_g1_edge_scalars():
    pts = rand_g1(4)
    scalars = [0, 1, bn.R - 1, 2]
    got = ec.msm_g1(pts, scalars)
    want = None
    for p, s in zip(pts, scalars):
        want = bn.g1_add(want, bn.g1_mul(p, s))
    assert got == want


def test_msm_g1_same_point():
    # repeated identical points exercise the doubling branch of point_add
    p = rand_g1(1)[0]
    got = ec.msm_g1([p, p, p], [1, 1, 2])
    assert got == bn.g1_mul(p, 4)


@pytest.mark.slow
def test_msm_g2_small():
    pts = [bn.g2_mul(bn.G2_GEN, rng.randrange(1, bn.R)) for _ in range(3)]
    scalars = [rng.randrange(bn.R) for _ in range(3)]
    got = ec.msm_g2(pts, scalars)
    want = None
    for p, s in zip(pts, scalars):
        want = bn.g2_add(want, bn.g2_mul(p, s))
    assert got == want
