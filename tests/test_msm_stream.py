"""On-device sorted-stream MSM (ops/msm_device.py) vs the bn254 host
oracle — G1 and G2, duplicate-heavy / sparse / boundary scalar mixes.
Replaces gnark-crypto MultiExp inside groth16.Prove (prover.go:269).
"""
import random

import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.ops import msm as msm_plan
from zkpos_tpu.ops import msm_device as md

rng = random.Random(7)


def _host_msm(curve, points, scalars):
    add = bn.g1_add if curve == "g1" else bn.g2_add
    mul = bn.g1_mul if curve == "g1" else bn.g2_mul
    acc = None
    for p, s in zip(points, scalars):
        if p is not None and s % bn.R:
            acc = add(acc, mul(p, s % bn.R))
    return acc


def _points(curve, n):
    gen = bn.G1_GEN if curve == "g1" else bn.G2_GEN
    mul = bn.g1_mul if curve == "g1" else bn.g2_mul
    return [mul(gen, rng.randrange(1, bn.R)) for _ in range(n)]


def _run(curve, points, scalars, c=None, chunk=0):
    base = md.device_base(curve, points)
    plan = md.ScalarPlan(scalars, c=c, chunk=chunk)
    return md.msm(curve, base, plan=plan)


@pytest.mark.parametrize("curve", ["g1", "g2"])
def test_small_random(curve):
    n = 37
    pts = _points(curve, n)
    sc = [rng.randrange(bn.R) for _ in range(n)]
    assert _run(curve, pts, sc, c=8) == _host_msm(curve, pts, sc)


def test_duplicate_heavy_scalars():
    """Witness-like scalars: many 0s and 1s and repeated small values."""
    n = 200
    pts = _points("g1", n)
    sc = [rng.choice([0, 0, 0, 1, 1, 2, 5, rng.randrange(bn.R)])
          for _ in range(n)]
    assert _run("g1", pts, sc, c=8) == _host_msm("g1", pts, sc)


def test_multi_chunk_carry():
    """Chunk smaller than the stream: segments must chain across chunks."""
    n = 96
    pts = _points("g1", n)
    # heavy duplication so single buckets span several chunks
    sc = [rng.choice([3, 3, 3, 7]) for _ in range(n)]
    got = _run("g1", pts, sc, c=8, chunk=32)
    assert got == _host_msm("g1", pts, sc)


def test_all_zero_and_empty():
    pts = _points("g1", 5)
    assert _run("g1", pts, [0] * 5, c=8) is None


def test_boundary_scalars():
    pts = _points("g1", 6)
    sc = [1, bn.R - 1, (1 << 254) % bn.R, 2 ** 64, 2 ** 128 - 1, bn.R - 2]
    assert _run("g1", pts, sc, c=8) == _host_msm("g1", pts, sc)


def test_single_point():
    pts = _points("g1", 1)
    sc = [123456789]
    assert _run("g1", pts, sc, c=8) == _host_msm("g1", pts, sc)


def test_g2_multi_chunk():
    n = 48
    pts = _points("g2", n)
    sc = [rng.choice([0, 1, 9, rng.randrange(bn.R)]) for _ in range(n)]
    assert _run("g2", pts, sc, c=8, chunk=32) == _host_msm("g2", pts, sc)


def test_plan_reuse_across_bases():
    """One ScalarPlan drives multiple MSMs (A/B1 share scalars in prove)."""
    n = 40
    pts1 = _points("g1", n)
    pts2 = _points("g1", n)
    sc = [rng.randrange(bn.R) for _ in range(n)]
    plan = md.ScalarPlan(sc, c=8)
    b1 = md.device_base("g1", pts1)
    b2 = md.device_base("g1", pts2)
    assert md.msm("g1", b1, plan=plan) == _host_msm("g1", pts1, sc)
    assert md.msm("g1", b2, plan=plan) == _host_msm("g1", pts2, sc)


def test_none_points_in_base():
    """Identity entries in the base (unused pk slots) contribute nothing."""
    pts = _points("g1", 8)
    pts[3] = None
    sc = [rng.randrange(bn.R) for _ in range(8)]
    assert _run("g1", pts, sc, c=8) == _host_msm("g1", pts, sc)
