"""Pippenger MSM (ops/msm.py) + f32 EC kernels vs the host oracle.

Covers the distributions that break naive bucket methods: zero scalars,
heavy duplication (witness vectors are full of 0/1/2^k — reference witness
layout src/utils/utils.go:188-221), duplicated base points (repeated QAP
evals), and the tiny-N edge."""

import numpy as np
import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.ops import msm


def _rand_g1(rng, n):
    return [bn.g1_mul(bn.G1_GEN, int(rng.integers(1, 1 << 62)))
            for _ in range(n)]


def _oracle_g1(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bn.g1_add(acc, bn.g1_mul(p, s % bn.R))
    return acc


def _oracle_g2(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bn.g2_add(acc, bn.g2_mul(p, s % bn.R))
    return acc


def test_msm_g1_random_small():
    rng = np.random.default_rng(0)
    pts = _rand_g1(rng, 17)
    sc = [int.from_bytes(rng.bytes(32), "little") for _ in range(17)]
    assert msm.msm_g1(pts, sc) == _oracle_g1(pts, sc)


def test_msm_g1_duplicate_heavy():
    """Many equal window digits (0/1 witness pattern) + repeated points."""
    rng = np.random.default_rng(1)
    base = _rand_g1(rng, 4)
    pts = [base[i % 4] for i in range(64)]
    sc = [0, 1, 1, 1, 2, 2, 2, 2] * 8
    assert msm.msm_g1(pts, sc, c=4) == _oracle_g1(pts, sc)


def test_msm_g1_zeros_and_identity():
    rng = np.random.default_rng(2)
    pts = _rand_g1(rng, 6) + [None, None]
    sc = [0, 5, 0, 7, 0, 1, 3, 9]
    assert msm.msm_g1(pts, sc, c=5) == _oracle_g1(pts, sc)


def test_msm_g1_single():
    pts = [bn.G1_GEN]
    sc = [123456789123456789]
    assert msm.msm_g1(pts, sc) == _oracle_g1(pts, sc)


def test_msm_g1_cancellation():
    """P and -P with equal scalars in the same bucket."""
    rng = np.random.default_rng(3)
    p = _rand_g1(rng, 1)[0]
    pts = [p, bn.g1_neg(p), p]
    sc = [6, 6, 11]
    assert msm.msm_g1(pts, sc, c=4) == _oracle_g1(pts, sc)


@pytest.mark.slow
def test_msm_g1_larger():
    rng = np.random.default_rng(4)
    pts = _rand_g1(rng, 300)
    sc = [int.from_bytes(rng.bytes(32), "little") for _ in range(300)]
    assert msm.msm_g1(pts, sc) == _oracle_g1(pts, sc)


def test_msm_g2_random_small():
    rng = np.random.default_rng(5)
    pts = [bn.g2_mul(bn.G2_GEN, int(rng.integers(1, 1 << 62)))
           for _ in range(9)]
    sc = [int.from_bytes(rng.bytes(32), "little") for _ in range(9)]
    assert msm.msm_g2(pts, sc, c=6) == _oracle_g2(pts, sc)


def test_msm_g1_chunked_passes(monkeypatch):
    """HBM pass-row cap: oversized passes split into fixed-row chunks at
    staggered buf offsets — result must match the unchunked path."""
    monkeypatch.setattr(msm, "_PASS_ROW_CAP_G1", 8)
    rng = np.random.default_rng(6)
    pts = _rand_g1(rng, 160)
    sc = [int.from_bytes(rng.bytes(32), "little") for _ in range(160)]
    assert msm.msm_g1(pts, sc, c=8) == _oracle_g1(pts, sc)
