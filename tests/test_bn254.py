"""Sanity tests for the BN254 oracle layer: curve membership, group order,
pairing bilinearity.  These validate the host-side Groth16 verify path."""
import pytest

from zkpos_tpu.crypto import bn254 as bn


def test_generators_on_curve():
    assert bn.g1_is_on_curve(bn.G1_GEN)
    assert bn.g2_is_on_curve(bn.G2_GEN)


def test_group_order():
    assert bn.g1_mul(bn.G1_GEN, bn.R) is None
    assert bn.g2_mul(bn.G2_GEN, bn.R) is None


def test_scalar_mul_consistency():
    p5 = bn.g1_mul(bn.G1_GEN, 5)
    acc = None
    for _ in range(5):
        acc = bn.g1_add(acc, bn.G1_GEN)
    assert p5 == acc


@pytest.mark.slow
def test_pairing_bilinearity():
    a, b = 6, 7
    e1 = bn.pairing(bn.g1_mul(bn.G1_GEN, a), bn.g2_mul(bn.G2_GEN, b))
    e2 = bn.pairing(bn.G1_GEN, bn.G2_GEN).pow(a * b)
    assert e1 == e2


@pytest.mark.slow
def test_pairing_nondegenerate():
    e = bn.pairing(bn.G1_GEN, bn.G2_GEN)
    assert e != bn.Fp12.ONE
    assert e.pow(bn.R) == bn.Fp12.ONE
