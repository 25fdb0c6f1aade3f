"""Constraint-system DSL tests: gadget semantics + solve/compile parity."""
import random

import pytest

from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_ref import poseidon
from zkpos_tpu.circuit.cs import ConstraintSystem, UnsatisfiedConstraint
from zkpos_tpu.circuit.gadgets import LookupTable, poseidon_gadget

rng = random.Random(3)


def test_mul_add_solve():
    cs = ConstraintSystem(solve=True)
    a = cs.new_witness(7)
    b = cs.new_witness(9)
    c = cs.mul(a, b)
    cs.assert_is_equal(c, 63)
    assert cs.is_satisfied()


def test_assert_fails():
    cs = ConstraintSystem(solve=True)
    a = cs.new_witness(7)
    with pytest.raises(UnsatisfiedConstraint):
        cs.assert_is_equal(a, 8)


def test_is_zero_select():
    cs = ConstraintSystem(solve=True)
    z = cs.new_witness(0)
    nz = cs.new_witness(5)
    assert cs.eval_lc(cs.is_zero(z)) == 1
    assert cs.eval_lc(cs.is_zero(nz)) == 0
    one = cs.new_witness(1)
    assert cs.eval_lc(cs.select(one, 11, 22)) == 11
    assert cs.eval_lc(cs.select(cs.sub(one, one), 11, 22)) == 22
    assert cs.is_satisfied()


def test_cmp_nop():
    for a, b, want in [(3, 5, MOD - 1), (5, 3, 1), (4, 4, 0)]:
        cs = ConstraintSystem(solve=True)
        av, bv = cs.new_witness(a), cs.new_witness(b)
        r = cs.cmp_nop(av, bv, 8)
        assert cs.eval_lc(r) == want
        assert cs.is_satisfied()


def test_leq_nop():
    cs = ConstraintSystem(solve=True)
    a, b = cs.new_witness(10), cs.new_witness(10)
    cs.assert_is_less_or_equal_nop(a, b, 8)
    assert cs.is_satisfied()
    with pytest.raises(UnsatisfiedConstraint):
        cs2 = ConstraintSystem(solve=True)
        cs2.assert_is_less_or_equal_nop(cs2.new_witness(11),
                                        cs2.new_witness(10), 8)


def test_range_check():
    cs = ConstraintSystem(solve=True)
    cs.range_check(cs.new_witness(255), 8)
    assert cs.is_satisfied()
    with pytest.raises(UnsatisfiedConstraint):
        cs2 = ConstraintSystem(solve=True)
        cs2.range_check(cs2.new_witness(256), 8)


@pytest.mark.parametrize("n", [1, 2, 5, 16, 20, 35])
def test_poseidon_gadget_matches_oracle(n):
    vals = [rng.randrange(MOD) for _ in range(n)]
    cs = ConstraintSystem(solve=True)
    vs = [cs.new_witness(v) for v in vals]
    out = poseidon_gadget(cs, vs)
    assert cs.eval_lc(out) == poseidon(vals)
    assert cs.is_satisfied()


def test_lookup_table():
    cs = ConstraintSystem(solve=True)
    t = LookupTable(cs)
    table_vals = [rng.randrange(MOD) for _ in range(8)]
    for v in table_vals:
        t.insert(cs.new_witness(v))
    q = cs.new_witness(5)
    res = t.lookup(q, cs.add(q, 1))
    assert cs.eval_lc(res[0]) == table_vals[5]
    assert cs.eval_lc(res[1]) == table_vals[6]
    assert cs.is_satisfied()


def test_compile_solve_constraint_parity():
    def build(cs, vals):
        vs = [cs.new_witness(v) for v in vals]
        h = poseidon_gadget(cs, vs)
        cs.range_check(vs[0], 16)
        t = LookupTable(cs)
        for v in vs:
            t.insert(v)
        t.lookup(vs[1])
        cs.assert_is_equal(h, h)

    vals = [3, 1, 4, 1, 5]
    c1 = ConstraintSystem(solve=False)
    build(c1, [None] * len(vals))
    c2 = ConstraintSystem(solve=True)
    build(c2, vals)
    assert len(c1.constraints) == len(c2.constraints)
    assert c1.num_vars == c2.num_vars
