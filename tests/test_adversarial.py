"""Adversarial / soundness tests for the tier-ratio gadget and the logUp
lookup argument.

Ports the reference's 21-case expectFail table
(get_and_check_tier_ratios_query_results_test.go:106-223) against our
`_get_and_check_tier_ratios_query_results`, and adds direct attacks on the
logUp argument (forged query output, out-of-range index, doctored
multiplicities) that VERDICT r2 flagged as untested.
"""
import pytest

from zkpos_tpu.circuit.cs import ConstraintSystem, LC, UnsatisfiedConstraint
from zkpos_tpu.circuit.gadgets import LookupTable
from zkpos_tpu.circuit import batch_create_user as bcu
from zkpos_tpu.utils import constants as C

MAX_B = C.MAX_TIER_BOUNDARY_VALUE    # 2^118


def expected_value(tiers, collateral, price, index, flag):
    """Host oracle for the gadget output (reference utils.go:112-164)."""
    pre = []
    prev_b = 0
    acc = 0
    for (b, r) in tiers:
        acc += (b - prev_b) * r // 100
        pre.append(acc)
        prev_b = b
    if flag == 1:
        return pre[-1]
    v = collateral * price
    lo_b = tiers[index - 1][0] if index > 0 else 0
    lo_p = pre[index - 1] if index > 0 else 0
    return lo_p + (v - lo_b) * tiers[index][1] // 100


def run_case(tiers, collateral, index, flag, price, check_output=True):
    """Build + solve a one-asset tier circuit; returns (satisfied, cs)."""
    cs = ConstraintSystem(solve=True, collect_violations=True)
    ratios = [{"boundary": cs.new_witness(b), "ratio": cs.new_witness(r)}
              for (b, r) in tiers]
    v_coll = cs.new_witness(collateral)
    v_idx = cs.new_witness(index)
    v_flag = cs.new_witness(flag)
    v_price = cs.new_witness(price)
    try:
        bcu._generate_rapid_arithmetic_for_collateral(cs, ratios)
        table = LookupTable(cs)
        for _ in range(3):
            table.insert(0)
        for r in ratios:
            table.insert(r["boundary"])
            table.insert(r["ratio"])
            table.insert(r["precomputed"])
        out = bcu._get_and_check_tier_ratios_query_results(
            cs, table, LC(const=0), v_coll, v_idx, v_flag, v_price,
            3 * (len(tiers) + 1), len(tiers) - 1)
        if check_output:
            cs.assert_is_equal(
                out, expected_value(tiers, collateral, price, index, flag))
    except UnsatisfiedConstraint:
        return False, cs
    return cs.is_satisfied() and not cs.violations, cs


STD = [(100, 100), (200, 80), (300, 50)]
SINGLE80 = [(100, 80)]
FLOOR = [(100, 100), (200, 33)]
ZERO_RATIO = [(100, 100), (200, 0)]
ZERO_WIDTH = [(100, 100), (100, 80), (200, 50)]

CASES = [
    # name, tiers, collateral, index, flag, price, expect_fail
    ("first_tier_normal_range", STD, 60, 0, 0, 1, False),
    ("first_tier_equal_boundary", STD, 100, 0, 0, 1, False),
    ("middle_tier_normal_range", STD, 150, 1, 0, 1, False),
    ("middle_tier_equal_boundary", STD, 200, 1, 0, 1, False),
    ("last_tier_flag_zero", STD, 250, 2, 0, 1, False),
    ("flag_one_saturates_to_last_precomputed", STD, 350, 2, 1, 1, False),
    ("flag_one_with_equal_last_boundary_should_fail",
     STD, 300, 2, 1, 1, True),
    ("flag_one_with_non_last_index_should_fail", STD, 350, 1, 1, 1, True),
    ("index_greater_than_max_should_fail", STD, 200, 3, 0, 1, True),
    ("flag_non_boolean_should_fail", STD, 150, 1, 2, 1, True),
    ("zero_collateral_index_zero_should_pass", STD, 0, 0, 0, 1, False),
    ("zero_collateral_with_index_gt_zero_should_fail",
     STD, 0, 1, 1, 1, True),
    ("index_too_low_for_value_should_fail", STD, 250, 1, 0, 1, True),
    ("index_too_high_for_value_should_fail", STD, 50, 2, 0, 1, True),
    ("flag_one_value_exceeds_max_tier_boundary_should_fail",
     STD, MAX_B + 1, 2, 1, 1, True),
    ("single_tier_flag_zero", SINGLE80, 70, 0, 0, 1, False),
    ("single_tier_flag_one", SINGLE80, 150, 0, 1, 1, False),
    ("single_tier_flag_one_equal_boundary_should_fail",
     SINGLE80, 100, 0, 1, 1, True),
    ("floor_semantics_non_divisible", FLOOR, 150, 1, 0, 1, False),
    ("zero_ratio_tier_increment", ZERO_RATIO, 150, 1, 0, 1, False),
    ("zero_width_tier_equal_boundary", ZERO_WIDTH, 100, 0, 0, 1, False),
]


@pytest.mark.parametrize("name,tiers,coll,idx,flag,price,expect_fail",
                         CASES, ids=[c[0] for c in CASES])
def test_tier_ratios_edge_cases(name, tiers, coll, idx, flag, price,
                                expect_fail):
    ok, _ = run_case(tiers, coll, idx, flag, price,
                     check_output=not expect_fail)
    if expect_fail:
        assert not ok, f"{name}: expected failure, witness passed"
    else:
        assert ok, f"{name}: expected success"


# --- direct logUp attacks ----------------------------------------------------

def _lookup_cs(idxs, table=(11, 22, 33, 44)):
    cs = ConstraintSystem(solve=True, collect_violations=True)
    qs = [cs.new_witness(i) for i in idxs]
    t = LookupTable(cs)
    for v in table:
        t.insert(v)
    outs = t.lookup(*qs)
    return cs, t, outs


def test_logup_honest_baseline():
    cs, t, outs = _lookup_cs([2, 0, 2])
    assert cs.is_satisfied()
    assert [cs.eval_lc(o) for o in outs] == [33, 11, 33]


def test_logup_out_of_range_index_rejected():
    cs, t, outs = _lookup_cs([7])         # index beyond the 4-entry table
    assert not cs.is_satisfied()


def test_logup_forged_output_rejected():
    cs, t, outs = _lookup_cs([1, 3])
    cs.finalize()                          # challenge fixed on honest values
    wire = next(iter(outs[0].terms))
    cs.values[wire] = 999                  # post-challenge output forgery
    ok = all(
        (cs.eval_terms(a) * cs.eval_terms(b) - cs.eval_terms(c)) % (
            __import__("zkpos_tpu.crypto.bn254",
                       fromlist=["R"]).R) == 0
        for a, b, c in cs.constraints)
    assert not ok


def test_logup_doctored_multiplicity_rejected():
    cs, t, outs = _lookup_cs([0, 0, 1])
    cs.finalize()
    from zkpos_tpu.crypto.bn254 import R
    m0 = next(iter(t.ms[0].terms))
    cs.values[m0] = (cs.values[m0] + 1) % R   # claim one extra use of row 0
    ok = all(
        (cs.eval_terms(a) * cs.eval_terms(b) - cs.eval_terms(c)) % R == 0
        for a, b, c in cs.constraints)
    assert not ok


def test_logup_swapped_outputs_rejected():
    cs, t, outs = _lookup_cs([0, 1])
    cs.finalize()
    from zkpos_tpu.crypto.bn254 import R
    w0 = next(iter(outs[0].terms))
    w1 = next(iter(outs[1].terms))
    cs.values[w0], cs.values[w1] = cs.values[w1], cs.values[w0]
    ok = all(
        (cs.eval_terms(a) * cs.eval_terms(b) - cs.eval_terms(c)) % R == 0
        for a, b, c in cs.constraints)
    assert not ok
