"""End-to-end circuit tests: witness pipeline -> BatchCreateUserCircuit solve.

Ports the intent of reference circuit/batch_create_user_circuit_test.go
(ConstructValidBatch + IsSolved) and the soundness regression
TestCollateralFlagBypassShouldFail (circuit/utils_test.go:214-305), at
test-shrunk sizes (4 assets, 2 tiers, depth-8 tree — framework extension).
"""
import os

import pytest

from zkpos_tpu.utils import constants as C


@pytest.fixture(scope="module", autouse=True)
def _sizes():
    saved = (C.ASSET_COUNTS, C.TIER_COUNT, C.ACCOUNT_TREE_DEPTH,
             os.environ.get("ZKPOR_TEST_TIERS"))
    C.configure(asset_counts=4, tier_count=2, tree_depth=8)
    os.environ["ZKPOR_TEST_TIERS"] = "3:2"
    yield
    C.configure(*saved[:3])
    if saved[3] is None:
        os.environ.pop("ZKPOR_TEST_TIERS", None)
    else:
        os.environ["ZKPOR_TEST_TIERS"] = saved[3]

from zkpos_tpu.utils.types import AccountAsset, AccountInfo, CexAssetInfo, TierRatio
from zkpos_tpu.utils.commitments import (calculate_asset_value_for_collateral,
                                         calculate_precomputed_value,
                                         padding_tier_ratios)
from zkpos_tpu.witness import core as wcore
from zkpos_tpu.circuit.cs import ConstraintSystem
from zkpos_tpu.circuit import batch_create_user as bcu

E8 = 10 ** 8


def make_cex_assets():
    out = []
    for i in range(C.ASSET_COUNTS):
        tiers = [TierRatio(boundary_value=10_000 * 10 ** 16, ratio=90),
                 TierRatio(boundary_value=50_000 * 10 ** 16, ratio=70)]
        calculate_precomputed_value(tiers)
        out.append(CexAssetInfo(
            symbol=f"tok{i}", index=i, base_price=(i + 1) * E8,
            loan_ratios=padding_tier_ratios(list(tiers)),
            margin_ratios=padding_tier_ratios(list(tiers)),
            portfolio_margin_ratios=padding_tier_ratios(list(tiers))))
    return out


def make_accounts(cex):
    accounts = []
    specs = [
        [(0, 100, 10, 40, 20, 20), (2, 500, 100, 100, 100, 100)],
        [(1, 7, 1, 2, 2, 2)],
        [(0, 30, 0, 10, 10, 10), (1, 40, 2, 10, 10, 10), (3, 50, 3, 10, 10, 10)],
    ]
    for spec in specs:
        assets = []
        te = td = tc = 0
        for (idx, eq, de, lo, ma, pm) in spec:
            eq *= E8; de *= E8; lo *= E8; ma *= E8; pm *= E8
            assets.append(AccountAsset(index=idx, equity=eq, debt=de,
                                       loan=lo, margin=ma,
                                       portfolio_margin=pm))
            price = cex[idx].base_price
            te += eq * price
            td += de * price
            tc += calculate_asset_value_for_collateral(lo, ma, pm, cex[idx])
        assert tc >= td, "test fixture must be solvent"
        accounts.append(AccountInfo(account_id=b"", total_equity=te,
                                    total_debt=td, total_collateral=tc,
                                    assets=assets))
    return accounts


@pytest.fixture(scope="module")
def batch_witnesses():
    cex = make_cex_assets()
    accounts = make_accounts(cex)
    by_tier, capacity = wcore.prepare_accounts({3: accounts})
    tree = wcore.build_account_tree(by_tier, capacity)
    wits = list(wcore.generate_batch_witnesses(tree, by_tier, cex))
    assert len(wits) == 2
    for _, w in wits:
        wcore.densify_ops_assets(w)
    return wits


def solve(circuit_w, collect=False):
    cs = ConstraintSystem(solve=True, collect_violations=collect)
    bcu.define(cs, circuit_w)
    return cs


def test_batches_satisfied(batch_witnesses):
    for height, wit in batch_witnesses:
        w = bcu.set_batch_create_user_circuit_witness(wit)
        cs = solve(w)
        assert cs.is_satisfied(), f"batch {height} unsatisfied"
        assert cs.num_public == 2  # one-wire + BatchCommitment


def test_compile_shapes_match_solve(batch_witnesses):
    _, wit = batch_witnesses[0]
    w = bcu.set_batch_create_user_circuit_witness(wit)
    cs_solve = solve(w)
    shape = bcu.new_empty_assignment(3, C.ASSET_COUNTS, 2)
    cs_compile = ConstraintSystem(solve=False)
    bcu.define(cs_compile, shape)
    assert len(cs_compile.constraints) == len(cs_solve.constraints)
    assert cs_compile.num_vars == cs_solve.num_vars
    assert cs_compile.num_public == cs_solve.num_public


def test_wrong_commitment_fails(batch_witnesses):
    _, wit = batch_witnesses[0]
    w = bcu.set_batch_create_user_circuit_witness(wit)
    w.batch_commitment = (w.batch_commitment + 1)
    cs = solve(w, collect=True)
    assert cs.violations


def test_collateral_flag_bypass_fails(batch_witnesses):
    """Flag=1 must force index == last tier (utils_test.go:214-305)."""
    _, wit = batch_witnesses[0]
    w = bcu.set_batch_create_user_circuit_witness(wit)
    ua = w.create_user_ops[0].assets[0]
    ua.loan_collateral_flag = 1      # but index stays non-final
    ua.loan_collateral_index = 0
    cs = solve(w, collect=True)
    assert cs.violations


def test_tampered_balance_fails(batch_witnesses):
    _, wit = batch_witnesses[0]
    w = bcu.set_batch_create_user_circuit_witness(wit)
    w.create_user_ops[0].assets_for_update_cex[0].equity += 1
    cs = solve(w, collect=True)
    assert cs.violations
