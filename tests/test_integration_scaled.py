"""Scaled integration run — the invariant-count analog of reference
scripts/integration_test.sh:17-19 (EXPECT_TOTAL_USERS_ACCOUNT=10240,
EXPECT_TOTAL_PROOFS=50, TEST_TIERS="500:30,50:220",
NUM_USER_PROOFS_TO_VERIFY=500).

Shape is preserved exactly — two tiers whose batch sizes are in the same
30:220-like proportion, EXACTLY 50 real Groth16 proofs, full serial chain
verification over the exported CSV, and a spot-check sweep over every
userproof row — at a size a CPU test box can finish: 220 users
(tier A: 40 users in batches of 2; tier B: 180 users in batches of 6).

Scale up with ZKPOS_IT_SCALE=k (multiplies users per tier and batch sizes,
holding the 50-proof invariant): k=1 (default) 220 users, k=8 is 1,760
users, and the reference proportions themselves are k≈37.

Marked slow (50 real setup+prove cycles).
"""
import os

import pytest

from zkpos_tpu.utils import constants as C

SCALE = int(os.environ.get("ZKPOS_IT_SCALE", "1"))
# tier -> (batch_size, n_users): n_users/batch sums to 50 proofs at any k.
TIER_A, TIER_B = 3, 2
BATCH_A, BATCH_B = 2 * SCALE, 6 * SCALE
USERS_A, USERS_B = 40 * SCALE, 180 * SCALE
EXPECT_PROOFS = USERS_A // BATCH_A + USERS_B // BATCH_B   # == 50 at any k
EXPECT_USERS = USERS_A + USERS_B

E8 = 10 ** 8


@pytest.fixture(scope="module", autouse=True)
def _sizes():
    depth = 8
    while (1 << depth) < 4 * EXPECT_USERS:      # room for padding per tier
        depth += 1
    saved = (C.ASSET_COUNTS, C.TIER_COUNT, C.ACCOUNT_TREE_DEPTH,
             os.environ.get("ZKPOR_TEST_TIERS"))
    C.configure(asset_counts=4, tier_count=2, tree_depth=depth)
    os.environ["ZKPOR_TEST_TIERS"] = f"{TIER_A}:{BATCH_A},{TIER_B}:{BATCH_B}"
    yield
    C.configure(*saved[:3])
    if saved[3] is None:
        os.environ.pop("ZKPOR_TEST_TIERS", None)
    else:
        os.environ["ZKPOR_TEST_TIERS"] = saved[3]


def _make_accounts(cex, n_users, n_assets):
    from zkpos_tpu.utils.types import AccountAsset, AccountInfo
    from zkpos_tpu.utils.commitments import (
        calculate_asset_value_for_collateral)
    accounts = []
    for u in range(n_users):
        assets = []
        te = td = tc = 0
        for k in range(n_assets):
            idx = (u + k * 3) % C.ASSET_COUNTS
            eq = (10 + (u % 50) + k) * E8
            de = (1 + (u + k) % 3) * E8
            lo = ma = pm = (1 + k % 2) * E8    # 3lo+ma+pm bounded by equity
            assets.append(AccountAsset(index=idx, equity=eq, debt=de,
                                       loan=lo, margin=ma,
                                       portfolio_margin=pm))
            price = cex[idx].base_price
            te += eq * price
            td += de * price
            tc += calculate_asset_value_for_collateral(lo, ma, pm, cex[idx])
        assert tc >= td, "fixture must be solvent"
        assets.sort(key=lambda a: a.index)
        accounts.append(AccountInfo(account_id=b"", total_equity=te,
                                    total_debt=td, total_collateral=tc,
                                    assets=assets))
    return accounts


@pytest.mark.slow
def test_scaled_pipeline_invariants(tmp_path_factory):
    from zkpos_tpu.services.config import ServiceConfig
    from zkpos_tpu.services import keygen as kg
    from zkpos_tpu.services.witness import WitnessService
    from zkpos_tpu.services.prover import Prover
    from zkpos_tpu.services.dbtool import DbTool
    from zkpos_tpu.services.verifier import (load_proof_csv, verify_user,
                                             verify_batch_proofs,
                                             _cex_from_json)
    from tests.test_batch_circuit import make_cex_assets

    base = tmp_path_factory.mktemp("scaled")
    cfg = ServiceConfig(db_path=str(base / "zkpos.db"),
                        zk_key_name=str(base / "keys" / "zkpor"))

    # keygen: one artifact set per tier (KEYGEN_FILES analog)
    kg.run(cfg.zk_key_name)
    for tier, batch in ((TIER_A, BATCH_A), (TIER_B, BATCH_B)):
        for ext in ("pk", "vk", "r1cs"):
            assert os.path.exists(
                str(base / "keys" / f"zkpor{tier}_{batch}.{ext}"))

    cex = make_cex_assets()
    accounts = {TIER_A: _make_accounts(cex, USERS_A, TIER_A),
                TIER_B: _make_accounts(cex, USERS_B, TIER_B)}
    svc = WitnessService(cfg)
    svc.prepare(accounts, cex)
    n_wit = svc.run_witness()
    n_up = svc.run_userproof()
    # EXPECT_TOTAL_PROOFS / EXPECT_TOTAL_USERS_ACCOUNT invariants
    assert n_wit == EXPECT_PROOFS == 50
    assert n_up == EXPECT_USERS

    tool = DbTool(cfg)
    assert tool.push_task_to_redis() == EXPECT_PROOFS
    Prover(cfg).run(queue_timeout=1.0)
    counts = tool.check_prover_status()
    assert counts == {"published": 0, "received": 0,
                      "finished": EXPECT_PROOFS}

    # export + full serial chain verification (verify_batch_proofs walks
    # the cex-commitment/account-root chain across all 50 proofs)
    csv_path = str(base / "proofs.csv")
    assert tool.export_proof_csv(csv_path) == EXPECT_PROOFS
    rows = load_proof_csv(csv_path)
    assert len(rows) == EXPECT_PROOFS
    verify_batch_proofs(rows, _cex_from_json(tool.query_cex_assets()),
                        cfg.zk_key_name)

    # NUM_USER_PROOFS_TO_VERIFY analog: sweep EVERY userproof row
    for idx in range(EXPECT_USERS):
        assert verify_user(tool.query_account_data(idx)), idx
    bad = tool.query_account_data(1)
    bad["TotalDebt"] += 1
    assert not verify_user(bad)
