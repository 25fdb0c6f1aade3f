"""Witness-generation core — parity with reference src/witness.

Pure functions (no storage): account padding/index assignment
(witness main.go:58-90), device-batched account-tree build
(main.go:130-199), and per-batch BatchCreateUserWitness construction with
running CEX totals (witness.go:138-212, fillCreateUserOp :319-340).
The service wrapper with DB persistence/resume lives in services/witness.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, List, Tuple

import numpy as np

from ..crypto.bn254 import R as MOD, fr_from_bytes, fr_to_bytes
from ..crypto.poseidon_ref import poseidon
from ..merkle.tree import AccountTree
from ..ops import fr as frops
from ..ops import poseidon as pos
from ..utils import constants as C
from ..utils.commitments import (account_info_to_hash, cex_asset_elements,
                                 user_assets_elements)
from ..utils.csv_ingest import padding_accounts
from ..utils.types import (AccountInfo, BatchCreateUserWitness, CexAssetInfo,
                           CreateUserOperation, TierRatio)


def prepare_accounts(accounts_by_tier: Dict[int, List[AccountInfo]],
                     tiers: Dict[int, int] | None = None
                     ) -> Tuple[Dict[int, List[AccountInfo]], int]:
    """Pad each tier to a batch multiple, assign sequential AccountIndex,
    give padding accounts AccountId = fr(sha256(index)) (main.go:58-90).
    Returns (padded accounts, capacity)."""
    tiers = tiers or C.get_tiers()
    out: Dict[int, List[AccountInfo]] = {}
    global_index = 0
    for k in sorted(accounts_by_tier):
        padded = padding_accounts(accounts_by_tier[k], k, tiers[k])
        for acc in padded:
            acc.account_index = global_index
            if not acc.account_id:
                h = hashlib.sha256(global_index.to_bytes(4, "big")).digest()
                acc.account_id = fr_to_bytes(fr_from_bytes(h))
            global_index += 1
        out[k] = padded
    return out, global_index


def account_leaves(accounts: List[AccountInfo]) -> List[int]:
    """Leaf hashes for a tier's accounts (AccountInfoToHash per account).
    Batched on device: one chained-Poseidon sweep for the asset commitments
    and one 5-ary sweep for the leaves (replaces the reference's NumCPU
    goroutine loop, main.go:163-192)."""
    if not accounts:
        return []
    n_eles = len(user_assets_elements(accounts[0].assets))
    elements = np.zeros((n_eles, len(accounts)), dtype=object)
    for j, acc in enumerate(accounts):
        col = user_assets_elements(acc.assets)
        for i, v in enumerate(col):
            elements[i, j] = v
    commitments = pos.hash_batch([list(row) for row in elements])
    leaf_inputs = [
        [fr_from_bytes(a.account_id) for a in accounts],
        [a.total_equity % MOD for a in accounts],
        [a.total_debt % MOD for a in accounts],
        [a.total_collateral % MOD for a in accounts],
        commitments,
    ]
    return pos.hash_batch(leaf_inputs)


def build_account_tree(accounts_by_tier: Dict[int, List[AccountInfo]],
                       capacity: int,
                       depth: int | None = None) -> AccountTree:
    leaves: List[int] = [0] * capacity
    for k in sorted(accounts_by_tier):
        accs = accounts_by_tier[k]
        for acc, leaf in zip(accs, account_leaves(accs)):
            leaves[acc.account_index] = leaf
    tree = AccountTree(depth=depth, capacity=capacity)
    tree.build_from_leaf_ints(leaves)
    return tree


def _copy_cex(cex: List[CexAssetInfo]) -> List[CexAssetInfo]:
    return [CexAssetInfo(
        total_equity=a.total_equity, total_debt=a.total_debt,
        base_price=a.base_price, symbol=a.symbol, index=a.index,
        loan_collateral=a.loan_collateral,
        margin_collateral=a.margin_collateral,
        portfolio_margin_collateral=a.portfolio_margin_collateral,
        loan_ratios=[TierRatio(r.boundary_value, r.ratio, r.precomputed_value)
                     for r in a.loan_ratios],
        margin_ratios=[TierRatio(r.boundary_value, r.ratio,
                                 r.precomputed_value)
                       for r in a.margin_ratios],
        portfolio_margin_ratios=[TierRatio(r.boundary_value, r.ratio,
                                           r.precomputed_value)
                                 for r in a.portfolio_margin_ratios],
    ) for a in cex]


def _cex_commitment_bytes(cex: List[CexAssetInfo]) -> bytes:
    elements = []
    for a in cex:
        elements += cex_asset_elements(a)
    # device-chained hash: 2 commitments per batch over 20*AssetCounts
    # elements (witness.go:158-176) ran ~10s each in pure python
    return fr_to_bytes(pos.hash_chain_fast(elements))


def generate_batch_witnesses(tree: AccountTree,
                             accounts_by_tier: Dict[int, List[AccountInfo]],
                             cex_assets: List[CexAssetInfo],
                             tiers: Dict[int, int] | None = None,
                             start_height: int = -1,
                             ) -> Iterator[Tuple[int, BatchCreateUserWitness]]:
    """Yields (height, witness) per batch, maintaining running CEX totals.
    All proofs are against the FINAL tree root (witness.go:138,169-171).
    `cex_assets` is mutated (running totals), matching the reference."""
    tiers = tiers or C.get_tiers()
    root = tree.root()
    height = -1
    for k in sorted(accounts_by_tier):
        accs = accounts_by_tier[k]
        ops_per_batch = tiers[k]
        n_batches = len(accs) // ops_per_batch
        for b in range(n_batches):
            height += 1
            replay_only = height <= start_height
            before = _cex_commitment_bytes(cex_assets)
            wit = BatchCreateUserWitness(
                account_tree_root=root,
                before_cex_assets_commitment=before,
                before_cex_assets=_copy_cex(cex_assets))
            for j in range(b * ops_per_batch, (b + 1) * ops_per_batch):
                acc = accs[j]
                for asset in acc.assets:
                    cx = cex_assets[asset.index]
                    cx.total_equity += asset.equity
                    cx.total_debt += asset.debt
                    cx.loan_collateral += asset.loan
                    cx.margin_collateral += asset.margin
                    cx.portfolio_margin_collateral += asset.portfolio_margin
                if replay_only:
                    continue
                wit.create_user_ops.append(CreateUserOperation(
                    assets=list(acc.assets),
                    account_index=acc.account_index,
                    account_id_hash=acc.account_id,
                    account_proof=tree.get_proof(acc.account_index)))
            if replay_only:
                continue
            wit.min_account_index = wit.create_user_ops[0].account_index
            wit.max_account_index = wit.create_user_ops[-1].account_index
            wit.after_cex_assets_commitment = _cex_commitment_bytes(cex_assets)
            wit.batch_commitment = fr_to_bytes(poseidon([
                fr_from_bytes(wit.account_tree_root),
                fr_from_bytes(wit.before_cex_assets_commitment),
                fr_from_bytes(wit.after_cex_assets_commitment),
                wit.min_account_index, wit.max_account_index]))
            yield height, wit


def densify_ops_assets(wit: BatchCreateUserWitness,
                       asset_counts: int | None = None) -> None:
    """Expand each op's sparse asset list to a dense asset_counts-slot list
    (DecodeBatchWitness tail, utils.go:723-740)."""
    from ..utils.types import AccountAsset
    n = asset_counts or C.ASSET_COUNTS
    for op in wit.create_user_ops:
        dense = [AccountAsset(index=p) for p in range(n)]
        for a in op.assets:
            dense[a.index] = a
        op.assets = dense
