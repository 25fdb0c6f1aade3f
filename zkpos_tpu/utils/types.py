"""Domain types — parity with reference src/utils/types.go."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from . import constants as C
from .constants import MAX_TIER_BOUNDARY_VALUE


@dataclass
class TierRatio:                       # types.go:5-9
    boundary_value: int = 0            # *big.Int
    ratio: int = 0                     # uint8 (percent)
    precomputed_value: int = 0         # *big.Int


@dataclass
class CexAssetInfo:                    # types.go:11-23
    total_equity: int = 0
    total_debt: int = 0
    base_price: int = 0
    symbol: str = ""
    index: int = 0
    loan_collateral: int = 0
    margin_collateral: int = 0
    portfolio_margin_collateral: int = 0
    loan_ratios: List[TierRatio] = field(default_factory=list)
    margin_ratios: List[TierRatio] = field(default_factory=list)
    portfolio_margin_ratios: List[TierRatio] = field(default_factory=list)


@dataclass
class AccountAsset:                    # types.go:25-32
    index: int = 0                     # uint16
    equity: int = 0
    debt: int = 0
    loan: int = 0
    margin: int = 0
    portfolio_margin: int = 0


@dataclass
class AccountInfo:                     # types.go:34-41
    account_index: int = 0
    account_id: bytes = b""            # 32-byte fr marshal
    total_equity: int = 0
    total_debt: int = 0
    total_collateral: int = 0
    assets: List[AccountAsset] = field(default_factory=list)


@dataclass
class CreateUserOperation:             # types.go:43-48
    assets: List[AccountAsset] = field(default_factory=list)
    account_index: int = 0
    account_id_hash: bytes = b""
    account_proof: List[bytes] = field(default_factory=list)  # depth entries


@dataclass
class BatchCreateUserWitness:          # types.go:50-60
    batch_commitment: bytes = b""
    account_tree_root: bytes = b""
    before_cex_assets_commitment: bytes = b""
    after_cex_assets_commitment: bytes = b""
    min_account_index: int = 0
    max_account_index: int = 0
    before_cex_assets: List[CexAssetInfo] = field(default_factory=list)
    create_user_ops: List[CreateUserOperation] = field(default_factory=list)


def is_asset_empty(a: AccountAsset) -> bool:   # utils.go:111-116
    return (a.debt == 0 and a.equity == 0 and a.margin == 0
            and a.portfolio_margin == 0 and a.loan == 0)


def empty_tier_ratios() -> List[TierRatio]:
    """Padding tiers (utils.go:348-369 with empty input)."""
    return [TierRatio(boundary_value=MAX_TIER_BOUNDARY_VALUE, ratio=0,
                      precomputed_value=0) for _ in range(C.TIER_COUNT)]
