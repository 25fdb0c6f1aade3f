"""Domain constants — parity with reference src/utils/constants.go.

Includes the `ZKPOR_TEST_TIERS` environment override (constants.go:130-142),
the small-circuit affordance that makes full-pipeline tests tractable.
"""

from __future__ import annotations

import os

ACCOUNT_TREE_DEPTH = 28          # constants.go:18
ASSET_COUNTS = 500               # constants.go:19
TIER_COUNT = 12                  # constants.go:21 (must be even)


def configure(asset_counts=None, tier_count=None, tree_depth=None):
    """Test-size override (framework extension beyond the reference's
    ZKPOR_TEST_TIERS): shrink the asset universe / tier table / tree depth
    so full keygen->prove->verify runs are tractable in CI.  Production
    defaults match the reference exactly."""
    global ASSET_COUNTS, TIER_COUNT, ACCOUNT_TREE_DEPTH
    if asset_counts is not None:
        ASSET_COUNTS = asset_counts
    if tier_count is not None:
        if tier_count % 2:
            raise ValueError("tier_count must be even")
        TIER_COUNT = tier_count
    if tree_depth is not None:
        ACCOUNT_TREE_DEPTH = tree_depth
R1CS_BATCH_SIZE = 1_000_000      # constants.go:22

PERCENTAGE_MULTIPLIER = 100
MAX_TIER_BOUNDARY_VALUE = 2 ** 118          # constants.go:29
UINT64_MAX_VALUE = 1 << 64
UINT64_MAX_VALUE_SQUARE = 1 << 128
UINT8_MAX_VALUE = 1 << 8
UINT16_MAX_VALUE = 1 << 16
UINT126_MAX_VALUE = 1 << 126
UINT134_MAX_VALUE = 1 << 134

# tokens quoted with 2-digit precision (constants.go:45-100)
ASSET_TYPE_FOR_TWO_DIGITS = {
    s.lower() for s in [
        "BTTC", "SHIB", "LUNC", "XEC", "WIN", "BIDR", "SPELL", "HOT", "DOGE",
        "PEPE", "FLOKI", "IDRT", "DOGS", "BONK", "1000SATS", "NEIRO",
        "1000PEPPER", "NOT", "NFT", "BOME", "1MBABYDOGE", "HMSTR", "WLFI",
        "PUMP", "MONKY", "1000CHEEMS", "IDR",
    ]
}

# one Fr element stores 15 16-bit asset ids (constants.go:109-119)
POWERS_OF_SIXTEEN_BITS = [1 << (16 * i) for i in range(15)]

DEFAULT_TIERS = {500: 200, 50: 1380}         # constants.go:103-106


def parse_tiers(s: str) -> dict:
    """Parse "500:4,50:20" into {assets: batch_ops} (constants.go:146-164)."""
    result = {}
    for pair in s.split(","):
        parts = pair.strip().split(":", 1)
        if len(parts) != 2:
            raise ValueError(f"invalid tier pair: {pair!r}")
        result[int(parts[0].strip())] = int(parts[1].strip())
    return result


def get_tiers() -> dict:
    """Active tier config, honoring ZKPOR_TEST_TIERS."""
    env = os.environ.get("ZKPOR_TEST_TIERS", "").strip()
    if env:
        return parse_tiers(env)
    return dict(DEFAULT_TIERS)


def get_asset_counts_tiers() -> list:
    return sorted(get_tiers().keys())


def nil_account_hash_int() -> int:
    """NilAccountHash = Poseidon(0,0,0,0,0) (constants.go:125-127)."""
    from ..crypto.poseidon_ref import poseidon
    return poseidon([0, 0, 0, 0, 0])
