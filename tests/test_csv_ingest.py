"""CSV ingestion tests against the reference's shipped sample data.

The decisive check: the golden user_config.json (reference README.md:160)
was produced from sample account id 0x6d — its TotalEquity/Debt/Collateral
must reproduce exactly from our parser + tier-haircut math.
"""
import json
import os

import pytest

from zkpos_tpu.utils import csv_ingest as ci

SAMPLEDIR = "/root/reference/src/sampledata"
GOLDEN = "/root/reference/src/verifier/config/user_config.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLEDIR), reason="reference sample data unavailable")


def test_parse_sample_dataset():
    accounts, cex_assets, invalid = ci.parse_user_data_set(SAMPLEDIR)
    # 4-asset users all land in the 50 tier
    assert set(accounts.keys()) == {50}
    assert len(accounts[50]) + invalid == 200
    assert invalid > 0
    assert len(cex_assets) == 500
    assert cex_assets[0].symbol == "btc"
    assert cex_assets[3].symbol == "shib"
    # shib is a two-digit token: price multiplier 1e14 (vs 1e8 for btc)
    import csv as _csv
    from decimal import Decimal
    with open(os.path.join(SAMPLEDIR, "cex_assets_info.csv")) as f:
        rows = list(_csv.reader(f))
    shib_price = next(r[1] for r in rows if r[0].lower() == "shib")
    assert cex_assets[3].base_price == int(Decimal(shib_price) * 10 ** 14)


def test_invalid_accounts_match_generator_design():
    """The sample generator (reference src/sampledata/generate_user_files.py:
    46-97) makes the FIRST invalid_num rows of each file invalid: 10 in
    file 0 (ids 0..9), 20 in file 1 (ids 100..119).  Our validation must
    reject exactly those accounts — same semantics as utils.go:599-633.

    (Note: the golden user_config.json was generated from an older random
    dataset — its id 0x6d row differs from the shipped CSVs — so totals
    cannot be cross-checked against it; see COMPAT.md.)"""
    accounts, _, invalid = ci.parse_user_data_set(SAMPLEDIR)
    assert invalid == 30
    valid_ids = {int.from_bytes(a.account_id, "big") for a in accounts[50]}
    expected = (set(range(10, 100)) | set(range(120, 200)))
    assert valid_ids == expected


def test_tier_ratio_parsing():
    tiers = ci.parse_tiers_ratio_from_str("[0-10000:100,10000-20000:90]")
    assert len(tiers) == 12
    assert tiers[0].boundary_value == 10000 * 10 ** 16
    assert tiers[0].ratio == 100
    assert tiers[0].precomputed_value == 10000 * 10 ** 16
    assert tiers[1].precomputed_value == \
        10000 * 10 ** 16 + (10000 * 10 ** 16 * 90) // 100
    # padding tiers carry the last precomputed value
    assert tiers[11].precomputed_value == tiers[1].precomputed_value
    assert tiers[11].ratio == 0

    with pytest.raises(ValueError):
        ci.parse_tiers_ratio_from_str("[10000-5000:90]")
