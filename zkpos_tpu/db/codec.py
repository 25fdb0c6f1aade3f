"""Batch-witness blob codec.

Reference: gob encode -> s2 compress -> base64 (witness.go:219-228),
decoded by DecodeBatchWitness (utils.go:704-742) which re-expands each op's
sparse asset list into a dense AssetCounts-slot array.

gob is Go-specific; this framework uses a documented equivalent:
JSON -> zlib -> base64, with the same sparse-assets storage convention and
the same densify-on-decode step.  (A decoder for reference-produced gob
blobs is a planned import path; see COMPAT.md.)
"""

from __future__ import annotations

import base64
import json
import zlib
from typing import List

from ..utils import constants as C
from ..utils.types import (AccountAsset, BatchCreateUserWitness, CexAssetInfo,
                           CreateUserOperation, TierRatio, is_asset_empty)

_B64 = "ascii"


def _tier_list(ratios: List[TierRatio]) -> list:
    return [[str(t.boundary_value), t.ratio, str(t.precomputed_value)]
            for t in ratios]


def _tier_parse(data: list) -> List[TierRatio]:
    return [TierRatio(boundary_value=int(b), ratio=r,
                      precomputed_value=int(p)) for b, r, p in data]


def encode_batch_witness(w: BatchCreateUserWitness) -> str:
    obj = {
        "bc": base64.b64encode(w.batch_commitment).decode(_B64),
        "rt": base64.b64encode(w.account_tree_root).decode(_B64),
        "b4": base64.b64encode(w.before_cex_assets_commitment).decode(_B64),
        "af": base64.b64encode(w.after_cex_assets_commitment).decode(_B64),
        "mn": w.min_account_index,
        "mx": w.max_account_index,
        "cex": [{
            "te": a.total_equity, "td": a.total_debt, "bp": a.base_price,
            "sy": a.symbol, "ix": a.index, "lc": a.loan_collateral,
            "mc": a.margin_collateral, "pc": a.portfolio_margin_collateral,
            "lr": _tier_list(a.loan_ratios), "mr": _tier_list(a.margin_ratios),
            "pr": _tier_list(a.portfolio_margin_ratios),
        } for a in w.before_cex_assets],
        "ops": [{
            "ai": op.account_index,
            "id": base64.b64encode(op.account_id_hash).decode(_B64),
            "pf": [base64.b64encode(p).decode(_B64)
                   for p in op.account_proof],
            # sparse: only non-empty assets stored (utils.go:735-739)
            "as": [[a.index, a.equity, a.debt, a.loan, a.margin,
                    a.portfolio_margin]
                   for a in op.assets if not is_asset_empty(a)],
        } for op in w.create_user_ops],
    }
    raw = json.dumps(obj, separators=(",", ":")).encode()
    return base64.b64encode(zlib.compress(raw, 6)).decode(_B64)


def decode_batch_witness(data: str,
                         asset_counts: int | None = None
                         ) -> BatchCreateUserWitness:
    """Decode + densify (utils.go:704-742)."""
    n_assets = asset_counts or C.ASSET_COUNTS
    obj = json.loads(zlib.decompress(base64.b64decode(data)))
    w = BatchCreateUserWitness(
        batch_commitment=base64.b64decode(obj["bc"]),
        account_tree_root=base64.b64decode(obj["rt"]),
        before_cex_assets_commitment=base64.b64decode(obj["b4"]),
        after_cex_assets_commitment=base64.b64decode(obj["af"]),
        min_account_index=obj["mn"],
        max_account_index=obj["mx"])
    for a in obj["cex"]:
        w.before_cex_assets.append(CexAssetInfo(
            total_equity=a["te"], total_debt=a["td"], base_price=a["bp"],
            symbol=a["sy"], index=a["ix"], loan_collateral=a["lc"],
            margin_collateral=a["mc"], portfolio_margin_collateral=a["pc"],
            loan_ratios=_tier_parse(a["lr"]),
            margin_ratios=_tier_parse(a["mr"]),
            portfolio_margin_ratios=_tier_parse(a["pr"])))
    for o in obj["ops"]:
        dense = [AccountAsset(index=p) for p in range(n_assets)]
        for (ix, eq, de, lo, ma, pm) in o["as"]:
            dense[ix] = AccountAsset(index=ix, equity=eq, debt=de, loan=lo,
                                     margin=ma, portfolio_margin=pm)
        w.create_user_ops.append(CreateUserOperation(
            assets=dense,
            account_index=o["ai"],
            account_id_hash=base64.b64decode(o["id"]),
            account_proof=[base64.b64decode(p) for p in o["pf"]]))
    return w
