"""BatchCreateUserCircuit — port of reference circuit/batch_create_user_circuit.go.

Semantics are constraint-for-constraint equivalent to Define()
(batch_create_user_circuit.go:98-323) and the helper gadgets in
circuit/utils.go; lookup tables use the mux encoding from .gadgets.

The circuit proves, per batch of account creations:
  (a) min/max account index match first/last op (:100-101);
  (b) BatchCommitment = Poseidon(root, beforeCEX, afterCEX, min, max) (:104);
  (c) before-CEX commitment correctness + 64-bit ranges (:113-130);
  (d) tier-ratio precomputed-value arithmetic + monotonicity (utils.go:83-101);
  (e) per user: index continuity, asset uniqueness, asset-id hash, per-field
      lookups, collateral <= equity, tier haircut evaluation, debt <=
      collateral, leaf hash + Merkle inclusion against the shared root;
  (f) random-linear-combination subset binding of the per-user sparse asset
      list to the dense 500-wide update vector (:275-307);
  (g) after-CEX commitment correctness (:308-322).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..utils import constants as C
from ..utils.types import BatchCreateUserWitness
from ..crypto.bn254 import R as MOD, fr_from_bytes
from .cs import LC, ConstraintSystem
from .gadgets import LookupTable, poseidon_gadget


# --- assignment structures (plain ints; None in compile mode) ----------------

@dataclass
class TierRatioW:
    boundary_value: Optional[int] = None
    ratio: Optional[int] = None
    precomputed_value: Optional[int] = None


@dataclass
class CexAssetInfoW:
    total_equity: Optional[int] = None
    total_debt: Optional[int] = None
    base_price: Optional[int] = None
    loan_collateral: Optional[int] = None
    margin_collateral: Optional[int] = None
    portfolio_margin_collateral: Optional[int] = None
    loan_ratios: List[TierRatioW] = field(default_factory=list)
    margin_ratios: List[TierRatioW] = field(default_factory=list)
    portfolio_margin_ratios: List[TierRatioW] = field(default_factory=list)


@dataclass
class UserAssetInfoW:
    asset_index: Optional[int] = None
    loan_collateral_index: Optional[int] = None
    loan_collateral_flag: Optional[int] = None
    margin_collateral_index: Optional[int] = None
    margin_collateral_flag: Optional[int] = None
    portfolio_margin_collateral_index: Optional[int] = None
    portfolio_margin_collateral_flag: Optional[int] = None


@dataclass
class UserAssetMetaW:
    equity: Optional[int] = None
    debt: Optional[int] = None
    loan_collateral: Optional[int] = None
    margin_collateral: Optional[int] = None
    portfolio_margin_collateral: Optional[int] = None


@dataclass
class CreateUserOperationW:
    assets: List[UserAssetInfoW] = field(default_factory=list)
    assets_for_update_cex: List[UserAssetMetaW] = field(default_factory=list)
    account_index: Optional[int] = None
    account_id_hash: Optional[int] = None
    account_proof: List[Optional[int]] = field(default_factory=list)


@dataclass
class BatchCreateUserCircuitW:
    batch_commitment: Optional[int] = None
    account_tree_root: Optional[int] = None
    before_cex_assets_commitment: Optional[int] = None
    after_cex_assets_commitment: Optional[int] = None
    min_account_index: Optional[int] = None
    max_account_index: Optional[int] = None
    before_cex_assets: List[CexAssetInfoW] = field(default_factory=list)
    create_user_ops: List[CreateUserOperationW] = field(default_factory=list)


def new_empty_assignment(user_asset_counts: int, all_asset_counts: int,
                         batch_counts: int,
                         tier_count: int | None = None,
                         tree_depth: int | None = None
                         ) -> BatchCreateUserCircuitW:
    """Shape-only assignment (NewBatchCreateUserCircuit, :28-96)."""
    tier_count = C.TIER_COUNT if tier_count is None else tier_count
    tree_depth = C.ACCOUNT_TREE_DEPTH if tree_depth is None else tree_depth
    z = 0
    w = BatchCreateUserCircuitW(
        batch_commitment=z, account_tree_root=z,
        before_cex_assets_commitment=z, after_cex_assets_commitment=z,
        min_account_index=z, max_account_index=z)
    for _ in range(all_asset_counts):
        w.before_cex_assets.append(CexAssetInfoW(
            z, z, z, z, z, z,
            [TierRatioW(z, z, z) for _ in range(tier_count)],
            [TierRatioW(z, z, z) for _ in range(tier_count)],
            [TierRatioW(z, z, z) for _ in range(tier_count)]))
    for _ in range(batch_counts):
        op = CreateUserOperationW(
            assets=[UserAssetInfoW(j, z, z, z, z, z, z)
                    for j in range(user_asset_counts)],
            assets_for_update_cex=[UserAssetMetaW(z, z, z, z, z)
                                   for _ in range(all_asset_counts)],
            account_index=z, account_id_hash=z,
            account_proof=[z] * tree_depth)
        w.create_user_ops.append(op)
    return w


# --- gadget helpers (circuit/utils.go ports) ---------------------------------

def _integer_division_hint(ins):
    """circuit/utils.go:103-110."""
    dividend, divisor = ins
    return [dividend // divisor, dividend % divisor]


_integer_division_hint._native = ("divmod",)


def _check_and_get_integer_division_res(cs, dividend):
    """circuit/utils.go:166-177 (divide by PercentageMultiplier=100)."""
    q, rem = cs.new_hint(_integer_division_hint, 2, dividend,
                         C.PERCENTAGE_MULTIPLIER)
    cs.range_check(q, 128)
    cs.range_check(rem, 8)
    cs.assert_is_equal(cs.cmp_nop(rem, C.PERCENTAGE_MULTIPLIER, 8, True),
                       MOD - 1)
    cs.assert_is_equal(cs.add(cs.scale(q, C.PERCENTAGE_MULTIPLIER), rem),
                       dividend)
    return q


def _generate_rapid_arithmetic_for_collateral(cs, ratios):
    """circuit/utils.go:83-101 — recompute PrecomputedValue in-circuit and
    constrain monotone boundaries / 8-bit ratios."""
    ratios[0]["precomputed"] = _check_and_get_integer_division_res(
        cs, cs.mul(ratios[0]["boundary"], ratios[0]["ratio"]))
    cs.assert_is_less_or_equal_nop(ratios[0]["ratio"],
                                   C.PERCENTAGE_MULTIPLIER, 8, True)
    cs.assert_is_less_or_equal_nop(ratios[0]["boundary"],
                                   C.MAX_TIER_BOUNDARY_VALUE, 128, True)
    for i in range(1, len(ratios)):
        cs.assert_is_less_or_equal_nop(ratios[i - 1]["boundary"],
                                       ratios[i]["boundary"], 128, True)
        cs.assert_is_less_or_equal_nop(ratios[i]["ratio"],
                                       C.PERCENTAGE_MULTIPLIER, 8, True)
        cs.assert_is_less_or_equal_nop(ratios[i]["boundary"],
                                       C.MAX_TIER_BOUNDARY_VALUE, 128, True)
        diff = cs.sub(ratios[i]["boundary"], ratios[i - 1]["boundary"])
        cur = _check_and_get_integer_division_res(
            cs, cs.mul(diff, ratios[i]["ratio"]))
        ratios[i]["precomputed"] = cs.add(ratios[i - 1]["precomputed"], cur)
    for r in ratios:
        cs.range_check(r["precomputed"], 128)
        cs.range_check(r["ratio"], 8)
        cs.range_check(r["boundary"], 128)


def _get_and_check_tier_ratios_query_results(
        cs, table, asset_index, user_collateral, collateral_index,
        collateral_flag, asset_price, tier_ratios_len, max_tier_index):
    """circuit/utils.go:112-164."""
    cs.assert_is_less_or_equal_nop(collateral_index, max_tier_index, 4)
    cs.assert_is_boolean(collateral_flag)
    cs.assert_is_equal(
        cs.mul(collateral_flag, cs.sub(collateral_index, max_tier_index)), 0)

    gap = cs.mul(asset_index, tier_ratios_len)
    collateral_value = cs.mul(user_collateral, asset_price)
    cs.assert_is_equal(
        cs.mul(cs.is_zero(collateral_value), collateral_index), 0)

    queries = []
    idx = collateral_index
    for _ in range(2):
        start = cs.mul(idx, 3)
        queries.append(cs.add(start, gap))
        queries.append(cs.add(start, cs.add(gap, 1)))
        queries.append(cs.add(start, cs.add(gap, 2)))
        idx = cs.add(idx, 1)
    results = table.lookup(*queries)

    lower_diff = cs.sub(collateral_value, cs.add(results[0], 1))
    cs.range_check(cs.select(cs.is_zero(collateral_value), 0, lower_diff), 128)

    leq_diff = cs.sub(results[3], collateral_value)
    gt_diff = cs.sub(collateral_value, cs.add(results[3], 1))
    cs.range_check(cs.select(collateral_flag, gt_diff, leq_diff), 128)

    max_boundary_diff = cs.sub(C.MAX_TIER_BOUNDARY_VALUE, collateral_value)
    cs.range_check(cs.select(collateral_flag, max_boundary_diff, 0), 128)

    diff_value = cs.mul(cs.sub(collateral_value, results[0]), results[4])
    quotient = _check_and_get_integer_division_res(cs, diff_value)
    return cs.select(cs.is_zero(collateral_flag),
                     cs.add(results[2], quotient), results[5])


def _construct_tier_ratios_lookup_table(cs, cex_assets, kind):
    """circuit/utils.go:179-225: 3 dummy zeros then (boundary, ratio,
    precomputed) per tier, per asset."""
    t = LookupTable(cs)
    for asset in cex_assets:
        for _ in range(3):
            t.insert(0)
        for r in asset[kind]:
            t.insert(r["boundary"])
            t.insert(r["ratio"])
            t.insert(r["precomputed"])
    return t


def _compute_user_assets_commitment(cs, flat):
    """circuit/utils.go:28-49 — pack 3 values per element, weights
    2^128/2^64/1."""
    n_eles = (len(flat) + 2) // 3
    quotient = len(flat) // 3
    remainder = len(flat) % 3
    tmp = []
    for i in range(quotient):
        tmp.append(cs.add(cs.scale(flat[3 * i], C.UINT64_MAX_VALUE_SQUARE),
                          cs.scale(flat[3 * i + 1], C.UINT64_MAX_VALUE),
                          flat[3 * i + 2]))
    if remainder:
        last = LC()
        for i in range(remainder):
            last = cs.add(cs.scale(last, C.UINT64_MAX_VALUE),
                          flat[3 * quotient + i])
        for _ in range(remainder, 3):
            last = cs.scale(last, C.UINT64_MAX_VALUE)
        tmp.append(last)
    assert len(tmp) == n_eles
    return poseidon_gadget(cs, tmp)


def _verify_merkle_proof(cs, root, node, proof, helper):
    """circuit/utils.go:12-21."""
    for p, h in zip(proof, helper):
        cs.assert_is_boolean(h)
        d1 = cs.select(h, p, node)
        d2 = cs.select(h, node, p)
        node = poseidon_gadget(cs, [d1, d2])
    cs.assert_is_equal(root, node)


def _variable_count_of_cex_asset(tier_count: int) -> int:
    return 2 + 3 * (tier_count // 2)


def _fill_cex_asset_commitment(cs, asset, index, counts, commitments):
    """circuit/utils.go:62-81."""
    commitments[index * counts] = cs.add(
        cs.scale(asset["total_equity"], C.UINT64_MAX_VALUE_SQUARE),
        cs.scale(asset["total_debt"], C.UINT64_MAX_VALUE),
        asset["base_price"])
    commitments[index * counts + 1] = cs.add(
        cs.scale(asset["loan_collateral"], C.UINT64_MAX_VALUE_SQUARE),
        cs.scale(asset["margin_collateral"], C.UINT64_MAX_VALUE),
        asset["portfolio_margin_collateral"])
    pos = index * counts + 2
    for kind in ("loan_ratios", "margin_ratios", "portfolio_margin_ratios"):
        ratios = asset[kind]
        for i in range(0, len(ratios), 2):
            v = cs.add(ratios[i]["ratio"],
                       cs.scale(ratios[i]["boundary"], C.UINT8_MAX_VALUE))
            v1 = cs.add(cs.scale(ratios[i + 1]["ratio"], C.UINT126_MAX_VALUE),
                        cs.scale(ratios[i + 1]["boundary"], C.UINT134_MAX_VALUE))
            commitments[pos] = cs.add(v, v1)
            pos += 1


# --- the circuit -------------------------------------------------------------

def define(cs: ConstraintSystem, w: BatchCreateUserCircuitW,
           tree_depth: int | None = None) -> None:
    """Allocate all variables (public first) and emit Define()'s constraints."""
    tree_depth = C.ACCOUNT_TREE_DEPTH if tree_depth is None else tree_depth
    tier_count = len(w.before_cex_assets[0].loan_ratios)

    batch_commitment = cs.new_public(w.batch_commitment)
    account_tree_root = cs.new_witness(w.account_tree_root)
    before_cex_comm = cs.new_witness(w.before_cex_assets_commitment)
    after_cex_comm = cs.new_witness(w.after_cex_assets_commitment)
    min_index = cs.new_witness(w.min_account_index)
    max_index = cs.new_witness(w.max_account_index)

    def alloc_ratios(ratios):
        return [{"boundary": cs.new_witness(r.boundary_value),
                 "ratio": cs.new_witness(r.ratio),
                 "precomputed": cs.new_witness(r.precomputed_value)}
                for r in ratios]

    before_cex = []
    for a in w.before_cex_assets:
        before_cex.append({
            "total_equity": cs.new_witness(a.total_equity),
            "total_debt": cs.new_witness(a.total_debt),
            "base_price": cs.new_witness(a.base_price),
            "loan_collateral": cs.new_witness(a.loan_collateral),
            "margin_collateral": cs.new_witness(a.margin_collateral),
            "portfolio_margin_collateral":
                cs.new_witness(a.portfolio_margin_collateral),
            "loan_ratios": alloc_ratios(a.loan_ratios),
            "margin_ratios": alloc_ratios(a.margin_ratios),
            "portfolio_margin_ratios": alloc_ratios(a.portfolio_margin_ratios),
        })

    ops = []
    for op in w.create_user_ops:
        ops.append({
            "assets": [{
                "asset_index": cs.new_witness(ua.asset_index),
                "loan_index": cs.new_witness(ua.loan_collateral_index),
                "loan_flag": cs.new_witness(ua.loan_collateral_flag),
                "margin_index": cs.new_witness(ua.margin_collateral_index),
                "margin_flag": cs.new_witness(ua.margin_collateral_flag),
                "pm_index":
                    cs.new_witness(ua.portfolio_margin_collateral_index),
                "pm_flag": cs.new_witness(ua.portfolio_margin_collateral_flag),
            } for ua in op.assets],
            "update": [{
                "equity": cs.new_witness(m.equity),
                "debt": cs.new_witness(m.debt),
                "loan": cs.new_witness(m.loan_collateral),
                "margin": cs.new_witness(m.margin_collateral),
                "pm": cs.new_witness(m.portfolio_margin_collateral),
            } for m in op.assets_for_update_cex],
            "account_index": cs.new_witness(op.account_index),
            "account_id_hash": cs.new_witness(op.account_id_hash),
            "proof": [cs.new_witness(p) for p in op.account_proof],
        })

    # ---- Define() body ----

    # (a) :100-101
    cs.assert_is_equal(min_index, ops[0]["account_index"])
    cs.assert_is_equal(max_index, ops[-1]["account_index"])

    # (b) :104-105
    actual_batch = poseidon_gadget(cs, [
        account_tree_root, before_cex_comm, after_cex_comm,
        min_index, max_index])
    cs.assert_is_equal(batch_commitment, actual_batch)

    counts = _variable_count_of_cex_asset(tier_count)
    cex_commit_vars: List[Optional[LC]] = [None] * (len(before_cex) * counts)
    after_cex = []

    # (c)+(d) :110-128
    asset_price_table = LookupTable(cs)
    for i, asset in enumerate(before_cex):
        for k in ("total_equity", "total_debt", "base_price",
                  "loan_collateral", "margin_collateral",
                  "portfolio_margin_collateral"):
            cs.range_check(asset[k], 64)
        _fill_cex_asset_commitment(cs, asset, i, counts, cex_commit_vars)
        _generate_rapid_arithmetic_for_collateral(cs, asset["loan_ratios"])
        _generate_rapid_arithmetic_for_collateral(cs, asset["margin_ratios"])
        _generate_rapid_arithmetic_for_collateral(
            cs, asset["portfolio_margin_ratios"])
        after_cex.append({k: asset[k] for k in (
            "total_equity", "total_debt", "loan_collateral",
            "margin_collateral", "portfolio_margin_collateral")})
        asset_price_table.insert(asset["base_price"])

    actual_cex_comm = poseidon_gadget(cs, cex_commit_vars)
    cs.assert_is_equal(before_cex_comm, actual_cex_comm)

    # (e) tables :132-134
    loan_table = _construct_tier_ratios_lookup_table(cs, before_cex,
                                                     "loan_ratios")
    margin_table = _construct_tier_ratios_lookup_table(cs, before_cex,
                                                       "margin_ratios")
    pm_table = _construct_tier_ratios_lookup_table(
        cs, before_cex, "portfolio_margin_ratios")

    user_asset_id_hashes = []
    user_assets_queries = []
    user_assets_results = []
    flat_tier_len = 3 * (tier_count + 1)

    for i, op in enumerate(ops):
        if i > 0:
            cs.assert_is_equal(op["account_index"],
                               cs.add(ops[i - 1]["account_index"], 1))
        helper = cs.to_binary(op["account_index"], tree_depth)

        total_equity = LC()
        total_debt = LC()
        total_collateral_real = LC()
        user_assets = op["assets"]

        # per-user lookup table of the dense update vector :154-161
        user_table = LookupTable(cs)
        for m in op["update"]:
            for k in ("equity", "debt", "loan", "margin", "pm"):
                user_table.insert(m[k])

        # uniqueness via strict increase :165-170
        for j in range(len(user_assets) - 1):
            cs.range_check(user_assets[j]["asset_index"], 16)
            cr = cs.cmp_nop(user_assets[j + 1]["asset_index"],
                            user_assets[j]["asset_index"], 16, True)
            cs.assert_is_equal(cr, 1)
        cs.range_check(user_assets[-1]["asset_index"], 16)

        # asset-id packing 15 per var :173-181
        id_vars = []
        for j in range((len(user_assets) + 14) // 15):
            v = LC()
            for p in range(j * 15, min((j + 1) * 15, len(user_assets))):
                v = cs.add(v, cs.scale(user_assets[p]["asset_index"],
                                       C.POWERS_OF_SIXTEEN_BITS[p % 15]))
            id_vars.append(v)
        user_asset_id_hashes.append(poseidon_gadget(cs, id_vars))

        # queries :184-196
        queries = []
        price_queries = []
        for ua in user_assets:
            p = cs.mul(ua["asset_index"], 5)
            for k in range(5):
                queries.append(cs.add(p, k))
            price_queries.append(ua["asset_index"])
        results = user_table.lookup(*queries)
        prices = asset_price_table.lookup(*price_queries)
        user_assets_queries.append(queries)
        user_assets_results.append(results)

        flat_for_hash = []
        for j, ua in enumerate(user_assets):
            equity = results[j * 5]
            debt = results[j * 5 + 1]
            loan = results[j * 5 + 2]
            margin = results[j * 5 + 3]
            pm = results[j * 5 + 4]
            for v in (equity, debt, loan, margin, pm):
                cs.range_check(v, 64)
            flat_for_hash += [ua["asset_index"], equity, debt, loan,
                              margin, pm]

            asset_total_collateral = cs.add(loan, margin, pm)
            cs.range_check(asset_total_collateral, 64)
            cs.assert_is_less_or_equal_nop(asset_total_collateral, equity,
                                           64, True)

            loan_real = _get_and_check_tier_ratios_query_results(
                cs, loan_table, ua["asset_index"], loan, ua["loan_index"],
                ua["loan_flag"], prices[j], flat_tier_len, tier_count - 1)
            margin_real = _get_and_check_tier_ratios_query_results(
                cs, margin_table, ua["asset_index"], margin,
                ua["margin_index"], ua["margin_flag"], prices[j],
                flat_tier_len, tier_count - 1)
            pm_real = _get_and_check_tier_ratios_query_results(
                cs, pm_table, ua["asset_index"], pm, ua["pm_index"],
                ua["pm_flag"], prices[j], flat_tier_len, tier_count - 1)

            total_collateral_real = cs.add(total_collateral_real, loan_real,
                                           margin_real, pm_real)
            total_equity = cs.add(total_equity, cs.mul(equity, prices[j]))
            total_debt = cs.add(total_debt, cs.mul(debt, prices[j]))

        # CEX running totals :257-263
        for j, m in enumerate(op["update"]):
            after_cex[j]["total_equity"] = cs.add(
                after_cex[j]["total_equity"], m["equity"])
            after_cex[j]["total_debt"] = cs.add(
                after_cex[j]["total_debt"], m["debt"])
            after_cex[j]["loan_collateral"] = cs.add(
                after_cex[j]["loan_collateral"], m["loan"])
            after_cex[j]["margin_collateral"] = cs.add(
                after_cex[j]["margin_collateral"], m["margin"])
            after_cex[j]["portfolio_margin_collateral"] = cs.add(
                after_cex[j]["portfolio_margin_collateral"], m["pm"])

        # :266-272
        cs.range_check(total_debt, 128)
        cs.range_check(total_collateral_real, 128)
        cs.assert_is_less_or_equal_nop(total_debt, total_collateral_real,
                                       128, True)
        user_commit = _compute_user_assets_commitment(cs, flat_for_hash)
        account_hash = poseidon_gadget(cs, [
            op["account_id_hash"], total_equity, total_debt,
            total_collateral_real, user_commit])
        _verify_merkle_proof(cs, account_tree_root, account_hash,
                             op["proof"], helper)

    # (f) RLC subset check :275-307
    user_asset_id_hashes.append(batch_commitment)
    random_challenge = poseidon_gadget(cs, user_asset_id_hashes)
    n_powers = 5 * len(before_cex)
    powers = [random_challenge]
    powers_table = LookupTable(cs)
    powers_table.insert(random_challenge)
    for _ in range(1, n_powers):
        powers.append(cs.mul(powers[-1], random_challenge))
        powers_table.insert(powers[-1])

    for i, op in enumerate(ops):
        rc_results = powers_table.lookup(*user_assets_queries[i])
        sum_a = LC()
        for r, res in zip(rc_results, user_assets_results[i]):
            sum_a = cs.add(sum_a, cs.mul(r, res))
        sum_b = LC()
        for j, m in enumerate(op["update"]):
            sum_b = cs.add(sum_b, cs.mul(m["equity"], powers[5 * j]))
            sum_b = cs.add(sum_b, cs.mul(m["debt"], powers[5 * j + 1]))
            sum_b = cs.add(sum_b, cs.mul(m["loan"], powers[5 * j + 2]))
            sum_b = cs.add(sum_b, cs.mul(m["margin"], powers[5 * j + 3]))
            sum_b = cs.add(sum_b, cs.mul(m["pm"], powers[5 * j + 4]))
        cs.assert_is_equal(sum_a, sum_b)

    # (g) :308-322
    tmp_after = [None] * (len(before_cex) * counts)
    for j, a in enumerate(after_cex):
        for k in ("total_equity", "total_debt", "loan_collateral",
                  "margin_collateral", "portfolio_margin_collateral"):
            cs.range_check(a[k], 64)
        full = dict(before_cex[j])
        full.update(a)
        _fill_cex_asset_commitment(cs, full, j, counts, tmp_after)
    actual_after = poseidon_gadget(cs, tmp_after)
    cs.assert_is_equal(actual_after, after_cex_comm)


def input_vector(w: BatchCreateUserCircuitW) -> List[int]:
    """Flatten an assignment into input-wire values in EXACTLY define()'s
    allocation order (public first).  Feeds the native two-pass solver
    (circuit/solver_native.py) without re-running the circuit in Python;
    tests assert parity against the eager solve."""
    out: List[int] = [w.batch_commitment, w.account_tree_root,
                      w.before_cex_assets_commitment,
                      w.after_cex_assets_commitment,
                      w.min_account_index, w.max_account_index]
    for a in w.before_cex_assets:
        out += [a.total_equity, a.total_debt, a.base_price,
                a.loan_collateral, a.margin_collateral,
                a.portfolio_margin_collateral]
        for ratios in (a.loan_ratios, a.margin_ratios,
                       a.portfolio_margin_ratios):
            for r in ratios:
                out += [r.boundary_value, r.ratio, r.precomputed_value]
    for op in w.create_user_ops:
        for ua in op.assets:
            out += [ua.asset_index,
                    ua.loan_collateral_index, ua.loan_collateral_flag,
                    ua.margin_collateral_index, ua.margin_collateral_flag,
                    ua.portfolio_margin_collateral_index,
                    ua.portfolio_margin_collateral_flag]
        for m in op.assets_for_update_cex:
            out += [m.equity, m.debt, m.loan_collateral,
                    m.margin_collateral, m.portfolio_margin_collateral]
        out += [op.account_index, op.account_id_hash]
        out += list(op.account_proof)
    return out


# --- witness adapter (SetBatchCreateUserCircuitWitness, :334-436) ------------

def _calc_collateral_info(price: int, amount: int, ratios) -> tuple:
    """circuit/utils.go:227-278 (one collateral kind)."""
    value = amount * price
    for i, r in enumerate(ratios):
        if value <= r.boundary_value:
            return i, 0
    return len(ratios) - 1, 1


def set_batch_create_user_circuit_witness(
        bw: BatchCreateUserWitness) -> BatchCreateUserCircuitW:
    from ..utils.types import is_asset_empty
    from ..utils.commitments import get_non_empty_assets_count_of_user

    w = BatchCreateUserCircuitW(
        batch_commitment=fr_from_bytes(bw.batch_commitment),
        account_tree_root=fr_from_bytes(bw.account_tree_root),
        before_cex_assets_commitment=fr_from_bytes(
            bw.before_cex_assets_commitment),
        after_cex_assets_commitment=fr_from_bytes(
            bw.after_cex_assets_commitment),
        min_account_index=bw.min_account_index,
        max_account_index=bw.max_account_index)

    for a in bw.before_cex_assets:
        w.before_cex_assets.append(CexAssetInfoW(
            a.total_equity, a.total_debt, a.base_price,
            a.loan_collateral, a.margin_collateral,
            a.portfolio_margin_collateral,
            [TierRatioW(r.boundary_value, r.ratio, r.precomputed_value)
             for r in a.loan_ratios],
            [TierRatioW(r.boundary_value, r.ratio, r.precomputed_value)
             for r in a.margin_ratios],
            [TierRatioW(r.boundary_value, r.ratio, r.precomputed_value)
             for r in a.portfolio_margin_ratios]))

    cex_count = len(bw.before_cex_assets)
    target = get_non_empty_assets_count_of_user(bw.create_user_ops[0].assets)

    for src in bw.create_user_ops:
        op = CreateUserOperationW(
            account_index=src.account_index,
            account_id_hash=fr_from_bytes(src.account_id_hash),
            account_proof=[fr_from_bytes(p) for p in src.account_proof])
        # dense update vector (assets come densified from the witness codec)
        op.assets_for_update_cex = [UserAssetMetaW(0, 0, 0, 0, 0)
                                    for _ in range(cex_count)]
        existing = []
        for j, u in enumerate(src.assets):
            op.assets_for_update_cex[j] = UserAssetMetaW(
                u.equity, u.debt, u.loan, u.margin, u.portfolio_margin)
            if not is_asset_empty(u):
                existing.append(u.index)

        padding_counts = target - len(existing)
        assets: List[UserAssetInfoW] = []
        current_padding = 0
        current_index = 0
        for v in existing:
            if current_padding < padding_counts:
                for k in range(current_index, v):
                    current_padding += 1
                    assets.append(UserAssetInfoW(k, 0, 0, 0, 0, 0, 0))
                    if current_padding >= padding_counts:
                        break
            u = src.assets[v]
            cex = bw.before_cex_assets[v]
            li, lf = _calc_collateral_info(cex.base_price, u.loan,
                                           cex.loan_ratios)
            mi, mf = _calc_collateral_info(cex.base_price, u.margin,
                                           cex.margin_ratios)
            pi, pf = _calc_collateral_info(cex.base_price, u.portfolio_margin,
                                           cex.portfolio_margin_ratios)
            assets.append(UserAssetInfoW(v, li, lf, mi, mf, pi, pf))
            current_index = v + 1
        while len(assets) < target:
            assets.append(UserAssetInfoW(current_index, 0, 0, 0, 0, 0, 0))
            current_index += 1
        op.assets = assets
        w.create_user_ops.append(op)
    return w
