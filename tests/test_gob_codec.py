"""gob + snappy/S2 codec tests — the reference witness wire format
(witness.go:219-228 / utils.go:704-742) implemented from the public
specs; exercised via format primitives, frozen vectors, and full
witness round-trips through the default encode path."""
import pytest

from zkpos_tpu.db import gob_codec as gc
from zkpos_tpu.db import s2py


# --- gob primitives -----------------------------------------------------------

def test_uint_encoding():
    # pkg.go.dev/encoding/gob: <=0x7f one byte; else -(byte count) + BE
    assert gc.put_uint(7) == b"\x07"
    assert gc.put_uint(0) == b"\x00"
    assert gc.put_uint(256) == b"\xfe\x01\x00"
    assert gc.put_uint(0xFF) == b"\xff\xff"
    for v in (0, 1, 127, 128, 255, 256, 2**16, 2**32 + 12345, 2**63):
        got, pos = gc._read_uint(gc.put_uint(v), 0)
        assert got == v and pos == len(gc.put_uint(v))


def test_int_encoding():
    # bit 0 is the complement flag: 7 -> 0x0e, -1 -> 0x01
    assert gc.put_int(7) == b"\x0e"
    assert gc.put_int(-1) == b"\x01"
    for v in (0, 1, -1, 64, -64, 2**40, -(2**40)):
        got, _ = gc._read_int(gc.put_int(v), 0)
        assert got == v


def test_doc_framing_vector():
    """The package doc's worked example: int 7 is sent as 03 04 00 0e
    (length 3, typeid 2 signed-encoded, zero byte, value 14)."""
    stream = bytes([0x03, 0x04, 0x00, 0x0E])
    assert gc.decode_stream(stream) == 7


def test_big_int_gob():
    # math/big/intmarsh.go: [version<<1|sign] + abs big-endian
    assert gc.big_int_gob(0) == b"\x02"
    assert gc.big_int_gob(255) == b"\x02\xff"
    assert gc.big_int_gob(-255) == b"\x03\xff"
    for v in (0, 1, -1, 2**130 + 7, -(2**64)):
        assert gc.big_int_ungob(gc.big_int_gob(v)) == v


def test_struct_stream_roundtrip_with_unknown_field_order():
    obj = {"BatchCommitment": b"\x01" * 32, "MinAccountIndex": 5,
           "MaxAccountIndex": 9, "BeforeCexAssets": [],
           "CreateUserOps": []}
    out = gc.decode_stream(gc.encode_stream(obj, 2, 4))
    assert out["BatchCommitment"] == b"\x01" * 32
    assert out["MinAccountIndex"] == 5 and out["MaxAccountIndex"] == 9
    # zero-valued fields are omitted on the wire (gob semantics)
    assert "AccountTreeRoot" not in out


def test_zero_big_int_field_is_encoded_not_omitted():
    """Go omits only nil *big.Int pointers; a non-nil big.Int holding 0 is
    sent as the 1-byte gob b'\\x02'.  Omitting it would leave the field nil
    on the Go side and nil-panic TierRatio consumers (reference utils.go:36,
    utils.go:671; ADVICE r3)."""
    obj = {"MinAccountIndex": 1,
           "BeforeCexAssets": [{
               "Symbol": "x", "Index": 0, "BasePrice": 1,
               "TotalEquity": 0, "TotalDebt": 0, "LoanCollateral": 0,
               "MarginCollateral": 0, "PortfolioMarginCollateral": 0,
               "LoanRatios": [{"BoundaryValue": 0, "Ratio": 0,
                               "PrecomputedValue": 0}] * 2,
               "MarginRatios": [{"BoundaryValue": 0, "Ratio": 0,
                                 "PrecomputedValue": 0}] * 2,
               "PortfolioMarginRatios": [{"BoundaryValue": 0, "Ratio": 0,
                                          "PrecomputedValue": 0}] * 2,
           }],
           "CreateUserOps": []}
    blob = gc.encode_stream(obj, 2, 4)
    out = gc.decode_stream(blob)
    tr = out["BeforeCexAssets"][0]["LoanRatios"][0]
    # decoded side sees the explicit zero values (fields present)
    assert tr["BoundaryValue"] == 0 and tr["PrecomputedValue"] == 0
    # and the wire carries the one-byte zero big.Int payloads
    assert b"\x01\x02" in blob     # len=1 prefix + version byte for 0


# --- snappy / s2 --------------------------------------------------------------

def test_snappy_roundtrip():
    for payload in (b"", b"a", b"abcd" * 100, bytes(range(256)) * 50,
                    b"\x00" * 10000, b"the quick brown fox " * 37):
        assert s2py.decompress(s2py.compress(payload)) == payload


def test_snappy_frozen_vector():
    # hand-assembled block: len 10, literal "snap", copy1(off=4, len=4),
    # literal "py"
    block = bytes([0x0A, 0x03 << 2]) + b"snap" + bytes(
        [0x01, 0x04]) + bytes([0x01 << 2]) + b"py"
    assert s2py.decompress(block) == b"snapsnappy"


def test_s2_repeat_ops():
    # S2 extension: copy1 with offset 0 repeats the last offset
    # (klauspost/compress/s2 emitRepeat encodings)
    block = bytes([0x18, 0x03 << 2]) + b"abcd"
    block += bytes([(4 << 2) | 1, 0x04])          # copy1 off=4 len=8
    block += bytes([(0 << 2) | 1, 0x00])          # repeat len 4
    block += bytes([(5 << 2) | 1, 0x00, 0x00])    # repeat len 0+8
    assert s2py.decompress(block) == b"abcd" * 6
    # repeat before any copy is corrupt
    bad = bytes([0x04, (0 << 2) | 1, 0x00])
    with pytest.raises(ValueError):
        s2py.decompress(bad)


def test_overlapping_copy():
    # RLE via overlap: literal "x" + copy(off=1, len=7)
    block = bytes([0x08, 0x00]) + b"x" + bytes([(3 << 2) | 1, 0x01])
    assert s2py.decompress(block) == b"x" * 8


# --- full witness through the default (reference-format) path ----------------

def _sample_witness(depth=4, tiers=2):
    from zkpos_tpu.utils.types import (AccountAsset, BatchCreateUserWitness,
                                       CexAssetInfo, CreateUserOperation,
                                       TierRatio)
    tr = [TierRatio(boundary_value=10**20, ratio=90,
                    precomputed_value=9 * 10**19),
          TierRatio(boundary_value=0, ratio=0, precomputed_value=0)]
    cex = [CexAssetInfo(total_equity=11, total_debt=3, base_price=10**8,
                        symbol="btc", index=0, loan_collateral=5,
                        margin_collateral=0,
                        portfolio_margin_collateral=2,
                        loan_ratios=list(tr), margin_ratios=list(tr),
                        portfolio_margin_ratios=list(tr)),
           CexAssetInfo(symbol="eth", index=1, base_price=2 * 10**8,
                        loan_ratios=list(tr), margin_ratios=list(tr),
                        portfolio_margin_ratios=list(tr))]
    ops = [CreateUserOperation(
        assets=[AccountAsset(index=0, equity=7, debt=1, loan=1,
                             margin=1, portfolio_margin=1),
                AccountAsset(index=1)],          # empty -> sparse-dropped
        account_index=4,
        account_id_hash=b"\x05" * 32,
        account_proof=[bytes([i] * 32) for i in range(depth)])]
    return BatchCreateUserWitness(
        batch_commitment=b"\xaa" * 32, account_tree_root=b"\xbb" * 32,
        before_cex_assets_commitment=b"\xcc" * 32,
        after_cex_assets_commitment=b"\xdd" * 32,
        min_account_index=4, max_account_index=4,
        before_cex_assets=cex, create_user_ops=ops)


def test_witness_gob_roundtrip():
    from zkpos_tpu.db.codec import (decode_batch_witness,
                                    encode_batch_witness)
    w = _sample_witness()
    blob = encode_batch_witness(w)
    out = decode_batch_witness(blob, asset_counts=2)
    assert out.batch_commitment == w.batch_commitment
    assert out.account_tree_root == w.account_tree_root
    assert out.min_account_index == 4 and out.max_account_index == 4
    assert len(out.before_cex_assets) == 2
    a0 = out.before_cex_assets[0]
    assert (a0.symbol, a0.total_equity, a0.loan_collateral) == ("btc", 11, 5)
    assert a0.loan_ratios[0].boundary_value == 10**20
    assert a0.loan_ratios[0].precomputed_value == 9 * 10**19
    op = out.create_user_ops[0]
    # densified to asset_counts slots, empty asset restored as default
    assert len(op.assets) == 2
    assert op.assets[0].equity == 7 and op.assets[1].equity == 0
    assert op.account_proof == w.create_user_ops[0].account_proof


def test_json_rows_still_decode():
    from zkpos_tpu.db.codec import (decode_batch_witness,
                                    encode_batch_witness_json)
    w = _sample_witness()
    out = decode_batch_witness(encode_batch_witness_json(w), asset_counts=2)
    assert out.batch_commitment == w.batch_commitment
    assert out.create_user_ops[0].assets[0].equity == 7
