"""Golden-data tests for the Poseidon oracle implementation.

The authoritative offline oracle is the production-format user Merkle proof
shipped in the reference at src/verifier/config/user_config.json (also
reference README.md:160).  Its upper siblings are nil-subtree hashes, which
pins the 2-input node hash bit-exactly.
"""
import base64
import json
import os

import pytest

from zkpos_tpu.crypto import poseidon_ref as pr
from zkpos_tpu.crypto.bn254 import R, fr_to_bytes

GOLDEN = "/root/reference/src/verifier/config/user_config.json"


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference golden data not available")
    cfg = json.load(open(GOLDEN))
    cfg["_proof_ints"] = [int.from_bytes(base64.b64decode(p), "big")
                          for p in cfg["Proof"]]
    return cfg


def test_circomlib_vectors():
    # widely-published circomlib/iden3 vectors use digest = state[0]
    assert pr.permutation([0, 1])[0] == \
        18586133768512220936620570745912940619677854269274689475585506675881198879027
    assert pr.permutation([0, 1, 2])[0] == \
        7853200120776062878684798364095072458815029376092732009249414926327459813530


def test_iden3_wide_vectors():
    """go-iden3-crypto poseidon_test.go vectors for t = 4..7: proves the
    Grain-LFSR parameter generator is circomlib-faithful at EVERY width,
    not just the golden-pinned t=3 (see COMPAT.md round-3 campaign)."""
    assert pr.permutation([0, 1, 2, 3])[0] == \
        6542985608222806190361240322586112750744169038454362455181422643027100751666
    assert pr.permutation([0, 1, 2, 3, 4])[0] == \
        18821383157269793795438455681495246036402687001665670618754263018637548127333
    assert pr.permutation([0, 1, 2, 0, 0, 0])[0] == \
        1018317224307729531995786483840663576608797660851238720571059489595066344487
    assert pr.permutation([0, 1, 2, 3, 4, 5, 6])[0] == \
        20400040500897583745843009878988256314335038853985262692600694741116813247201


def test_node_hash_matches_reference_nil_chain(golden):
    """proof[i+1] == H2(proof[i], proof[i]) for all nil-subtree levels.

    12 consecutive 254-bit equalities — this is the bit-compat proof for the
    fork's 2-input Poseidon (digest = state[1])."""
    proof = golden["_proof_ints"]
    for i in range(15, 27):
        assert pr.poseidon([proof[i], proof[i]]) == proof[i + 1], f"level {i}"


def test_hash2_regression():
    # frozen self-vector so kernel implementations can check against it
    h = pr.poseidon([1, 2])
    assert 0 < h < R
    assert h == pr.poseidon([1, 2])  # determinism
    # wrapper == direct for two writes
    hs = pr.PoseidonHasher()
    hs.write(fr_to_bytes(1))
    hs.write(fr_to_bytes(2))
    assert int.from_bytes(hs.sum(), "big") == h


def test_nil_chain_pins_five_input_hash(golden):
    """Negative-space regression: the nil chain starts at proof[15], so the
    fork's Poseidon(0,0,0,0,0) must satisfy H2^15(x) == proof[15].  Our
    width-6 zero-state permutation (any digest slot) does NOT — recorded
    here so a future candidate rule can be validated in one assert.  See
    COMPAT.md round-3 campaign for the full search space eliminated."""
    proof = golden["_proof_ints"]
    # the chain property itself
    for i in range(15, 27):
        assert pr.poseidon([proof[i], proof[i]]) == proof[i + 1]
    # our current default rule does not reproduce the fork (known gap)
    x = pr.poseidon([0, 0, 0, 0, 0])
    for _ in range(15):
        x = pr.poseidon([x, x])
    assert x != proof[15], "if this fires, the wide-arity rule was found!"


@pytest.mark.xfail(reason="wide-arity rule of the bnb fork is outside the "
                          "circomlib-composition space (~6k variants "
                          "eliminated); blocked on fork source or a second "
                          "golden artifact — see COMPAT.md round-3 campaign",
                   strict=False)
def test_full_leaf_chain(golden):
    proof = golden["_proof_ints"]
    root = int(golden["Root"], 16)
    idx = golden["AccountIndex"]
    flatten = []
    for a in golden["Assets"]:
        flatten += [a["Index"], a["Equity"], a["Debt"], a["Loan"],
                    a["Margin"], a["PortfolioMargin"]]
    for j in range(len(golden["Assets"]), 50):
        flatten += [j, 0, 0, 0, 0, 0]
    elements = []
    for i in range((50 * 6 + 2) // 3):
        chunk = flatten[3 * i:3 * i + 3] + [0, 0, 0]
        elements.append((chunk[0] * (1 << 128) + chunk[1] * (1 << 64)
                         + chunk[2]) % R)
    commit = pr.poseidon(elements)
    leaf = pr.poseidon([int(golden["AccountIdHash"], 16),
                        golden["TotalEquity"] % R, golden["TotalDebt"] % R,
                        golden["TotalCollateral"] % R, commit])
    node = leaf
    for i in range(28):
        if (idx >> i) & 1:
            node = pr.poseidon([proof[i], node])
        else:
            node = pr.poseidon([node, proof[i]])
    assert node == root
