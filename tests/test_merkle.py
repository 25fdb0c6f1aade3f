"""Device Merkle tree vs a trivial python oracle, plus reference-convention
checks (proof shape, nil subtrees, round-trip verify — ports of the ideas in
reference src/utils/merkletree/merkletree_test.go)."""
import random

import pytest

from zkpos_tpu.crypto.bn254 import fr_to_bytes
from zkpos_tpu.crypto.poseidon_ref import poseidon
from zkpos_tpu.merkle.tree import AccountTree, nil_hashes, verify_proof

rng = random.Random(7)
DEPTH = 8  # small depth for oracle comparison speed


def oracle_root(leaves, depth):
    nils = nil_hashes(depth)
    level = list(leaves)
    for k in range(depth):
        if len(level) % 2 == 1:
            level.append(nils[k])
        nxt = [poseidon([level[i], level[i + 1]])
               for i in range(0, len(level), 2)]
        if not nxt:
            nxt = [nils[k + 1]]
        level = nxt
    return level[0]


@pytest.mark.parametrize("n", [1, 2, 5, 8, 33])
def test_root_matches_oracle(n):
    leaves = [rng.randrange(1 << 200) for _ in range(n)]
    t = AccountTree(depth=DEPTH, capacity=n)
    t.build_from_leaf_ints(leaves)
    assert t.root() == fr_to_bytes(oracle_root(leaves, DEPTH))


def test_empty_root_is_nil_chain():
    t = AccountTree(depth=DEPTH)
    t.build_from_leaf_ints([])
    assert t.root() == fr_to_bytes(nil_hashes(DEPTH)[DEPTH])


def test_proof_roundtrip():
    n = 21
    leaves = [rng.randrange(1 << 200) for _ in range(n)]
    t = AccountTree(depth=DEPTH, capacity=n)
    t.build_from_leaf_ints(leaves)
    root = t.root()
    for key in [0, 1, 7, n - 1]:
        proof = t.get_proof(key)
        assert len(proof) == DEPTH
        assert verify_proof(root, key, proof, fr_to_bytes(leaves[key]), DEPTH)
        # wrong leaf fails
        assert not verify_proof(root, key, proof,
                                fr_to_bytes(leaves[key] + 1), DEPTH)
    # unset (nil) leaf also verifies against its nil value
    proof = t.get_proof(n + 3)
    assert verify_proof(root, n + 3, proof,
                        fr_to_bytes(nil_hashes(DEPTH)[0]), DEPTH)


def test_full_depth_28_tree_small():
    leaves = [rng.randrange(1 << 200) for _ in range(6)]
    t = AccountTree(capacity=6)  # depth 28
    t.build_from_leaf_ints(leaves)
    proof = t.get_proof(3)
    assert len(proof) == 28
    assert verify_proof(t.root(), 3, proof, fr_to_bytes(leaves[3]))
