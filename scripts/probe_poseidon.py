"""Probe which Poseidon parameter/variant matches the reference fork.

Oracle 1: widely-published iden3/circomlib test vectors (from memory —
advisory only).
Oracle 2 (authoritative, offline): the golden user Merkle proof at
/root/reference/src/verifier/config/user_config.json.  Upper-level siblings
of a sparse account tree are nil-subtree hashes:
    nil_0 = Poseidon(0,0,0,0,0);  nil_{i+1} = Poseidon(nil_i, nil_i).
If our Poseidon matches the fork, several trailing proof entries must equal
nil_i values exactly.
"""
import base64
import json
import sys

sys.path.insert(0, "/root/repo")

from zkpos_tpu.crypto import poseidon_ref as pr
from zkpos_tpu.crypto.bn254 import R as MOD, fr_from_bytes, fr_to_bytes

IDEN3_VECTORS = {
    (1,): 18586133768512220936620570745912940619677854269274689475585506675881198879027,
    (1, 2): 7853200120776062878684798364095072458815029376092732009249414926327459813530,
}


def check_iden3():
    for inp, expect in IDEN3_VECTORS.items():
        got = pr.poseidon(list(inp))
        print(f"poseidon{inp}: got={got}\n  expect={expect}  match={got == expect}")


def check_golden():
    cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
    proof = [base64.b64decode(p) for p in cfg["Proof"]]
    nil = pr.poseidon([0, 0, 0, 0, 0])
    nils = [nil]
    for _ in range(28):
        nil = pr.poseidon([nil, nil])
        nils.append(nil)
    nil_bytes = [fr_to_bytes(n) for n in nils]
    matches = []
    for i, p in enumerate(proof):
        for j, nb in enumerate(nil_bytes):
            if p == nb:
                matches.append((i, j))
    print("nil-hash matches (proof_level, nil_level):", matches)
    print("NilAccountHash:", fr_to_bytes(nils[0]).hex())
    return matches


if __name__ == "__main__":
    check_iden3()
    m = check_golden()
    print("AUTHORITATIVE MATCH" if m else "NO MATCH — try variants")
