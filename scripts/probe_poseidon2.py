"""Sweep Poseidon construction variants against the golden user proof.

Authoritative oracle: trailing siblings of the golden Merkle proof must be
nil-subtree hashes nil_i (nil_0 = P5(0..0), nil_{i+1} = P2(nil_i, nil_i)).
"""
import base64
import itertools
import json
import sys

sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE

R_FULL = 8

cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
ROOT = int(cfg["Root"], 16)

IDEN3 = {
    (1,): 18586133768512220936620570745912940619677854269274689475585506675881198879027,
    (1, 2): 7853200120776062878684798364095072458815029376092732009249414926327459813530,
}


def gen_params(t, mds_mode, n_bits):
    r_p = _R_P_TABLE[t - 2]
    g = _GrainLFSR(1, 0, n_bits, t, R_FULL, r_p)
    consts = tuple(g.field_element(MOD, n_bits) for _ in range((R_FULL + r_p) * t))
    if mds_mode == "continue":
        g2 = g
    elif mds_mode == "fresh0":
        g2 = _GrainLFSR(0, 0, n_bits, t, R_FULL, r_p)
    elif mds_mode == "fresh1":
        g2 = _GrainLFSR(1, 0, n_bits, t, R_FULL, r_p)
    if mds_mode == "seq":
        xs = list(range(t)); ys = list(range(t, 2 * t))
    else:
        xs = [g2.field_element(MOD, n_bits) for _ in range(t)]
        ys = [g2.field_element(MOD, n_bits) for _ in range(t)]
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    return consts, mds


def perm(state, variant, cache={}):
    t = len(state)
    key = (t, variant["mds"], variant["nbits"])
    if key not in cache:
        cache[key] = gen_params(t, variant["mds"], variant["nbits"])
    consts, mds = cache[key]
    r_p = _R_P_TABLE[t - 2]
    half = R_FULL // 2
    ci = 0
    sb = 0 if variant["sbox"] == "first" else t - 1
    for rnd in range(R_FULL + r_p):
        state = [(s + consts[ci + i]) % MOD for i, s in enumerate(state)]
        ci += t
        if rnd < half or rnd >= half + r_p:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[sb] = pow(state[sb], 5, MOD)
        if variant["orient"] == "ij":
            state = [sum(mds[i][j] * state[j] for j in range(t)) % MOD for i in range(t)]
        else:
            state = [sum(mds[j][i] * state[j] for j in range(t)) % MOD for i in range(t)]
    return state


def phash(vals, variant):
    if variant["cap"] == "first":
        st = [0] + list(vals)
        return perm(st, variant)[0]
    else:
        st = list(vals) + [0]
        return perm(st, variant)[-1]


def run():
    hits = []
    for mds, orient, sbox, cap, nbits in itertools.product(
            ["fresh0", "fresh1", "continue", "seq"], ["ij", "ji"],
            ["first", "last"], ["first", "last"], [254, 255]):
        v = dict(mds=mds, orient=orient, sbox=sbox, cap=cap, nbits=nbits)
        # iden3 vector check (t=2,3)
        iden_ok = all(phash(list(k), v) == val for k, val in IDEN3.items())
        # nil chain check
        nil = phash([0] * 5, v)
        nil_set = {}
        for lvl in range(29):
            nil_set[nil] = lvl
            nil = phash([nil, nil], v)
        matches = [(i, nil_set[p]) for i, p in enumerate(PROOF) if p in nil_set]
        if iden_ok or matches:
            hits.append((v, iden_ok, matches))
            print("HIT:", v, "iden3:", iden_ok, "nilmatches:", matches)
    if not hits:
        print("NO VARIANT MATCHED")


run()
