import base64, json, sys
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE
R_FULL = 8
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]

def gen_params(t, rp=None):
    r_p = rp if rp is not None else _R_P_TABLE[t - 2]
    g = _GrainLFSR(1, 0, 254, t, R_FULL, r_p)
    consts = tuple(g.field_element(MOD, 254) for _ in range((R_FULL + r_p) * t))
    def raw_fe():
        v = 0
        for _ in range(254): v = (v << 1) | g.bit()
        return v % MOD
    while True:
        rl = [raw_fe() for _ in range(2 * t)]
        if len(set(rl)) == 2 * t: break
    xs, ys = rl[:t], rl[t:]
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    return consts, mds, r_p

def perm(state, params):
    consts, mds, r_p = params
    t = len(state); half = R_FULL // 2; ci = 0
    for rnd in range(R_FULL + r_p):
        state = [(s + consts[ci + i]) % MOD for i, s in enumerate(state)]
        ci += t
        if rnd < half or rnd >= half + r_p:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[0] = pow(state[0], 5, MOD)
        state = [sum(mds[i][j] * state[j] for j in range(t)) % MOD for i in range(t)]
    return state

p3 = gen_params(3)
ph2 = lambda a, b: perm([0, a, b], p3)[0]
# check consecutive-chain property on the golden proof (nil-sibling region)
for i in range(27):
    if ph2(PROOF[i], PROOF[i]) == PROOF[i + 1]:
        print(f"chain match at level {i}->{i+1}")
print("---- root check: is root == P2 chain top? (can't know without leaf)")
# also try all pairings orderings to detect swap conventions
cnt = 0
for i in range(27):
    for f in range(2):
        a, b = (PROOF[i], PROOF[i])
        if perm([0, a, b], p3)[0] == PROOF[i+1]: cnt += 1
print("done", cnt)
