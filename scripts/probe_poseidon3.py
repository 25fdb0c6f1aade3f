import base64, itertools, json, sys
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE

R_FULL = 8
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
IDEN3 = {(1,): 18586133768512220936620570745912940619677854269274689475585506675881198879027,
         (1, 2): 7853200120776062878684798364095072458815029376092732009249414926327459813530}

def gen_params(t):
    r_p = _R_P_TABLE[t - 2]
    g = _GrainLFSR(1, 0, 254, t, R_FULL, r_p)
    consts = tuple(g.field_element(MOD, 254) for _ in range((R_FULL + r_p) * t))
    def raw_fe():
        v = 0
        for _ in range(254):
            v = (v << 1) | g.bit()
        return v % MOD
    while True:
        rand_list = [raw_fe() for _ in range(2 * t)]
        if len(set(rand_list)) == 2 * t:
            break
    xs, ys = rand_list[:t], rand_list[t:]
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    return consts, mds

CACHE = {}
def perm(state, orient, sbox_pos):
    t = len(state)
    if t not in CACHE: CACHE[t] = gen_params(t)
    consts, mds = CACHE[t]
    r_p = _R_P_TABLE[t - 2]; half = R_FULL // 2; ci = 0
    sb = 0 if sbox_pos == "first" else t - 1
    for rnd in range(R_FULL + r_p):
        state = [(s + consts[ci + i]) % MOD for i, s in enumerate(state)]
        ci += t
        if rnd < half or rnd >= half + r_p:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[sb] = pow(state[sb], 5, MOD)
        if orient == "ij":
            state = [sum(mds[i][j] * state[j] for j in range(t)) % MOD for i in range(t)]
        else:
            state = [sum(mds[j][i] * state[j] for j in range(t)) % MOD for i in range(t)]
    return state

for orient, sbox in itertools.product(["ij", "ji"], ["first", "last"]):
    ph = lambda vals: perm([0] + list(vals), orient, sbox)[0]
    iden_ok = {k: ph(list(k)) == v for k, v in IDEN3.items()}
    nil = ph([0] * 5); nil_map = {}
    for lvl in range(29):
        nil_map[nil] = lvl
        nil = ph([nil, nil])
    matches = [(i, nil_map[p]) for i, p in enumerate(PROOF) if p in nil_map]
    print(orient, sbox, "iden3:", iden_ok, "nil matches:", matches)
