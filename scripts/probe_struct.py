import base64, itertools, json, sys, time
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE
R_FULL = 8
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
# oracle pairs: upper levels must be nil chain
ORACLE = [(PROOF[i], PROOF[i + 1]) for i in range(20, 26)]

PCACHE = {}
def gen_params(t, mds_mode, rp):
    key = (t, mds_mode, rp)
    if key in PCACHE: return PCACHE[key]
    g = _GrainLFSR(1, 0, 254, t, R_FULL, rp)
    consts = tuple(g.field_element(MOD, 254) for _ in range((R_FULL + rp) * t))
    def raw_fe(gg):
        v = 0
        for _ in range(254): v = (v << 1) | gg.bit()
        return v % MOD
    if mds_mode == "circom":  # non-rejection, continue
        while True:
            rl = [raw_fe(g) for _ in range(2 * t)]
            if len(set(rl)) == 2 * t: break
        xs, ys = rl[:t], rl[t:]
    elif mds_mode == "rej_cont":
        xs = [g.field_element(MOD, 254) for _ in range(t)]
        ys = [g.field_element(MOD, 254) for _ in range(t)]
    elif mds_mode == "rej_fresh0":
        g2 = _GrainLFSR(0, 0, 254, t, R_FULL, rp)
        xs = [g2.field_element(MOD, 254) for _ in range(t)]
        ys = [g2.field_element(MOD, 254) for _ in range(t)]
    elif mds_mode == "seq":
        xs, ys = list(range(t)), list(range(t, 2 * t))
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    PCACHE[key] = (consts, mds)
    return PCACHE[key]

def perm(state, consts, mds, rp, sbox_last, orient_ji):
    t = len(state); half = R_FULL // 2; ci = 0
    sb = t - 1 if sbox_last else 0
    for rnd in range(R_FULL + rp):
        state = [(s + consts[ci + i]) % MOD for i, s in enumerate(state)]
        ci += t
        if rnd < half or rnd >= half + rp:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[sb] = pow(state[sb], 5, MOD)
        if orient_ji:
            state = [sum(mds[j][i] * state[j] for j in range(t)) % MOD for i in range(t)]
        else:
            state = [sum(mds[i][j] * state[j] for j in range(t)) % MOD for i in range(t)]
    return state

def hash2(a, b, t_mode, cap_val, cap_last, out_idx, sbox_last, orient_ji, mds_mode, rp_delta):
    t = 3 if t_mode == "arity" else 17
    rp = _R_P_TABLE[t - 2] + rp_delta
    consts, mds = gen_params(t, mds_mode, rp)
    pad = [0] * (t - 3)
    if cap_last:
        state = [a, b] + pad + [cap_val]
    else:
        state = [cap_val, a, b] + pad
    out = perm(state, consts, mds, rp, sbox_last, orient_ji)
    return out[out_idx if out_idx >= 0 else t - 1]

hits = []
n = 0
t0 = time.time()
for t_mode, cap_val, cap_last, out_idx, sbox_last, orient_ji, mds_mode, rp_delta in itertools.product(
        ["arity", "fixed17"], [0, 2, 3], [False, True], [0, 1, -1],
        [False, True], [False, True], ["circom", "rej_cont", "rej_fresh0", "seq"], [0]):
    n += 1
    ok = all(hash2(x, x, t_mode, cap_val, cap_last, out_idx, sbox_last, orient_ji, mds_mode, rp_delta) == y
             for x, y in ORACLE[:1])
    if ok:
        ok2 = all(hash2(x, x, t_mode, cap_val, cap_last, out_idx, sbox_last, orient_ji, mds_mode, rp_delta) == y
                  for x, y in ORACLE)
        print("HIT", t_mode, cap_val, cap_last, out_idx, sbox_last, orient_ji, mds_mode, rp_delta, "full:", ok2)
        hits.append(1)
print(f"swept {n} variants in {time.time()-t0:.1f}s; hits={len(hits)}")
