import base64, itertools, json, sys, time
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE
R_FULL = 8
GC = {}
def gen(t, rp, mds_mode):
    key = (t, rp, mds_mode)
    if key in GC: return GC[key]
    g = _GrainLFSR(1, 0, 254, t, R_FULL, rp)
    consts = tuple(g.field_element(MOD, 254) for _ in range((R_FULL + rp) * t))
    def raw_fe(gg):
        v = 0
        for _ in range(254): v = (v << 1) | gg.bit()
        return v % MOD
    if mds_mode == "circom":
        while True:
            rl = [raw_fe(g) for _ in range(2 * t)]
            if len(set(rl)) == 2 * t: break
        xs, ys = rl[:t], rl[t:]
    elif mds_mode == "rej_cont":
        xs = [g.field_element(MOD, 254) for _ in range(t)]
        ys = [g.field_element(MOD, 254) for _ in range(t)]
    elif mds_mode == "fresh0":
        g2 = _GrainLFSR(0, 0, 254, t, R_FULL, rp)
        xs = [g2.field_element(MOD, 254) for _ in range(t)]
        ys = [g2.field_element(MOD, 254) for _ in range(t)]
    elif mds_mode == "fresh0raw":
        g2 = _GrainLFSR(0, 0, 254, t, R_FULL, rp)
        def rf():
            v = 0
            for _ in range(254): v = (v << 1) | g2.bit()
            return v % MOD
        xs = [rf() for _ in range(t)]; ys = [rf() for _ in range(t)]
    elif mds_mode == "seq":
        xs, ys = list(range(t)), list(range(t, 2*t))
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    GC[key] = (consts, mds)
    return GC[key]

def permv(state, rp, mds_mode, sbox_last, orient_ji):
    t = len(state)
    consts, mds = gen(t, rp, mds_mode)
    half = R_FULL // 2; ci = 0; sb = t - 1 if sbox_last else 0
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

P2 = lambda a, b: permv([0, a, b], 57, "circom", False, False)[1]
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
T15 = PROOF[15]
# precompute: chainup of candidate v — cache chain as function; test = 15 perms each, so
# instead: precompute the set of values whose chainup==T15? can't invert. Just chain each.
def chainup(v):
    for _ in range(15): v = P2(v, v)
    return v
t0 = time.time(); n = 0
for rp, mds_mode, sbl, oji in itertools.product(range(48, 76), ["circom", "rej_cont", "fresh0", "fresh0raw", "seq"], [False, True], [False, True]):
    st = permv([0]*6, rp, mds_mode, sbl, oji)
    for out in range(6):
        n += 1
        if chainup(st[out]) == T15:
            print("HIT:", rp, mds_mode, sbl, oji, out)
print("swept", n, f"{time.time()-t0:.0f}s")
