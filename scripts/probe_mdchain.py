import base64, itertools, json, sys
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE
R_FULL = 8
PCACHE = {}
def gen_params(t, rp, mds_mode="circom"):
    key=(t,rp,mds_mode)
    if key in PCACHE: return PCACHE[key]
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
    elif mds_mode == "seq":
        xs, ys = list(range(t)), list(range(t, 2*t))
    mds = [[pow((xs[i] + ys[j]) % MOD, MOD - 2, MOD) for j in range(t)] for i in range(t)]
    PCACHE[key] = (consts, mds)
    return PCACHE[key]

def perm(state, rp=None, mds_mode="circom"):
    t = len(state)
    if rp is None: rp = _R_P_TABLE[t - 2]
    consts, mds = gen_params(t, rp, mds_mode)
    half = R_FULL // 2; ci = 0
    for rnd in range(R_FULL + rp):
        state = [(s + consts[ci + i]) % MOD for i, s in enumerate(state)]
        ci += t
        if rnd < half or rnd >= half + rp:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[0] = pow(state[0], 5, MOD)
        state = [sum(mds[i][j] * state[j] for j in range(t)) % MOD for i in range(t)]
    return state

P2 = lambda a, b: perm([0, a, b])[1]
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
TARGET15 = PROOF[15]
def chainup(v, n=15):
    for _ in range(n): v = P2(v, v)
    return v

tests = {}
# MD chain rate-1 after first pair
def md(vals):
    h = P2(vals[0], vals[1])
    for x in vals[2:]: h = P2(h, x)
    return h
def md_rev(vals):
    h = P2(vals[0], vals[1])
    for x in vals[2:]: h = P2(x, h)
    return h
def tree(vals):
    layer = list(vals)
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer)-1, 2): nxt.append(P2(layer[i], layer[i+1]))
        if len(layer) % 2: nxt.append(layer[-1])
        layer = nxt
    return layer[0]
tests["md"] = md([0]*5); tests["md_rev"] = md_rev([0]*5); tests["tree"] = tree([0]*5)
# t=6 with different MDS modes / out idx
for mds_mode in ["rej_cont", "seq"]:
    st = perm([0]*6, None, mds_mode)
    for out in range(6):
        tests[f"t6_{mds_mode}_out{out}"] = st[out]
for name, v in tests.items():
    if chainup(v) == TARGET15:
        print("FOUND:", name)
print("done")
