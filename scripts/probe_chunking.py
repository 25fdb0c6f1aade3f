import base64, json, sys
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_params import _GrainLFSR, _R_P_TABLE
R_FULL = 8

PCACHE = {}
def gen_params(t):
    if t in PCACHE: return PCACHE[t]
    r_p = _R_P_TABLE[t - 2]
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
    PCACHE[t] = (consts, mds, r_p)
    return PCACHE[t]

def perm(state):
    consts, mds, r_p = gen_params(len(state))
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

P1 = lambda vals: perm([0] + list(vals))[0]

def chain_16_15(vals):
    h = P1(vals[:16]); pos = 16
    while pos < len(vals):
        h = P1([h] + vals[pos:pos + 15]); pos += 15
    return h

def chain_16_15_append(vals):
    h = P1(vals[:16]); pos = 16
    while pos < len(vals):
        h = P1(vals[pos:pos + 15] + [h]); pos += 15
    return h

def sponge_add(vals):
    state = [0] * 17
    for i in range(0, len(vals), 16):
        chunk = vals[i:i + 16]
        for j, v in enumerate(chunk): state[1 + j] = (state[1 + j] + v) % MOD
        state = perm(state)
    return state[0]

def sponge_overwrite(vals):
    state = [0] * 17
    for i in range(0, len(vals), 16):
        chunk = vals[i:i + 16]
        for j, v in enumerate(chunk): state[1 + j] = v
        state = perm(state)
    return state[0]

def chain_digest_tree(vals):
    # hash chunks of 16 independently then hash the digests
    ds = [P1(vals[i:i+16]) for i in range(0, len(vals), 16)]
    if len(ds) == 1: return ds[0]
    return poseidon_var(ds)

def poseidon_var(vals, rule=None):
    if len(vals) <= 16: return P1(vals)
    return rule(vals)

RULES = dict(chain_16_15=chain_16_15, chain_16_15_append=chain_16_15_append,
             sponge_add=sponge_add, sponge_overwrite=sponge_overwrite)

cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
ROOT = int(cfg["Root"], 16)
IDX = cfg["AccountIndex"]
idhash = int(cfg["AccountIdHash"], 16)
te, td, tc = cfg["TotalEquity"], cfg["TotalDebt"], cfg["TotalCollateral"]

# PaddingAccountAssets: 4 real assets idx 0..3 -> pad to 50 (indices 4..49)
assets = cfg["Assets"]
flatten = []
for a in assets:
    flatten += [a["Index"], a["Equity"], a["Debt"], a["Loan"], a["Margin"], a["PortfolioMargin"]]
for j in range(len(assets), 50):
    flatten += [j, 0, 0, 0, 0, 0]
nele = (50 * 6 + 2) // 3
elements = []
for i in range(nele):
    a = flatten[3 * i] if 3 * i < len(flatten) else 0
    b = flatten[3 * i + 1] if 3 * i + 1 < len(flatten) else 0
    c = flatten[3 * i + 2] if 3 * i + 2 < len(flatten) else 0
    elements.append((a * (1 << 128) + b * (1 << 64) + c) % MOD)

for name, rule in RULES.items():
    commit = rule(elements)
    leaf = P1([idhash, te % MOD, td % MOD, tc % MOD, commit])
    node = leaf
    for i in range(28):
        if (IDX >> i) & 1:
            node = P1([PROOF[i], node])
        else:
            node = P1([node, PROOF[i]])
    print(name, "root match:", node == ROOT)
