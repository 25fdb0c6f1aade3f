import base64, itertools, json, sys, time
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_mdchain.py").read().split('P2 = lambda')[0])

cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
ROOT = int(cfg["Root"], 16)
IDX = cfg["AccountIndex"]
idhash = int(cfg["AccountIdHash"], 16)
te, td, tc = cfg["TotalEquity"], cfg["TotalDebt"], cfg["TotalCollateral"]
assets = cfg["Assets"]
flatten = []
for a in assets:
    flatten += [a["Index"], a["Equity"], a["Debt"], a["Loan"], a["Margin"], a["PortfolioMargin"]]
for j in range(len(assets), 50):
    flatten += [j, 0, 0, 0, 0, 0]
ELEMENTS = []
for i in range((50 * 6 + 2) // 3):
    a = flatten[3*i] if 3*i < len(flatten) else 0
    b = flatten[3*i+1] if 3*i+1 < len(flatten) else 0
    c = flatten[3*i+2] if 3*i+2 < len(flatten) else 0
    ELEMENTS.append((a * (1 << 128) + b * (1 << 64) + c) % MOD)

def make_hash(family, rate, out, pad0):
    def h(vals):
        vals = list(vals)
        if family == "single_chain":
            # single perm if fits, else chain: first chunk=rate, then rate-1 with digest first
            if len(vals) <= rate:
                return perm([0] + vals)[out]
            d = perm([0] + vals[:rate])[out]
            pos = rate
            while pos < len(vals):
                chunk = vals[pos:pos + rate - 1]; pos += rate - 1
                if pad0:
                    chunk = chunk + [0] * (rate - 1 - len(chunk))
                d = perm([0, d] + chunk)[out]
            return d
        if family == "capchain":
            d = 0
            for i in range(0, len(vals), rate):
                chunk = vals[i:i+rate]
                if pad0: chunk = chunk + [0] * (rate - len(chunk))
                d = perm([d] + chunk)[out]
            return d
        if family == "duplex":
            state = [0] * (rate + 1)
            for i in range(0, len(vals), rate):
                chunk = vals[i:i+rate]
                for j, v in enumerate(chunk):
                    state[1 + j] = (state[1 + j] + v) % MOD
                state = perm(state)
            return state[out]
    return h

def fold(leaf):
    node = leaf
    for i in range(28):
        node = perm([0, PROOF[i], node])[1] if (IDX >> i) & 1 else perm([0, node, PROOF[i]])[1]
    return node

t0 = time.time(); n = 0
for family, rate, out, pad0 in itertools.product(
        ["single_chain", "capchain", "duplex"], [2, 3, 4, 5, 8, 16], [0, 1, 2], [False, True]):
    H = make_hash(family, rate, out, pad0)
    try:
        commit = H(ELEMENTS)
        leaf = H([idhash, te % MOD, td % MOD, tc % MOD, commit])
    except Exception:
        continue
    n += 1
    if fold(leaf) == ROOT:
        print("FULL MATCH:", family, rate, out, pad0)
print("swept", n, f"in {time.time()-t0:.0f}s")
