import base64, itertools, json, sys, time
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_mdchain.py").read().split('P2 = lambda')[0])
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
ROOT = int(cfg["Root"], 16); IDX = cfg["AccountIndex"]
idhash = int(cfg["AccountIdHash"], 16)
te, td, tc = cfg["TotalEquity"], cfg["TotalDebt"], cfg["TotalCollateral"]
flatten = []
for a in cfg["Assets"]:
    flatten += [a["Index"], a["Equity"], a["Debt"], a["Loan"], a["Margin"], a["PortfolioMargin"]]
for j in range(len(cfg["Assets"]), 50):
    flatten += [j, 0, 0, 0, 0, 0]
ELS = []
for i in range((50 * 6 + 2) // 3):
    a = flatten[3*i] if 3*i < len(flatten) else 0
    b = flatten[3*i+1] if 3*i+1 < len(flatten) else 0
    c = flatten[3*i+2] if 3*i+2 < len(flatten) else 0
    ELS.append((a * (1 << 128) + b * (1 << 64) + c) % MOD)

def H(vals, max_m, dpos, padded, out):
    vals = list(vals)
    if len(vals) <= max_m:
        return perm([0] + vals)[out]
    h = perm([0] + vals[:max_m])[out]; pos = max_m
    while pos < len(vals):
        chunk = vals[pos:pos + max_m - 1]; pos += max_m - 1
        if padded: chunk += [0] * (max_m - 1 - len(chunk))
        st = [0, h] + chunk if dpos == "first" else [0] + chunk + [h]
        h = perm(st)[out]
    return h

def fold(leaf):
    node = leaf
    for i in range(28):
        node = perm([0, PROOF[i], node])[1] if (IDX >> i) & 1 else perm([0, node, PROOF[i]])[1]
    return node

t0 = time.time(); n = 0
for max_m, dpos, padded, out in itertools.product([2,3,4,5,6,8,12,16], ["first","last"], [False,True], [0,1]):
    commit = H(ELS, max_m, dpos, padded, out)
    leaf = H([idhash, te % MOD, td % MOD, tc % MOD, commit], max_m, dpos, padded, out)
    n += 1
    if fold(leaf) == ROOT:
        print("FULL MATCH:", max_m, dpos, padded, out)
print("swept", n, f"{time.time()-t0:.0f}s")
