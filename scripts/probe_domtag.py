import base64, itertools, json, sys
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_mdchain.py").read().split('P2 = lambda')[0])
P2 = lambda a, b: perm([0, a, b])[1]
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
TARGET15 = PROOF[15]
def chainup(v, n=15):
    for _ in range(n): v = P2(v, v)
    return v
hits = []
tags = list(range(21)) + [1 << 64, 5 * (1 << 64), (1 << 5) - 1, (1 << 6) - 1, 1 << 5, 1 << 6,
                          5 << 32, 6 << 32]
for t, tagpos in itertools.product([6], ["first", "last"]):
    for tag in tags:
        st0 = ([tag] + [0] * (t - 1)) if tagpos == "first" else ([0] * (t - 1) + [tag])
        st = perm(st0)
        for out in range(t):
            if chainup(st[out]) == TARGET15:
                hits.append((t, tagpos, tag, out))
                print("HIT:", t, tagpos, tag, out)
print("done", len(hits))
