import base64, itertools, json, sys
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_mdchain.py").read().split('P2 = lambda')[0])
def P(vals, out=1):
    return perm([0] + list(vals))[out]
P2 = lambda a, b: P([a, b])
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
T15 = PROOF[15]
def chainup(v):
    for _ in range(15): v = P2(v, v)
    return v

cands = {}
Z5 = [0] * 5
# md starting 0
h = 0
for x in Z5: h = P2(h, x)
cands["md0_df"] = h
h = 0
for x in Z5: h = P2(x, h)
cands["md0_dl"] = h
# right-assoc
h = P2(Z5[-2], Z5[-1])
for x in reversed(Z5[:-2]): h = P2(x, h)
cands["rchain"] = h
# chunked max-m, digest first/last, ragged and padded
for m in [2, 3, 4]:
    for dpos in ["first", "last"]:
        for padded in [False, True]:
            vals = list(Z5)
            h = P(vals[:m]); pos = m
            while pos < len(vals):
                chunk = vals[pos:pos + m - 1]; pos += m - 1
                if padded: chunk += [0] * (m - 1 - len(chunk))
                h = P([h] + chunk) if dpos == "first" else P(chunk + [h])
            cands[f"chunk{m}_{dpos}_{'p' if padded else 'r'}"] = h
# trees arity m padded with zeros
for m in [2, 3, 4]:
    layer = list(Z5)
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer), m):
            c = layer[i:i+m]
            nxt.append(P(c) if len(c) > 1 else c[0])
        layer = nxt
    cands[f"tree{m}_r"] = layer[0]
# out=0 variants of the basic chunked
for m in [2, 3, 4]:
    vals = list(Z5)
    h = P(vals[:m], 0); pos = m
    while pos < len(vals):
        chunk = vals[pos:pos + m - 1]; pos += m - 1
        h = P([h] + chunk, 0)
    cands[f"chunk{m}_o0"] = h
hits = [k for k, v in cands.items() if chainup(v) == T15]
print("hits:", hits, "of", len(cands))
