import base64, itertools, json, sys
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_chunking2.py").read().split("P1 = lambda")[0])
P2out = lambda st: perm(st)
P1 = lambda vals: perm([0] + list(vals))[1]
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
# where does the P2 chain property hold?
chain = [i for i in range(27) if P1([PROOF[i], PROOF[i]]) == PROOF[i + 1]]
print("P2 chain holds at levels:", chain)
# so nil_k = PROOF[chain[0]] for k = chain[0]; try to find 5-input variant producing the chain base
base_lvl = chain[0]
target = PROOF[base_lvl]
# walk DOWN: nil at level base_lvl; nil_0 = ??? we need P5 variant s.t. iterating P1 base_lvl times from it gives target.
# Instead: compute candidate nil_0 under variants of the 5-input hash, then chain up.
def try5(state, out_idx):
    return perm(state)[out_idx]
cands = {}
for t in range(6, 18):
    for out_idx in [0, 1, t-1]:
        for cap_last in [False, True]:
            pad = [0]*(t-6)
            st = ([0,0,0,0,0] + pad + [0]) if cap_last else ([0] + [0,0,0,0,0] + pad)
            # all zeros anyway! nil_0 for ANY arity-5-of-zeros = perm(zeros_t)[out]
            v = try5([0]*t, out_idx)
            nil = v
            for lvl in range(base_lvl):
                nil = P1([nil, nil])
            if nil == target:
                print("FOUND nil0 variant: t=", t, "out", out_idx)
                cands[(t,out_idx)] = v
print("done", len(cands))
