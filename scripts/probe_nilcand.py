import base64, itertools, json, sys, time
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/scripts/probe_mdchain.py").read().split('P2 = lambda')[0])
P2 = lambda a, b: perm([0, a, b])[1]
cfg = json.load(open("/root/reference/src/verifier/config/user_config.json"))
PROOF = [int.from_bytes(base64.b64decode(p), "big") for p in cfg["Proof"]]
TARGET15 = PROOF[15]
t0 = time.time()
# precompute chain function table? chainup is 15 P2 = cheap
def chainup(v, n=15):
    for _ in range(n): v = P2(v, v)
    return v
cands = {"zero": 0}
for t in range(2, 18):
    for mds_mode in ["circom", "rej_cont", "seq"]:
        try:
            st = perm([0]*t, None, mds_mode)
        except Exception as e:
            continue
        for out in range(t):
            cands[f"t{t}_{mds_mode}_o{out}"] = st[out]
for rp in range(50, 76):
    for mds_mode in ["circom", "rej_cont", "seq"]:
        st = perm([0]*6, rp, mds_mode)
        for out in range(6):
            cands[f"t6rp{rp}_{mds_mode}_o{out}"] = st[out]
print("testing", len(cands), "candidates")
hits = [k for k, v in cands.items() if chainup(v) == TARGET15]
print("hits:", hits, f"{time.time()-t0:.0f}s")
