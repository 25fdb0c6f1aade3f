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

tests = {}
def cap_chain(vals, pad, out):
    h = 0
    i = 0
    while i < len(vals):
        chunk = vals[i:i+2]; i += 2
        if len(chunk) == 1:
            chunk = chunk + [pad]
        h = perm([h, chunk[0], chunk[1]])[out]
    return h
for pad, out in itertools.product([0, 1], [0, 1, 2]):
    tests[f"capchain_p{pad}_o{out}"] = cap_chain([0]*5, pad, out)
# duplex keeping full state but absorb ADD into [1,2] and squeeze state[1] -- tested; try absorb into [0,1]
def sponge_pos01(vals, mode, out):
    state = [0,0,0]
    i = 0
    while i < len(vals):
        c = vals[i:i+2]; i += 2
        while len(c) < 2: c.append(0)
        if mode == "add": state = [(state[0]+c[0])%MOD, (state[1]+c[1])%MOD, state[2]]
        else: state = [c[0], c[1], state[2]]
        state = perm(state)
    return state[out]
for mode, out in itertools.product(["add","overwrite"], [0,1,2]):
    tests[f"pos01_{mode}_o{out}"] = sponge_pos01([0]*5, mode, out)
# rate-4 width-5 single perm for 5 inputs? absorb 4 then 1
def sponge5(vals, out):
    state = [0]*5
    i = 0
    while i < len(vals):
        c = vals[i:i+4]; i += 4
        while len(c) < 4: c.append(0)
        for j in range(4): state[1+j] = (state[1+j]+c[j]) % MOD
        state = perm(state)
    return state[out]
for out in range(5):
    tests[f"sponge5_o{out}"] = sponge5([0]*5, out)
hits = [k for k, v in tests.items() if chainup(v) == TARGET15]
print("hits:", hits)
