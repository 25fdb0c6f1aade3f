"""Probe Grain-LFSR detail variants: does any produce the known circomlib
first round constant for t=3?
C0(t=3) = 0x0ee9a592ba9a9518d05986d656f40c2114c4993c11bb29938d21d47304cd8e6e
"""
import itertools, sys
sys.path.insert(0, "/root/repo")
from zkpos_tpu.crypto.bn254 import R as MOD

TARGET = 0x0ee9a592ba9a9518d05986d656f40c2114c4993c11bb29938d21d47304cd8e6e
R_FULL, R_P3 = 8, 57


def bits_of(v, w, lsb):
    b = [int(x) for x in bin(v)[2:].zfill(w)]
    return b[::-1] if lsb else b


def make_state(order, lsb, field_tag, n):
    fields = dict(f=(field_tag, 2), s=(0, 4), n=(n, 12), t=(3, 12), RF=(R_FULL, 10), RP=(R_P3, 10))
    bits = []
    for k in order:
        v, w = fields[k]
        bits += bits_of(v, w, lsb)
    bits += [1] * 30
    return bits


def run_grain(state, taps_rev, warm):
    state = list(state)
    def raw():
        if taps_rev:
            new = state[79 - 62] ^ state[79 - 51] ^ state[79 - 38] ^ state[79 - 23] ^ state[79 - 13] ^ state[79 - 0]
        else:
            new = state[62] ^ state[51] ^ state[38] ^ state[23] ^ state[13] ^ state[0]
        state.pop(0); state.append(new)
        return new
    for _ in range(warm):
        raw()
    def bit():
        while True:
            b1 = raw(); b2 = raw()
            if b1: return b2
    def fe(nb):
        while True:
            v = 0
            for _ in range(nb):
                v = (v << 1) | bit()
            if v < MOD: return v
    return fe


orders = [("f", "s", "n", "t", "RF", "RP"), ("s", "f", "n", "t", "RF", "RP"),
          ("f", "s", "t", "n", "RF", "RP"), ("n", "t", "RF", "RP", "f", "s")]
found = False
for order, lsb, ft, n, taps_rev, warm in itertools.product(
        orders, [False, True], [1, 0, 2, 3], [254, 255, 253], [False, True], [160, 80]):
    st = make_state(order, lsb, ft, n)
    fe = run_grain(st, taps_rev, warm)
    c0 = fe(n)
    if c0 == TARGET:
        print("FOUND:", order, "lsb:", lsb, "ft:", ft, "n:", n, "taps_rev:", taps_rev, "warm:", warm)
        found = True
if not found:
    print("no grain variant produces circomlib C0(t=3)")
