"""Circuit gadgets: in-circuit Poseidon and lookup tables.

The in-circuit Poseidon emits R1CS constraints for exactly the same function
as crypto.poseidon_ref (same Grain constants, digest = state[1], same
chunking rule) — in this framework "native" and "in-circuit" Poseidon are
one spec with two backends (reference C2/C3 in SURVEY.md §2.1).

Lookup tables implement the same API as the fork's logderivlookup
(circuit/batch_create_user_circuit.go:112,154,284) with a one-hot mux
encoding — sound under plain Groth16 with no commitment extension.  A logUp
encoding (cheaper at production sizes, needs the Groth16 commitment scheme)
is tracked in COMPAT.md.
"""

from __future__ import annotations

from typing import List

from ..crypto.bn254 import R as MOD
from ..crypto import poseidon_params as pp
from ..crypto.poseidon_ref import MAX_INPUTS, OUTPUT_INDEX
from .cs import LC, ConstraintSystem, VarLike, _as_lc


def _permute_gadget(cs: ConstraintSystem, state: List[LC]) -> List[LC]:
    t = len(state)
    consts, mds = pp.generate_params(t)
    r_p = pp.partial_rounds(t)
    half = pp.R_FULL // 2
    ci = 0
    for rnd in range(pp.R_FULL + r_p):
        state = [cs.add(state[i], consts[ci + i]) for i in range(t)]
        ci += t
        full = rnd < half or rnd >= half + r_p
        idxs = range(t) if full else (0,)
        for i in idxs:
            x = state[i]
            x2 = cs.mul(x, x)
            x4 = cs.mul(x2, x2)
            state[i] = cs.mul(x4, x)
        state = [
            cs.add(*[cs.scale(state[j], mds[i][j]) for j in range(t)])
            for i in range(t)
        ]
    return state


def poseidon_gadget(cs: ConstraintSystem, inputs: List[VarLike]) -> LC:
    """Variadic Poseidon matching crypto.poseidon_ref.poseidon."""
    inputs = [_as_lc(v) for v in inputs]
    if not inputs:
        raise ValueError("poseidon requires at least one input")

    def chunk_hash(vals: List[LC]) -> LC:
        state = [LC()] + vals
        return _permute_gadget(cs, state)[OUTPUT_INDEX]

    if len(inputs) <= MAX_INPUTS:
        return chunk_hash(inputs)
    digest = chunk_hash(inputs[:MAX_INPUTS])
    pos = MAX_INPUTS
    while pos < len(inputs):
        chunk = inputs[pos:pos + MAX_INPUTS - 1]
        digest = chunk_hash([digest] + chunk)
        pos += MAX_INPUTS - 1
    return digest


class LookupTable:
    """logderivlookup.Table-compatible API (New/Insert/Lookup) with one-hot
    mux constraints per query."""

    def __init__(self, cs: ConstraintSystem):
        self.cs = cs
        self.entries: List[LC] = []

    def insert(self, v: VarLike) -> None:
        self.entries.append(_as_lc(v))

    def lookup(self, *queries: VarLike) -> List[LC]:
        return [self._lookup_one(q) for q in queries]

    def _lookup_one(self, q: VarLike) -> LC:
        cs = self.cs
        n = len(self.entries)
        if n == 0:
            raise ValueError("lookup on empty table")

        def onehot_hint(ins):
            idx = ins[0]
            if idx >= n:
                # out-of-range: no selector set (forces Σs=1 to fail)
                return [0] * n
            return [1 if i == idx else 0 for i in range(n)]

        sels = cs.new_hint(onehot_hint, n, q)
        acc_sel = LC()
        acc_idx = LC()
        acc_val = LC()
        for i, s in enumerate(sels):
            cs.assert_is_boolean(s)
            acc_sel = cs.add(acc_sel, s)
            if i:
                acc_idx = cs.add(acc_idx, cs.scale(s, i))
            acc_val = cs.add(acc_val, cs.mul(s, self.entries[i]))
        cs.assert_is_equal(acc_sel, 1)
        cs.assert_is_equal(acc_idx, q)
        return acc_val
