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
    """logderivlookup.Table-compatible API (New/Insert/Lookup) encoded as a
    logUp (log-derivative) argument in plain R1CS.

    The fork's table (circuit/batch_create_user_circuit.go:112,154,284)
    gets its random challenge from the Groth16 commitment extension; here
    the challenges are derived IN-CIRCUIT by Poseidon over the full
    transcript (table entries, query indices, query outputs, and the
    prover-chosen multiplicities) — the same Fiat-Shamir-in-circuit pattern
    the reference itself uses for its RLC subset check
    (batch_create_user_circuit.go:275-307).  Including the multiplicities
    in the hash is what stops an adaptive prover from solving the single
    linear relation for m after seeing α.

    Identity enforced (α, β = challenges; row keys i + β·t_i; query keys
    q_j + β·out_j):

        Σ_i  m_i / (α − i − β·t_i)  ==  Σ_j  1 / (α − q_j − β·out_j)

    at ~2 constraints per entry + 2 per query + one Poseidon chain, versus
    O(|table|) per query for the one-hot encoding it replaces.
    """

    def __init__(self, cs: ConstraintSystem):
        self.cs = cs
        self.entries: List[LC] = []
        self.q_idx: List[LC] = []
        self.q_out: List[LC] = []
        self._finalized = False
        cs.register_finalizer(self._finalize)

    def insert(self, v: VarLike) -> None:
        if self._finalized:
            raise RuntimeError("insert after finalize")
        self.entries.append(_as_lc(v))

    def lookup(self, *queries: VarLike) -> List[LC]:
        if self._finalized:
            raise RuntimeError("lookup after finalize")
        cs = self.cs
        n = len(self.entries)
        if n == 0:
            raise ValueError("lookup on empty table")
        outs = []
        for q in queries:
            q = _as_lc(q)

            def out_hint(ins):
                idx = ins[0]
                if idx >= len(self.entries):
                    return [0]
                return [cs.eval_lc(self.entries[idx])]

            (o,) = cs.new_hint(out_hint, 1, q)
            self.q_idx.append(q)
            self.q_out.append(o)
            outs.append(o)
        return outs

    def _finalize(self) -> None:
        if self._finalized or not self.q_idx:
            self._finalized = True
            return
        self._finalized = True
        cs = self.cs
        T = len(self.entries)

        def mult_hint(ins):
            m = [0] * T
            for idx in ins:
                if 0 <= idx < T:
                    m[idx] += 1
            return m

        ms = cs.new_hint(mult_hint, T, *self.q_idx)

        transcript = self.entries + self.q_idx + self.q_out + ms
        alpha = poseidon_gadget(cs, transcript)
        beta = poseidon_gadget(cs, [alpha])

        def inv_hint(ins):
            num, den = ins
            return [num * pow(den, MOD - 2, MOD) % MOD if den else 0]

        lhs = LC()
        for i, t in enumerate(self.entries):
            key = cs.add(cs.mul(beta, t), i)
            d = cs.sub(alpha, key)
            (v,) = cs.new_hint(inv_hint, 1, ms[i], d)
            cs.assert_product(v, d, ms[i])
            lhs = cs.add(lhs, v)
        rhs = LC()
        for q, o in zip(self.q_idx, self.q_out):
            key = cs.add(cs.mul(beta, o), q)
            d = cs.sub(alpha, key)
            (u,) = cs.new_hint(inv_hint, 1, LC(const=1), d)
            cs.assert_product(u, d, LC(const=1))
            rhs = cs.add(rhs, u)
        cs.assert_is_equal(lhs, rhs)
