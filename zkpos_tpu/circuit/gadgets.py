"""Circuit gadgets: in-circuit Poseidon and lookup tables.

The in-circuit Poseidon emits R1CS constraints for exactly the same function
as crypto.poseidon_ref (same Grain constants, digest = state[1], same
chunking rule) — in this framework "native" and "in-circuit" Poseidon are
one spec with two backends (reference C2/C3 in SURVEY.md §2.1).  The
permutation gadget uses the sparse-MDS optimized form
(crypto/poseidon_opt.py) so compile cost is O(t·r_p²) instead of the naive
O(t²·r_p²) symbolic mixing.

Lookup tables implement the same API as the fork's logderivlookup
(circuit/batch_create_user_circuit.go:112,154,284) as a logUp
(log-derivative) argument whose random challenge is bound to a Pedersen
commitment over the transcript wires (cs.register_post_commit — the gnark
bsb22 commitment analog the fork itself relies on).  O(1) constraints per
query, zero transcript-hash constraints.
"""

from __future__ import annotations

from typing import List

from ..crypto.bn254 import R as MOD
from ..crypto import poseidon_params as pp
from ..crypto import poseidon_opt as popt
from ..crypto.poseidon_ref import MAX_INPUTS, OUTPUT_INDEX
from .cs import LC, ConstraintSystem, VarLike, _as_lc


def _permute_gadget(cs: ConstraintSystem, state: List[LC]) -> List[LC]:
    """Optimized-form Poseidon permutation gadget (sparse-MDS factorization,
    crypto/poseidon_opt.py — same transformation circomlib/neptune use).

    The naive gadget did a dense t x t symbolic MDS mix per partial round;
    with LCs growing a term per round that is O(t^2 r_p^2) dict work and
    dominated compile time (>95% of a 6-minute tiny-tier compile).  The
    sparse form does ONE dense dot per partial round and a single-term
    in-place update of the other lanes: O(t r_p^2) total, with identical
    algebra (oracle-verified by tests/test_poseidon_opt.py + circuit
    parity tests)."""
    t = len(state)
    p = popt.opt_params(t)
    r_p = pp.partial_rounds(t)
    half = pp.R_FULL // 2
    mds = p["mds"]

    def add_const(lcs, consts):
        return [LC(dict(lc.terms), lc.const + c)
                for lc, c in zip(lcs, consts)]

    def sbox(lc):
        x2 = cs.mul(lc, lc)
        x4 = cs.mul(x2, x2)
        return cs.mul(x4, lc)

    def mix(mat, lcs):
        outs = []
        for i in range(t):
            terms: dict = {}
            const = 0
            row = mat[i]
            for j in range(t):
                m = row[j]
                if not m:
                    continue
                lc = lcs[j]
                const += m * lc.const
                for var, c in lc.terms.items():
                    nc = (terms.get(var, 0) + m * c) % MOD
                    if nc:
                        terms[var] = nc
                    elif var in terms:
                        del terms[var]
            outs.append(LC(terms, const % MOD))
        return outs

    x = add_const(state, p["c_init"])
    # first half full rounds
    for r in range(half):
        x = [sbox(v) for v in x]
        x = mix(mds, x)
        if r < half - 1:
            x = add_const(x, p["c_full"][r])
        else:
            x[0] = LC(dict(x[0].terms), x[0].const + p["d_partial"][0])
    # partial chain (sparse rounds)
    for i in range(r_p):
        y = sbox(x[0])                       # single-wire LC, coeff 1
        if i < r_p - 1:
            m00, v, w_hat = p["sparse"][i]
            (yvar, yco), = y.terms.items()
            # new lane 0 from OLD lanes (one dense dot)
            terms = {yvar: (yco * m00) % MOD}
            const = y.const * m00
            for j, vj in enumerate(v):
                lc = x[j + 1]
                const += vj * lc.const
                for var, c in lc.terms.items():
                    nc = (terms.get(var, 0) + vj * c) % MOD
                    if nc:
                        terms[var] = nc
                    elif var in terms:
                        del terms[var]
            # other lanes += w_hat * y  (we own these dicts: in-place)
            for j in range(1, t):
                xt = x[j].terms
                nc = (xt.get(yvar, 0) + w_hat[j - 1] * yco) % MOD
                if nc:
                    xt[yvar] = nc
                elif yvar in xt:
                    del xt[yvar]
            x[0] = LC(terms, (const + p["d_partial"][i + 1]) % MOD)
        else:
            x[0] = y
            x = mix(p["dense_last"], x)
            x = add_const(x, p["c_resume"])
    # second half full rounds
    for r in range(half):
        x = [sbox(v) for v in x]
        x = mix(mds, x)
        if r < half - 1:
            x = add_const(x, p["c_full_2nd"][r])
    return x


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


# The device QAP evaluator (groth16/qap_device.py) sums each constraint
# row's terms as exact f32 digit vectors; exactness holds while
# 255*T < 2^23, i.e. T <= ~32k terms per row.  Production logUp sums run
# to 10^5-10^6 terms, so wide sums are materialized through chunked
# partial-sum wires (one linear constraint per 2^14 terms).
_SUM_CHUNK = 1 << 14


def _chunked_sum(cs: ConstraintSystem, terms: dict) -> LC:
    if len(terms) <= _SUM_CHUNK:
        return LC(terms)
    items = list(terms.items())
    parts = []
    for i in range(0, len(items), _SUM_CHUNK):
        sub = LC(dict(items[i:i + _SUM_CHUNK]))
        val = cs.eval_lc(sub) if cs.solve else None
        w = cs._internal(val)
        cs._emit(cs.sub(sub, w), LC(const=1), LC())
        parts.append(w)
    return _chunked_sum(
        cs, {next(iter(p.terms)): next(iter(p.terms.values()))
             for p in parts})


class LookupTable:
    """logderivlookup.Table-compatible API (New/Insert/Lookup) encoded as a
    logUp (log-derivative) argument in plain R1CS.

    The fork's table (circuit/batch_create_user_circuit.go:112,154,284)
    gets its random challenge from the Groth16 commitment extension; since
    round 3 so does this one: the transcript wires (non-constant entries,
    query indices, query outputs, prover-chosen multiplicities) join the
    circuit's single Pedersen commitment, and the challenge wire is
    c = H(D) recomputed by the verifier (groth16.commitment_challenge).
    Per-table independence comes from alpha = H(c, table_index).  Round 2
    hashed the whole transcript in-circuit instead — correct at test sizes
    but O(41) constraints per transcript element, which alone would blow
    the 2^26 budget at production scale (~10^6 transcript elements).

    Identity enforced (α, β = challenges; row keys i + β·t_i; query keys
    q_j + β·out_j):

        Σ_i  m_i / (α − i − β·t_i)  ==  Σ_j  1 / (α − q_j − β·out_j)

    at ~2 constraints per entry + 2 per query + two Poseidon perms per
    table, versus O(|table|) per query for the one-hot encoding it
    replaced in round 1.
    """

    def __init__(self, cs: ConstraintSystem):
        self.cs = cs
        self.entries: List[LC] = []
        self.q_idx: List[LC] = []
        self.q_out: List[LC] = []
        self._finalized = False
        # table registry for the native two-pass solver
        # (circuit/solver_native.py): table_out/table_mult hints reference
        # tables by id; entries are complete before the first lookup in
        # every circuit here, and each out-hint additionally records the
        # entry count at its creation to replicate eager semantics.
        if not hasattr(cs, "_tables"):
            cs._tables = []
        self.table_id = len(cs._tables)
        cs._tables.append(self)
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
            bound = len(self.entries)

            def out_hint(ins, _bound=bound):
                idx = ins[0]
                if idx >= _bound:
                    return [0]
                return [cs.eval_lc(self.entries[idx])]

            out_hint._native = ("table_out", self.table_id, bound)
            (o,) = cs.new_hint(out_hint, 1, q)
            self.q_idx.append(q)
            self.q_out.append(o)
            outs.append(o)
        return outs

    def _finalize(self) -> None:
        """Phase 1: materialize multiplicities and register the transcript
        wires for the Pedersen commitment; the challenge-dependent sum
        constraints are emitted in phase 2 (_emit_argument) once the ONE
        circuit-wide challenge wire exists.  This mirrors the fork's
        logderivlookup, whose challenge comes from the Groth16 bsb22
        commitment (gnark std/lookup/logderivlookup + api Commit) instead
        of an in-circuit hash — at production sizes an in-circuit
        Fiat-Shamir over the ~10^6-element transcript would alone blow the
        2^26 constraint budget."""
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

        mult_hint._native = ("table_mult", self.table_id, T)
        self.ms = cs.new_hint(mult_hint, T, *self.q_idx)
        wires = [e for e in self.entries if not e.is_const()]
        wires += self.q_idx + self.q_out + self.ms
        cs.register_post_commit(wires, self._emit_argument)

    def _emit_argument(self, c: LC, table_index: int) -> None:
        """Phase 2: logUp sum identity under challenges derived from the
        commitment challenge c (alpha = H(c, table_index), beta = H(alpha)
        — per-table independence from one commitment)."""
        cs = self.cs
        ms = self.ms
        alpha = poseidon_gadget(cs, [c, table_index])
        beta = poseidon_gadget(cs, [alpha])

        def inv_batch_hint(ins):
            """Fractions num_i/den_i in one hint: ONE field inversion via
            the Montgomery batch trick instead of one powmod per element
            (the per-element form dominated solve time at production table
            sizes)."""
            k = len(ins) // 2
            nums, dens = ins[:k], ins[k:]
            prefix = [1] * (k + 1)
            for i, d in enumerate(dens):
                prefix[i + 1] = prefix[i] * (d if d else 1) % MOD
            inv_total = pow(prefix[k], MOD - 2, MOD)
            out = [0] * k
            for i in range(k - 1, -1, -1):
                if dens[i]:
                    out[i] = nums[i] * prefix[i] % MOD * inv_total % MOD
                    inv_total = inv_total * dens[i] % MOD
            return out

        inv_batch_hint._native = ("invfrac_batch",)

        # phase A: all keys/denominators first, ONE batched inverse hint
        # per side, then the product checks — same constraints as the
        # per-element form, reordered for batch inversion.
        lhs_d = []
        for i, t in enumerate(self.entries):
            key = cs.add(cs.mul(beta, t), i)
            lhs_d.append(cs.sub(alpha, key))
        vs = cs.new_hint(inv_batch_hint, len(self.entries),
                         *(list(ms) + lhs_d))
        lhs_terms: dict = {}
        for i, (v, d) in enumerate(zip(vs, lhs_d)):
            cs.assert_product(v, d, ms[i])
            (vv, vc), = v.terms.items()
            lhs_terms[vv] = lhs_terms.get(vv, 0) + vc
        rhs_d = []
        for q, o in zip(self.q_idx, self.q_out):
            key = cs.add(cs.mul(beta, o), q)
            rhs_d.append(cs.sub(alpha, key))
        ones = [LC(const=1)] * len(rhs_d)
        us = cs.new_hint(inv_batch_hint, len(rhs_d), *(ones + rhs_d))
        rhs_terms: dict = {}
        for u, d in zip(us, rhs_d):
            cs.assert_product(u, d, LC(const=1))
            (uv, uc), = u.terms.items()
            rhs_terms[uv] = rhs_terms.get(uv, 0) + uc
        cs.assert_is_equal(_chunked_sum(cs, lhs_terms),
                           _chunked_sum(cs, rhs_terms))
