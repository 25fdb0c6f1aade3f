"""R1CS constraint-system builder + witness solver.

Replaces gnark's `frontend.Compile` / `frontend.NewWitness` pair (reference
keygen main.go:30, prover.go:260) with a two-mode builder:

  * compile mode — allocate wires, emit constraints (no values);
  * solve mode   — same circuit code path, but every wire value is computed
    eagerly (hints run natively), producing the full witness vector.

Constraints are (A, B, C) linear-combination triples with A*B = C.  Variable
0 is the constant one-wire; public inputs follow, then private/internal
wires (gnark's Groth16 ordering).

Circuit definitions must be data-independent (static control flow), which
holds for BatchCreateUserCircuit — the same property that makes the circuit
TPU-friendly.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

from ..crypto.bn254 import R as MOD


class LC:
    """Sparse linear combination: const + sum(coeff * var)."""

    __slots__ = ("terms", "const")

    def __init__(self, terms: Optional[Dict[int, int]] = None, const: int = 0):
        self.terms = terms or {}
        self.const = const % MOD

    def is_const(self) -> bool:
        return not self.terms

    def copy(self) -> "LC":
        return LC(dict(self.terms), self.const)


VarLike = Union[LC, int]


def _as_lc(v: VarLike) -> LC:
    if isinstance(v, LC):
        return v
    return LC(const=int(v) % MOD)


class UnsatisfiedConstraint(Exception):
    pass


class FlatConstraints:
    """Compact R1CS storage: flat uint32 var-id/coeff-id arrays + a pooled
    coefficient table.

    The round-2 representation (python lists of (var, bigint) tuple lists)
    costs ~2.5 KB/constraint — 160 GB at the 2^26 production tier.  This
    layout is ~8 bytes/term (~45 B/constraint at the measured 5.5
    terms/constraint): the full zkpor50_1380 system fits in ~3 GB.  Coeff
    values are pooled (round constants/MDS entries repeat across every
    Poseidon permutation), so the pool stays small.  Iteration yields the
    legacy (A_terms, B_terms, C_terms) triples; vectorized consumers
    (groth16/qap_device.py) read the arrays directly."""

    __slots__ = ("vars", "coeffs", "lens", "pool", "_pool_idx")

    def __init__(self):
        from array import array
        self.vars = array("I")
        self.coeffs = array("I")
        self.lens = array("I")          # 3 entries per constraint
        self.pool: List[int] = [1]
        self._pool_idx = {1: 0}

    def _cid(self, c: int) -> int:
        idx = self._pool_idx.get(c)
        if idx is None:
            idx = len(self.pool)
            self.pool.append(c)
            self._pool_idx[c] = idx
        return idx

    def _emit_lc(self, lc: "LC") -> None:
        va, ca = self.vars, self.coeffs
        n = 0
        for v, c in lc.terms.items():
            va.append(v)
            ca.append(self._cid(c))
            n += 1
        if lc.const:
            va.append(0)
            ca.append(self._cid(lc.const))
            n += 1
        self.lens.append(n)

    def append_lcs(self, a: "LC", b: "LC", c: "LC") -> None:
        self._emit_lc(a)
        self._emit_lc(b)
        self._emit_lc(c)

    def __len__(self) -> int:
        return len(self.lens) // 3

    def __iter__(self):
        pool, va, ca = self.pool, self.vars, self.coeffs
        off = 0
        lens = self.lens
        for i in range(0, len(lens), 3):
            row = []
            for k in range(3):
                n = lens[i + k]
                row.append([(va[j], pool[ca[j]])
                            for j in range(off, off + n)])
                off += n
            yield tuple(row)

    def __getstate__(self):
        return (self.vars, self.coeffs, self.lens, self.pool)

    def __setstate__(self, st):
        self.vars, self.coeffs, self.lens, self.pool = st
        self._pool_idx = {c: i for i, c in enumerate(self.pool)}


class ConstraintSystem:
    def __init__(self, solve: bool = False, collect_violations: bool = False,
                 range_bits: int = 8):
        self.solve = solve
        self.collect_violations = collect_violations
        self.violations: List[str] = []
        self.num_vars = 1          # var 0 == 1
        self.num_public = 1        # includes the one-wire
        self.values: List[int] = [1]   # populated in solve mode
        # constraints: compact flat arrays; iterates as
        # (A_terms, B_terms, C_terms) triples with terms [(var, coeff)]
        self.constraints = FlatConstraints()
        self.hints: List[Tuple[Callable, List[LC], List[int]]] = []
        self._public_frozen = False
        self._finalizers: List[Callable] = []
        self._finalized = False
        # --- Pedersen-commitment challenge (gnark bsb22 analog) ----------
        # committed wire ids + the challenge wire; populated by finalize()
        # when any gadget registered a post-commit phase.  setup()/prove()/
        # verify() in groth16.py consume this layout.
        self.commitment: Optional[dict] = None   # {"wires": [ids], "challenge": id}
        self._post_commit: List[Callable] = []
        self._commit_key = None      # prove-time: {"bases": [G1], "sigma_bases": [G1]}
        self._commit_result = None   # solve-time: (D point, pok point, c value)
        # limb width of the shared lookup range-check table (2^range_bits
        # entries; production keygen uses 16, tests default 8)
        self.range_bits = range_bits
        self._range_table = None

    # -- variable allocation --------------------------------------------------

    def new_public(self, value: Optional[int] = None) -> LC:
        if self._public_frozen:
            raise RuntimeError("public inputs must be declared first")
        idx = self.num_vars
        self.num_vars += 1
        self.num_public += 1
        if self.solve:
            self.values.append(int(value) % MOD)
        return LC({idx: 1})

    def new_witness(self, value: Optional[int] = None) -> LC:
        self._public_frozen = True
        idx = self.num_vars
        self.num_vars += 1
        if self.solve:
            self.values.append(int(value) % MOD)
        return LC({idx: 1})

    def _internal(self, value: Optional[int]) -> LC:
        self._public_frozen = True
        idx = self.num_vars
        self.num_vars += 1
        if self.solve:
            self.values.append(value % MOD)
        return LC({idx: 1})

    # -- evaluation -----------------------------------------------------------

    def eval_lc(self, lc: VarLike) -> int:
        lc = _as_lc(lc)
        acc = lc.const
        for var, coeff in lc.terms.items():
            acc += coeff * self.values[var]
        return acc % MOD

    # -- constraint emission --------------------------------------------------

    @staticmethod
    def _lc_terms(lc: LC) -> list:
        out = [(v, c) for v, c in lc.terms.items()]
        if lc.const:
            out.append((0, lc.const))
        return out

    def _emit(self, a: LC, b: LC, c: LC) -> None:
        self.constraints.append_lcs(a, b, c)

    # -- arithmetic -----------------------------------------------------------

    def add(self, *vs: VarLike) -> LC:
        out = LC()
        for v in vs:
            v = _as_lc(v)
            out.const = (out.const + v.const) % MOD
            for var, coeff in v.terms.items():
                nc = (out.terms.get(var, 0) + coeff) % MOD
                if nc:
                    out.terms[var] = nc
                elif var in out.terms:
                    del out.terms[var]
        return out

    def sub(self, a: VarLike, b: VarLike) -> LC:
        return self.add(a, self.scale(b, MOD - 1))

    def scale(self, v: VarLike, k: int) -> LC:
        v = _as_lc(v)
        k %= MOD
        return LC({var: (c * k) % MOD for var, c in v.terms.items() if (c * k) % MOD},
                  (v.const * k) % MOD)

    def mul(self, a: VarLike, b: VarLike) -> LC:
        a, b = _as_lc(a), _as_lc(b)
        if a.is_const():
            return self.scale(b, a.const)
        if b.is_const():
            return self.scale(a, b.const)
        val = None
        if self.solve:
            val = (self.eval_lc(a) * self.eval_lc(b)) % MOD
        out = self._internal(val)
        self._emit(a, b, out)
        return out

    def inverse(self, a: VarLike) -> LC:
        a = _as_lc(a)
        val = None
        if self.solve:
            av = self.eval_lc(a)
            val = pow(av, MOD - 2, MOD) if av else 0
        out = self._internal(val)
        self._emit(a, out, LC(const=1))
        return out

    # -- assertions -----------------------------------------------------------

    def _check(self, ok: bool, msg: str) -> None:
        if self.solve and not ok:
            if self.collect_violations:
                self.violations.append(msg)
            else:
                raise UnsatisfiedConstraint(msg)

    def assert_product(self, a: VarLike, b: VarLike, c: VarLike) -> None:
        """Emit a*b == c directly (no intermediate wire)."""
        a, b, c = _as_lc(a), _as_lc(b), _as_lc(c)
        self._emit(a, b, c)
        if self.solve:
            self._check(
                (self.eval_lc(a) * self.eval_lc(b) - self.eval_lc(c))
                % MOD == 0,
                "assert_product failed")

    def assert_is_equal(self, a: VarLike, b: VarLike) -> None:
        a, b = _as_lc(a), _as_lc(b)
        d = self.sub(a, b)
        self._emit(d, LC(const=1), LC())
        if self.solve:
            self._check(self.eval_lc(d) == 0,
                        f"assert_is_equal failed: {self.eval_lc(a)} != {self.eval_lc(b)}")

    def assert_is_boolean(self, a: VarLike) -> None:
        a = _as_lc(a)
        # a * (1 - a) == 0
        self._emit(a, self.sub(1, a), LC())
        if self.solve:
            av = self.eval_lc(a)
            self._check(av in (0, 1), f"assert_is_boolean failed: {av}")

    # -- gadgets --------------------------------------------------------------

    def new_hint(self, fn: Callable, n_out: int, *ins: VarLike) -> List[LC]:
        """Out-of-circuit computed values (gnark solver hints,
        prover.go:68).  fn(list_of_int_inputs) -> list_of_int_outputs.

        In compile mode each hint records its schedule position (number of
        constraints emitted so far) so the native two-pass solver
        (circuit/solver_native.py) can replay hints in program order.
        Hint closures carrying a `_native` tag get a C++ implementation;
        untagged hints fall back to a python callback."""
        in_lcs = [_as_lc(v) for v in ins]
        if self.solve:
            outs = fn([self.eval_lc(v) for v in in_lcs])
            if len(outs) != n_out:
                raise ValueError("hint output arity mismatch")
            return [self._internal(int(o) % MOD) for o in outs]
        out_vars = [self._internal(None) for _ in range(n_out)]
        self.hints.append((fn, in_lcs,
                           [next(iter(o.terms)) for o in out_vars],
                           len(self.constraints)))
        return out_vars

    def is_zero(self, a: VarLike) -> LC:
        a = _as_lc(a)

        def inv_hint(ins):
            v = ins[0]
            return [pow(v, MOD - 2, MOD) if v else 0, 1 if v == 0 else 0]

        inv_hint._native = ("iszero",)
        inv, b = self.new_hint(inv_hint, 2, a)
        # b == 1 - a*inv ; a*b == 0
        self._emit(a, inv, self.sub(1, b))
        self._emit(a, b, LC())
        if self.solve:
            av = self.eval_lc(a)
            bv = self.eval_lc(b)
            self._check(bv == (1 if av == 0 else 0), "is_zero hint mismatch")
        return b

    def select(self, cond: VarLike, a: VarLike, b: VarLike) -> LC:
        """cond*a + (1-cond)*b (cond must be boolean; not asserted here,
        matching gnark api.Select)."""
        return self.add(self.mul(cond, self.sub(a, b)), b)

    def to_binary(self, v: VarLike, nbits: int) -> List[LC]:
        """Bit decomposition, low to high (gnark api.ToBinary)."""
        v = _as_lc(v)

        def bits_hint(ins):
            x = ins[0]
            return [(x >> i) & 1 for i in range(nbits)]

        bits_hint._native = ("bits", nbits)
        bits = self.new_hint(bits_hint, nbits, v)
        acc = LC()
        for i, b in enumerate(bits):
            self.assert_is_boolean(b)
            acc = self.add(acc, self.scale(b, 1 << i))
        self.assert_is_equal(acc, v)
        return bits

    def range_check(self, v: VarLike, nbits: int) -> None:
        """rangecheck.New(api).Check(v, nbits) — lookup-based, matching the
        reference's commitment rangecheck encoding
        (batch_create_user_circuit.go:110 via gnark std/rangecheck):
        decompose v into W-bit limbs (hint), prove each limb is in the
        shared 2^W identity table via logUp, and recompose.  A partial top
        limb r < W is additionally checked shifted by 2^(W-r) (gnark's
        shift trick).  ~nbits/W + 2 constraints per check instead of
        nbits + 1 for bit decomposition."""
        W = self.range_bits
        if nbits <= 0:
            raise ValueError("nbits must be positive")
        v = _as_lc(v)
        n_limbs = (nbits + W - 1) // W
        rem = nbits - (n_limbs - 1) * W          # bits in the top limb

        table = self._get_range_table()

        def limbs_hint(ins):
            x = ins[0]
            return [(x >> (W * i)) & ((1 << W) - 1) for i in range(n_limbs)]

        limbs_hint._native = ("limbs", W)
        limbs = self.new_hint(limbs_hint, n_limbs, v)
        table.lookup(*limbs)
        if rem < W:
            # limb_top < 2^rem  <=>  limb_top * 2^(W-rem) < 2^W
            table.lookup(self.scale(limbs[-1], 1 << (W - rem)))
        acc = LC()
        for i, l in enumerate(limbs):
            acc = self.add(acc, self.scale(l, 1 << (W * i)))
        self.assert_is_equal(acc, v)
        if self.solve:
            val = self.eval_lc(v)
            self._check(val < (1 << nbits),
                        f"range_check failed: {val} >= 2^{nbits}")

    def _get_range_table(self):
        if self._range_table is None:
            from .gadgets import LookupTable
            t = LookupTable(self)
            for i in range(1 << self.range_bits):
                t.insert(i)
            self._range_table = t
        return self._range_table

    def cmp_nop(self, a: VarLike, b: VarLike, nbits: int,
                bounded: bool = True) -> LC:
        """Fork-only api.CmpNOp: returns -1/0/1 as field element.  Requires
        a, b < 2^nbits (caller range-checks when bounded=True)."""
        if not bounded:
            self.range_check(a, nbits)
            self.range_check(b, nbits)
        d = self.add(self.sub(a, b), 1 << nbits)      # in (0, 2^{nbits+1})
        bits = self.to_binary(d, nbits + 1)
        ge = bits[nbits]                              # a >= b
        eq = self.is_zero(self.sub(a, b))
        return self.sub(self.sub(self.scale(ge, 2), 1), eq)

    def assert_is_less_or_equal_nop(self, a: VarLike, b: VarLike, nbits: int,
                                    bounded: bool = True) -> None:
        """Fork-only api.AssertIsLessOrEqualNOp: a <= b given both < 2^nbits."""
        if not bounded:
            self.range_check(a, nbits)
            self.range_check(b, nbits)
        self.range_check(self.sub(b, a), nbits)

    # -- deferred gadget finalization (lookup arguments etc.) -----------------

    def register_finalizer(self, fn: Callable) -> None:
        """Gadgets with end-of-circuit constraints (e.g. the logUp lookup
        argument, gadgets.LookupTable) register a finalizer; it runs once
        before the constraint system is consumed (mirrors gnark's
        api.Compiler callbacks used by std/lookup/logderivlookup)."""
        self._finalizers.append(fn)

    def register_post_commit(self, wires: Sequence[LC], fn: Callable) -> None:
        """Phase-2 gadget emission that needs a random challenge bound to
        prover-chosen wires (logUp tables).  `wires` join the Pedersen
        commitment; after all finalizers ran, finalize() allocates ONE
        challenge wire c = H(commit(wires...)) and calls fn(c, index) for
        each registration (gnark api.Compiler().Commit analog, used by the
        fork's logderivlookup/rangecheck via the bsb22 commitment)."""
        self._pending_commit_wires.extend(wires)
        self._post_commit.append(fn)

    _pending_commit_wires: List[LC]

    def set_commitment_key(self, key) -> None:
        """Prove-time commitment key from the proving key:
        {"bases": [G1 affine], "sigma_bases": [G1 affine]} aligned with the
        committed-wire order.  Must be set before finalize() in solve mode
        (groth16.prove does this)."""
        self._commit_key = key

    def _wire_id(self, lc: VarLike) -> int:
        lc = _as_lc(lc)
        if len(lc.terms) == 1 and lc.const == 0:
            (v, c), = lc.terms.items()
            if c == 1:
                return v
        # materialize compound LCs into a fresh wire
        val = self.eval_lc(lc) if self.solve else None
        w = self._internal(val)
        self._emit(self.sub(lc, w), LC(const=1), LC())
        return next(iter(w.terms))

    def finalize(self) -> None:
        if self._finalized:
            return
        self._finalized = True
        self._pending_commit_wires = getattr(self, "_pending_commit_wires", [])
        for fn in self._finalizers:
            fn()
        if not self._post_commit:
            return
        wire_ids = [self._wire_id(w) for w in self._pending_commit_wires]
        cval = None
        if self.solve:
            from ..crypto.poseidon_ref import poseidon as _poseidon
            if self._commit_key is None:
                # unkeyed mode (satisfiability testing without a proving
                # key): the logUp identity holds for ANY challenge on an
                # honest witness, so bind c to the transcript by a host
                # hash.  prove() refuses such a system — it sets the real
                # key before the first finalize.
                vals = [self.values[w] for w in wire_ids]
                cval = _poseidon(vals or [0])
                self._commit_result = None
            else:
                from ..crypto import bn254 as bn
                bases = self._commit_key["bases"]
                sigma_bases = self._commit_key["sigma_bases"]
                if len(bases) != len(wire_ids):
                    raise ValueError("commitment key length mismatch")
                zs = [self.values[w] for w in wire_ids]
                from ..ops import msm as _msm
                if len(bases) > 1024 and not _msm._host_only():
                    # device MSM: the host loop costs ~1ms per scalar mul
                    # and transcripts run to 10^5-10^6 committed wires.
                    # uint8 bases are cached on the commitment key so the
                    # prover service uploads them once per tier.
                    from ..ops import msm_device as _md
                    db = self._commit_key.get("_dev_bases")
                    if db is None:
                        db = (_md.device_base("g1", bases),
                              _md.device_base("g1", sigma_bases))
                        self._commit_key["_dev_bases"] = db
                    plan = _md.ScalarPlan(zs)
                    d_pt = _md.msm("g1", db[0], plan=plan)
                    pok = _md.msm("g1", db[1], plan=plan)
                elif len(bases) > 1024:
                    d_pt = _msm.msm_g1(bases, zs)
                    pok = _msm.msm_g1(sigma_bases, zs)
                else:
                    d_pt = None
                    pok = None
                    for z, b, sb in zip(zs, bases, sigma_bases):
                        d_pt = bn.g1_add(d_pt, bn.g1_mul(b, z))
                        pok = bn.g1_add(pok, bn.g1_mul(sb, z))
                # upstream gnark's bsb22 challenge: SHA-256 hash-to-field
                # over the marshalled commitment (groth16/hash_to_field.py)
                from ..groth16.hash_to_field import bsb22_challenge
                cval = bsb22_challenge(d_pt)
                self._commit_result = (d_pt, pok, cval)
        # phase boundary for the native two-pass solver: everything below
        # this constraint index (and hint index — multiplicity hints sit
        # exactly at the boundary) is solvable before the commitment exists
        self._solver_commit_boundary = len(self.constraints)
        self._solver_commit_hint_boundary = len(self.hints)
        c = self._internal(cval)
        self.commitment = {"wires": wire_ids,
                           "challenge": next(iter(c.terms))}
        for i, fn in enumerate(self._post_commit):
            fn(c, i)

    # -- satisfiability -------------------------------------------------------

    def eval_terms(self, terms: Sequence[Tuple[int, int]]) -> int:
        return sum(c * self.values[v] for v, c in terms) % MOD

    def is_satisfied(self) -> bool:
        if not self.solve:
            raise RuntimeError("is_satisfied requires solve mode")
        try:
            self.finalize()
        except UnsatisfiedConstraint:
            return False
        for a, b, c in self.constraints:
            if (self.eval_terms(a) * self.eval_terms(b) - self.eval_terms(c)) % MOD:
                return False
        return True

    def witness_vector(self) -> List[int]:
        self.finalize()
        return list(self.values)
