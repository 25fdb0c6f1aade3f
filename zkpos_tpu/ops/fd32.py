"""Modulus-parametric f32 digit-vector modular arithmetic (TPU engine).

Generalizes ops/fr_f32.py (the Poseidon Fr engine — see its docstring for
the exactness argument) to any <=255-bit odd modulus, packaged as a class so
the BN254 base field Fp (G1/G2 coordinates) gets the same fast path.  Used
by the Pippenger MSM / EC kernels (ops/ec_f32.py, ops/msm.py) that replace
gnark-crypto's MSM inside groth16.Prove (reference prover.go:269).

Representation: x -> (34, ...) float32 base-256 digits, Montgomery domain
R = 2^272.  All arithmetic is exact integer arithmetic in f32 (every
intermediate < 2^24); see ops/fr_f32.py for the bound derivations.

Laziness model (differs from fr_f32 which keeps (1+eps)p):
  * digits are always kept canonical (0..255) by carry ripples — an array's
    VALUE is what is lazy, bounded by k*p for small k (callers track k)
  * mont products of values < 2^257 (i.e. <= ~8p) are safe:
        t = a*b < 2^514,  out = (t + m*p)/R < 2^242 + (1+eps)p < 1.01*p
  * add(a, b): value a+b, digits rippled; sub(a, b, k): value a + k*p - b
    (choose k so the result is positive: k >= ceil(bound(b)/p))
  * equality-with-zero on lazy values uses an extra Montgomery reduction
    (`is_zero_modp`), never raw digit comparison
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

NDIGITS = 34                   # 34 * 8 = 272 bits
RBITS = 272
NCONV = 2 * NDIGITS - 1


def _digits_of(v: int, n: int = NDIGITS) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(n)],
                    dtype=np.float32)


class Fd32:
    """f32 digit-vector Montgomery arithmetic mod an arbitrary prime."""

    def __init__(self, modulus: int):
        assert modulus % 2 == 1 and modulus.bit_length() <= 255
        self.modulus = modulus
        self.r_mont = (1 << RBITS) % modulus
        self.r2_mont = (self.r_mont * self.r_mont) % modulus
        self.n_inv = (-pow(modulus, -1, 1 << RBITS)) % (1 << RBITS)

    # -- host conversions (native C++ bridge with numpy fallback) -------------

    def _native_which(self):
        from ..utils import native
        if self.modulus == 21888242871839275222246405745257275088548364400416034343698204186575808495617:  # noqa: E501
            return native.FR_IDX
        if self.modulus == 21888242871839275222246405745257275088696311157297823662689037894645226208583:  # noqa: E501
            return native.FP_IDX
        return None

    def ints_to_digits(self, values) -> np.ndarray:
        """iterable[int] -> (34, N) float32 canonical digits."""
        m = self.modulus
        values = list(values)
        which = self._native_which()
        if which is not None and len(values) >= 256:
            from ..utils import native
            out = native.u256_to_digits(native.ints_to_limbs(values, m))
            if out is not None:
                return out
        buf = b"".join(int(v % m).to_bytes(NDIGITS, "little") for v in values)
        n = len(buf) // NDIGITS
        a = np.frombuffer(buf, dtype=np.uint8).reshape(n, NDIGITS)
        return np.ascontiguousarray(a.T).astype(np.float32)

    def digits_to_ints(self, d) -> list:
        """(34, N) digits (any lazy bound < 2^52 per digit) -> list[int] mod p."""
        a = np.asarray(d, dtype=np.float64).reshape(NDIGITS, -1)
        which = self._native_which()
        if which is not None and a.shape[1] >= 256:
            from ..utils import native
            out = native.digits_to_u256(a, which)
            if out is not None:
                return native.limbs_to_ints(out)
        # float64 carry ripple so any lazy digits normalize exactly
        carry = np.zeros(a.shape[1], dtype=np.float64)
        digs = np.empty((a.shape[1], NDIGITS + 8), dtype=np.uint8)
        for i in range(NDIGITS):
            s = a[i] + carry
            carry = np.floor(s / 256.0)
            digs[:, i] = (s - 256.0 * carry).astype(np.uint8)
        for i in range(8):  # residual carry (value may exceed 2^272 when lazy)
            nxt = np.floor(carry / 256.0)
            digs[:, NDIGITS + i] = (carry - 256.0 * nxt).astype(np.uint8)
            carry = nxt
        m = self.modulus
        return [int.from_bytes(row.tobytes(), "little") % m for row in digs]

    def const_digits(self, v: int, mont: bool = True) -> np.ndarray:
        if mont:
            v = (v * self.r_mont) % self.modulus
        return _digits_of(v % self.modulus).reshape(NDIGITS, 1)

    # -- constant matrices ----------------------------------------------------

    @lru_cache(maxsize=None)
    def _reduce_mats(self):
        """(W_n, W_p) numpy f32: Montgomery reduction matmul weights.
        (Cached as numpy — never cache tracers; see fr_f32.py note.)"""
        nd = _digits_of(self.n_inv)
        w_n = np.zeros((NDIGITS, NDIGITS), dtype=np.float32)
        for k in range(NDIGITS):
            w_n[k, :k + 1] = nd[k::-1]
        pd = _digits_of(self.modulus)
        w_p = np.zeros((2 * NDIGITS, NDIGITS), dtype=np.float32)
        for k in range(2 * NDIGITS):
            lo = max(0, k - NDIGITS + 1)
            hi = min(k, NDIGITS - 1)
            for i in range(lo, hi + 1):
                w_p[k, i] = pd[k - i]
        return w_n, w_p

    @lru_cache(maxsize=None)
    def _kp_digits(self, k: int) -> tuple:
        return tuple(_digits_of(k * self.modulus).tolist())

    # -- device primitives ----------------------------------------------------

    @staticmethod
    def conv(a, b):
        """Raw digit-product coefficients (34,...)x(34,...) -> (67,...).

        Two lowerings, bit-identical: on CPU a single grouped
        lax.conv_general_dilated op (compiles ~30x faster — the unrolled
        form makes XLA:CPU graphs huge, and the CPU path only backs tests
        and small fallbacks); elsewhere the unrolled shifted-FMA form the
        TPU fuses well."""
        B = a.shape[1:]
        if jax.default_backend() == "cpu":
            n = 1
            for s in B:
                n *= s
            if n == 0:      # associative_scan probes zero-length slices
                return jnp.zeros((NCONV,) + B, dtype=jnp.float32)
            lhs = a.reshape(NDIGITS, n).T[None]          # (1, n, 34)
            rhs = b.reshape(NDIGITS, n).T[:, None, ::-1]  # (n, 1, 34)
            out = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1,),
                padding=[(NDIGITS - 1, NDIGITS - 1)],
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=n,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return out[0].T.reshape((NCONV,) + B)
        acc = jnp.zeros((NCONV,) + B, dtype=jnp.float32)
        for i in range(NDIGITS):
            acc = acc.at[i:i + NDIGITS].add(a[i][None] * b)
        return acc

    @staticmethod
    def _ripple(c, n):
        inv = jnp.float32(1.0 / 256.0)
        if jax.default_backend() == "cpu":
            # scan form: ~8x smaller graphs (XLA:CPU compile time is the
            # test-suite bottleneck); bit-identical to the unrolled chain
            def body(carry, row):
                s = row + carry
                cy = jnp.floor(s * inv)
                return cy, s - 256.0 * cy
            carry, digs = jax.lax.scan(
                body, jnp.zeros(c.shape[1:], dtype=jnp.float32), c[:n])
            return digs, carry
        digs = []
        carry = jnp.zeros(c.shape[1:], dtype=jnp.float32)
        for i in range(n):
            s = c[i] + carry
            carry = jnp.floor(s * inv)
            digs.append(s - 256.0 * carry)
        return jnp.stack(digs), carry

    def reduce_mont(self, t):
        """(67,...) raw coeffs -> (34,...) digits; out == t * R^-1 (mod p),
        out < 1.01 p for t < 2^514."""
        w_n_np, w_p_np = self._reduce_mats()
        w_n, w_p = jnp.asarray(w_n_np), jnp.asarray(w_p_np)
        t_lo, t_lo_carry = self._ripple(t, NDIGITS)
        m_c = jnp.einsum("ki,i...->k...", w_n, t_lo,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        m, _ = self._ripple(m_c, NDIGITS)
        mp = jnp.einsum("ki,i...->k...", w_p, m,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        carry = t_lo_carry
        inv = jnp.float32(1.0 / 256.0)
        if jax.default_backend() == "cpu":
            def body(cy, pair):
                tl, mpi = pair
                return jnp.floor((tl + mpi + cy) * inv), None
            lo_carry, _ = jax.lax.scan(
                body, jnp.zeros(t.shape[1:], dtype=jnp.float32),
                (t_lo, mp[:NDIGITS]))
        else:
            lo_carry = jnp.zeros(t.shape[1:], dtype=jnp.float32)
            for i in range(NDIGITS):
                s = t_lo[i] + mp[i] + lo_carry
                lo_carry = jnp.floor(s * inv)
        hi = []
        for k in range(NDIGITS):
            v = mp[NDIGITS + k]
            if NDIGITS + k < NCONV:
                v = v + t[NDIGITS + k]
            hi.append(v)
        hi[0] = hi[0] + lo_carry + carry
        out, _ = self._ripple(jnp.stack(hi), NDIGITS)
        return out

    def mont_mul(self, a, b):
        return self.reduce_mont(self.conv(a, b))

    def add(self, a, b):
        s, _ = self._ripple(a + b, NDIGITS)
        return s

    def sub(self, a, b, k: int = 2):
        """a + k*p - b (value!); caller picks k >= bound(b)/p so it's >= 0."""
        kp = jnp.asarray(np.asarray(self._kp_digits(k), dtype=np.float32))
        kp = kp.reshape((NDIGITS,) + (1,) * (a.ndim - 1))
        s, _ = self._ripple(a + kp - b, NDIGITS)
        return s

    def dbl(self, a):
        s, _ = self._ripple(a + a, NDIGITS)
        return s

    def to_mont(self, a):
        r2 = jnp.asarray(self.const_digits(self.r2_mont, mont=False))
        return self.mont_mul(a, jnp.broadcast_to(
            r2.reshape((NDIGITS,) + (1,) * (a.ndim - 1)), a.shape))

    def from_mont(self, a):
        pad = [(0, NCONV - NDIGITS)] + [(0, 0)] * (a.ndim - 1)
        return self.canonical(self.reduce_mont(jnp.pad(a, pad)))

    def canonical(self, d, rounds: int = 2):
        """Exact mod-p normalization of a (1+eps)p-bounded value."""
        pd = jnp.asarray(_digits_of(self.modulus)).reshape(
            (NDIGITS,) + (1,) * (d.ndim - 1))
        for _ in range(rounds):
            ge = self._ge_digits(d, pd)
            d = jnp.where(ge[None], self._sub_digits(d, pd), d)
        return d

    @staticmethod
    def _ge_digits(a, p):
        gt = jnp.zeros(a.shape[1:], dtype=bool)
        lt = jnp.zeros(a.shape[1:], dtype=bool)
        for i in reversed(range(NDIGITS)):
            pi = jnp.broadcast_to(p[i], a.shape[1:])
            gt = gt | (~lt & (a[i] > pi))
            lt = lt | (~gt & (a[i] < pi))
        return ~lt

    @staticmethod
    def _sub_digits(a, p):
        out = []
        borrow = jnp.zeros(a.shape[1:], dtype=jnp.float32)
        for i in range(NDIGITS):
            d = a[i] - jnp.broadcast_to(p[i], a.shape[1:]) - borrow + 256.0
            borrow = 1.0 - jnp.floor(d * (1.0 / 256.0))
            out.append(d - 256.0 * (1.0 - borrow))
        return jnp.stack(out)

    # -- predicates -----------------------------------------------------------

    @staticmethod
    def is_zero_exact(a):
        """All digits exactly zero (for values with an exact-0 invariant,
        e.g. Jacobian Z of the identity)."""
        acc = jnp.ones(a.shape[1:], dtype=bool)
        for i in range(NDIGITS):
            acc = acc & (a[i] == 0.0)
        return acc

    def is_zero_modp(self, a):
        """value(a) ≡ 0 (mod p) for any lazy a < 2^272: one Montgomery
        reduction maps a -> y = a/R (mod p) with y < 1.01p; then a ≡ 0
        iff y ∈ {0, p} (y is a multiple of p bounded by 1.01p)."""
        pad = [(0, NCONV - NDIGITS)] + [(0, 0)] * (a.ndim - 1)
        y = self.reduce_mont(jnp.pad(a, pad))
        pd = jnp.asarray(_digits_of(self.modulus)).reshape(
            (NDIGITS,) + (1,) * (a.ndim - 1))
        is_p = jnp.ones(a.shape[1:], dtype=bool)
        for i in range(NDIGITS):
            is_p = is_p & (y[i] == jnp.broadcast_to(pd[i], a.shape[1:]))
        return self.is_zero_exact(y) | is_p


FR = Fd32(21888242871839275222246405745257275088548364400416034343698204186575808495617)
FP = Fd32(21888242871839275222246405745257275088696311157297823662689037894645226208583)
