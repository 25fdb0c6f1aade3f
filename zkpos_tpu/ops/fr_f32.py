"""BN254 Fr arithmetic in base-256 f32 digit vectors — the TPU-fast engine.

Why f32: the TPU VPU retires f32 FMAs at ~4x the rate of uint32 multiplies
(measured: 1075 vs 285 Gop/s on v5e-lite, scripts/micro_probe3.py), and the
MXU multiplies f32 matrices at several T/s.  All arithmetic here is EXACT:
digits are 0..255, digit products are <= 255^2, and every accumulated sum is
bounded by 102*255^2 < 2^23 < 2^24, inside f32's exact-integer range.

Representation ("d34"):  x -> (34, B) float32, x = sum_i d_i 256^i, digits
canonical-ish (lazy bound (1+eps)*p, see below).  Montgomery domain with
R = 2^272 (34 digits) rather than the minimal 2^256: the extra 18 bits of
headroom make the reduction output bound p*(t/(R*p) + 1) ~ (1+2^-17)*p, so
NO conditional subtraction is ever needed between operations — values stay
(1+eps)p-bounded through arbitrarily long mul chains (the fixed point of
c' = c^2*p/R + 1 is ~1.00002 for p ~ 0.87*2^254).

Montgomery reduction is two constant matmuls (MXU work, not VPU):
    m  = (t mod R) * n'  mod R      — lower-triangular Toeplitz of n' digits
    mp = m * p                      — full Toeplitz of p digits
then (t + mp) / R via carry ripples (VPU).  The raw product t = a*b is the
only variable*variable part and runs as an f32 FMA convolution on the VPU.

Replaces the uint32 lane engine (ops/modmath.py) on the hot paths; the two
engines are bit-equivalence-tested against each other and the python oracle.

Reference parity: this implements the gnark-crypto fr.Element arithmetic
surface (reference src/utils/utils.go:539 usage) for batched device work.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bn254 import R as MODULUS

NDIGITS = 34                   # 34 * 8 = 272 bits
RBITS = 272
R_MONT = (1 << RBITS) % MODULUS
R2_MONT = (R_MONT * R_MONT) % MODULUS
N_INV = (-pow(MODULUS, -1, 1 << RBITS)) % (1 << RBITS)   # n' = -p^-1 mod R
NCONV = 2 * NDIGITS - 1        # raw product coefficient count


def _digits_of(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(n)],
                    dtype=np.float32)


@lru_cache(maxsize=None)
def _reduce_mats():
    """(W_n, W_p): constant matmul matrices for the Montgomery reduction.

    W_n (NDIGITS, NDIGITS): m_coeff = W_n @ t_lo   (weights-first layout,
        W_n[k, i] = digit_{k-i}(n'), lower-triangular Toeplitz: coefficient
        k of (t_lo * n') truncated below R; dropped >=R terms are == 0 mod R)
    W_p (2*NDIGITS, NDIGITS): mp_coeff = W_p @ m   (full Toeplitz of p).
    """
    nd = _digits_of(N_INV, NDIGITS)
    w_n = np.zeros((NDIGITS, NDIGITS), dtype=np.float32)
    for k in range(NDIGITS):
        for i in range(k + 1):
            w_n[k, i] = nd[k - i]
    pd = _digits_of(MODULUS, NDIGITS)
    w_p = np.zeros((2 * NDIGITS, NDIGITS), dtype=np.float32)
    for k in range(2 * NDIGITS):
        for i in range(NDIGITS):
            if 0 <= k - i < NDIGITS:
                w_p[k, i] = pd[k - i]
    # numpy, NOT jnp: jnp values created inside a jit trace are tracers and
    # must never be cached across traces (leaked-tracer bug)
    return w_n, w_p


# -- host conversions ---------------------------------------------------------

def ints_to_digits(values) -> np.ndarray:
    """list[int] -> (34, B) float32 canonical digits."""
    out = np.empty((NDIGITS, len(values)), dtype=np.float32)
    for j, v in enumerate(values):
        v %= MODULUS
        for i in range(NDIGITS):
            out[i, j] = (v >> (8 * i)) & 0xFF
    return out


def digits_to_ints(d) -> list:
    arr = np.asarray(d, dtype=np.float64).reshape(NDIGITS, -1)
    out = []
    for j in range(arr.shape[1]):
        v = 0
        for i in reversed(range(NDIGITS)):
            v = (v << 8) | int(arr[i, j])
        out.append(v % MODULUS)
    return out


def const_digits(v: int, mont: bool = True) -> np.ndarray:
    """(34, 1) f32 constant, optionally in Montgomery form."""
    if mont:
        v = (v * R_MONT) % MODULUS
    return _digits_of(v % MODULUS, NDIGITS).reshape(NDIGITS, 1)


# -- device primitives (pure jnp; fused Pallas variant in poseidon_f32p) ------

def conv_digits(a, b):
    """Raw product coefficients: (34, B) x (34, B) -> (67, B) f32.

    c[k] = sum_{i+j=k} a_i b_j ; every c[k] <= 34*255^2 < 2^22 (exact).
    """
    B = a.shape[1:]
    acc = jnp.zeros((NCONV,) + B, dtype=jnp.float32)
    for i in range(NDIGITS):
        acc = acc.at[i:i + NDIGITS].add(a[i][None] * b)
    return acc


def _ripple(c, n):
    """Carry-normalize first n coefficient slots to digits; returns
    (digits (n, B), carry (B,)).  Exact: all values < 2^24."""
    digs = []
    carry = jnp.zeros(c.shape[1:], dtype=jnp.float32)
    inv = jnp.float32(1.0 / 256.0)
    for i in range(n):
        s = c[i] + carry
        carry = jnp.floor(s * inv)
        digs.append(s - 256.0 * carry)
    return jnp.stack(digs), carry


def reduce_mont(t, bias=None):
    """Montgomery-reduce raw coefficients t (67, B) -> digits (34, B).

    out = (t + (t mod R)*n' mod R * p) / R  ==  t * R^-1  (mod p),
    bounded by (1+2^-17) * p when t comes from (1+eps)p-bounded operands.
    `bias` (34, B or 34, 1): optional digit vector added to the result
    before the final ripple (used to fold Poseidon ark constants in free).
    """
    w_n_np, w_p_np = _reduce_mats()
    w_n, w_p = jnp.asarray(w_n_np), jnp.asarray(w_p_np)
    t_lo, t_lo_carry = _ripple(t, NDIGITS)          # canonical low digits
    # m = t_lo * n' mod R  (coeffs then mod-R ripple)
    m_c = jnp.einsum("ki,i...->k...", w_n, t_lo,
                     preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    m, _ = _ripple(m_c, NDIGITS)                    # drop carry == mod R
    # mp = m * p   (full product coefficients)
    mp = jnp.einsum("ki,i...->k...", w_p, m,
                    preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    # low half of (t_lo + mp) is divisible by R: ripple for its carry only
    carry = t_lo_carry
    inv = jnp.float32(1.0 / 256.0)
    lo_carry = jnp.zeros(t.shape[1:], dtype=jnp.float32)
    for i in range(NDIGITS):
        s = t_lo[i] + mp[i] + lo_carry
        lo_carry = jnp.floor(s * inv)
    # high half: t[34:67] + mp[34:68] + carries (+ optional bias)
    hi = []
    for k in range(NDIGITS):
        v = mp[NDIGITS + k]
        if NDIGITS + k < NCONV:
            v = v + t[NDIGITS + k]
        hi.append(v)
    hi[0] = hi[0] + lo_carry + carry
    if bias is not None:
        hi = [h + jnp.broadcast_to(bias[i], h.shape)
              for i, h in enumerate(hi)]
    out, _ = _ripple(jnp.stack(hi), NDIGITS)
    return out


def mont_mul(a, b):
    """(34, B) x (34, B) -> (34, B), Montgomery domain, lazy (1+eps)p."""
    return reduce_mont(conv_digits(a, b))


def mul_const(k_mont_digits, b):
    """Constant (34,1) x (34, B) -> (34, B): Toeplitz product via einsum
    (MXU) + reduction.  k must already be in Montgomery form digits."""
    w = jnp.asarray(_toeplitz_of(
        tuple(np.asarray(k_mont_digits).ravel().tolist())))
    t = jnp.einsum("ki,i...->k...", w, b,
                   preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return reduce_mont(t)


@lru_cache(maxsize=None)
def _toeplitz_of(digs: tuple):
    w = np.zeros((NCONV, NDIGITS), dtype=np.float32)
    for k in range(NCONV):
        for i in range(NDIGITS):
            if 0 <= k - i < NDIGITS:
                w[k, i] = digs[k - i]
    return w


def add(a, b):
    """Digit-wise add + ripple (stays exact; result < 2p is fine lazily —
    only feed adds into muls, whose bounds tolerate (2+eps)p inputs once:
    conv sum <= 34*510*255 < 2^23)."""
    s, _ = _ripple(a + b, NDIGITS)
    return s


def to_mont(a):
    return mont_mul(a, jnp.broadcast_to(
        jnp.asarray(const_digits(R2_MONT, mont=False)), a.shape))


def from_mont(a):
    pad = [(0, NCONV - NDIGITS)] + [(0, 0)] * (a.ndim - 1)
    return canonical(reduce_mont(jnp.pad(a, pad)))


def canonical(d):
    """Final exact mod-p normalization for host readout: subtract p while
    >= p (at most twice for lazy inputs)."""
    pd = jnp.asarray(_digits_of(MODULUS, NDIGITS)).reshape(
        (NDIGITS,) + (1,) * (d.ndim - 1))
    for _ in range(2):
        ge = _ge_digits(d, pd)
        d = jnp.where(ge[None], _sub_digits(d, pd), d)
    return d


def _ge_digits(a, p):
    gt = jnp.zeros(a.shape[1:], dtype=bool)
    lt = jnp.zeros(a.shape[1:], dtype=bool)
    for i in reversed(range(NDIGITS)):
        pi = jnp.broadcast_to(p[i], a.shape[1:])
        gt = gt | (~lt & (a[i] > pi))
        lt = lt | (~gt & (a[i] < pi))
    return ~lt


def _sub_digits(a, p):
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.float32)
    for i in range(NDIGITS):
        d = a[i] - jnp.broadcast_to(p[i], a.shape[1:]) - borrow + 256.0
        borrow = 1.0 - jnp.floor(d * (1.0 / 256.0))
        out.append(d - 256.0 * (1.0 - borrow))
    return jnp.stack(out)
