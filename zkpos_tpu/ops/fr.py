"""Vectorized BN254 scalar-field (Fr) arithmetic for TPU.

Representation: an Fr element is 16 little-endian limbs of 16 bits held in
uint32 lanes, shape ``(16, ...)`` — limb axis leading, arbitrary batch shape
trailing (batch lands in TPU lanes).  All heavy ops (Poseidon, NTT, MSM
scalar prep) run on this representation; conversion to/from python ints or
packed uint64 tuples happens at the host boundary.

Arithmetic strategy (maps to the 8x128 TPU VPU):
  * 16-bit limbs so a limb product fits a uint32 exactly;
  * products split into lo/hi 16-bit halves before accumulation, so lazy
    column sums stay below 2**22 (no per-product carries);
  * Montgomery multiplication (R = 2**256) with a 16-step reduction over
    whole limb-vector slices (compact XLA graphs, ~100 fused element ops).

This replaces gnark-crypto's Go+asm `fr.Element` scalar arithmetic
(reference go.mod:56-57) with a lane-parallel design.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bn254 import R as MODULUS

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1

R_MONT = (1 << 256) % MODULUS
R2_MONT = (R_MONT * R_MONT) % MODULUS
N0_INV = (-pow(MODULUS, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)


def _int_to_limbs_list(v: int) -> list:
    return [(v >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)]


MOD_LIMBS = np.array(_int_to_limbs_list(MODULUS), dtype=np.uint32)


# --- host-side conversions ---------------------------------------------------

def ints_to_limbs(values) -> np.ndarray:
    """Python ints -> (16, N) uint32 canonical limbs."""
    values = [v % MODULUS for v in values]
    out = np.empty((NLIMBS, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        for i in range(NLIMBS):
            out[i, j] = (v >> (LIMB_BITS * i)) & MASK
    return out


def limbs_to_ints(limbs) -> list:
    arr = np.asarray(limbs, dtype=np.uint64).reshape(NLIMBS, -1)
    out = []
    for j in range(arr.shape[1]):
        v = 0
        for i in reversed(range(NLIMBS)):
            v = (v << LIMB_BITS) | int(arr[i, j])
        out.append(v % MODULUS)
    return out


def u64_to_limbs(values) -> np.ndarray:
    """uint64 array (any shape) -> (16, *shape) canonical limbs."""
    v = np.asarray(values, dtype=np.uint64)
    out = np.zeros((NLIMBS,) + v.shape, dtype=np.uint32)
    for i in range(4):
        out[i] = ((v >> np.uint64(LIMB_BITS * i)) & np.uint64(MASK)).astype(np.uint32)
    return out


# --- device-side primitives --------------------------------------------------

def _mod_bcast(batch_ndim):
    return jnp.asarray(MOD_LIMBS).reshape((NLIMBS,) + (1,) * batch_ndim)


def normalize(a):
    """Carry-propagate to canonical 16-bit limbs.  Assumes value < 2**256."""
    limbs = []
    carry = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        t = a[i] + carry
        limbs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(limbs)


def _ge(a, b):
    """a >= b over canonical limbs (b broadcastable)."""
    gt = jnp.zeros(a.shape[1:], dtype=bool)
    lt = jnp.zeros(a.shape[1:], dtype=bool)
    for i in reversed(range(NLIMBS)):
        gt = gt | (~lt & (a[i] > b[i]))
        lt = lt | (~gt & (a[i] < b[i]))
    return ~lt


def _sub_chain(a, b):
    """(a - b) limbwise with borrow; returns (diff, borrow_out)."""
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    for i in range(NLIMBS):
        d = a[i] + (1 << LIMB_BITS) - b[i] - borrow
        out.append(d & MASK)
        borrow = 1 - (d >> LIMB_BITS)
    return jnp.stack(out), borrow


def _add_chain(a, b):
    out = []
    carry = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    for i in range(NLIMBS):
        s = a[i] + b[i] + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(out)


def cond_sub_mod(a):
    """Subtract the modulus once where a >= modulus."""
    mod = jnp.broadcast_to(_mod_bcast(a.ndim - 1), a.shape)
    ge = _ge(a, mod)
    diff, _ = _sub_chain(a, mod)
    return jnp.where(ge[None], diff, a)


def add(a, b):
    """Modular addition (canonical in/out)."""
    return cond_sub_mod(normalize(a + b))


def sub(a, b):
    """Modular subtraction (canonical in/out)."""
    diff, borrow = _sub_chain(a, b)
    mod = jnp.broadcast_to(_mod_bcast(a.ndim - 1), a.shape)
    wrapped = _add_chain(diff, mod)
    return jnp.where((borrow > 0)[None], wrapped, diff)


def mont_mul(a, b):
    """Montgomery product a*b*2^-256 mod N.  Canonical limbs in/out."""
    batch = a.shape[1:]
    t = jnp.zeros((2 * NLIMBS + 1,) + batch, dtype=jnp.uint32)
    # full product, lazy columns (each limb < 32*2^16 ≈ 2^21)
    for i in range(NLIMBS):
        p = a[i][None] * b                      # (16, ...)
        t = t.at[i:i + NLIMBS].add(p & MASK)
        t = t.at[i + 1:i + NLIMBS + 1].add(p >> LIMB_BITS)
    # Montgomery reduction
    modj = jnp.asarray(MOD_LIMBS).reshape((NLIMBS,) + (1,) * len(batch))
    for i in range(NLIMBS):
        t = t.at[i + 1].add(t[i] >> LIMB_BITS)   # make low 16 bits of t[i] exact
        ti = t[i] & MASK
        m = (ti * N0_INV) & MASK
        p = m[None] * modj                       # (16, ...)
        lo0 = ti + (p[0] & MASK)                 # ≡ 0 mod 2^16, < 2^17
        t = t.at[i + 1].add(lo0 >> LIMB_BITS)
        t = t.at[i + 1:i + NLIMBS].add(p[1:] & MASK)
        t = t.at[i + 1:i + NLIMBS + 1].add(p >> LIMB_BITS)
    res = normalize(t[NLIMBS:2 * NLIMBS])
    return cond_sub_mod(res)


def mont_sqr(a):
    return mont_mul(a, a)


def to_mont(a):
    r2 = jnp.asarray(ints_to_limbs([R2_MONT])[:, 0]).reshape(
        (NLIMBS,) + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(r2, a.shape))


def from_mont(a):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one)


# JIT-compiled entry points (compile once per shape; the raw functions above
# remain available for composition inside larger jitted kernels).
add = jax.jit(add)
sub = jax.jit(sub)
mont_mul = jax.jit(mont_mul)
to_mont = jax.jit(to_mont)
from_mont = jax.jit(from_mont)
cond_sub_mod = jax.jit(cond_sub_mod)
normalize = jax.jit(normalize)
