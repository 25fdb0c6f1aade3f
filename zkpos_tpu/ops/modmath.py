"""Generic vectorized modular bignum arithmetic for TPU — modulus-parametric.

Factory producing the same lane-parallel 16x16-bit Montgomery limb kernels
as ops.fr, for any <=256-bit odd modulus.  Instances: Fr (scalar field,
ops.fr) and Fp (G1/G2 coordinate field, ops.fp) of BN254.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


class ModMath:
    def __init__(self, modulus: int):
        self.modulus = modulus
        self.r_mont = (1 << 256) % modulus
        self.r2_mont = (self.r_mont * self.r_mont) % modulus
        self.n0_inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.mod_limbs = np.array(
            [(modulus >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
            dtype=np.uint32)
        self._r2_limbs = self.ints_to_limbs([self.r2_mont])[:, 0]
        # jitted entry points (per-instance)
        self.add = jax.jit(self._add)
        self.sub = jax.jit(self._sub)
        self.mont_mul = jax.jit(self._mont_mul)
        self.to_mont = jax.jit(self._to_mont)
        self.from_mont = jax.jit(self._from_mont)

    # -- host conversions -----------------------------------------------------

    def ints_to_limbs(self, values) -> np.ndarray:
        values = [v % self.modulus for v in values]
        out = np.empty((NLIMBS, len(values)), dtype=np.uint32)
        for j, v in enumerate(values):
            for i in range(NLIMBS):
                out[i, j] = (v >> (LIMB_BITS * i)) & MASK
        return out

    def limbs_to_ints(self, limbs) -> list:
        arr = np.asarray(limbs, dtype=np.uint64).reshape(NLIMBS, -1)
        out = []
        for j in range(arr.shape[1]):
            v = 0
            for i in reversed(range(NLIMBS)):
                v = (v << LIMB_BITS) | int(arr[i, j])
            out.append(v % self.modulus)
        return out

    # -- device primitives ----------------------------------------------------

    def _mod_b(self, batch_ndim):
        return jnp.asarray(self.mod_limbs).reshape(
            (NLIMBS,) + (1,) * batch_ndim)

    @staticmethod
    def normalize(a):
        limbs = []
        carry = jnp.zeros_like(a[0])
        for i in range(NLIMBS):
            t = a[i] + carry
            limbs.append(t & MASK)
            carry = t >> LIMB_BITS
        return jnp.stack(limbs)

    @staticmethod
    def _ge(a, b):
        gt = jnp.zeros(a.shape[1:], dtype=bool)
        lt = jnp.zeros(a.shape[1:], dtype=bool)
        for i in reversed(range(NLIMBS)):
            gt = gt | (~lt & (a[i] > b[i]))
            lt = lt | (~gt & (a[i] < b[i]))
        return ~lt

    @staticmethod
    def _sub_chain(a, b):
        out = []
        borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(NLIMBS):
            d = a[i] + (1 << LIMB_BITS) - b[i] - borrow
            out.append(d & MASK)
            borrow = 1 - (d >> LIMB_BITS)
        return jnp.stack(out), borrow

    @staticmethod
    def _add_chain(a, b):
        out = []
        carry = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(NLIMBS):
            s = a[i] + b[i] + carry
            out.append(s & MASK)
            carry = s >> LIMB_BITS
        return jnp.stack(out)

    def cond_sub_mod(self, a):
        mod = jnp.broadcast_to(self._mod_b(a.ndim - 1), a.shape)
        ge = self._ge(a, mod)
        diff, _ = self._sub_chain(a, mod)
        return jnp.where(ge[None], diff, a)

    def _add(self, a, b):
        return self.cond_sub_mod(self.normalize(a + b))

    def _sub(self, a, b):
        diff, borrow = self._sub_chain(a, b)
        mod = jnp.broadcast_to(self._mod_b(a.ndim - 1), a.shape)
        wrapped = self._add_chain(diff, mod)
        return jnp.where((borrow > 0)[None], wrapped, diff)

    def _mont_mul(self, a, b):
        batch = a.shape[1:]
        t = jnp.zeros((2 * NLIMBS + 1,) + batch, dtype=jnp.uint32)
        for i in range(NLIMBS):
            p = a[i][None] * b
            t = t.at[i:i + NLIMBS].add(p & MASK)
            t = t.at[i + 1:i + NLIMBS + 1].add(p >> LIMB_BITS)
        modj = jnp.asarray(self.mod_limbs).reshape(
            (NLIMBS,) + (1,) * len(batch))
        for i in range(NLIMBS):
            t = t.at[i + 1].add(t[i] >> LIMB_BITS)
            ti = t[i] & MASK
            m = (ti * self.n0_inv) & MASK
            p = m[None] * modj
            lo0 = ti + (p[0] & MASK)
            t = t.at[i + 1].add(lo0 >> LIMB_BITS)
            t = t.at[i + 1:i + NLIMBS].add(p[1:] & MASK)
            t = t.at[i + 1:i + NLIMBS + 1].add(p >> LIMB_BITS)
        res = self.normalize(t[NLIMBS:2 * NLIMBS])
        return self.cond_sub_mod(res)

    def _to_mont(self, a):
        r2 = jnp.asarray(self._r2_limbs).reshape(
            (NLIMBS,) + (1,) * (a.ndim - 1))
        return self._mont_mul(a, jnp.broadcast_to(r2, a.shape))

    def _from_mont(self, a):
        one = jnp.zeros_like(a).at[0].set(1)
        return self._mont_mul(a, one)

    # composition-friendly (non-jit) aliases
    def add_raw(self, a, b):
        return self._add(a, b)

    def sub_raw(self, a, b):
        return self._sub(a, b)

    def mul_raw(self, a, b):
        return self._mont_mul(a, b)

    def is_zero(self, a):
        """Elementwise: all limbs zero (canonical form)."""
        acc = jnp.ones(a.shape[1:], dtype=bool)
        for i in range(NLIMBS):
            acc = acc & (a[i] == 0)
        return acc

    def const_mont(self, v: int, batch_shape=()):
        """Broadcastable Montgomery-form constant."""
        limbs = self.ints_to_limbs([(v * self.r_mont) % self.modulus])[:, 0]
        return jnp.asarray(limbs).reshape((NLIMBS,) + (1,) * len(batch_shape))
