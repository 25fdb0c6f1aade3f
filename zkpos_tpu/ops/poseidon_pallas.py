"""Pallas TPU kernel: fused Poseidon(2) permutation.

The pure-jnp path (ops.poseidon) materializes the (16, t, B) state between
rounds in HBM whenever XLA decides not to fuse the whole scan; this kernel
keeps the entire 65-round permutation resident in VMEM per batch tile —
one HBM read of the inputs and one write of the digests.

Layout per grid step: inputs a, b as (16, TILE) uint32 limb blocks; round
constants prefetched as (rounds*3, 16) and the 3x3 MDS as (9, 16), both in
VMEM (Montgomery form).  The batch axis rides the 128-wide lane dimension.

Used by merkle tree builds via `hash2_mont_pallas` (same signature as
ops.poseidon.hash2_mont); enable with ZKPOS_USE_PALLAS=1 (off by default —
the jnp path remains the reference implementation).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto import poseidon_params as pp
from ..crypto.poseidon_ref import OUTPUT_INDEX
from . import fr
from .poseidon import _mont_params

TILE = 512
NL = fr.NLIMBS
MASK = fr.MASK
N0_INV = fr.N0_INV


def _mont_mul_block(a, b, mod):
    """(16, TILE) x (16, TILE) Montgomery product inside the kernel.
    mod: (16,) uint32 modulus limbs (broadcast)."""
    t = [jnp.zeros(a.shape[1:], dtype=jnp.uint32)
         for _ in range(2 * NL + 1)]
    for i in range(NL):
        p = a[i][None, :] * b          # (16, TILE)
        for j in range(NL):
            t[i + j] = t[i + j] + (p[j] & MASK)
            t[i + j + 1] = t[i + j + 1] + (p[j] >> 16)
    for i in range(NL):
        t[i + 1] = t[i + 1] + (t[i] >> 16)
        ti = t[i] & MASK
        m = (ti * N0_INV) & MASK
        p = m[None, :] * mod[:, None]
        lo0 = ti + (p[0] & MASK)
        t[i + 1] = t[i + 1] + (lo0 >> 16)
        for j in range(1, NL):
            t[i + j] = t[i + j] + (p[j] & MASK)
        for j in range(NL):
            t[i + j + 1] = t[i + j + 1] + (p[j] >> 16)
    # normalize + conditional subtract
    limbs = []
    carry = jnp.zeros_like(t[NL])
    for i in range(NL):
        s = t[NL + i] + carry
        limbs.append(s & MASK)
        carry = s >> 16
    res = jnp.stack(limbs)
    return _cond_sub(res, mod)


def _cond_sub(a, mod):
    gt = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    lt = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    for i in reversed(range(NL)):
        mi = mod[i][None]
        gt = gt | (~lt & (a[i] > mi))
        lt = lt | (~gt & (a[i] < mi))
    ge = ~lt
    out = []
    borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    for i in range(NL):
        d = a[i] + (1 << 16) - mod[i][None] - borrow
        out.append(d & MASK)
        borrow = 1 - (d >> 16)
    sub = jnp.stack(out)
    return jnp.where(ge[None], sub, a)


def _add_mod(a, b, mod):
    limbs = []
    carry = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
    for i in range(NL):
        s = a[i] + b[i] + carry
        limbs.append(s & MASK)
        carry = s >> 16
    return _cond_sub(jnp.stack(limbs), mod)


def _hash2_kernel(a_ref, b_ref, consts_ref, mds_ref, mod_ref, out_ref):
    mod = mod_ref[:, 0]
    r_p = pp.partial_rounds(3)
    half = pp.R_FULL // 2
    state = [jnp.zeros_like(a_ref[...]), a_ref[...], b_ref[...]]

    def sbox(x):
        x2 = _mont_mul_block(x, x, mod)
        x4 = _mont_mul_block(x2, x2, mod)
        return _mont_mul_block(x4, x, mod)

    def mix(st):
        out = []
        for i in range(3):
            acc = None
            for j in range(3):
                mij = mds_ref[3 * i + j, :]
                term = _mont_mul_block(
                    jnp.broadcast_to(mij[:, None], st[j].shape), st[j], mod)
                acc = term if acc is None else _add_mod(acc, term, mod)
            out.append(acc)
        return out

    def ark(st, r):
        return [_add_mod(
            st[i],
            jnp.broadcast_to(consts_ref[3 * r + i, :][:, None], st[i].shape),
            mod) for i in range(3)]

    rnd = 0
    for _ in range(half):
        state = mix([sbox(x) for x in ark(state, rnd)])
        rnd += 1

    def partial_body(r, st):
        s0, s1, s2 = st
        s0 = _add_mod(s0, jnp.broadcast_to(
            consts_ref[3 * r + 0, :][:, None], s0.shape), mod)
        s1 = _add_mod(s1, jnp.broadcast_to(
            consts_ref[3 * r + 1, :][:, None], s1.shape), mod)
        s2 = _add_mod(s2, jnp.broadcast_to(
            consts_ref[3 * r + 2, :][:, None], s2.shape), mod)
        s0 = sbox(s0)
        return tuple(mix([s0, s1, s2]))

    state = list(jax.lax.fori_loop(half, half + r_p, partial_body,
                                   tuple(state)))
    rnd = half + r_p
    for _ in range(half):
        state = mix([sbox(x) for x in ark(state, rnd)])
        rnd += 1
    out_ref[...] = state[OUTPUT_INDEX]


@functools.lru_cache(maxsize=None)
def _consts_arrays():
    c_np, m_np, r_p = _mont_params(3)           # (rounds, 16, 3), (16, 3, 3)
    rounds = c_np.shape[0]
    consts = np.transpose(c_np, (0, 2, 1)).reshape(rounds * 3, NL)
    mds = np.transpose(m_np, (1, 2, 0)).reshape(9, NL)
    mod = fr.MOD_LIMBS.reshape(NL, 1)
    return (consts.astype(np.uint32), mds.astype(np.uint32),
            mod.astype(np.uint32))


@jax.jit
def hash2_mont_pallas(a, b):
    """Drop-in for ops.poseidon.hash2_mont: (16, B) x (16, B) -> (16, B)."""
    B = a.shape[1]
    pad = (-B) % TILE
    if pad:
        z = jnp.zeros((NL, pad), dtype=jnp.uint32)
        a = jnp.concatenate([a, z], axis=1)
        b = jnp.concatenate([b, z], axis=1)
    consts, mds, mod = (jnp.asarray(x) for x in _consts_arrays())
    n_tiles = a.shape[1] // TILE
    out = pl.pallas_call(
        _hash2_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((NL, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(consts.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mds.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mod.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NL, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NL, a.shape[1]), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(a, b, consts, mds, mod)
    return out[:, :B]


def use_pallas() -> bool:
    return os.environ.get("ZKPOS_USE_PALLAS", "0") == "1" or \
        jax.default_backend() == "tpu"
