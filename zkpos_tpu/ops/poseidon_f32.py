"""Poseidon over the f32 digit engine (ops/fr_f32) — pure-jnp/XLA path.

Same parameters and composition rules as ops/poseidon.py (bit-compatible
2-input node hash vs the reference fork, COMPAT.md), but ~an order of
magnitude faster on TPU:

  * sbox x^5 products: f32 FMA convolutions (VPU native rate)
  * MDS mix: ONE constant einsum per round over all t lanes and all digit
    positions (MXU), producing raw product coefficients
  * ark: folded into the Montgomery reduction's bias add — zero extra cost
  * Montgomery reductions batched across the t state lanes

State layout: (34, t, B) f32 digits, Montgomery domain (R = 2^272).

Reference: poseidon usage at merkletree.go:251-259, utils.go:744-777,
constants.go:126 (native), circuit/utils.go:17 (gadget — same constants).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bn254 import R as MODULUS
from ..crypto import poseidon_params as pp
from ..crypto.poseidon_ref import OUTPUT_INDEX
from . import fr_f32 as fd

NDIGITS = fd.NDIGITS
NCONV = fd.NCONV


@lru_cache(maxsize=None)
def _params(t: int):
    """Returns (ark0, biases, W_mix, r_p):
    ark0   (34, t)            — first-round constants (mont digits)
    biases (rounds, 34, t)    — round r's mix-output bias = ark of round r+1
                                (zeros for the last round)
    W_mix  (t, NCONV, t, 34)  — Toeplitz blocks of mont MDS digits
    """
    consts, mds = pp.generate_params(t)
    r_p = pp.partial_rounds(t)
    rounds = pp.R_FULL + r_p

    def mont_digits(v):
        return fd._digits_of((v * fd.R_MONT) % MODULUS, NDIGITS)

    ark0 = np.stack([mont_digits(consts[i]) for i in range(t)], axis=1)
    biases = np.zeros((rounds, NDIGITS, t), dtype=np.float32)
    for r in range(rounds - 1):
        for i in range(t):
            biases[r, :, i] = mont_digits(consts[(r + 1) * t + i])

    w = np.zeros((t, NCONV, t, NDIGITS), dtype=np.float32)
    for i in range(t):
        for j in range(t):
            md = mont_digits(mds[i][j])
            for k in range(NCONV):
                for d in range(NDIGITS):
                    if 0 <= k - d < NDIGITS:
                        w[i, k, j, d] = md[k - d]
    # numpy, NOT jnp: jnp constants created inside a jit trace are tracers
    # and must never be cached across traces (leaked-tracer bug)
    return (ark0.astype(np.float32), biases, w, r_p)


def _sbox(x):
    """x^5 on (34, n, B) digit lanes."""
    x2 = fd.mont_mul(x, x)
    x4 = fd.mont_mul(x2, x2)
    return fd.mont_mul(x4, x)


def _mix_reduce(s, w_mix, bias):
    """s (34, t, B) -> mix raw coeffs via one einsum -> batched reduce
    with the next round's ark folded in as bias."""
    t_raw = jnp.einsum("ikjd,dj...->ki...", w_mix, s,
                       preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return fd.reduce_mont(t_raw, bias=bias[:, :, None])


def permute(state, t: int):
    """Poseidon permutation on (34, t, B) mont digits."""
    ark0_np, biases_np, w_mix_np, r_p = _params(t)
    ark0 = jnp.asarray(ark0_np)
    biases = jnp.asarray(biases_np)
    w_mix = jnp.asarray(w_mix_np)
    half = pp.R_FULL // 2

    state = fd.add(state, ark0[:, :, None])

    def full_body(s, bias):
        return _mix_reduce(_sbox(s), w_mix, bias), None

    def partial_body(s, bias):
        s0 = _sbox(s[:, 0:1, :])
        s = jnp.concatenate([s0, s[:, 1:, :]], axis=1)
        return _mix_reduce(s, w_mix, bias), None

    state, _ = jax.lax.scan(full_body, state, biases[:half])
    state, _ = jax.lax.scan(partial_body, state, biases[half:half + r_p])
    state, _ = jax.lax.scan(full_body, state, biases[half + r_p:])
    return state


@partial(jax.jit, static_argnums=1)
def hash_n_mont(inputs_mont, n: int):
    """inputs (34, n, B) mont digits -> digest (34, B), n <= 16."""
    if not (1 <= n <= 16):
        raise ValueError("hash_n_mont handles 1..16 inputs per permutation")
    zero = jnp.zeros_like(inputs_mont[:, 0:1, :])
    state = jnp.concatenate([zero, inputs_mont], axis=1)
    return permute(state, n + 1)[:, OUTPUT_INDEX, :]


@jax.jit
def hash2_mont(a, b):
    """Merkle node hash: (34, B) x (34, B) -> (34, B), mont digits."""
    return hash_n_mont(jnp.stack([a, b], axis=1), 2)


@partial(jax.jit, static_argnums=1)
def hash_chain_mont(inputs_mont, n: int):
    """Variadic hash for n > 16 (chain rule, COMPAT.md)."""
    if n <= 16:
        return hash_n_mont(inputs_mont, n)
    digest = hash_n_mont(inputs_mont[:, :16, :], 16)
    pos = 16
    while pos < n:
        chunk = inputs_mont[:, pos:pos + 15, :]
        k = chunk.shape[1]
        block = jnp.concatenate([digest[:, None, :], chunk], axis=1)
        digest = hash_n_mont(block, k + 1)
        pos += 15
    return digest


# --- host-facing helpers ------------------------------------------------------

def to_mont(d):
    return fd.to_mont(d)


def from_mont(d):
    return fd.from_mont(d)


def hash_batch(inputs) -> list:
    """inputs: (n, B) rows of python ints -> list of B digest ints."""
    n = len(inputs)
    digs = np.stack([fd.ints_to_digits(list(row)) for row in inputs], axis=1)
    mont = fd.to_mont(jnp.asarray(digs.reshape(NDIGITS, -1))).reshape(
        (NDIGITS, n, -1))
    digest = hash_chain_mont(mont, n) if n > 16 else hash_n_mont(mont, n)
    return fd.digits_to_ints(fd.from_mont(digest))
