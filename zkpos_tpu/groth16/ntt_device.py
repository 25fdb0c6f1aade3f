"""Device radix-2 NTT over BN254 Fr on the f32 digit engine.

Replaces the host NTT (groth16/ntt.py) on the H(X) hot path of
groth16.Prove (reference prover.go:269 — gnark computes H via 3 iFFTs +
3 coset FFTs + 1 iFFT; we do the same domain algebra on device).

Shape of a stage (decimation-in-frequency, natural -> bit-reversed):
  view (34, blocks, 2, half):  u, v = halves
  a0 = (u + v) * 1̄            (normalizing constant mul — MXU Toeplitz)
  a1 = (u - v) * w̄[i]         (per-position twiddle — VPU digit conv)
Every output element passes through exactly one Montgomery reduction per
stage, so lazy value bounds stay stationary (~1.02p) across all log2(N)
stages.  The inverse transform runs the same stages with inverse twiddles
on bit-reversed input (DIT = reversed DIF), with 1/N folded into the last
normalization constant.

Twiddle tables are host-precomputed per (N, stage) and cached as numpy
digit arrays; the per-stage device work is ~N/2 variable-by-constant digit
convolutions (VPU) + N/2 constant matmul reductions (MXU).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bn254 import R as MOD
from ..ops.fd32 import FR, NDIGITS, NCONV
from .ntt import root_of_unity


def _toep(v_mont: int) -> np.ndarray:
    """(67, 34) f32 Toeplitz of a Montgomery-form constant (conv weights)."""
    d = [(v_mont >> (8 * i)) & 0xFF for i in range(NDIGITS)]
    w = np.zeros((NCONV, NDIGITS), dtype=np.float32)
    for k in range(NCONV):
        for i in range(max(0, k - NDIGITS + 1), min(k, NDIGITS - 1) + 1):
            w[k, i] = d[k - i]
    return w


@lru_cache(maxsize=None)
def _stage_tables(log_n: int, inverse: bool):
    """Per-stage twiddle digit arrays [(34, half)] + normalize matrices."""
    n = 1 << log_n
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, MOD - 2, MOD)
    one_t = _toep(FR.r_mont % FR.modulus)          # 1̄ = R mod p
    n_inv = pow(n, MOD - 2, MOD)
    last_t = _toep((n_inv * FR.r_mont) % FR.modulus) if inverse else one_t
    stages = []
    for j in range(log_n):
        half = n >> (j + 1)
        wj = pow(w, 1 << j, MOD)
        tw = [1] * half
        for i in range(1, half):
            tw[i] = tw[i - 1] * wj % MOD
        tw_mont = [(t * FR.r_mont) % MOD for t in tw]
        tw_dig = FR.ints_to_digits(tw_mont)        # (34, half)
        norm = last_t if (inverse and j == log_n - 1) else one_t
        stages.append((tw_dig, norm))
    return stages


@lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        for b in range(log_n):
            r = (r << 1) | ((i >> b) & 1)
        perm[i] = r
    return perm


def _const_mul(x, toep_np):
    """x (34, ...) * constant via MXU Toeplitz matmul + reduction."""
    t = jnp.einsum("ki,i...->k...", jnp.asarray(toep_np), x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return FR.reduce_mont(t)


def _twiddle_mul(x, tw_dig_np):
    """x (34, B, half) * per-position constants (34, half): VPU conv."""
    tw = jnp.asarray(tw_dig_np)[:, None, :]
    return FR.reduce_mont(FR.conv(x, jnp.broadcast_to(tw, x.shape)))


# Twiddle tables total ~34*N*4 bytes per NTT direction — at the 2^21+
# production domains they CANNOT live as HLO constants (each use is
# inlined into the serialized program; the axon remote-compile endpoint
# rejected the 2^21 H graph with HTTP 413).  They are device-cached once
# per (log_n, direction) and threaded through the jits as ARGUMENTS.

@lru_cache(maxsize=None)
def _stage_tw_dev(log_n: int, inverse: bool):
    return tuple(jax.device_put(tw)
                 for tw, _ in _stage_tables(log_n, inverse))


@lru_cache(maxsize=None)
def _bitrev_dev(log_n: int):
    return jax.device_put(_bitrev_perm(log_n))


# Minimum butterfly width kept in the MINOR dim.  XLA pads the last two
# dims of every temp to (8, 128) tiles: the naive (34, blocks, 2, half)
# view at half < 128 inflates each temporary up to 128x (a 285 MB logical
# array became multi-GB), which is what OOM'd the round-4 steady-state
# prove inside compute_h at d=2^21.  Stages whose `half` would drop below
# this threshold run on a transposed view where the minor dim is the
# (large) block count instead — one transpose in, one out.
_MIN_MINOR = 512


def _stage_op(u, v, tw_dig, norm, dit: bool):
    if dit:
        # DIT butterfly: u' = u + w v ; v' = u - w v
        wv = _twiddle_mul_bc(v, tw_dig)
        return (_const_mul(FR.add(u, wv), norm),
                _const_mul(FR.sub(u, wv, k=2), norm))
    # DIF butterfly: u' = u + v ; v' = (u - v) w
    return (_const_mul(FR.add(u, v), norm),
            _twiddle_mul_bc(FR.sub(u, v, k=2), tw_dig))


def _twiddle_mul_bc(x, tw):
    """x (34, ...) times per-position twiddles tw (broadcastable digit
    array): VPU conv + Montgomery reduce."""
    return FR.reduce_mont(FR.conv(x, jnp.broadcast_to(tw, x.shape)))


def _dif_stages(a, log_n: int, inverse: bool, reverse_order: bool, tws):
    """All stage views keep the MINOR-TWO dims fat: u/v come from
    contiguous-half slices of rank-3 views (never a size-2 axis in the
    minor-two position — XLA pads the last two dims to (8, 128) tiles, so
    a (.., 2, half) view cost 4x HBM on every stage temp, and half < 128
    cost up to 128x: the round-4 d=2^21 steady-prove OOM)."""
    n = 1 << log_n
    stages = _stage_tables(log_n, inverse)
    order = (range(log_n - 1, -1, -1) if reverse_order
             else range(log_n))
    # stages with half >= _MIN_MINOR run in the natural layout; the rest
    # run transposed (butterfly axis major, block axis minor)
    j_sw = max(log_n - 1 - (_MIN_MINOR.bit_length() - 1), 0)
    L = n >> j_sw                    # block length of the transposed tail
    m = n // L
    transposed = False
    for j in order:
        norm = stages[j][1]
        tw_dig = tws[j]
        half = n >> (j + 1)
        small = j >= j_sw and m > 1
        if small and not transposed:
            a = a.reshape(NDIGITS, m, L).transpose(0, 2, 1)  # (34, L, m)
            transposed = True
        elif transposed and not small:
            a = a.transpose(0, 2, 1).reshape(NDIGITS, n)
            transposed = False
        if transposed:
            # block (2*half, m) flattened on the minor axis: u/v are
            # contiguous halves, twiddles repeat per original position
            bl = L // (2 * half)
            v3 = a.reshape(NDIGITS, bl, 2 * half * m)
            u, v = v3[:, :, :half * m], v3[:, :, half * m:]
            tw = jnp.broadcast_to(
                jnp.asarray(tw_dig)[:, :, None],
                (NDIGITS, half, m)).reshape(NDIGITS, 1, half * m)
            a0, a1 = _stage_op(u, v, tw, norm, reverse_order)
            a = jnp.concatenate([a0, a1], axis=2).reshape(NDIGITS, L, m)
        else:
            blocks = n // (2 * half)
            v3 = a.reshape(NDIGITS, blocks, 2 * half)
            u, v = v3[:, :, :half], v3[:, :, half:]
            tw = jnp.asarray(tw_dig)[:, None, :]
            a0, a1 = _stage_op(u, v, tw, norm, reverse_order)
            a = jnp.concatenate([a0, a1], axis=2).reshape(NDIGITS, n)
    if transposed:
        a = a.transpose(0, 2, 1).reshape(NDIGITS, n)
    return a


def ntt_core(a, log_n: int, inverse: bool, tws, perm):
    """Traceable in-order -> in-order NTT body (tables as arguments)."""
    if inverse:
        a = jnp.take(a, perm, axis=1)           # DIT consumes bit-reversed
        return _dif_stages(a, log_n, True, True, tws)
    out = _dif_stages(a, log_n, False, False, tws)
    return jnp.take(out, perm, axis=1)          # DIF produces bit-reversed


@lru_cache(maxsize=None)
def _ntt_jit(log_n: int, inverse: bool):
    def run(a, tws, perm):
        return ntt_core(a, log_n, inverse, tws, perm)
    return jax.jit(run)


def ntt_mont(a, inverse: bool = False):
    """In-order -> in-order NTT of a (34, N) Montgomery digit array."""
    n = a.shape[1]
    log_n = n.bit_length() - 1
    assert (1 << log_n) == n
    return _ntt_jit(log_n, inverse)(a, _stage_tw_dev(log_n, inverse),
                                    _bitrev_dev(log_n))


# -- host-facing helpers ------------------------------------------------------

def ints_to_mont_digits(vals) -> jnp.ndarray:
    return jnp.asarray(FR.ints_to_digits([(v * FR.r_mont) % MOD
                                          for v in vals]))


def mont_digits_to_ints(d) -> list:
    rinv = pow(FR.r_mont, MOD - 2, MOD)
    return [(v * rinv) % MOD for v in FR.digits_to_ints(np.asarray(d))]
