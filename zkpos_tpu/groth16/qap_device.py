"""Device QAP evaluation + H(X) for groth16.Prove.

Replaces the host `_compute_h` loop (groth16/groth16.py) at scale: the
per-constraint linear combinations Az/Bz/Cz become a gather + batched
Montgomery multiply + segment-sum on device, and the six NTTs run on the
device NTT (groth16/ntt_device.py).  Mirrors gnark's H pipeline inside
groth16.Prove (reference prover.go:269: 3 iFFT + 3 coset FFT + pointwise +
1 coset iFFT).

Digit-sum exactness: segment sums add canonical digit vectors (rows <=
255) in f32; a segment of T terms stays exact while 255*T < 2^24, i.e.
T <= 65000 terms per constraint — far above the circuit's widest LC — and
the lazy VALUE bound T*p stays far inside the 34-digit range.  One
normalizing constant multiply (MXU Toeplitz) returns each row to ~1.02p.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bn254 import R as MOD
from ..ops.fd32 import FR, NDIGITS
from .ntt import root_of_unity
from .ntt_device import _const_mul, _toep, ntt_mont


@lru_cache(maxsize=None)
def _one_toep():
    return _toep(FR.r_mont % MOD)


# Cache keyed by the IDENTITY of the constraint data (FlatConstraints is
# shared between the compiled system and every per-batch solved system),
# NOT the cs wrapper object: each steady-state solve produces a fresh cs,
# and per-cs caching re-pinned ~1.2 GB of coefficient digits on device
# every cycle until prove #2 OOM'd (VERDICT r4 weak #1, reproduced).
# Strong refs are intentional — one entry per tier, the pk-cache analog.
_MATRIX_CACHE: dict = {}


def _cs_cache(cs) -> dict:
    fc = cs.constraints
    key = id(fc)
    ent = _MATRIX_CACHE.get(key)
    if ent is None or ent[0] is not fc:
        ent = (fc, {})
        _MATRIX_CACHE[key] = ent
    return ent[1]


def _matrix_arrays(cs, which: int):
    """Host-side (cached per constraint data): flatten matrix `which`
    (0=A, 1=B, 2=C) into term arrays (rows, vars, mont coeff digits)."""
    cache = _cs_cache(cs)
    if which not in cache:
        fc = cs.constraints
        if hasattr(fc, "lens"):
            # FlatConstraints fast path: ragged gather, no python per-term
            # loop; coeff digits come from ONE digit table over the small
            # coefficient pool.
            lens = np.frombuffer(fc.lens, dtype=np.uint32).astype(np.int64)
            va = np.frombuffer(fc.vars, dtype=np.uint32)
            ca = np.frombuffer(fc.coeffs, dtype=np.uint32)
            ends = np.cumsum(lens)
            starts = ends - lens
            sel = np.arange(which, len(lens), 3)
            seg_starts = starts[sel]
            seg_lens = lens[sel]
            total = int(seg_lens.sum())
            if total:
                intra = np.arange(total, dtype=np.int64) - np.repeat(
                    np.concatenate(([0], np.cumsum(seg_lens)[:-1])), seg_lens)
                offs = np.repeat(seg_starts, seg_lens) + intra
                rows = np.repeat(np.arange(len(sel), dtype=np.int64),
                                 seg_lens)
                pool_mont = [(c * FR.r_mont) % MOD for c in fc.pool]
                pool_dig = FR.ints_to_digits(pool_mont)     # (34, P)
                cache[which] = (
                    rows.astype(np.int32),
                    va[offs].astype(np.int32),
                    pool_dig[:, ca[offs]],
                )
            else:
                cache[which] = (np.zeros(0, np.int32), np.zeros(0, np.int32),
                                np.zeros((NDIGITS, 0), np.float32))
        else:
            rows, vars_, coeffs = [], [], []
            for r, con in enumerate(cs.constraints):
                for v, co in con[which]:
                    rows.append(r)
                    vars_.append(v)
                    coeffs.append((co * FR.r_mont) % MOD)
            cache[which] = (
                np.asarray(rows, dtype=np.int32),
                np.asarray(vars_, dtype=np.int32),
                FR.ints_to_digits(coeffs) if coeffs else
                np.zeros((NDIGITS, 0), np.float32),
            )
    return cache[which]


@lru_cache(maxsize=None)
def _eval_fn(n_terms: int, d: int):
    @jax.jit
    def run(z_mont, var_idx, row_idx, coeff_dig):
        zg = jnp.take(z_mont, var_idx, axis=1)          # (34, T)
        # coeff digits are pinned as uint8 (canonical digits <= 255): 4x
        # less HBM residency than f32 on the ~8 GB usable axon chip
        prod = FR.mont_mul(zg, coeff_dig.astype(jnp.float32))
        # scatter-add along the MINOR axis: keeps every temp in the fat
        # (34, N) layout (segment_sum's (T, 34) intermediate was padded
        # (T, 128) by XLA tiling — ~4x the HBM at production T)
        sums = jnp.zeros((NDIGITS, d), jnp.float32).at[:, row_idx].add(prod)
        # digit rows now reach 255*T_seg: carry-ripple back to canonical
        # digits (exact while 255*T_seg < 2^23) BEFORE the bf-weight matmul
        canon, _ = FR._ripple(sums, NDIGITS)
        return _const_mul(canon, _one_toep())           # value -> ~1.02p
    return run


def eval_matrix_device(cs, z_mont, which: int, d: int):
    rows, vars_, coeffs = _matrix_arrays(cs, which)
    if len(rows) == 0:
        return jnp.zeros((NDIGITS, d), jnp.float32)
    # pin the per-tier constant term arrays on device: re-sending the
    # ~1GB coefficient digit arrays per prove dominated compute_h on the
    # tunnel (they are as constant as the pk)
    cache = _cs_cache(cs)
    key = ("dev", which)
    if key not in cache:
        cache[key] = (jax.device_put(vars_), jax.device_put(rows),
                      jax.device_put(coeffs.astype(np.uint8)))
    dv, dr, dc = cache[key]
    return _eval_fn(len(rows), d)(z_mont, dv, dr, dc)


@lru_cache(maxsize=None)
def _coset_tables(d: int):
    """(g^i) and (g^-i * Zg^-1) mont digit tables for the coset trick
    (g = 5; Z(g x) = g^d x^d - 1 constant on the coset)."""
    g = 5
    gp = [1] * d
    for i in range(1, d):
        gp[i] = gp[i - 1] * g % MOD
    g_inv = pow(g, MOD - 2, MOD)
    z_cos_inv = pow((pow(g, d, MOD) - 1) % MOD, MOD - 2, MOD)
    gip = [z_cos_inv] * d
    for i in range(1, d):
        gip[i] = gip[i - 1] * g_inv % MOD
    mont = lambda vs: FR.ints_to_digits([(v * FR.r_mont) % MOD for v in vs])
    return mont(gp), mont(gip)


@lru_cache(maxsize=None)
def _coset_tables_dev(d: int):
    gp, gip = _coset_tables(d)
    return jax.device_put(gp), jax.device_put(gip)


@jax.jit
def _scale_jit(x, t):
    # rank-2 conv: x[:, None, :] had a size-1 axis in the minor-two dims,
    # which XLA tile-padded 8x (2.3 GB of transient at d=2^21)
    return FR.reduce_mont(FR.conv(x, jnp.broadcast_to(jnp.asarray(t),
                                                      x.shape)))


@jax.jit
def _ab_minus_c(a, b, c):
    return FR.sub(FR.mont_mul(a, b), c, k=2)


@lru_cache(maxsize=None)
def _h_fn(d: int):
    """H pipeline as SEQUENTIAL jitted stages (3 iFFT + 3 coset FFT +
    pointwise + 1 coset iFFT, exactly gnark's shape in prover.go:269).
    Two hard-won constraints at production domains (2^21+): the O(d)
    twiddle/bitrev/coset tables must be jit ARGUMENTS (as closure
    constants they inline per use and the serialized program blows the
    axon remote-compile body limit), and the pipeline must NOT be one
    fused jit (XLA's temp padding on the ripple slices — 128x on
    f32[1,32768,32] tiles — pushed a fused 2^21 graph 84MB past the
    15.75G HBM)."""

    import os as _os
    # Stage barriers ON by default on the accelerator: without them the
    # whole async pipeline (QAP evals + 6 NTTs) enqueues at once and the
    # runtime holds several stages' multi-GB transients simultaneously —
    # the reproduced steady-cycle ResourceExhausted.  With barriers the
    # same pipeline runs in ~29 s at d=2^21.  ZKPOS_H_SYNC=0 disables.
    _sync = (_os.environ.get("ZKPOS_H_SYNC", "1") == "1"
             and jax.default_backend() != "cpu")
    _trace = _os.environ.get("ZKPOS_TRACE") == "1"

    def _ck(tag, x):
        if _sync:
            import time as _t
            t0 = _t.time()
            jax.block_until_ready(x)
            float(jnp.sum(x[:, :8]))        # force through the tunnel
            if _trace:
                print(f'{{"hsync": "{tag}", "s": {_t.time() - t0:.2f}}}',
                      flush=True)
        return x

    def call(av, bv, cv):
        gp, gip = _coset_tables_dev(d)
        a_cof = _ck("ia", ntt_mont(av, inverse=True))
        b_cof = _ck("ib", ntt_mont(bv, inverse=True))
        c_cof = _ck("ic", ntt_mont(cv, inverse=True))
        a_cos = _ck("fa", ntt_mont(_ck("sa", _scale_jit(a_cof, gp))))
        b_cos = _ck("fb", ntt_mont(_ck("sb", _scale_jit(b_cof, gp))))
        c_cos = _ck("fc", ntt_mont(_ck("sc", _scale_jit(c_cof, gp))))
        h_cos = _ck("abc", _ab_minus_c(a_cos, b_cos, c_cos))
        h_cof = _ck("ih", ntt_mont(h_cos, inverse=True))
        return _scale_jit(h_cof, gip)   # un-scale; z_cos_inv in table
    return call


def compute_h_device(cs, z_ints, d: int):
    """H(X) coefficients of (A·B − C)/Z.

    `z_ints`: python int list (returns an int list) or (N, 4) uint64
    standard-form limb rows from the native solver (returns a (d-1, 4)
    uint64 array — the whole pipeline stays out of python bigints)."""
    from ..utils import native as natv
    as_limbs = isinstance(z_ints, np.ndarray)
    if as_limbs:
        # standard form -> the digit engine's 2^272 Montgomery domain:
        # one CIOS against 2^(272+256) mod r
        mont = natv.mul_const_batch(z_ints, pow(2, 272 + 256, MOD), MOD)
        z_mont = jnp.asarray(natv.u256_to_digits(mont))
    else:
        z_mont = jnp.asarray(FR.ints_to_digits(
            [(v * FR.r_mont) % MOD for v in z_ints]))
    _os = __import__("os")
    _sync = (_os.environ.get("ZKPOS_H_SYNC", "1") == "1"
             and jax.default_backend() != "cpu")
    _trace = _os.environ.get("ZKPOS_TRACE") == "1"

    def _cke(tag, x):
        if _sync:
            jax.block_until_ready(x)
            float(jnp.sum(x[:, :8]))
            if _trace:
                print(f'{{"hsync": "{tag}"}}', flush=True)
        return x

    av = _cke("evA", eval_matrix_device(cs, z_mont, 0, d))
    bv = _cke("evB", eval_matrix_device(cs, z_mont, 1, d))
    cv = _cke("evC", eval_matrix_device(cs, z_mont, 2, d))
    h = _h_fn(d)(av, bv, cv)
    if as_limbs:
        hm = natv.digits_to_u256(np.asarray(h, dtype=np.float64))
        # 2^272 Montgomery domain -> standard: CIOS against 2^-16
        out = natv.mul_const_batch(
            hm, pow(pow(2, 16, MOD), MOD - 2, MOD), MOD)
        if out[d - 1].any():
            raise ValueError("H degree too large — unsatisfied constraints?")
        return out[:d - 1]
    rinv = pow(FR.r_mont, MOD - 2, MOD)
    out = [(v * rinv) % MOD for v in FR.digits_to_ints(np.asarray(h))]
    if out[d - 1] != 0:
        raise ValueError("H degree too large — unsatisfied constraints?")
    return out[:d - 1]
