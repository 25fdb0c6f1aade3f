"""Fused Pallas TPU kernel: Poseidon(2) permutation over f32 digit vectors.

The whole 65-round permutation stays in VMEM per batch tile; per tile the
HBM traffic is one read of the two input digit blocks and one write of the
digest block.  Compute split (measured rates on v5e-lite, micro_probe3):

  VPU (f32 FMA ~1 T/s): sbox x^5 digit convolutions + carry ripples
  MXU (f32 dot ~7.7 T/s): MDS mix (one 201x102 constant matmul/round),
       Montgomery m = t*n' and m*p constant matmuls

Exactness invariants (all integers, f32-exact below 2^24):
  * state digits lazily bounded <= 511 (canonical-ish base-256, one spare
    bit) — 2-pass redundant-carry ripples never fully propagate carries
  * conv coeffs <= 34*511^2 < 2^23.2 ; mix coeffs <= 102*511*255 < 2^23.7
  * matmul inputs byte-split to <= 255 (t_lo) or <= 511 (m digits)
  * the (t + m*p)/R carry out of the low 34 digits is recovered exactly
    from the top 8 coefficient rows in f32: v_lo is an exact multiple of
    R = 2^272, so round(sum_{k>=26} s_k 256^{k-34}) == v_lo/R with error
    bound 2^-5 + 2^-48 < 1/2.

Montgomery domain R = 2^272 with lazy (1+eps)p bound — no conditional
subtractions anywhere in the round loop (see ops/fr_f32.py).

Reference hot paths replaced: tree build merkletree.go:236-262, leaf
hashing witness main.go:181-189.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.bn254 import R as MODULUS
from ..crypto import poseidon_params as pp
from ..crypto.poseidon_ref import OUTPUT_INDEX
from . import fr_f32 as fd

ND = fd.NDIGITS            # 34
NC = fd.NCONV              # 67
TILE = 512                 # hashes per grid step
INV256 = float(1.0 / 256.0)


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


@functools.lru_cache(maxsize=None)
def _consts(t: int = 3):
    """Constant operands for the kernel (all float32 numpy):
    ark0   (34, t)
    biascat(34, t*rounds)  — col t*r+i = ark of round r+1, lane i
    w_mix  (t*67, t*34)    — weights-first mix: raw = W @ vstack(s_i)
    w_n3   (34, 102)       — m = W_n3 @ bytesplit3(t_lo)  (mod-R Toeplitz)
    w_p    (68, 34)        — mp = W_p @ m  (Toeplitz of p digits)
    """
    consts, mds = pp.generate_params(t)
    r_p = pp.partial_rounds(t)
    rounds = pp.R_FULL + r_p

    def mont_digits(v):
        return fd._digits_of((v * fd.R_MONT) % MODULUS, ND)

    ark0 = np.stack([mont_digits(consts[i]) for i in range(t)], axis=1)
    # biases indexed by round on the SUBLANE axis, 40 rows (8-aligned) per
    # round, so the in-kernel dynamic slice offset 40*r is provably aligned
    biascat = np.zeros((rounds * 40, t), dtype=np.float32)
    for r in range(rounds - 1):
        for i in range(t):
            biascat[r * 40:r * 40 + ND, i] = mont_digits(
                consts[(r + 1) * t + i])

    # mix output blocks padded to 72 rows so in-kernel slices land on
    # 8-aligned sublane offsets (Mosaic concat constraint)
    NCP = 72
    w_mix = np.zeros((t * NCP, t * ND), dtype=np.float32)
    for i in range(t):
        for j in range(t):
            md = mont_digits(mds[i][j])
            for k in range(NC):
                for d in range(ND):
                    if 0 <= k - d < ND:
                        w_mix[i * NCP + k, j * ND + d] = md[k - d]

    ndig = fd._digits_of(fd.N_INV, ND)
    w_n3 = np.zeros((ND, 3 * ND), dtype=np.float32)
    for plane in range(3):
        for i in range(ND):
            for k in range(ND):
                # input byte at digit position i+plane (value t_lo[i] byte
                # `plane`) contributes digit_{k-(i+plane)}(n') to m coeff k
                src = k - (i + plane)
                if 0 <= src < ND:
                    w_n3[k, plane * ND + i] = ndig[src]

    pdig = fd._digits_of(MODULUS, ND)
    # m*p rows split into offset-0 pieces: rows 34..67 (the /R output) and
    # rows 26..33 (feed the exact low-half carry estimate)
    w_p_hi = np.zeros((ND, ND), dtype=np.float32)
    w_c = np.zeros((8, ND), dtype=np.float32)
    for i in range(ND):
        for k in range(2 * ND):
            if 0 <= k - i < ND:
                if k >= ND:
                    w_p_hi[k - ND, i] = pdig[k - i]
                elif k >= ND - 8:
                    w_c[k - (ND - 8), i] = pdig[k - i]

    return (ark0.astype(np.float32), biascat, w_mix,
            w_n3.astype(np.float32), w_p_hi, w_c)


# ---- in-kernel helpers (trace-time python over jnp values) -------------------

def _shift_down(c):
    """Shift rows down by one (carry to next digit), dropping the top row."""
    return jnp.concatenate([jnp.zeros_like(c[0:1]), c[:-1]], axis=0)


def _ripple2(x, passes: int = 2):
    """Redundant-carry passes: 2 passes bound digits <= 383 given x < 2^23.8;
    a 3rd pass tightens to <= 256, which makes the digits EXACT in bf16 so
    the Montgomery/MDS constant matmuls run single-pass on the MXU instead
    of the ~6-pass f32 HIGHEST emulation (measured 37% of kernel time).
    Carries out of the top row are dropped (callers guarantee they are 0,
    or — for the mod-R m ripple — meant to be discarded)."""
    for _ in range(passes):
        c = jnp.floor(x * INV256)
        x = (x - 256.0 * c) + _shift_down(c)
    return x


def _bdot(w, x):
    """Exact bf16 matmul: w entries <= 255, x entries <= 256 (both integers,
    bf16-exact); products <= 2^16 accumulate exactly in f32 below 2^24."""
    return jax.lax.dot_general(
        w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _conv(a, b):
    """Digit convolution (34,K)x(34,K) -> (67,K); coeffs < 34*511^2.

    Residue-grouped accumulation: S_r = sum_q shift_{8q}(a_{8q+r} * b) uses
    only 8-row-aligned shifts (whole-vreg moves, no sublane rotates); the
    final c = sum_r shift_r(S_r) needs just 8 misaligned shifted adds
    instead of 34 (measured 1.72 T FMA/s vs 1.25 T for the naive pad loop,
    scripts/probe_conv.py)."""
    acc = None
    for r in range(8):
        s_r = None
        for q in range((ND - r + 7) // 8):
            i = 8 * q + r
            p = jnp.pad(a[i:i + 1] * b, ((8 * q, NC - ND - 8 * q), (0, 0)))
            s_r = p if s_r is None else s_r + p
        t = s_r if r == 0 else jnp.pad(s_r[:NC - r], ((r, 0), (0, 0)))
        acc = t if acc is None else acc + t
    return acc


def _reduce(t, wn3, wph, wc, bias=None):
    """Montgomery-reduce raw coeffs t (67,K) -> digits (34,K) <= 383."""
    t_lo = t[:ND]
    v1 = jnp.floor(t_lo * INV256)
    p0 = t_lo - 256.0 * v1
    p2 = jnp.floor(v1 * INV256)
    p1 = v1 - 256.0 * p2
    x = jnp.concatenate([p0, p1, p2], axis=0)            # (102, K) bytes
    m_c = _bdot(wn3, x)
    m = _ripple2(m_c, passes=3)                          # mod R, digits <= 256
    mp_hi = _bdot(wph, m)
    mp_c8 = _bdot(wc, m)
    # exact low-half carry via the top 8 rows (v_lo is a multiple of R)
    f = jnp.zeros_like(t[0:1])
    for j in range(8):
        k = ND - 8 + j
        f = f + (t[k:k + 1] + mp_c8[j:j + 1]) * float(2.0 ** (8 * (k - ND)))
    carry = jnp.floor(f + 0.5)
    hi = mp_hi + jnp.pad(t[ND:NC], ((0, 1), (0, 0)))
    hi = hi + jnp.pad(carry, ((0, ND - 1), (0, 0)))
    if bias is not None:
        hi = hi + bias
    return _ripple2(hi, passes=3)          # <= 256: bf16-exact for matmuls


def _sbox5(x, wn3, wph, wc):
    x2 = _reduce(_conv(x, x), wn3, wph, wc)
    x4 = _reduce(_conv(x2, x2), wn3, wph, wc)
    return _reduce(_conv(x4, x), wn3, wph, wc)


def _bcast3(cols, T):
    """(34, 3) -> (34, 3T) segmentwise broadcast."""
    return jnp.concatenate(
        [jnp.broadcast_to(cols[:, j:j + 1], (ND, T)) for j in range(3)],
        axis=1)


def _perm2_kernel(a_ref, b_ref, ark0_ref, biascat_ref, wmix_ref,
                  wn3_ref, wph_ref, wc_ref, out_ref):
    T = a_ref.shape[1]
    wn3 = wn3_ref[...]
    wph = wph_ref[...]
    wc = wc_ref[...]
    wmix = wmix_ref[...]
    r_p = pp.partial_rounds(3)
    half = pp.R_FULL // 2
    NCP = 72

    s = jnp.concatenate(
        [jnp.zeros((ND, T), jnp.float32), a_ref[...], b_ref[...]], axis=1)
    s = _ripple2(s + _bcast3(ark0_ref[...], T), passes=3)

    def mix_reduce(s, r):
        s102 = jnp.concatenate(
            [s[:, :T], s[:, T:2 * T], s[:, 2 * T:]], axis=0)
        raw = _bdot(wmix, s102)
        t67 = jnp.concatenate(
            [raw[0:NC], raw[NCP:NCP + NC], raw[2 * NCP:2 * NCP + NC]],
            axis=1)
        blk = biascat_ref[pl.ds(pl.multiple_of(40 * r, 8), 40), :]
        bias = _bcast3(blk[:ND], T)
        return _reduce(t67, wn3, wph, wc, bias=bias)

    def full_body(r, s):
        return mix_reduce(_sbox5(s, wn3, wph, wc), r)

    def partial_body(r, s):
        x5 = _sbox5(s[:, :T], wn3, wph, wc)
        return mix_reduce(jnp.concatenate([x5, s[:, T:]], axis=1), r)

    s = jax.lax.fori_loop(0, half, full_body, s)
    s = jax.lax.fori_loop(half, half + r_p, partial_body, s)
    s = jax.lax.fori_loop(half + r_p, 2 * half + r_p, full_body, s)

    out_ref[...] = s[:, OUTPUT_INDEX * T:(OUTPUT_INDEX + 1) * T]


@jax.jit
def hash2_mont_f32p(a, b):
    """Merkle node hash, digit domain: (34,B) x (34,B) -> (34,B) f32.
    Digits may be lazy (<=511); output digits <= 383."""
    B = a.shape[1]
    pad = (-B) % TILE
    if pad:
        z = jnp.zeros((ND, pad), jnp.float32)
        a = jnp.concatenate([a, z], axis=1)
        b = jnp.concatenate([b, z], axis=1)
    ark0, biascat, w_mix, w_n3, w_p_hi, w_c = (_f32(x) for x in _consts(3))
    n_tiles = a.shape[1] // TILE
    out = pl.pallas_call(
        _perm2_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ND, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ark0.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(biascat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_mix.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_n3.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_p_hi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ND, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ND, a.shape[1]), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(a, b, ark0, biascat, w_mix, w_n3, w_p_hi, w_c)
    return out[:, :B]
