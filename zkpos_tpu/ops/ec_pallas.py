"""Fused Pallas TPU kernel: complete projective G1 point addition.

The MSM fold (ops/msm.py) is built from one primitive — pairwise point
addition over (34, K) f32 digit arrays.  Composing it from XLA-level ops
(ops/ec_f32.py) is bit-correct but leaves ~2 orders of magnitude on the
table: the digit convolutions and carry ripples don't fuse, so the VPU
runs at ~3 G FMA/s instead of the ~1.7 T FMA/s the fused Poseidon kernel
measures (ops/poseidon_f32_pallas.py, scripts/probe_conv.py).  This module
fuses one complete addition — 12 variable digit-convolutions (VPU), two 3b
constant Toeplitz matmuls + 14 Montgomery reductions (MXU bf16) and all
carry ripples — into a single VMEM-resident kernel.

Formula (Renes–Costello–Batina 2015, a=0, see ops/ec_f32.py):
    t0=X1X2 t1=Y1Y2 t2=Z1Z2   txy/tyz/txz = cross sums
    u=t1-3b·t2  v=t1+3b·t2  w=3b·txz
    X3=txy·u-tyz·w  Y3=u·v+3t0·w  Z3=tyz·v+3t0·txy

Exactness/bounds (same discipline as the Poseidon kernel):
  * digits are rippled to <=256 before every bf16 matmul, <=511 allowed
    into convs; all f32 accumulations stay < 2^24;
  * lazy VALUE bounds (units of p): inputs <= 4p (stationary across folds:
    outputs are <= 3.1p), internal sums <= 8.1p < 2^258 — 34 digits hold
    values < 2^272, and every Montgomery reduce of operands <= 8.1p
    returns <= 1.02p;
  * subtraction adds k·p (constant digit vector) before the ripple.

The generic conv/ripple/reduce helpers are imported from the Poseidon
kernel — they are modulus-independent; the modulus enters only through
the constant matrices built here for Fp (BN254 base field).

Replaces gnark-crypto's MSM inner loops (reference prover.go:269) on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto.bn254 import P as FP_MOD
from . import fd32
from .fd32 import NDIGITS as ND, NCONV as NC
from .poseidon_f32_pallas import _bdot, _conv, _reduce, _ripple2

TILE = 256                  # point-add lanes per grid step
NCP = 72                    # 8-aligned conv-output block height


def _digits_of(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (8 * i)) & 0xFF for i in range(n)],
                    dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _fp_consts():
    """Constant matrices for Fp Montgomery reduction + the 3b multiple.

    w_n3 (34, 102): m = w_n3 @ bytesplit3(t_lo)  (mod-R n' Toeplitz)
    w_p  (34, 34):  mp_hi = w_p @ m
    w_c  (8, 34):   carry-estimate rows
    b3t  (72, 34):  Toeplitz of mont(9) — 3b for y^2 = x^3 + 3
    kp   (12, 34):  k*p digit vectors, k = 1..12 (lazy subtraction
                    offsets; the G2 kernel indexes up to k = 9)
    """
    f = fd32.FP
    ndig = _digits_of(f.n_inv, ND)
    w_n3 = np.zeros((ND, 3 * ND), dtype=np.float32)
    for plane in range(3):
        for i in range(ND):
            for k in range(ND):
                src = k - (i + plane)
                if 0 <= src < ND:
                    w_n3[k, plane * ND + i] = ndig[src]
    pdig = _digits_of(FP_MOD, ND)
    w_p_hi = np.zeros((ND, ND), dtype=np.float32)
    w_c = np.zeros((8, ND), dtype=np.float32)
    for i in range(ND):
        for k in range(2 * ND):
            if 0 <= k - i < ND:
                if k >= ND:
                    w_p_hi[k - ND, i] = pdig[k - i]
                elif k >= ND - 8:
                    w_c[k - (ND - 8), i] = pdig[k - i]
    def toep(v_mont):
        d = _digits_of(v_mont, ND)
        t = np.zeros((NCP, ND), dtype=np.float32)
        for k in range(min(NCP, NC)):
            for i in range(ND):
                if 0 <= k - i < ND:
                    t[k, i] = d[k - i]
        return t

    b3t = toep((9 * f.r_mont) % FP_MOD)
    kp = np.stack([_digits_of(k * FP_MOD, ND) for k in range(1, 13)])
    # G2 twist: 3*b' = (81 - 9u)/82 — component Toeplitz weights
    inv82 = pow(82, FP_MOD - 2, FP_MOD)
    k0t = toep((81 * inv82) % FP_MOD * f.r_mont % FP_MOD)
    k1t = toep((-9 * inv82) % FP_MOD * f.r_mont % FP_MOD)
    return w_n3, w_p_hi, w_c, b3t, kp, k0t, k1t


def _g1_add_core(X1, Y1, Z1, X2, Y2, Z2, wn3, wph, wc, b3, kp):
    """Complete G1 add on VMEM-resident (34, T) digit tiles — shared by the
    standalone pairwise kernel and the segmented-scan kernel."""
    T = X1.shape[1]

    def rip(x):
        return _ripple2(x, passes=3)

    def sub_k(a, b, k):
        # a + k*p - b, rippled to canonical digits
        return rip(a - b + kp[k - 1][:, None])

    def mul6(pairs):
        a = jnp.concatenate([p[0] for p in pairs], axis=1)
        b = jnp.concatenate([p[1] for p in pairs], axis=1)
        out = _reduce(_conv(a, b), wn3, wph, wc)
        return [out[:, i * T:(i + 1) * T] for i in range(len(pairs))]

    s1 = (rip(X1 + Y1), rip(X2 + Y2))
    s2 = (rip(Y1 + Z1), rip(Y2 + Z2))
    s3 = (rip(X1 + Z1), rip(X2 + Z2))
    t0, t1, t2, cxy, cyz, cxz = mul6([
        (X1, X2), (Y1, Y2), (Z1, Z2), s1, s2, s3])

    txy = sub_k(cxy, rip(t0 + t1), 3)
    tyz = sub_k(cyz, rip(t1 + t2), 3)
    txz = sub_k(cxz, rip(t0 + t2), 3)

    def b3mul(x):
        raw = _bdot(b3, x)
        return _reduce(raw[0:NC], wn3, wph, wc)

    bt2 = b3mul(t2)
    w = b3mul(txz)
    u = sub_k(t1, bt2, 2)
    v = rip(t1 + bt2)
    t0p = rip(t0 + t0 + t0)

    m1, m2, m3, m4, m5, m6 = mul6([
        (txy, u), (tyz, w), (u, v), (t0p, w), (tyz, v), (t0p, txy)])

    return sub_k(m1, m2, 2), rip(m3 + m4), rip(m5 + m6)


def _padd_kernel(x1r, y1r, z1r, x2r, y2r, z2r,
                 wn3r, wphr, wcr, b3r, kpr,
                 x3r, y3r, z3r):
    x3r[...], y3r[...], z3r[...] = _g1_add_core(
        x1r[...], y1r[...], z1r[...], x2r[...], y2r[...], z2r[...],
        wn3r[...], wphr[...], wcr[...], b3r[...], kpr[...])


def _g2_add_core(coords1, coords2, wn3, wph, wc, kp, k0, k1):
    """Complete G2 add (Fp2 coordinates, Karatsuba): same formula with
    3b' = (81-9u)/82.  Component value bounds stay <= 10p (stationary);
    see the Fp2 bound walk in the module history — all mul operands stay
    < 41p < 2^260.  coords: 6-tuples of (34, T) tiles."""
    x10, x11, y10, y11, z10, z11 = coords1
    x20, x21, y20, y21, z20, z21 = coords2
    T = x10.shape[1]

    def rip(x):
        return _ripple2(x, passes=3)

    def sub_k(a, b, k):
        return rip(a - b + kp[k - 1][:, None])

    def mul6_fp2(pairs):
        """6 Fp2 products in ONE stacked conv+reduce (18 base products).
        pairs: ((a0,a1),(b0,b1)) digit tiles.  Returns (c0,c1) tiles with
        component bounds (3.02, 4.02)."""
        cols_a, cols_b = [], []
        for (a0, a1), (b0, b1) in pairs:
            cols_a += [a0, a1, rip(a0 + a1)]
            cols_b += [b0, b1, rip(b0 + b1)]
        prod = _reduce(_conv(jnp.concatenate(cols_a, axis=1),
                             jnp.concatenate(cols_b, axis=1)),
                       wn3, wph, wc)
        outs = []
        for i in range(len(pairs)):
            p0 = prod[:, (3 * i) * T:(3 * i + 1) * T]
            p1 = prod[:, (3 * i + 1) * T:(3 * i + 2) * T]
            p2 = prod[:, (3 * i + 2) * T:(3 * i + 3) * T]
            c0 = sub_k(p0, p1, 2)
            c1 = sub_k(p2, rip(p0 + p1), 3)
            outs.append((c0, c1))
        return outs

    def b3mul2(a):
        """(k0 + k1 u)·(a0 + a1 u) via 4 constant Toeplitz matmuls; output
        component bounds (3.04, 2.04)."""
        a0, a1 = a
        m = lambda w, x: _reduce(_bdot(w, x)[0:NC], wn3, wph, wc)
        k0a0 = m(k0, a0)
        k1a1 = m(k1, a1)
        k0a1 = m(k0, a1)
        k1a0 = m(k1, a0)
        return (sub_k(k0a0, k1a1, 2), rip(k0a1 + k1a0))

    def addf(a, b):
        return (rip(a[0] + b[0]), rip(a[1] + b[1]))

    def subf(a, b, ka, kb):
        return (sub_k(a[0], b[0], ka), sub_k(a[1], b[1], kb))

    X1 = (x10, x11)
    Y1 = (y10, y11)
    Z1 = (z10, z11)
    X2 = (x20, x21)
    Y2 = (y20, y21)
    Z2 = (z20, z21)

    t0, t1, t2, cxy, cyz, cxz = mul6_fp2([
        (X1, X2), (Y1, Y2), (Z1, Z2),
        (addf(X1, Y1), addf(X2, Y2)),
        (addf(Y1, Z1), addf(Y2, Z2)),
        (addf(X1, Z1), addf(X2, Z2))])

    txy = subf(cxy, addf(t0, t1), 7, 9)
    tyz = subf(cyz, addf(t1, t2), 7, 9)
    txz = subf(cxz, addf(t0, t2), 7, 9)

    bt2 = b3mul2(t2)
    w = b3mul2(txz)
    u = subf(t1, bt2, 4, 3)
    v = addf(t1, bt2)
    t0p = (rip(t0[0] + t0[0] + t0[0]), rip(t0[1] + t0[1] + t0[1]))

    m1, m2, m3, m4, m5, m6 = mul6_fp2([
        (txy, u), (tyz, w), (u, v), (t0p, w), (tyz, v), (t0p, txy)])

    X3 = subf(m1, m2, 4, 5)
    Y3 = addf(m3, m4)
    Z3 = addf(m5, m6)
    return X3 + Y3 + Z3


def _padd2_kernel(x10r, x11r, y10r, y11r, z10r, z11r,
                  x20r, x21r, y20r, y21r, z20r, z21r,
                  wn3r, wphr, wcr, kpr, k0r, k1r,
                  x30r, x31r, y30r, y31r, z30r, z31r):
    out = _g2_add_core(
        (x10r[...], x11r[...], y10r[...], y11r[...], z10r[...], z11r[...]),
        (x20r[...], x21r[...], y20r[...], y21r[...], z20r[...], z21r[...]),
        wn3r[...], wphr[...], wcr[...], kpr[...], k0r[...], k1r[...])
    (x30r[...], x31r[...], y30r[...], y31r[...],
     z30r[...], z31r[...]) = out


# --- segmented inclusive scan (sorted-stream MSM bucket accumulation) --------
#
# One kernel per chunk replaces the round-4 `lax.associative_scan` chain of
# separate point-add dispatches (each level a full HBM round trip): the scan
# runs tile-by-tile in VMEM (Hillis–Steele over lanes), the carry point lives
# in scratch across the sequential grid, and each stream element is read from
# and written to HBM exactly once.

SCAN_TILE = 256     # best measured tile (2^20 sweep: 256 -> 0.204 s,
                    # 1024 -> 0.236 s; log2(T)+1 adds/entry shrinks with T
                    # until per-tile overhead wins below 256)


def _seg_scan_kernel(na, steps):
    """Kernel body factory: na=3 (G1) or 6 (G2) coordinate arrays."""

    def kernel(*refs):
        coord_in = refs[:na]
        hr = refs[na]
        if na == 3:
            wn3r, wphr, wcr, b3r, kpr, id1r = refs[na + 1:na + 7]
            out_refs = refs[na + 7:na + 7 + na]
            scratch = refs[na + 7 + na:]
            consts = (wn3r[...], wphr[...], wcr[...], b3r[...], kpr[...])
            add = lambda a, b: _g1_add_core(*a, *b, *consts)
            idy_comp = 1                      # identity (0 : 1 : 0)
        else:
            wn3r, wphr, wcr, kpr, k0r, k1r, id1r = refs[na + 1:na + 8]
            out_refs = refs[na + 8:na + 8 + na]
            scratch = refs[na + 8 + na:]
            consts = (wn3r[...], wphr[...], wcr[...], kpr[...],
                      k0r[...], k1r[...])
            add = lambda a, b: _g2_add_core(a, b, *consts)
            idy_comp = 2                      # identity (0,0 : 1,0 : 0,0)

        pid = pl.program_id(0)
        cur = [r[...] for r in coord_in]
        f = hr[...][0:1]                      # (1, T) f32, 1.0 at heads
        T = cur[0].shape[1]
        id1 = id1r[...]                       # (34, 128) mont(1) digits
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

        @pl.when(pid == 0)
        def _init():
            for k in range(na):
                if k == idy_comp:
                    scratch[k][...] = id1
                else:
                    scratch[k][...] = jnp.zeros_like(id1)

        # fold the running carry into lane 0 when it continues the previous
        # tile's segment (head flag 0).  The merge add runs on 128-wide
        # blocks: a pure broadcast_to operand entering the conv core
        # crashes the Mosaic compiler ("limits 8 vs dim 1"), and (34, 1)
        # operands die on the ripple's sublane concat — 128 lanes (the
        # scratch width) is the narrowest layout-legal shape.
        carry = [scratch[k][...] for k in range(na)]            # (34, 128)
        cw = min(T, 128)
        first = [x[:, 0:cw] for x in cur]
        if cw < 128:
            first = [jnp.concatenate(
                [x, jnp.zeros((x.shape[0], 128 - cw), x.dtype)], axis=1)
                for x in first]
        merged = add(tuple(carry), tuple(first))                # (34, 128)
        if T > 128:
            merged = [jnp.concatenate(
                [m, jnp.zeros((m.shape[0], T - 128), m.dtype)], axis=1)
                for m in merged]
        else:
            merged = [m[:, :T] for m in merged]
        # lane-0-only mask: at lane 0, f holds the first element's head
        # flag, so no (1,1) scalar slice is needed (Mosaic rejects those)
        cont0 = (lane == 0) & (f < 0.5)
        cur = [jnp.where(cont0, m, x) for m, x in zip(merged, cur)]

        # Hillis–Steele over lanes with the segmented operator
        for s in range(steps):
            sh = 1 << s
            valid = lane >= sh
            part = []
            for k in range(na):
                p = jnp.concatenate(
                    [cur[k][:, T - sh:], cur[k][:, :T - sh]], axis=1)
                ident = id1 [:, 0:1] if k == idy_comp else jnp.float32(0.0)
                part.append(jnp.where(valid, p, ident))
            pf = jnp.where(
                valid,
                jnp.concatenate([f[:, T - sh:], f[:, :T - sh]], axis=1),
                0.0)
            summed = add(tuple(part), tuple(cur))
            keep = f > 0.5                    # cur is a head: scan restarts
            cur = [jnp.where(keep, x, sm) for x, sm in zip(cur, summed)]
            f = jnp.maximum(f, pf)

        for k in range(na):
            out_refs[k][...] = cur[k]
            scratch[k][...] = jnp.broadcast_to(cur[k][:, T - 1:T],
                                               id1.shape)

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def seg_scan_pallas(na: int, pts, heads):
    """Inclusive segmented EC-sum scan over a flattened sorted stream.

    pts: tuple of na (34, S) f32 digit arrays (canonical digits; values
    <= 4p for G1, <= 10p per component for G2).  heads: (S,) — nonzero
    marks a segment start.  Returns the scan as na (34, S) f32 arrays;
    position i holds the EC sum of its segment's elements up to i.
    S must be a multiple of SCAN_TILE or a power of two below it.
    """
    S = pts[0].shape[1]
    # largest pow2 tile dividing S; G2's 6-coordinate add core needs a
    # smaller tile to fit the compiler's 16 MB scoped-VMEM stack, but
    # Mosaic blocks need >= 128 lanes (unless the whole array is smaller)
    want = SCAN_TILE if na == 3 else max(SCAN_TILE // 2, 128)
    T = min(want, S & -S)
    assert S % T == 0 and (T & (T - 1)) == 0, (S, T)
    steps = T.bit_length() - 1
    w_n3, w_p_hi, w_c, b3t, kp, k0t, k1t = _fp_consts()
    bf = lambda x: jnp.asarray(x, dtype=jnp.bfloat16)
    id1 = np.tile(_digits_of(fd32.FP.r_mont, ND)[:, None],
                  (1, 128)).astype(np.float32)
    if na == 3:
        consts = (bf(w_n3), bf(w_p_hi), bf(w_c), bf(b3t), jnp.asarray(kp),
                  jnp.asarray(id1))
    else:
        consts = (bf(w_n3), bf(w_p_hi), bf(w_c), jnp.asarray(kp),
                  bf(k0t), bf(k1t), jnp.asarray(id1))
    tile_spec = pl.BlockSpec((ND, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    # 8 sublanes: Mosaic rejects (1, T) blocks (tiling limit 8 > dim 1)
    head_spec = pl.BlockSpec((8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    heads_f = jnp.broadcast_to(heads.astype(jnp.float32).reshape(1, S),
                               (8, S))
    out = pl.pallas_call(
        _seg_scan_kernel(na, steps),
        grid=(S // T,),
        in_specs=[tile_spec] * na + [head_spec]
                 + [full(c.shape) for c in consts],
        out_specs=(tile_spec,) * na,
        out_shape=tuple(jax.ShapeDtypeStruct((ND, S), jnp.float32)
                        for _ in range(na)),
        scratch_shapes=[pltpu.VMEM((ND, 128), jnp.float32)] * na,
        interpret=jax.default_backend() != "tpu",
    )(*pts, heads_f, *consts)
    return out


def _pallas_add(kernel, n_in, arrs1, arrs2, tile):
    B = arrs1[0].shape[1]
    pad = (-B) % tile
    if pad:
        arrs1 = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in arrs1)
        arrs2 = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in arrs2)
    w_n3, w_p_hi, w_c, b3t, kp, k0t, k1t = _fp_consts()
    bf = lambda x: jnp.asarray(x, dtype=jnp.bfloat16)
    n_tiles = arrs1[0].shape[1] // tile
    tile_spec = pl.BlockSpec((ND, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    if n_in == 3:
        consts = (bf(w_n3), bf(w_p_hi), bf(w_c), bf(b3t), jnp.asarray(kp))
    else:
        consts = (bf(w_n3), bf(w_p_hi), bf(w_c), jnp.asarray(kp),
                  bf(k0t), bf(k1t))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec] * (2 * n_in) + [full(c.shape) for c in consts],
        out_specs=(tile_spec,) * n_in,
        out_shape=tuple(
            jax.ShapeDtypeStruct((ND, arrs1[0].shape[1]), jnp.float32)
            for _ in range(n_in)),
        interpret=jax.default_backend() != "tpu",
    )(*arrs1, *arrs2, *consts)
    if pad:
        out = tuple(a[:, :B] for a in out)
    return out


@jax.jit
def point_add_pallas(arrs1, arrs2):
    """Complete G1 add over raw digit arrays: 2x (X,Y,Z) (34,B) -> (X,Y,Z).
    Input values must be <= 4p with canonical digits; outputs <= 3.1p."""
    return _pallas_add(_padd_kernel, 3, arrs1, arrs2, TILE)


@jax.jit
def point_add2_pallas(arrs1, arrs2):
    """Complete G2 add: 2x (X0,X1,Y0,Y1,Z0,Z1) (34,B) -> same.  Component
    values must be <= 10p with canonical digits; outputs <= 10p."""
    return _pallas_add(_padd2_kernel, 6, arrs1, arrs2, TILE // 2)
