"""Batched BN254 curve arithmetic on TPU (G1 over Fp, G2 over Fp2).

Points are Jacobian (X, Y, Z) limb arrays; Z == 0 is the identity.  All
formulas are branchless (masked selects) and lane-parallel over the batch.

Compile-friendliness: the add/double formulas are restructured into a few
STAGED, STACKED Montgomery multiplies — independent field products within a
stage are stacked along a new leading axis and computed by one mont_mul
call.  This cuts the XLA graph ~4x versus naive formula transcription and
makes every multiply a wide vector op.

MSM strategy (round-1): fixed-width chunks; each chunk does an independent
254-step double-and-add batched across lanes, chunks fold into a running
accumulator, one final log-depth reduction.  Every kernel shape is constant
(one compile, persistently cached).  A sorted-bucket Pippenger is the
planned upgrade (SURVEY.md §2.5 item 3).

Replaces gnark-crypto's ecc/bn254 scalar-mul/MSM used inside
groth16.Setup/Prove (reference prover.go:269, keygen main.go:42).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from .modmath import ModMath, NLIMBS

fp = ModMath(bn.P)
fr_mod = ModMath(bn.R)

MSM_CHUNK = 128  # fixed lane width for all MSM kernels


class Fp1Ops:
    """Adapter over base-field limb arrays (16, ...)."""
    name = "fp1"

    def __init__(self, mm: ModMath):
        self.mm = mm

    def add(self, a, b): return self.mm.add_raw(a, b)
    def sub(self, a, b): return self.mm.sub_raw(a, b)
    def mul(self, a, b): return self.mm.mul_raw(a, b)

    def mul_many(self, pairs):
        """[(a, b), ...] -> tuple of products, one stacked mont_mul."""
        aa = jnp.stack([p[0] for p in pairs], axis=1)   # (16, k, ...)
        bb = jnp.stack([p[1] for p in pairs], axis=1)
        out = self.mm.mul_raw(aa, bb)
        return tuple(out[:, i] for i in range(len(pairs)))

    def zeros(self, batch_shape):
        return jnp.zeros((NLIMBS,) + tuple(batch_shape), dtype=jnp.uint32)

    def is_zero(self, a): return self.mm.is_zero(a)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def batch_shape(self, a): return a.shape[1:]

    def dbl(self, a): return self.mm.add_raw(a, a)


class Fp2Ops:
    """Fp2 = Fp[u]/(u^2+1); elements are (2, 16, ...) limb arrays."""
    name = "fp2"

    def __init__(self, mm: ModMath):
        self.mm = mm

    def add(self, a, b): return jnp.stack([self.mm.add_raw(a[0], b[0]),
                                           self.mm.add_raw(a[1], b[1])])

    def sub(self, a, b): return jnp.stack([self.mm.sub_raw(a[0], b[0]),
                                           self.mm.sub_raw(a[1], b[1])])

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """Karatsuba over all pairs with ONE stacked base-field mont_mul of
        width 3*k."""
        k = len(pairs)
        cols_a, cols_b = [], []
        for a, b in pairs:
            cols_a += [a[0], a[1], self.mm.add_raw(a[0], a[1])]
            cols_b += [b[0], b[1], self.mm.add_raw(b[0], b[1])]
        aa = jnp.stack(cols_a, axis=1)
        bb = jnp.stack(cols_b, axis=1)
        prod = self.mm.mul_raw(aa, bb)
        outs = []
        for i in range(k):
            ac = prod[:, 3 * i]
            bd = prod[:, 3 * i + 1]
            abcd = prod[:, 3 * i + 2]
            c0 = self.mm.sub_raw(ac, bd)
            c1 = self.mm.sub_raw(abcd, self.mm.add_raw(ac, bd))
            outs.append(jnp.stack([c0, c1]))
        return tuple(outs)

    def zeros(self, batch_shape):
        return jnp.zeros((2, NLIMBS) + tuple(batch_shape), dtype=jnp.uint32)

    def is_zero(self, a):
        return self.mm.is_zero(a[0]) & self.mm.is_zero(a[1])

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def batch_shape(self, a): return a.shape[2:]

    def dbl(self, a): return self.add(a, a)


F1 = Fp1Ops(fp)
F2 = Fp2Ops(fp)


# --- Jacobian point ops ------------------------------------------------------

def point_double(F, p):
    """dbl-2009-l (a=0), staged: 3 batched multiplies."""
    X, Y, Z = p
    zmask = F.is_zero(Z)
    A, B, Z3 = F.mul_many([(X, X), (Y, Y), (F.dbl(Y), Z)])
    E = F.add(F.add(A, A), A)
    xb = F.add(X, B)
    C, t2, Ff = F.mul_many([(B, B), (xb, xb), (E, E)])
    D = F.dbl(F.sub(F.sub(t2, A), C))
    X3 = F.sub(Ff, F.dbl(D))
    eight_c = F.dbl(F.dbl(F.dbl(C)))
    (y3a,) = F.mul_many([(E, F.sub(D, X3))])
    Y3 = F.sub(y3a, eight_c)
    Z3 = F.select(zmask, Z, Z3)
    return (X3, Y3, Z3)


def point_add(F, p, q):
    """add-2007-bl with all edge cases resolved by masks; 5 staged batched
    multiplies plus a shared double path."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    Z1Z1, Z2Z2 = F.mul_many([(Z1, Z1), (Z2, Z2)])
    U1, U2, t1, t2 = F.mul_many([(X1, Z2Z2), (X2, Z1Z1),
                                 (Y1, Z2), (Y2, Z1)])
    H = F.sub(U2, U1)
    two_h = F.dbl(H)
    zsum = F.add(Z1, Z2)
    S1, S2, I, W = F.mul_many([(t1, Z2Z2), (t2, Z1Z1),
                               (two_h, two_h), (zsum, zsum)])
    rr = F.sub(S2, S1)
    r2 = F.dbl(rr)
    J, V, rsq, Z3 = F.mul_many([
        (H, I), (U1, I), (r2, r2),
        (F.sub(W, F.add(Z1Z1, Z2Z2)), H)])
    X3 = F.sub(F.sub(rsq, J), F.dbl(V))
    y3a, s1j = F.mul_many([(r2, F.sub(V, X3)), (S1, J)])
    Y3 = F.sub(y3a, F.dbl(s1j))

    h_zero = F.is_zero(H)
    r_zero = F.is_zero(rr)
    dX, dY, dZ = point_double(F, p)
    dbl_mask = h_zero & r_zero & ~p_inf & ~q_inf
    X3 = F.select(dbl_mask, dX, X3)
    Y3 = F.select(dbl_mask, dY, Y3)
    Z3 = F.select(dbl_mask, dZ, Z3)
    inf_mask = h_zero & ~r_zero & ~p_inf & ~q_inf
    Z3 = F.select(inf_mask, Z3 * 0, Z3)
    X3 = F.select(q_inf, X1, F.select(p_inf, X2, X3))
    Y3 = F.select(q_inf, Y1, F.select(p_inf, Y2, Y3))
    Z3 = F.select(q_inf, Z1, F.select(p_inf, Z2, Z3))
    return (X3, Y3, Z3)


# --- batched scalar multiplication + MSM -------------------------------------

def batched_scalar_mul(F, points, scalars_limbs, nbits=254):
    """s_i * P_i for each lane.  points: Jacobian Montgomery arrays with
    fixed batch; scalars_limbs: (16, N) canonical."""
    batch = F.batch_shape(points[0])
    inf = tuple(F.zeros(batch) for _ in range(3))

    def body(j, state):
        acc, base = state
        limb = jax.lax.dynamic_index_in_dim(scalars_limbs, j // 16, axis=0,
                                            keepdims=False)
        bit = ((limb >> (j % 16)) & 1).astype(bool)
        added = point_add(F, acc, base)
        acc = tuple(F.select(bit, a, b) for a, b in zip(added, acc))
        base = point_double(F, base)
        return (acc, base)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (inf, points))
    return acc


def tree_reduce(F, points):
    """Sum a power-of-two batch of points; result is in lane 0.

    Constant-shape butterfly: fold by adding a rolled copy, halving the
    meaningful prefix each step — ONE point_add in the loop body, so the
    traced graph stays small regardless of width."""
    m = int(np.prod(F.batch_shape(points[0])))
    levels = int(np.log2(m))
    assert (1 << levels) == m, "tree_reduce requires power-of-two width"

    def body(k, pts):
        rolled = tuple(jnp.roll(a, -(m >> (k + 1)), axis=-1) for a in pts)
        return point_add(F, pts, rolled)

    points = jax.lax.fori_loop(0, levels, body, points)
    return tuple(a[..., 0:1] for a in points)


def _msm_chunk_g1(xs, ys, zs, scalars):
    prods = batched_scalar_mul(F1, (xs, ys, zs), scalars)
    return tree_reduce(F1, prods)


def _msm_chunk_g2(xs, ys, zs, scalars):
    prods = batched_scalar_mul(F2, (xs, ys, zs), scalars)
    return tree_reduce(F2, prods)


_msm_chunk_g1 = jax.jit(_msm_chunk_g1)
_msm_chunk_g2 = jax.jit(_msm_chunk_g2)
_add_one_g1 = jax.jit(lambda p, q: point_add(F1, p, q))
_add_one_g2 = jax.jit(lambda p, q: point_add(F2, p, q))


# --- host-facing converters --------------------------------------------------

def g1_points_to_device(points) -> Tuple:
    """Affine python points [(x, y) | None] -> Montgomery Jacobian arrays."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0); ys.append(1); zs.append(0)
        else:
            xs.append(pt[0]); ys.append(pt[1]); zs.append(1)
    to_m = lambda vals: fp.to_mont(jnp.asarray(fp.ints_to_limbs(vals)))
    return to_m(xs), to_m(ys), to_m(zs)


def g1_point_from_device(xyz):
    x, y, z = (fp.limbs_to_ints(np.asarray(fp.from_mont(a)))
               for a in xyz)
    if z[0] == 0:
        return None
    zi = bn.fp_inv(z[0])
    return ((x[0] * zi * zi) % bn.P, (y[0] * zi * zi * zi) % bn.P)


def g2_points_to_device(points) -> Tuple:
    comps = {k: [] for k in ("x0", "x1", "y0", "y1", "z0", "z1")}
    for pt in points:
        if pt is None:
            vals = (0, 0, 1, 0, 0, 0)
        else:
            vals = (pt[0].c0, pt[0].c1, pt[1].c0, pt[1].c1, 1, 0)
        for k, v in zip(("x0", "x1", "y0", "y1", "z0", "z1"), vals):
            comps[k].append(v)
    to_m = lambda vals: fp.to_mont(jnp.asarray(fp.ints_to_limbs(vals)))
    X = jnp.stack([to_m(comps["x0"]), to_m(comps["x1"])])
    Y = jnp.stack([to_m(comps["y0"]), to_m(comps["y1"])])
    Z = jnp.stack([to_m(comps["z0"]), to_m(comps["z1"])])
    return X, Y, Z


def g2_point_from_device(xyz):
    comps = []
    for a in xyz:
        c0 = fp.limbs_to_ints(np.asarray(fp.from_mont(a[0])))[0]
        c1 = fp.limbs_to_ints(np.asarray(fp.from_mont(a[1])))[0]
        comps.append(bn.Fp2(c0, c1))
    X, Y, Z = comps
    if Z.is_zero():
        return None
    zi = Z.inv()
    zi2 = zi * zi
    return (X * zi2, Y * zi2 * zi)


def _msm_generic(points, scalars, to_dev, from_dev, chunk_fn, add_fn, F):
    n = len(points)
    if n == 0:
        return None
    acc = None
    for start in range(0, n, MSM_CHUNK):
        chunk_pts = list(points[start:start + MSM_CHUNK])
        chunk_sc = [s % bn.R for s in scalars[start:start + MSM_CHUNK]]
        pad = MSM_CHUNK - len(chunk_pts)
        chunk_pts += [None] * pad
        chunk_sc += [0] * pad
        dev_pts = to_dev(chunk_pts)
        sc = jnp.asarray(fr_mod.ints_to_limbs(chunk_sc))
        part = chunk_fn(*dev_pts, sc)
        acc = part if acc is None else add_fn(acc, part)
    return from_dev(acc)


def msm_g1(points, scalars):
    """MSM over G1: points [(x,y)|None], scalars [int] -> (x,y)|None."""
    return _msm_generic(points, scalars, g1_points_to_device,
                        g1_point_from_device, _msm_chunk_g1, _add_one_g1, F1)


def msm_g2(points, scalars):
    return _msm_generic(points, scalars, g2_points_to_device,
                        g2_point_from_device, _msm_chunk_g2, _add_one_g2, F2)


# all-products kernels (no reduction) — used for fixed-base exponent tables
_smul_all_g1 = jax.jit(
    lambda xs, ys, zs, sc: batched_scalar_mul(F1, (xs, ys, zs), sc))
_smul_all_g2 = jax.jit(
    lambda xs, ys, zs, sc: batched_scalar_mul(F2, (xs, ys, zs), sc))
