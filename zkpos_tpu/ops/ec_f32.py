"""Batched BN254 curve arithmetic on the f32 digit engine (ops/fd32.py).

Second-generation EC kernels (replacing the uint32-limb ops/ec.py on hot
paths) for the Pippenger MSM in ops/msm.py, which replaces gnark-crypto's
MSM inside groth16.Prove (reference prover.go:269).

Points are homogeneous projective (X : Y : Z) and addition uses the
COMPLETE a=0 formulas of Renes–Costello–Batina 2015 (Alg. 7 shape):

    t0=X1X2  t1=Y1Y2  t2=Z1Z2
    txy=(X1+Y1)(X2+Y2)-t0-t1   tyz=(Y1+Z1)(Y2+Z2)-t1-t2
    txz=(X1+Z1)(X2+Z2)-t0-t2
    u=t1-3b·t2   v=t1+3b·t2   w=3b·txz
    X3=txy·u-tyz·w   Y3=u·v+3t0·w   Z3=tyz·v+3t0·txy

Complete means: the SAME straight-line code handles generic adds,
doubling (P+P), inverses (P-P) and the identity (0:1:0) — no branches, no
equality masks.  That matters twice on TPU: the traced graph is ~3x
smaller than a masked Jacobian add+double pair, and no residue-equality
tests are needed under the lazy Montgomery representation.

The 12 variable multiplies run as TWO stacked Montgomery calls (one wide
conv + MXU reduction each); the two 3b·(...) products are constant
Toeplitz matmuls (MXU).  Lazy value bounds (tracked per element at trace
time, in units of p) stay stationary: outputs are <= 3.1p for any inputs
<= 8p.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from .fd32 import FP, NCONV, NDIGITS, Fd32

MAX_MUL_BOUND = 480.0   # operand values must stay < 2^263 ~ 512 p


class FE(NamedTuple):
    """Lazy field element: canonical digits, value < bound * p."""
    d: jnp.ndarray          # (34, ...) f32
    bound: float


@lru_cache(maxsize=None)
def _toep_np(v_mont: int) -> np.ndarray:
    """(67, 34) f32 Toeplitz conv weights of a Montgomery-form constant."""
    dig = [(v_mont >> (8 * i)) & 0xFF for i in range(NDIGITS)]
    w = np.zeros((NCONV, NDIGITS), dtype=np.float32)
    for k in range(NCONV):
        for i in range(max(0, k - NDIGITS + 1), min(k, NDIGITS - 1) + 1):
            w[k, i] = dig[k - i]
    return w


class Fq1:
    """Fp adapter over (34, ...) digit arrays."""
    name = "fp1"

    def __init__(self, f: Fd32):
        self.f = f

    def wrap(self, d, bound=1.02) -> FE:
        return FE(d, bound)

    def add(self, a: FE, b: FE) -> FE:
        return FE(self.f.add(a.d, b.d), a.bound + b.bound)

    def dbl(self, a: FE) -> FE:
        return FE(self.f.dbl(a.d), 2 * a.bound)

    def triple(self, a: FE) -> FE:
        s, _ = self.f._ripple(a.d + a.d + a.d, NDIGITS)
        return FE(s, 3 * a.bound)

    def sub(self, a: FE, b: FE) -> FE:
        k = int(np.ceil(b.bound + 0.01))
        return FE(self.f.sub(a.d, b.d, k=k), a.bound + k)

    def mul_many(self, pairs: Sequence[Tuple[FE, FE]]):
        for a, b in pairs:
            assert a.bound <= MAX_MUL_BOUND and b.bound <= MAX_MUL_BOUND
        aa = jnp.stack([p[0].d for p in pairs], axis=1)
        bb = jnp.stack([p[1].d for p in pairs], axis=1)
        out = self.f.mont_mul(aa, bb)
        return tuple(FE(out[:, i], 1.02) for i in range(len(pairs)))

    def mul_const(self, a: FE, k: int) -> FE:
        """a * k via one Toeplitz MXU matmul + Montgomery reduction."""
        assert a.bound <= MAX_MUL_BOUND
        km = (k * self.f.r_mont) % self.f.modulus
        t = jnp.einsum("ki,i...->k...", jnp.asarray(_toep_np(km)), a.d,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return FE(self.f.reduce_mont(t), 1.02)

    def zeros(self, batch_shape) -> FE:
        return FE(jnp.zeros((NDIGITS,) + tuple(batch_shape), jnp.float32),
                  0.0)

    def select(self, mask, a: FE, b: FE) -> FE:
        return FE(jnp.where(mask[None], a.d, b.d), max(a.bound, b.bound))

    def batch_shape(self, a: FE):
        return a.d.shape[1:]

    # curve constant: 3*b for y^2 = x^3 + 3
    B3 = 9

    def mul_b3(self, a: FE) -> FE:
        return self.mul_const(a, self.B3)


class Fq2:
    """Fp2 = Fp[u]/(u^2+1); elements are (c0, c1) FE pairs."""
    name = "fp2"

    def __init__(self, base: Fq1):
        self.b = base
        # 3*b' with b' = 3/(9+u):  (81 - 9u)/82
        inv82 = pow(82, bn.P - 2, bn.P)
        self.b3_c0 = (81 * inv82) % bn.P
        self.b3_c1 = (-9 * inv82) % bn.P

    def add(self, a, b):
        return (self.b.add(a[0], b[0]), self.b.add(a[1], b[1]))

    def dbl(self, a):
        return (self.b.dbl(a[0]), self.b.dbl(a[1]))

    def triple(self, a):
        return (self.b.triple(a[0]), self.b.triple(a[1]))

    def sub(self, a, b):
        return (self.b.sub(a[0], b[0]), self.b.sub(a[1], b[1]))

    def mul_many(self, pairs):
        """Karatsuba over all pairs in ONE stacked base mul."""
        k = len(pairs)
        cols = []
        for a, b in pairs:
            cols.append((a[0], b[0]))                              # ac
            cols.append((a[1], b[1]))                              # bd
            cols.append((self.b.add(a[0], a[1]),
                         self.b.add(b[0], b[1])))                  # (a+b)(c+d)
        prods = self.b.mul_many(cols)
        outs = []
        for i in range(k):
            ac, bd, abcd = prods[3 * i], prods[3 * i + 1], prods[3 * i + 2]
            c0 = self.b.sub(ac, bd)
            c1 = self.b.sub(abcd, self.b.add(ac, bd))
            outs.append((c0, c1))
        return tuple(outs)

    def mul_b3(self, a):
        """(k0 + k1 u)(a0 + a1 u) = (k0 a0 - k1 a1) + (k0 a1 + k1 a0) u
        via 4 constant Toeplitz matmuls."""
        k0a0 = self.b.mul_const(a[0], self.b3_c0)
        k1a1 = self.b.mul_const(a[1], self.b3_c1)
        k0a1 = self.b.mul_const(a[1], self.b3_c0)
        k1a0 = self.b.mul_const(a[0], self.b3_c1)
        return (self.b.sub(k0a0, k1a1), self.b.add(k0a1, k1a0))

    def zeros(self, batch_shape):
        return (self.b.zeros(batch_shape), self.b.zeros(batch_shape))

    def select(self, mask, a, b):
        return (self.b.select(mask, a[0], b[0]),
                self.b.select(mask, a[1], b[1]))

    def batch_shape(self, a):
        return self.b.batch_shape(a[0])


F1 = Fq1(FP)
F2 = Fq2(F1)


# --- complete projective point add -------------------------------------------

def point_add(F, p, q):
    """Complete projective addition (identity = (0:1:0)); see module doc."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0, t1, t2, cxy, cyz, cxz = F.mul_many([
        (X1, X2), (Y1, Y2), (Z1, Z2),
        (F.add(X1, Y1), F.add(X2, Y2)),
        (F.add(Y1, Z1), F.add(Y2, Z2)),
        (F.add(X1, Z1), F.add(X2, Z2))])
    txy = F.sub(cxy, F.add(t0, t1))
    tyz = F.sub(cyz, F.add(t1, t2))
    txz = F.sub(cxz, F.add(t0, t2))
    bt2 = F.mul_b3(t2)
    u = F.sub(t1, bt2)
    v = F.add(t1, bt2)
    w = F.mul_b3(txz)
    t0p = F.triple(t0)
    m1, m2, m3, m4, m5, m6 = F.mul_many([
        (txy, u), (tyz, w), (u, v), (t0p, w), (tyz, v), (t0p, txy)])
    return (F.sub(m1, m2), F.add(m3, m4), F.add(m5, m6))


def tree_reduce_axis(F, pts, n_levels: int):
    """Sum 2^n_levels points along the LAST batch axis by pairwise folding
    (shrinking shapes; statically unrolled)."""
    for _ in range(n_levels):
        a = _index_last(pts, 0)
        b = _index_last(pts, 1)
        pts = point_add(F, a, b)
    return pts


def _index_last(pts, parity: int):
    def pick(e):
        if isinstance(e, FE):
            return FE(e.d[..., parity::2], e.bound)
        return tuple(pick(c) for c in e)
    return tuple(pick(c) for c in pts)


# --- host <-> device converters ----------------------------------------------

def g1_to_device(points):
    """[(x, y) | None] -> (X, Y, Z) FE triple, Montgomery projective."""
    xs = [0 if pt is None else pt[0] for pt in points]
    ys = [1 if pt is None else pt[1] for pt in points]
    zs = [0 if pt is None else 1 for pt in points]
    mont = lambda v: [(x * FP.r_mont) % FP.modulus for x in v]
    arr = lambda v: F1.wrap(jnp.asarray(FP.ints_to_digits(mont(v))), 1.0)
    return arr(xs), arr(ys), arr(zs)


def _batch_inv_p(vals):
    n = len(vals)
    pre = [1] * (n + 1)
    for i, v in enumerate(vals):
        pre[i + 1] = pre[i] * (v if v else 1) % bn.P
    inv = pow(pre[n], bn.P - 2, bn.P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        if vals[i]:
            out[i] = pre[i] * inv % bn.P
            inv = inv * vals[i] % bn.P
    return out


def g1_from_device(xyz) -> list:
    """(X, Y, Z) FE triple (any batch) -> [(x, y) | None] affine ints."""
    rinv = pow(FP.r_mont, FP.modulus - 2, FP.modulus)
    xs, ys, zs = (
        [(v * rinv) % bn.P
         for v in FP.digits_to_ints(np.asarray(a.d).reshape(NDIGITS, -1))]
        for a in xyz)
    zi = _batch_inv_p(zs)
    return [None if z == 0 else ((x * i) % bn.P, (y * i) % bn.P)
            for x, y, z, i in zip(xs, ys, zs, zi)]


def g2_to_device(points):
    """[((x:Fp2),(y:Fp2)) | None] -> ((X0,X1),(Y0,Y1),(Z0,Z1)) FE2 triple."""
    comp = {k: [] for k in range(6)}
    for pt in points:
        vals = ((0, 0, 1, 0, 0, 0) if pt is None else
                (pt[0].c0, pt[0].c1, pt[1].c0, pt[1].c1, 1, 0))
        for k, v in enumerate(vals):
            comp[k].append(v)
    mont = lambda v: [(x * FP.r_mont) % FP.modulus for x in v]
    arr = lambda v: F1.wrap(jnp.asarray(FP.ints_to_digits(mont(v))), 1.0)
    return ((arr(comp[0]), arr(comp[1])),
            (arr(comp[2]), arr(comp[3])),
            (arr(comp[4]), arr(comp[5])))


def g2_from_device(xyz) -> list:
    rinv = pow(FP.r_mont, FP.modulus - 2, FP.modulus)
    vals = []
    for c2 in xyz:
        c0 = FP.digits_to_ints(np.asarray(c2[0].d).reshape(NDIGITS, -1))
        c1 = FP.digits_to_ints(np.asarray(c2[1].d).reshape(NDIGITS, -1))
        vals.append([bn.Fp2((a * rinv) % bn.P, (b * rinv) % bn.P)
                     for a, b in zip(c0, c1)])
    X, Y, Z = vals
    out = []
    for x, y, z in zip(X, Y, Z):
        if z.is_zero():
            out.append(None)
        else:
            zi = z.inv()
            out.append((x * zi, y * zi))
    return out
