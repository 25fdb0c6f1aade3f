"""BN254 curve arithmetic on the ripple-free engine (ops/fdlazy.py).

Same complete projective addition as ops/ec_f32.py (Renes–Costello–Batina
a=0 formulas; identity (0:1:0)), but additions/subtractions are nearly
free (no carry ripples) and each multiply runs the parallel-redistribute
Montgomery reduce — ~5x fewer dependent VPU ops and much smaller traced
graphs, which is what makes the sorted-stream MSM's scan kernels
(ops/msm_device.py) both fast and compilable on the axon remote compiler.

Digit/value bounds are tracked statically per the fdlazy model; the
stationary state is digit bound ~260 / value bound ~3.1p, valid for any
chain length.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from .fd32 import FP, NCONV, NDIGITS
from .fdlazy import FdL, LE

FPL = FdL(FP)


@lru_cache(maxsize=None)
def _toep_np(v_mont: int) -> np.ndarray:
    """(67, 34) f32 Toeplitz conv weights of a Montgomery-form constant."""
    dig = [(v_mont >> (8 * i)) & 0xFF for i in range(NDIGITS)]
    w = np.zeros((NCONV, NDIGITS), dtype=np.float32)
    for k in range(NCONV):
        for i in range(max(0, k - NDIGITS + 1), min(k, NDIGITS - 1) + 1):
            w[k, i] = dig[k - i]
    return w


class Fq1L:
    """Fp adapter (lazy engine)."""
    name = "fp1-lazy"
    B3 = 9

    def __init__(self):
        self.f = FPL

    def wrap(self, d, dB=300.0, vB=2.0) -> LE:
        return FPL.wrap(d, dB, vB)

    def add(self, a, b):
        return FPL.add(a, b)

    def dbl(self, a):
        return FPL.dbl(a)

    def triple(self, a):
        return FPL.triple(a)

    def sub(self, a, b):
        return FPL.sub(a, b)

    def mul_many(self, pairs):
        return FPL.mul_many(pairs)

    def normalize(self, a):
        return FPL.normalize(a)

    def mul_b3(self, a):
        km = (self.B3 * FP.r_mont) % FP.modulus
        return FPL.mul_const(a, jnp.asarray(_toep_np(km)))

    def zeros(self, batch_shape):
        return FPL.zeros(batch_shape)

    def select(self, mask, a, b):
        return FPL.select(mask, a, b)

    def batch_shape(self, a):
        return a.d.shape[1:]


class Fq2L:
    """Fp2 = Fp[u]/(u^2+1) on the lazy engine (Karatsuba mul)."""
    name = "fp2-lazy"

    def __init__(self, base: Fq1L):
        self.b = base
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
        # Karatsuba stacks an extra add on often-already-added operands;
        # normalize anything whose digit bound would blow the conv budget
        def nz(x):
            return self.b.normalize(x) if x.dB > 600 else x

        cols = []
        for a, b in pairs:
            cols.append((nz(a[0]), nz(b[0])))
            cols.append((nz(a[1]), nz(b[1])))
            cols.append((nz(self.b.add(a[0], a[1])),
                         nz(self.b.add(b[0], b[1]))))
        prods = self.b.mul_many(cols)
        outs = []
        for i in range(len(pairs)):
            ac, bd, abcd = prods[3 * i], prods[3 * i + 1], prods[3 * i + 2]
            c0 = self.b.sub(ac, bd)
            c1 = self.b.sub(abcd, self.b.add(ac, bd))
            outs.append((c0, c1))
        return tuple(outs)

    def mul_b3(self, a):
        f = self.b
        t0 = FPL.mul_const(a[0], jnp.asarray(_toep_np(
            (self.b3_c0 * FP.r_mont) % FP.modulus)))
        t1 = FPL.mul_const(a[1], jnp.asarray(_toep_np(
            (self.b3_c1 * FP.r_mont) % FP.modulus)))
        t2 = FPL.mul_const(a[1], jnp.asarray(_toep_np(
            (self.b3_c0 * FP.r_mont) % FP.modulus)))
        t3 = FPL.mul_const(a[0], jnp.asarray(_toep_np(
            (self.b3_c1 * FP.r_mont) % FP.modulus)))
        return (f.sub(t0, t1), f.add(t2, t3))

    def zeros(self, batch_shape):
        return (self.b.zeros(batch_shape), self.b.zeros(batch_shape))

    def select(self, mask, a, b):
        return (self.b.select(mask, a[0], b[0]),
                self.b.select(mask, a[1], b[1]))

    def normalize(self, a):
        return (self.b.normalize(a[0]), self.b.normalize(a[1]))

    def batch_shape(self, a):
        return self.b.batch_shape(a[0])


F1L = Fq1L()
F2L = Fq2L(F1L)


def point_add(F, p, q):
    """Complete projective addition — identical algebra to
    ec_f32.point_add, run on the lazy engine."""
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
    # normalize the add-formed outputs: keeps the digit bound stationary
    # (~260) across unbounded add chains (scan levels, Horner doublings)
    return (F.sub(m1, m2), F.normalize(F.add(m3, m4)),
            F.normalize(F.add(m5, m6)))
