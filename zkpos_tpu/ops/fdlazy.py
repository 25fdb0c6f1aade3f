"""Ripple-free f32 digit-vector Montgomery arithmetic (second-generation
TPU field engine).

Same representation as ops/fd32.py — (34, ...) float32 base-256 digits,
Montgomery domain R = 2^272 — but carry handling is PARALLEL: a
"redistribute" step splits digits into remainder + carry and shifts the
carries up one position (a handful of elementwise VPU ops), instead of
the 34-step serial carry ripple.

Why it matters (VERDICT r3 weak #3/#4): the serial ripples were both the
VPU bottleneck (~300 dependent ops per multiply; two independent kernels
converged on ~0.6 G mults/s) and the graph-size bottleneck (~600 HLO per
multiply pushed the sorted-stream MSM's scan kernels to ~10-minute axon
remote compiles).  This engine does the same exact integer arithmetic in
~5x fewer dependent VPU ops and ~4x smaller graphs.

Correctness model (f32 integers are exact below 2^24):
  * element LE(d, dB, vB): |digit| <= dB with digits >= -4 when "clean",
    and -0.01*p <= value <= vB * p (value = sum d_i 256^i as a signed
    integer; only its residue mod p is meaningful downstream);
  * conv exactness: 34 * (dBa+4) * (dBb+4) <= 12.5e6, trace-checked;
  * top-digit control: digit 33 is never carry-split on value-preserving
    paths; because values stay O(p) << 256^33 and the other digits are
    >= -4 after redistributes, digit 33 is analytically <= ~5 — the
    pessimistic per-pass bound is clamped by the tracked value bound;
  * mod-R paths (t mod R, m) DO drop top carries: 256^34 = R.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .fd32 import Fd32, NCONV, NDIGITS, _digits_of

_CONV_CAP = 12.5e6         # conv/accumulation exactness budget (< 2^24)
_INV256 = 1.0 / 256.0
_SLACK = 4.0               # worst negative digit of a clean element


class LE(NamedTuple):
    d: jnp.ndarray          # (34, ...) f32
    dB: float               # max |digit|
    vB: float               # value <= vB * p (value >= -0.01 p)


def _redist_modR(d, B):
    """Carry step dropping the top carry (value preserved mod R only)."""
    c = jnp.floor(d * _INV256)
    r = d - 256.0 * c
    up = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    return r + up, 255.0 + B * _INV256 + 1.0


def _redist_keep(d, B_low, B_top):
    """Carry step preserving the exact value: digits 0..32 split, digit 33
    only receives carry 32 (its own excess is analytically tiny)."""
    c = jnp.floor(d[:-1] * _INV256)
    r = d[:-1] - 256.0 * c
    up = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    low = r + up
    top = d[-1:] + c[-1:]
    out = jnp.concatenate([low, top], axis=0)
    nB_low = 255.0 + B_low * _INV256 + 1.0
    nB_top = B_top + B_low * _INV256 + 1.0
    return out, nB_low, nB_top


class FdL:
    """Ripple-free engine over one modulus (p or r)."""

    def __init__(self, base: Fd32):
        self.f = base
        self.modulus = base.modulus
        # value vB*p bounds digit 33 by vB * p / 2^264 (+ slack)
        self.top_unit = base.modulus / float(2 ** 264)

    @lru_cache(maxsize=None)
    def _kp_np(self, k: int) -> tuple:
        v = k * self.modulus
        assert v < (1 << 272)
        return tuple(_digits_of(v).tolist())

    def _top_clamp(self, vB: float) -> float:
        return vB * self.top_unit + _SLACK + 1.0

    # -- element construction -------------------------------------------------

    def wrap(self, d, dB=255.0, vB=1.0) -> LE:
        return LE(d, float(dB), float(vB))

    def zeros(self, batch_shape) -> LE:
        return LE(jnp.zeros((NDIGITS,) + tuple(batch_shape), jnp.float32),
                  0.0, 0.0)

    # -- cheap ops (no carry work at all) -------------------------------------

    def add(self, a: LE, b: LE) -> LE:
        return LE(a.d + b.d, a.dB + b.dB, a.vB + b.vB)

    def dbl(self, a: LE) -> LE:
        return LE(a.d + a.d, 2 * a.dB, 2 * a.vB)

    def triple(self, a: LE) -> LE:
        return LE(a.d + a.d + a.d, 3 * a.dB, 3 * a.vB)

    def sub(self, a: LE, b: LE) -> LE:
        """a + kp - b, k = ceil(vB(b) + margin): value stays positive."""
        k = int(np.ceil(b.vB + 0.02))
        kp = jnp.asarray(np.asarray(self._kp_np(k), dtype=np.float32))
        kp = kp.reshape((NDIGITS,) + (1,) * (a.d.ndim - 1))
        d = a.d + kp - b.d
        B_low = B_top = a.dB + 255.0 + b.dB
        vB = a.vB + k
        for _ in range(2):
            d, B_low, B_top = _redist_keep(d, B_low, B_top)
        dB = max(B_low, min(B_top, self._top_clamp(vB)))
        return LE(d, dB, vB)

    # -- Montgomery multiply --------------------------------------------------

    def reduce_mont(self, t, tB: float, v_in_p: float) -> LE:
        """(67, ...) conv coeffs -> (34, ...) digits of t/R mod p.

        tB: max |coeff|; v_in_p: value(t) <= v_in_p * p * R (so the
        output value is <= (v_in_p + 1.02) * p)."""
        w_n_np, w_p_np = self.f._reduce_mats()
        w_n, w_p = jnp.asarray(w_n_np), jnp.asarray(w_p_np)
        t_lo = t[:NDIGITS]
        loB = tB
        for _ in range(2):
            t_lo, loB = _redist_modR(t_lo, loB)
        assert NDIGITS * 255.0 * (loB + 1) <= _CONV_CAP, loB
        m = jnp.einsum("ki,i...->k...", w_n, t_lo,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        mB = NDIGITS * 255.0 * (loB + 1)
        for _ in range(2):
            m, mB = _redist_modR(m, mB)
        assert NDIGITS * 255.0 * (mB + 1) <= _CONV_CAP, mB
        mp = jnp.einsum("ki,i...->k...", w_p, m,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        mpB = NDIGITS * 255.0 * (mB + 1)
        # exact carry out of the low 272 bits via a float weighted sum
        lo_sum = t[:NDIGITS] + mp[:NDIGITS]
        assert tB + mpB <= 2 ** 24, (tB, mpB)
        weights = jnp.asarray(
            (256.0 ** (np.arange(NDIGITS) - NDIGITS)).astype(np.float32))
        carry = jnp.round(jnp.einsum(
            "i...,i->...", lo_sum, weights,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        carry_B = (tB + mpB) * NDIGITS * _INV256
        hi = jnp.concatenate([t[NDIGITS:], jnp.zeros_like(t[:1])],
                             axis=0) + mp[NDIGITS:]
        hi = hi.at[0].add(carry)
        B_low = B_top = tB + mpB + carry_B
        out = hi
        for _ in range(3):
            out, B_low, B_top = _redist_keep(out, B_low, B_top)
        # value(out) = (value(t) + value(m) p)/R with value(m) in
        # (-R/255, 1.02 R)
        vB = v_in_p + 1.02
        dB = max(B_low, min(B_top, self._top_clamp(vB)))
        return LE(out, dB, vB)

    def mul_many(self, pairs: Sequence[Tuple[LE, LE]]):
        """Stacked Montgomery products: ONE conv + reduce for all pairs."""
        aa = jnp.stack([p[0].d for p in pairs], axis=1)
        bb = jnp.stack([p[1].d for p in pairs], axis=1)
        worst = max((p[0].dB + _SLACK) * (p[1].dB + _SLACK) for p in pairs)
        assert NDIGITS * worst <= _CONV_CAP, \
            [(p[0].dB, p[1].dB) for p in pairs]
        vmax = max(p[0].vB * p[1].vB for p in pairs)
        t = Fd32.conv(aa, bb)
        tB = NDIGITS * worst
        out = self.reduce_mont(t, tB,
                               vmax * self.modulus / float(2 ** 272))
        return tuple(LE(out.d[:, i], out.dB, out.vB)
                     for i in range(len(pairs)))

    def mul_const(self, a: LE, toep: jnp.ndarray) -> LE:
        """a * const (Montgomery-form (67, 34) Toeplitz) + reduce."""
        assert NDIGITS * 255.0 * (a.dB + _SLACK) <= _CONV_CAP, a.dB
        t = jnp.einsum("ki,i...->k...", toep, a.d,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return self.reduce_mont(t, NDIGITS * 255.0 * (a.dB + _SLACK),
                                a.vB)

    def select(self, mask, a: LE, b: LE) -> LE:
        return LE(jnp.where(mask[None], a.d, b.d),
                  max(a.dB, b.dB), max(a.vB, b.vB))

    def normalize(self, a: LE, passes: int = 1) -> LE:
        """Redistribute to pull the digit bound back toward ~258 (keeps
        add-chain outputs inside the stationary band)."""
        d, B_low, B_top = a.d, a.dB, a.dB
        for _ in range(passes):
            d, B_low, B_top = _redist_keep(d, B_low, B_top)
        return LE(d, max(B_low, min(B_top, self._top_clamp(a.vB))), a.vB)

    # -- readback -------------------------------------------------------------

    def to_nonneg(self, a: LE) -> jnp.ndarray:
        """Digits with a guaranteed non-negative value (adds 2p and
        redistributes) for the host digit->int converters."""
        kp = jnp.asarray(np.asarray(self._kp_np(2), dtype=np.float32))
        kp = kp.reshape((NDIGITS,) + (1,) * (a.d.ndim - 1))
        d = a.d + kp
        B_low = B_top = a.dB + 255.0
        for _ in range(2):
            d, B_low, B_top = _redist_keep(d, B_low, B_top)
        return d
