"""Where does the Poseidon f32p kernel's time go?  Runs ablated variants of
the fused kernel on the real chip: full, conv-free (sbox muls replaced by a
single elementwise op), reduce-matmul-free, ripple-light.  The deltas give
the VPU-conv / MXU / ripple split and tell which redesign pays.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from zkpos_tpu.ops import fr_f32 as fd
from zkpos_tpu.ops import poseidon_f32_pallas as pk
from zkpos_tpu.crypto import poseidon_params as pp

ND, NC = pk.ND, pk.NC
TILE = pk.TILE
INV256 = pk.INV256
BATCH = 1 << 17


def build_variant(mode):
    """mode: full | noconv | nomm | noripple"""

    def _conv(a, b):
        if mode == "noconv":
            # one padded row op instead of 34 — removes ~97% of conv work
            return jnp.pad(a * b, ((0, NC - ND), (0, 0)))
        acc = None
        for i in range(ND):
            p = jnp.pad(a[i:i + 1] * b, ((i, NC - ND - i), (0, 0)))
            acc = p if acc is None else acc + p
        return acc

    def _ripple2(x, passes=3):
        n = 1 if mode == "noripple" else passes
        for _ in range(n):
            c = jnp.floor(x * INV256)
            x = (x - 256.0 * c) + pk._shift_down(c)
        return x

    def _reduce(t, wn3, wph, wc, bias=None):
        t_lo = t[:ND]
        if mode == "noglue":
            x = jnp.concatenate([t_lo, t_lo, t_lo], axis=0)
        else:
            v1 = jnp.floor(t_lo * INV256)
            p0 = t_lo - 256.0 * v1
            p2 = jnp.floor(v1 * INV256)
            p1 = v1 - 256.0 * p2
            x = jnp.concatenate([p0, p1, p2], axis=0)
        if mode == "nomm":
            m = _ripple2(x[:ND] + x[ND:2 * ND])
            mp_hi = m
            mp_c8 = m[:8]
        else:
            m_c = pk._bdot(wn3, x)
            m = _ripple2(m_c, 3)
            mp_hi = pk._bdot(wph, m)
            mp_c8 = pk._bdot(wc, m)
        if mode == "noglue":
            carry = t[0:1]
        else:
            f = jnp.zeros_like(t[0:1])
            for j in range(8):
                k = ND - 8 + j
                f = f + (t[k:k + 1] + mp_c8[j:j + 1]) * float(2.0 ** (8 * (k - ND)))
            carry = jnp.floor(f + 0.5)
        hi = mp_hi + jnp.pad(t[ND:NC], ((0, 1), (0, 0)))
        hi = hi + jnp.pad(carry, ((0, ND - 1), (0, 0)))
        if bias is not None:
            hi = hi + bias
        return _ripple2(hi)

    def _sbox5(x, wn3, wph, wc):
        x2 = _reduce(_conv(x, x), wn3, wph, wc)
        x4 = _reduce(_conv(x2, x2), wn3, wph, wc)
        return _reduce(_conv(x4, x), wn3, wph, wc)

    def kern(a_ref, b_ref, ark0_ref, biascat_ref, wmix_ref,
             wn3_ref, wph_ref, wc_ref, out_ref):
        T = a_ref.shape[1]
        wn3, wph, wc, wmix = (wn3_ref[...], wph_ref[...], wc_ref[...],
                              wmix_ref[...])
        r_p = pp.partial_rounds(3)
        half = pp.R_FULL // 2
        NCP = 72
        s = jnp.concatenate(
            [jnp.zeros((ND, T), jnp.float32), a_ref[...], b_ref[...]],
            axis=1)
        s = _ripple2(s + pk._bcast3(ark0_ref[...], T))

        def mix_reduce(s, r):
            s102 = jnp.concatenate(
                [s[:, :T], s[:, T:2 * T], s[:, 2 * T:]], axis=0)
            raw = pk._bdot(wmix, s102)
            t67 = jnp.concatenate(
                [raw[0:NC], raw[NCP:NCP + NC], raw[2 * NCP:2 * NCP + NC]],
                axis=1)
            blk = biascat_ref[pl.ds(pl.multiple_of(40 * r, 8), 40), :]
            bias = pk._bcast3(blk[:ND], T)
            return _reduce(t67, wn3, wph, wc, bias=bias)

        def full_body(r, s):
            return mix_reduce(_sbox5(s, wn3, wph, wc), r)

        def partial_body(r, s):
            x5 = _sbox5(s[:, :T], wn3, wph, wc)
            return mix_reduce(jnp.concatenate([x5, s[:, T:]], axis=1), r)

        s = jax.lax.fori_loop(0, half, full_body, s)
        s = jax.lax.fori_loop(half, half + r_p, partial_body, s)
        s = jax.lax.fori_loop(half + r_p, 2 * half + r_p, full_body, s)
        out_ref[...] = s[:, 1 * T:2 * T]

    consts = tuple(jnp.asarray(x, jnp.float32) for x in pk._consts(3))

    @jax.jit
    def hfn(a, b):
        n_tiles = a.shape[1] // TILE
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((ND, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)] * 2 +
                     [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM) for c in consts],
            out_specs=pl.BlockSpec((ND, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ND, a.shape[1]), jnp.float32),
        )(a, b, *consts)
    return hfn


def timeit(hfn, am, bm, iters=16):
    @jax.jit
    def chain():
        return jax.lax.fori_loop(0, iters, lambda _, x: hfn(x, bm), am)
    float(jnp.sum(chain()))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(chain()))
        best = min(best, time.perf_counter() - t0)
    t0 = time.perf_counter()
    float(jnp.sum(am))
    rtt = time.perf_counter() - t0
    return BATCH * iters / max(best - rtt, 1e-9)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    xs = [int.from_bytes(rng.bytes(32), "little") % fd.MODULUS
          for _ in range(4)]
    a4 = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
    am = jnp.tile(a4, (1, BATCH // 4))
    bm = am + 1.0

    rates = {}
    for mode in ["full", "noconv", "nomm", "noripple", "noglue"]:
        r = timeit(build_variant(mode), am, bm)
        rates[mode] = r
        print(f"{mode:9s}: {r/1e6:7.3f} M hash/s", flush=True)
    tf = 1 / rates["full"]
    for m in ["noconv", "nomm", "noripple", "noglue"]:
        print(f"share({m}) = {(tf - 1/rates[m])/tf*100:5.1f}%  of full time")


if __name__ == "__main__":
    main()
