"""Bisect the Mosaic crash in the seg-scan kernel (limits 8 vs dim 1)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ND = 34
T = 1024
S = 2048
STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def kernel(xr, hr, idr, outr, scr):
    pid = pl.program_id(0)
    x = xr[...]
    f = hr[...][0:1]
    id1 = idr[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    if STAGE >= 2:
        @pl.when(pid == 0)
        def _init():
            scr[...] = id1

    if STAGE >= 3:
        carry = jnp.broadcast_to(scr[:, 0:1], x.shape)
        cont0 = (lane == 0) & (f < 0.5)
        x = jnp.where(cont0, x + carry, x)

    if STAGE >= 4:
        for s in range(10):
            sh = 1 << s
            valid = lane >= sh
            part = jnp.where(valid,
                             jnp.concatenate([x[:, T - sh:], x[:, :T - sh]],
                                             axis=1),
                             id1[:, 0:1])
            pf = jnp.where(valid,
                           jnp.concatenate([f[:, T - sh:], f[:, :T - sh]],
                                           axis=1), 0.0)
            keep = f > 0.5
            x = jnp.where(keep, x, x + part)
            f = jnp.maximum(f, pf)

    outr[...] = x
    if STAGE >= 2:
        scr[...] = jnp.broadcast_to(x[:, T - 1:T], (ND, 128))


def main5():
    """Stage 5+: the REAL seg_scan_pallas at growing sizes."""
    from zkpos_tpu.ops import ec_pallas as ep
    from zkpos_tpu.ops.fd32 import FP
    from zkpos_tpu.crypto import bn254 as bn
    rng = np.random.default_rng(3)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ms = [int(rng.integers(1, 1000)) for _ in range(4)]
    pts = [bn.g1_mul(bn.G1_GEN, m) for m in ms]

    def dev(vals):
        return jnp.asarray(FP.ints_to_digits(
            [(v * FP.r_mont) % FP.modulus for v in vals]))
    X = dev([p[0] for p in pts] * (n // 4))
    Y = dev([p[1] for p in pts] * (n // 4))
    Z = dev([1] * n)
    heads = np.zeros(n, bool)
    heads[0] = True
    heads[n // 3] = True
    out = ep.seg_scan_pallas(3, (X, Y, Z), jnp.asarray(heads))
    print("stage5 ok", float(jnp.sum(out[0])))


def main6():
    """Inline copy of the seg-scan kernel, choppable via stage:
    6 = carry-merge only (real add core, scratch)
    7 = + one HS step
    8 = + all HS steps (full kernel equivalent)
    """
    from zkpos_tpu.ops import ec_pallas as ep
    from zkpos_tpu.ops import fd32
    from zkpos_tpu.crypto import bn254 as bn
    from zkpos_tpu.ops.fd32 import FP
    ND_ = 34
    Tt = 1024
    S_ = 1024
    nsteps = {6: 0, 7: 1, 8: 10}[STAGE]

    w_n3, w_p_hi, w_c, b3t, kp, k0t, k1t = ep._fp_consts()
    bf = lambda v: jnp.asarray(v, dtype=jnp.bfloat16)
    id1 = np.tile(ep._digits_of(fd32.FP.r_mont, ND_)[:, None],
                  (1, 128)).astype(np.float32)
    consts = (bf(w_n3), bf(w_p_hi), bf(w_c), bf(b3t), jnp.asarray(kp),
              jnp.asarray(id1))

    def kern(xr, yr, zr, hr, wn3r, wphr, wcr, b3r, kpr, id1r,
             ox, oy, oz, cx, cy, cz):
        cc = (wn3r[...], wphr[...], wcr[...], b3r[...], kpr[...])
        add = lambda a, b: ep._g1_add_core(*a, *b, *cc)
        pid = pl.program_id(0)
        cur = [xr[...], yr[...], zr[...]]
        f = hr[...][0:1]
        id1v = id1r[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Tt), 1)
        scratch = [cx, cy, cz]

        @pl.when(pid == 0)
        def _init():
            cx[...] = jnp.zeros_like(id1v)
            cy[...] = id1v
            cz[...] = jnp.zeros_like(id1v)

        carry = [scratch[k][...] for k in range(3)]    # (34, 128)
        first = [x[:, 0:128] for x in cur]
        merged = add(tuple(carry), tuple(first))       # (34, 128) ops
        cont0 = (lane == 0) & (f < 0.5)
        mpad = [jnp.concatenate(
            [m, jnp.zeros((ND_, Tt - 128), jnp.float32)], axis=1)
            for m in merged]
        cur = [jnp.where(cont0, m, x) for m, x in zip(mpad, cur)]

        for s in range(nsteps):
            sh = 1 << s
            valid = lane >= sh
            part = []
            for k in range(3):
                p = jnp.concatenate(
                    [cur[k][:, Tt - sh:], cur[k][:, :Tt - sh]], axis=1)
                ident = id1v[:, 0:1] if k == 1 else jnp.float32(0.0)
                part.append(jnp.where(valid, p, ident))
            pf = jnp.where(
                valid,
                jnp.concatenate([f[:, Tt - sh:], f[:, :Tt - sh]], axis=1),
                0.0)
            summed = add(tuple(part), tuple(cur))
            keep = f > 0.5
            cur = [jnp.where(keep, x, sm) for x, sm in zip(cur, summed)]
            f = jnp.maximum(f, pf)

        ox[...], oy[...], oz[...] = cur
        for k in range(3):
            scratch[k][...] = jnp.broadcast_to(cur[k][:, Tt - 1:Tt],
                                               id1v.shape)

    rng = np.random.default_rng(3)
    ms = [int(rng.integers(1, 1000)) for _ in range(4)]
    pts = [bn.g1_mul(bn.G1_GEN, m) for m in ms]

    def dev(vals):
        return jnp.asarray(FP.ints_to_digits(
            [(v * FP.r_mont) % FP.modulus for v in vals]))
    X = dev([p[0] for p in pts] * (S_ // 4))
    Y = dev([p[1] for p in pts] * (S_ // 4))
    Z = dev([1] * S_)
    heads = np.zeros((8, S_), np.float32)
    heads[:, 0] = 1.0

    tile = pl.BlockSpec((ND_, Tt), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    head_spec = pl.BlockSpec((8, Tt), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(S_ // Tt,),
        in_specs=[tile] * 3 + [head_spec] + [full(c.shape) for c in consts],
        out_specs=(tile,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((ND_, S_), jnp.float32)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((ND_, 128), jnp.float32)] * 3,
    )(X, Y, Z, jnp.asarray(heads), *consts)
    print("stage", STAGE, "ok", float(jnp.sum(out[0])))


def main():
    if STAGE >= 6:
        main6()
        return
    if STAGE >= 5:
        main5()
        return
    x = jnp.asarray(np.random.default_rng(0).random((ND, S)), jnp.float32)
    heads = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, (8, S)), jnp.float32)
    id1 = jnp.asarray(np.ones((ND, 128)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(S // T,),
        in_specs=[
            pl.BlockSpec((ND, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ND, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ND, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ND, 128), jnp.float32)],
    )(x, heads, id1)
    print("stage", STAGE, "ok", float(jnp.sum(out)))


if __name__ == "__main__":
    main()
