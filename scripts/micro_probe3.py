"""Probe 3: Pallas VPU f32-FMA vs u32-mul rates; pl.dot weights-first shape.

Decides the digit representation of the new MXU-hybrid field engine:
  - if f32 FMA runs ~2x u32 mul+add, use base-256 digits held in f32
    (8x8-bit products are exact in f32; sums < 2^22 stay exact)
  - weights-first matmul m = W (34,34) @ X (34, TILE) keeps the batch on
    lanes with no transposes between VPU and MXU stages.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")


def rb(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def probe(name, f, iters_work):
    iters, work = iters_work
    rb(f())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rb(f())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: wall={best*1e3:9.1f} ms -> "
          f"{work*iters/best/1e9:8.1f} Gop/s", flush=True)


TILE = 512
GRID = 512
CH = 64


def mk_loop(kern, a, b, iters, out_dtype=None):
    out_dtype = out_dtype or a.dtype

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(b.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(a.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(a.shape, out_dtype),
        )(x, b)

    @jax.jit
    def f():
        return jax.lax.fori_loop(0, iters, lambda _, x: call(x), a)
    return f


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    a32 = jnp.asarray(rng.integers(1, 1 << 8, (16, TILE), np.uint32))
    b32 = jnp.asarray(rng.integers(1, 1 << 8, (16, TILE), np.uint32))

    def k_u32mul(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(CH):
            x = (x * b) & 0xFFFF
        o_ref[...] = x
    probe("u32 mul+mask chain",
          mk_loop(k_u32mul, a32, b32, 16),
          (16, GRID * 16 * TILE * CH * 2))

    def k_u32ma(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(CH):
            x = x * b + b
        o_ref[...] = x
    probe("u32 mul+add chain ",
          mk_loop(k_u32ma, a32, b32, 16),
          (16, GRID * 16 * TILE * CH * 2))

    af = jnp.asarray(rng.random((16, TILE), np.float32)) + 0.5
    bf = jnp.asarray(rng.random((16, TILE), np.float32)) * 1e-3

    def k_f32fma(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(CH):
            x = x * b + b
        o_ref[...] = x
    probe("f32 fma chain      ",
          mk_loop(k_f32fma, af, bf, 64),
          (64, GRID * 16 * TILE * CH * 2))

    def k_f32floor(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(CH):
            f = jnp.floor(x * (1.0 / 256.0))
            x = (x - 256.0 * f) + b
        o_ref[...] = x
    probe("f32 floor-ripple   ",
          mk_loop(k_f32floor, af, bf, 32),
          (32, GRID * 16 * TILE * CH * 4))

    # --- weights-first pl.dot: W (64, 64) @ X (64, TILE) f32 -----------------
    Wm = jnp.asarray(rng.random((64, 64), np.float32))
    Xm = jnp.asarray(rng.random((64, TILE), np.float32))

    def k_dot(w_ref, x_ref, o_ref):
        w = w_ref[...]
        x = x_ref[...]
        for _ in range(8):
            x = jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * 1e-2
        o_ref[...] = x

    def call(x):
        return pl.pallas_call(
            k_dot,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((64, 64), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((64, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, TILE), jnp.float32),
        )(Wm, x)

    @jax.jit
    def f():
        return jax.lax.fori_loop(0, 16, lambda _, x: call(x), Xm)
    probe("pl.dot f32 (64,64)@(64,512)",
          f, (16, GRID * 8 * 2 * 64 * 64 * TILE))

    # mixed: fma chains interleaved with dots (realistic kernel mix)
    def k_mix(w_ref, x_ref, o_ref):
        w = w_ref[...]
        x = x_ref[...]
        for _ in range(4):
            y = jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = x * 1e-2 + y * 1e-3
            for _ in range(16):
                x = x * 0.999 + 1.0
        o_ref[...] = x

    def call2(x):
        return pl.pallas_call(
            k_mix,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((64, 64), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((64, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, TILE), jnp.float32),
        )(Wm, x)

    @jax.jit
    def f2():
        return jax.lax.fori_loop(0, 16, lambda _, x: call2(x), Xm)
    probe("mixed dot+fma      ",
          f2, (16, GRID * 4 * (2 * 64 * 64 * TILE + 16 * 64 * TILE * 2)))


if __name__ == "__main__":
    main()
