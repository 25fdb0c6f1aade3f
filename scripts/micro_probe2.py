"""Probe 2: u8 MXU matmul, VPU peak inside Pallas, existing Pallas hash2."""
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


def probe(name, make_loop, iters, work_per_iter, unit="T/s", scale=1e12):
    f = make_loop(iters)
    rb(f())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rb(f())
        best = min(best, time.perf_counter() - t0)
    print(f"{name} iters={iters}: wall={best*1e3:9.1f} ms -> "
          f"{work_per_iter*iters/best/scale:8.2f} {unit}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # --- u8 x u8 -> i32 matmul ------------------------------------------------
    M = N = K = 2048
    au = jnp.asarray(rng.integers(0, 255, size=(M, K), dtype=np.uint8))
    bu = jnp.asarray(rng.integers(0, 255, size=(K, N), dtype=np.uint8))

    def mk_u8(iters):
        @jax.jit
        def f():
            def body(_, x):
                y = jax.lax.dot_general(
                    x, bu, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y & 255).astype(jnp.uint8)
            return jax.lax.fori_loop(0, iters, body, au)
        return f
    probe("u8 matmul", mk_u8, 512, 2 * M * N * K)

    # thin matmul shaped like the Poseidon mix/reduce: (B, 128) @ (128, 256)
    B = 1 << 15
    at = jnp.asarray(rng.integers(0, 255, size=(B, 128), dtype=np.uint8))
    bt = jnp.asarray(rng.integers(0, 255, size=(128, 256), dtype=np.uint8))

    def mk_thin(iters):
        @jax.jit
        def f():
            def body(_, x):
                y = jax.lax.dot_general(
                    x, bt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y[:, :128] & 255).astype(jnp.uint8)
            return jax.lax.fori_loop(0, iters, body, at)
        return f
    probe("u8 thin (32k,128)@(128,256)", mk_thin, 256, 2 * B * 128 * 256)

    # --- VPU peak inside a Pallas kernel -------------------------------------
    TILE = 1024
    CH = 64  # chained mults per load

    def chain_kernel(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(CH):
            x = (x * b + b) & 0xFFFF
        o_ref[...] = x

    def mk_pallas_chain(iters):
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, TILE),
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, TILE),
                                     dtype=np.uint32))
        grid = 256

        def call(x):
            return pl.pallas_call(
                chain_kernel,
                grid=(grid,),
                in_specs=[pl.BlockSpec((16, TILE), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((16, TILE), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((16, TILE), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, TILE), jnp.uint32),
            )(x, b)

        @jax.jit
        def f():
            def body(_, x):
                return call(x)
            return jax.lax.fori_loop(0, iters, body, a)
        return f
    # ops per loop iter: grid * 16*TILE * CH * 2 (mul+add; mask free-ish)
    probe("pallas u32 chain (VPU)", mk_pallas_chain, 32,
          256 * 16 * TILE * CH * 2, unit="G/s", scale=1e9)

    # --- existing Pallas hash2 ------------------------------------------------
    from zkpos_tpu.ops.poseidon_pallas import hash2_mont_pallas
    Bh = 1 << 16
    ah = jnp.asarray(rng.integers(0, 1 << 16, size=(16, Bh), dtype=np.uint32))
    bh = jnp.asarray(rng.integers(0, 1 << 16, size=(16, Bh), dtype=np.uint32))

    def mk_hashp(iters):
        @jax.jit
        def f():
            def body(_, x):
                return hash2_mont_pallas(x, bh)
            return jax.lax.fori_loop(0, iters, body, ah)
        return f
    probe("hash2 pallas B=2^16", mk_hashp, 8, Bh, unit="Mhash/s", scale=1e6)


if __name__ == "__main__":
    main()
