"""Focused MXU probe: raw seconds per loop, no auto-calibration."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")


def rb(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def probe(name, make_loop, iters_list, flops_per_iter):
    for iters in iters_list:
        f = make_loop(iters)
        rb(f())
        t0 = time.perf_counter()
        rb(f())
        dt = time.perf_counter() - t0
        print(f"{name} iters={iters}: wall={dt*1e3:9.1f} ms "
              f"-> {flops_per_iter*iters/dt/1e12:8.2f} T/s", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    M = N = K = 2048

    ai = jnp.asarray(rng.integers(-127, 127, size=(M, K), dtype=np.int8))
    bi = jnp.asarray(rng.integers(-127, 127, size=(K, N), dtype=np.int8))

    def mk_i8(iters):
        @jax.jit
        def f():
            def body(_, x):
                y = jax.lax.dot_general(
                    x, bi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y & 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, iters, body, ai)
        return f
    probe("i8", mk_i8, [64, 512], 2 * M * N * K)

    abf = jnp.asarray(rng.random((M, K), dtype=np.float32)).astype(jnp.bfloat16)
    bbf = jnp.asarray(rng.random((K, N), dtype=np.float32)).astype(jnp.bfloat16)

    def mk_bf16(iters):
        @jax.jit
        def f():
            def body(_, x):
                y = jnp.dot(x, bbf, preferred_element_type=jnp.float32)
                return (y * 1e-3).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, abf)
        return f
    probe("bf16", mk_bf16, [64, 512], 2 * M * N * K)

    af2 = jnp.asarray(rng.random((M, K), dtype=np.float32))
    bf2 = jnp.asarray(rng.random((K, N), dtype=np.float32))

    def mk_f32(iters):
        @jax.jit
        def f():
            def body(_, x):
                y = jnp.dot(x, bf2, preferred_element_type=jnp.float32)
                return y * 1e-3
            return jax.lax.fori_loop(0, iters, body, af2)
        return f
    probe("f32", mk_f32, [64, 512], 2 * M * N * K)

    # u32 elementwise with more iterations to confirm the 158 G/s cap
    B = 1 << 20
    a32 = jnp.asarray(rng.integers(0, 1 << 32, size=B, dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(0, 1 << 32, size=B, dtype=np.uint32))

    def mk_u32(iters):
        @jax.jit
        def f():
            def body(_, x):
                return x * b32 + a32
            return jax.lax.fori_loop(0, iters, body, a32)
        return f
    probe("u32elem", mk_u32, [4096, 16384], B)


if __name__ == "__main__":
    main()
