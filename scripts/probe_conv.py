"""Digit-convolution formulations shoot-out (pure conv throughput, Pallas).

Variants (all (34,T)x(34,T)->(67,T) f32):
  padloop  — current kernel: 34x [broadcast-mul + pad-to-offset + add]
  grouped  — residue-grouped: inner sums use 8-aligned row shifts (vreg
             moves), only 8 final sublane-misaligned shifted adds
  triangle — squaring-only: i<=j half products, off-diagonal doubled
  padloop_sq / grouped_sq — padloop/grouped with b=a (baseline for triangle)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

ND, NC = 34, 67
TILE = 512
GRID = 128
REPS = 8          # convs per kernel invocation


def conv_padloop(a, b):
    acc = None
    for i in range(ND):
        p = jnp.pad(a[i:i + 1] * b, ((i, NC - ND - i), (0, 0)))
        acc = p if acc is None else acc + p
    return acc


def conv_grouped(a, b):
    # S_r = sum_q shift_{8q}(a_{8q+r} * b); c = sum_r shift_r(S_r)
    acc = None
    for r in range(8):
        s_r = None
        for q in range(5):
            i = 8 * q + r
            if i >= ND:
                break
            p = jnp.pad(a[i:i + 1] * b, ((8 * q, NC - ND - 8 * q), (0, 0)))
            s_r = p if s_r is None else s_r + p
        t = jnp.pad(s_r[:NC - r], ((r, 0), (0, 0)))
        acc = t if acc is None else acc + t
    return acc


def conv_triangle(a):
    # c = 2*sum_{i<j} a_i a_j + diag;  per i: a_i * a[i:] at offset 2i
    a2 = a + a
    acc = None
    for i in range(ND):
        row = (a[i:i + 1] if i == ND - 1 else
               jnp.concatenate([a[i:i + 1], a2[i + 1:]], axis=0))  # (34-i, T)
        p = jnp.pad(a[i:i + 1] * row, ((2 * i, NC - (ND - i) - 2 * i),
                                       (0, 0)))
        acc = p if acc is None else acc + p
    return acc


def mk(f, nargs=2):
    def kern(a_ref, b_ref, o_ref):
        x = a_ref[...]
        b = b_ref[...]
        for _ in range(REPS):
            c = f(x, b) if nargs == 2 else f(x)
            # fold back to (34,T) so the loop carries a dependency
            x = c[:ND] * 1e-7 + jnp.pad(c[ND:], ((0, 1), (0, 0))) * 1e-7 + b
        o_ref[...] = x

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ND, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((ND, TILE), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ND, TILE), jnp.float32),
        )(a, b)
    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, (ND, TILE)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 256, (ND, TILE)), jnp.float32)

    # correctness first (interpret off-device not needed; tiny check on host)
    an, bn = np.asarray(a)[:, :4], np.asarray(b)[:, :4]
    want = np.zeros((NC, 4))
    for i in range(ND):
        for j in range(ND):
            want[i + j] += an[i] * bn[j]
    for name, f, nargs in [("padloop", conv_padloop, 2),
                           ("grouped", conv_grouped, 2),
                           ("triangle", conv_triangle, 1)]:
        g = (lambda x, y: f(x)) if nargs == 1 else f
        got = np.asarray(jax.jit(g)(a, b))[:, :4]
        ref = want if nargs == 2 else None
        if nargs == 1:
            ref = np.zeros((NC, 4))
            for i in range(ND):
                for j in range(ND):
                    ref[i + j] += an[i] * an[j]
        assert np.allclose(got, ref), name
        print(f"{name}: correct", flush=True)

    for name, f, nargs in [("padloop", conv_padloop, 2),
                           ("grouped", conv_grouped, 2),
                           ("triangle", conv_triangle, 1),
                           ]:
        run = mk(f, nargs)
        float(jnp.sum(run(a, b)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(a, b)))
            best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(a))
        rtt = time.perf_counter() - t0
        el = max(best - rtt, 1e-9)
        nconv = GRID * REPS * TILE
        print(f"{name:9s}: {nconv/el/1e6:8.2f} M conv/s "
              f"({nconv*ND*ND/el/1e9:7.1f} G FMA/s)", flush=True)


if __name__ == "__main__":
    main()
