"""Piecewise debug of the fused Poseidon kernel stages on TPU."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")

from zkpos_tpu.crypto.bn254 import R as P
from zkpos_tpu.ops import fr_f32 as fd
from zkpos_tpu.ops import poseidon_f32_pallas as pk

ND, NC = pk.ND, pk.NC
T = 512
rng = np.random.default_rng(3)
xs = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(T)]
ys = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(T)]
a = np.asarray(fd.to_mont(jnp.asarray(fd.ints_to_digits(xs))))
b = np.asarray(fd.to_mont(jnp.asarray(fd.ints_to_digits(ys))))
aj, bj = jnp.asarray(a), jnp.asarray(b)

ark0, biascat, w_mix, w_n3, w_p_hi, w_c = (jnp.asarray(x)
                                           for x in pk._consts(3))


def run_kernel(kern, out_rows, *ins):
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, memory_space=pltpu.VMEM)
                  for x in ins],
        out_specs=pl.BlockSpec((out_rows, T), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, T), jnp.float32),
    )(*ins)


# --- stage 1: conv --------------------------------------------------------
def k_conv(a_ref, b_ref, o_ref):
    o_ref[...] = pk._conv(a_ref[...], b_ref[...])

t_dev = np.asarray(run_kernel(k_conv, NC, aj, bj), dtype=np.float64)
t_ref = np.zeros((NC, T))
for i in range(ND):
    t_ref[i:i + ND] += a[i][None].astype(np.float64) * b.astype(np.float64)
print("conv ok:", np.array_equal(t_dev, t_ref), flush=True)

# --- stage 2: ripple2 -----------------------------------------------------
def k_rip(a_ref, b_ref, o_ref):
    o_ref[...] = pk._ripple2(pk._conv(a_ref[...], b_ref[...])[:ND])

r_dev = np.asarray(run_kernel(k_rip, ND, aj, bj), dtype=np.float64)
# value check mod 256^34
def val(d):
    tot = []
    for j in range(d.shape[1]):
        v = 0
        for i in reversed(range(d.shape[0])):
            v = (v << 8) + int(d[i, j])
        tot.append(v % (1 << 272))
    return tot
want = [v % (1 << 272) for v in val(t_ref[:ND] % (1 << 60))]  # not exact; skip
# proper: value of t_ref[:34] as integer mod 2^272
want = []
for j in range(T):
    v = 0
    for i in reversed(range(ND)):
        v = (v << 8) + int(t_ref[i, j])
    want.append(v % (1 << 272))
print("ripple2 ok:", val(r_dev) == want,
      "maxdigit:", r_dev.max(), flush=True)

# --- stage 3: reduce ------------------------------------------------------
def k_red(a_ref, b_ref, wn3_ref, wph_ref, wc_ref, o_ref):
    t = pk._conv(a_ref[...], b_ref[...])
    o_ref[...] = pk._reduce(t, wn3_ref[...], wph_ref[...], wc_ref[...])

red_dev = np.asarray(run_kernel(k_red, ND, aj, bj, w_n3, w_p_hi, w_c),
                     dtype=np.float64)
got = [v % P for v in val(red_dev)]
Rinv = pow(1 << 272, -1, P)
want = [(x * y % P) * Rinv % P
        for x, y in zip(val(a.astype(np.float64)), val(b.astype(np.float64)))]
print("reduce ok:", got == want, "maxdigit:", red_dev.max(), flush=True)
if got != want:
    bad = [j for j in range(T) if got[j] != want[j]]
    print("bad count:", len(bad), "first:", bad[:5])
    j = bad[0]
    print("got ", hex(got[j]))
    print("want", hex(want[j]))
    print("diff/P:", (got[j] - want[j]) % P == 0)
    d = (got[j] - want[j])
    print("diff =", d, "diff/p:", d / P if P else 0)
