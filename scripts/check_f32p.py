"""Correctness + speed check of the fused f32 Poseidon kernel on TPU."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from zkpos_tpu.crypto.bn254 import R as P
from zkpos_tpu.crypto.poseidon_ref import poseidon
from zkpos_tpu.ops import fr_f32 as fd
from zkpos_tpu.ops.poseidon_f32_pallas import hash2_mont_f32p

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(7)
B = 1 << 16
xs = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(4)]
ys = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(4)]

a_small = fd.to_mont(jnp.asarray(fd.ints_to_digits(xs)))
b_small = fd.to_mont(jnp.asarray(fd.ints_to_digits(ys)))

# big batch: tile the 4 test vectors
reps = B // 4
a = jnp.tile(a_small, (1, reps))
b = jnp.tile(b_small, (1, reps))

t0 = time.perf_counter()
out = hash2_mont_f32p(a, b)
_ = float(jnp.sum(out))
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

got = fd.digits_to_ints(fd.from_mont(out[:, :4]))
want = [poseidon([x, y]) for x, y in zip(xs, ys)]
print("match:", got == want, flush=True)
if got != want:
    print("got ", [hex(g) for g in got])
    print("want", [hex(w) for w in want])
    sys.exit(1)

# also check the last tile (padding path)
got2 = fd.digits_to_ints(fd.from_mont(out[:, -4:]))
assert got2 == want, "tail tile mismatch"

# timing: chain iterations on device
def mk(iters):
    @jax.jit
    def f():
        def body(_, x):
            return hash2_mont_f32p(x, b)
        return jax.lax.fori_loop(0, iters, body, a)
    return f

f = mk(8)
_ = float(jnp.sum(f()))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _ = float(jnp.sum(f()))
    best = min(best, time.perf_counter() - t0)
print(f"rate: {8*B/best/1e6:.3f} Mhash/s (B=2^16)", flush=True)
