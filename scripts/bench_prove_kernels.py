"""On-TPU throughput probe for the prove-path kernels (MSM / NTT).

Run on the real chip (no platform override):
    python scripts/bench_prove_kernels.py [log_n_msm] [log_n_ntt]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.crypto import bn254 as bn           # noqa: E402
from zkpos_tpu.ops import msm                       # noqa: E402
from zkpos_tpu.groth16.ntt_device import (          # noqa: E402
    ints_to_mont_digits, ntt_mont)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    log_ntt = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << log_n
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # build n affine points with the fixed-base kernel (device, fast)
    t0 = time.time()
    sc = [int.from_bytes(rng.bytes(32), "little") % bn.R for _ in range(n)]
    pts = msm.fixed_base_batch("g1", sc)
    print(f"point gen {n}: {time.time()-t0:.1f}s", flush=True)

    sc2 = [int.from_bytes(rng.bytes(32), "little") for _ in range(n)]
    t0 = time.time()
    r1 = msm.msm_g1(pts, sc2)
    t_first = time.time() - t0
    t0 = time.time()
    r2 = msm.msm_g1(pts, [s + 1 for s in sc2])
    t_second = time.time() - t0
    print(f"msm g1 2^{log_n}: first {t_first:.2f}s (compiles), "
          f"steady {t_second:.2f}s = {n/t_second:.0f} pts/s", flush=True)

    # spot-check against a small oracle subset
    k = 64
    acc = None
    for p, s in zip(pts[:k], sc2[:k]):
        acc = bn.g1_add(acc, bn.g1_mul(p, s % bn.R))
    got = msm.msm_g1(pts[:k], sc2[:k])
    print("subset oracle match:", got == acc, flush=True)

    m = 1 << log_ntt
    vals = [int.from_bytes(rng.bytes(32), "little") % bn.R for _ in range(m)]
    t0 = time.time()
    d = ints_to_mont_digits(vals)
    print(f"host->digits {m}: {time.time()-t0:.1f}s", flush=True)
    out = ntt_mont(d)
    out.block_until_ready()
    t0 = time.time()
    out = ntt_mont(out)
    np.asarray(out[:, :1])   # sync via tiny readback
    dt = time.time() - t0
    print(f"ntt 2^{log_ntt}: {dt*1000:.0f}ms = {m/dt:.0f} elts/s", flush=True)


if __name__ == "__main__":
    main()
