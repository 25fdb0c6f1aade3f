"""Benchmark + correctness check of the on-device sorted-stream MSM on the
real chip.  Bases are built with the device fixed-base kernel as P_i = m_i*G
so the expected MSM result is (sum s_i*m_i mod r)*G — one host mul verifies
a 2^20-point MSM.

Usage: python scripts/bench_msm_device.py [log2_sizes...] (default 14 18 20)
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.crypto import bn254 as bn                     # noqa: E402
from zkpos_tpu.ops import msm as msm_old                     # noqa: E402
from zkpos_tpu.ops import msm_device as md                   # noqa: E402

rng = random.Random(123)
SIZES = [int(a) for a in sys.argv[1:]] or [14, 18, 20]


def run(curve, logn):
    import numpy as np
    n = 1 << logn
    ms = [rng.randrange(bn.R) for _ in range(n)]
    sc = [rng.randrange(bn.R) for _ in range(n)]
    # scalars enter ScalarPlan as (N, 4) u64 limb rows — the production
    # path (the native solver emits limbs); python-int window building
    # cost ~4 s/2^20 of pure bench overhead in round 4
    sc_limbs = np.frombuffer(
        b"".join(s.to_bytes(32, "little") for s in sc),
        dtype="<u8").reshape(n, 4).copy()
    t0 = time.time()
    pts = msm_old.fixed_base_batch(curve, ms)
    t_gen = time.time() - t0
    t0 = time.time()
    base = md.device_base(curve, pts)
    jax.block_until_ready(base)
    t_up = time.time() - t0

    # warm (compile) + steady
    times = []
    out = None
    for it in range(3):
        t0 = time.time()
        plan = md.ScalarPlan(sc_limbs)
        out = md.msm(curve, base, plan=plan)
        times.append(time.time() - t0)
    expected_scalar = sum(s * m for s, m in zip(sc, ms)) % bn.R
    gen = bn.G1_GEN if curve == "g1" else bn.G2_GEN
    mul = bn.g1_mul if curve == "g1" else bn.g2_mul
    ok = out == mul(gen, expected_scalar)
    print(json.dumps({
        "curve": curve, "n": n, "ok": ok,
        "msm_cold_s": round(times[0], 3),
        "msm_steady_s": round(min(times[1:]), 3),
        "base_gen_s": round(t_gen, 2), "base_upload_s": round(t_up, 2),
    }), flush=True)
    assert ok, f"MSM mismatch at {curve} 2^{logn}"


for logn in SIZES:
    run("g1", logn)
run("g2", min(SIZES))
