"""Stage breakdown of the round-5 fused MSM: plan (windows+upload+sort)
vs the single-dispatch chunk/fold jit, plus an isolated gather timing.

Usage: python scripts/profile_msm2.py [log2_n]
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.crypto import bn254 as bn                     # noqa: E402
from zkpos_tpu.ops import msm as msm_old                     # noqa: E402
from zkpos_tpu.ops import msm_device as md                   # noqa: E402

rng = random.Random(9)
LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 18
n = 1 << LOGN
ms = [rng.randrange(bn.R) for _ in range(n)]
sc = [rng.randrange(bn.R) for _ in range(n)]
pts = msm_old.fixed_base_batch("g1", ms)
base = md.device_base("g1", pts)
jax.block_until_ready(base)

# warm everything once
out = md.msm("g1", base, plan=md.ScalarPlan(sc))
exp = sum(s * m for s, m in zip(sc, ms)) % bn.R
assert out == bn.g1_mul(bn.G1_GEN, exp)

for it in range(2):
    t0 = time.time()
    c = md.pick_c(n)
    win = md.windows_of(sc, c)
    t_win = time.time() - t0

    t0 = time.time()
    plan = md.ScalarPlan(sc, c=c)
    _ = float(jnp.sum(plan.dig_dev))        # force sync over the tunnel
    t_plan = time.time() - t0

    na = 3
    Cn = plan.Cn
    n_chunks = plan.Np // Cn
    fn = md._msm_stream_fn(na, plan.W, Cn, plan.c, n_chunks)
    t0 = time.time()
    res = fn(base, plan.dig_dev, plan.idx_dev)
    _ = float(jnp.sum(res[0]))
    t_msm = time.time() - t0

    # isolated gather cost: one chunk's take from the resident base
    sidx = plan.idx_dev[:, :Cn]

    @jax.jit
    def gather_once(b0, si):
        return jnp.take(b0, si.reshape(-1), axis=1).astype(jnp.float32)

    g = gather_once(base[0], sidx)
    _ = float(jnp.sum(g))
    t0 = time.time()
    g = gather_once(base[0], sidx)
    _ = float(jnp.sum(g))
    t_gather1 = time.time() - t0

    print(json.dumps({
        "n": n, "c": plan.c, "W": plan.W, "Cn": Cn, "chunks": n_chunks,
        "windows_host_s": round(t_win, 3),
        "plan_total_s": round(t_plan, 3),
        "msm_dispatch_s": round(t_msm, 3),
        "gather_1coord_1chunk_s": round(t_gather1, 3)}), flush=True)
