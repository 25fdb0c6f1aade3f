"""Phase breakdown of the on-device sorted-stream MSM on the real chip.

Usage: python scripts/profile_msm.py [log2_n] (default 18)
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
    jax.block_until_ready((plan.dig_dev, plan.idx_dev))
    t_plan = time.time() - t0          # includes windows again + upload + sort

    na = 3
    Cn = plan.Cn
    n_chunks = -(-plan.K // Cn)
    nb = 1 << plan.c
    import numpy as np
    ids = md._id_arrs_np(na)
    dense = tuple(jnp.broadcast_to(jnp.asarray(i)[:, :, None],
                                   (34, plan.W, nb)).copy() for i in ids)
    cd = jnp.full((plan.W,), -1, dtype=jnp.int32)
    cp = tuple(jnp.broadcast_to(jnp.asarray(i), (34, plan.W)).copy()
               for i in ids)
    step = md._chunk_fn(na, plan.W, Cn, plan.c)
    t0 = time.time()
    for k in range(n_chunks):
        start = jnp.int32(plan.Np - (n_chunks - k) * Cn)
        dense, cd, cp = step(base, plan.dig_dev, plan.idx_dev, start,
                             dense, cd, cp)
    jax.block_until_ready(cd)
    t_chunks = time.time() - t0

    t0 = time.time()
    res = md._fold_fn(na, plan.W, plan.c)(dense)
    jax.block_until_ready(res)
    t_fold = time.time() - t0

    print(json.dumps({
        "n": n, "c": plan.c, "W": plan.W, "Cn": Cn, "chunks": n_chunks,
        "windows_host_s": round(t_win, 3),
        "plan_upload_sort_s": round(t_plan, 3),
        "chunks_s": round(t_chunks, 3),
        "fold_s": round(t_fold, 3)}), flush=True)
