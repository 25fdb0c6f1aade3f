"""Bisect the G2 fused-MSM mismatch at n=1.92M.

Caches the G2 base as a PointArray limb file so variants re-run fast.
Variants: tree scan (default), HS kernel scan, legacy per-chunk engine,
different chunk budgets.
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.crypto import bn254 as bn                     # noqa: E402
from zkpos_tpu.ops import msm as msm_old                     # noqa: E402
from zkpos_tpu.ops import msm_device as md                   # noqa: E402
from zkpos_tpu.groth16.artifact import PointArray            # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1924679
CACHE = f"/tmp/g2_base_{N}"

rng = random.Random(7)
ms = [rng.randrange(bn.R) for _ in range(N)]
sc = [rng.randrange(bn.R) for _ in range(N)]
if os.path.exists(CACHE + ".limbs.npy"):
    pa = PointArray("g2", np.load(CACHE + ".limbs.npy"),
                    np.load(CACHE + ".mask.npy"))
else:
    t0 = time.time()
    pts = msm_old.fixed_base_batch("g2", ms)
    print("gen", round(time.time() - t0, 1), flush=True)
    pa = PointArray.from_points("g2", pts)
    np.save(CACHE + ".limbs.npy", pa.limbs)
    np.save(CACHE + ".mask.npy", pa.mask)
base = md.device_base("g2", pa)
sc_l = np.frombuffer(b"".join(s.to_bytes(32, "little") for s in sc),
                     dtype="<u8").reshape(N, 4).copy()
exp = sum(s * m for s, m in zip(sc, ms)) % bn.R
want = bn.g2_mul(bn.G2_GEN, exp)


def run(tag, **env):
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    md._msm_stream_fn.cache_clear()
    t0 = time.time()
    plan = md.ScalarPlan(sc_l, c=12)
    out = md.msm("g2", base, plan=plan)
    ok = out == want
    print(f"{tag}: match={ok} ({time.time()-t0:.1f}s, Cn={plan.Cn})",
          flush=True)
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    return ok


run("tree-default")
run("hs-kernel", ZKPOS_MSM_SCAN="hs")
run("tree-chunks2^22", ZKPOS_MSM_CHUNK=str(1 << 22))
run("legacy", ZKPOS_MSM_IMPL="legacy")
