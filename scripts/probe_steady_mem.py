"""Reproduce the steady-cycle OOM with live-buffer accounting.

Loads the cached keys, solves once, runs prove #1, then prints
jax.live_arrays() grouped by shape plus device memory_stats, then runs
cycle-2 solve + compute_h (the crash site) step by step.
"""
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.utils import constants as C          # noqa: E402

C.configure(asset_counts=100)
os.environ["ZKPOR_TEST_TIERS"] = "50:16"
os.environ.setdefault("ZKPOS_TRACE", "1")

from zkpos_tpu.witness import core as wcore                        # noqa: E402
from zkpos_tpu.circuit import batch_create_user as bcu             # noqa: E402
from zkpos_tpu.groth16 import groth16 as g16                       # noqa: E402
from zkpos_tpu.services.keygen import compile_tier                 # noqa: E402
from scripts.prove_e2e import make_cex_assets, make_accounts       # noqa: E402


def mem(tag):
    st = jax.local_devices()[0].memory_stats() or {}
    print(f"MEM[{tag}] in_use={st.get('bytes_in_use',0)/2**30:.2f}G "
          f"peak={st.get('peak_bytes_in_use',0)/2**30:.2f}G "
          f"limit={st.get('bytes_limit',0)/2**30:.2f}G", flush=True)


def live(tag, top=12):
    by = collections.Counter()
    for a in jax.live_arrays():
        by[(str(a.dtype), tuple(a.shape))] += a.nbytes
    tot = sum(by.values())
    print(f"LIVE[{tag}] total={tot/2**30:.2f}G", flush=True)
    for (dt, shp), nb in by.most_common(top):
        print(f"  {nb/2**30:6.2f}G  {dt} {shp}", flush=True)


def main():
    import pickle
    cs = compile_tier(50, 16, range_bits=16)
    n_cons = len(cs.constraints)
    cache_f = (f"/tmp/zkpos_e2e_keys_100_50_16_{n_cons}_{cs.num_vars}.pkl")
    with open(cache_f, "rb") as f:
        pk, vk = pickle.load(f)
    print("keys loaded", flush=True)

    cex = make_cex_assets()
    accounts = make_accounts(cex, 16, 30)
    by_tier, capacity = wcore.prepare_accounts({50: accounts})
    tree = wcore.build_account_tree(by_tier, capacity)
    wits = list(wcore.generate_batch_witnesses(tree, by_tier, cex))
    _, wit = wits[0]
    wcore.densify_ops_assets(wit)
    from zkpos_tpu.circuit import solver_native as sn
    w = bcu.set_batch_create_user_circuit_witness(wit)
    inputs = bcu.input_vector(w)
    key = {"bases": pk.ck_bases, "sigma_bases": pk.ck_sigma_bases}
    mem("before solve1")
    scs = sn.solve(cs, inputs, key)
    mem("after solve1")
    t0 = time.time()
    proof = g16.prove(scs, pk)
    print("prove1", round(time.time() - t0, 1), flush=True)
    mem("after prove1")
    live("after prove1")
    del proof
    scs2 = sn.solve(cs, inputs, key)
    mem("after solve2")
    live("after solve2")
    from zkpos_tpu.groth16.qap_device import compute_h_device
    z = scs2.witness_vector()
    t0 = time.time()
    h = compute_h_device(scs2, z, pk.domain_size)
    print("compute_h cycle2", round(time.time() - t0, 1), flush=True)
    mem("after h2")
    print("OK", flush=True)


if __name__ == "__main__":
    main()
