"""Isolate the cycle-2 compute_h OOM: run the H pipeline repeatedly in a
fresh process, adding residents step by step.

  h1: compute_h with nothing else resident (QAP pins happen inside)
  h2: compute_h again (same residents)  <- r5 crash site equivalence
  h3: after pinning the pk device cache
  h4: after commitment device bases
"""
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
from zkpos_tpu.groth16.qap_device import compute_h_device          # noqa: E402
from zkpos_tpu.services.keygen import compile_tier                 # noqa: E402
from scripts.prove_e2e import make_cex_assets, make_accounts       # noqa: E402


def main():
    import pickle
    cs = compile_tier(50, 16, range_bits=16)
    n_cons = len(cs.constraints)
    cache_f = f"/tmp/zkpos_e2e_keys_100_50_16_{n_cons}_{cs.num_vars}.pkl"
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
    scs = sn.solve(cs, inputs, key)
    z = scs.witness_vector()
    for tag in ("h1", "h2"):
        t0 = time.time()
        h = compute_h_device(scs, z, pk.domain_size)
        print(tag, "ok", round(time.time() - t0, 1), flush=True)
        del h
    from zkpos_tpu.groth16.groth16 import _pk_device_cache
    _pk_device_cache(pk)
    print("pk pinned", flush=True)
    t0 = time.time()
    h = compute_h_device(scs, z, pk.domain_size)
    print("h3 ok", round(time.time() - t0, 1), flush=True)
    del h
    scs2 = sn.solve(cs, inputs, key)   # commit MSM -> dev bases resident
    z2 = scs2.witness_vector()
    t0 = time.time()
    h = compute_h_device(scs2, z2, pk.domain_size)
    print("h4 ok", round(time.time() - t0, 1), flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
