"""Small on-chip prove+verify to bisect the round-5 verify regression.

Usage: python scripts/probe_verify_small.py [universe tier batch]
Env toggles: ZKPOS_MSM_IMPL=legacy, ZKPOS_H_SYNC=0, ZKPOS_MSM_SCAN=hs
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from zkpos_tpu.utils import constants as C          # noqa: E402

UNIVERSE = int(sys.argv[1]) if len(sys.argv) > 1 else 30
TIER = int(sys.argv[2]) if len(sys.argv) > 2 else 12
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 4

C.configure(asset_counts=UNIVERSE)
os.environ["ZKPOR_TEST_TIERS"] = f"{TIER}:{BATCH}"

from zkpos_tpu.witness import core as wcore                        # noqa: E402
from zkpos_tpu.circuit import batch_create_user as bcu             # noqa: E402
from zkpos_tpu.groth16 import groth16 as g16                       # noqa: E402
from zkpos_tpu.services.keygen import compile_tier                 # noqa: E402
from scripts.prove_e2e import make_cex_assets, make_accounts       # noqa: E402


def main():
    import pickle
    # the prove_e2e import sets ZKPOR_TEST_TIERS from ITS argv defaults;
    # restore ours
    os.environ["ZKPOR_TEST_TIERS"] = f"{TIER}:{BATCH}"
    t0 = time.time()
    cs = compile_tier(TIER, BATCH, range_bits=16)
    n_cons = len(cs.constraints)
    print(f"compiled {n_cons} constraints in {time.time()-t0:.1f}s",
          flush=True)
    cache_f = (f"/tmp/zkpos_vs_keys_{UNIVERSE}_{TIER}_{BATCH}"
               f"_{n_cons}_{cs.num_vars}.pkl")
    if os.path.exists(cache_f):
        with open(cache_f, "rb") as f:
            pk, vk = pickle.load(f)
    else:
        t0 = time.time()
        pk, vk = g16.setup(cs)
        print(f"setup {time.time()-t0:.1f}s", flush=True)
        with open(cache_f, "wb") as f:
            pickle.dump((pk, vk), f, protocol=pickle.HIGHEST_PROTOCOL)
    cex = make_cex_assets()
    accounts = make_accounts(cex, BATCH, min(TIER, 8))
    by_tier, capacity = wcore.prepare_accounts({TIER: accounts})
    tree = wcore.build_account_tree(by_tier, capacity)
    wits = list(wcore.generate_batch_witnesses(tree, by_tier, cex))
    _, wit = wits[0]
    wcore.densify_ops_assets(wit)
    from zkpos_tpu.circuit import solver_native as sn
    w = bcu.set_batch_create_user_circuit_witness(wit)
    inputs = bcu.input_vector(w)
    key = {"bases": pk.ck_bases, "sigma_bases": pk.ck_sigma_bases}
    scs = sn.solve(cs, inputs, key)
    t0 = time.time()
    proof = g16.prove(scs, pk)
    print(f"prove {time.time()-t0:.1f}s", flush=True)
    ok = g16.verify(proof, vk, scs.public_values())
    print("VERIFY:", ok, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
