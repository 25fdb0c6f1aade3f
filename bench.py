"""Benchmark: batched Poseidon throughput on the accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: Poseidon(2) hashes/second on device — the Merkle account
tree's hot kernel (the reference spends its tree build in exactly this op,
merkletree.go:236-262, at ~2^27 leaves production scale).  The workload is
one wide independent batch per call, matching a real tree level.

Correctness gate: device digests are checked against the python oracle
before any timing — a miscompiled kernel aborts instead of reporting.

Baseline: reference gnark-crypto Go+asm Poseidon(t=3) at ~4.4e5 hashes/s
per core, parallelized over the m5.8xlarge's 32 vCPUs by the tree builder
(merkletree.go:199-270) -> ~1.4e7 hashes/s machine baseline.
"""

import json
import time

import numpy as np

BASELINE_HASHES_PER_SEC = 1.4e7  # 32-core reference machine estimate
BATCH = 1 << 17                  # one tree-level-sized call


def main():
    import jax
    import jax.numpy as jnp
    from zkpos_tpu.ops import fr
    from zkpos_tpu.ops.poseidon import hash2_mont
    from zkpos_tpu.crypto.poseidon_ref import poseidon

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from zkpos_tpu.ops.poseidon_pallas import hash2_mont_pallas as hfn
        impl = "pallas"
    else:
        hfn = hash2_mont
        impl = "jnp"

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, BATCH),
                                 dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, BATCH),
                                 dtype=np.uint32))
    am, bm = fr.to_mont(a), fr.to_mont(b)

    # warm-up / compile + correctness gate
    out = hfn(am, bm)
    jax.block_until_ready(out)
    got = fr.limbs_to_ints(np.asarray(fr.from_mont(out))[:, :3])
    a_ints = fr.limbs_to_ints(np.asarray(a)[:, :3])
    b_ints = fr.limbs_to_ints(np.asarray(b)[:, :3])
    want = [poseidon([x, y]) for x, y in zip(a_ints, b_ints)]
    assert got == want, \
        "device Poseidon does not match oracle — refusing to benchmark"

    # NOTE: jax.block_until_ready does not reliably wait over the axon
    # tunnel — force a device->host readback each iteration so the timing
    # covers real compute.
    iters = 8
    t0 = time.perf_counter()
    sink = 0
    for _ in range(iters):
        out = hfn(am, bm)
        sink ^= int(jnp.sum(out, dtype=jnp.uint32))
    elapsed = time.perf_counter() - t0
    rate = BATCH * iters / elapsed

    print(json.dumps({
        "metric": "poseidon2_hashes_per_sec",
        "value": round(rate),
        "unit": f"hashes/s ({impl})",
        "vs_baseline": round(rate / BASELINE_HASHES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
