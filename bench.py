"""Benchmark: batched Poseidon throughput on the accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: Poseidon(2) hashes/second on device (the Merkle account
tree's hot kernel — the reference spends its tree build in exactly this op,
merkletree.go:236-262, at ~2^27 leaves production scale).

Baseline: the reference's gnark-crypto Go Poseidon sustains roughly 4.4e5
hashes/s/core for t=3 (measured class of optimized Go+asm field impls);
its tree build parallelises across the m5.8xlarge's 32 vCPUs
(merkletree.go:199-270), giving a ~1.4e7 hashes/s machine baseline.
vs_baseline = our device rate / that machine baseline.
"""

import json
import time

import numpy as np

BASELINE_HASHES_PER_SEC = 1.4e7  # 32-core reference machine estimate


def main():
    import jax
    import jax.numpy as jnp
    from zkpos_tpu.ops.poseidon import hash2_mont

    batch = 8192
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, batch),
                                 dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, batch),
                                 dtype=np.uint32))

    # warm-up / compile + correctness gate vs the python oracle (never
    # report a rate for miscompiled kernels)
    from zkpos_tpu.ops import fr
    from zkpos_tpu.crypto.poseidon_ref import poseidon
    am, bm = fr.to_mont(a), fr.to_mont(b)
    out = hash2_mont(am, bm)
    jax.block_until_ready(out)
    got = fr.limbs_to_ints(np.asarray(fr.from_mont(out))[:, :3])
    a_ints = fr.limbs_to_ints(np.asarray(a)[:, :3])
    b_ints = fr.limbs_to_ints(np.asarray(b)[:, :3])
    want = [poseidon([x, y]) for x, y in zip(a_ints, b_ints)]
    assert got == want, "device Poseidon does not match oracle — refusing to benchmark"
    a, b = am, bm

    iters = 20
    t0 = time.perf_counter()
    x, y = a, b
    for _ in range(iters):
        x = hash2_mont(x, y)
    jax.block_until_ready(x)
    elapsed = time.perf_counter() - t0
    rate = batch * iters / elapsed

    print(json.dumps({
        "metric": "poseidon2_hashes_per_sec",
        "value": round(rate),
        "unit": "hashes/s",
        "vs_baseline": round(rate / BASELINE_HASHES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
