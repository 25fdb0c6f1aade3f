"""Optimized-partial-round Poseidon (crypto/poseidon_opt) is bit-identical
to the unoptimized oracle permutation for every width the framework uses."""

import random

from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_opt import opt_params, permutation_opt
from zkpos_tpu.crypto.poseidon_ref import permutation


def test_opt_permutation_matches_oracle():
    rng = random.Random(1234)
    for t in (3, 5, 6, 17):
        for _ in range(3):
            state = [rng.randrange(MOD) for _ in range(t)]
            assert permutation_opt(list(state)) == permutation(list(state))


def test_opt_params_shapes():
    p = opt_params(3)
    assert len(p["d_partial"]) == 57
    assert len(p["sparse"]) == 56
    assert len(p["dense_last"]) == 3
    assert len(p["c_resume"]) == 3
