"""Pallas fused Poseidon kernel vs the jnp path / oracle.

On CPU this exercises interpret mode at a tiny batch (slow-marked); on TPU
the same code compiles to a fused Mosaic kernel.
"""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.crypto.poseidon_ref import poseidon
from zkpos_tpu.ops import fr

rng = random.Random(11)


@pytest.mark.slow
def test_pallas_hash2_matches_oracle():
    from zkpos_tpu.ops.poseidon_pallas import hash2_mont_pallas
    n = 4
    a = [rng.randrange(MOD) for _ in range(n)]
    b = [rng.randrange(MOD) for _ in range(n)]
    am = fr.to_mont(jnp.asarray(fr.ints_to_limbs(a)))
    bm = fr.to_mont(jnp.asarray(fr.ints_to_limbs(b)))
    out = hash2_mont_pallas(am, bm)
    got = fr.limbs_to_ints(np.asarray(fr.from_mont(out[:, :n])))
    assert got == [poseidon([x, y]) for x, y in zip(a, b)]
