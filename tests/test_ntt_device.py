"""Device NTT (groth16/ntt_device.py) vs the host oracle (groth16/ntt.py)."""

import numpy as np

from zkpos_tpu.crypto.bn254 import R as MOD
from zkpos_tpu.groth16 import ntt as host_ntt
from zkpos_tpu.groth16.ntt_device import (
    ints_to_mont_digits, mont_digits_to_ints, ntt_mont)


def _roundtrip(vals):
    d = ints_to_mont_digits(vals)
    fwd = ntt_mont(d)
    got = mont_digits_to_ints(fwd)
    want = host_ntt.ntt(vals)
    assert got == want, "forward NTT mismatch"
    back = mont_digits_to_ints(ntt_mont(fwd, inverse=True))
    assert back == [v % MOD for v in vals], "inverse NTT mismatch"


def test_ntt_tiny():
    _roundtrip([1, 2, 3, 4])


def test_ntt_random_64():
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(32), "little") % MOD for _ in range(64)]
    _roundtrip(vals)


def test_ntt_random_512():
    rng = np.random.default_rng(1)
    vals = [int.from_bytes(rng.bytes(32), "little") % MOD
            for _ in range(512)]
    _roundtrip(vals)


def test_ntt_random_4096_transposed_tail():
    """log_n = 12 crosses the _MIN_MINOR layout switch: the final DIF /
    initial DIT stages run on the transposed view (the 2^21 OOM fix)."""
    rng = np.random.default_rng(2)
    vals = [int.from_bytes(rng.bytes(32), "little") % MOD
            for _ in range(4096)]
    _roundtrip(vals)
