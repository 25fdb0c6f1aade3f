"""Radix-2 NTT over the BN254 scalar field.

Host (python-int) iterative implementation used by the Groth16 QAP/H(X)
computation at test sizes; the device butterfly-kernel path is the planned
production upgrade (SURVEY.md §2.5 item 4).  Fr has 2-adicity 28, ample for
the 2^26-constraint production circuits (reference README.md:18).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

from ..crypto.bn254 import R as MOD

TWO_ADICITY = 28


@lru_cache(maxsize=None)
def _two_adic_root() -> int:
    """An element of exact order 2^TWO_ADICITY."""
    odd = (MOD - 1) >> TWO_ADICITY
    g = 2
    while True:
        w = pow(g, odd, MOD)
        if pow(w, 1 << (TWO_ADICITY - 1), MOD) != 1:
            return w
        g += 1


@lru_cache(maxsize=None)
def root_of_unity(log_n: int) -> int:
    if log_n > TWO_ADICITY:
        raise ValueError("domain too large")
    return pow(_two_adic_root(), 1 << (TWO_ADICITY - log_n), MOD)


def _bit_reverse(vals: List[int]) -> List[int]:
    n = len(vals)
    out = list(vals)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            out[i], out[j] = out[j], out[i]
    return out


def ntt(vals: List[int], inverse: bool = False) -> List[int]:
    """In-order -> in-order radix-2 NTT (values mod R)."""
    n = len(vals)
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError("length must be a power of two")
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, MOD - 2, MOD)
    a = _bit_reverse([v % MOD for v in vals])
    length = 2
    while length <= n:
        wlen = pow(w, n // length, MOD)
        for start in range(0, n, length):
            cur = 1
            half = length // 2
            for k in range(start, start + half):
                u = a[k]
                v = a[k + half] * cur % MOD
                a[k] = (u + v) % MOD
                a[k + half] = (u - v) % MOD
                cur = cur * wlen % MOD
        length <<= 1
    if inverse:
        n_inv = pow(n, MOD - 2, MOD)
        a = [x * n_inv % MOD for x in a]
    return a


def batch_inverse(vals: List[int]) -> List[int]:
    """Montgomery batch inversion (zero maps to zero)."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * (v if v else 1) % MOD
    inv_total = pow(prefix[n], MOD - 2, MOD)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        if vals[i]:
            out[i] = prefix[i] * inv_total % MOD
            inv_total = inv_total * vals[i] % MOD
    return out
