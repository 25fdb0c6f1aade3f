"""Pure-Python Poseidon over the BN254 scalar field — oracle implementation.

Mirrors the three API surfaces of the reference's Poseidon
(bnb-chain gnark-crypto fork, used at reference src/utils/constants.go:126,
src/utils/utils.go:748,765):

  * poseidon(values)            ~ poseidon.Poseidon(*fr.Element...)
  * poseidon_bytes(chunks)      ~ poseidon.PoseidonBytes([]byte...)
  * PoseidonHasher              ~ poseidon.NewPoseidon() hash.Hash
                                  (Write one field element per call; Sum
                                  hashes everything written since Reset)

Width handling: a single permutation absorbs up to 16 inputs (t = n + 1).
For more than 16 inputs the fork chains permutations: the first permutation
hashes inputs[0:16]; each subsequent permutation hashes
[previous_digest] + next-15-inputs.  (Validated against the golden user
Merkle proof in tests/test_poseidon_golden.py.)
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

from .bn254 import R as MOD, fr_from_bytes, fr_to_bytes
from .poseidon_params import R_FULL, generate_params, partial_rounds

MAX_INPUTS = 16


def permutation(state: List[int]) -> List[int]:
    """Poseidon permutation on a width-t state (list of ints mod R)."""
    t = len(state)
    constants, mds = generate_params(t)
    r_p = partial_rounds(t)
    half_f = R_FULL // 2
    total = R_FULL + r_p
    c_idx = 0
    for rnd in range(total):
        # AddRoundKey
        state = [(s + constants[c_idx + i]) % MOD for i, s in enumerate(state)]
        c_idx += t
        # S-box
        if rnd < half_f or rnd >= half_f + r_p:
            state = [pow(s, 5, MOD) for s in state]
        else:
            state[0] = pow(state[0], 5, MOD)
        # Mix (MDS)
        state = [
            sum(mds[i][j] * state[j] for j in range(t)) % MOD
            for i in range(t)
        ]
    return state


# Output position of the digest within the permuted state.  Empirically
# confirmed against the reference's golden user proof: the bnb-chain fork
# returns state[1] (not the iden3/circomlib convention of state[0]) — see
# COMPAT.md and tests/test_poseidon_golden.py.
OUTPUT_INDEX = 1


def _hash_chunk(values: Sequence[int]) -> int:
    state = [0] + [v % MOD for v in values]
    return permutation(state)[OUTPUT_INDEX]


def poseidon(values: Sequence[int]) -> int:
    """Variadic Poseidon over field elements (arbitrary count >= 1)."""
    values = [v % MOD for v in values]
    if not values:
        raise ValueError("poseidon requires at least one input")
    if len(values) <= MAX_INPUTS:
        return _hash_chunk(values)
    digest = _hash_chunk(values[:MAX_INPUTS])
    pos = MAX_INPUTS
    while pos < len(values):
        chunk = values[pos:pos + MAX_INPUTS - 1]
        digest = _hash_chunk([digest] + chunk)
        pos += MAX_INPUTS - 1
    return digest


def poseidon_bytes(chunks: Iterable[bytes]) -> bytes:
    """PoseidonBytes: each byte-chunk -> fr via SetBytes, hash, marshal."""
    return fr_to_bytes(poseidon([fr_from_bytes(c) for c in chunks]))


class PoseidonHasher:
    """hash.Hash-style wrapper: each Write absorbs one field element."""

    def __init__(self):
        self._elements: List[int] = []

    def reset(self) -> None:
        self._elements = []

    def write(self, data: bytes) -> None:
        self._elements.append(fr_from_bytes(data))

    def write_element(self, v: int) -> None:
        self._elements.append(v % MOD)

    def sum(self) -> bytes:
        return fr_to_bytes(poseidon(self._elements))

    def size(self) -> int:
        return 32
