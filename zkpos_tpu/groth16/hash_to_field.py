"""gnark-compatible bsb22 commitment challenge: SHA-256 hash-to-field.

Upstream gnark derives the Groth16 commitment (bsb22) challenge as

    c = fr.Hash(SerializeCommitment(D.Marshal(), publicCommitted, 32),
                dst = "bsb22-commitment", count = 1)[0]

(gnark backend/groth16/bn254 prover/verifier via constraint.CommitmentDst;
reference call path: src/prover/prover/prover.go:269 -> gnark Prove).
fr.Hash is RFC 9380 hash_to_field with expand_message_xmd over SHA-256,
L = 16 + 32 = 48 bytes per element; D.Marshal() is gnark-crypto's
uncompressed G1 encoding (32-byte big-endian X || Y; the point at infinity
is 64 bytes with the 0b01<<6 mask in byte 0).

This replaces the round-3 Poseidon(D.x, D.y) challenge (COMPAT.md listed it
as a deviation) so an unmodified gnark verifier derives the same challenge
from the same marshalled commitment bytes.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

from ..crypto.bn254 import R as FR_MOD

COMMITMENT_DST = b"bsb22-commitment"
FR_BYTES = 32            # 1 + (254-1)//8
HTF_L = 16 + FR_BYTES    # 48: L = ceil((ceil(log2(r)) + k)/8), k = 128

# gnark-crypto bn254 marshal masks (most significant byte of X)
_M_UNCOMPRESSED_INFINITY = 0b01 << 6


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    """RFC 9380 §5.3.1 expand_message_xmd with SHA-256."""
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255 or len_in_bytes > 65535 or len(dst) > 255:
        raise ValueError("expand_message_xmd parameter out of range")
    dst_prime = dst + len(dst).to_bytes(1, "big")
    z_pad = b"\x00" * r_in_bytes
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = hashlib.sha256(
        z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b = [hashlib.sha256(b0 + b"\x01" + dst_prime).digest()]
    for i in range(2, ell + 1):
        mixed = bytes(x ^ y for x, y in zip(b0, b[-1]))
        b.append(hashlib.sha256(
            mixed + i.to_bytes(1, "big") + dst_prime).digest())
    return b"".join(b)[:len_in_bytes]


def fr_hash(msg: bytes, dst: bytes, count: int) -> List[int]:
    """gnark-crypto fr.Hash: hash_to_field over BN254 Fr (L = 48)."""
    uniform = expand_message_xmd(msg, dst, count * HTF_L)
    return [int.from_bytes(uniform[i * HTF_L:(i + 1) * HTF_L], "big")
            % FR_MOD
            for i in range(count)]


def g1_marshal(pt: Optional[Tuple[int, int]]) -> bytes:
    """gnark-crypto G1Affine.Marshal(): 64-byte uncompressed big-endian
    X || Y; infinity is all-zero with the 0b01<<6 flag in byte 0."""
    if pt is None:
        out = bytearray(64)
        out[0] = _M_UNCOMPRESSED_INFINITY
        return bytes(out)
    x, y = pt
    return int(x).to_bytes(32, "big") + int(y).to_bytes(32, "big")


def serialize_commitment(private_commitment: bytes,
                         public_committed: Sequence[int] = ()) -> bytes:
    """gnark constraint.SerializeCommitment: marshalled point then each
    public committed value as a 32-byte big-endian block."""
    out = bytearray(private_commitment)
    for v in public_committed:
        out += int(v).to_bytes(FR_BYTES, "big")
    return bytes(out)


def bsb22_challenge(d_pt: Optional[Tuple[int, int]],
                    public_committed: Sequence[int] = ()) -> int:
    """The gnark Groth16 commitment challenge for commitment point D."""
    msg = serialize_commitment(g1_marshal(d_pt), public_committed)
    return fr_hash(msg, COMMITMENT_DST, 1)[0]
