"""bsb22 commitment challenge: RFC 9380 expand_message_xmd vectors and the
gnark serialization layout (SURVEY.md C4; gnark constraint.CommitmentDst).
"""
from zkpos_tpu.crypto.bn254 import R
from zkpos_tpu.groth16.hash_to_field import (
    COMMITMENT_DST, bsb22_challenge, expand_message_xmd, fr_hash, g1_marshal,
    serialize_commitment)

# RFC 9380 appendix K.1 (expand_message_xmd, SHA-256)
_RFC_DST = b"QUUX-V01-CS02-with-expander-SHA256-128"
_RFC_VECTORS = [
    (b"", 0x20,
     "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"),
    (b"abc", 0x20,
     "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"),
    (b"abcdef0123456789", 0x20,
     "eff31487c770a893cfb36f912fbfcbff40d5661771ca4b2cb4eafe524333f5c1"),
]


def test_expand_message_xmd_rfc9380_vectors():
    for msg, n, want in _RFC_VECTORS:
        assert expand_message_xmd(msg, _RFC_DST, n).hex() == want


def test_fr_hash_reduces_48_bytes_big_endian():
    out = fr_hash(b"zkpos", b"bsb22-commitment", 2)
    assert len(out) == 2
    assert all(0 <= v < R for v in out)
    # element i comes from bytes [48i, 48(i+1))
    uniform = expand_message_xmd(b"zkpos", b"bsb22-commitment", 96)
    assert out[0] == int.from_bytes(uniform[:48], "big") % R
    assert out[1] == int.from_bytes(uniform[48:], "big") % R


def test_g1_marshal_layout():
    # uncompressed: 32B big-endian X || Y (gnark-crypto bn254 Marshal)
    m = g1_marshal((1, 2))
    assert len(m) == 64
    assert int.from_bytes(m[:32], "big") == 1
    assert int.from_bytes(m[32:], "big") == 2
    # infinity: mUncompressedInfinity mask in byte 0, rest zero
    inf = g1_marshal(None)
    assert inf[0] == 0x40 and inf[1:] == b"\x00" * 63


def test_serialize_commitment_appends_public_values():
    blob = serialize_commitment(b"\xaa" * 64, [3, 5])
    assert len(blob) == 64 + 2 * 32
    assert int.from_bytes(blob[64:96], "big") == 3
    assert int.from_bytes(blob[96:128], "big") == 5


def test_challenge_binds_to_point():
    assert COMMITMENT_DST == b"bsb22-commitment"
    c1 = bsb22_challenge((1, 2))
    c2 = bsb22_challenge((1, 3))
    assert c1 != c2
    assert 0 < c1 < R
    # deterministic
    assert bsb22_challenge((1, 2)) == c1


def test_groth16_challenge_uses_bsb22():
    from zkpos_tpu.groth16.groth16 import commitment_challenge
    assert commitment_challenge((7, 9)) == bsb22_challenge((7, 9))
    assert commitment_challenge(None) == bsb22_challenge(None)
