"""Fixed-depth Poseidon Merkle account tree, built level-by-level on TPU.

Reference parity: src/utils/merkletree/merkletree.go (FixedDepthMerkleTree).
The reference builds dirty nodes bottom-up with NumCPU goroutines
(merkletree.go:199-270); here each level is ONE batched Poseidon call over
all node pairs — data parallelism across VPU lanes instead of threads.

Only ceil(log2(N)) levels carry real nodes; levels above the populated
subtree are the precomputed nil-hash chain (merkletree.go:159-170).

Proof conventions (bit i of key selects sibling order, LSB-first) match
merkletree.go:297-308 and :334-355 — validated bit-exactly against the
reference's golden user proof in tests/test_merkle.py.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..crypto.bn254 import R as MODULUS, fr_to_bytes, fr_from_bytes
from ..crypto.poseidon_ref import poseidon
from ..ops import fr
from ..ops.poseidon import hash2_mont
from ..utils import constants as C
from ..utils.constants import nil_account_hash_int


def nil_hashes(depth: int | None = None,
               nil_leaf: int | None = None) -> List[int]:
    """nil_hashes[k] = hash of an empty subtree with 2^k leaves."""
    if depth is None:
        depth = C.ACCOUNT_TREE_DEPTH
    h = nil_account_hash_int() if nil_leaf is None else nil_leaf
    out = [h]
    for _ in range(depth):
        h = poseidon([h, h])
        out.append(h)
    return out


class AccountTree:
    """Two-phase tree: stage leaves (host), build (device), read proofs."""

    def __init__(self, depth: int | None = None,
                 capacity: int = 0, nil_leaf: int | None = None):
        if depth is None:
            depth = C.ACCOUNT_TREE_DEPTH
        if depth > 32 or depth <= 0:
            raise ValueError("depth out of range")
        if capacity > (1 << depth):
            raise ValueError("capacity exceeds maximum for given depth")
        self.depth = depth
        self.capacity = capacity
        self.build_chunk = 4096
        self.nils = nil_hashes(depth, nil_leaf)
        self._nil_limbs = [fr.ints_to_limbs([v])[:, 0] for v in self.nils]
        # levels[k]: canonical limbs (16, n_k) for populated nodes
        self.levels: List[np.ndarray] = []

    # -- building -------------------------------------------------------------

    def build_from_leaf_ints(self, leaves: List[int]) -> None:
        self.build_from_leaves(fr.ints_to_limbs(leaves))

    def build_from_leaves(self, leaves_limbs: np.ndarray) -> None:
        """leaves_limbs: (16, N) canonical limbs for leaves 0..N-1."""
        n = leaves_limbs.shape[1]
        if n > (1 << self.depth):
            raise ValueError("too many leaves")
        if n == 0:
            self.levels = []
            return
        cur = self._to_mont_chunked(jnp.asarray(leaves_limbs))
        self.build_from_mont_leaves(cur)

    def _to_mont_chunked(self, x):
        CHUNK = self.build_chunk
        ncols = x.shape[1]
        pad = (-ncols) % CHUNK
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((fr.NLIMBS, pad), dtype=jnp.uint32)], axis=1)
        outs = [fr.to_mont(x[:, i:i + CHUNK])
                for i in range(0, x.shape[1], CHUNK)]
        return jnp.concatenate(outs, axis=1)[:, :ncols]

    def build_from_mont_leaves(self, cur) -> None:
        """cur: (16, N) Montgomery limbs.  Levels are stored in Montgomery
        form; single nodes are converted on read."""
        n = cur.shape[1]
        self.levels = [np.asarray(cur, dtype=np.uint32)]
        nil_mont_cache = {}

        def nil_mont(k):
            if k not in nil_mont_cache:
                nil_mont_cache[k] = np.asarray(
                    fr.to_mont(jnp.asarray(self._nil_limbs[k][:, None])))
            return nil_mont_cache[k]

        if n == 0:
            self.levels = []
            return
        # Fixed-chunk hashing: every device call has shape (16, CHUNK), so
        # exactly one compiled executable serves every level of every tree.
        CHUNK = self.build_chunk
        level = 0
        while cur.shape[1] > 1:
            if cur.shape[1] % 2 == 1:
                cur = jnp.concatenate(
                    [cur, jnp.asarray(nil_mont(level))], axis=1)
            npairs = cur.shape[1] // 2
            a, b = cur[:, 0::2], cur[:, 1::2]
            pad = (-npairs) % CHUNK
            if pad:
                z = jnp.zeros((fr.NLIMBS, pad), dtype=jnp.uint32)
                a = jnp.concatenate([a, z], axis=1)
                b = jnp.concatenate([b, z], axis=1)
            outs = [hash2_mont(a[:, i:i + CHUNK], b[:, i:i + CHUNK])
                    for i in range(0, a.shape[1], CHUNK)]
            nxt = jnp.concatenate(outs, axis=1)[:, :npairs]
            level += 1
            self.levels.append(np.asarray(nxt, dtype=np.uint32))
            cur = nxt
        # fold the populated-subtree root with nil siblings up to full depth
        node = self._node_int(level, 0)
        for k in range(level, self.depth):
            node = poseidon([node, self.nils[k]])
            mont = (node * fr.R_MONT) % MODULUS
            self.levels.append(fr.ints_to_limbs([mont]))

    # -- reading --------------------------------------------------------------

    def _node_int(self, level: int, pos: int) -> int:
        if level < len(self.levels) and pos < self.levels[level].shape[1]:
            mont = fr.limbs_to_ints(self.levels[level][:, pos:pos + 1])[0]
            return (mont * pow(fr.R_MONT, -1, MODULUS)) % MODULUS
        return self.nils[level]

    def root(self) -> bytes:
        return fr_to_bytes(self._node_int(self.depth, 0))

    def get(self, key: int) -> bytes:
        return fr_to_bytes(self._node_int(0, key))

    def get_proof(self, key: int) -> List[bytes]:
        """Sibling hashes leaf->root (merkletree.go:297-308)."""
        if key >= (1 << self.depth):
            raise ValueError("key out of range")
        proof = []
        pos = key
        for level in range(self.depth):
            proof.append(fr_to_bytes(self._node_int(level, pos ^ 1)))
            pos >>= 1
        return proof

    def get_proofs_batch(self, keys: List[int]) -> List[List[bytes]]:
        """Proofs for many keys with per-level node dedup: level l of a
        k-key batch touches ~k/2^l unique siblings, so the total
        limb->int->bytes conversions drop from depth*k to ~2k (the
        userproof service's analog of the reference's segment workers,
        userproof.go:87-149)."""
        ka = np.asarray(list(keys), dtype=np.int64)
        if ka.size == 0:
            return []
        out = [[b""] * self.depth for _ in range(ka.size)]
        for level in range(self.depth):
            pos = (ka >> level) ^ 1
            uniq, inv = np.unique(pos, return_inverse=True)
            vals = [fr_to_bytes(self._node_int(level, int(p)))
                    for p in uniq]
            for i in range(ka.size):
                out[i][level] = vals[inv[i]]
        return out


def verify_proof(root: bytes, key: int, proof: List[bytes], leaf: bytes,
                 depth: int | None = None) -> bool:
    """merkletree.go:334-355 — LSB-first sibling-order selection."""
    if depth is None:
        depth = C.ACCOUNT_TREE_DEPTH
    if len(proof) != depth or key >= (1 << depth):
        return False
    node = fr_from_bytes(leaf)
    for i in range(depth):
        sib = fr_from_bytes(proof[i])
        if (key >> i) & 1:
            node = poseidon([sib, node])
        else:
            node = poseidon([node, sib])
    return fr_to_bytes(node) == root
