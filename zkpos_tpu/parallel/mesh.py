"""Multi-chip sharding for the proving engine (jax.sharding + shard_map).

The reference's only scale-out axis is process-level (N provers on a Redis
queue, README.md:122-128).  Here one *logical* pipeline step also spans a
device mesh:

  * leaf hashing + the bottom Merkle levels are data-parallel across
    devices (each device owns a contiguous leaf range);
  * the top log2(#devices) levels cross shard boundaries: local subtree
    roots are all-gathered over ICI and folded (replicated) — the batched
    analog of merkletree.go's worker partitioning;
  * MSM chunks are data-parallel with a cross-device fold of Jacobian
    partial sums.

All folds use constant-shape roll-butterflies (ONE hash/point-add body in a
fori_loop) so the traced/compiled graphs stay small.

Tested on a virtual 8-device CPU mesh (tests/conftest.py); the same code
runs unchanged on a real TPU slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import fr
from ..ops.poseidon import hash2_mont


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def merkle_fold(block):
    """Fold a (16, L) Montgomery leaf block to its subtree root (16, 1).

    Constant-shape stride fold: at step k the value at lane i*2^(k+1)
    becomes H(node[i*2^(k+1)], node[i*2^(k+1) + 2^k]); other lanes carry
    garbage and are never read.  ONE hash body regardless of depth."""
    L = block.shape[-1]
    levels = int(np.log2(L))
    assert (1 << levels) == L

    def body(k, cur):
        partner = jnp.roll(cur, -(1 << k), axis=-1)
        return hash2_mont(cur, partner)

    out = jax.lax.fori_loop(0, levels, body, block)
    return out[:, 0:1]


def point_fold_f32(arrs, bound: float = 8.0):
    """Sum a (34, D) batch of f32 projective points into lane 0.

    Constant-shape roll butterfly: ONE complete-formula point_add body in a
    fori_loop regardless of depth, so exactly one point-add graph is traced
    and compiled (the round-2 unrolled version compiled ~5 distinct graphs
    and timed out the driver's multichip dryrun).  Output bound of the
    complete add is <= 3.1p for inputs <= 8p (ops/ec_f32.py module doc), so
    a fixed wrap bound of 8.0 is loop-invariant."""
    from ..ops import ec_f32 as ecf
    D = arrs[0].shape[-1]
    levels = int(np.log2(D))
    assert (1 << levels) == D

    def body(k, cur):
        a = tuple(ecf.F1.wrap(v, bound) for v in cur)
        b = tuple(ecf.FE(jnp.roll(p.d, -(1 << k), axis=-1), p.bound)
                  for p in a)
        out = ecf.point_add(ecf.F1, a, b)
        return tuple(p.d for p in out)

    out = jax.lax.fori_loop(0, levels, body, tuple(arrs))
    return tuple(a[..., 0:1] for a in out)


def sharded_tree_root(mesh: Mesh, leaves_mont, axis: str = "shard"):
    """Merkle root of a (16, N) Montgomery leaf array sharded across the
    mesh.  N and N/#devices must be powers of two."""
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh, in_specs=P(None, axis),
             out_specs=P(None, None), check_rep=False)
    def step(block):
        root = merkle_fold(block)                            # (16, 1)
        roots = jax.lax.all_gather(root, axis, axis=2)       # (16, 1, D)
        roots = roots.reshape(fr.NLIMBS, n_dev)
        return merkle_fold(roots)

    return step(leaves_mont)


def scalar_mul_f32(arrs, bits, bound: float = 8.0):
    """(34, D) f32 projective points times per-lane scalars given as an
    MSB-first (nbits, D) {0,1} f32 bit array.  Bit-serial double-and-add
    with the complete formulas — ONE fori_loop body (2 point adds) is
    traced regardless of nbits."""
    from ..ops import ec_f32 as ecf
    nbits = bits.shape[0]
    base = tuple(ecf.F1.wrap(v, bound) for v in arrs)
    D = arrs[0].shape[-1]
    ident = (jnp.zeros_like(arrs[0]),
             jnp.zeros_like(arrs[1]).at[0].set(1.0),
             jnp.zeros_like(arrs[2]))

    def body(i, cur):
        acc = tuple(ecf.F1.wrap(v, bound) for v in cur)
        dbl = ecf.point_add(ecf.F1, acc, acc)
        added = ecf.point_add(ecf.F1, dbl, base)
        bit = bits[i]                                        # (D,)
        out = tuple(ecf.F1.select(bit > 0.5, a, d)
                    for a, d in zip(added, dbl))
        return tuple(p.d for p in out)

    return jax.lax.fori_loop(0, nbits, body, ident)


def sharded_msm_f32(mesh: Mesh, arrs, bits, axis: str = "shard"):
    """Data-parallel G1 MSM on the f32 complete-formula engine
    (replaces the round-1 uint32 sharded MSM — same sharding shape as the
    production Pippenger path's cross-device partial merge):

      * each device scalar-multiplies its column shard (double-and-add),
      * folds its local products to one projective partial (roll butterfly),
      * partials are all-gathered over ICI and folded replicated.

    arrs: (X, Y, Z) digit arrays (34, D); bits: MSB-first (nbits, D) f32.
    Returns replicated (34, 1) digit arrays.  Mirrors gnark-crypto
    MultiExp's chunk merge inside reference prover.go:269."""
    from ..ops.fd32 import NDIGITS
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis),) * 3 + (P(None, axis),),
             out_specs=(P(None, None),) * 3, check_rep=False)
    def step(x, y, z, b):
        prods = scalar_mul_f32((x, y, z), b)
        part = point_fold_f32(prods)                         # (34, 1)
        gath = tuple(
            jax.lax.all_gather(a, axis, axis=2).reshape(NDIGITS, n_dev)
            for a in part)
        return point_fold_f32(gath)

    return step(*arrs, bits)


def sharded_point_fold_f32(mesh: Mesh, arrs, axis: str = "shard"):
    """Cross-device sum of projective G1 partials on the f32 digit engine:
    each device folds its local columns (single-body roll butterfly),
    partial sums are all-gathered over ICI and folded replicated.

    arrs: (X, Y, Z) digit arrays (34, D*k) with columns sharded over the
    mesh; returns replicated (34, 1) digit arrays."""
    from ..ops.fd32 import NDIGITS
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh, in_specs=(P(None, axis),) * 3,
             out_specs=(P(None, None),) * 3, check_rep=False)
    def step(x, y, z):
        part = point_fold_f32((x, y, z))
        gath = tuple(
            jax.lax.all_gather(a, axis, axis=2).reshape(NDIGITS, n_dev)
            for a in part)
        return point_fold_f32(gath)

    return step(*arrs)


def sharded_stream_msm(mesh: Mesh, bases_u8, digs, idxs, c: int,
                       axis: str = "shard"):
    """The PRODUCTION MSM path (ops/msm_device.py sorted-stream engine)
    sharded across the mesh — pk bases partitioned per device, bucket
    partials all-reduced (VERDICT r3 task 9; SURVEY §2.4 TPU row).

    Each device owns a contiguous slice of the pk base (uint8 digit
    arrays with its own identity column) and the matching window digits:
    it sorts its slice, runs the segmented-scan bucket accumulation into
    its dense grid, folds buckets + windows, then the per-device partial
    points are all-gathered over ICI and folded replicated — the same
    _chunk_body/_fold_body code prove() runs single-chip.

    bases_u8: na arrays (n_dev, 34, Pd); digs/idxs: (n_dev, W, Nd) int32.
    Returns replicated host-convertible (34, 1) digit arrays.
    """
    from ..ops import msm_device as md
    from ..ops.fd32 import NDIGITS
    na = len(bases_u8)
    n_dev = mesh.devices.size
    _, W, Nd = digs.shape
    nb = 1 << c

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis),) * na + (P(axis), P(axis)),
             out_specs=(P(None, None),) * na, check_rep=False)
    def step(*args):
        base = tuple(a[0] for a in args[:na])           # (34, Pd)
        dig, idx = args[na][0], args[na + 1][0]         # (W, Nd)
        sdig, sidx = jax.lax.sort((dig, idx), dimension=1, num_keys=1)
        ids = md._id_arrs_np(na)
        dense = tuple(jnp.broadcast_to(
            jnp.asarray(i)[:, :, None], (NDIGITS, W, nb))
            for i in ids)
        cd = jnp.full((W,), -1, dtype=jnp.int32)
        cp = tuple(jnp.broadcast_to(jnp.asarray(i), (NDIGITS, W))
                   for i in ids)
        dense, _, _ = md._chunk_body(na, W, Nd, c, base, sdig, sidx,
                                     dense, cd, cp)
        part = md._fold_body(na, W, c, dense)           # na x (34, 1)
        gath = tuple(
            jax.lax.all_gather(a, axis, axis=2).reshape(NDIGITS, n_dev)
            for a in part)
        # fold partials across devices (single-body roll butterfly)
        arr = md._butterfly_reduce(na, gath, axis=1)
        return md._finalize_pt(arr)

    return step(*bases_u8, digs, idxs)


def training_step(mesh: Mesh, leaves_mont, msm_arrs, msm_bits,
                  axis: str = "shard"):
    """One full sharded pipeline step (the multi-chip dryrun target):
    device-parallel Merkle tree build (dp over leaf ranges, ICI
    all-gather at the top levels) + device-parallel MSM with cross-device
    fold of projective partials."""
    root = sharded_tree_root(mesh, leaves_mont, axis)
    acc = sharded_msm_f32(mesh, msm_arrs, msm_bits, axis)
    return root, acc
