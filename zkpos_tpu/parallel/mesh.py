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

from ..ops import ec
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


def point_fold(points):
    """Sum a (…, D) batch of Jacobian points into lane 0 (roll butterfly)."""
    D = points[0].shape[-1]
    levels = int(np.log2(D))
    assert (1 << levels) == D

    def body(k, pts):
        rolled = tuple(jnp.roll(a, -(1 << k), axis=-1) for a in pts)
        return ec.point_add(ec.F1, pts, rolled)

    out = jax.lax.fori_loop(0, levels, body, points)
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


def sharded_msm_g1(mesh: Mesh, xs, ys, zs, scalars, axis: str = "shard",
                   nbits: int = 254):
    """Data-parallel G1 MSM: each device reduces its shard of points; the
    Jacobian partials are all-gathered and folded on every device."""
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis),) * 4,
             out_specs=(P(None, None),) * 3, check_rep=False)
    def step(x, y, z, sc):
        prods = ec.batched_scalar_mul(ec.F1, (x, y, z), sc, nbits)
        part = ec.tree_reduce(ec.F1, prods)                  # (16, 1)
        gathered = tuple(
            jax.lax.all_gather(a, axis, axis=2).reshape(fr.NLIMBS, n_dev)
            for a in part)
        return point_fold(gathered)

    return step(xs, ys, zs, scalars)


def sharded_point_fold_f32(mesh: Mesh, arrs, axis: str = "shard"):
    """Cross-device sum of projective G1 partials on the f32 digit engine
    (ops/ec_f32.py complete formulas): each device folds its local columns,
    partial sums are all-gathered over ICI and folded replicated.

    arrs: (X, Y, Z) digit arrays (34, D*k) with columns sharded over the
    mesh; returns replicated (34, 1) digit arrays."""
    from ..ops import ec_f32 as ecf
    from ..ops.fd32 import NDIGITS
    n_dev = mesh.devices.size

    def local_fold(cols):
        k = cols[0].shape[-1]
        pts = tuple(ecf.F1.wrap(a, 4.0) for a in cols)
        while k > 1:
            pts = ecf.point_add(ecf.F1,
                                tuple(ecf.FE(p.d[..., 0::2], p.bound)
                                      for p in pts),
                                tuple(ecf.FE(p.d[..., 1::2], p.bound)
                                      for p in pts))
            k //= 2
        return tuple(p.d for p in pts)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, axis),) * 3,
             out_specs=(P(None, None),) * 3, check_rep=False)
    def step(x, y, z):
        lx, ly, lz = local_fold((x, y, z))
        gath = tuple(
            jax.lax.all_gather(a, axis, axis=2).reshape(NDIGITS, n_dev)
            for a in (lx, ly, lz))
        return local_fold(gath)

    return step(*arrs)


def training_step(mesh: Mesh, leaves_mont, msm_points, msm_scalars,
                  axis: str = "shard", nbits: int = 254):
    """One full sharded pipeline step (the multi-chip dryrun target):
    device-parallel tree build + device-parallel MSM partials."""
    root = sharded_tree_root(mesh, leaves_mont, axis)
    acc = sharded_msm_g1(mesh, *msm_points, msm_scalars, axis, nbits=nbits)
    return root, acc
