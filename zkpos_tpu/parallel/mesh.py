"""Multi-chip sharding for the proving engine (jax.sharding + shard_map).

The reference's only scale-out axis is process-level (N provers on a Redis
queue, README.md:122-128).  Here one *logical* pipeline step also spans a
device mesh:

  * leaf hashing + the bottom Merkle levels are data-parallel across
    devices (each device owns a contiguous leaf range);
  * the top log2(#devices) levels cross shard boundaries: local subtree
    roots are all-gathered over ICI and folded (replicated) — the batched
    analog of merkletree.go's worker partitioning;
  * MSM chunks are data-parallel with a final cross-device fold of Jacobian
    partial sums (all_gather + local point_add chain).

Tested on a virtual 8-device CPU mesh (tests/conftest.py); the same code
runs unchanged on a real TPU slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import ec
from ..ops import fr
from ..ops.poseidon import hash2_mont, permute


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _local_subtree_root(leaves, levels: int):
    """Fold a (16, L) Montgomery leaf block to its subtree root, L = 2^levels."""
    cur = leaves
    for _ in range(levels):
        cur = hash2_mont(cur[:, 0::2], cur[:, 1::2])
    return cur  # (16, 1)


def sharded_tree_root(mesh: Mesh, leaves_mont, axis: str = "shard"):
    """Compute the Merkle root of a (16, N) Montgomery leaf array sharded
    across the mesh.  N and N/#devices must be powers of two."""
    n_dev = mesh.devices.size
    n = leaves_mont.shape[1]
    local = n // n_dev
    local_levels = int(np.log2(local))
    top_levels = int(np.log2(n_dev))
    assert (1 << local_levels) == local and (1 << top_levels) == n_dev

    @partial(shard_map, mesh=mesh, in_specs=P(None, axis),
             out_specs=P(None, None))
    def step(block):
        root = _local_subtree_root(block, local_levels)      # (16, 1)
        roots = jax.lax.all_gather(root, axis, axis=2)       # (16, 1, D)
        roots = roots.reshape(fr.NLIMBS, n_dev)
        cur = roots
        for _ in range(top_levels):
            cur = hash2_mont(cur[:, 0::2], cur[:, 1::2])
        return cur

    return step(leaves_mont)


def sharded_msm_g1(mesh: Mesh, xs, ys, zs, scalars, axis: str = "shard"):
    """Data-parallel G1 MSM: each device reduces its shard of points, the
    Jacobian partials are all-gathered and folded on every device."""
    n_dev = mesh.devices.size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis),) * 4,
             out_specs=(P(None, None),) * 3)
    def step(x, y, z, sc):
        prods = ec.batched_scalar_mul(ec.F1, (x, y, z), sc)
        part = ec.tree_reduce(ec.F1, prods)                  # (16, 1) each
        gx = jax.lax.all_gather(part[0], axis, axis=2).reshape(fr.NLIMBS, n_dev)
        gy = jax.lax.all_gather(part[1], axis, axis=2).reshape(fr.NLIMBS, n_dev)
        gz = jax.lax.all_gather(part[2], axis, axis=2).reshape(fr.NLIMBS, n_dev)
        acc = (gx[:, 0:1], gy[:, 0:1], gz[:, 0:1])
        for d in range(1, n_dev):
            acc = ec.point_add(ec.F1, acc,
                               (gx[:, d:d + 1], gy[:, d:d + 1],
                                gz[:, d:d + 1]))
        return acc

    return step(xs, ys, zs, scalars)


def training_step(mesh: Mesh, leaves_mont, msm_points, msm_scalars,
                  axis: str = "shard"):
    """One full sharded pipeline step (the multi-chip dryrun target):
    device-parallel tree build + device-parallel MSM partials."""
    root = sharded_tree_root(mesh, leaves_mont, axis)
    acc = sharded_msm_g1(mesh, *msm_points, msm_scalars, axis)
    return root, acc
