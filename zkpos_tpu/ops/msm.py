"""Pippenger multi-scalar multiplication on TPU (G1 and G2 over BN254).

Replaces gnark-crypto's `MultiExp` inside groth16.Prove/Setup (reference
prover.go:269, keygen main.go:42) with a TPU-shaped bucket method:

  1. HOST: slice each scalar into W = ceil(254/c) c-bit windows (numpy byte
     math), drop zero digits, and sort each window's point indices by
     bucket value.  Sorting on the host turns the scatter-heavy bucket
     accumulation into pure gathers — the only data-dependent addressing
     TPUs do well — and every gather schedule is host-known, so the whole
     MSM is one asynchronous dispatch stream with a single readback.
  2. DEVICE: grouped reduction — sorted points are packed into a
     (groups, 4) matrix (one row per (bucket, chunk-of-4)); a 2-level
     pairwise tree reduce sums each row; rows of the same bucket recurse
     (depth log4 N).  ANY bucket-size distribution (heavily duplicated
     witness scalars: 0/1/2^k) costs ~1.33N point-add lanes total — no
     2^c-sized padding, no spill path.
  3. DEVICE: per-window fold Σ_b b·S_b by bucket-index BITS: for each bit
     t, gather the bucket sums whose index has bit t set and tree-reduce;
     the window partial is Σ_t 2^t·B_t (host, c tiny points).
  4. HOST: Horner combine of window partials (c doublings per window).

All point arithmetic is the complete-formula f32-digit engine
(ops/ec_f32.py / ops/fd32.py): VPU f32 FMA convolutions for the variable
products + MXU constant matmuls for Montgomery reductions.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from . import ec_f32 as ecf

LCAP = 4           # matrix row width of one grouped-reduction pass
LCAP_LOG = 2
_SAFE_BOUND = 4.0  # stationary lazy bound of tree-reduce coordinates


def _pow2ceil(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _wrap(curve, arrs, bound=_SAFE_BOUND):
    f = lambda a: ecf.F1.wrap(a, bound)
    if curve == "g1":
        return tuple(f(a) for a in arrs)
    X0, X1, Y0, Y1, Z0, Z1 = arrs
    return ((f(X0), f(X1)), (f(Y0), f(Y1)), (f(Z0), f(Z1)))


def _unwrap(curve, pt):
    if curve == "g1":
        return tuple(c.d for c in pt)
    return tuple(c.d for comp in pt for c in comp)


def _adapter(curve):
    return ecf.F1 if curve == "g1" else ecf.F2


def _squeeze_last(pt):
    def sq(e):
        if isinstance(e, ecf.FE):
            return ecf.FE(e.d[..., 0], e.bound)
        return tuple(sq(c) for c in e)
    return tuple(sq(c) for c in pt)


@lru_cache(maxsize=None)
def _fold_fn(curve: str):
    """jit: (34, 2k) arrays -> (34, k): add adjacent column pairs.  The ONLY
    heavy graph in the MSM — one complete point_add — reused (via the jit
    shape cache + persistent compile cache) at every power-of-two width by
    every pass, window, and MSM size."""
    F = _adapter(curve)

    @jax.jit
    def run(arrs):
        a = _wrap(curve, tuple(x[..., 0::2] for x in arrs))
        b = _wrap(curve, tuple(x[..., 1::2] for x in arrs))
        return _unwrap(curve, ecf.point_add(F, a, b))

    return run


@lru_cache(maxsize=None)
def _gather_fn():
    @jax.jit
    def run(arrs, idx):
        return tuple(jnp.take(a, idx, axis=1) for a in arrs)
    return run


def _tree_reduce(curve: str, arrs, levels: int):
    fold = _fold_fn(curve)
    for _ in range(levels):
        arrs = fold(arrs)
    return arrs


def _gather_reduce(curve: str, arrs, idx: np.ndarray):
    """(coord arrays (34, M), idx (R, LCAP)) -> row sums (34, R)."""
    R = idx.shape[0]
    flat = _gather_fn()(arrs, jnp.asarray(idx.reshape(-1)))
    return _tree_reduce(curve, flat, LCAP_LOG)


def _gather_treesum(curve: str, arrs, idx: np.ndarray):
    """(coord arrays (34, M), idx (2^log_w,)) -> (34, 1) total."""
    log_w = idx.shape[0].bit_length() - 1
    flat = _gather_fn()(arrs, jnp.asarray(idx))
    return _tree_reduce(curve, flat, log_w)


def _to_device_padded(curve: str, points):
    """Affine host points -> tuple of (34, P) raw digit arrays with column 0
    an identity sentinel and P a power of two."""
    conv = ecf.g1_to_device if curve == "g1" else ecf.g2_to_device
    pts = conv([None] + list(points))
    arrs = _unwrap(curve, pts)
    P = _pow2ceil(arrs[0].shape[1])
    pad = P - arrs[0].shape[1]
    if pad:
        # pad with identity columns (X=0, Z=0; Y=0 is fine: Y is never
        # branched on and a (0:0:0) column is only ever read as filler at
        # slots the schedule marked identity)
        arrs = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in arrs)
    return arrs


@lru_cache(maxsize=None)
def _id_col(curve: str):
    """Identity column arrays (34, 1): (0 : 1 : 0) in Montgomery form."""
    conv = ecf.g1_to_device if curve == "g1" else ecf.g2_to_device
    return _unwrap(curve, conv([None]))


def _windows_of(scalars, c: int) -> np.ndarray:
    """(W, N) int64 c-bit window digits of each scalar (little-endian)."""
    N = len(scalars)
    buf = b"".join(int(s % bn.R).to_bytes(32, "little") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(N, 32)
    W = -(-254 // c)
    out = np.zeros((W, N), dtype=np.int64)
    for w in range(W):
        lo_bit = w * c
        for k in range(lo_bit // 8, min((lo_bit + c - 1) // 8 + 1, 32)):
            sh = 8 * k - lo_bit
            b = by[:, k].astype(np.int64)
            out[w] += (b << sh) if sh >= 0 else (b >> -sh)
        out[w] &= (1 << c) - 1
    return out


def _reduce_window(curve: str, base_arrs, keys: np.ndarray,
                   order: np.ndarray, c: int) -> List:
    """One window's bucket sums + bit-fold; returns c lazy (34, 1) device
    partials B_t = Σ_{b has bit t} S_b (window value = Σ_t 2^t B_t)."""
    cur_keys = keys[order]                  # sorted, all nonzero
    cur_idx = (order + 1).astype(np.int32)  # +1: identity sentinel at col 0
    cur_arrs = base_arrs
    while True:
        uniq, counts = np.unique(cur_keys, return_counts=True)
        if len(cur_keys) == len(uniq):
            break
        rows_per = -(-counts // LCAP)
        R = int(rows_per.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        row_starts = np.concatenate([[0], np.cumsum(rows_per)[:-1]])
        gid = np.repeat(np.arange(len(uniq)), counts)
        rank = np.arange(len(cur_keys)) - starts[gid]
        row = row_starts[gid] + rank // LCAP
        col = rank % LCAP
        Rp = _pow2ceil(max(R, 8))
        idx = np.zeros((Rp, LCAP), dtype=np.int32)
        idx[row, col] = cur_idx
        out = _gather_reduce(curve, cur_arrs, idx)
        # next pass gathers from [identity | outputs] — the sentinel must be
        # a TRUE identity (0:1:0): an all-zero column is not a valid point
        # under the complete formulas (P + (0:0:0) = (0:0:0))
        cur_arrs = tuple(jnp.concatenate([i, a], axis=1)
                         for i, a in zip(_id_col(curve), out))
        cur_keys = np.repeat(uniq, rows_per)
        cur_idx = (np.arange(len(cur_keys)) + 1).astype(np.int32)

    partials = []
    for t in range(c):
        sel = cur_idx[(cur_keys >> t) & 1 == 1]
        if len(sel) == 0:
            partials.append(None)
            continue
        Wp = _pow2ceil(len(sel))
        idx = np.zeros((Wp,), dtype=np.int32)
        idx[:len(sel)] = sel
        partials.append(_gather_treesum(curve, cur_arrs, idx))
    return partials


def _msm(curve: str, points, scalars, c: Optional[int] = None):
    n = len(points)
    if n == 0:
        return None
    if c is None:
        c = max(6, min(14, n.bit_length() - 4))
    base_arrs = _to_device_padded(curve, points)
    win = _windows_of(scalars, c)
    from_dev = ecf.g1_from_device if curve == "g1" else ecf.g2_from_device

    slots = []   # (window, bit) for each collected device partial
    parts = []
    for w in range(win.shape[0]):
        keys = win[w]
        nz = np.nonzero(keys)[0]
        if len(nz) == 0:
            continue
        order = nz[np.argsort(keys[nz], kind="stable")]
        for t, out in enumerate(_reduce_window(
                curve, base_arrs, keys, order, c)):
            if out is not None:
                slots.append((w, t))
                parts.append(out)

    if not parts:
        return None
    # ONE readback for the whole MSM
    stacked = tuple(jnp.concatenate([p[i] for p in parts], axis=1)
                    for i in range(len(parts[0])))
    host_pts = from_dev(_wrap(curve, stacked))

    # every partial carries a pure power-of-two weight 2^(c*w + t):
    # combine with one global Horner (≤254 doublings + adds, host ints)
    add = bn.g1_add if curve == "g1" else bn.g2_add
    by_bit = {}
    for (w, t), pt in zip(slots, host_pts):
        if pt is not None:
            b = c * w + t
            by_bit[b] = add(by_bit.get(b), pt)
    acc = None
    for b in range(max(by_bit), -1, -1):
        if acc is not None:
            acc = add(acc, acc)
        if b in by_bit:
            acc = add(acc, by_bit[b])
    return acc


def msm_g1(points, scalars, c: Optional[int] = None):
    """Σ s_i·P_i over G1; points [(x, y) | None], scalars [int]."""
    return _msm("g1", points, scalars, c)


def msm_g2(points, scalars, c: Optional[int] = None):
    return _msm("g2", points, scalars, c)


# --- fixed-base batch: [s_i * GEN for each i] (groth16.Setup tables) ---------

FB_C = 8


@lru_cache(maxsize=None)
def _fb_table(curve: str):
    """Device window table T[j*2^c + d] = d * 2^(c*j) * GEN (host-built
    once per curve: W*2^c incremental adds)."""
    c = FB_C
    if curve == "g1":
        gen, add, mul = bn.G1_GEN, bn.g1_add, bn.g1_mul
        conv = ecf.g1_to_device
    else:
        gen, add, mul = bn.G2_GEN, bn.g2_add, bn.g2_mul
        conv = ecf.g2_to_device
    W = -(-254 // c)
    pts = []
    base = gen
    for _ in range(W):
        cur = None
        for _ in range(1 << c):
            pts.append(cur)
            cur = add(cur, base)
        base = mul(base, 1 << c)
    return _unwrap(curve, conv(pts))


def fixed_base_batch(curve: str, scalars) -> List:
    """[s·GEN for s in scalars] — batched window-table gathers + W adds
    (each add = one interleave + the shared _fold_fn graph).  Replaces the
    per-chunk double-and-add of the round-1 Setup path."""
    n = len(scalars)
    if n == 0:
        return []
    c = FB_C
    win = _windows_of(scalars, c)
    table = _fb_table(curve)
    npad = _pow2ceil(max(n, 8))
    gather = _gather_fn()
    from_dev = ecf.g1_from_device if curve == "g1" else ecf.g2_from_device

    acc = None
    for j in range(win.shape[0]):
        idx = np.zeros((npad,), dtype=np.int32)
        idx[:n] = j * (1 << c) + win[j]
        pts = gather(table, jnp.asarray(idx))
        if acc is None:
            acc = pts
        else:
            inter = tuple(
                jnp.stack([a, p], axis=-1).reshape(a.shape[0], 2 * npad)
                for a, p in zip(acc, pts))
            acc = _tree_reduce(curve, inter, 1)
    return from_dev(_wrap(curve, acc))[:n]
