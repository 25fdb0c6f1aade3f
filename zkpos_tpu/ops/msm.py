"""Pippenger multi-scalar multiplication on TPU (G1 and G2 over BN254).

Replaces gnark-crypto's `MultiExp` inside groth16.Prove/Setup (reference
prover.go:269, keygen main.go:42) with a TPU-shaped bucket method:

  1. HOST: slice each scalar into W = ceil(254/c) c-bit windows (numpy
     byte math) and build ONE global stream of (key = window·2^c + bucket,
     point index) entries across ALL windows, dropping zero digits.  One
     argsort turns scatter-heavy bucket accumulation into pure gathers
     with host-known schedules.
  2. DEVICE: grouped reduction over the whole stream — entries are packed
     into a (groups, 4) matrix (one row per (key, chunk-of-4)) and each
     pass is ONE fused jit dispatch: gather + two complete point-add
     folds (the Pallas kernel ops/ec_pallas.py on TPU).  Rows of a key
     recurse; ANY bucket distribution (duplicate-heavy witness scalars)
     costs ~1.33·N·W add-lanes with log4 passes.  Per-MSM dispatch count
     is ~log4(N·W) + log4(2^c), independent of W — essential on the
     axon tunnel where each dispatch costs milliseconds.
  3. DEVICE: bucket fold Σ_b b·S_b by bucket-index BITS, again as one
     grouped reduction: every bucket sum is re-streamed once per set bit
     with key = (window, bit).
  4. HOST: one readback; Horner combine over global bit positions
     (≤254 doublings + adds on host ints).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from . import ec_f32 as ecf

LCAP = 4           # row width of the numpy-fallback grouped reduction
PLAN_L = 4         # row width of the native-planned passes (log4 collapse)
_SAFE_BOUND = 10.0  # stationary lazy bound of fold coordinates
_PASS_ROW_CAP_G1 = 1 << 18   # max rows per fused pass dispatch (HBM cap:
_PASS_ROW_CAP_G2 = 1 << 16   # gather transient = 3|12 arrs x 34 x 4L rows)


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


def _device_add(curve, a, b):
    """One complete point add on raw digit arrays (Pallas on TPU)."""
    if jax.default_backend() == "tpu":
        from .ec_pallas import point_add2_pallas, point_add_pallas
        fn = point_add_pallas if curve == "g1" else point_add2_pallas
        return fn(a, b)
    F = _adapter(curve)
    return _unwrap(curve, ecf.point_add(F, _wrap(curve, a),
                                        _wrap(curve, b)))


@lru_cache(maxsize=None)
def _pass_fn(curve: str):
    """jit: (arrs (34, M), idx (R, 4)) -> row sums (34, R).  ONE dispatch:
    gather + two pairwise folds."""

    @jax.jit
    def run(arrs, idx):
        flat = tuple(jnp.take(a, idx.reshape(-1), axis=1) for a in arrs)
        for _ in range(2):
            flat = _device_add(curve,
                               tuple(x[..., 0::2] for x in flat),
                               tuple(x[..., 1::2] for x in flat))
        return flat

    return run


@lru_cache(maxsize=None)
def _id_col(curve: str):
    """Identity column arrays (34, 1) as NUMPY: (0 : 1 : 0) in Montgomery
    form.  numpy, not jnp — this is called inside jit traces and a cached
    tracer would leak (see the round-1 leaked-tracer fix in ops/fr_f32.py)."""
    conv = ecf.g1_to_device if curve == "g1" else ecf.g2_to_device
    return tuple(np.asarray(a) for a in _unwrap(curve, conv([None])))


@lru_cache(maxsize=None)
def _prepend_id_fn(curve: str):
    ids = _id_col(curve)

    @jax.jit
    def run(arrs):
        return tuple(jnp.concatenate([jnp.asarray(i), a], axis=1)
                     for i, a in zip(ids, arrs))
    return run


def _grouped_reduce(curve: str, cur_arrs, cur_keys: np.ndarray,
                    cur_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                  tuple]:
    """Reduce a key-sorted stream of points to one point per key.

    cur_arrs: device arrays with an identity sentinel at column 0;
    cur_idx: device column of each stream entry; cur_keys: sorted keys.
    Returns (unique_keys, idx_into_result_arrays, result_arrays)."""
    fn = _pass_fn(curve)
    prepend = _prepend_id_fn(curve)
    while True:
        uniq, counts = np.unique(cur_keys, return_counts=True)
        if len(cur_keys) == len(uniq):
            return uniq, cur_idx, cur_arrs
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
        out = fn(cur_arrs, jnp.asarray(idx))
        cur_arrs = prepend(out)
        cur_keys = np.repeat(uniq, rows_per)
        cur_idx = (np.arange(len(cur_keys)) + 1).astype(np.int32)


def _to_device_padded(curve: str, points):
    """Affine host points -> (34, P) digit arrays, identity sentinel at
    column 0, P a power of two (pad columns are never dereferenced)."""
    conv = ecf.g1_to_device if curve == "g1" else ecf.g2_to_device
    pts = conv([None] + list(points))
    arrs = _unwrap(curve, pts)
    P = _pow2ceil(arrs[0].shape[1])
    pad = P - arrs[0].shape[1]
    if pad:
        arrs = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in arrs)
    return tuple(jnp.asarray(a) for a in arrs)


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


def _native_plan(scalars, c: int):
    """Full pass plan from the C++ scheduler (native/zkpos_native.cpp
    zk_msm_plan): one call computes every grouped-reduction pass's gather
    matrix and the results-buffer layout — the round-2 per-pass numpy
    unique/argsort loop is gone and device dispatches pipeline
    back-to-back.  Returns None if the native library is unavailable
    (numpy fallback below)."""
    import ctypes
    from ..utils.native import lib
    L = lib()
    if L is None:
        return None
    n = len(scalars)
    buf = b"".join(int(s % bn.R).to_bytes(32, "little") for s in scalars)
    sc = np.frombuffer(buf, dtype=np.uint64).reshape(n, 4)
    meta = np.zeros(7, dtype=np.int64)
    L.zk_msm_plan.restype = ctypes.c_void_p
    handle = L.zk_msm_plan(
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_longlong(n), ctypes.c_int(c), ctypes.c_int(PLAN_L),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    (n_passes, n_passes_a, idx_len, n_final,
     buf_size, n_carry, carry_off) = (int(v) for v in meta)
    pass_meta = np.zeros(max(2 * n_passes, 1), dtype=np.int64)
    idx_flat = np.zeros(max(idx_len, 1), dtype=np.int32)
    carry = np.zeros(max(n_carry, 1), dtype=np.int32)
    fkeys = np.zeros(max(n_final, 1), dtype=np.int64)
    fidx = np.zeros(max(n_final, 1), dtype=np.int32)
    L.zk_msm_plan_fill(
        ctypes.c_void_p(handle),
        pass_meta.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        idx_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        carry.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        fkeys.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        fidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    passes = []
    off = 0
    for p in range(n_passes):
        rp = int(pass_meta[2 * p])
        passes.append((idx_flat[off:off + rp * PLAN_L].reshape(rp, PLAN_L),
                       int(pass_meta[2 * p + 1])))
        off += rp * PLAN_L
    carry_p = np.zeros(_pow2ceil(max(n_carry, 8)), dtype=np.int32)
    carry_p[:n_carry] = carry[:n_carry]
    return {"passes": passes, "carry_idx": carry_p,
            "carry_off": carry_off, "buf_size": buf_size,
            "fkeys": fkeys[:n_final], "fidx": fidx[:n_final]}


@lru_cache(maxsize=None)
def _pass1_fn(curve: str):
    """jit: the base->buf pass — fold multi-entry buckets + copy singleton
    buckets, both written into the persistent results buffer."""
    import math
    folds = int(math.log2(PLAN_L))

    @partial(jax.jit, donate_argnums=(1,))
    def run(base, buf, idx_a, idx_c, off_a, off_c):
        flat = tuple(jnp.take(a, idx_a.reshape(-1), axis=1) for a in base)
        for _ in range(folds):
            flat = _device_add(curve,
                               tuple(x[..., 0::2] for x in flat),
                               tuple(x[..., 1::2] for x in flat))
        carried = tuple(jnp.take(a, idx_c, axis=1) for a in base)
        out = []
        for b, f, cc in zip(buf, flat, carried):
            b = jax.lax.dynamic_update_slice(b, cc, (0, off_c))
            b = jax.lax.dynamic_update_slice(b, f, (0, off_a))
            out.append(b)
        return tuple(out)

    return run


@lru_cache(maxsize=None)
def _pass1_nocarry_fn(curve: str):
    """jit: a base->buf pass chunk without the carry copy (chunks after
    the first of an HBM-capped pass 1)."""
    import math
    folds = int(math.log2(PLAN_L))

    @partial(jax.jit, donate_argnums=(1,))
    def run(base, buf, idx_a, off_a):
        flat = tuple(jnp.take(a, idx_a.reshape(-1), axis=1) for a in base)
        for _ in range(folds):
            flat = _device_add(curve,
                               tuple(x[..., 0::2] for x in flat),
                               tuple(x[..., 1::2] for x in flat))
        return tuple(jax.lax.dynamic_update_slice(b, f, (0, off_a))
                     for b, f in zip(buf, flat))

    return run


@lru_cache(maxsize=None)
def _passk_fn(curve: str):
    """jit: one buf-resident reduction pass (reads and writes buf only —
    already-reduced buckets are never touched again)."""
    import math
    folds = int(math.log2(PLAN_L))

    @partial(jax.jit, donate_argnums=(0,))
    def run(buf, idx_a, off_a):
        flat = tuple(jnp.take(a, idx_a.reshape(-1), axis=1) for a in buf)
        for _ in range(folds):
            flat = _device_add(curve,
                               tuple(x[..., 0::2] for x in flat),
                               tuple(x[..., 1::2] for x in flat))
        return tuple(jax.lax.dynamic_update_slice(b, f, (0, off_a))
                     for b, f in zip(buf, flat))

    return run


def _buf_init(curve: str, size: int):
    """Zero results buffer with the identity at column 0."""
    ids = _id_col(curve)
    return tuple(
        jnp.zeros((a.shape[0], size), jnp.float32).at[:, 0:1].set(
            jnp.asarray(a))
        for a in ids)


def _host_only() -> bool:
    """ZKPOS_HOST_ONLY=1 routes MSM/fixed-base through the bn254 host
    oracle — no device compiles.  For the default-gate e2e smoke test and
    debugging; production paths never set it."""
    import os
    return os.environ.get("ZKPOS_HOST_ONLY", "") == "1"


def _msm(curve: str, points, scalars, c: Optional[int] = None,
         base=None):
    n = len(points)
    if n == 0:
        return None
    if _host_only():
        add = bn.g1_add if curve == "g1" else bn.g2_add
        mul = bn.g1_mul if curve == "g1" else bn.g2_mul
        acc = None
        for p, s_ in zip(points, scalars):
            if p is not None and s_ % bn.R:
                acc = add(acc, mul(p, s_ % bn.R))
        return acc
    if c is None:
        # wider windows at large N: fewer window passes shrink both the
        # global stream (HBM: the results buffer scales with it) and the
        # host->device schedule; bucket-fold cost stays ~2^c * W / 2.
        c = max(6, min(16, n.bit_length() - 3))
    base_arrs = base if base is not None else _to_device_padded(curve, points)

    plan = _native_plan(scalars, c)
    if plan is not None:
        fkeys, fidx = plan["fkeys"], plan["fidx"]
        if len(fkeys) == 0:
            return None
        fn1 = _pass1_fn(curve)
        fn1n = _pass1_nocarry_fn(curve)
        fnk = _passk_fn(curve)
        # buf columns quantized to 4M steps, not pow2: a 14M-column buf
        # costs 5.5GB for G1 — pow2ceil to 16M wastes another ~1GB of HBM
        # at the 2^21-wire tier, while coarse steps keep the jit shape
        # classes few (compile reuse across MSMs).
        bq = 1 << 22
        buf_cols = (max(plan["buf_size"], 8) + bq - 1) // bq * bq \
            if plan["buf_size"] > bq else _pow2ceil(max(plan["buf_size"], 8))
        buf = _buf_init(curve, buf_cols)
        # HBM cap: one pass chunk gathers PLAN_L*rows columns of the
        # (34, ·) digit arrays; a 2^21-row G1 pass peaks at several GB of
        # transients next to the resident pk bases and OOMs the chip, so
        # oversized passes are split into fixed pow2-row chunks written at
        # staggered buf offsets (pass rows are pow2-padded by the C++
        # planner, so chunks divide exactly and pad rows have reserved
        # output slots).
        cap = _PASS_ROW_CAP_G1 if curve == "g1" else _PASS_ROW_CAP_G2
        # NOTE: idx matrices go in as raw numpy — the jit-argument
        # transfer path is ~4.5x faster than device_put over the axon
        # tunnel (measured 0.8s vs 3.7s for a 32MB index matrix)
        for p_i, (idx_a, out_off) in enumerate(plan["passes"]):
            nrows = idx_a.shape[0]
            for start in range(0, nrows, cap):
                sub = idx_a[start:start + cap]
                off = jnp.int32(out_off + start)
                if p_i > 0:
                    buf = fnk(buf, sub, off)
                elif start == 0:        # carry copy rides chunk 0 only
                    buf = fn1(base_arrs, buf, sub, plan["carry_idx"],
                              off, jnp.int32(plan["carry_off"]))
                else:                   # later pass-1 chunks read base
                    buf = fn1n(base_arrs, buf, sub, off)
        farrs = buf
    else:
        # numpy fallback (no native lib): schedule pass-by-pass on host
        win = _windows_of(scalars, c)
        W = win.shape[0]
        keys_all = (np.arange(W, dtype=np.int64)[:, None] << c) | win
        idx_all = np.broadcast_to(np.arange(1, n + 1, dtype=np.int64),
                                  (W, n))
        nz = (win != 0)
        keys = keys_all[nz]
        idx = idx_all[nz].astype(np.int32)
        if len(keys) == 0:
            return None
        order = np.argsort(keys, kind="stable")
        keys, idx = keys[order], idx[order]

        # stage A: one point per (window, bucket)
        skeys, sidx, sarrs = _grouped_reduce(curve, base_arrs, keys, idx)

        # stage B: bucket fold by bits — re-stream every sum once per set
        # bit, key2 = w*c + t
        w_of = (skeys >> c).astype(np.int64)
        b_of = skeys & ((1 << c) - 1)
        k2, i2 = [], []
        for t in range(c):
            sel = (b_of >> t) & 1 == 1
            k2.append(w_of[sel] * c + t)
            i2.append(sidx[sel])
        keys2 = np.concatenate(k2)
        idx2 = np.concatenate(i2).astype(np.int32)
        order = np.argsort(keys2, kind="stable")
        fkeys, fidx, farrs = _grouped_reduce(curve, sarrs, keys2[order],
                                             idx2[order])

    # single readback: gather final columns in key order
    cols = _gather_jit()(farrs, jnp.asarray(np.asarray(fidx,
                                                       dtype=np.int32)))
    from_dev = ecf.g1_from_device if curve == "g1" else ecf.g2_from_device
    host_pts = from_dev(_wrap(curve, cols))

    # Horner over global bit positions b = c*w + t
    add = bn.g1_add if curve == "g1" else bn.g2_add
    by_bit = {}
    for key, pt in zip(fkeys, host_pts):
        if pt is not None:
            w, t = divmod(int(key), c)
            by_bit[c * w + t] = add(by_bit.get(c * w + t), pt)
    if not by_bit:
        return None
    acc = None
    for b in range(max(by_bit), -1, -1):
        if acc is not None:
            acc = add(acc, acc)
        if b in by_bit:
            acc = add(acc, by_bit[b])
    return acc


def msm_g1(points, scalars, c: Optional[int] = None, base=None):
    """Σ s_i·P_i over G1; points [(x, y) | None], scalars [int].
    `base`: optional pre-uploaded device arrays (device_points)."""
    return _msm("g1", points, scalars, c, base)


def msm_g2(points, scalars, c: Optional[int] = None, base=None):
    return _msm("g2", points, scalars, c, base)


def device_points(curve: str, points):
    """Pre-upload an MSM base for reuse across proofs (the 12GB-pk analog
    of gnark's in-RAM pk, reference prover.go:285-367)."""
    return _to_device_padded(curve, points)


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


@lru_cache(maxsize=None)
def _fb_step_fn(curve: str):
    """jit: one window accumulate — gather table points + add (fused)."""

    @jax.jit
    def run(acc_arrs, table_arrs, idx):
        pts = tuple(jnp.take(a, idx, axis=1) for a in table_arrs)
        return _device_add(curve, acc_arrs, pts)

    return run


@lru_cache(maxsize=None)
def _gather_jit():
    @jax.jit
    def run(arrs, idx):
        return tuple(jnp.take(a, idx, axis=1) for a in arrs)
    return run


def fixed_base_batch(curve: str, scalars) -> List:
    """[s·GEN for s in scalars] — batched window-table gathers, one fused
    dispatch per window.  Replaces the per-chunk double-and-add of the
    round-1 Setup path."""
    n = len(scalars)
    if n == 0:
        return []
    if _host_only():
        gen = bn.G1_GEN if curve == "g1" else bn.G2_GEN
        mul = bn.g1_mul if curve == "g1" else bn.g2_mul
        return [None if s % bn.R == 0 else mul(gen, s % bn.R)
                for s in scalars]
    c = FB_C
    win = _windows_of(scalars, c)
    table = _fb_table(curve)
    npad = _pow2ceil(max(n, 8))
    step = _fb_step_fn(curve)
    gather = _gather_jit()
    from_dev = ecf.g1_from_device if curve == "g1" else ecf.g2_from_device

    acc = None
    for j in range(win.shape[0]):
        idx = np.zeros((npad,), dtype=np.int32)
        idx[:n] = j * (1 << c) + win[j]
        if acc is None:
            acc = gather(table, jnp.asarray(idx))
        else:
            acc = step(acc, table, jnp.asarray(idx))
    return from_dev(_wrap(curve, acc))[:n]
