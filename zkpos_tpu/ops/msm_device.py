"""Fully on-device Pippenger MSM (G1/G2 over BN254) — round-4 engine.

Replaces the host-scheduled pass-plan MSM of ops/msm.py for the Groth16
prove path (reference gnark MultiExp inside prover.go:269).  The round-3
engine computed every gather schedule on the HOST (C++ planner) and shipped
it to the device — ~80% of MSM wall-clock was schedule transfer over the
tunnel, the host ran the final Horner in Python, and the device results
buffer scaled with the stream (the 2^21-tier HBM OOM, VERDICT r3 weak #1).

This engine ships ONLY the window digits (uint16, same bytes as the
scalars) and runs everything else on device, in ONE jit dispatch per MSM
(round-5 rework — the round-4 version paid per-chunk dispatch latency
and `lax.associative_scan`'s per-level HBM round trips):

  1. HOST: numpy window decomposition (c-bit digits, c <= 16); one u16
     upload; padding/indexing/sort on device (ScalarPlan).
  2. DEVICE sort: `lax.sort` of (digits, point-index) per window — the
     bucket grouping for all windows in one dispatch.
  3. DEVICE segmented scan over sorted-stream chunks, inside a fori_loop:
     gather from the resident base, then ONE Pallas kernel per chunk
     (ec_pallas.seg_scan_pallas) computes the inclusive segmented EC-sum
     scan tile-by-tile in VMEM (Hillis–Steele over lanes, carry point in
     scratch across the sequential grid) — each stream element makes
     exactly one HBM round trip.  Windows are flattened into one stream
     with forced heads at window starts; the per-window cross-chunk carry
     is folded into each window's first element beforehand.  Each
     bucket's sum lands in a dense (W, 2^c) grid via a vectorized binary
     search over the chunk (no scatter): the last chunk to see a bucket
     leaves the complete sum.
  4. DEVICE bucket fold: suffix-sum formulation Σ_b b·S_b = Σ_{j>=1} T_j
     with T_j = Σ_{b>=j} S_b — a reversed segmented scan over the bucket
     axis plus a forward scan for the window totals (same kernel), then a
     W-step Horner with c doublings per window.  ONE point is read back.

The CPU/virtual-mesh path keeps pure-XLA bodies (Hillis–Steele fori_loop
with a dynamic shift: ONE point-add instance per scan, so test/dryrun
graphs compile fast cold).

Point arithmetic is the complete-formula projective add of ops/ec_f32.py
on the f32-digit Montgomery engine (ops/fd32.py); identity columns make
padding and empty buckets free.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto import bn254 as bn
from . import ec_f32 as ecf

_SAFE_BOUND = 10.0
_HOST_N_MAX = 16            # below this the python oracle beats dispatch


def _pow2ceil(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _wrap(na: int, arrs, bound=_SAFE_BOUND):
    f = lambda a: ecf.F1.wrap(a, bound)
    if na == 3:
        return tuple(f(a) for a in arrs)
    X0, X1, Y0, Y1, Z0, Z1 = arrs
    return ((f(X0), f(X1)), (f(Y0), f(Y1)), (f(Z0), f(Z1)))


def _unwrap(na: int, pt):
    if na == 3:
        return tuple(c.d for c in pt)
    return tuple(c.d for comp in pt for c in comp)


# EC engine: "lazy" = ripple-free ops/ec_lazy.py (smaller graphs, ~5x
# fewer dependent VPU ops); "ripple" = the round-3 ops/ec_f32.py engine.
_EC_ENGINE = os.environ.get("ZKPOS_EC_ENGINE", "lazy")
# stationary wrap bounds of the lazy point-add fixed point
_LZ_DB, _LZ_VB = 262.0, 3.1


def _wrap_lazy(na: int, arrs):
    from . import ec_lazy as ecl
    f = lambda a: ecl.FPL.wrap(a, _LZ_DB, _LZ_VB)
    if na == 3:
        return tuple(f(a) for a in arrs)
    X0, X1, Y0, Y1, Z0, Z1 = arrs
    return ((f(X0), f(X1)), (f(Y0), f(Y1)), (f(Z0), f(Z1)))


def _padd(na: int, a_arrs, b_arrs):
    """Complete point add on raw digit tuples.

    On TPU: the fused Pallas kernel (ops/ec_pallas.py — bf16 MXU reduce,
    VMEM-resident, one HLO custom-call per add, so the scan graphs stay
    tiny and the compute fused).  Off-TPU (tests / virtual mesh): the
    ripple-free lazy engine (small XLA graphs, fast CPU compiles)."""
    if jax.default_backend() == "tpu" and _EC_ENGINE != "xla":
        from .ec_pallas import point_add2_pallas, point_add_pallas
        fn = point_add_pallas if na == 3 else point_add2_pallas
        shp = a_arrs[0].shape
        out = fn(tuple(a.reshape(34, -1) for a in a_arrs),
                 tuple(b.reshape(34, -1) for b in b_arrs))
        return tuple(o.reshape(shp) for o in out)
    if _EC_ENGINE == "lazy":
        from . import ec_lazy as ecl
        F = ecl.F1L if na == 3 else ecl.F2L
        out = ecl.point_add(F, _wrap_lazy(na, a_arrs),
                            _wrap_lazy(na, b_arrs))
        return _unwrap(na, out)
    F = ecf.F1 if na == 3 else ecf.F2
    return _unwrap(na, ecf.point_add(F, _wrap(na, a_arrs),
                                     _wrap(na, b_arrs)))


@lru_cache(maxsize=None)
def _id_arrs_np(na: int):
    """Identity point (0:1:0) Montgomery digit columns as numpy (34, 1)
    — pure numpy (callable inside shard_map traces)."""
    from .fd32 import FP
    id_vals = [0, 1, 0] if na == 3 else [0, 0, 1, 0, 0, 0]
    return tuple(
        FP.ints_to_digits([(v * FP.r_mont) % FP.modulus])
        for v in id_vals)


def _select(mask, a_arrs, b_arrs):
    """mask ? a : b elementwise over digit tuples; mask broadcasts under
    the digit axis."""
    return tuple(jnp.where(mask[None], x, y) for x, y in zip(a_arrs, b_arrs))


def _seg_scan_hs(na, flags, pts, axis=2):
    """Inclusive segmented scan via Hillis–Steele with a DYNAMIC shift:
    ONE point-add instance traced for the whole scan (log2(L) fori_loop
    iterations), vs `lax.associative_scan`'s ~2·log2(L) distinct combine
    instances — the XLA-path graphs (CPU tests, virtual-mesh dryrun)
    compile several times faster for ~2x more arithmetic.

    flags: (..., L) bool segment heads; pts: na x (34, ..., L).
    Returns (flags_out, pts_out) with the inclusive per-segment sums."""
    L = pts[0].shape[axis]
    steps = max(L.bit_length() - 1, 0)
    if (1 << steps) < L:
        steps += 1
    ids = _id_arrs_np(na)
    idy = [jnp.asarray(i).reshape((34,) + (1,) * (pts[0].ndim - 1))
           for i in ids]
    lane = jax.lax.broadcasted_iota(jnp.int32, flags.shape,
                                    flags.ndim - 1)

    def body(s, state):
        f, cur = state
        sh = jax.lax.shift_left(jnp.int32(1), s)
        valid = lane >= sh
        part = tuple(
            jnp.where(valid[None], jnp.roll(a, sh, axis=axis), i)
            for a, i in zip(cur, idy))
        pf = jnp.where(valid, jnp.roll(f, sh, axis=f.ndim - 1), False)
        summed = _padd(na, part, cur)
        cur = _select(f, cur, summed)
        return f | pf, cur

    f_out, p_out = jax.lax.fori_loop(0, steps, body, (flags, tuple(pts)))
    return f_out, p_out


_TREE_BASE = 4096


def _seg_scan_tree(na, f, pts):
    """Work-efficient inclusive segmented scan on a FLAT stream:
    recursive pair-halving (Blelloch-style, ~2 point-adds per entry)
    driven at the XLA level with the pairwise Pallas add, with the
    VMEM Hillis–Steele kernel (11 adds/entry) as the small base case.
    The round-5 HS-only kernel spent 11 adds/entry at every size — at
    2^20 entries that was ~0.24 s/chunk of pure overwork.

    f: (S,) bool heads; pts: na x (34, S).  Returns na x (34, S)."""
    S = pts[0].shape[-1]
    if S <= _TREE_BASE:
        if jax.default_backend() == "tpu" and _EC_ENGINE != "xla":
            from .ec_pallas import seg_scan_pallas
            return seg_scan_pallas(na, pts, f)
        _, out = _seg_scan_hs(na, f, pts, axis=1)
        return out
    odd = S % 2
    if odd:
        f_head, pts_head = f[:-1], tuple(p[:, :-1] for p in pts)
    else:
        f_head, pts_head = f, pts
    ev = tuple(p[:, 0::2] for p in pts_head)
    od = tuple(p[:, 1::2] for p in pts_head)
    fe, fo = f_head[0::2], f_head[1::2]
    s = _padd(na, ev, od)
    pair = _select(fo, od, s)                  # segmented pair combine
    ps = _seg_scan_tree(na, fe | fo, pair)     # scan at odd positions
    # even fixup: out_even[j] = fe[j] ? ev[j] : ps[j-1] (+) ev[j]
    ids = _id_arrs_np(na)
    ps_shift = tuple(
        jnp.concatenate([jnp.broadcast_to(jnp.asarray(i), (34, 1)),
                         p[:, :-1]], axis=1)
        for i, p in zip(ids, ps))
    e2 = _padd(na, ps_shift, ev)
    out_even = _select(fe, ev, e2)
    out = tuple(jnp.stack([a, b], axis=-1).reshape(34, S - odd)
                for a, b in zip(out_even, ps))
    if odd:
        last = tuple(p[:, -1:] for p in pts)
        merged = _padd(na, tuple(p[:, -1:] for p in out), last)
        tail = _select(f[-1:], last, merged)
        out = tuple(jnp.concatenate([p, t], axis=1)
                    for p, t in zip(out, tail))
    return out


def _butterfly_reduce(na, arrs, axis=2):
    """EC sum over `axis` via roll butterfly: ONE add body in a fori_loop
    (the unrolled pairwise-halving tree compiled log2(L) distinct graphs).
    Lanes other than index 0 carry garbage afterwards."""
    L = arrs[0].shape[axis]
    levels = max(L.bit_length() - 1, 0)
    if (1 << levels) < L:
        raise ValueError("butterfly reduce needs power-of-two length")

    def body(k, cur):
        sh = jax.lax.shift_left(jnp.int32(1), k)
        part = tuple(jnp.roll(a, -sh, axis=axis) for a in cur)
        return _padd(na, cur, part)

    out = jax.lax.fori_loop(0, levels, body, tuple(arrs))
    return tuple(jax.lax.index_in_dim(a, 0, axis=axis, keepdims=True)
                 for a in out)


# --- host window decomposition ----------------------------------------------

def windows_of(scalars, c: int) -> np.ndarray:
    """(W, N) uint16 c-bit little-endian window digits (c <= 16).
    `scalars`: iterable of ints (reduced mod r) or an (N, 4) uint64
    little-endian limb array in standard form (native-solver output)."""
    if c > 16:
        raise ValueError("window width capped at 16 for uint16 transfer")
    if isinstance(scalars, np.ndarray):
        N = scalars.shape[0]
        buf = np.ascontiguousarray(scalars, dtype="<u8").tobytes()
    else:
        N = len(scalars)
        buf = b"".join(int(s % bn.R).to_bytes(32, "little")
                       for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(N, 32).astype(np.uint32)
    W = -(-254 // c)
    out = np.zeros((W, N), dtype=np.uint16)
    for w in range(W):
        lo_bit = w * c
        acc = np.zeros(N, dtype=np.uint32)
        for k in range(lo_bit // 8, min((lo_bit + c - 1) // 8 + 1, 32)):
            sh = 8 * k - lo_bit
            b = by[:, k]
            acc |= (b << sh) if sh >= 0 else (b >> -sh)
        out[w] = (acc & ((1 << c) - 1)).astype(np.uint16)
    return out


def pick_c(n: int) -> int:
    """Window width quantized to {8, 12, 16}: each (c, W, chunk) class
    costs a ~10-minute axon remote compile (then persistent-cached), so
    few classes beat per-n-optimal widths."""
    raw = n.bit_length() - 3
    if raw <= 9:
        return 8
    if raw <= 13:
        return 12
    return 16


# --- device stages ------------------------------------------------------------

@lru_cache(maxsize=None)
def _sort_fn(W: int, Np: int):
    """jit: (digits (W, Np) i32, idx (W, Np) i32) -> sorted by digit."""

    @jax.jit
    def run(dig, idx):
        return jax.lax.sort((dig, idx), dimension=1, num_keys=1)

    return run


def _chunk_body(na, W, Cn, c, base, sdig, sidx, dense, carry_dig,
                carry_pt):
    """Traced body of one sorted-stream chunk (shared by the single-chip
    jit wrapper and the shard_map multichip path): gather + segmented
    scan + dense-grid extraction."""
    nb = 1 << c
    queries = np.broadcast_to(np.arange(nb, dtype=np.int32), (W, nb))
    if True:
        pts = tuple(jnp.take(a, sidx.reshape(-1), axis=1)
                    .reshape(34, W, Cn).astype(jnp.float32) for a in base)
        # fold the carry point into position 0 when its segment continues
        cont = (sdig[:, 0] == carry_dig)                      # (W,)
        first = tuple(a[:, :, 0:1] for a in pts)
        cpt = tuple(a.reshape(34, W, 1) for a in carry_pt)
        merged = _padd(na, first, cpt)
        first = _select(cont[:, None], merged, first)
        pts = tuple(jnp.concatenate([f, a[:, :, 1:]], axis=2)
                    for f, a in zip(first, pts))
        heads = jnp.concatenate(
            [(sdig[:, 0:1] != carry_dig[:, None]),
             sdig[:, 1:] != sdig[:, :-1]], axis=1)            # (W, Cn)
        _, spts = _seg_scan_hs(na, heads, pts, axis=2)
        # dense update: binary search each bucket's last occurrence
        pos = jax.vmap(
            lambda a, q: jnp.searchsorted(a, q, side="right"))(
                sdig, jnp.asarray(queries)) - 1               # (W, nb)
        valid = (pos >= 0) & (
            jnp.take_along_axis(sdig, jnp.clip(pos, 0, Cn - 1), axis=1)
            == jnp.asarray(queries))
        posc = jnp.clip(pos, 0, Cn - 1)
        upd = tuple(jnp.take_along_axis(a, posc[None], axis=2)
                    for a in spts)
        dense = tuple(jnp.where(valid[None], u, d)
                      for u, d in zip(upd, dense))
        new_cd = sdig[:, -1]
        new_cp = tuple(a[:, :, -1] for a in spts)
        return dense, new_cd, new_cp


@lru_cache(maxsize=None)
def _chunk_fn(na: int, W: int, Cn: int, c: int):
    """jit: one chunk step over a start-indexed slice of the sorted
    stream; dense grid and carries are donated."""

    @partial(jax.jit, donate_argnums=(4, 5, 6))
    def run(base, sdig_all, sidx_all, start, dense, carry_dig, carry_pt):
        sdig = jax.lax.dynamic_slice(sdig_all, (0, start), (W, Cn))
        sidx = jax.lax.dynamic_slice(sidx_all, (0, start), (W, Cn))
        return _chunk_body(na, W, Cn, c, base, sdig, sidx, dense,
                           carry_dig, carry_pt)

    return run


def _chunk_body_flat(na, W, Cn, c, base, sdig, sidx, dense, carry_dig,
                     carry_pt):
    """TPU chunk body: gather, then ONE segmented-scan Pallas kernel over
    the flattened (window-major) sorted stream (ec_pallas.seg_scan_pallas)
    instead of the round-4 `lax.associative_scan` chain — each stream
    element now makes exactly one HBM round trip.  Window boundaries get
    forced segment heads (the per-window cross-chunk carry is folded into
    each window's first element beforehand), so the kernel's single carry
    chain cannot leak across windows."""
    from .ec_pallas import seg_scan_pallas
    nb = 1 << c
    S = W * Cn
    pts3 = tuple(jnp.take(a, sidx.reshape(-1), axis=1)
                 .reshape(34, W, Cn).astype(jnp.float32) for a in base)
    # fold the per-window carry into position 0 when its segment continues
    cont = (sdig[:, 0] == carry_dig)                      # (W,)
    first = tuple(a[:, :, 0:1] for a in pts3)             # (34, W, 1)
    cpt = tuple(a.reshape(34, W, 1) for a in carry_pt)
    merged = _padd(na, first, cpt)
    first = _select(cont[:, None], merged, first)
    pts3 = tuple(jnp.concatenate([f, a[:, :, 1:]], axis=2)
                 for f, a in zip(first, pts3))
    heads = jnp.concatenate(
        [jnp.ones((W, 1), dtype=bool),
         sdig[:, 1:] != sdig[:, :-1]], axis=1)            # (W, Cn)
    # Default scan: the all-Pallas HS kernel.  The recursive tree scan
    # (ZKPOS_MSM_SCAN=tree) produced a WRONG G2 MSM at the production
    # class (n=1.92M, Cn_eff=32768, 60 chunks — scripts/probe_g2_bisect:
    # tree False / hs True / tree-at-30-chunks True); until that is
    # root-caused it stays opt-in.
    if os.environ.get("ZKPOS_MSM_SCAN") == "tree":
        scan = _seg_scan_tree(
            na, heads.reshape(S), tuple(a.reshape(34, S) for a in pts3))
    else:
        scan = seg_scan_pallas(
            na, tuple(a.reshape(34, S) for a in pts3), heads.reshape(S))
    scan3 = tuple(a.reshape(34, W, Cn) for a in scan)
    # dense update: binary search each bucket's last occurrence
    queries = np.broadcast_to(np.arange(nb, dtype=np.int32), (W, nb))
    pos = jax.vmap(
        lambda a, q: jnp.searchsorted(a, q, side="right"))(
            sdig, jnp.asarray(queries)) - 1               # (W, nb)
    valid = (pos >= 0) & (
        jnp.take_along_axis(sdig, jnp.clip(pos, 0, Cn - 1), axis=1)
        == jnp.asarray(queries))
    posc = jnp.clip(pos, 0, Cn - 1)
    upd = tuple(jnp.take_along_axis(a, posc[None], axis=2)
                for a in scan3)
    dense = tuple(jnp.where(valid[None], u, d)
                  for u, d in zip(upd, dense))
    new_cd = sdig[:, -1]
    new_cp = tuple(a[:, :, -1] for a in scan3)
    return dense, new_cd, new_cp


def _horner_windows(na, W, c, rw):
    """Window results rw (na x (34, W)) -> final point via W-step Horner
    with c doublings per window (runs inside jit; fori_loop body traced
    once)."""
    ids = _id_arrs_np(na)

    def win_body(i, acc):
        w = W - 1 - i

        def dbl_body(_, a):
            return _padd(na, a, a)

        acc = jax.lax.fori_loop(0, c, dbl_body, acc)
        pw = tuple(jax.lax.dynamic_slice(a, (0, w), (34, 1))
                   for a in rw)
        return _padd(na, acc, pw)

    acc0 = tuple(jnp.asarray(i) for i in ids)
    return jax.lax.fori_loop(0, W, win_body, acc0)


def _fold_body_flat(na, W, c, dense):
    """TPU bucket fold: the suffix sums T_j = Σ_{b>=j} S_b and the window
    totals Σ_{j>=1} T_j both run as flattened segmented scans (one kernel
    each) instead of associative_scan + pairwise tree; then the W-step
    Horner."""
    from .ec_pallas import seg_scan_pallas
    nb = 1 << c
    S = W * nb
    heads = jnp.zeros((W, nb), dtype=bool).at[:, 0].set(True).reshape(S)
    rev = tuple(a[:, :, ::-1].reshape(34, S) for a in dense)
    if os.environ.get("ZKPOS_MSM_SCAN") == "tree":
        suf = _seg_scan_tree(na, heads, rev)
    else:
        suf = seg_scan_pallas(na, rev, heads)
    suf3 = tuple(a.reshape(34, W, nb)[:, :, ::-1] for a in suf)
    # bucket 0 has weight 0: replace T_0 with the identity column
    ids = _id_arrs_np(na)
    idcol = tuple(jnp.broadcast_to(jnp.asarray(i)[:, :, None], (34, W, 1))
                  for i in ids)
    arr = tuple(jnp.concatenate([i, s[:, :, 1:]], axis=2)
                for i, s in zip(idcol, suf3))
    flat = tuple(a.reshape(34, S) for a in arr)
    if os.environ.get("ZKPOS_MSM_SCAN") == "tree":
        tot = _seg_scan_tree(na, heads, flat)
    else:
        tot = seg_scan_pallas(na, flat, heads)
    rw = tuple(a.reshape(34, W, nb)[:, :, -1] for a in tot)   # (34, W)
    return _horner_windows(na, W, c, rw)


@lru_cache(maxsize=None)
def _msm_stream_fn(na: int, W: int, Cn: int, c: int, n_chunks: int):
    """ONE jit for the whole MSM: fori_loop over sorted-stream chunks +
    bucket fold + Horner — a single host dispatch per MSM (the round-4
    python chunk loop paid per-chunk dispatch latency over the tunnel).
    The flattened Pallas-scan bodies run on TPU; the associative-scan
    bodies remain the CPU/virtual-mesh path."""
    on_tpu = jax.default_backend() == "tpu" and _EC_ENGINE != "xla"
    chunk_body = _chunk_body_flat if on_tpu else _chunk_body
    fold_body = _fold_body_flat if on_tpu else _fold_body

    @jax.jit
    def run(base, sdig_all, sidx_all):
        nb = 1 << c
        ids = _id_arrs_np(na)
        dense = tuple(jnp.broadcast_to(jnp.asarray(i)[:, :, None],
                                       (34, W, nb)) for i in ids)
        cd = jnp.full((W,), -1, dtype=jnp.int32)
        cp = tuple(jnp.broadcast_to(jnp.asarray(i), (34, W)) for i in ids)

        def step(k, state):
            dense, cd, cp = state
            start = k * Cn
            sdig = jax.lax.dynamic_slice(sdig_all, (0, start), (W, Cn))
            sidx = jax.lax.dynamic_slice(sidx_all, (0, start), (W, Cn))
            return chunk_body(na, W, Cn, c, base, sdig, sidx, dense,
                              cd, cp)

        dense, cd, cp = jax.lax.fori_loop(0, n_chunks, step,
                                          (dense, cd, cp))
        return _finalize_pt(fold_body(na, W, c, dense))

    return run


def _fold_body(na, W, c, dense):
    """Traced bucket fold: suffix scan over buckets, tree-reduce of
    T_{j>=1}, Horner across windows — returns the RAW (lazy-domain)
    result point digits (na x (34, 1))."""
    nb = 1 << c
    ids = _id_arrs_np(na)
    if True:
        # suffix sums T_j = Σ_{b>=j} S_b: reversed Hillis–Steele scan with
        # one segment per window (ONE add body)
        heads = jnp.zeros((W, nb), dtype=bool).at[:, 0].set(True)
        rev = tuple(a[:, :, ::-1] for a in dense)
        _, suf = _seg_scan_hs(na, heads, rev, axis=2)
        suffix = tuple(a[:, :, ::-1] for a in suf)
        # zero out bucket 0 (weight 0): replace with identity column
        idcol = tuple(jnp.broadcast_to(jnp.asarray(i)[:, :, None],
                                       (34, W, 1)) for i in ids)
        arr = tuple(jnp.concatenate([i, s[:, :, 1:]], axis=2)
                    for i, s in zip(idcol, suffix))
        arr = _butterfly_reduce(na, arr, axis=2)
        # arr: (34, W, 1) per-window results; Horner over windows
        rw = tuple(a[:, :, 0] for a in arr)                   # (34, W)
        return _horner_windows(na, W, c, rw)


def _finalize_pt(res):
    """Raw result digits -> digits safe for the host converters."""
    if _EC_ENGINE == "lazy":
        # lazy values can be slightly negative; shift by +2p so the
        # host digit->int converters see a non-negative value
        from . import ec_lazy as ecl
        return tuple(
            ecl.FPL.to_nonneg(ecl.FPL.wrap(a, _LZ_DB, _LZ_VB))
            for a in res)
    return res


@lru_cache(maxsize=None)
def _fold_fn(na: int, W: int, c: int):
    """jit: dense grid -> final MSM point digits."""

    @jax.jit
    def run(dense):
        return _finalize_pt(_fold_body(na, W, c, dense))

    return run


def device_base(curve: str, points, quantum: int = 4096) -> tuple:
    """Upload an MSM base as uint8 digit arrays (34, P), identity at
    column 0 — canonical base-256 digits fit a byte, so pk residency and
    host->device transfer are 4x smaller than the f32 layout (the 12 GB
    gnark pk analog, reference prover.go:285-367).  The chunk kernel
    casts gathered columns to f32."""
    from ..utils import native
    from .fd32 import FP
    na = 3 if curve == "g1" else 6
    from ..groth16.artifact import PointArray
    if isinstance(points, PointArray):
        # artifact fast path: coordinate limbs already in u64 rows — no
        # python-bigint round trip at prover startup (the 12 GB gnark pk
        # stream analog, prover.go:302-343)
        assert points.curve == curve
        n = len(points)
        id_vals = [0, 1, 0] if na == 3 else [0, 0, 1, 0, 0, 0]
        P = -(-(n + 1) // quantum) * quantum
        shift = pow(2, 272 + 256, FP.modulus)
        mask = points.mask.astype(np.uint64)
        ncoord = 2 if na == 3 else 4
        y_slot = 1 if na == 3 else 2       # y (G1) / y0 (G2): 1 at identity
        z_slot = 2 if na == 3 else 4       # z (G1) / z0 (G2): the mask
        out = []
        for k in range(na):
            limbs = np.zeros((n + 1, 4), dtype=np.uint64)
            limbs[0, 0] = id_vals[k]
            if k == z_slot:
                limbs[1:, 0] = mask
            elif k < ncoord:               # stored coordinate (0 at None)
                limbs[1:] = points.limbs[:, k, :]
                if k == y_slot:
                    limbs[1:, 0] |= (1 - mask) & np.uint64(1)
            mont = native.mul_const_batch(limbs, shift, FP.modulus,
                                          which=native.FP_IDX)
            if mont is not None:
                dig = native.u256_to_digits(mont)
            else:
                dig = FP.ints_to_digits(
                    [(v * FP.r_mont) % FP.modulus
                     for v in native.limbs_to_ints(limbs)])
            arr = np.zeros((34, P), dtype=np.uint8)
            arr[:, :dig.shape[1]] = dig.astype(np.uint8)
            out.append(jnp.asarray(arr))
        return tuple(out)
    if curve == "g1":
        cols = [[0 if p is None else p[0] for p in points],
                [1 if p is None else p[1] for p in points]]
        zc = [0 if p is None else 1 for p in points]
        comps = [cols[0], cols[1], zc]
    else:
        comps = [[], [], [], [], [], []]
        for p in points:
            vals = ((0, 0, 1, 0, 0, 0) if p is None else
                    (p[0].c0, p[0].c1, p[1].c0, p[1].c1, 1, 0))
            for k, v in enumerate(vals):
                comps[k].append(v)
    # prepend identity column: (0 : 1 : 0).  Columns quantized to 4k steps
    # (not pow2 — a 2^21+1 base would double its HBM under pow2ceil).
    id_vals = [0, 1, 0] if na == 3 else [0, 0, 1, 0, 0, 0]
    P = -(-(len(points) + 1) // quantum) * quantum
    # to-Montgomery via ONE native CIOS per coordinate (the python bigint
    # loop cost ~30s per 2M-point base — it dominated prove-time base
    # uploads); shift constant 2^(272+256) mod p maps standard -> the
    # digit engine's 2^272 domain
    shift = pow(2, 272 + 256, FP.modulus)
    out = []
    for k, vals in enumerate(comps):
        allv = [id_vals[k]] + list(vals)
        limbs = native.ints_to_limbs(allv, FP.modulus)
        mont = native.mul_const_batch(limbs, shift, FP.modulus,
                                      which=native.FP_IDX)
        if mont is not None:
            dig = native.u256_to_digits(mont)
        else:
            dig = FP.ints_to_digits(
                [(v * FP.r_mont) % FP.modulus for v in allv])
        arr = np.zeros((34, P), dtype=np.uint8)
        arr[:, :dig.shape[1]] = dig.astype(np.uint8)
        out.append(jnp.asarray(arr))
    return tuple(out)


# --- public API ---------------------------------------------------------------

class ScalarPlan:
    """Window digits of one scalar vector, uploaded once and shared by
    every MSM over the same scalars (A/B1/B2 in groth16.prove)."""

    __slots__ = ("n", "c", "W", "K", "Cn", "Np", "dig_dev", "idx_dev")

    def __init__(self, scalars, c: Optional[int] = None, chunk: int = 0):
        self.n = (scalars.shape[0] if isinstance(scalars, np.ndarray)
                  else len(scalars))
        self.c = c if c is not None else pick_c(max(self.n, 2))
        win = windows_of(scalars, self.c)
        self.W = win.shape[0]
        nz = (win != 0).sum(axis=1)
        self.K = int(nz.max()) if nz.size else 0
        Cn = chunk or _chunk_cols(self.W)
        self.Cn = min(Cn, _pow2ceil(max(self.n, 256)))
        self.Np = -(-max(self.n, 1) // self.Cn) * self.Cn
        if self.K == 0:
            self.dig_dev = self.idx_dev = None
            return
        # upload the u16 window digits ONLY (half the round-4 bytes over
        # the tunnel); padding, the point-index array and the sort all run
        # on device
        sd, si = _plan_fn(self.W, self.n, self.Np)(jnp.asarray(win))
        self.dig_dev, self.idx_dev = sd, si


@lru_cache(maxsize=None)
def _plan_fn(W: int, n: int, Np: int):
    """jit: (W, n) u16 window digits -> front-padded, index-tagged,
    per-window-sorted (dig, idx) i32 arrays."""

    @jax.jit
    def run(win_u16):
        dig = jnp.pad(win_u16.astype(jnp.int32), ((0, 0), (Np - n, 0)))
        idx = jnp.pad(
            jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.int32),
                             (W, n)),
            ((0, 0), (Np - n, 0)))
        return jax.lax.sort((dig, idx), dimension=1, num_keys=1)

    return run


def _chunk_cols(W: int) -> int:
    """Columns per chunk: targets ~2^21 stream entries per chunk body
    (ZKPOS_MSM_CHUNK env overrides).  Bigger chunks amortize the dense
    bucket-grid rewrite (each chunk touches up to the whole grid); the
    gather+scan transients at 2^21 entries are ~3.3 GB, which
    _prove_reserve_bytes accounts for."""
    budget = int(os.environ.get("ZKPOS_MSM_CHUNK", str(1 << 21)))
    per_row = max(budget // max(W, 1), 256)
    return 1 << (per_row.bit_length() - 1)      # floor pow2


def msm(curve: str, base, scalars=None, plan: Optional[ScalarPlan] = None):
    """Σ s_i·P_i with device bases (ops/msm.device_points format).

    `base`: tuple of digit arrays (34, P) with the identity at column 0.
    Either `scalars` (host ints) or a prebuilt `plan` must be given.
    Returns an affine host point or None."""
    na = 3 if curve == "g1" else 6
    if plan is None:
        plan = ScalarPlan(scalars)
    if plan.K == 0:
        return None
    # G2 works on 6 coordinate arrays — halve the chunk so the gather +
    # scan transients fit next to the resident pk (v5e HBM); tiny explicit
    # chunks (tests) are kept as-is so Cn always divides plan.Np
    Cn = plan.Cn if na == 3 or plan.Cn <= 512 else plan.Cn // 2
    if os.environ.get("ZKPOS_MSM_IMPL") == "legacy":
        return _msm_legacy(na, plan, base, Cn)
    # fused path: fori_loop over ALL Np/Cn chunks (static count — leading
    # zero-digit runs only touch bucket 0, which the fold ignores) + fold,
    # ONE dispatch per MSM
    n_chunks = plan.Np // Cn
    out = _msm_stream_fn(na, plan.W, Cn, plan.c, n_chunks)(
        base, plan.dig_dev, plan.idx_dev)
    from_dev = ecf.g1_from_device if na == 3 else ecf.g2_from_device
    return from_dev(_wrap(na, out))[0]


def _msm_legacy(na, plan, base, Cn):
    """Round-4 per-chunk dispatch loop (A/B fallback: ZKPOS_MSM_IMPL=legacy)."""
    n_chunks = -(-plan.K // Cn)
    nb = 1 << plan.c
    ids = _id_arrs_np(na)
    dense = tuple(jnp.broadcast_to(jnp.asarray(i)[:, :, None],
                                   (34, plan.W, nb)).copy()
                  for i in ids)
    carry_dig = jnp.full((plan.W,), -1, dtype=jnp.int32)
    carry_pt = tuple(jnp.broadcast_to(jnp.asarray(i), (34, plan.W)).copy()
                     for i in ids)
    step = _chunk_fn(na, plan.W, Cn, plan.c)
    for k in range(n_chunks):
        start = jnp.int32(plan.Np - (n_chunks - k) * Cn)
        dense, carry_dig, carry_pt = step(
            base, plan.dig_dev, plan.idx_dev, start,
            dense, carry_dig, carry_pt)
    out = _fold_fn(na, plan.W, plan.c)(dense)
    from_dev = ecf.g1_from_device if na == 3 else ecf.g2_from_device
    return from_dev(_wrap(na, out))[0]
