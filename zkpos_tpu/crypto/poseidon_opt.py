"""Optimized Poseidon partial rounds (sparse-MDS factorization).

Standard Poseidon spends a dense t x t MDS multiply in every one of its R_P
partial rounds even though the S-box touches only lane 0.  The classic
transformation (Poseidon paper App. B; used by circomlib/neptune) rewrites
the partial-round chain into

    dense @ sb(..) sparse_{R_P-2} @ sb(..) ... sparse_0 @ sb(..)

where each sparse matrix has the form [[m00, v], [w_hat, I]] (2t-1 nonzero
entries) and all round constants collapse onto lane 0.  This file derives
the equivalent constants and matrices *numerically from the same Grain-LFSR
parameters* used by the reference's Poseidon (bnb-chain gnark-crypto fork,
reference go.mod:57), so no vendored tables are needed, and verifies
nothing by construction — `tests/test_poseidon_opt.py` asserts the
optimized evaluation is bit-identical to the unoptimized oracle.

Derivation notes (composition right-to-left; sb0(x) applies x^5 to lane 0
only):
  * constant folding: a full-lane constant add before a partial S-box
    splits into a lane-0 add (absorbed into that round's S-box input) and
    a rest-add that commutes across sb0 and folds into the next round's
    constants; iterating leaves one carry vector added after the chain,
    merged into the first full round of the second half.
  * matrix folding: M = M' @ S with M' = diag(1, M_hat) and
    S = [[m00, v], [M_hat^{-1} w, I]]; diag matrices commute with sb0 and
    with lane-0 constant adds, so every M migrates leftward, leaving one
    dense matrix on the final partial round.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

from .bn254 import R as MOD
from .poseidon_params import R_FULL, generate_params, partial_rounds


def _mat_vec(m, x):
    return [sum(mi[j] * x[j] for j in range(len(x))) % MOD for mi in m]


def _mat_mul(a, b):
    n = len(a)
    return [[sum(a[i][k] * b[k][j] for k in range(n)) % MOD
             for j in range(n)] for i in range(n)]


def _mat_inv(m):
    """Gauss-Jordan inverse over Fr."""
    n = len(m)
    a = [list(row) + [1 if i == j else 0 for j in range(n)]
         for i, row in enumerate(m)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % MOD)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], MOD - 2, MOD)
        a[col] = [v * inv % MOD for v in a[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(a[r][j] - f * a[col][j]) % MOD for j in range(2 * n)]
    return [row[n:] for row in a]


@lru_cache(maxsize=None)
def opt_params(t: int):
    """Equivalent optimized parameters for width t.

    Returns dict with:
      c_init   (t,)          constants added before round 0
      c_full   list of (t,)  constants added after each full-round mix
                             (indices 0..R_FULL-2, skipping the slots that
                             fall inside the partial chain)
      d_partial (R_P,)       lane-0 constants for each partial round
      c_resume (t,)          constants added entering the second-half full
                             rounds (original C + folded carry)
      sparse   list of (m00, v[t-1], w_hat[t-1]) for partial rounds
               0..R_P-2
      dense_last t x t       matrix for the final partial round's mix
      mds      t x t         dense MDS for full rounds
    """
    constants, mds = generate_params(t)
    r_p = partial_rounds(t)
    half = R_FULL // 2

    def C(r):
        return list(constants[r * t:(r + 1) * t])

    # ---- constant folding over the partial chain -------------------------
    # original partial round r: x <- M @ sb0(x + C_r)
    # fold to: lane-0 add d_r, sb0, mix; plus carry added after the chain.
    d_partial: List[int] = []
    carry = [0] * t
    for r in range(half, half + r_p):
        c = C(r)
        d_partial.append((c[0] + carry[0]) % MOD)
        rest = [0] + [(c[i] + carry[i]) % MOD for i in range(1, t)]
        carry = _mat_vec(mds, rest)
    c_resume = [(a + b) % MOD for a, b in zip(C(half + r_p), carry)]

    # ---- matrix folding --------------------------------------------------
    sparse: List[Tuple[int, list, list]] = []
    d_mat = [row[:] for row in mds]
    for _ in range(r_p - 1):
        m00 = d_mat[0][0]
        v = [d_mat[0][j] for j in range(1, t)]
        w = [d_mat[i][0] for i in range(1, t)]
        d_hat = [[d_mat[i][j] for j in range(1, t)] for i in range(1, t)]
        d_hat_inv = _mat_inv(d_hat)
        w_hat = _mat_vec(d_hat_inv, w)
        sparse.append((m00, v, w_hat))
        # M' = diag(1, d_hat); next dense = M @ M'
        m_prime = [[0] * t for _ in range(t)]
        m_prime[0][0] = 1
        for i in range(1, t):
            for j in range(1, t):
                m_prime[i][j] = d_hat[i - 1][j - 1]
        d_mat = _mat_mul(mds, m_prime)
    dense_last = d_mat

    c_full = [C(r + 1) for r in range(half - 1)]          # after rounds 0..half-2
    c_full_2nd = [C(half + r_p + 1 + k) for k in range(half - 1)]
    return {
        "c_init": C(0),
        "c_full": c_full,
        "d_partial": d_partial,
        "c_resume": c_resume,
        "c_full_2nd": c_full_2nd,
        "sparse": sparse,
        "dense_last": dense_last,
        "mds": mds,
    }


def permutation_opt(state: List[int]) -> List[int]:
    """Optimized-form evaluation; bit-identical to poseidon_ref.permutation."""
    t = len(state)
    p = opt_params(t)
    r_p = partial_rounds(t)
    half = R_FULL // 2
    mds = p["mds"]

    x = [(s + c) % MOD for s, c in zip(state, p["c_init"])]
    for r in range(half):
        x = [pow(v, 5, MOD) for v in x]
        x = _mat_vec(mds, x)
        if r < half - 1:
            x = [(v + c) % MOD for v, c in zip(x, p["c_full"][r])]
        else:
            x[0] = (x[0] + p["d_partial"][0]) % MOD
    for i in range(r_p):
        x[0] = pow(x[0], 5, MOD)
        if i < r_p - 1:
            m00, v, w_hat = p["sparse"][i]
            x0 = (m00 * x[0] + sum(vj * x[j + 1] for j, vj in enumerate(v))) % MOD
            for j in range(1, t):
                x[j] = (x[j] + w_hat[j - 1] * x[0]) % MOD
            x[0] = x0
            x[0] = (x[0] + p["d_partial"][i + 1]) % MOD
        else:
            x = _mat_vec(p["dense_last"], x)
            x = [(v_ + c) % MOD for v_, c in zip(x, p["c_resume"])]
    for r in range(half):
        x = [pow(v, 5, MOD) for v in x]
        x = _mat_vec(mds, x)
        if r < half - 1:
            x = [(v + c) % MOD for v, c in zip(x, p["c_full_2nd"][r])]
    return x
