"""ctypes loader for the native host runtime (native/zkpos_native.cpp).

Builds the shared library with g++ on first use (cached by source mtime),
and exposes numpy-friendly wrappers.  Everything degrades gracefully: if
the toolchain is unavailable, `lib()` returns None and callers fall back
to the python paths.

The native layer mirrors the role of gnark-crypto's Go+asm field kernels
in the reference (go.mod:56): host-side Montgomery arithmetic, Poseidon,
the host<->device digit bridge, and R1CS evaluation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "zkpos_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libzkpos_native.so")

FR_IDX = 0
FP_IDX = 1


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


@lru_cache(maxsize=None)
def lib() -> Optional[ctypes.CDLL]:
    so = _build()
    if so is None:
        return None
    L = ctypes.CDLL(so)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_longlong)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    L.zk_mont_mul_batch.argtypes = [ctypes.c_int, u64p, u64p, u64p,
                                    ctypes.c_size_t]
    L.zk_add_batch.argtypes = L.zk_sub_batch.argtypes = \
        L.zk_mont_mul_batch.argtypes
    L.zk_to_mont_batch.argtypes = [ctypes.c_int, u64p, u64p, ctypes.c_size_t]
    L.zk_from_mont_batch.argtypes = L.zk_to_mont_batch.argtypes
    L.zk_mul_const_batch.argtypes = [ctypes.c_int, u64p, u64p, u64p,
                                     ctypes.c_size_t]
    L.zk_u256_to_digits.argtypes = [u64p, f32p, ctypes.c_size_t]
    L.zk_digits_to_u256.argtypes = [ctypes.c_int, f64p, u64p,
                                    ctypes.c_size_t, ctypes.c_int]
    L.zk_poseidon_init.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   u64p, u64p]
    L.zk_poseidon2_batch.argtypes = [u64p, u64p, u64p, ctypes.c_size_t,
                                     ctypes.c_int]
    L.zk_poseidon_permute_batch.argtypes = [u64p, ctypes.c_size_t]
    L.zk_lc_eval.argtypes = [i64p, i64p, u64p, u64p, u64p,
                             ctypes.c_size_t, ctypes.c_size_t]
    L.zk_r1cs_check.argtypes = [u64p, u64p, u64p, u8p, ctypes.c_size_t]
    return L


def _p(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def ints_to_limbs(values, mod: int) -> np.ndarray:
    """list[int] -> (N, 4) uint64 little-endian limb rows."""
    buf = b"".join(int(v % mod).to_bytes(32, "little") for v in values)
    return np.frombuffer(buf, dtype=np.uint64).reshape(-1, 4).copy()


def limbs_to_ints(a: np.ndarray) -> list:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    return [int.from_bytes(row.tobytes(), "little") for row in a]


def u256_to_digits(limbs: np.ndarray) -> Optional[np.ndarray]:
    """(N, 4) uint64 -> (34, N) f32 canonical digits (fd32 layout)."""
    L = lib()
    if L is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint64)
    n = limbs.shape[0]
    out = np.empty((34, n), dtype=np.float32)
    L.zk_u256_to_digits(_p(limbs, ctypes.c_uint64),
                        _p(out, ctypes.c_float), n)
    return out


def digits_to_u256(d: np.ndarray, which: int = FR_IDX) -> Optional[np.ndarray]:
    """(ndig, N) float digits (lazy ok) -> (N, 4) uint64 reduced mod p."""
    L = lib()
    if L is None:
        return None
    d = np.ascontiguousarray(d, dtype=np.float64)
    ndig, n = d.shape
    out = np.empty((n, 4), dtype=np.uint64)
    L.zk_digits_to_u256(which, _p(d, ctypes.c_double),
                        _p(out, ctypes.c_uint64), n, ndig)
    return out


_pos_inited = False


def to_mont_batch(limbs: np.ndarray, which: int = FR_IDX
                  ) -> Optional[np.ndarray]:
    """(N, 4) u64 standard form -> Montgomery form."""
    L = lib()
    if L is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint64)
    out = np.empty_like(limbs)
    L.zk_to_mont_batch(which, _p(limbs, ctypes.c_uint64),
                       _p(out, ctypes.c_uint64), limbs.shape[0])
    return out


def from_mont_batch(limbs: np.ndarray, which: int = FR_IDX
                    ) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint64)
    out = np.empty_like(limbs)
    L.zk_from_mont_batch(which, _p(limbs, ctypes.c_uint64),
                         _p(out, ctypes.c_uint64), limbs.shape[0])
    return out


def mul_const_batch(limbs: np.ndarray, c: int, mod: int,
                    which: int = FR_IDX) -> Optional[np.ndarray]:
    """out[i] = limbs[i] * c / 2^256 mod p (CIOS against a constant) —
    the domain bridge between standard form and the digit engine's
    2^272 Montgomery domain."""
    L = lib()
    if L is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.uint64)
    cc = ints_to_limbs([c], mod)
    out = np.empty_like(limbs)
    L.zk_mul_const_batch(which, _p(limbs, ctypes.c_uint64),
                         _p(cc, ctypes.c_uint64),
                         _p(out, ctypes.c_uint64), limbs.shape[0])
    return out


def poseidon_init_default() -> bool:
    """Load the fork-matching t=3 constants into the native Poseidon."""
    global _pos_inited
    L = lib()
    if L is None:
        return False
    if _pos_inited:
        return True
    from ..crypto import poseidon_params as pp
    from ..crypto.bn254 import R as MOD
    t = 3
    rf, rp = pp.R_FULL, pp.partial_rounds(t)
    ark, mds = pp.generate_params(t)           # ark already flat, row-major
    ark_np = ints_to_limbs(list(ark), MOD)
    mds_np = ints_to_limbs([c for row in mds for c in row], MOD)
    L.zk_poseidon_init(t, rf, rp, _p(ark_np, ctypes.c_uint64),
                       _p(mds_np, ctypes.c_uint64))
    _pos_inited = True
    return True


def poseidon2_batch(a_ints, b_ints) -> Optional[list]:
    """Batched reference 2-input Poseidon hash (native, ~50x python)."""
    if not poseidon_init_default():
        return None
    from ..crypto.bn254 import R as MOD
    from ..crypto.poseidon_ref import OUTPUT_INDEX
    L = lib()
    a = ints_to_limbs(a_ints, MOD)
    b = ints_to_limbs(b_ints, MOD)
    n = a.shape[0]
    out = np.empty((n, 4), dtype=np.uint64)
    L.zk_poseidon2_batch(_p(a, ctypes.c_uint64), _p(b, ctypes.c_uint64),
                         _p(out, ctypes.c_uint64), n, OUTPUT_INDEX)
    return limbs_to_ints(out)
