"""Versioned binary key/R1CS artifacts (replaces the round-4 gzip-pickle).

The reference persists `zkpor<assets>_<batch>.pk/.vk/.r1cs` in gnark's own
binary formats and streams them back per prover process (keygen
main.go:46-66, prover.go:302-343).  Pickle was the wrong trust boundary
for key material (arbitrary code execution on load) and single-threaded
to parse at multi-GB sizes.  This module stores:

  * `.vk` — exactly the gnark-layout bytes (serialize.vk_to_bytes): the
    artifact doubles as the gnark-format export the reference verifier
    consumes.
  * `.pk` / `.r1cs` — the ZKA container: a JSON header (scalars, shapes,
    section table) + raw little-endian numpy sections.  Loads are
    zero-parse `np.frombuffer` views of one contiguous read; point lists
    stay as u64 limb arrays end-to-end (PointArray) — the device upload
    path (ops/msm_device.device_base) consumes limbs directly, so no
    python-bigint round trip happens at prover startup.

Container layout:
  b"ZKPOSAR1" | u32 version | u64 header_len | header JSON | sections
Section entries: {"name", "dtype", "shape", "offset", "nbytes"}, offsets
relative to the end of the header, 64-byte aligned.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..crypto import bn254 as bn
from ..utils import native

MAGIC = b"ZKPOSAR1"
VERSION = 1
_ALIGN = 64


# --- point lists as limb arrays ----------------------------------------------

class PointArray:
    """A list of curve points stored as u64 limb arrays.

    G1: limbs (n, 2, 4) [x, y]; G2: limbs (n, 4, 4) [x0, x1, y0, y1];
    mask (n,) u8 — 0 marks None (identity) entries.  Quacks like the
    plain python list the rest of the code uses (len/iter/getitem), and
    exposes .limbs/.mask for the zero-copy device upload path."""

    __slots__ = ("curve", "limbs", "mask")

    def __init__(self, curve: str, limbs: np.ndarray, mask: np.ndarray):
        self.curve = curve
        self.limbs = limbs
        self.mask = mask

    @classmethod
    def from_points(cls, curve: str, points) -> "PointArray":
        n = len(points)
        nc = 2 if curve == "g1" else 4
        mask = np.zeros(n, dtype=np.uint8)
        flat: List[int] = []
        if curve == "g1":
            for i, p in enumerate(points):
                if p is None:
                    flat += [0, 0]
                else:
                    mask[i] = 1
                    flat += [p[0], p[1]]
        else:
            for i, p in enumerate(points):
                if p is None:
                    flat += [0, 0, 0, 0]
                else:
                    mask[i] = 1
                    flat += [p[0].c0, p[0].c1, p[1].c0, p[1].c1]
        limbs = native.ints_to_limbs(flat, bn.P).reshape(n, nc, 4)
        return cls(curve, limbs, mask)

    def __len__(self) -> int:
        return self.limbs.shape[0]

    def _int(self, i: int, c: int) -> int:
        row = self.limbs[i, c]
        return (int(row[0]) | int(row[1]) << 64 | int(row[2]) << 128
                | int(row[3]) << 192)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        if not self.mask[i]:
            return None
        if self.curve == "g1":
            return (self._int(i, 0), self._int(i, 1))
        return (bn.Fp2(self._int(i, 0), self._int(i, 1)),
                bn.Fp2(self._int(i, 2), self._int(i, 3)))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def __eq__(self, other):
        if isinstance(other, PointArray):
            return (self.curve == other.curve
                    and np.array_equal(self.limbs, other.limbs)
                    and np.array_equal(self.mask, other.mask))
        if isinstance(other, list):
            return len(self) == len(other) and all(
                a == b for a, b in zip(self, other))
        return NotImplemented


# --- container io ------------------------------------------------------------

def _write_container(path: str, meta: dict,
                     sections: Dict[str, np.ndarray]) -> None:
    table = []
    off = 0
    for name, arr in sections.items():
        arr = np.ascontiguousarray(arr)
        sections[name] = arr
        off = -(-off // _ALIGN) * _ALIGN
        table.append({"name": name, "dtype": str(arr.dtype),
                      "shape": list(arr.shape), "offset": off,
                      "nbytes": arr.nbytes})
        off += arr.nbytes
    header = json.dumps({"meta": meta, "sections": table}).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(VERSION.to_bytes(4, "little"))
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        base = f.tell()
        for entry, arr in zip(table, sections.values()):
            f.seek(base + entry["offset"])
            f.write(arr.tobytes())
    os.replace(tmp, path)


def _read_container(path: str):
    """Returns (meta, {name: np.ndarray}) — one sequential read, arrays
    are zero-copy views into the mapped buffer."""
    with open(path, "rb") as f:
        head = f.read(len(MAGIC) + 12)
        if head[:len(MAGIC)] != MAGIC:
            raise ValueError(f"{path}: not a ZKPOS artifact")
        version = int.from_bytes(head[8:12], "little")
        if version != VERSION:
            raise ValueError(f"{path}: unsupported artifact version "
                             f"{version}")
        hlen = int.from_bytes(head[12:20], "little")
        header = json.loads(f.read(hlen))
        base = f.tell()
        f.seek(0, 2)
        end = f.tell()
    buf = np.memmap(path, dtype=np.uint8, mode="r", offset=base,
                    shape=(end - base,))
    out = {}
    for s in header["sections"]:
        raw = buf[s["offset"]:s["offset"] + s["nbytes"]]
        out[s["name"]] = np.frombuffer(raw, dtype=np.dtype(s["dtype"])) \
            .reshape(s["shape"])
    return header["meta"], out


# --- pk ----------------------------------------------------------------------

_PK_G1_LISTS = ("a_g1", "b1_g1", "k_g1", "z_g1", "ck_bases",
                "ck_sigma_bases")


def _pt_hex(p) -> Optional[list]:
    if p is None:
        return None
    if isinstance(p[0], bn.Fp2):
        return [hex(p[0].c0), hex(p[0].c1), hex(p[1].c0), hex(p[1].c1)]
    return [hex(p[0]), hex(p[1])]


def _pt_unhex(v, curve: str):
    if v is None:
        return None
    ints = [int(x, 16) for x in v]
    if curve == "g1":
        return (ints[0], ints[1])
    return (bn.Fp2(ints[0], ints[1]), bn.Fp2(ints[2], ints[3]))


def save_pk(path: str, pk) -> None:
    meta = {
        "kind": "pk",
        "num_public": pk.num_public,
        "domain_size": pk.domain_size,
        "commit_wires": pk.commit_wires,
        "challenge_wire": pk.challenge_wire,
        "alpha_g1": _pt_hex(pk.alpha_g1),
        "beta_g1": _pt_hex(pk.beta_g1),
        "delta_g1": _pt_hex(pk.delta_g1),
        "beta_g2": _pt_hex(pk.beta_g2),
        "delta_g2": _pt_hex(pk.delta_g2),
    }
    sections: Dict[str, np.ndarray] = {}

    def add(name, curve, pts):
        if pts is None:
            meta[name] = None
            return
        pa = (pts if isinstance(pts, PointArray)
              else PointArray.from_points(curve, list(pts)))
        meta[name] = curve
        sections[name + ".limbs"] = pa.limbs
        sections[name + ".mask"] = pa.mask

    for name in _PK_G1_LISTS:
        add(name, "g1", getattr(pk, name))
    add("b_g2", "g2", pk.b_g2)
    _write_container(path, meta, sections)


def load_pk(path: str):
    from .groth16 import ProvingKey
    meta, sec = _read_container(path)

    def get(name):
        curve = meta.get(name)
        if curve is None:
            return None
        return PointArray(curve, sec[name + ".limbs"], sec[name + ".mask"])

    return ProvingKey(
        alpha_g1=_pt_unhex(meta["alpha_g1"], "g1"),
        beta_g1=_pt_unhex(meta["beta_g1"], "g1"),
        delta_g1=_pt_unhex(meta["delta_g1"], "g1"),
        a_g1=get("a_g1"), b1_g1=get("b1_g1"), k_g1=get("k_g1"),
        z_g1=get("z_g1"),
        beta_g2=_pt_unhex(meta["beta_g2"], "g2"),
        delta_g2=_pt_unhex(meta["delta_g2"], "g2"),
        b_g2=get("b_g2"),
        num_public=meta["num_public"],
        domain_size=meta["domain_size"],
        commit_wires=meta["commit_wires"],
        challenge_wire=meta["challenge_wire"],
        ck_bases=get("ck_bases"), ck_sigma_bases=get("ck_sigma_bases"))


# --- vk ----------------------------------------------------------------------

def save_vk(path: str, vk) -> None:
    """The .vk artifact IS the gnark-layout bytes (keygen main.go:56-60
    writes vk.WriteTo — same role here)."""
    from .serialize import vk_to_bytes
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(vk_to_bytes(vk))
    os.replace(tmp, path)


def load_vk(path: str):
    from .serialize import vk_from_bytes
    with open(path, "rb") as f:
        return vk_from_bytes(f.read())


# --- r1cs --------------------------------------------------------------------

def save_r1cs(path: str, meta_dict: dict) -> None:
    """meta_dict: the keygen dict (num_vars/num_public/num_constraints/
    range_bits/commitment/constraints/solver_program)."""
    fc = meta_dict["constraints"]
    if not hasattr(fc, "lens"):
        raise ValueError("r1cs artifact requires FlatConstraints")
    meta = {
        "kind": "r1cs",
        "num_vars": meta_dict["num_vars"],
        "num_public": meta_dict["num_public"],
        "num_constraints": meta_dict["num_constraints"],
        "range_bits": meta_dict["range_bits"],
        "commitment": meta_dict.get("commitment"),
    }
    sections: Dict[str, np.ndarray] = {
        "fc.vars": np.frombuffer(fc.vars, dtype=np.uint32),
        "fc.coeffs": np.frombuffer(fc.coeffs, dtype=np.uint32),
        "fc.lens": np.frombuffer(fc.lens, dtype=np.uint32),
        "fc.pool": native.ints_to_limbs(list(fc.pool), bn.R),
    }
    prog = meta_dict.get("solver_program")
    if prog is not None:
        meta["solver_program"] = {
            "n_cons": prog["n_cons"], "n_vars": prog["n_vars"],
            "boundary": prog["boundary"],
            "hint_boundary": prog["hint_boundary"],
            "commit_wires": prog["commit_wires"],
            "challenge_wire": prog["challenge_wire"],
            "arrays": sorted(prog["arrays"].keys()),
        }
        for k, arr in prog["arrays"].items():
            sections["sp." + k] = np.asarray(arr)
    _write_container(path, meta, sections)


def load_r1cs(path: str) -> dict:
    from ..circuit.cs import FlatConstraints
    from array import array
    meta, sec = _read_container(path)
    fc = FlatConstraints()
    fc.vars = array("I", sec["fc.vars"].tobytes())
    fc.coeffs = array("I", sec["fc.coeffs"].tobytes())
    fc.lens = array("I", sec["fc.lens"].tobytes())
    fc.pool = native.limbs_to_ints(sec["fc.pool"])
    fc._pool_idx = {c: i for i, c in enumerate(fc.pool)}
    out = {
        "num_vars": meta["num_vars"],
        "num_public": meta["num_public"],
        "num_constraints": meta["num_constraints"],
        "range_bits": meta["range_bits"],
        "commitment": meta["commitment"],
        "constraints": fc,
        "solver_program": None,
    }
    sp = meta.get("solver_program")
    if sp is not None:
        arrays = {k: np.ascontiguousarray(sec["sp." + k])
                  for k in sp["arrays"]}
        out["solver_program"] = {
            "arrays": arrays, "n_cons": sp["n_cons"],
            "n_vars": sp["n_vars"], "boundary": sp["boundary"],
            "hint_boundary": sp["hint_boundary"],
            "commit_wires": sp["commit_wires"],
            "challenge_wire": sp["challenge_wire"],
        }
    return out


# --- dispatch (keygen/prover/verifier entry points) --------------------------

def save(path: str, obj) -> None:
    from .groth16 import ProvingKey, VerifyingKey
    if isinstance(obj, ProvingKey):
        save_pk(path, obj)
    elif isinstance(obj, VerifyingKey):
        save_vk(path, obj)
    elif isinstance(obj, dict) and "constraints" in obj:
        save_r1cs(path, obj)
    else:
        raise TypeError(f"no artifact writer for {type(obj)!r}")


def load(path: str):
    """Loads any artifact; falls back to the legacy gzip-pickle format
    for pre-round-5 files."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head == MAGIC:
        meta, _ = _read_container(path)
        kind = meta.get("kind")
        if kind == "pk":
            return load_pk(path)
        if kind == "r1cs":
            return load_r1cs(path)
        raise ValueError(f"{path}: unknown artifact kind {kind!r}")
    if head[:2] == b"\x1f\x8b":      # legacy gzip-pickle
        import gzip
        import pickle
        with gzip.open(path, "rb") as f:
            return pickle.load(f)
    # gnark-layout vk bytes
    return load_vk(path)
