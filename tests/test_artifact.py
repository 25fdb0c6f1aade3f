"""Binary key/r1cs artifacts (groth16/artifact.py): round trips, legacy
pickle fallback, and the PointArray device-base fast path."""

import gzip
import pickle

import numpy as np
import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.groth16 import artifact as af


def _g1(s):
    return bn.g1_mul(bn.G1_GEN, s)


def _g2(s):
    return bn.g2_mul(bn.G2_GEN, s)


def test_point_array_round_trip():
    pts = [_g1(3), None, _g1(7), _g1(11)]
    pa = af.PointArray.from_points("g1", pts)
    assert len(pa) == 4
    assert list(pa) == pts
    assert pa[1] is None and pa[2] == pts[2]
    q = [_g2(5), None, _g2(9)]
    pa2 = af.PointArray.from_points("g2", q)
    assert list(pa2) == q


def test_pk_vk_artifact_round_trip(tmp_path):
    from zkpos_tpu.groth16.groth16 import ProvingKey, VerifyingKey
    pk = ProvingKey(
        alpha_g1=_g1(2), beta_g1=_g1(3), delta_g1=_g1(4),
        a_g1=[_g1(5), None, _g1(6)], b1_g1=[_g1(7), _g1(8), None],
        k_g1=[_g1(9)], z_g1=[_g1(10), _g1(11)],
        beta_g2=_g2(3), delta_g2=_g2(4),
        b_g2=[_g2(5), None, _g2(6)],
        num_public=2, domain_size=4,
        commit_wires=[2], challenge_wire=3,
        ck_bases=[_g1(12)], ck_sigma_bases=[_g1(13)])
    p = str(tmp_path / "t.pk")
    af.save(p, pk)
    with open(p, "rb") as f:
        assert f.read(8) == af.MAGIC
    back = af.load(p)
    for name in ("a_g1", "b1_g1", "k_g1", "z_g1", "b_g2",
                 "ck_bases", "ck_sigma_bases"):
        assert list(getattr(back, name)) == getattr(pk, name), name
    for name in ("alpha_g1", "beta_g1", "delta_g1", "beta_g2", "delta_g2",
                 "num_public", "domain_size", "commit_wires",
                 "challenge_wire"):
        assert getattr(back, name) == getattr(pk, name), name

    vk = VerifyingKey(
        alpha_g1=_g1(2), beta_g2=_g2(3), gamma_g2=_g2(5), delta_g2=_g2(4),
        k_gamma_g1=[_g1(1), _g1(9)], num_public=2,
        kc_g1=_g1(21), sigma_g2=_g2(33),
        beta_g1=_g1(3), delta_g1=_g1(4),
        public_and_commitment_committed=[[]])
    pv = str(tmp_path / "t.vk")
    af.save(pv, vk)
    bvk = af.load(pv)
    assert bvk.k_gamma_g1 == vk.k_gamma_g1
    assert bvk.kc_g1 == vk.kc_g1 and bvk.sigma_g2 == vk.sigma_g2


def test_r1cs_artifact_round_trip(tmp_path):
    from zkpos_tpu.circuit.cs import ConstraintSystem
    from zkpos_tpu.circuit import solver_native as sn
    cs = ConstraintSystem(solve=False, range_bits=8)
    a = cs.new_witness(7)
    b = cs.new_witness(9)
    c = cs.mul(a, b)
    cs.mul(c, cs.add(a, b))
    cs.finalize()
    meta = {"num_vars": cs.num_vars, "num_public": cs.num_public,
            "num_constraints": len(cs.constraints),
            "range_bits": cs.range_bits, "commitment": cs.commitment,
            "constraints": cs.constraints,
            "solver_program": sn.program_to_dict(sn.record_program(cs))}
    p = str(tmp_path / "t.r1cs")
    af.save(p, meta)
    back = af.load(p)
    assert back["num_vars"] == meta["num_vars"]
    assert back["num_constraints"] == meta["num_constraints"]
    assert list(back["constraints"]) == list(meta["constraints"])
    sp, bp = meta["solver_program"], back["solver_program"]
    assert bp["n_cons"] == sp["n_cons"]
    for k, arr in sp["arrays"].items():
        assert np.array_equal(bp["arrays"][k], arr), k


def test_legacy_pickle_fallback(tmp_path):
    p = str(tmp_path / "old.r1cs")
    obj = {"num_vars": 7, "hello": [1, 2, 3]}
    with gzip.open(p, "wb") as f:
        pickle.dump(obj, f)
    assert af.load(p) == obj


def test_device_base_point_array_matches_list():
    from zkpos_tpu.ops import msm_device as md
    pts = [_g1(3), None, _g1(7), _g1(11)]
    b1 = md.device_base("g1", pts, quantum=8)
    b2 = md.device_base("g1", af.PointArray.from_points("g1", pts),
                        quantum=8)
    for x, y in zip(b1, b2):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    q = [_g2(5), None, _g2(9)]
    c1 = md.device_base("g2", q, quantum=8)
    c2 = md.device_base("g2", af.PointArray.from_points("g2", q),
                        quantum=8)
    for x, y in zip(c1, c2):
        assert np.array_equal(np.asarray(x), np.asarray(y))
