"""Native two-pass witness solver vs the eager Python solve.

The Python solve-mode run is the oracle: for the same compiled circuit,
inputs and commitment key, the C++ VM (zk_solver_*) must produce the
identical witness vector — including all post-commitment logUp wires —
and groth16.prove must accept the SolvedSystem wrapper.
"""
import os

import numpy as np
import pytest

from zkpos_tpu.crypto import bn254 as bn
from zkpos_tpu.circuit import solver_native as sn
from zkpos_tpu.circuit.cs import ConstraintSystem
from zkpos_tpu.utils import native


pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native library unavailable")


@pytest.fixture(autouse=True)
def _host_only(monkeypatch):
    monkeypatch.setenv("ZKPOS_HOST_ONLY", "1")


def _values_of(solved: sn.SolvedSystem):
    return [int.from_bytes(row.tobytes(), "little")
            for row in solved.values_u64]


def _fake_key(n):
    return {"bases": [bn.G1_GEN] * n, "sigma_bases": [bn.G1_GEN] * n}


def test_lookup_circuit_matches_python():
    from tests.test_groth16 import build_lookup
    table = (11, 22, 33, 44)
    idxs = [2, 0, 2]
    want = sum(table[i] for i in idxs)

    compile_cs = ConstraintSystem(solve=False)
    build_lookup(compile_cs, table_vals=table)
    prog = sn.record_program(compile_cs)
    key = _fake_key(len(prog.commit_wires))

    solved = sn.solve(compile_cs, [want] + idxs, key)

    py = ConstraintSystem(solve=True)
    build_lookup(py, want, idxs, table_vals=table)
    py.set_commitment_key(dict(key))
    assert py.is_satisfied()

    assert _values_of(solved) == py.values
    assert solved._commit_result[0] == py._commit_result[0]


def test_lookup_native_prove_verify():
    from zkpos_tpu.groth16 import groth16 as g16
    from tests.test_groth16 import build_lookup
    table = (7, 9)
    idxs = [1, 1, 0]
    want = sum(table[i] for i in idxs)

    compile_cs = ConstraintSystem(solve=False)
    build_lookup(compile_cs, table_vals=table)
    pk, vk = g16.setup(compile_cs)
    key = {"bases": pk.ck_bases, "sigma_bases": pk.ck_sigma_bases}
    solved = sn.solve(compile_cs, [want] + idxs, key)
    proof = g16.prove(solved, pk)
    assert g16.verify(proof, vk, [want])
    assert not g16.verify(proof, vk, [want + 1])


def test_unsatisfied_input_raises():
    from tests.test_groth16 import build_lookup
    compile_cs = ConstraintSystem(solve=False)
    build_lookup(compile_cs, table_vals=(7, 9))
    prog = sn.record_program(compile_cs)
    key = _fake_key(len(prog.commit_wires))
    with pytest.raises(RuntimeError, match="native solve failed"):
        sn.solve(compile_cs, [999, 1, 1, 0], key)   # wrong public sum


def test_batch_circuit_matches_python():
    """Full BatchCreateUserCircuit at the test-shrunk tier: native witness
    vector must equal the eager keyed Python solve wire for wire."""
    from zkpos_tpu.utils import constants as C
    from zkpos_tpu.circuit import batch_create_user as bcu
    from tests import test_batch_circuit as tb

    saved = (C.ASSET_COUNTS, C.TIER_COUNT, C.ACCOUNT_TREE_DEPTH,
             os.environ.get("ZKPOR_TEST_TIERS"))
    C.configure(asset_counts=4, tier_count=2, tree_depth=8)
    os.environ["ZKPOR_TEST_TIERS"] = "3:2"
    try:
        from zkpos_tpu.witness import core as wcore
        cex = tb.make_cex_assets()
        accounts = tb.make_accounts(cex)
        by_tier, capacity = wcore.prepare_accounts({3: accounts})
        tree = wcore.build_account_tree(by_tier, capacity)
        wits = list(wcore.generate_batch_witnesses(tree, by_tier, cex))
        _, wit = wits[0]
        wcore.densify_ops_assets(wit)
        w = bcu.set_batch_create_user_circuit_witness(wit)

        shape = bcu.new_empty_assignment(3, C.ASSET_COUNTS, 2)
        compile_cs = ConstraintSystem(solve=False)
        bcu.define(compile_cs, shape)
        prog = sn.record_program(compile_cs)
        key = _fake_key(len(prog.commit_wires))

        inputs = bcu.input_vector(w)
        solved = sn.solve(compile_cs, inputs, key)

        py = ConstraintSystem(solve=True)
        bcu.define(py, w)
        py.set_commitment_key(dict(key))
        assert py.is_satisfied()
        assert py.num_vars == solved.num_vars
        assert _values_of(solved) == py.values
    finally:
        C.configure(*saved[:3])
        if saved[3] is None:
            os.environ.pop("ZKPOR_TEST_TIERS", None)
        else:
            os.environ["ZKPOR_TEST_TIERS"] = saved[3]
