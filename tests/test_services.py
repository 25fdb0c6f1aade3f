"""Service-level tests.

* witness service end-to-end over the reference sample CSVs (tiny tiers),
  userproof rows verify against the published root;
* dbtool flag behaviors;
* mock-prover concurrency: many workers race the queue + transactional
  claim — the port of reference TestMockProver (prover_test.go:23-194),
  which is how multi-node claiming is tested without a cluster.
"""
import json
import os
import threading

import pytest

from zkpos_tpu.utils import constants as C


@pytest.fixture(scope="module", autouse=True)
def _sizes():
    saved = (C.ASSET_COUNTS, C.TIER_COUNT, C.ACCOUNT_TREE_DEPTH,
             os.environ.get("ZKPOR_TEST_TIERS"))
    C.configure(asset_counts=4, tier_count=12, tree_depth=12)
    os.environ["ZKPOR_TEST_TIERS"] = "4:8"
    yield
    C.configure(*saved[:3])
    if saved[3] is None:
        os.environ.pop("ZKPOR_TEST_TIERS", None)
    else:
        os.environ["ZKPOR_TEST_TIERS"] = saved[3]

from zkpos_tpu.services.config import ServiceConfig
from zkpos_tpu.services.witness import WitnessService
from zkpos_tpu.services.dbtool import DbTool
from zkpos_tpu.services.verifier import verify_user
from zkpos_tpu.db.storage import (STATUS_FINISHED, STATUS_PUBLISHED,
                                  STATUS_RECEIVED, BatchWitnessRow)

SAMPLEDIR = "/root/reference/src/sampledata"


@pytest.fixture(scope="module")
def witness_run(tmp_path_factory):
    cfg = ServiceConfig(
        db_path=str(tmp_path_factory.mktemp("db") / "zkpos.db"),
        user_data_file=SAMPLEDIR)
    svc = WitnessService(cfg)
    accounts, cex_assets = {}, None
    # sample data has invalid accounts by design: filter them like the
    # integration harness does (parse leniently)
    from zkpos_tpu.utils import csv_ingest
    accounts, cex_assets, invalid = csv_ingest.parse_user_data_set(SAMPLEDIR)
    assert invalid == 30
    svc.prepare(accounts, cex_assets)
    n_wit = svc.run_witness()
    n_proofs = svc.run_userproof()
    return cfg, svc, n_wit, n_proofs


def test_witness_counts(witness_run):
    cfg, svc, n_wit, n_proofs = witness_run
    # 170 valid accounts in the 4-asset tier, batch 8 -> pad to 176 -> 22
    assert n_wit == 22
    assert n_proofs == 176


def test_witness_resume_noop(witness_run):
    cfg, svc, _, _ = witness_run
    # re-running generates nothing new (resume semantics)
    assert svc.run_witness() == 0
    assert svc.run_userproof() == 0


def test_userproof_verifies(witness_run):
    cfg, svc, _, _ = witness_run
    tool = DbTool(cfg)
    for idx in (0, 7, 100, 175):
        config = tool.query_account_data(idx)
        assert config["AccountIndex"] == idx
        assert verify_user(config), f"user proof {idx} failed"
    # tampered totals must fail
    config = tool.query_account_data(3)
    config["TotalEquity"] += 1
    assert not verify_user(config)


def test_dbtool_status_and_queue(witness_run):
    cfg, svc, n_wit, _ = witness_run
    tool = DbTool(cfg)
    counts = tool.check_prover_status()
    assert counts["published"] == n_wit
    assert tool.push_task_to_redis() == n_wit
    assert tool.queue.llen() == n_wit
    tool.queue.flush()


def test_query_witness_and_cex(witness_run):
    cfg, svc, _, _ = witness_run
    tool = DbTool(cfg)
    wit = tool.query_witness_data(0)
    assert wit.min_account_index == 0
    assert len(wit.create_user_ops) == 8
    cex = tool.query_cex_assets()
    assert len(cex) == C.ASSET_COUNTS
    assert cex[0]["TotalEquity"] > 0


def test_mock_prover_concurrency(tmp_path):
    """128 goroutines -> threads racing BRPOP + claim (prover_test.go)."""
    from zkpos_tpu.db.storage import Database, WitnessModel
    from zkpos_tpu.db.queue import TaskQueue
    n_rows, n_workers = 200, 16
    db_path = str(tmp_path / "race.db")
    db = Database(db_path)
    wm = WitnessModel(db, "_race")
    wm.create_table()
    wm.create_batch_witness([
        BatchWitnessRow(height=i, witness_data="x", status=STATUS_PUBLISHED)
        for i in range(n_rows)])
    q = TaskQueue(db, "_race")
    q.lpush(*range(n_rows))

    claimed = []
    lock = threading.Lock()

    def worker():
        mydb = Database(db_path)
        mywm = WitnessModel(mydb, "_race")
        myq = TaskQueue(mydb, "_race")
        while True:
            v = myq.brpop(timeout=0.5)
            if v is None:
                return
            row = mywm.claim_witness_by_height(int(v))
            if row is not None:
                mywm.update_status(int(v), STATUS_FINISHED)
                with lock:
                    claimed.append(int(v))

    threads = [threading.Thread(target=worker) for _ in range(n_workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(claimed) == list(range(n_rows))
    assert wm.count_by_status(STATUS_FINISHED) == n_rows
    assert wm.count_by_status(STATUS_PUBLISHED) == 0
