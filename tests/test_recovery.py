"""Crash-recovery test — the analog of reference
scripts/witness_recovery_test.sh: SIGKILL the witness service mid-run,
restart, assert exact final row counts and CEX-state continuity.

Runs the service in a subprocess so the kill is a real process death.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {repo!r} + "/.jax_cache")
from zkpos_tpu.utils import constants as C
C.configure(asset_counts=4, tier_count=2, tree_depth=8)
os.environ["ZKPOR_TEST_TIERS"] = "3:2"
from zkpos_tpu.services.config import ServiceConfig
from zkpos_tpu.services.witness import WitnessService
from tests.test_batch_circuit import make_accounts, make_cex_assets

cfg = ServiceConfig(db_path={db!r})
svc = WitnessService(cfg)
cex = make_cex_assets()
accounts = make_accounts(cex) * 8        # 24 accounts -> 12 batches
for i, a in enumerate(accounts):
    a.account_id = b""
svc.prepare({{3: accounts}}, cex)
svc.run_witness(batch_flush={flush})
open({marker!r}, "w").close()
"""


@pytest.mark.slow
def test_witness_kill_and_resume(tmp_path):
    db = str(tmp_path / "zkpos.db")
    marker = str(tmp_path / "done")

    def spawn(flush):
        code = WORKER.format(repo=REPO, db=db, flush=flush, marker=marker)
        return subprocess.Popen([sys.executable, "-c", code],
                                cwd=REPO, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT)

    # first run: small flush so rows appear early; kill as soon as some rows land
    p = spawn(flush=2)
    import sqlite3
    deadline = time.time() + 600
    rows = 0
    while time.time() < deadline:
        try:
            con = sqlite3.connect(db)
            rows = con.execute("SELECT COUNT(*) FROM witness").fetchone()[0]
            con.close()
        except Exception:
            rows = 0
        if rows >= 2:
            break
        if p.poll() is not None:
            break
        time.sleep(0.5)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        assert not os.path.exists(marker), "killed too late to test recovery"
    assert rows >= 2, "no rows written before kill"

    # restart: must resume from the stored height and finish with exactly 12
    p2 = spawn(flush=25)
    out, _ = p2.communicate(timeout=900)
    assert p2.returncode == 0, out.decode()[-2000:]
    assert os.path.exists(marker)
    con = sqlite3.connect(db)
    total = con.execute("SELECT COUNT(*) FROM witness").fetchone()[0]
    heights = [r[0] for r in con.execute(
        "SELECT height FROM witness ORDER BY height")]
    con.close()
    assert total == 12
    assert heights == list(range(12))
