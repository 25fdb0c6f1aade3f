"""Sample data generator (utils/sample_data.py) — round-trips through our
CSV ingest with the designed valid/invalid split (reference
generate_user_files.py semantics)."""

import os
import tempfile

from zkpos_tpu.utils import csv_ingest
from zkpos_tpu.utils.sample_data import generate_file

CEX = os.path.join(os.path.dirname(__file__), "..", "..", "reference",
                   "src", "sampledata", "cex_assets_info.csv")
CEX = os.path.normpath(CEX)
import pytest

pytestmark = pytest.mark.skipif(not os.path.exists(CEX),
                                reason="reference fixture unavailable")


def test_generator_split_round_trip():
    with tempfile.TemporaryDirectory() as d:
        p = generate_file(0, 30, 6, CEX, d, seed=11)
        idx = csv_ingest.parse_asset_index_from_user_file(p)
        cex = csv_ingest.parse_cex_asset_info_from_file(CEX, idx)
        buckets, invalid = csv_ingest.read_user_data_from_csv_file(p, cex)
        assert invalid == 6
        assert sum(len(v) for v in buckets.values()) == 24


def test_generator_deterministic_by_seed():
    with tempfile.TemporaryDirectory() as d:
        p1 = generate_file(1, 8, 2, CEX, d, seed=3)
        data1 = open(p1).read()
        p2 = generate_file(1, 8, 2, CEX, d, seed=3)
        assert open(p2).read() == data1
