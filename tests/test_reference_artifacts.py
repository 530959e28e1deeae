"""Hermetic single-event TrackML allclose vs reference artifacts.

The reference side is tests/data/ref_digest.npz — a committed distillation
(tools/make_ref_digest.py) of an actual reference-pipeline run's pickled
outputs (state dicts per `src/utilities/helper.py:432-450`, updated states
per `extrapolate_merged_states.py:441-447`, and the extraction
coordinate-mutation leak). This test therefore runs on a wiped machine with
no /tmp baseline; to re-derive the digest from scratch:
  python tools/make_ref_baseline.py --run   (~3 min)
  python tools/make_ref_digest.py
tools/validate_vs_reference.py is the standalone reporter (live or digest).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools import validate_vs_reference as vvr  # noqa: E402


@pytest.fixture(scope="module")
def parity():
    assert os.path.exists(vvr.DIGEST_PATH), (
        "committed digest missing — regenerate with tools/make_ref_digest.py")
    digest = vvr.load_digest()
    return vvr.compare(digest, vvr.compute_framework_states(), log=lambda *a: None)


def test_seed_states_match_reference(parity):
    assert parity["seed_cmp"] == 14766
    assert parity["seed_sv"] == 1.0
    assert parity["seed_cov"] == 1.0


def test_extraction_coordinate_leak_matches_reference(parity):
    assert parity["leak"] == 1.0


def test_merged_states_match_reference(parity):
    assert parity["clus_cmp"] == 8748
    assert parity["clus_flag"] == 1.0
    assert parity["clus_val"] == 1.0


def test_updated_states_match_reference(parity):
    assert parity["upd_cmp"] == 434
    assert parity["upd_flag"] == 1.0
    assert parity["upd_val"] == 1.0
    assert parity["upd_joint"] == 1.0
