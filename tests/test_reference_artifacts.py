"""Single-event TrackML allclose vs actual reference artifacts.

Runs only when a reference baseline run exists at /tmp/ref_baseline (see
BASELINE.md for how to produce it); tools/validate_vs_reference.py is the
standalone reporter.
"""

import os
import subprocess
import sys

import pytest

REF = "/tmp/ref_baseline/src/output/track_sim/network"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference baseline artifacts not present")
def test_states_match_reference_artifacts():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "tools/validate_vs_reference.py"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=900).stdout
    assert "[seed]" in out, out

    def pct(line, field):
        seg = line.split(field)[1]
        return float(seg.split("(")[1].split("%")[0])

    seed_line = [l for l in out.splitlines() if l.startswith("[seed]")][0]
    assert pct(seed_line, "state allclose") == 100.0, seed_line
    assert pct(seed_line, "cov allclose") > 95.0, seed_line
    clus = [l for l in out.splitlines() if l.startswith("[cluster1]")]
    if clus:
        assert pct(clus[0], "merged-flag match") == 100.0, clus[0]
        assert pct(clus[0], "values allclose") > 85.0, clus[0]
