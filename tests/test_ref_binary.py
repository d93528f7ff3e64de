"""Golden parity vs the ACTUAL reference binary (PARITY.md
"reference-binary parity").  Skipped unless the binary has been built
(scripts/ref_build/build_reference.sh); the driver image builds it
once and the full 500-read sweep lives in scripts/ref_parity.py."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, "scripts", "ref_build", "build",
                       "hmmufotu")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN),
    reason="reference binary not built "
           "(scripts/ref_build/build_reference.sh)")


def _run_parity(tmp_path, n):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_JAX_PLATFORMS_PINNED", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_parity.py"),
         "-n", str(n), "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    stats = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    return {s["tag"]: s for s in stats}


def test_parity_sweep_small(tmp_path):
    st = _run_parity(tmp_path, 40)
    pe = st["gtr_dg4_pe+refrank"]
    # the PE config isolates ranking (no rand()-seed aln variance):
    # byte-identical alignments and categories
    assert pe["aln_mismatch"] == 0
    assert pe["branch_mismatch"] == 0
    assert pe["taxon_mismatch"] == 0
    se = st["jc69_se+refrank"]
    # SE admits rand()-stream seed-pick differences; bound the rate
    assert se["branch_mismatch"] <= 0.05 * se["n"]
    jp = st.get("jplace")
    if jp:
        assert jp["edge_mismatch"] == 0
