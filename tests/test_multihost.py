"""Multi-HOST (multi-process jax.distributed) tests.

Two local CPU processes form a real distributed runtime (Gloo
collectives over localhost): reads host-sharded, per-process TSV rows
gathered to process 0 in order, per-taxon counts psum-merged across
every device of both hosts.  The 2-process output must reproduce the
single-process TSV data rows byte-for-byte (the FM-index occurrence
pick is deterministic without -S).

SURVEY §5 distributed backend; BASELINE north star config #5.
"""

import os
import socket
import subprocess
import sys

import pytest

from conftest import REPO_ROOT, scrubbed_cpu_env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_procs(codes: list[str], n_local_devices: int = 2,
               timeout: int = 420) -> list[subprocess.CompletedProcess]:
    env = scrubbed_cpu_env(n_local_devices)
    procs = [subprocess.Popen(
        [sys.executable, "-c", code], env=env, cwd=REPO_ROOT,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for code in codes]
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append(subprocess.CompletedProcess(
            p.args, p.returncode, stdout, stderr))
    return results


@pytest.fixture(scope="module")
def fixture_db(tmp_path_factory):
    """Build one DB + simulated reads for the module."""
    tmp = tmp_path_factory.mktemp("mh")
    db = str(tmp / "db")
    code = f"""
from hmmufotu_tpu.cli.build import main as build_main
from hmmufotu_tpu.cli.sim import main as sim_main
assert build_main(["tests/fixtures/70_otus.fasta",
                   "tests/fixtures/70_otus.tree",
                   "-a", "tests/fixtures/70_otus_taxonomy.txt",
                   "-n", r"{db}", "-s", "JC69"]) == 0
assert sim_main([r"{db}", r"{tmp}/r.fasta", "-N", "24", "-S", "0",
                 "--mean-size", "250", "--sd-size", "10"]) == 0
print("DB_OK")
"""
    res = subprocess.run([sys.executable, "-c", code],
                         env=scrubbed_cpu_env(2), cwd=REPO_ROOT,
                         capture_output=True, text=True, timeout=420)
    assert "DB_OK" in res.stdout, res.stderr
    return db, str(tmp / "r.fasta"), tmp


def _data_rows(path):
    return [ln for ln in open(path)
            if not ln.startswith("#") and not ln.startswith("id\t")]


def test_two_process_assign_matches_single(fixture_db):
    """assign --num-processes 2 reproduces the single-process TSV data
    rows byte-for-byte, via host sharding + ordered gather."""
    db, reads, tmp = fixture_db
    single = str(tmp / "single.tsv")
    res = subprocess.run(
        [sys.executable, "-m", "hmmufotu_tpu.cli.assign", db, reads,
         "-o", single], env=scrubbed_cpu_env(2), cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr

    port = _free_port()
    multi = str(tmp / "multi.tsv")
    codes = [f"""
import sys
from hmmufotu_tpu.cli.assign import main
sys.exit(main([r"{db}", r"{reads}", "-o", r"{multi}",
               "--coordinator", "localhost:{port}",
               "--num-processes", "2", "--process-id", "{pid}"]))
""" for pid in (0, 1)]
    results = _run_procs(codes)
    for r in results:
        assert r.returncode == 0, r.stderr

    srows, mrows = _data_rows(single), _data_rows(multi)
    assert len(srows) == len(mrows) == 24
    assert srows == mrows      # byte-for-byte, in original read order


def test_two_process_paired_end_matches_single(fixture_db):
    """Paired-end assign across 2 processes reproduces the
    single-process TSV rows (fwd/rev shards stay aligned)."""
    db, reads, tmp = fixture_db
    mates = str(tmp / "r2.fasta")
    code = f"""
from hmmufotu_tpu.cli.sim import main as sim_main
assert sim_main([r"{db}", r"{tmp}/rpe.fasta", "-m", r"{mates}",
                 "-N", "16", "-S", "5",
                 "--mean-size", "400", "--sd-size", "10"]) == 0
print("PE_OK")
"""
    res = subprocess.run([sys.executable, "-c", code],
                         env=scrubbed_cpu_env(2), cwd=REPO_ROOT,
                         capture_output=True, text=True, timeout=420)
    assert "PE_OK" in res.stdout, res.stderr
    fwd = str(tmp / "rpe.fasta")

    single = str(tmp / "single_pe.tsv")
    res = subprocess.run(
        [sys.executable, "-m", "hmmufotu_tpu.cli.assign", db, fwd,
         mates, "-o", single], env=scrubbed_cpu_env(2), cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr

    port = _free_port()
    multi = str(tmp / "multi_pe.tsv")
    codes = [f"""
import sys
from hmmufotu_tpu.parallel import distributed
from hmmufotu_tpu.cli.assign import main
# tiny gather chunk: force the multi-round chunked merge path
_orig = distributed.gather_host_text
distributed.gather_host_text = \
    lambda text: _orig(text, chunk_bytes=256)
sys.exit(main([r"{db}", r"{fwd}", r"{mates}", "-o", r"{multi}",
               "--coordinator", "localhost:{port}",
               "--num-processes", "2", "--process-id", "{pid}"]))
""" for pid in (0, 1)]
    results = _run_procs(codes)
    for r in results:
        assert r.returncode == 0, r.stderr

    srows, mrows = _data_rows(single), _data_rows(multi)
    assert len(srows) == len(mrows) == 16
    assert srows == mrows


def test_multihost_otu_psum(fixture_db):
    """Global per-taxon psum across 2 processes x 2 local devices
    equals the serial bincount of the concatenated shards."""
    port = _free_port()
    codes = [f"""
import numpy as np, jax
jax.distributed.initialize("localhost:{port}", num_processes=2,
                           process_id={pid})
from hmmufotu_tpu.parallel.distributed import (host_shard,
                                               multihost_otu_psum)
rng = np.random.default_rng(3)
ids = rng.integers(0, 11, size=101)       # same global list everywhere
local = np.asarray(host_shard(list(ids)))
total = multihost_otu_psum(local, 11)
want = np.bincount(ids, minlength=11)
assert (total == want).all(), (total, want)
print("PSUM_OK")
""" for pid in (0, 1)]
    results = _run_procs(codes, timeout=240)
    for r in results:
        assert r.returncode == 0, r.stderr
        assert "PSUM_OK" in r.stdout
