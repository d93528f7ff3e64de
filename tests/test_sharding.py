"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Runs in a subprocess with a scrubbed environment (the axon TPU hook
pins the platform in-process; see conftest.cpu_mesh_runner).
"""


def test_dryrun_multichip(cpu_mesh_runner):
    res = cpu_mesh_runner(
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('MULTICHIP_OK')")
    assert "MULTICHIP_OK" in res.stdout, res.stderr


def test_entry_compiles(cpu_mesh_runner):
    res = cpu_mesh_runner(
        "import __graft_entry__ as g, jax; fn, args = g.entry(); "
        "out = jax.jit(fn)(*args); "
        "print('ENTRY_OK', [o.shape for o in out])")
    assert "ENTRY_OK" in res.stdout, res.stderr


def test_sharded_otu_counts_match_serial(cpu_mesh_runner):
    code = """
import numpy as np, jax, jax.numpy as jnp
from hmmufotu_tpu.parallel import make_mesh, sharded_otu_accumulate
mesh = make_mesh(8)
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, 7, size=64), jnp.int32)
counts = np.asarray(sharded_otu_accumulate(mesh, ids, 7))
want = np.bincount(np.asarray(ids), minlength=7)
assert (counts == want).all(), (counts, want)
print('OTU_PSUM_OK')
"""
    res = cpu_mesh_runner(code)
    assert "OTU_PSUM_OK" in res.stdout, res.stderr
