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


def test_sharded_placement_matches_single(cpu_mesh_runner):
    """The shard_map'd SEP placement must agree with the single-device
    path on a real (fixture) tree."""
    code = """
import os, numpy as np, jax, jax.numpy as jnp
from hmmufotu_tpu.msa import MSA
from hmmufotu_tpu.phylo import PTUnrooted, parse_newick, JC69
from hmmufotu_tpu.phylo.placement import DevicePlacer
from hmmufotu_tpu.parallel import make_mesh, sharded_place_batch
FIX = os.path.join("tests", "fixtures")
msa = MSA.load_fasta(os.path.join(FIX, "70_otus.fasta")).prune()
tree = PTUnrooted.from_newick(parse_newick(open(os.path.join(FIX, "70_otus.tree")).read()))
tree.load_msa(msa); tree.fix_branch_length(1e-5); tree.calc_node_height()
tree.load_annotation(os.path.join(FIX, "70_otus_taxonomy.txt"))
tree.format_name(); tree.annotate()
tree.model = JC69(); tree.evaluate(); tree.infer_seq()
rng = np.random.default_rng(0)
leaves = [u for u in range(tree.num_nodes) if tree.is_leaf(u) and tree.msa_id[u] >= 0]
B = 16
seqs = np.full((B, tree.cs_len), -2, np.int8)
starts = np.zeros(B, np.int32); ends = np.zeros(B, np.int32)
for r in range(B):
    u = int(rng.choice(leaves)); codes = tree.seqs[u]
    pos = np.nonzero(codes >= 0)[0]
    st = int(rng.integers(0, max(1, len(pos)-210)))
    w = pos[st:st+200]
    seqs[r, w] = codes[w]; starts[r], ends[r] = w[0], w[-1]
placer = DevicePlacer(tree, window=256, max_nseed=32)
single = placer.place_batch(seqs, starts, ends, summary_only=True)["summary"]
mesh = make_mesh(8)
sharded = np.asarray(sharded_place_batch(mesh, placer, seqs, starts, ends))
assert (single[:, 0] == sharded[:, 0]).all(), (single[:, 0], sharded[:, 0])
np.testing.assert_allclose(single[:, 5], sharded[:, 5], rtol=1e-5)
print('SHARDED_PLACE_OK')
"""
    res = cpu_mesh_runner(code)
    assert "SHARDED_PLACE_OK" in res.stdout, res.stderr


def test_tree_model_parallel_matches_single(cpu_mesh_runner):
    """Tree-MODEL-parallel placement (message tensors sharded in node
    blocks over the mesh) + exact host merge must reproduce the
    single-device placement decision per read."""
    code = """
import os, numpy as np, jax, jax.numpy as jnp
from hmmufotu_tpu.msa import MSA
from hmmufotu_tpu.phylo import PTUnrooted, parse_newick, JC69
from hmmufotu_tpu.phylo.placement import DevicePlacer
from hmmufotu_tpu.parallel import make_mesh
from hmmufotu_tpu.parallel.sharding import sharded_place_batch_tree
from hmmufotu_tpu import pipeline as pl
FIX = os.path.join("tests", "fixtures")
msa = MSA.load_fasta(os.path.join(FIX, "70_otus.fasta")).prune()
tree = PTUnrooted.from_newick(parse_newick(open(os.path.join(FIX, "70_otus.tree")).read()))
tree.load_msa(msa); tree.fix_branch_length(1e-5); tree.calc_node_height()
tree.load_annotation(os.path.join(FIX, "70_otus_taxonomy.txt"))
tree.format_name(); tree.annotate()
tree.model = JC69(); tree.evaluate(); tree.infer_seq()
rng = np.random.default_rng(5)
leaves = [u for u in range(tree.num_nodes) if tree.is_leaf(u) and tree.msa_id[u] >= 0]
B = 16
seqs = np.full((B, tree.cs_len), -2, np.int8)
starts = np.zeros(B, np.int32); ends = np.zeros(B, np.int32)
for r in range(B):
    u = int(rng.choice(leaves)); codes = tree.seqs[u]
    pos = np.nonzero(codes >= 0)[0]
    st = int(rng.integers(0, max(1, len(pos)-210)))
    w = pos[st:st+200]
    piece = codes[w].copy()
    mut = rng.random(len(piece)) < 0.03
    piece[mut] = rng.integers(0, 4, int(mut.sum()))
    seqs[r, w] = piece; starts[r], ends[r] = w[0], w[-1]
placer = DevicePlacer(tree, window=256, max_nseed=24)
single = placer.place_batch(seqs, starts, ends, summary_only=True)["summary"]
mesh = make_mesh(8)
union = sharded_place_batch_tree(mesh, placer, seqs, starts, ends)
assert union["cand"].shape == (B, 24 * 8)
merged = pl.merge_mp_candidates(tree, union, np.ones(B, bool), starts,
                                ends, C=24)
for r in range(B):
    p = merged[r]
    assert p is not None
    assert p.c_node == int(single[r, 0]), (r, p.c_node, single[r, 0])
    assert p.a_node == int(single[r, 2])
    np.testing.assert_allclose(p.loglik, single[r, 5], rtol=1e-5)
    np.testing.assert_allclose(p.q_place, single[r, 6], atol=0.05)
    np.testing.assert_allclose(p.q_taxon, single[r, 7], atol=0.05)
print('TREE_MP_OK')
"""
    res = cpu_mesh_runner(code, timeout=500)
    assert "TREE_MP_OK" in res.stdout, res.stderr


def test_assign_cli_mesh(cpu_mesh_runner, tmp_path):
    """assign --mesh end-to-end on the 8-device CPU mesh."""
    code = f"""
import os
os.makedirs("{tmp_path}", exist_ok=True)
from hmmufotu_tpu.cli.build import main as build_main
from hmmufotu_tpu.cli.sim import main as sim_main
from hmmufotu_tpu.cli.assign import main as assign_main
db = "{tmp_path}/db"
assert build_main(["tests/fixtures/70_otus.fasta",
                   "tests/fixtures/70_otus.tree",
                   "-a", "tests/fixtures/70_otus_taxonomy.txt",
                   "-n", db, "-s", "JC69"]) == 0
assert sim_main([db, "{tmp_path}/r.fasta", "-N", "12", "-S", "0",
                 "--mean-size", "250", "--sd-size", "10"]) == 0
assert assign_main([db, "{tmp_path}/r.fasta",
                    "-o", "{tmp_path}/a.tsv", "-S", "0",
                    "--mesh"]) == 0
rows = [l for l in open("{tmp_path}/a.tsv")
        if not l.startswith('#') and not l.startswith('id\\t')]
assert len(rows) == 12
assigned = sum(1 for l in rows if l.split('\\t')[10] != 'NULL')
assert assigned >= 10, assigned
print('MESH_ASSIGN_OK')
"""
    res = cpu_mesh_runner(code, timeout=400)
    assert "MESH_ASSIGN_OK" in res.stdout, res.stderr


def test_assign_cli_mesh_tree(cpu_mesh_runner, tmp_path):
    """assign --mesh-tree (message tensors sharded over the mesh)
    end-to-end, and its output rows match the single-device run."""
    code = f"""
import os
os.makedirs("{tmp_path}", exist_ok=True)
from hmmufotu_tpu.cli.build import main as build_main
from hmmufotu_tpu.cli.sim import main as sim_main
from hmmufotu_tpu.cli.assign import main as assign_main
db = "{tmp_path}/db"
assert build_main(["tests/fixtures/70_otus.fasta",
                   "tests/fixtures/70_otus.tree",
                   "-a", "tests/fixtures/70_otus_taxonomy.txt",
                   "-n", db, "-s", "JC69"]) == 0
assert sim_main([db, "{tmp_path}/r.fasta", "-N", "12", "-S", "1",
                 "--mean-size", "250", "--sd-size", "10"]) == 0
assert assign_main([db, "{tmp_path}/r.fasta",
                    "-o", "{tmp_path}/mt.tsv", "-S", "1",
                    "--mesh-tree"]) == 0
assert assign_main([db, "{tmp_path}/r.fasta",
                    "-o", "{tmp_path}/sd.tsv", "-S", "1"]) == 0
def rows(p):
    return [l for l in open(p)
            if not l.startswith('#') and not l.startswith('id\\t')]
mt, sd = rows("{tmp_path}/mt.tsv"), rows("{tmp_path}/sd.tsv")
assert len(mt) == len(sd) == 12
for a, b in zip(mt, sd):
    # same branch, taxon id and taxon name columns
    ca, cb = a.split('\\t'), b.split('\\t')
    assert ca[10] == cb[10] and ca[12] == cb[12] and ca[13] == cb[13], (ca, cb)
print('MESH_TREE_ASSIGN_OK')
"""
    res = cpu_mesh_runner(code, timeout=500)
    assert "MESH_TREE_ASSIGN_OK" in res.stdout, res.stderr


def test_tree_mp_capacity_shape(cpu_mesh_runner):
    """Tree-MP at a capacity-RELEVANT shape (VERDICT round-4 #7):
    ~20k nodes x 1k cols with the message tensors GENUINELY sharded in
    node blocks across the 8 virtual devices — per-shard bytes must be
    ~1/8 of the replicated footprint — and the merged placement must
    match single-device."""
    code = """
import os, sys, numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, os.path.join(os.getcwd(), "scripts"))
from scale_eval import synth_tree
from hmmufotu_tpu.phylo.models import create_model
from hmmufotu_tpu.phylo.placement import DevicePlacer
from hmmufotu_tpu.parallel import make_mesh
from hmmufotu_tpu.parallel.sharding import sharded_place_batch_tree
from hmmufotu_tpu import pipeline as pl

tree = synth_tree(10000, 1024, seed=6)     # 19,999 nodes
tree.model = create_model("JC69")
tree.anno = [f"k__K;g__g{u % 31}" for u in range(tree.num_nodes)]
tree.evaluate(dtype=np.float32, engine="jax", budget_bytes=1 << 30)
tree.infer_seq()
rng = np.random.default_rng(7)
leaves = np.nonzero(tree.has_seq)[0][:10000]
B = 8
seqs = np.full((B, tree.cs_len), -2, np.int8)
starts = np.zeros(B, np.int32); ends = np.zeros(B, np.int32)
for r in range(B):
    u = int(rng.choice(leaves)); codes = tree.seqs[u]
    pos = np.nonzero(codes >= 0)[0]
    st = int(rng.integers(0, max(1, len(pos)-210)))
    w = pos[st:st+200]
    piece = codes[w].copy()
    mut = rng.random(len(piece)) < 0.02
    piece[mut] = rng.integers(0, 4, int(mut.sum()))
    seqs[r, w] = piece; starts[r], ends[r] = w[0], w[-1]

placer = DevicePlacer(tree, window=256, max_nseed=16)
single = placer.place_batch(seqs, starts, ends, summary_only=True)["summary"]

mesh = make_mesh(8)
# the tensors really shard: per-device block = 1/8 of the padded total
N = tree.num_nodes
Np = (N + 7) // 8 * 8
mu = jnp.concatenate([placer.dt.msg_up,
                      jnp.zeros((Np - N,) + placer.dt.msg_up.shape[1:],
                                placer.dt.msg_up.dtype)])
mu_sh = jax.device_put(mu, NamedSharding(mesh, P(mesh.axis_names[0])))
shard_bytes = [s.data.nbytes for s in mu_sh.addressable_shards]
assert len(shard_bytes) == 8
assert all(b == mu.nbytes // 8 for b in shard_bytes), shard_bytes
per_shard_gb = shard_bytes[0] / 1e9
repl_gb = mu.nbytes / 1e9
assert per_shard_gb <= repl_gb / 7.9

union = sharded_place_batch_tree(mesh, placer, seqs, starts, ends)
merged = pl.merge_mp_candidates(tree, union, np.ones(B, bool), starts,
                                ends, C=16)
for r in range(B):
    p = merged[r]
    assert p is not None and p.c_node == int(single[r, 0]), (
        r, None if p is None else p.c_node, single[r, 0])
print("TREE_MP_CAPACITY_OK per-shard", round(per_shard_gb, 4), "GB of",
      round(repl_gb, 4), "GB replicated")
"""
    res = cpu_mesh_runner(code, timeout=900)
    assert "TREE_MP_CAPACITY_OK" in res.stdout, res.stderr[-3000:]
