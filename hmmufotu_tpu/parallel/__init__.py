"""Multi-chip data parallelism (mesh, sharded assignment step).

The reference has no distributed computing — parallelism is OpenMP
threads in one process (reference src/hmmufotu.cpp:603-610).  The
TPU-native scale-out replicates the DB per chip, shards read batches
over the data axis of a `jax.sharding.Mesh`, and merges OTU-table
accumulators with psum collectives.
"""

from .distributed import host_shard, init_distributed
from .sharding import (make_mesh, sharded_assign_step,
                       sharded_otu_accumulate, sharded_place_batch,
                       sharded_place_batch_tree)

__all__ = ["make_mesh", "sharded_assign_step", "sharded_otu_accumulate",
           "sharded_place_batch", "sharded_place_batch_tree",
           "init_distributed", "host_shard"]
