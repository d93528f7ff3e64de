"""Multi-host (multi-process) execution helpers.

BASELINE config #5: N>=2 hosts, reads sharded per host, OTU tables
merged with collectives.  Single-host multi-chip runs need none of
this (shard_map over the local mesh suffices — sharding.py); across
hosts, initialize the jax distributed runtime first and give every
process its slice of the input.

Used by `assign --num-processes N --process-id I --coordinator H:P`
(cli/assign.py): each process aligns+places its contiguous read shard,
then the TSV rows are gathered to process 0 in process order —
reproducing the single-process output rows byte-for-byte (the FM-index
occurrence pick is deterministic without -S).  Exercised for real by
tests/test_multihost.py on two local CPU processes over Gloo.
"""

from __future__ import annotations

import logging

import jax
import numpy as np

log = logging.getLogger(__name__)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize jax.distributed (no-op if single-process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  After this, jax.devices() spans
    every chip of every host and a Mesh over them lets shard_map ride
    ICI/DCN collectives.
    """
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(coordinator, num_processes,
                                   process_id)
        log.info("distributed: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.device_count())
    except (RuntimeError, ValueError) as e:
        log.warning("jax.distributed.initialize failed (%s); "
                    "continuing single-process", e)


def host_bounds(n_items: int, process_id: int | None = None,
                num_processes: int | None = None) -> tuple[int, int]:
    """[lo, hi) bounds of this host's contiguous slice of a global
    work list."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = (n_items + n - 1) // n
    return pid * per, min((pid + 1) * per, n_items)


def host_shard(items: list, process_id: int | None = None,
               num_processes: int | None = None) -> list:
    """This host's contiguous slice of a global work list (reads or
    sample files) — the cross-host analog of the read-batch sharding
    inside one host."""
    lo, hi = host_bounds(len(items), process_id, num_processes)
    return items[lo:hi]


def gather_host_text(text: str,
                     chunk_bytes: int = 64 << 20) -> list[str]:
    """Gather one text blob per process to PROCESS 0 in process order
    (the ordered-output merge: every process calls this; process 0
    concatenates and writes; other processes receive []).

    Chunked: the underlying primitive is an allgather (Gloo on CPU,
    DCN on pods), so each round moves num_processes x chunk_bytes —
    peak memory is bounded by the chunk size, not by the largest
    process output (round-3 review: a whole-blob allgather was
    unbounded at the 100M-read config #5 this serves), and non-zero
    processes drop each round's result immediately."""
    from jax.experimental import multihost_utils
    blob = text.encode()
    lens = multihost_utils.process_allgather(
        np.array([len(blob)], np.int64))[:, 0]
    n_proc = len(lens)
    chunk_bytes = min(chunk_bytes, max(int(lens.max()), 1))
    rounds = max(1, -(-int(lens.max()) // chunk_bytes))
    is_zero = jax.process_index() == 0
    parts = [bytearray() for _ in range(n_proc)] if is_zero else None
    buf = np.zeros(chunk_bytes, np.uint8)
    for r in range(rounds):
        lo = r * chunk_bytes
        piece = blob[lo:lo + chunk_bytes]
        buf[:len(piece)] = np.frombuffer(piece, np.uint8)
        buf[len(piece):] = 0
        gathered = multihost_utils.process_allgather(buf)
        if is_zero:
            for p in range(n_proc):
                n = min(max(int(lens[p]) - lo, 0), chunk_bytes)
                if n:
                    parts[p] += bytes(gathered[p][:n])
        del gathered
    if not is_zero:
        return []
    return [bytes(p).decode() for p in parts]


def multihost_otu_psum(local_taxon_ids: np.ndarray,
                       n_taxa: int) -> np.ndarray:
    """Global per-taxon OTU count reduction across every device of
    every host: local counts are laid out one vector per local device,
    assembled into a global array sharded over a mesh spanning all
    hosts, and reduced by XLA's cross-host collective (the distributed
    form of OTUTable operator+=, reference OTUTable.cpp:211-240).

    Every process must call this (collective); all return the same
    replicated global count vector."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())          # global device list
    mesh = Mesh(devs, ("data",))
    nl = jax.local_device_count()
    ids = np.asarray(local_taxon_ids)
    counts = np.stack([
        np.bincount(ids[d::nl], minlength=n_taxa).astype(np.int32)
        for d in range(nl)])
    sharding = NamedSharding(mesh, P("data", None))
    garr = jax.make_array_from_process_local_data(sharding, counts)
    total = jax.jit(lambda c: jnp.sum(c, axis=0),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    return np.asarray(total)
