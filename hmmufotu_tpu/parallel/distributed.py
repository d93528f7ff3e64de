"""Multi-host (multi-process) execution helpers.

BASELINE config #5: N>=2 hosts, reads sharded per host, OTU tables
merged with collectives.  Single-host multi-chip runs need none of
this (shard_map over the local mesh suffices — sharding.py); across
hosts, initialize the jax distributed runtime first and give every
process its slice of the input.
"""

from __future__ import annotations

import logging

import jax

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


def host_shard(items: list, process_id: int | None = None,
               num_processes: int | None = None) -> list:
    """This host's contiguous slice of a global work list (reads or
    sample files) — the cross-host analog of the read-batch sharding
    inside one host."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = (len(items) + n - 1) // n
    return items[pid * per:(pid + 1) * per]
