"""Multi-host execution: loci shard across hosts, chips shard within.

The workload is embarrassingly parallel at the locus level (the reference's
outermost loop, genotype.rs:1278-1298), so the multi-host design keeps ALL
cross-host traffic off the critical path:

* within a host: the {read × gt} device mesh (parallel/mesh.py) shards
  alignment and solving over the local chips via ICI collectives;
* across hosts: loci partition round-robin by process index — no DCN
  collectives at all.  Each process writes its own per-locus outputs into
  the shared output directory (distinct subdirectories + success files, so
  results merge trivially and reruns resume per locus).

`maybe_init_distributed` wires `jax.distributed` from the standard
environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID, or any scheduler auto-detected by jax.distributed);
single-process runs are untouched.
"""
from __future__ import annotations

import os

from ..utils.logging import get_logger

logger = get_logger("multihost")

_initialized = False


def maybe_init_distributed() -> bool:
    """Initializes jax.distributed when a coordinator is configured in the
    environment; returns True when running multi-process."""
    global _initialized
    import jax

    if not _initialized and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        _initialized = True
        logger.info("jax.distributed: process %d/%d, %d local / %d global "
                    "devices", jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def shard_loci(names: list) -> list:
    """This process's share of the loci (round-robin by process index).
    Identity in single-process runs."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return list(names)
    i = jax.process_index()
    mine = list(names[i::n])
    logger.info("Host %d/%d takes %d/%d loci", i, n, len(mine), len(names))
    return mine
