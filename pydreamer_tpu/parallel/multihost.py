"""Multi-host SPMD runtime: process group init + per-host data feeding.

On a TPU pod slice every host runs the same launch command; this module
wires them into one SPMD learner:

  * ``maybe_initialize_distributed()`` — calls ``jax.distributed.initialize``
    when a multi-host environment is detected (TPU metadata supplies
    coordinator/process_id automatically on Cloud TPU VMs; explicit env vars
    work anywhere)
  * each host runs its own generators + replay shard (the reference's
    decoupled actor/learner transport, SURVEY §5.8) and feeds the learner
    its LOCAL slice of the global batch; ``host_batch_to_global`` assembles
    the global sharded array with ``jax.make_array_from_process_local_data``
  * metrics/checkpointing are done by process 0 only (``is_main_process``)
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from ..tools import logger

__all__ = ["maybe_initialize_distributed", "is_main_process",
           "host_batch_to_global", "local_batch_size"]


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX process group when running multi-host.

    Detection: explicit JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES env
    vars, or Cloud TPU pod metadata (initialize() with no args). Returns
    True if distributed mode is active.
    """
    # NOTE: must run before anything touches a JAX backend —
    # jax.process_count()/jax.devices() initialize the platform, after which
    # jax.distributed.initialize() is an error. So the env sniffing comes
    # first, and process_count is only consulted as the no-env fallback.
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    already = jax._src.distributed.global_state.client is not None
    if coord and nproc:
        if not already:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        logger.info("Distributed: process %d/%d", jax.process_index(),
                    jax.process_count())
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        # Cloud TPU pod slice: metadata provides everything.
        if not already:
            jax.distributed.initialize()
        logger.info("Distributed (TPU metadata): process %d/%d",
                    jax.process_index(), jax.process_count())
        return True
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Per-host batch share; global B must divide evenly across hosts."""
    n = jax.process_count()
    assert global_batch % n == 0, \
        f"global batch {global_batch} not divisible by {n} hosts"
    return global_batch // n


def host_batch_to_global(batch: Dict[str, np.ndarray], sharding) -> Dict:
    """Assemble per-host (T, B_local, ...) numpy batches into global
    jax.Arrays sharded (None, 'data') over the mesh.

    Each host passes only its local shard; no host ever materializes the
    global batch (the pod-scale equivalent of the reference's per-worker
    DataLoader streams, SURVEY §2.15).
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
