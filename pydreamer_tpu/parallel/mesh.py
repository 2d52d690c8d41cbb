"""SPMD scale-out: device mesh + sharding rules for the learner.

This is the framework's *new* communication backend (SURVEY §5.8): the
reference has no collective library at all — its only parallelism is
actor/learner processes over an artifact store. On TPU pods the idiomatic
scale-out is one SPMD learner over a ``jax.sharding.Mesh``:

  * mesh axes ``('data', 'model')``
  * the batch axis (B) of every input is sharded over 'data'; TBTT state
    rides the same sharding so the carry never crosses devices
  * parameters are replicated by default; large Dense kernels (out-features
    >= ``tp_min_size`` and divisible) are sharded over 'model' — tensor
    parallelism for the wide decoder/actor/critic layers
  * gradients: XLA/GSPMD inserts the psum over 'data' (ICI) automatically
    from the sharding constraints — no hand-written collectives, per the
    scaling-book recipe (annotate shardings, let XLA insert collectives)

Multi-host: the same code runs under ``jax.distributed.initialize``; each
host feeds its local shard via ``jax.make_array_from_process_local_data``
(see ``DistributedContext.shard_host_batch``), keeping the reference's
per-host actor/replay decoupling.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tools import logger

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "state_sharding",
           "replicated", "DistributedContext"]


def make_mesh(n_data: int = 0, n_model: int = 1, devices=None) -> Mesh:
    """Mesh over ('data','model'). n_data=0 => use all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_model <= 0:
        n_model = 1
    if n_data <= 0:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, \
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {n_total}"
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(T, B, ...) inputs: shard B over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def state_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) TBTT state: shard axis 0 over 'data'."""
    return NamedSharding(mesh, P("data"))


def param_shardings(params: Any, mesh: Mesh, tp_min_size: int = 1024) -> Any:
    """Per-leaf sharding: replicate small params, shard big kernels over 'model'.

    A Dense kernel (in, out) with out % n_model == 0 and out >= tp_min_size is
    column-sharded P(None, 'model') — its matmul becomes a local GEMM per
    shard and XLA all-gathers activations only where a consumer needs them.
    With mesh_model == 1 everything is replicated (pure DP).
    """
    n_model = mesh.shape["model"]

    def rule(x) -> NamedSharding:
        if (n_model > 1 and hasattr(x, "ndim") and x.ndim == 2
                and x.shape[-1] >= tp_min_size and x.shape[-1] % n_model == 0):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


class DistributedContext:
    """Puts params / optimizer state / batches on the mesh for the train step.

    GSPMD then partitions the jitted step: forward/backward data-parallel
    over 'data' with an automatic gradient psum, TP layers sharded over
    'model'. The trainer uses this transparently whenever >1 device is
    visible.
    """

    def __init__(self, conf, devices=None):
        self.mesh = make_mesh(conf.get("mesh_data", 0), conf.get("mesh_model", 1),
                              devices)
        logger.info("Mesh: %s over %d devices", dict(self.mesh.shape),
                    self.mesh.devices.size)
        self.tp_min_size = conf.get("tp_min_size", 1024)

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    def place_params(self, params):
        return jax.device_put(params, param_shardings(params, self.mesh,
                                                      self.tp_min_size))

    def place_opt_state(self, opt_state, params):
        # Optimizer moments mirror the param shardings where shapes match.
        pshard = param_shardings(params, self.mesh, self.tp_min_size)
        rep = replicated(self.mesh)
        shard_by_shape: Dict[tuple, NamedSharding] = {}
        for l, s in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(pshard)):
            shard_by_shape.setdefault(tuple(l.shape), s)

        def rule(x):
            if hasattr(x, "shape"):
                return jax.device_put(x, shard_by_shape.get(tuple(x.shape), rep))
            return x

        return jax.tree_util.tree_map(rule, opt_state)

    def place_batch(self, batch):
        bs = batch_sharding(self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, bs), batch)

    def place_state(self, state):
        ss = state_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, ss), state)

    def batch_transform(self):
        """Transform for prefetch_iterator: shard (batch, wid) tuples."""
        bs = batch_sharding(self.mesh)

        def tf(item):
            batch, wid = item
            batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
            return batch, wid
        return tf

    def shard_host_batch(self, global_shape, local_batch):
        """Multi-host: assemble a global array from this host's local shard."""
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding(self.mesh), x), local_batch)
