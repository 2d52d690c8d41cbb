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
host feeds its local (T, B_local, ...) shard via
``jax.make_array_from_process_local_data`` (``batch_transform(multihost=
True)``), params/optimizer/TBTT state are initialized as global SPMD
computations (``init_params`` / ``init_opt_state`` / ``init_tbtt_state``),
and device->host fetches go through ``fetch`` (all-gather collective for
non-replicated leaves). This keeps the reference's per-host actor/replay
decoupling (SURVEY §5.8) while the gradient psum rides ICI/DCN.
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

    # -- multi-host-safe initialization ------------------------------------
    # These run the init as a GLOBAL jitted computation with out_shardings,
    # which works identically with 1 or N processes (device_put from host
    # numpy cannot build cross-process arrays).

    def init_params(self, init_fn, key):
        """params = init_fn(key), born with their mesh shardings."""
        shapes = jax.eval_shape(init_fn, key)
        pshard = param_shardings(shapes, self.mesh, self.tp_min_size)
        return jax.jit(init_fn, out_shardings=pshard)(key)

    def init_opt_state(self, opt_init, params):
        """opt_state = opt_init(params); moments mirror the param shardings
        (matched by shape), everything else replicated."""
        shapes = jax.eval_shape(opt_init, params)
        pshard = param_shardings(params, self.mesh, self.tp_min_size)
        rep = replicated(self.mesh)
        shard_by_shape: Dict[tuple, NamedSharding] = {}
        for leaf, s in zip(jax.tree_util.tree_leaves(params),
                           jax.tree_util.tree_leaves(pshard)):
            shard_by_shape.setdefault(tuple(leaf.shape), s)
        oshard = jax.tree_util.tree_map(
            lambda x: shard_by_shape.get(tuple(x.shape), rep)
            if hasattr(x, "shape") else rep, shapes)
        return jax.jit(opt_init, out_shardings=oshard)(params)

    def place_like(self, host_tree, like_tree):
        """Put host-numpy leaves (e.g. a restored checkpoint) back on the
        mesh with the shardings of ``like_tree``. Works multi-host: each
        process supplies the requested index slices from its full host copy.
        """
        def put(x, like):
            if not hasattr(like, "sharding"):
                return x
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, like.sharding, lambda idx: arr[idx])
        return jax.tree_util.tree_map(put, host_tree, like_tree)

    def init_tbtt_state(self, init_fn):
        """Global (B, ...) TBTT state sharded over 'data' (init_fn: () -> state)."""
        return jax.jit(init_fn, out_shardings=state_sharding(self.mesh))()

    def fetch(self, tree):
        """Device -> host numpy fetch that works for multi-host arrays.

        Leaves that are not fully replicated are all-gathered first; that is
        a COLLECTIVE, so under multi-host every process must call fetch(),
        even if only process 0 consumes the result.
        """
        rep = replicated(self.mesh)
        leaves = jax.tree_util.tree_leaves(tree)
        if any(isinstance(x, jax.Array) and not x.is_fully_replicated
               for x in leaves):
            tree = jax.jit(lambda t: t, out_shardings=rep)(tree)
        return jax.device_get(tree)

    def batch_transform(self, multihost: bool = False):
        """Transform for prefetch_iterator: shard (batch, wid) tuples.

        multihost: every host passes only its LOCAL (T, B_local, ...) slice;
        ``jax.make_array_from_process_local_data`` assembles the global
        (T, B, ...) array sharded over 'data' without any host materializing
        the full batch (SURVEY §2.15's per-worker streams at pod scale).
        """
        bs = batch_sharding(self.mesh)
        if multihost:
            from .multihost import host_batch_to_global

            def tf_mh(item):
                batch, wid = item
                return host_batch_to_global(batch, bs), wid
            return tf_mh

        def tf(item):
            batch, wid = item
            batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
            return batch, wid
        return tf
