"""The fused, jitted gradient step: forward + backward + clip + update.

The reference learner does autocast forward, 4 separate backwards into one
GradScaler, per-group clipping, and 3-4 AdamW steps (reference: train.py:
163-198). Here all of it is ONE jitted function:

  * single forward computing all losses (each loss touches only its own
    param subtree — see models/dreamer.py gradient-routing note), so ONE
    ``jax.grad`` produces exactly the partitioned gradients
  * per-group clip-by-global-norm + AdamW via ``optax.multi_transform``
    labeled by top-level param key (wm / probe / actor / critic); the frozen
    ``critic_target`` subtree is zeroed (reference: dreamer.py:60-71)
  * bfloat16 compute policy needs no GradScaler: gradients and master params
    stay float32
  * the periodic critic->critic_target hard copy is a ``jnp.where`` select
    on ``step % target_interval`` INSIDE the step (reference: a2c.py:77-79) —
    no host round-trip, no recompilation
  * SPMD: with a mesh, the same function is jitted with batch sharded over
    the 'data' axis and params replicated; XLA inserts the gradient psum
    (see parallel/mesh.py)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.functions import global_norm

__all__ = ["TrainStep", "make_optimizer_labels", "make_optimizer"]


def make_optimizer_labels(params: Dict[str, Any], probe_gradients: bool) -> Dict[str, str]:
    """Top-level param key -> optimizer group label."""
    labels = {}
    for key in params:
        if key == "critic_target":
            labels[key] = "frozen"
        elif key == "probe":
            labels[key] = "wm" if probe_gradients else "probe"
        elif key in ("actor", "critic"):
            labels[key] = key
        else:
            labels[key] = "wm"
    return labels


def make_optimizer(conf, params: Dict[str, Any]) -> optax.GradientTransformation:
    """Partitioned AdamW with per-group clipping (reference: train.py:113,193-198)."""
    probe_gradients = conf.get("probe_gradients", False)
    labels = make_optimizer_labels(params, probe_gradients)

    def group(lr, clip):
        return optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(lr, eps=conf.adam_eps, weight_decay=0.0),
        )

    transforms = {
        "wm": group(conf.adam_lr, conf.grad_clip),
        "probe": group(conf.adam_lr, conf.grad_clip),
        "actor": group(conf.adam_lr_actor or conf.adam_lr, conf.grad_clip_ac or conf.grad_clip),
        "critic": group(conf.adam_lr_critic or conf.adam_lr, conf.grad_clip_ac or conf.grad_clip),
        "frozen": optax.set_to_zero(),
    }
    param_labels = {k: labels[k] for k in params}
    return optax.multi_transform(transforms, param_labels)


class TrainStep:
    """Builds the jitted train step for a model (Dreamer or WorldModelProbe)."""

    def __init__(self, model, conf, donate: bool = True):
        self.model = model
        self.conf = conf
        self.donate = donate  # donate params/opt_state buffers (in-place HBM
        #                       update); turn off if callers reuse inputs
        # Also donate the TBTT in_state (h,z): out_state has identical
        # shapes/dtypes, so XLA reuses the buffers and elides the state
        # copies the r4 per-op audit attributed ~0.7 ms/step to
        # (copy.463/480, PERF.md). Safe because every caller replaces its
        # state reference with the returned out_state; requires callers
        # never to pass a SHARED init_state buffer for two streams.
        self.donate_state = bool(conf.get("donate_state", False))
        self.target_interval = conf.get("target_interval", 0)
        self.target_interval_aux = (conf.get("target_interval_aux", 0)
                                    if conf.get("aux_critic", False) else 0)
        self._jit_cache: Dict[Tuple[bool, bool], Any] = {}

    def init_optimizer(self, params, ctx=None):
        """Build the optimizer and its state. With a DistributedContext the
        state is initialized as a global SPMD computation, moments sharded
        like their params (required under multi-host)."""
        self.optimizer = make_optimizer(self.conf, params)
        if ctx is not None:
            return ctx.init_opt_state(self.optimizer.init, params)
        return self.optimizer.init(params)

    # -- the step ---------------------------------------------------------

    def _step(self, params, opt_state, obs, in_state, step, key,
              do_image_pred: bool, do_dream_tensors: bool):
        # Derive this step's RNG stream on-device from (key, step). Callers
        # can pass the SAME key buffer every step — no host-side
        # jax.random.split per iteration (measurably ~1 ms/step of host work
        # on small hosts; see PERF.md). Passing a fresh key still works.
        key = jax.random.fold_in(key, step)

        # Periodic critic_target <- critic hard copy BEFORE the grad step,
        # matching the reference's pre-update refresh (a2c.py:76-79).
        if "critic_target" in params and self.target_interval:
            do_copy = (step % self.target_interval) == 0
            params = dict(params)
            params["critic_target"] = jax.tree_util.tree_map(
                lambda tgt, src: jnp.where(do_copy, src, tgt),
                params["critic_target"], params["critic"])

        # Same periodic refresh for the auxiliary critic's target net, which
        # lives inside the wm subtree (reference: the aux ActorCritic refreshes
        # itself every target_interval_aux steps, a2c.py:76-79).
        if self.target_interval_aux and "ac_aux" in params.get("wm", {}):
            do_copy_aux = (step % self.target_interval_aux) == 0
            params = dict(params)
            wm = dict(params["wm"])
            ac_aux = dict(wm["ac_aux"])
            ac_aux["critic_target"] = jax.tree_util.tree_map(
                lambda tgt, src: jnp.where(do_copy_aux, src, tgt),
                ac_aux["critic_target"], ac_aux["critic"])
            wm["ac_aux"] = ac_aux
            params["wm"] = wm

        def loss_fn(p):
            losses, out_state, metrics, tensors, dream_tensors = \
                self.model.training_step(
                    p, obs, in_state, key,
                    do_image_pred=do_image_pred,
                    do_dream_tensors=do_dream_tensors)
            total = sum(losses.values())
            return total, (losses, out_state, metrics, tensors, dream_tensors)

        grads, (losses, out_state, metrics, tensors, dream_tensors) = \
            jax.grad(loss_fn, has_aux=True)(params)

        # Pre-clip grad norms per group (reference: model.grad_clip metrics).
        grad_metrics = {}
        for key_name, metric in (("wm", "grad_norm"), ("probe", "grad_norm_probe"),
                                 ("actor", "grad_norm_actor"), ("critic", "grad_norm_critic")):
            if key_name in grads:
                grad_metrics[metric] = global_norm(grads[key_name])

        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        metrics = dict(metrics)
        metrics.update(grad_metrics)
        metrics.update({k: jax.lax.stop_gradient(v) for k, v in losses.items()})
        return params, opt_state, out_state, metrics, tensors, dream_tensors

    def jitted(self, do_image_pred: bool = False, do_dream_tensors: bool = False,
               donate: Optional[bool] = None):
        """Get (and cache) the compiled step for a flag combination.

        Flags are compile-time constants (XLA needs static graph shapes); the
        trainer uses at most 3 variants: plain / +image_pred / +dream_tensors.
        Params and optimizer state buffers are donated — updates happen
        in-place in HBM instead of doubling memory.
        """
        if donate is None:
            donate = self.donate
        flags = (do_image_pred, do_dream_tensors)
        if flags not in self._jit_cache:
            fn = partial(self._step, do_image_pred=do_image_pred,
                         do_dream_tensors=do_dream_tensors)
            argnums = (0, 1) if donate else ()
            if donate and self.donate_state:
                argnums = (0, 1, 3)
            self._jit_cache[flags] = jax.jit(fn, donate_argnums=argnums)
        return self._jit_cache[flags]

    def __call__(self, params, opt_state, obs, in_state, step, key,
                 do_image_pred=False, do_dream_tensors=False):
        # step/key go in as host values (np), not committed device arrays:
        # host values are valid inputs for single- AND multi-process jits
        # (they are implicitly replicated), and the dtype is pinned so the
        # step count never retraces.
        if not isinstance(step, jax.Array):
            step = np.int32(step)
        if not isinstance(key, jax.Array):
            key = np.asarray(key)
        return self.jitted(do_image_pred, do_dream_tensors)(
            params, opt_state, obs, in_state, step, key)
