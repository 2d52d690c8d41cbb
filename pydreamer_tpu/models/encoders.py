"""Observation encoders.

Counterpart of the reference encoders (reference: pydreamer/models/encoders.py):
  * ``MultiEncoder``  — image branch + vecobs branch, concatenated embeds;
    optional reward/terminal planes appended to the image channels
    (encoders.py:50-59)
  * ``ConvEncoder``   — DreamerV2 4-layer stride-2 CNN, kernel 4, depth
    d..8d, output 32d (encoders.py:72-96)
  * ``DenseEncoder``  — MLP encoder for small categorical images (MiniGrid)
    (encoders.py:99-125)

Layout divergence (deliberate, TPU-first): images are **(T,B,H,W,C)** NHWC —
the native convolution layout on TPU — instead of the reference's NCHW. The
preprocessor produces HWC directly; nothing in the framework ever transposes
images on device.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.subpixel import conv_s2_space_to_depth
from .functions import flatten_batch, unflatten_batch
from .modules import Dense, Norm, MLP, xavier_uniform

__all__ = ["MultiEncoder", "ConvEncoder", "DenseEncoder"]


class _ConvS2(nn.Module):
    """Stride-2 VALID conv with a selectable lowering; param tree ("kernel"
    HWIO + "bias") and init match nn.Conv, so checkpoints interchange.

    'auto' resolves to the plain XLA lowering: the space-to-depth
    regrouping (ops/subpixel.py, impl='s2d') won its microbench but LOST
    the fused-train-step interleaved A/B (scripts/bench_step_ab.py, PERF.md
    r4) — XLA already pads/tiles the thin RGB stem well once fused with
    prepare_obs. 's2d' stays selectable for re-measurement on other
    hardware; math is identical either way.
    """

    features: int
    kernel_size: Tuple[int, int]
    impl: str = "auto"   # auto | xla | s2d
    dtype: Any = jnp.float32

    def _use_s2d(self, h: int, w: int, cin: int) -> bool:
        k = self.kernel_size[0]
        eligible = k % 2 == 0 and h % 2 == 0 and w % 2 == 0
        if self.impl != "auto":
            if self.impl == "s2d" and not eligible:
                # Explicit request that can't be honored: warn (at trace
                # time) so an A/B of lowerings can't silently compare
                # xla-vs-xla. Silent fallback is reserved for 'auto'.
                import logging
                logging.getLogger(__name__).warning(
                    "impl='s2d' requested but shape (k=%d, h=%d, w=%d) is "
                    "ineligible (needs even kernel and spatial dims); "
                    "falling back to the XLA lowering", k, h, w)
            return self.impl == "s2d" and eligible
        # 'auto' = XLA: in the fused train step the plain lowering beat the
        # s2d stem in interleaved A/Bs (scripts/bench_step_ab.py r4) — XLA
        # already pads/tiles the thin stem well once fused with prepare_obs.
        return False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", xavier_uniform,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        if self._use_s2d(int(x.shape[1]), int(x.shape[2]), int(cin)):
            y = conv_s2_space_to_depth(x, kernel.astype(self.dtype))
        else:
            dn = lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                x, kernel.astype(self.dtype), window_strides=(2, 2),
                padding="VALID", dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class ConvEncoder(nn.Module):
    """DreamerV2 CNN encoder: 4x [Conv k4 s2 VALID, ELU], flatten.

    For 64x64 input: 64->31->14->6->2 spatial, so out_dim = 2*2*8d = 32d.
    """

    in_channels: int = 3
    cnn_depth: int = 32
    conv_impl: str = "auto"   # auto | xla | s2d (identical math)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.cnn_depth * 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (..., H, W, C) -> (..., 32d)
        x, bd = flatten_batch(x, 3)
        x = x.astype(self.dtype)
        d = self.cnn_depth
        for i, depth in enumerate((d, d * 2, d * 4, d * 8)):
            x = _ConvS2(depth, (4, 4), impl=self.conv_impl,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.elu(x)
        x = x.reshape(x.shape[0], -1)
        return unflatten_batch(x, bd)


class DenseEncoder(nn.Module):
    """Flatten -> MLP -> ELU output (small categorical images)."""

    in_dim: int
    out_dim: int = 256
    hidden_dim: int = 400
    hidden_layers: int = 2
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x, bd = flatten_batch(x, 3)
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = Norm(self.layer_norm, dtype=self.dtype)(x)
        x = nn.elu(x)
        for _ in range(self.hidden_layers - 1):
            x = Dense(self.hidden_dim, dtype=self.dtype)(x)
            x = Norm(self.layer_norm, dtype=self.dtype)(x)
            x = nn.elu(x)
        x = Dense(self.out_dim, dtype=self.dtype)(x)
        x = nn.elu(x)
        return unflatten_batch(x, bd)


class MultiEncoder(nn.Module):
    """Image + vecobs encoder with optional reward/terminal input planes.

    (reference: encoders.py:10-69.) Config-driven: ``image_encoder`` selects
    cnn/dense/none; ``vecobs_size`` adds a vector-obs MLP branch; with
    ``reward_input`` the scalar reward/terminal are broadcast to (H,W,1)
    planes and concatenated onto the image channels.
    """

    image_encoder: Optional[str]  # 'cnn' | 'dense' | None
    image_size: int
    image_channels: int
    cnn_depth: int
    image_encoder_layers: int
    vecobs_size: int
    reward_input: bool
    conv_impl: str = "auto"
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @property
    def encoder_channels(self) -> int:
        return self.image_channels + (2 if self.reward_input else 0)

    @property
    def out_dim(self) -> int:
        dim = 0
        if self.image_encoder == "cnn":
            dim += self.cnn_depth * 32
        elif self.image_encoder == "dense":
            dim += 256
        if self.vecobs_size:
            dim += 256
        if dim == 0:
            raise ValueError("Either image_encoder or vecobs_size must be set")
        return dim

    @nn.compact
    def __call__(self, obs) -> jax.Array:
        embeds = []
        if self.image_encoder:
            image = obs["image"]  # (T,B,H,W,C)
            if self.reward_input:
                T, B, H, W, C = image.shape
                plane = lambda v: jnp.broadcast_to(
                    v[:, :, None, None, None].astype(image.dtype), (T, B, H, W, 1))
                image = jnp.concatenate(
                    [image, plane(obs["reward"]), plane(obs["terminal"])], -1)
            if self.image_encoder == "cnn":
                enc = ConvEncoder(self.encoder_channels, self.cnn_depth,
                                  conv_impl=self.conv_impl, dtype=self.dtype)
            elif self.image_encoder == "dense":
                enc = DenseEncoder(
                    in_dim=self.image_size * self.image_size * self.encoder_channels,
                    out_dim=256, hidden_layers=self.image_encoder_layers,
                    layer_norm=self.layer_norm, dtype=self.dtype)
            else:
                raise ValueError(f"unknown image_encoder {self.image_encoder!r}")
            embeds.append(enc(image))
        if self.vecobs_size:
            embeds.append(MLP(256, hidden_dim=400, hidden_layers=2,
                              layer_norm=self.layer_norm, dtype=self.dtype,
                              name="encoder_vecobs")(obs["vecobs"]))
        return jnp.concatenate(embeds, -1)
