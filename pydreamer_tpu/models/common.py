"""Shape/typing conventions: the (T, B, I, ...) tensor layout contract.

Counterpart of the reference's type-alias vocabulary (reference:
pydreamer/models/common.py:10-34). JAX arrays carry no compile-time shapes,
so these aliases are documentation used in signatures — but the axis-order
contract they describe is load-bearing across the whole framework:

  T = TBTT sequence length (batch_length, e.g. 48)
  B = batch size (e.g. 32); under SPMD this is the GLOBAL batch, sharded
      over the 'data' mesh axis
  I = IWAE samples (1/3/10); the batch axis expands to B*I inside the RSSM
  A = action dim,  E = embed dim,  F = feature dim (= deter + stoch*classes)
  H = imagination horizon (e.g. 15),  J = H+1
  M = T*B*I (flattened dream batch)

Image layout is NHWC everywhere: (T, B, H, W, C) — TPU-native convolution
layout (the reference uses NCHW). Categorical images put the class axis
LAST: (T, B, H, W, K).

State = (h, z): h (B*I, deter_dim) f32, z (B*I, stoch_dim*classes) f32.
"""

from typing import Dict, Tuple

import jax

Array = jax.Array

TensorTBCHW = Array   # (T,B,H,W,C) image — name kept for reference parity
TensorTB = Array      # (T,B) scalars
TensorTBE = Array     # (T,B,E) embeds
TensorTBIF = Array    # (T,B,I,F) features
TensorTBI = Array     # (T,B,I) per-sample losses
TensorJMF = Array     # (H+1,M,F) dream features
TensorJM = Array      # (H+1,M)
TensorHMA = Array     # (H,M,A) dream actions
TensorHM = Array      # (H,M)

StateB = Tuple[Array, Array]   # ((B,D), (B,S*K))
ObsDict = Dict[str, Array]

__all__ = ["Array", "TensorTBCHW", "TensorTB", "TensorTBE", "TensorTBIF",
           "TensorTBI", "TensorJMF", "TensorJM", "TensorHMA", "TensorHM",
           "StateB", "ObsDict"]
