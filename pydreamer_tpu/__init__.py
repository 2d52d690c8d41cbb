"""PyDreamer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) model-based RL framework.

A from-scratch re-design of the capabilities of PyDreamer (DreamerV2: RSSM world
model + actor-critic trained in imagination) for TPU hardware:

  * pure-functional models (flax.linen) with a single fused, jitted train step
  * `lax.scan` RSSM core (no Python time loops) with TBTT state carry
  * bfloat16 compute policy (no GradScaler needed), float32 at distribution
    boundaries
  * SPMD scale-out over a `jax.sharding.Mesh` (data / model axes) instead of
    process-level NCCL
  * asynchronous actor/learner runtimes coupled through an artifact store,
    mirroring the reference's restart-tolerant files-as-transport design
    (reference: /root/reference launch.py, train.py, generator.py)

Package layout:
  conf.py       - YAML-union config system (reference: tools.py:37-46, launch.py:22-41)
  models/       - RSSM, encoders/decoders, actor-critic, probes, baselines
  ops/          - Pallas TPU kernels + low-level numerics
  parallel/     - mesh construction, sharding rules, distributed train step
  data/         - episode repository, sequential TBTT dataset, preprocessing
  envs/         - env registry + wrapper stack
  training/     - learner loop, jitted train step, eval protocol
  generator.py  - actor runtime
  launch.py     - orchestration (process topology + watchdog)
"""

__version__ = "0.1.0"
