#!/bin/sh
# Debug-mode Atari run on the local machine (CPU-friendly `debug` preset).
# (reference: scripts/example/run_local.sh)
python -m pydreamer_tpu.launch --configs defaults atari debug --env_id Atari-Breakout
