#!/bin/bash
# Run a command under a virtual framebuffer for envs that need GL rendering
# (MiniWorld, dm_control with osmesa unavailable).
# Usage: scripts/xvfb_run.sh python -m pydreamer_tpu.launch --configs ...
exec xvfb-run -a -s "-screen 0 1024x768x24" "$@"
