#!/bin/sh
# Build the TPU image and run a debug-mode Atari job inside it.
# (reference: scripts/example/run_docker.sh)
docker build . -f Dockerfile -t pydreamer-tpu

docker run -it pydreamer-tpu --configs defaults atari debug
