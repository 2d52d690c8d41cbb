#!/bin/sh
# Allow X11 connections (GUI envs like MiniWorld on a desktop), then exec
# the given command. (reference: scripts/xhost_run.sh)
xhost + & "$@"
