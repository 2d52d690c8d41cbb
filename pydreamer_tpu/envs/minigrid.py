"""MiniGrid adapter + scripted wander policy.

Counterpart of the reference MiniGrid env (reference: pydreamer/envs/
minigrid.py): 7x7 categorical agent view (values collapsed to a small
class set), global ``map`` for the probe head, agent_pos/agent_dir for
map_coord. Requires the ``minigrid`` package (optional).

The categorical codebook follows the reference's collapse of
(object, color, state) triples into single class ids.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .base import Discrete, Env

__all__ = ["MiniGrid", "MinigridWanderPolicy"]


class MiniGrid(Env):

    # object-type ids (minigrid core constants): collapse to compact classes
    # 0 unseen, 1 empty, 2 wall, 3 floor, 4 door(open), 5 door(closed),
    # 6 key, 7 ball, 8 box, 9 goal, 10 lava, 11 agent
    N_CLASSES = 12

    def __init__(self, env_id: str, seed: int = 0, max_steps: Optional[int] = None):
        try:
            import gymnasium
            import minigrid  # noqa: F401
        except ImportError as e:
            raise ImportError("MiniGrid environments need the minigrid package; "
                              "not available in this image") from e
        kwargs = {}
        if max_steps:
            kwargs["max_steps"] = max_steps
        self._env = gymnasium.make(env_id, **kwargs)
        self._seed = seed
        self._needs_seed = True
        self.action_space = Discrete(7, seed=seed)
        self.map_size = self._env.unwrapped.grid.width

    def _compact(self, grid: np.ndarray) -> np.ndarray:
        """(H,W,3) minigrid encoding -> (H,W) compact class ids."""
        obj = grid[..., 0]
        state = grid[..., 2]
        out = np.ones_like(obj)              # default empty
        out[obj == 0] = 0                    # unseen
        out[obj == 1] = 1                    # empty
        out[obj == 2] = 2                    # wall
        out[obj == 3] = 3                    # floor
        out[(obj == 4) & (state == 0)] = 4   # open door
        out[(obj == 4) & (state != 0)] = 5   # closed/locked door
        out[obj == 5] = 6                    # key
        out[obj == 6] = 7                    # ball
        out[obj == 7] = 8                    # box
        out[obj == 8] = 9                    # goal
        out[obj == 9] = 10                   # lava
        out[obj == 10] = 11                  # agent
        return out.astype(np.int64)

    def _obs(self, o) -> dict:
        u = self._env.unwrapped
        image = self._compact(o["image"])
        full = u.grid.encode()
        m = self._compact(full)
        ay, ax = u.agent_pos
        m[ay, ax] = 11
        return {
            "image": image,
            "map": m,
            "agent_pos": np.array(u.agent_pos, np.float32),
            "agent_dir": np.array([np.cos(u.agent_dir * np.pi / 2),
                                   np.sin(u.agent_dir * np.pi / 2)], np.float32),
        }

    def reset(self):
        if self._needs_seed:
            o, _ = self._env.reset(seed=self._seed)
            self._needs_seed = False
        else:
            o, _ = self._env.reset()
        return self._obs(o)

    def step(self, action):
        o, reward, terminated, truncated, info = self._env.step(int(action))
        info = dict(info)
        if truncated and not terminated:
            info["time_limit"] = True
        return self._obs(o), float(reward), bool(terminated or truncated), info

    def close(self):
        self._env.close()


class MinigridWanderPolicy:
    """Scripted explorer (reference: pydreamer/envs/minigrid.py:221-276):
    walk forward; at obstacles turn towards open space; occasionally random."""

    def __init__(self, random_prob: float = 0.2, seed: int = 0):
        self.random_prob = random_prob
        self.rng = np.random.default_rng(seed)

    def __call__(self, obs) -> Tuple[int, dict]:
        if self.rng.random() < self.random_prob:
            return int(self.rng.integers(3)), {}  # left/right/forward
        image = obs["image"]
        # Agent view: agent at bottom-center facing up; cell ahead is
        # (H-2, W//2) in view coordinates.
        h, w = image.shape[:2]
        ahead = image[h - 2, w // 2]
        blocked = ahead in (2, 5, 10)  # wall, closed door, lava
        if not blocked:
            return 2, {}  # forward
        left = image[h - 1, w // 2 - 1] if w // 2 - 1 >= 0 else 2
        return (0 if left not in (2, 5, 10) else 1), {}  # turn left else right
