"""MiniWorld adapter + scripted maze exploration policies.

Counterpart of the reference MiniWorld support (reference: pydreamer/envs/
miniworld.py and envs/__init__.py:25-34): the env comes from gym_miniworld
with its Dict/Map/AgentPos (+ ScavengerHunt goal) wrappers; the scripted
policies generate exploration data for offline probe training:

  * ``MazeBouncingBallPolicy`` — forward until a wall, turn randomly, repeat
    (miniworld.py:11-54)
  * ``MazeDijkstraPolicy``     — pick a random reachable map cell, BFS the
    shortest (x, y, heading) path on the continuous pose grid, follow it,
    with occasional random kicks (miniworld.py:57-145)
  * ``find_shortest``          — the BFS planner. The reference compiles it
    with numba.njit; here it is pure numpy/python with the same quantized
    state keys — fast enough at CPU actor rates and dependency-free.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from ..tools import logger
from .base import Env

__all__ = ["MiniWorld", "MazeBouncingBallPolicy", "MazeDijkstraPolicy",
           "find_shortest", "WALL"]

WALL = 2


class MiniWorld(Env):
    """gym_miniworld env with map/agent-pos/goal observation wrappers."""

    def __init__(self, env_id: str, seed: int = 0):
        try:
            import gym
            import gym_miniworld.wrappers as wrap
        except ImportError as e:
            raise ImportError("MiniWorld environments need gym_miniworld; "
                              "not available in this image") from e
        env = gym.make(env_id)
        env = wrap.DictWrapper(env)
        env = wrap.MapWrapper(env)
        env = wrap.AgentPosWrapper(env)
        if env_id.startswith("MiniWorld-ScavengerHunt"):
            env = wrap.GoalPosWrapper(env)
            env = wrap.GoalVisibleWrapper(env)
            env = wrap.GoalVisAgeWrapper(env)
        self._env = env
        from .base import Discrete
        self.action_space = Discrete(int(env.action_space.n), seed=seed)

    def reset(self):
        return self._env.reset()

    def step(self, action):
        return self._env.step(action)

    def close(self):
        self._env.close()


class MazeBouncingBallPolicy:
    """1) forward until stuck, 2) random turn, 3) goto 1."""

    def __init__(self, seed: Optional[int] = None):
        self.pos = None
        self.turns_remaining = 0
        self.rng = np.random.default_rng(seed)

    def __call__(self, obs) -> Tuple[int, dict]:
        assert "agent_pos" in obs, "Need agent position"
        pos = obs["agent_pos"]
        action = -1

        if self.turns_remaining == 0:
            if self.pos is None or not np.all(self.pos == pos):
                action = 2  # moving forward
                self.pos = pos
            else:
                # Hit a wall - start turning (one step left or right).
                self.turns_remaining = -1 if self.rng.integers(2) == 0 else 1
                self.pos = None

        if self.turns_remaining > 0:
            action = 1
            self.turns_remaining -= 1
        elif self.turns_remaining < 0:
            action = 0
            self.turns_remaining += 1

        assert action >= 0
        return action, {}


class MazeDijkstraPolicy:
    """Navigate to random (or goal-directed) map cells via BFS shortest paths."""

    def __init__(self, step_size: float, turn_size: float,
                 random_prob: float = 0.02, random_steps: int = 5,
                 goal_strategy: str = "random", seed: Optional[int] = None):
        self.step_size = step_size
        self.turn_size = turn_size
        self.random_prob = random_prob
        self.random_steps = random_steps
        self.goal_strategy = goal_strategy
        self.goal = None
        self.expected_pos = None
        self.random_remaining = 0
        self.rng = np.random.default_rng(seed)

    def __call__(self, obs) -> Tuple[int, dict]:
        assert "agent_pos" in obs, "Need agent position"
        x, y = obs["agent_pos"]
        dx, dy = obs["agent_dir"]
        d = math.atan2(dy, dx) / math.pi * 180
        map_ = obs["map"]

        if obs.get("reset"):
            self.goal = None
            self.expected_pos = None
            self.random_remaining = 0

        if self.goal is None:
            self.goal = self.generate_goal(obs)

        if self.expected_pos is not None:
            if not np.isclose(self.expected_pos[:2], np.array([x, y]), 1e-3).all():
                logger.warning("Unexpected position - stuck? Performing random dance...")
                self.random_remaining = self.random_steps

        while True:
            actions, path, nvis = find_shortest(
                map_, (x, y, d), self.goal, self.step_size, self.turn_size)
            if actions is None:
                logger.warning("No path found from=(%.2f, %.2f, %.2f) to=%s "
                               "nvis=%d - trying new goal...", x, y, d, self.goal, nvis)
                self.goal = self.generate_goal(obs)
            elif len(actions) == 0:
                self.goal = self.generate_goal(obs)  # goal reached
            else:
                if self.rng.random() < self.random_prob:
                    self.random_remaining = self.random_steps
                if self.random_remaining > 0:
                    self.random_remaining -= 1
                    self.expected_pos = None
                    return int(self.rng.integers(3)), {}
                self.expected_pos = path[0]
                return actions[0], {}

    def generate_goal(self, obs) -> Tuple[float, float]:
        map_ = obs["map"]
        if self.goal_strategy == "random":
            while True:
                gx = int(self.rng.integers(map_.shape[0]))
                gy = int(self.rng.integers(map_.shape[1]))
                if map_[gx, gy] != WALL:
                    return (gx, gy)
        if self.goal_strategy == "goal_direction":
            x, y = obs["agent_pos"]
            dx, dy = obs["agent_dir"]
            d = math.atan2(dy, dx)
            grx, gry = obs["goal_direction"]  # agent-relative
            gx = x + grx * math.cos(d) - gry * math.sin(d)
            gy = y + gry * math.cos(d) + grx * math.sin(d)
            return (gx, gy)
        raise ValueError(self.goal_strategy)


def find_shortest(map_: np.ndarray, start: Tuple[float, float, float],
                  goal: Tuple[float, float], step_size: float = 1.0,
                  turn_size: float = 45.0):
    """BFS over the quantized continuous pose grid (x, y, heading-deg).

    Returns (actions, path, n_visited); actions None if unreachable.
    Wall collision is checked at 4 corners with RADIUS margin.
    """
    KPREC = 5
    RADIUS = 0.2
    x, y, d = start
    gx, gy = goal
    H, W = map_.shape[0], map_.shape[1]

    quant = lambda v: round(v * KPREC) / KPREC
    que = [(x, y, d)]
    que_ix = 0
    visited = {(quant(x), quant(y), quant(d))}
    parent: Dict[tuple, tuple] = {}
    parent_action: Dict[tuple, int] = {}
    goal_state = None

    while que_ix < len(que):
        p = que[que_ix]
        que_ix += 1
        x, y, d = p
        if math.hypot(x - gx, y - gy) < step_size:
            goal_state = p
            break
        for action in range(3):
            x1, y1, d1 = x, y, d
            if action == 0:      # turn left
                d1 = d - turn_size
                if d1 < -180.0:
                    d1 += 360.0
            elif action == 1:    # turn right
                d1 = d + turn_size
                if d1 > 180.0:
                    d1 -= 360.0
            else:                # forward
                x1 = x + step_size * math.cos(d / 180 * math.pi)
                y1 = y + step_size * math.sin(d / 180 * math.pi)
                for x2, y2 in ((x1 - RADIUS, y1 - RADIUS), (x1 + RADIUS, y1 - RADIUS),
                               (x1 - RADIUS, y1 + RADIUS), (x1 + RADIUS, y1 + RADIUS)):
                    if (x2 < 0 or y2 < 0 or x2 >= H or y2 >= W
                            or map_[int(x2), int(y2)] == WALL):
                        x1, y1 = x, y  # blocked
                        break
            p1 = (x1, y1, d1)
            key = (quant(x1), quant(y1), quant(d1))
            if key not in visited:
                que.append(p1)
                parent[p1] = p
                parent_action[p1] = action
                visited.add(key)
                if len(visited) >= 100000:
                    return None, None, len(visited)  # runaway search

    if goal_state is None:
        return None, None, len(visited)

    path = []
    actions = []
    p = goal_state
    while p in parent_action:
        path.append(p)
        actions.append(parent_action[p])
        p = parent[p]
    path.reverse()
    actions.reverse()
    return actions, path, len(visited)
