"""Env layer tests: wrapper stack contract, built-in envs, scripted planners."""

import numpy as np
import pytest

from pydreamer_tpu.envs import create_env, GridWorld, CountingEnv
from pydreamer_tpu.envs.miniworld import (MazeBouncingBallPolicy,
                                          MazeDijkstraPolicy, find_shortest, WALL)
from pydreamer_tpu.envs.wrappers import (ActionRewardResetWrapper,
                                         CollectWrapper, DictWrapper,
                                         TimeLimitWrapper)


class TestGymnasiumFallback:
    """Unknown env_id prefixes dispatch to gymnasium (reference: the gym.make
    fallback, pydreamer/envs/__init__.py:61-63)."""

    def test_cartpole_vecobs_contract(self):
        pytest.importorskip("gymnasium")
        env = create_env("CartPole-v1", False, 200, 1, 0)
        obs = env.reset()
        assert obs["vecobs"].shape == (4,) and "image" not in obs
        assert obs["action"].shape == (2,)  # one-hot discrete
        obs, reward, done, info = env.step(np.array([0.0, 1.0]))
        assert reward == 1.0


class TestDMC:
    """Real dm_control env through the full wrapper stack (gated on SDK +
    headless EGL rendering; reference: pydreamer/envs/dmc.py:8-93)."""

    @pytest.fixture(scope="class")
    def dmc_env(self):
        pytest.importorskip("dm_control")
        try:
            env = create_env("DMC-cartpole_balance", False, 500, 2, 0)
            env.reset()
        except Exception as e:  # no usable GL backend on this machine
            pytest.skip(f"dm_control rendering unavailable: {e}")
        return env

    def test_obs_and_continuous_action_contract(self, dmc_env):
        obs = dmc_env.reset()
        assert obs["image"].shape == (64, 64, 3) and obs["image"].dtype == np.uint8
        assert obs["vecobs"].dtype == np.float32 and obs["vecobs"].ndim == 1
        # Continuous action space: no one-hot wrapper applied.
        assert not hasattr(dmc_env.action_space, "n")
        a = np.zeros(dmc_env.action_space.shape, np.float32)
        obs, reward, done, info = dmc_env.step(a)
        np.testing.assert_array_equal(obs["action"], a)
        assert np.isfinite(reward)

    def test_action_repeat_time_limit(self, dmc_env):
        # cartpole_balance runs 1000 sim steps; action_repeat=2 => 500 agent
        # steps, ends by time (discount 1.0) => not terminal.
        dmc_env.reset()
        done = False
        steps = 0
        while not done and steps < 600:
            _, _, done, info = dmc_env.step(
                np.zeros(dmc_env.action_space.shape, np.float32))
            steps += 1
        assert done and steps == 500
        assert info["episode"]["terminal"][-1] == False  # noqa: E712


class TestWrapperStack:
    def test_obs_contract(self):
        env = create_env("Grid-4x32", False, 20, 1, 0)
        obs = env.reset()
        assert obs["reset"] == True  # noqa: E712
        assert obs["terminal"] == False  # noqa: E712
        assert obs["reward"] == 0.0
        assert obs["action"].shape == (4,)
        assert obs["image"].shape == (32, 32, 3)

        action = np.zeros(4)
        action[1] = 1.0
        obs, reward, done, info = env.step(action)
        assert obs["reset"] == False  # noqa: E712
        np.testing.assert_array_equal(obs["action"], action)

    def test_collect_wrapper_episode(self):
        env = create_env("Counting-5", False, 0, 1, 0)
        env.reset()
        done = False
        while not done:
            obs, reward, done, info = env.step(env.action_space.sample())
        ep = info["episode"]
        assert len(ep["reward"]) == 6  # reset step + 5 steps
        assert ep["reset"][0] and not ep["reset"][1:].any()
        assert ep["terminal"][-1]  # natural end is terminal

    def test_time_limit_not_terminal(self):
        """Truncation must not be marked terminal (value bootstrapping)."""
        env = create_env("Grid-8x32", False, 3, 1, 0)
        env.reset()
        for _ in range(10):
            obs, reward, done, info = env.step(0)
            if done:
                break
        if info.get("time_limit"):
            assert not obs["terminal"], "time-limit end must not be terminal"

    def test_no_terminal_flag(self):
        env = create_env("Counting-3", True, 0, 1, 0)
        env.reset()
        done = False
        while not done:
            obs, _, done, info = env.step(env.action_space.sample())
        assert not obs["terminal"]  # no_terminal forces terminal=False


class TestGridWorld:
    def test_reachable_goal(self):
        env = GridWorld(grid_size=4, image_size=32, seed=0)
        obs = env.reset()
        # walk exhaustively right+down then left+up; must terminate in <max_steps
        for i in range(200):
            _, r, done, info = env.step(i % 4)
            if done:
                break
        assert done

    def test_render_shows_agent_and_goal(self):
        env = GridWorld(grid_size=4, image_size=32, seed=1)
        obs = env.reset()
        img = obs["image"]
        assert (img == 255).any()          # agent (white)
        assert (img[:, :, 1] == 200).any()  # goal (green)


class TestScriptedPolicies:
    def test_find_shortest_simple_corridor(self):
        # 5x5 open room, go from (1,1) to (3,3)
        m = np.full((5, 5), 1)
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = WALL
        actions, path, nvis = find_shortest(m, (1.5, 1.5, 0.0), (3.5, 3.5),
                                            step_size=1.0, turn_size=90.0)
        assert actions is not None and len(actions) >= 2
        # simulate: follow actions and end near goal
        x, y, d = 1.5, 1.5, 0.0
        for a in actions:
            if a == 0:
                d -= 90.0
            elif a == 1:
                d += 90.0
            else:
                x += np.cos(d / 180 * np.pi)
                y += np.sin(d / 180 * np.pi)
        assert np.hypot(x - 3.5, y - 3.5) < 1.0

    def test_find_shortest_unreachable(self):
        m = np.full((5, 5), 1)
        m[:, 2] = WALL  # wall splits the room
        actions, path, nvis = find_shortest(m, (1.5, 1.5, 0.0), (1.5, 4.0),
                                            step_size=1.0, turn_size=90.0)
        assert actions is None

    def test_bouncing_ball_policy(self):
        policy = MazeBouncingBallPolicy(seed=0)
        # moving: goes forward
        a, _ = policy(dict(agent_pos=np.array([1.0, 1.0])))
        assert a == 2
        a, _ = policy(dict(agent_pos=np.array([1.5, 1.0])))
        assert a == 2
        # stuck at same position: turns
        a, _ = policy(dict(agent_pos=np.array([1.5, 1.0])))
        assert a in (0, 1)

    def test_dijkstra_policy_navigates(self):
        m = np.full((6, 6), 1)
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = WALL
        policy = MazeDijkstraPolicy(step_size=1.0, turn_size=90.0,
                                    random_prob=0.0, seed=0)
        obs = dict(agent_pos=np.array([1.5, 1.5]),
                   agent_dir=np.array([1.0, 0.0]),
                   map=m, map_agent=m, reset=True)
        a, _ = policy(obs)
        assert a in (0, 1, 2)


class TestMinigridMapMemory:
    """The map-memory machinery (map_vis ages + map_centered) as pure
    functions — testable without the minigrid SDK
    (reference: pydreamer/envs/minigrid.py:108-199)."""

    def test_view_maps_agent_and_front_cells(self):
        from pydreamer_tpu.envs.minigrid import view_to_global_coords
        W = H = 11
        for d, f in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            x, y, mask = view_to_global_coords((5, 5), d, 7, W, H)
            # Agent sits at view (n//2, n-1); must map to its own position.
            assert mask[3, 6]
            assert (x[3, 6], y[3, 6]) == (5, 5)
            # The cell directly ahead (view (n//2, n-2)) is agent_pos + f.
            assert (x[3, 5], y[3, 5]) == (5 + f[0], 5 + f[1])
        # Facing a wall edge: out-of-grid view cells are masked out.
        x, y, mask = view_to_global_coords((0, 0), 2, 7, W, H)  # facing left
        assert not mask.all() and mask[3, 6]

    def test_last_seen_ages_and_resets_on_visibility(self):
        from pydreamer_tpu.envs.minigrid import update_last_seen
        age = np.full((4, 4), 500, np.uint16)
        vis = np.zeros((4, 4), bool)
        vis[1, 2] = True
        update_last_seen(age, vis, 500)
        assert age[1, 2] == 0 and age[0, 0] == 500  # capped, not 501
        update_last_seen(age, np.zeros((4, 4), bool), 500)
        assert age[1, 2] == 1  # ages once hidden again

    def test_centered_map_rotates_front_up(self):
        """Whatever direction the agent faces, the cell ahead of it lands at
        [c, c-1] of the centered map — the orientation contract the wander
        policy relies on (reference: minigrid.py:230-234)."""
        from pydreamer_tpu.envs.minigrid import centered_map
        W = H = 9
        for d, f in enumerate([(1, 0), (0, 1), (-1, 0), (0, -1)]):
            grid = np.ones((W, H), np.int64)
            pos = (4, 4)
            grid[4 + f[0], 4 + f[1]] = 7  # marker directly ahead
            m = centered_map(grid, pos, d, 2 * W - 3)
            c = (2 * W - 3) // 2
            assert m[c, c - 1] == 7, f"dir {d}"
            assert m[c, c] == 1  # agent cell itself (empty)
        # Out-of-bounds padding reads as wall.
        m = centered_map(np.ones((W, H), np.int64), (0, 0), 3, 2 * W - 3)
        assert (m == 2).any()

    def test_map_observation_reference_key_family(self):
        """map_observation emits the reference's full map-key set with its
        semantics: `map` agentless, `map_agent` stamps the agent cell,
        `map_masked` zeroes currently-invisible cells to the unseen class
        (reference: pydreamer/envs/minigrid.py:111-118)."""
        from pydreamer_tpu.envs.minigrid import map_observation
        W = H = 9
        grid = np.ones((W, H), np.int64)
        grid[0, :] = grid[-1, :] = grid[:, 0] = grid[:, -1] = 2  # walls
        grid[7, 7] = 9  # goal
        last_seen = np.full((W, H), 500, np.uint16)
        obs_vis = np.ones((7, 7), bool)  # whole view visible
        obs = map_observation(grid, (4, 4), 3, obs_vis, last_seen,
                              vis_cap=500, centered_size=2 * W - 3)
        assert set(obs) == {"map", "map_agent", "map_masked", "map_vis",
                            "map_centered"}  # reference key family
        assert obs["map"][4, 4] == 1              # agentless
        assert obs["map_agent"][4, 4] == 11       # agent stamped
        assert (obs["map"] != 11).all()
        # facing up (dir 3): the row ahead is visible, cells behind are not
        assert obs["map_masked"][4, 4] == 11      # agent cell visible
        assert obs["map_masked"][4, 3] == obs["map_agent"][4, 3]  # ahead kept
        assert obs["map_masked"][4, 8] == 0       # behind -> unseen class
        assert obs["map_agent"][4, 8] != 0
        # map_vis: visible cells age 0, never-seen carry the cap
        assert obs["map_vis"][4, 4] == 0 and obs["map_vis"][4, 8] == 500

    def test_preprocessor_image_key_map_masked(self):
        """`image_key: map_masked` drives the model's image stream from the
        masked map, one-hot over the categorical classes (reference:
        preprocessing.py:107)."""
        from tests.util import make_conf
        from pydreamer_tpu.data import Preprocessor
        T, B, N = 3, 2, 7
        conf = make_conf(image_key="map_masked", image_channels=12,
                         image_categorical=True, map_key="map",
                         map_channels=12, map_categorical=True,
                         map_size=N, action_dim=3)
        rng = np.random.RandomState(0)
        masked = rng.randint(0, 12, (T, B, N, N)).astype(np.uint8)
        batch = {
            "map": rng.randint(0, 12, (T, B, N, N)).astype(np.uint8),
            "map_masked": masked,
            "action": rng.randint(0, 3, (T, B)),
            "reward": np.zeros((T, B), np.float32),
            "terminal": np.zeros((T, B), np.float32),
            "reset": np.zeros((T, B), bool),
        }
        out = Preprocessor.from_conf(conf).apply(batch)
        assert out["image"].shape == (T, B, N, N, 12)
        np.testing.assert_array_equal(out["image"].argmax(-1), masked)
        assert out["map"].dtype == np.int32  # probe target intact

    def test_seen_mask_probe_accuracy_activates(self):
        """End-to-end: minigrid-shaped data with map_vis flows through the
        Preprocessor into MapProbeHead and produces a finite acc_map_seen
        (the seen-mask accuracy the reference computes on MiniGrid data)."""
        import jax
        import jax.numpy as jnp
        from tests.util import make_conf
        from pydreamer_tpu.data import Preprocessor
        from pydreamer_tpu.models.probes import MapProbeHead

        T, B, I, N = 3, 2, 1, 7
        conf = make_conf(image_key=None, image_encoder=None, image_decoder=None,
                         map_key="map", map_size=N, map_channels=12,
                         map_categorical=True, map_decoder="dense",
                         map_hidden_dim=32, map_hidden_layers=1,
                         probe_model="map", action_dim=3)
        rng = np.random.RandomState(0)
        vis = rng.randint(0, 1000, (T, B, N, N)).astype(np.uint16)
        batch = {
            "map": rng.randint(0, 12, (T, B, N, N)).astype(np.uint8),
            "map_vis": vis,
            "agent_pos": rng.uniform(0, N, (T, B, 2)).astype(np.float32),
            "agent_dir": rng.uniform(-1, 1, (T, B, 2)).astype(np.float32),
            "action": rng.randint(0, 3, (T, B)),
            "reward": np.zeros((T, B), np.float32),
            "terminal": np.zeros((T, B), np.float32),
            "reset": np.zeros((T, B), bool),
        }
        pp = Preprocessor.from_conf(conf)
        out = pp.apply(batch)
        assert "map_seen_mask" in out and "map_vis" not in out
        np.testing.assert_array_equal(out["map_seen_mask"], (vis < 500))

        probe = MapProbeHead(16 + 4, conf)
        params = jax.jit(probe.init)(jax.random.PRNGKey(0))
        feats = jnp.zeros((T, B, I, 16))
        obs = {k: jnp.asarray(v) for k, v in out.items()
               if k in ("map", "map_coord", "map_seen_mask")}
        _, metrics, _ = probe.training_step(params, feats, obs)
        assert "acc_map_seen" in metrics
        assert np.isfinite(float(metrics["acc_map_seen"]))
