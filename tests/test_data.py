"""Data plane tests: repository contract, TBTT dataset semantics, preprocessing."""

import numpy as np
import pytest

from pydreamer_tpu.data import (NpzEpisodeRepository, Preprocessor,
                                SequentialDataset, ParallelLoader)
from pydreamer_tpu.data.repository import build_episode_name, parse_episode_name


def make_episode(n_steps, action_dim=4, image_size=8, seed=0, reward=1.0):
    """One episode in the generator's save format (reset=True at start)."""
    rng = np.random.RandomState(seed)
    n = n_steps + 1  # +1 for the reset step
    return {
        "image": rng.randint(0, 255, (n, image_size, image_size, 3), dtype=np.uint8),
        "action": np.eye(action_dim, dtype=np.float32)[rng.randint(0, action_dim, n)],
        "reward": np.full(n, reward, np.float32),
        "terminal": np.concatenate([np.zeros(n - 1), np.ones(1)]).astype(np.float32),
        "reset": np.concatenate([[True], np.zeros(n - 1, bool)]),
    }


class TestFilenameContract:
    def test_roundtrip(self):
        name = build_episode_name(12, 34, 56.7, 890)
        assert name == "ep000012_000034-r57-0890.npz"
        assert parse_episode_name(name) == (12, 34, 890)

    def test_chunked(self):
        name = build_episode_name(1, 2, -3.0, 45, chunk_seq=7)
        assert parse_episode_name(name) == (1, 2, 45)

    def test_foreign_name(self):
        assert parse_episode_name("1639text-100.npz") == (0, 0, 100)


class TestRepository:
    def test_save_list_load_count(self, tmp_path):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        ep = make_episode(50)
        repo.save_data(ep, 0, 0)
        repo.save_data(make_episode(30, seed=1), 1, 1)
        files = repo.list_files()
        assert len(files) == 2
        nfiles, steps, episodes = repo.count_steps()
        assert nfiles == 2
        assert steps == 80  # resets don't count as steps
        assert episodes == 2
        data = files[0].load_data()
        assert set(data) >= {"image", "action", "reward", "terminal", "reset"}

    def test_multi_dir_read(self, tmp_path):
        r1 = NpzEpisodeRepository(tmp_path / "a")
        r2 = NpzEpisodeRepository(tmp_path / "b")
        r1.save_data(make_episode(10), 0, 0)
        r2.save_data(make_episode(10, seed=1), 1, 1)
        both = NpzEpisodeRepository([tmp_path / "a", tmp_path / "b"])
        assert len(both.list_files()) == 2


class TestSequentialDataset:
    def _repo(self, tmp_path, episodes=4, steps=40):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        for i in range(episodes):
            repo.save_data(make_episode(steps, seed=i), i, i)
        return repo

    def test_batch_shapes_and_temporal_order(self, tmp_path):
        repo = self._repo(tmp_path)
        T, B = 10, 3
        ds = SequentialDataset(repo, T, B, skip_first=False, seed=0)
        it = iter(ds)
        b1 = next(it)
        assert b1["reward"].shape == (T, B)
        assert b1["image"].shape[:2] == (T, B)
        assert b1["action_next"].shape == (T, B, 4)
        # Temporal order within a slot: action_next[t] == action[t+1]
        b2 = next(it)
        np.testing.assert_array_equal(b1["action_next"][:-1], b1["action"][1:])

    def test_tbtt_continuity_across_batches(self, tmp_path):
        """Consecutive batches of one slot continue the same episode."""
        repo = NpzEpisodeRepository(tmp_path / "eps")
        ep = make_episode(40, seed=0)
        ep["image"][:, 0, 0, 0] = np.arange(41)  # tag steps
        repo.save_data(ep, 0, 0)
        ds = SequentialDataset(repo, 10, 1, skip_first=False, seed=0,
                               allow_mid_reset=True)
        it = ds.iter_single(0)
        b1, b2 = next(it), next(it)
        assert b1["image"][-1, 0, 0, 0] + 1 == b2["image"][0, 0, 0, 0]

    def test_reset_on_file_start(self, tmp_path):
        repo = self._repo(tmp_path)
        ds = SequentialDataset(repo, 10, 2, skip_first=False, seed=0)
        batch = next(iter(ds))
        assert batch["reset"][0].all()
        assert (batch["reward"][0] == 0).all()  # reward zeroed at reset

    def test_skips_too_short_files(self, tmp_path):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        repo.save_data(make_episode(3), 0, 0)   # too short for T=10
        repo.save_data(make_episode(30, seed=1), 1, 1)
        ds = SequentialDataset(repo, 10, 1, skip_first=False, seed=0)
        batch = next(iter(ds))  # must not crash, must come from the long file
        assert batch["reward"].shape == (10, 1)

    def test_buffer_size_keeps_recent(self, tmp_path):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        for i in range(10):
            repo.save_data(make_episode(100, seed=i), i, i)
        ds = SequentialDataset(repo, 10, 1, buffer_size=350, seed=0)
        # newest-first: keeps files until cumulative steps exceed buffer
        assert len(ds.files) <= 4
        kept_eps = {f.episode_to for f in ds.files}
        assert max(kept_eps) == 9  # newest kept

    def test_randomize_resets(self, tmp_path):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        repo.save_data(make_episode(500, seed=0), 0, 0)
        ds = SequentialDataset(repo, 10, 1, skip_first=False,
                               reset_interval=50, seed=0)
        resets = []
        it = ds.iter_single(0)
        for _ in range(30):
            b = next(it)
            resets.append(b["reset"][0])
        # With reset_interval=50 on a 500-step episode, some windows beyond
        # the first must start with an injected reset.
        assert sum(resets) >= 2

    def test_randomize_resets_distribution(self, tmp_path):
        """Property test of randomize_resets against the written spec:
        per episode of length n, the chunk count must be U{1..n//interval+1},
        every chunk at least batch_length long, and cut positions uniform
        over the admissible slack. Checked by invariants plus a moment
        comparison against a direct spec-sampler over many draws."""
        repo = NpzEpisodeRepository(tmp_path / "eps")
        repo.save_data(make_episode(30, seed=0), 0, 0)
        ds = SequentialDataset(repo, 10, 1, skip_first=False, seed=123)

        interval, T = 40, 10
        n1, n2 = 130, 95  # two episodes
        resets = np.zeros(n1 + n2, bool)
        resets[0] = resets[n1] = True

        rng_spec = np.random.default_rng(7)

        def spec_counts(n):
            """Chunk-count sampler straight from the spec (distribution only)."""
            kmax = n // interval + 1
            k = int(rng_spec.integers(1, kmax + 1))
            return k if (k == 1 or n - T * k > 0) else 1

        draws, spec_draws = [], []
        positions = []
        for _ in range(400):
            rr = ds.randomize_resets(resets, interval, T)
            assert not rr[resets].any()  # never coincides with real resets
            for start, end in ((0, n1), (n1, n1 + n2)):
                idx = np.flatnonzero(rr[start:end])
                # invariant: all chunks >= batch_length
                bounds = np.concatenate([[0], idx, [end - start]])
                assert (np.diff(bounds) >= T).all()
                draws.append(len(idx) + 1)
                spec_draws.append(spec_counts(end - start))
                positions.extend((idx - T) / (end - start))
        # Moment match between implementation and spec-sampler.
        assert abs(np.mean(draws) - np.mean(spec_draws)) < 0.15
        assert abs(np.std(draws) - np.std(spec_draws)) < 0.15
        # Cut positions spread across the episodes, not clustered at an edge.
        assert 0.2 < np.mean(positions) < 0.65


class TestPreprocessor:
    def test_uint8_image_passthrough(self):
        """uint8 images stay uint8 on host; the [-0.5,0.5] conversion runs
        on-device in the jitted step (models/dreamer.py prepare_obs)."""
        pp = Preprocessor(action_dim=4)
        batch = {
            "image": np.full((5, 2, 8, 8, 3), 255, np.uint8),
            "action": np.zeros((5, 2, 4), np.float32),
            "reward": np.ones((5, 2), np.float32),
            "terminal": np.zeros((5, 2)),
            "reset": np.zeros((5, 2), bool),
        }
        out = pp.apply(batch)
        assert out["image"].dtype == np.uint8
        assert out["image"].shape == (5, 2, 8, 8, 3)  # HWC preserved (NHWC)

        import jax.numpy as jnp
        from pydreamer_tpu.models.dreamer import prepare_obs
        dev = prepare_obs({"image": jnp.asarray(out["image"])})
        assert dev["image"].dtype == jnp.float32
        np.testing.assert_allclose(float(dev["image"].max()), 0.5)

    def test_float_image_normalized(self):
        pp = Preprocessor(action_dim=4)
        batch = {
            "image": np.full((2, 1, 4, 4, 3), 0.5, np.float64),
            "action": np.zeros((2, 1, 4), np.float32),
            "reward": np.zeros((2, 1), np.float32),
            "terminal": np.zeros((2, 1)),
            "reset": np.zeros((2, 1), bool),
        }
        out = pp.apply(batch)
        assert out["image"].dtype == np.float32

    def test_categorical_image_onehot(self):
        pp = Preprocessor(action_dim=4, image_categorical=6)
        batch = {
            "image": np.random.randint(0, 6, (5, 2, 7, 7)),
            "action": np.random.randint(0, 4, (5, 2)),
            "reward": np.zeros((5, 2), np.float32),
            "terminal": np.zeros((5, 2)),
            "reset": np.zeros((5, 2), bool),
        }
        out = pp.apply(batch)
        assert out["image"].shape == (5, 2, 7, 7, 6)  # class axis LAST
        np.testing.assert_allclose(out["image"].sum(-1), 1.0)
        assert out["action"].shape == (5, 2, 4)  # int -> one-hot

    def test_reward_clip_tanh(self):
        pp = Preprocessor(image_key=None, action_dim=2, clip_rewards="tanh")
        batch = {
            "action": np.zeros((3, 1, 2), np.float32),
            "reward": np.full((3, 1), 10.0, np.float32),
            "terminal": np.zeros((3, 1)),
            "reset": np.zeros((3, 1), bool),
        }
        out = pp.apply(batch)
        np.testing.assert_allclose(out["reward"], np.tanh(10.0), rtol=1e-6)

    def test_expand_tb_single_step(self):
        pp = Preprocessor(action_dim=3)
        obs = {
            "image": np.zeros((8, 8, 3), np.uint8),
            "action": np.zeros(3, np.float32),
            "reward": np.array(0.0),
            "terminal": np.array(False),
            "reset": np.array(True),
        }
        out = pp.apply(obs, expandTB=True)
        assert out["image"].shape == (1, 1, 8, 8, 3)
        assert out["reward"].shape == (1, 1)


class TestParallelLoader:
    def test_inline_and_threaded(self, tmp_path):
        repo = NpzEpisodeRepository(tmp_path / "eps")
        for i in range(3):
            repo.save_data(make_episode(40, seed=i), i, i)

        def make_stream(worker_id):
            ds = SequentialDataset(repo, 8, 2, seed=worker_id)
            return iter(ds)

        inline = ParallelLoader(make_stream, num_workers=0)
        b, wid = next(iter(inline))
        assert wid == 0 and b["reward"].shape == (8, 2)

        # Arrival-order mode: batches flow, wids valid (which worker wins a
        # slot is scheduler-dependent, so no distribution assertion).
        threaded = ParallelLoader(make_stream, num_workers=2)
        it = iter(threaded)
        for _ in range(8):
            b, wid = next(it)
            assert wid in (0, 1)
            assert b["reward"].shape == (8, 2)
        threaded.close()

        # strict_order: deterministic round-robin regardless of scheduling
        # (the multi-host requirement).
        ordered = ParallelLoader(make_stream, num_workers=2, strict_order=True)
        it = iter(ordered)
        wids = [next(it)[1] for _ in range(6)]
        ordered.close()
        assert wids == [0, 1, 0, 1, 0, 1]
