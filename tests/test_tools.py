"""tools.py unit tests: Timer accumulation, discount, print_once."""

import numpy as np

from pydreamer_tpu.tools import Timer, discount, timers_summary


class TestTimer:
    def test_accumulates_across_instances(self):
        """Fresh `with Timer(name)` per loop iteration (the trainer's usage)
        must accumulate into one per-name series, not reset it."""
        timers_summary(reset=True)  # clean slate
        for _ in range(3):
            with Timer("phase_a"):
                pass
            with Timer("phase_b"):
                pass
        assert len(Timer.registry["phase_a"]) == 3
        out = timers_summary(reset=True)
        assert "timer_phase_a" in out and "timer_phase_b" in out
        assert out["timer_phase_a"] >= 0.0
        # reset drained the window
        out2 = timers_summary()
        assert "timer_phase_a" not in out2

    def test_dt_mean(self):
        timers_summary(reset=True)
        t = Timer("phase_c")
        with t:
            pass
        with Timer("phase_c"):
            pass
        assert t.dt_mean == np.mean(Timer.registry["phase_c"])
        timers_summary(reset=True)


def test_discount():
    x = np.array([1.0, 0.0, 0.0, 1.0])
    out = discount(x, gamma=0.5)
    np.testing.assert_allclose(out, [1.125, 0.25, 0.5, 1.0], rtol=1e-6)


def test_persistent_compilation_cache(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache points JAX at a shared on-disk
    cache so relaunched processes (learner recycles, resumed segments) skip
    recompilation."""
    import jax
    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_compilation_cache(str(tmp_path / "cache"))
        assert d == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == d
        import os
        assert os.path.isdir(d)
        # env-var resolution
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
        assert enable_persistent_compilation_cache() == str(tmp_path / "env")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
