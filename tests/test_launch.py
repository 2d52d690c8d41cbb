"""Launcher unit tests: multi-node role selection + watchdog.

Covers the TF_CONFIG chief/worker role mapping (reference: launch.py:181-210)
without spawning any processes.
"""

import json
import multiprocessing as mp
import time

import pytest

from pydreamer_tpu.launch import (belongs_to_worker, check_subprocesses,
                                  get_worker_info)


@pytest.fixture
def clean_tf_config(monkeypatch):
    monkeypatch.delenv("TF_CONFIG", raising=False)
    return monkeypatch


class TestWorkerInfo:
    def test_no_tf_config_means_single_node(self, clean_tf_config):
        assert get_worker_info() == (None, None)
        # Single node runs everything locally.
        assert belongs_to_worker("learner", 0)
        assert belongs_to_worker("generator", 3)

    def test_chief_is_learner(self, clean_tf_config):
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"], "worker": ["w0:1", "w1:1"]},
            "task": {"type": "chief", "index": 0},
        }))
        assert get_worker_info() == ("learner", 0)
        assert belongs_to_worker("learner", 0)
        assert not belongs_to_worker("generator", 0)

    def test_worker_is_generator_with_index(self, clean_tf_config):
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"], "worker": ["w0:1", "w1:1"]},
            "task": {"type": "worker", "index": 1},
        }))
        assert get_worker_info() == ("generator", 1)
        assert belongs_to_worker("generator", 1)
        assert not belongs_to_worker("generator", 0)
        assert not belongs_to_worker("learner", 0)

    def test_empty_worker_list_means_single_node(self, clean_tf_config):
        # Vertex single-node jobs set TF_CONFIG without workers.
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"]},
            "task": {"type": "chief", "index": 0},
        }))
        assert get_worker_info() == (None, None)


def _exit_zero():
    pass


def _exit_nonzero():
    raise SystemExit(3)


class TestWatchdog:
    def _run(self, target):
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=target)
        p.start()
        p.join(timeout=30)
        assert not p.is_alive()
        return p

    def test_clean_exit_removed_from_watch_list(self):
        p = self._run(_exit_zero)
        procs = [p]
        check_subprocesses(procs)
        assert procs == []

    def test_nonzero_exit_raises(self):
        p = self._run(_exit_nonzero)
        with pytest.raises(RuntimeError, match="exitcode"):
            check_subprocesses([p])
