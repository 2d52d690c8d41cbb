"""Run tracking: params, metrics, artifacts, checkpoints.

The reference uses an MLflow tracking server as the single pane of glass and
the artifact store as actor<->learner transport (reference: pydreamer/tools.py:
49-197, SURVEY §5.5/§5.8). This module provides the same contract with a
filesystem-first design:

  * ``Run`` — a directory holding params.json, metrics.jsonl, artifacts/,
    episodes/, checkpoints/. On cloud TPU VMs the run dir can live on an
    NFS/GCS-fuse mount, giving the same multi-host decoupling as MLflow.
  * resume-by-id: ``init_run(resume_id=...)`` finds or creates the run with
    that tag, so restarted jobs continue the same run (tools.py:66-90)
  * subprocesses join the parent run via the ``PYDREAMER_RUN_DIR`` env var
    (the reference does this with MLFLOW_RUN_ID, tools.py:60-63,92)
  * checkpoint = policy-distribution channel: the learner writes
    ``checkpoints/latest.ckpt`` atomically; actors poll it (tools.py:164-197)

If mlflow is importable and MLFLOW_TRACKING_URI is set, metrics/params are
mirrored to MLflow as well (gated, optional).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from .tools import logger

__all__ = ["Run", "init_run", "save_checkpoint_file", "load_checkpoint_file"]


def _atomic_write(path: Path, data: bytes):
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint_file(path: Union[str, Path], state: Any, step: int):
    """Serialize a pytree train state + step to one atomic file."""
    import flax.serialization
    import jax
    payload = {
        "step": int(step),
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
    }
    _atomic_write(Path(path), flax.serialization.msgpack_serialize(payload))


def load_checkpoint_file(path: Union[str, Path], target: Any = None
                         ) -> Optional[Tuple[Any, int]]:
    """-> (state, step) or None if missing/corrupt. With a ``target`` pytree
    the stored dicts are restored onto its structure (optax states etc.)."""
    import flax.serialization
    path = Path(path)
    if not path.exists():
        return None
    try:
        payload = flax.serialization.msgpack_restore(path.read_bytes())
    except Exception:
        logger.exception("Failed to read checkpoint %s", path)
        return None
    state = payload["state"]
    if target is not None:
        state = flax.serialization.from_state_dict(target, state)
    return state, int(payload["step"])


class Run:
    """One training run rooted at a directory."""

    def __init__(self, run_dir: Union[str, Path], resume_id: Optional[str] = None):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.id = self.dir.name
        meta = self.dir / "meta.json"
        if not meta.exists():
            _atomic_write(meta, json.dumps({
                "run_id": self.id,
                "resume_id": resume_id,
                "created": time.time(),
            }).encode())
        self._metrics_path = self.dir / "metrics.jsonl"
        self._mlflow = _maybe_mlflow(self.id)

    # -- layout -----------------------------------------------------------

    def artifact_dir(self, subdir: str = "") -> Path:
        p = self.dir / subdir if subdir else self.dir
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def checkpoint_path(self) -> Path:
        return self.dir / "checkpoints" / "latest.ckpt"

    # -- params / metrics -------------------------------------------------

    def log_params(self, params: Dict[str, Any]):
        _atomic_write(self.dir / "params.json",
                      json.dumps(params, default=str, indent=2).encode())
        if self._mlflow:
            try:
                import mlflow
                items = list(params.items())
                for i in range(0, len(items), 100):
                    mlflow.log_params(dict(items[i:i + 100]))
            except Exception:
                logger.exception("mlflow param logging failed")

    def log_metrics(self, metrics: Dict[str, float], step: int):
        rec = {"_step": int(step), "_timestamp": time.time()}
        rec.update({k: float(v) for k, v in metrics.items() if _is_finite(v)})
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._mlflow:
            try:
                import mlflow
                mlflow.log_metrics({k: v for k, v in rec.items()
                                    if not k.startswith("_")}, step=step)
            except Exception:
                logger.exception("mlflow metric logging failed")

    def read_metrics(self) -> List[Dict[str, float]]:
        if not self._metrics_path.exists():
            return []
        out = []
        with open(self._metrics_path) as f:
            for line in f:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        return out

    # -- artifacts --------------------------------------------------------

    def log_npz(self, data: Dict[str, np.ndarray], name: str, subdir: str = "artifacts"):
        path = self.artifact_dir(subdir) / name
        fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **data)
        os.replace(tmp, path)

    def load_npz(self, name: str, subdir: str = "artifacts") -> Dict[str, np.ndarray]:
        with np.load(self.artifact_dir(subdir) / name) as npz:
            return {k: npz[k] for k in npz.files}

    def log_text(self, text: str, name: str):
        _atomic_write(self.dir / name, text.encode())

    # -- checkpoints ------------------------------------------------------

    def save_checkpoint(self, state: Any, step: int):
        save_checkpoint_file(self.checkpoint_path, state, step)

    def load_checkpoint(self, target: Any = None) -> Optional[Tuple[Any, int]]:
        return load_checkpoint_file(self.checkpoint_path, target)


def _is_finite(v) -> bool:
    try:
        return bool(np.isfinite(v))
    except Exception:
        return False


def _maybe_mlflow(run_name: str):
    if not os.environ.get("MLFLOW_TRACKING_URI"):
        return None
    try:
        import mlflow
        mlflow.start_run(run_name=run_name)
        return True
    except Exception:
        logger.warning("MLFLOW_TRACKING_URI set but mlflow unavailable")
        return None


def init_run(run_dir: Optional[str] = None,
             root_dir: str = "./runs",
             resume_id: Optional[str] = None,
             wait_for_resume: bool = False) -> Run:
    """Create or join a run (reference: tools.py:49-93 ``mlflow_init``).

    Resolution order:
      1. explicit ``run_dir`` argument
      2. ``PYDREAMER_RUN_DIR`` env (subprocesses join the parent run)
      3. ``resume_id``: search root_dir for a run with that tag; with
         ``wait_for_resume`` (non-main distributed workers) poll until the
         main worker creates it
      4. fresh run under root_dir
    """
    env_dir = os.environ.get("PYDREAMER_RUN_DIR")
    if run_dir is None and env_dir:
        run_dir = env_dir

    if run_dir is None and resume_id:
        root = Path(root_dir)
        while True:
            if root.exists():
                for d in sorted(root.iterdir()):
                    meta = d / "meta.json"
                    if meta.exists():
                        try:
                            if json.loads(meta.read_text()).get("resume_id") == resume_id:
                                run_dir = str(d)
                                break
                        except json.JSONDecodeError:
                            pass
            if run_dir or not wait_for_resume:
                break
            logger.info("Waiting for main worker to create run (resume_id=%s)...", resume_id)
            time.sleep(10)

    if run_dir is None:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        run_dir = str(Path(root_dir) / f"{stamp}_{uuid.uuid4().hex[:6]}")

    run = Run(run_dir, resume_id=resume_id)
    os.environ["PYDREAMER_RUN_DIR"] = str(run.dir)
    logger.info("Run dir: %s", run.dir)
    return run
