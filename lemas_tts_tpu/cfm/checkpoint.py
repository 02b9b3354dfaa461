"""Training checkpoints: orbax-backed save/resume with the reference policy.

The reference is load-only (SURVEY.md §5 checkpoint/resume); its save policy
exists only as config fields (``configs/multilingual_grl.yaml:72-78``:
``save_per_updates``, ``keep_last_n_checkpoints``, ``last_per_updates``).
This module implements that policy natively:

 - ``model_<step>`` snapshots every ``save_per_updates`` steps, pruned to
   ``keep_last_n_checkpoints`` (−1 = keep all);
 - a rolling ``model_last`` every ``last_per_updates`` steps (resume point);
 - EMA params saved alongside raw params (the reference ships EMA weights
   under ``ema_model.*`` keys, ``utils_infer.py:223-237``).
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax

from lemas_tts_tpu.config import TrainConfig


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """Classic EMA: ema ← decay·ema + (1−decay)·params (jit-friendly)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )


class CheckpointManager:
    """Orbax StandardCheckpointer + reference save policy."""

    def __init__(self, directory: str, cfg: TrainConfig = TrainConfig()):
        import orbax.checkpoint as ocp

        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        self._ckptr = ocp.StandardCheckpointer()

    # ----------------------------------------------------------------- paths
    def _snap_path(self, step: int) -> Path:
        return self.dir / f"model_{step}"

    @property
    def last_path(self) -> Path:
        return self.dir / "model_last"

    def snapshots(self) -> Dict[int, Path]:
        out = {}
        for p in self.dir.iterdir():
            m = re.fullmatch(r"model_(\d+)", p.name)
            if m:
                out[int(m.group(1))] = p
        return dict(sorted(out.items()))

    # ------------------------------------------------------------------ save
    @staticmethod
    def _sync(tag: str) -> None:
        """Barrier across hosts (no-op single-process)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _write(self, path: Path, payload: Any) -> None:
        # multi-host: only process 0 clears the old directory, everyone then
        # participates in the collective orbax save (sharded arrays need each
        # host's shards) — the barrier keeps the rmtree from racing the save.
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        self._sync(f"ckpt_clear:{path.name}")
        self._ckptr.save(path.resolve(), payload, force=True)
        self._ckptr.wait_until_finished()

    def maybe_save(self, step: int, params: Any, ema_params: Any,
                   opt_state: Any = None) -> Optional[Path]:
        """Apply the save policy at ``step``. Returns the snapshot path when
        one was written."""
        written = None
        payload = {"step": step, "params": params, "ema_params": ema_params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        keep = self.cfg.keep_last_n_checkpoints
        if (self.cfg.save_per_updates > 0
                and step % self.cfg.save_per_updates == 0
                and keep != 0):  # keep==0: don't write a snapshot only for
            # _prune to delete it moments later (multi-GB wasted I/O)
            written = self._snap_path(step)
            self._write(written, payload)
            self._prune()
        if self.cfg.last_per_updates > 0 and step % self.cfg.last_per_updates == 0:
            self._write(self.last_path, payload)
            if jax.process_index() == 0:  # tiny sidecar: latest_step() can
                # read the step without restoring the multi-GB payload
                (self.last_path / "STEP.txt").write_text(str(step))
        return written

    def _prune(self) -> None:
        keep = self.cfg.keep_last_n_checkpoints
        if keep is None or keep < 0:
            return
        if jax.process_index() == 0:  # one host deletes; others wait
            snaps = self.snapshots()
            for step in list(snaps)[: max(0, len(snaps) - keep)]:
                shutil.rmtree(snaps[step])
        self._sync("ckpt_prune")

    # --------------------------------------------------------------- restore
    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        """Restore a snapshot (default: ``model_last``, else newest)."""
        if step is not None:
            path = self._snap_path(step)
        elif self.last_path.exists():
            path = self.last_path
        else:
            snaps = self.snapshots()
            if not snaps:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
            path = snaps[max(snaps)]
        if target is not None:
            return self._ckptr.restore(path.resolve(), target)
        return self._ckptr.restore(path.resolve())

    def latest_step(self) -> Optional[int]:
        """Newest resumable step: numbered snapshots win; otherwise read the
        step stored inside ``model_last`` (a last_per_updates-only run has no
        numbered snapshots but IS resumable)."""
        snaps = self.snapshots()
        if snaps:
            return max(snaps)
        step_file = self.last_path / "STEP.txt"
        if step_file.exists():
            try:
                return int(step_file.read_text().strip())
            except ValueError:
                return None
        if self.last_path.exists():
            try:  # older dirs without the sidecar: read the stored payload
                return int(self._ckptr.restore(self.last_path.resolve())["step"])
            except Exception:
                return None
        return None
