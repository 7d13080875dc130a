"""Checkpoint / resume via orbax.

Reproduces the reference checkpoint contract (dist_train.py:89-127, 212-233;
train/topdown_trainer.py:9-17): periodic `checkpoint` saves every
``CHECKPOINT.interval`` epochs, a `best` save gated on minimum validation
loss (or a metric), and resume restoring state + epoch + the serialized
config (cross-checked on restore). The reference's rank-0
write/barrier/all-load dance for consistent init (dist_train.py:113-127) is
unnecessary here — a shared PRNGKey makes init identical everywhere.

Output tree mirrors the reference (utils/misc.py:9-33):
``save_root/<dataset>/<model>/<ID>/{checkpoint,best}``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def run_dir(cfg) -> str:
    return os.path.join(
        cfg.CHECKPOINT.get("save_root", "checkpoints/"),
        str(cfg.DATASET.name),
        str(cfg.MODEL.name),
        str(cfg.get("ID", 0)),
    )


class CheckpointManager:
    """Thin orbax wrapper with `latest` + `best` slots."""

    def __init__(self, directory: str, cfg: Optional[Any] = None,
                 read_only: bool = False):
        """``read_only=True`` is for consumers that only restore (demo,
        weight analysis): no directory creation, and the run's recorded
        config.json is never overwritten — it stays the training run's."""
        self.directory = os.path.abspath(directory)
        if not read_only:
            os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.cfg = cfg
        if cfg is not None:
            cfg_path = os.path.join(self.directory, "config.json")
            # cross-check BEFORE overwriting (reference dist_train.py:102-103
            # compares the checkpointed cfg on resume): blindly rewriting
            # config.json first would make the resume-time ID check compare
            # the new config against itself and always pass
            if os.path.exists(cfg_path):
                try:
                    with open(cfg_path) as f:
                        saved_id = json.load(f).get("ID")
                except (OSError, ValueError):
                    saved_id = None
                if saved_id is not None and saved_id != cfg.get("ID"):
                    raise ValueError(
                        f"run directory {self.directory} belongs to config "
                        f"ID={saved_id}, not ID={cfg.get('ID')} — refusing "
                        "to mix experiments in one run dir"
                    )
            if not read_only and jax.process_index() == 0:
                with open(cfg_path, "w") as f:
                    json.dump(cfg.to_dict(), f, indent=2, default=str)

    def _slot(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state, epoch: int, min_val_loss: float = float("inf"),
             best: bool = False, wait: bool = False):
        meta = {
            "epoch": epoch,
            "min_val_loss": float(min_val_loss),
            "step": int(state.step),
        }
        name = "best" if best else "checkpoint"
        path = self._slot(name)
        # collective: EVERY process must call save (orbax barriers
        # internally and elects the primary writer); only the chief
        # writes the side-car meta file
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f)

    def restore(self, state_template, best: bool = False):
        """Restore (state, meta). Returns (None, None) when absent."""
        return self._restore(state_template, best)

    def restore_raw(self, best: bool = False):
        """Restore (pytree-of-dicts, meta) without a typed template.

        For read-only consumers (demo, weight analysis) that only need
        `params`/`batch_stats` and must not depend on how the training run
        was configured (crit_params, loss_scaler, optimizer tree).
        """
        return self._restore(None, best)

    def _restore(self, state_template, best: bool):
        name = "best" if best else "checkpoint"
        path = self._slot(name)
        if not os.path.exists(path):
            return None, None
        state = self._ckptr.restore(path, state_template)
        meta_path = path + ".meta.json"
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        if self.cfg is not None:
            cfg_path = os.path.join(self.directory, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    saved = json.load(f)
                saved_id = saved.get("ID")
                if saved_id is not None and saved_id != self.cfg.get("ID"):
                    raise ValueError(
                        f"checkpoint config ID {saved_id} != cfg ID "
                        f"{self.cfg.get('ID')} (reference cross-check, "
                        "dist_train.py:102-103)"
                    )
        return state, meta
