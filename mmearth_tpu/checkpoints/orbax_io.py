"""Checkpoint save / auto-resume via Orbax.

Replaces helpers.save_model / auto_load_model (helpers.py:529-610): rolling
window of the latest N checkpoints keyed by epoch, resume restores
params + optimizer state + epoch.  Writes happen on process 0 only (Orbax
coordinates multi-host internally).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointIO:
    def __init__(self, output_dir: str | Path, max_to_keep: int = 3, save_interval: int = 1):
        self.directory = Path(output_dir).absolute() / "checkpoints"
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                create=True,
            ),
        )

    def save(self, epoch: int, state: Any, extra: dict | None = None):
        payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if getattr(state, "model_state", None):
            payload["model_state"] = state.model_state
        if extra:
            payload["extra"] = extra
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))

    def wait(self):
        self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state: Any, epoch: int | None = None):
        """Restore into the structure of ``state``; returns (state, epoch).
        ``state`` must be a freshly-created TrainState (the target tree)."""
        epoch = self.latest_epoch() if epoch is None else epoch
        if epoch is None:
            return state, None
        target = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        if getattr(state, "model_state", None):
            target["model_state"] = state.model_state
        restored = self.manager.restore(epoch, args=ocp.args.StandardRestore(target))
        state = state.replace(
            params=restored["params"], opt_state=restored["opt_state"], step=restored["step"],
            model_state=restored.get("model_state", state.model_state),
        )
        return state, epoch


def save_params(path: str | Path, params: Any):
    """One-shot params-only save (for released-checkpoint style artifacts);
    overwrites an existing checkpoint (e.g. checkpoint-best on resume)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | Path, target: Any | None = None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=target)
