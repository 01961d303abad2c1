"""Checkpoint save / auto-resume via Orbax.

Replaces helpers.save_model / auto_load_model (helpers.py:529-610): rolling
window of the latest N checkpoints keyed by epoch, resume restores
params + optimizer state + epoch.  Writes happen on process 0 only (Orbax
coordinates multi-host internally).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def _state_payload(state: Any) -> dict:
    payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "model_state", None):
        payload["model_state"] = state.model_state
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    return payload


def _state_from_payload(state: Any, restored: dict) -> Any:
    return state.replace(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"],
        model_state=restored.get("model_state", state.model_state),
        ema_params=restored.get("ema_params", getattr(state, "ema_params", None)),
    )


class CheckpointIO:
    def __init__(self, output_dir: str | Path, max_to_keep: int = 3, save_interval: int = 1):
        # NOTE: the save cadence is the *drivers'* job — they replicate the
        # reference's `(epoch + 1) % save_ckpt_freq == 0 or last` gate
        # (main_pretrain.py:354).  Orbax's own save_interval_steps must stay
        # at 1: its FixedIntervalPolicy accepts `epoch % interval == 0`,
        # which is misaligned with the driver's epochs (freq-1, 2*freq-1, …)
        # and would silently reject every non-initial save.
        self.directory = Path(output_dir).absolute() / "checkpoints"
        self.max_to_keep = max_to_keep
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, epoch: int, state: Any, extra: dict | None = None,
             loader_state: bytes | None = None):
        payload = _state_payload(state)
        if extra:
            payload["extra"] = extra
        saved = self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        if loader_state is not None and saved:
            # input-pipeline position (e.g. the Grain iterator state) rides
            # alongside the epoch checkpoint so a resumed run continues the
            # stream on exactly the next sample (the reference instead
            # restarts the epoch, helpers.py:568-610).  Each process owns a
            # per-host sharded stream, so each writes (and later restores)
            # its OWN position file — restoring process 0's state everywhere
            # would replay wrong shards on a pod.  Written only when the
            # manager actually saved (never orphaned from a checkpoint) and
            # atomically (tmp + rename) so a mid-write kill — the very event
            # mid-stream resume exists for — cannot leave a torn state file.
            target = self.directory / _loader_file(epoch)
            tmp = target.with_suffix(".bin.tmp")
            tmp.write_bytes(loader_state)
            os.replace(tmp, target)
            kept = sorted(
                int(p.stem.split("-")[1])
                for p in self.directory.glob("loader-*.bin")
                if p.name == _loader_file(int(p.stem.split("-")[1]))
            )
            for old in kept[: -self.max_to_keep]:
                (self.directory / _loader_file(old)).unlink(missing_ok=True)

    def loader_state(self, epoch: int) -> bytes | None:
        p = self.directory / _loader_file(epoch)
        return p.read_bytes() if p.exists() else None

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
        restored = self.manager.restore(
            epoch, args=ocp.args.StandardRestore(_state_payload(state))
        )
        return _state_from_payload(state, restored), epoch


def restore_explicit(state: Any, path: str | Path):
    """Honor an explicit ``--resume <path>`` (reference helpers.py:568-610
    loads ``args.resume`` when set, bypassing the auto-resume glob).

    ``path`` may be: a run output dir (containing ``checkpoints/``), a
    ``checkpoints`` root, or a specific epoch dir ``checkpoints/<N>``.
    Returns (state, epoch).  ``.pth`` resume is format-specific and handled by
    the drivers (params only, via torch_convert).
    """
    p = Path(path).absolute()
    if not p.exists():
        raise FileNotFoundError(f"--resume path does not exist: {p}")
    root, epoch = _resolve_ckpt_root(p)
    manager = ocp.CheckpointManager(root)
    epoch = manager.latest_step() if epoch is None else epoch
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints found under {root}")
    restored = manager.restore(epoch, args=ocp.args.StandardRestore(_state_payload(state)))
    state = _state_from_payload(state, restored)
    manager.close()
    return state, epoch


def _resolve_ckpt_root(p: Path) -> tuple[Path, int | None]:
    """Resolve an explicit ``--resume`` path to (CheckpointManager root,
    pinned epoch or None).  ``p`` may be a run output dir (containing
    ``checkpoints/``), a ``checkpoints`` root, or a specific epoch dir
    ``checkpoints/<N>``.  Shared by :func:`restore_explicit` and
    :func:`find_loader_state` so the model and its loader state always
    resolve to the same place."""
    if p.name.isdigit() and (p / "default").exists():  # CheckpointManager epoch dir
        return p.parent, int(p.name)
    if (p / "checkpoints").is_dir():
        return p / "checkpoints", None
    return p, None


def _loader_file(epoch: int) -> str:
    """Per-process loader-position filename.  Process 0 keeps the plain
    ``loader-<epoch>.bin`` name (single-host files stay readable); other
    processes get a ``-p<idx>`` suffix so every host round-trips its own
    sharded stream position."""
    idx = jax.process_index()
    return f"loader-{epoch}.bin" if idx == 0 else f"loader-{epoch}-p{idx}.bin"


def find_loader_state(path: str | Path, epoch: int) -> bytes | None:
    """Locate this process's ``loader-<epoch>[-pN].bin`` saved beside an
    explicit ``--resume`` checkpoint (same root-resolution rules as
    :func:`restore_explicit`)."""
    root, _ = _resolve_ckpt_root(Path(path).absolute())
    f = root / _loader_file(epoch)
    return f.read_bytes() if f.exists() else None


def save_params(path: str | Path, params: Any):
    """One-shot params-only save (for released-checkpoint style artifacts);
    overwrites an existing checkpoint (e.g. checkpoint-best on resume)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | Path, target: Any | None = None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=target)
