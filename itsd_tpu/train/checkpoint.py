"""Checkpoint save/restore via Orbax.

Upgrades the reference's per-epoch `torch.save(state_dict)`
(`/root/reference/Diffusion/Train.py:712-717`): the full training state —
params, EMA params, optimizer state, step — is checkpointed, so training
truly resumes (the reference never saves optimizer state; SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from .loop import TrainState


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, state: TrainState) -> None:
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }, force=True)


def restore_checkpoint(path: str, state: Optional[TrainState] = None
                       ) -> TrainState:
    """Restore into the structure of ``state`` (required for sharded or
    custom-dtype restores; None restores as plain arrays)."""
    path = _abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if state is not None:
            template = {
                "step": state.step,
                "params": state.params,
                "opt_state": state.opt_state,
                "ema_params": state.ema_params,
            }
            restored = ckptr.restore(path, item=template)
        else:
            restored = ckptr.restore(path)
    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"],
    )


class AsyncCheckpointManager:
    """Non-blocking checkpointing: saves run in a background thread while
    training continues (SURVEY §5 suggests async Orbax checkpointing for
    preemption-resilience; the reference blocks on torch.save each epoch)."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler())

    def save(self, path: str, state: TrainState) -> None:
        path = _abspath(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # one save in flight at a time (drains the previous one first)
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }, force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def save_params(path: str, params: Any) -> None:
    """Weights-only checkpoint (what the reference's eval paths load)."""
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def restore_params(path: str, template: Any = None) -> Any:
    path = _abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=template)
