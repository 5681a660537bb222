"""Atomic train-state checkpointing.

The reference's resume story is a crude fast-forward replay of optimizer/LR
steps (reference: scripts/train_unet.py:216-224) plus a full pipeline
``save_pretrained`` every N epochs. On TPU, preemption is routine, so the full
train state (params + optimizer + EMA + step) checkpoints atomically and
restores exactly — including the data stream: epoch shuffles derive from
(seed, epoch) and mid-epoch resume skips exactly the steps already taken
(data.dataset.epoch_rng / loop.py), so a resumed run replays the straight
run's batch sequence (SURVEY.md §5.3-5.4).

Two backends:

* ``msgpack`` (default): ``flax.serialization`` bytes written with a
  tmp-file + atomic-rename protocol and ``max_to_keep`` pruning. Dependable on
  every JAX platform (orbax's async device-to-host path deadlocks on some
  experimental PJRT backends, observed on this environment's TPU tunnel).
* ``orbax``: the standard multi-host-aware path for production TPU pods.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
from flax import serialization

_STATE_FILE = "state.msgpack"


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, backend: str = "msgpack"):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        self.backend = backend
        os.makedirs(self.directory, exist_ok=True)
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
            )

    # ----------------------------------------------------------------- steps
    def all_steps(self):
        if self.backend == "orbax":
            return sorted(self._mgr.all_steps())
        steps = []
        for name in os.listdir(self.directory):
            full = os.path.join(self.directory, name)
            if name.isdigit() and os.path.exists(os.path.join(full, _STATE_FILE)):
                steps.append(int(name))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # ------------------------------------------------------------------ save
    def save(self, step: int, state) -> None:
        if self.backend == "orbax":
            self._mgr.save(step, args=_orbax_args().StandardSave(state))
            self._mgr.wait_until_finished()
            return
        host_state = jax.device_get(state)
        data = serialization.to_bytes(host_state)
        final_dir = os.path.join(self.directory, str(step))
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        with open(os.path.join(tmp_dir, _STATE_FILE), "wb") as fh:
            fh.write(data)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp_dir, final_dir)  # atomic publish
        for old in self.all_steps()[: -self.max_to_keep]:
            shutil.rmtree(os.path.join(self.directory, str(old)), ignore_errors=True)

    # --------------------------------------------------------------- restore
    def restore(self, template, step: Optional[int] = None):
        """Restore into a state shaped like ``template``; None if empty."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if self.backend == "orbax":
            return self._mgr.restore(step, args=_orbax_args().StandardRestore(template))
        with open(os.path.join(self.directory, str(step), _STATE_FILE), "rb") as fh:
            return serialization.from_bytes(template, fh.read())


def _orbax_args():
    import orbax.checkpoint as ocp

    return ocp.args


# Backwards-compatible helpers used by the training loop.
def make_manager(directory: str, max_to_keep: int = 3, backend: str = "msgpack") -> CheckpointManager:
    return CheckpointManager(directory, max_to_keep, backend)


def save_train_state(manager: CheckpointManager, step: int, state) -> None:
    manager.save(step, state)


def restore_train_state(manager: CheckpointManager, template, step: Optional[int] = None):
    return manager.restore(template, step)
