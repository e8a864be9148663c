"""Orbax checkpointing of (params, opt state, step, PRNG key).

Replaces the reference's `tf.train.Checkpoint` + `CheckpointManager`
(`diffusion_training.py:353-363`, max_to_keep=3, save every 1000 steps,
restore-latest-by-directory UX).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from diffusionsat_tpu.train.loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": np.asarray(step),
             "key": jax.random.key_data(state.key)}))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: TrainState) -> TrainState | None:
        """Restore the latest checkpoint into the template's structure."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = {"params": template.params, "opt_state": template.opt_state,
                  "step": np.asarray(int(template.step)),
                  "key": jax.random.key_data(template.key)}
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        return TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jax.numpy.asarray(int(restored["step"]), jax.numpy.int32),
            key=jax.random.wrap_key_data(restored["key"]))

    def close(self):
        self._mgr.close()
