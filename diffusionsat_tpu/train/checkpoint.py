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


def _flatten_params(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_params(flat: dict[str, np.ndarray]) -> Any:
    nested: dict = {}
    for path, arr in flat.items():
        node = nested
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr

    def finalize(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [finalize(node[k]) for k in sorted(node, key=int)]
        return {k: finalize(v) for k, v in node.items()}

    return finalize(nested)


def export_params(params: Any, path: str | Path,
                  meta: dict | None = None) -> None:
    """Write a params pytree to one portable compressed `.npz` file.

    The distribution format for pretrained models (the reference ships
    its pretrained checkpoints as downloadable archives, `README.md:38-40`):
    a few-MB self-contained file that `load_params` restores without
    orbax, without an optimizer template, and without knowing the pytree
    structure up front. Supports dict/list/tuple nesting with array
    leaves (tuples come back as lists); dict keys must not be all-digit
    strings (they would be read back as list indices).
    """
    flat = _flatten_params(params)
    import json

    np.savez_compressed(
        Path(path), __meta__=np.asarray(json.dumps(meta or {})), **flat)


def load_params(path: str | Path) -> tuple[Any, dict]:
    """Load `(params, meta)` from an `export_params` file."""
    import json

    with np.load(Path(path)) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    return _unflatten_params(flat), meta


def restore_model_params(model_ckpt: str | Path, init_fn, cfg) -> Any:
    """Load model params from an orbax checkpoint dir OR a portable
    `.npz` pretrained file (export_params). Shared by the sampler and
    evaluation CLIs so every `--model_ckpt` flag accepts both forms."""
    if str(model_ckpt).endswith(".npz"):
        params, _meta = load_params(model_ckpt)
        return params
    import jax
    import jax.numpy as jnp

    from diffusionsat_tpu.train.adabelief import adabelief

    with jax.default_device(jax.devices("cpu")[0]):
        params = init_fn(jax.random.key(0), cfg)
        opt = adabelief()
        template = TrainState(params=params, opt_state=opt.init(params),
                              step=jnp.zeros((), jnp.int32),
                              key=jax.random.key(0))
    restored = CheckpointManager(model_ckpt).restore(template)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {model_ckpt}")
    # the template (and hence the restored arrays) live on CPU; move the
    # params to the default backend so jitted calls don't see mixed
    # CPU/TPU arguments (evaluate_metrics device_puts its batches to the
    # default device — a ckpt-dir restore used to crash there while the
    # .npz path, returning host numpy, worked)
    dev = jax.devices()[0]
    if dev.platform != "cpu":
        return jax.device_put(restored.params, dev)
    return restored.params


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
