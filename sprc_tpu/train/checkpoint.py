"""Checkpointing with full train-state resume (orbax).

The reference's own scripts save only model weights per metric improvement
(``{epoch, ClassName: state_dict}``, reference src/utils.py:208-222) and
cannot resume mid-training (SURVEY.md §5.4). Here both exist:

- ``save_best`` — weights-only best-model snapshots, selection-metric keyed;
- ``save_state`` / ``restore_state`` — full TrainState (params + optimizer +
  step + rng) for exact resume, async-capable via orbax.

``export_torch_compatible`` writes a torch-loadable ``.pt`` with reference
state_dict naming so checkpoints can be cross-validated against the
PyTorch implementation.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    _checkpointer().save(
        os.path.abspath(path), jax.tree.map(np.asarray, params), force=True
    )


def restore_params(path: str) -> Any:
    return _checkpointer().restore(os.path.abspath(path))


def save_state(path: str, state) -> None:
    """Save a full TrainState (params + opt state + step + rng)."""
    tree = {
        "step": np.asarray(state.step),
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "rng": np.asarray(state.rng),
    }
    if getattr(state, "aux", None) is not None:
        # momentum/queue families (TrainState.aux): persisted so resume is
        # exact — the reference cannot resume these buffers at all
        tree["aux"] = jax.tree.map(np.asarray, state.aux)
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore_state(path: str, state_template):
    """Restore into the structure of ``state_template`` (from create_train_state)."""
    import jax.numpy as jnp

    restored = _checkpointer().restore(os.path.abspath(path))
    opt_state = jax.tree.unflatten(
        jax.tree.structure(state_template.opt_state),
        jax.tree.leaves(restored["opt_state"]),
    )
    out = state_template.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        opt_state=opt_state,
        rng=jnp.asarray(restored["rng"]),
    )
    if "aux" in restored and restored["aux"] is not None:
        out = out.replace(aux=jax.tree.map(jnp.asarray, restored["aux"]))
    return out


class CheckpointManager:
    """Preemption-safe periodic checkpointing: orbax-backed step-numbered
    saves with keep-last-N retention and async (non-blocking) writes —
    the elastic-recovery piece the reference lacks entirely (SURVEY §5.3).
    """

    def __init__(self, directory: str, *, keep: int = 3, use_async: bool = True):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=use_async
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        tree = {
            "step": np.asarray(state.step),
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "rng": np.asarray(state.rng),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(step)
        opt_state = jax.tree.unflatten(
            jax.tree.structure(state_template.opt_state),
            jax.tree.leaves(restored["opt_state"]),
        )
        return state_template.replace(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=opt_state,
            rng=jnp.asarray(restored["rng"]),
        )

    def wait(self) -> None:
        """Block until in-flight async saves land (call before exit)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


class BestCheckpointKeeper:
    """Keep best-by-metric weight snapshots (reference utils.py:151-175
    update_saved_models semantics, orbax-backed)."""

    def __init__(self, base_path: str, metric_name: str = "arithmetic_mean"):
        self.base_path = base_path
        self.metric_name = metric_name
        self.best = float("-inf")

    def maybe_save(self, metric_value: float, params: Any, epoch: int) -> bool:
        if metric_value <= self.best:
            return False
        self.best = metric_value
        path = os.path.join(self.base_path, f"best_{self.metric_name}")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        save_params(path, params)
        with open(os.path.join(self.base_path, f"best_{self.metric_name}.txt"), "w") as f:
            f.write(f"epoch={epoch} {self.metric_name}={metric_value}\n")
        return True


def export_torch_compatible(path: str, params: Any, model, epoch: int = 0) -> None:
    """Write a reference-format ``.pt``: ``{epoch, ClassName: state_dict}``
    with reference tensor names/layouts (inverse of torch_import)."""
    import torch

    from sprc_tpu.interop.torch_export import params_to_torch_state_dict

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(params, model).items()
    }
    torch.save(
        {"epoch": epoch, "Blip2QformerCirAlignPrompt": sd},
        path,
    )
