"""Checkpoint save/load for the training state.

The reference saves step-stamped + rolling-latest ``torch.save`` checkpoints
of G/D/EMA x2/optimizers (``gmpi/train.py:427-437, 997-1005``) and cannot
resume from them (``train.py:79-80`` raises).  Here: orbax-backed pytree
checkpoints with step-stamped directories, a rolling ``latest`` pointer, and
full resume (params, buffers, both EMAs, optimizer states, step counter).

A converter-friendly export (``export_torch_style``) writes the generator in
the reference's flat state-dict naming so checkpoints flow both ways.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from gmpi_tpu.train.step import TrainState


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(base, f"step_{step:08d}")


def save_checkpoint(base_dir: str, state: TrainState, keep_last: int = 3) -> str:
    """Step-stamped orbax save + ``latest`` pointer; prunes old checkpoints."""
    import orbax.checkpoint as ocp

    step = int(np.asarray(state.step))
    path = os.path.abspath(_ckpt_dir(base_dir, step))
    ckptr = ocp.PyTreeCheckpointer()
    # collective in multiprocess runs: every process must call save (orbax
    # syncs internally and the primary host commits the write) — do NOT gate
    # this on process_index, that deadlocks the sync_global_processes inside
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    if jax.process_index() == 0:
        # plain-file side effects are rank-0-only (reference: rank-0
        # torch.save, ``gmpi/train.py:427-437``)
        with open(os.path.join(base_dir, "latest"), "w") as f:
            f.write(os.path.basename(path))
        # prune
        kept = sorted(d for d in os.listdir(base_dir) if d.startswith("step_"))
        for d in kept[:-keep_last]:
            import shutil

            shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)
    return path


def load_checkpoint(base_dir: str, template: TrainState, step: Optional[int] = None) -> TrainState:
    """Restore into the shape/dtype structure of ``template`` (from
    ``init_train_state``)."""
    import orbax.checkpoint as ocp

    if step is None:
        with open(os.path.join(base_dir, "latest")) as f:
            name = f.read().strip()
        path = os.path.abspath(os.path.join(base_dir, name))
    else:
        path = os.path.abspath(_ckpt_dir(base_dir, step))
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.device_get(template._asdict()))
    return TrainState(**restored)


def save_config_snapshot(out_dir: str, cfg) -> None:
    """Config snapshot for exact eval reproduction (``gmpi/train.py:52-55``)."""
    import dataclasses

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def export_torch_style(path: str, params: dict, buffers: dict) -> None:
    """Write generator weights as a flat ``.npz`` in the reference's
    state-dict naming (loadable by the converter in both frameworks)."""
    from gmpi_tpu.models.converter import tree_to_state_dict

    np.savez(path, **tree_to_state_dict(params, buffers))


def load_torch_style(path: str):
    """Inverse of :func:`export_torch_style` -> (params, buffers) trees."""
    from gmpi_tpu.models.converter import convert_state_dict

    with np.load(path) as data:
        sd = {k: data[k] for k in data.files}
    return convert_state_dict(sd)
