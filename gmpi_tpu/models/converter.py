"""Checkpoint conversion: torch state dicts -> gmpi_tpu param/buffer pytrees.

The released GMPI checkpoints are plain torch ``state_dict`` files
(``ema.pth`` / ``generator.pth``, saved at ``gmpi/train.py:427-437,997-1005``)
and NVIDIA StyleGAN2-ADA pickles are converted to the same naming by the
reference's ``legacy.py``.  Our JAX parameter trees use the *same nesting* as
those names, so conversion is a mechanical name walk:

    mapping.fc0.weight          -> params["mapping"]["fc0"]["weight"]
    mapping.w_avg               -> buffers["mapping"]["w_avg"]
    synthesis.b64.conv0.affine.bias
                                -> params["synthesis"]["b64"]["conv0"]["affine"]["bias"]
    synthesis.b64.conv0.noise_const
                                -> buffers["synthesis"]["b64"]["conv0"]["noise_const"]
    synthesis.b256.pos_enc_embed.weight3
                                -> params["synthesis"]["b256"]["pos_enc_embed"]["weight3"]

``resample_filter`` buffers are static constants on our side and are skipped.

Warm starting from a *vanilla* StyleGAN2 checkpoint uses name-matched partial
copy with missing keys allowed (``misc.copy_params_and_buffers
(require_all=False)``, ``gmpi/models/torch_utils/misc.py:156-164``,
``gmpi/train.py:197-230``): the synthesis trunk / mapping / torgb absorb
pretrained weights while the new alpha/depth-embed heads stay at init.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

SKIP_SUFFIXES = ("resample_filter",)


def _assign(tree: dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...]]]:
    """Map a torch state-dict key to ("params"|"buffers", tree path), or
    None if the entry is a static constant we do not store."""
    parts = key.split(".")
    if parts[-1] in SKIP_SUFFIXES:
        return None
    if parts[-1] in ("noise_const", "w_avg") or parts[-1].endswith("_left_append"):
        return "buffers", tuple(parts)
    return "params", tuple(parts)


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> Tuple[dict, dict]:
    """Convert a flat torch-style state dict (numpy values) into
    (params, buffers) nested trees.  Works for both G and D."""
    params: dict = {}
    buffers: dict = {}
    for key, val in sd.items():
        dest = torch_key_to_path(key)
        if dest is None:
            continue
        kind, path = dest
        arr = jnp.asarray(np.asarray(val), dtype=jnp.float32)
        _assign(params if kind == "params" else buffers, path, arr)
    return params, buffers


def _flatten(tree: dict, prefix=()) -> Dict[Tuple[str, ...], jnp.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def tree_to_state_dict(params: dict, buffers: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Inverse conversion (for exporting checkpoints in the torch naming)."""
    sd = {}
    for path, v in _flatten(params).items():
        sd[".".join(path)] = np.asarray(v)
    if buffers is not None:
        for path, v in _flatten(buffers).items():
            sd[".".join(path)] = np.asarray(v)
    return sd


def merge_converted(
    init_tree: dict, converted: dict, *, require_all: bool = True, strict_shapes: bool = True
) -> Tuple[dict, list]:
    """Fill ``init_tree`` with entries from ``converted`` (same nesting).

    ``require_all=False`` reproduces the reference's warm-start semantics
    (``misc.py:156-164``): entries missing from ``converted`` keep their init
    values (new heads stay random); entries in ``converted`` with no
    counterpart in ``init_tree`` are ignored (e.g. vanilla-StyleGAN2 single
    torgba heads).  Returns (merged, list-of-missing-paths).
    """
    flat_init = _flatten(init_tree)
    flat_conv = _flatten(converted)
    missing = [p for p in flat_init if p not in flat_conv]
    if require_all and missing:
        raise KeyError(f"missing {len(missing)} entries, e.g. {missing[:5]}")
    merged = {}
    for path, init_val in flat_init.items():
        if path in flat_conv:
            val = flat_conv[path]
            if tuple(val.shape) != tuple(init_val.shape):
                if strict_shapes:
                    raise ValueError(f"{'.'.join(path)}: {val.shape} != {init_val.shape}")
                val = init_val
            _assign(merged, path, jnp.asarray(val, init_val.dtype).reshape(init_val.shape))
        else:
            _assign(merged, path, init_val)
    return merged, missing


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state dict with torch (CPU) and return numpy values.
    Accepts either a bare state dict or the reference's training checkpoint
    layout with nested state dicts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and all(hasattr(v, "numpy") for v in obj.values()):
        sd = obj
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        raise ValueError(f"unrecognized checkpoint layout: {type(obj)}")
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_generator_checkpoint(
    sd: Mapping[str, np.ndarray], gen_cfg, *, warm_start: bool = False, key=None
) -> Tuple[dict, dict]:
    """Full pipeline: state dict -> (params, buffers) shaped exactly like
    ``gen_cfg.init``.  ``warm_start=True`` allows partial coverage (vanilla
    StyleGAN2 -> MPI generator)."""
    import jax

    params0, buffers0 = gen_cfg.init(key if key is not None else jax.random.key(0))
    conv_p, conv_b = convert_state_dict(sd)
    params, _ = merge_converted(params0, conv_p, require_all=not warm_start)
    buffers, _ = merge_converted(buffers0, conv_b, require_all=not warm_start)
    return params, buffers


def convert_discriminator_checkpoint(
    sd: Mapping[str, np.ndarray], disc_cfg, *, warm_start: bool = False, key=None
) -> dict:
    import jax

    params0 = disc_cfg.init(key if key is not None else jax.random.key(0))
    conv_p, _ = convert_state_dict(sd)
    params, _ = merge_converted(params0, conv_p, require_all=not warm_start)
    return params
