"""Eval-time MPI generation: plane-count re-sampling and plane-chunked
generator forward.

The reference evaluates with 96 planes after training with 32
(``eval.sh:51``) — possible because alpha heads condition on (normalized)
plane depth — and bounds memory by running the generator on plane slices
(``chunk_n_planes``, ``gmpi/eval/vis/render_video.py:55-77``).

NOTE on a reference artifact we deliberately fix: the reference's chunked
call reuses the full generator per slice, so with ``torgba_sep_background`` /
``background_alpha_full`` every slice's *last* slot is emitted as a
background plane with alpha forced to 1 — an opaque wall mid-volume at every
chunk boundary.  Here foreground slices are generated with the background
path disabled (same parameters — the background shares the torgb head), and
the single true background plane is generated once, so chunked == unchunked
exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gmpi_tpu.models.generator import GeneratorCfg


def _foreground_cfg(gen_cfg: GeneratorCfg) -> GeneratorCfg:
    """Same parameters, background paths disabled: all slots are foreground
    (shared RGB + depth-conditioned alpha)."""
    syn = dataclasses.replace(gen_cfg.synthesis, sep_background=False, build_bg_from_rgb=False)
    return dataclasses.replace(gen_cfg, synthesis=syn, background_alpha_full=False)


def generate_mpi(
    gen_cfg: GeneratorCfg,
    params: dict,
    buffers: dict,
    z: jnp.ndarray,
    xyz_dict: Dict[int, jnp.ndarray],
    n_planes: int,
    chunk_n_planes: int = -1,
    truncation_psi: float = 1.0,
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """z -> MPI [B, n_planes, 4, R, R], optionally chunked over planes."""
    if chunk_n_planes == -1 or chunk_n_planes >= n_planes:
        return gen_cfg.apply(
            params, buffers, z, None, xyz_dict, n_planes,
            truncation_psi=truncation_psi, noise_mode=noise_mode, rng=rng,
        )

    ws = gen_cfg.mapping.apply(params["mapping"], buffers["mapping"], z, None, truncation_psi)
    fg_cfg = _foreground_cfg(gen_cfg)
    has_background = gen_cfg.synthesis.sep_background

    n_fg = n_planes - 1 if has_background else n_planes
    slices = []
    for start in range(0, n_fg, chunk_n_planes):
        end = min(n_fg, start + chunk_n_planes)
        sub_xyz = {r: v[start:end] for r, v in xyz_dict.items()}
        slices.append(
            fg_cfg.synthesize(params, buffers, ws, sub_xyz, end - start,
                              noise_mode=noise_mode, rng=rng)
        )
    if has_background:
        # one 2-plane call: slot 1 is the true background (alpha forced to 1
        # when background_alpha_full)
        sub_xyz = {r: v[n_planes - 2 : n_planes] for r, v in xyz_dict.items()}
        tail = gen_cfg.synthesize(params, buffers, ws, sub_xyz, 2,
                                  noise_mode=noise_mode, rng=rng)
        slices.append(tail[:, 1:2])
    return jnp.concatenate(slices, axis=1)
