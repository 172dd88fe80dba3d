"""Style-modulated convolution (StyleGAN2) — scale-activations formulation.

Semantics of ``modulated_conv2d`` (``gmpi/models/networks/
networks_cond_on_pos_enc.py:142-199``).  The reference's "fused" path builds a
per-sample weight tensor and runs a grouped conv with ``groups=batch``; on TPU
the *scale-activations* path (reference ``:177-187``) is the right shape for
the MXU — modulate the input channels, run one shared-weight conv, demodulate
the output channels — identical math, no batch-sized group count.

Demodulation coefficients are computed exactly as the reference does
(per-sample modulated-weight L2 over [in, kh, kw], eps 1e-8), including the
fp16-era pre-normalization guard which we retain for bfloat16.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gmpi_tpu.ops.conv2d import conv2d_resample


def modulated_conv2d(
    x: jnp.ndarray,            # [N, Cin, H, W]
    weight: jnp.ndarray,       # [Cout, Cin, kh, kw]
    styles: jnp.ndarray,       # [N, Cin]
    noise: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[np.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jnp.ndarray:
    batch = x.shape[0]
    out_ch, in_ch, kh, kw = weight.shape

    # bf16 overflow guard — analogue of the reference's fp16 pre-normalization
    # (``networks_cond_on_pos_enc.py:161-164``).
    if x.dtype == jnp.bfloat16 and demodulate:
        wmax = jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True)
        weight = weight * (1.0 / np.sqrt(in_ch * kh * kw) / wmax)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        w = weight[None] * styles.reshape(batch, 1, in_ch, 1, 1)  # [N, O, I, kh, kw]
        dcoefs = jnp.reciprocal(jnp.sqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8))  # [N, O]

    x = x * styles.astype(x.dtype).reshape(batch, in_ch, 1, 1)
    x = conv2d_resample(
        x,
        weight.astype(x.dtype),
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype).reshape(batch, out_ch, 1, 1) + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype).reshape(batch, out_ch, 1, 1)
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
