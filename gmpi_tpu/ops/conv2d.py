"""conv2d with fused up/down resampling — TPU formulation.

Implements the *semantics* of the reference's ``conv2d_resample``
(``gmpi/models/torch_utils/ops/conv2d_resample.py:57-152``): padding applied
once w.r.t. the upsampled image, FIR-filtered zero-insert upsampling with gain
``up**2``, then convolution, then FIR downsampling.  The reference's six CUDA
fast paths (transpose-conv tricks, 1x1 reorderings) are all algebraically
equal to this canonical composition; on TPU ``lax.conv_general_dilated``
already covers strided/dilated cases so we keep exactly three paths.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from gmpi_tpu.ops.upfirdn2d import _parse_padding, upfirdn2d


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """Plain grouped conv2d.  ``flip_weight=True`` = cross-correlation
    (``torch.nn.functional.conv2d`` convention); ``False`` = true convolution.
    """
    if not flip_weight:
        w = w[:, :, ::-1, ::-1]
    px0, px1, py0, py1 = _parse_padding(padding)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=lax.Precision.HIGHEST,
    )


def conv2d_resample(
    x: jnp.ndarray,
    w: jnp.ndarray,
    f: Optional[np.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jnp.ndarray:
    """2D convolution with optional FIR-filtered up/downsampling.

    Args mirror the reference (``conv2d_resample.py:57-80``); ``padding`` is
    w.r.t. the upsampled image.
    """
    assert up >= 1 and down >= 1
    fh, fw = (1, 1) if f is None else np.asarray(f).shape[-2:] if np.asarray(f).ndim == 2 else (np.asarray(f).size,) * 2
    px0, px1, py0, py1 = _parse_padding(padding)

    # pad adjustment for resampling (``conv2d_resample.py:93-103``)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        x = upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1), gain=up * up, flip_filter=flip_filter)
        x = conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        # filter + pad first, then strided conv (``conv2d_resample.py:118-122``)
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        return conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    return conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups, flip_weight=flip_weight)
