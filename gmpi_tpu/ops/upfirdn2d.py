"""upfirdn2d — upsample / FIR filter / downsample, as one XLA convolution.

Replaces the reference's hand-tiled CUDA kernels
(``gmpi/models/torch_utils/ops/upfirdn2d.{cu,cpp,py}``) with a single
``lax.conv_general_dilated``: zero-insertion upsampling maps to ``lhs_dilation``,
padding/cropping to (possibly negative) conv padding, and downsampling to
window strides.  XLA tiles the depthwise FIR onto the VPU/MXU; no custom
kernel needed at these filter sizes (default ``[1,3,3,1]`` outer product).

Semantics are those of ``_upfirdn2d_ref`` (``upfirdn2d.py:168-208``):

1. insert ``up-1`` zeros *after* each input pixel (note: trailing zeros too —
   accounted for by adding ``up-1`` to the trailing pad, since ``lhs_dilation``
   only inserts zeros *between* elements);
2. pad (or crop, for negative padding) w.r.t. the upsampled image;
3. convolve with the fp32 FIR filter (flipped unless ``flip_filter``) scaled
   by ``gain ** (ndim/2)``;
4. keep every ``down``-th pixel.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import lax


def _parse_scaling(s) -> Tuple[int, int]:
    if isinstance(s, int):
        return s, s
    sx, sy = s
    return int(sx), int(sy)


def _parse_padding(p) -> Tuple[int, int, int, int]:
    if isinstance(p, int):
        return p, p, p, p
    p = list(p)
    if len(p) == 2:
        px, py = p
        return px, px, py, py
    px0, px1, py0, py1 = p
    return px0, px1, py0, py1


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> np.ndarray:
    """Prepare a 2D FIR filter (``upfirdn2d.setup_filter``,
    ``upfirdn2d.py:72-116``).  Always returns the dense 2D float32 filter —
    separable filters are materialized as outer products (the two-pass split
    is a CUDA-era optimization XLA does not need)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[np.newaxis]
    assert f.ndim in (1, 2)
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1:
        if normalize:
            f = f / f.sum()
        f = np.outer(f, f)
    elif normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1, ::-1]
    # total signal gain is gain**1 regardless of separability (the reference
    # applies gain**0.5 per separable pass, twice)
    f = f * gain
    return np.ascontiguousarray(f, dtype=np.float32)


def upfirdn2d(
    x: jnp.ndarray,
    f: Optional[np.ndarray],
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Apply upsample->pad->FIR->downsample to ``x [N, C, H, W]``.

    ``f`` is a 2D (or 1D separable) fp32 filter as produced by
    :func:`setup_filter`, or ``None`` for identity.
    """
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)

    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    n, c, _, _ = x.shape
    fh, fw = f.shape

    f = f * gain  # dense 2D filter: total signal gain is gain**1
    if not flip_filter:
        f = f[::-1, ::-1]
    f = f.astype(x.dtype)

    # depthwise kernel [C, 1, fh, fw]
    kernel = jnp.broadcast_to(f[None, None], (c, 1, fh, fw))

    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return out


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Shape-preserving FIR filter (``upfirdn2d.filter2d``, ``upfirdn2d.py:272-305``)."""
    fh, fw = np.asarray(f).shape[-2:] if np.asarray(f).ndim == 2 else (np.asarray(f).size,) * 2
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = (padx0 + fw // 2, padx1 + (fw - 1) // 2, pady0 + fh // 2, pady1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Antialiased 2x upsampling (``upfirdn2d.upsample2d``, ``upfirdn2d.py:308-345``):
    pad so output is ``up`` x input, total gain ``gain * up**2``."""
    upx, upy = _parse_scaling(up)
    f2 = np.asarray(f)
    fh, fw = (f2.shape[0], f2.shape[-1]) if f2.ndim == 2 else (f2.size, f2.size)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = (
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Antialiased 2x downsampling (``upfirdn2d.downsample2d``, ``upfirdn2d.py:349-384``)."""
    downx, downy = _parse_scaling(down)
    f2 = np.asarray(f)
    fh, fw = (f2.shape[0], f2.shape[-1]) if f2.ndim == 2 else (f2.size, f2.size)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = (
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
