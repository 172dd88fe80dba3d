"""Image utilities: range conversions, Sobel gradients, edge-aware smoothness
loss, color ramps — capability parity with ``gmpi/utils/img_utils.py`` and
``gmpi/utils/color_grad.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)


def to_unit_range(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1]."""
    return (x + 1.0) / 2.0


def to_sym_range(x: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1]."""
    return x * 2.0 - 1.0


def filter2d_reflect(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Depthwise 2D filter with reflect padding (``img_utils.filter2D``)."""
    c = x.shape[1]
    kh, kw = kernel.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)), mode="reflect")
    k = jnp.broadcast_to(jnp.asarray(kernel, x.dtype)[None, None], (c, 1, kh, kw))
    return lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c
    )


def image_gradient(img: jnp.ndarray) -> jnp.ndarray:
    """Mean |Sobel_x| + |Sobel_y| magnitude (``img_utils.compute_img_grad``)."""
    gx = jnp.abs(filter2d_reflect(img, SOBEL_X))
    gy = jnp.abs(filter2d_reflect(img, SOBEL_Y))
    return (gx + gy) / 2.0


def edge_aware_smooth_loss(
    rgb: jnp.ndarray,  # [B, 3, H, W]
    depth: jnp.ndarray,  # [B, 1, H, W]
    e_min: float = 0.05,
    g_min: float = 0.01,
) -> jnp.ndarray:
    """Edge-aware depth smoothness (``img_utils.edge_aware_smooth_loss``,
    ``img_utils.py:164-204``; Sec 3.4 of arXiv 2004.11364): penalize depth
    gradient except at RGB edges (> e_min of max) and allow g_min slack."""
    rgb_grad = jnp.mean(image_gradient(rgb), axis=1, keepdims=True)
    depth_grad = image_gradient(depth)
    max_rgb = jnp.max(rgb_grad, axis=(2, 3), keepdims=True)
    max_depth = jnp.max(depth_grad, axis=(2, 3), keepdims=True)
    not_edge = (rgb_grad <= e_min * max_rgb).astype(rgb.dtype)
    excess = jnp.maximum(depth_grad - g_min * max_depth, 0.0)
    return jnp.sum(excess * not_edge) / (jnp.sum(not_edge) + 1e-8)


def color_ramp(c0, c1, n: int) -> np.ndarray:
    """Linear RGB ramp (``utils/color_grad.py`` capability): n colors
    interpolating c0 -> c1, values in [0, 1], shape [n, 3]."""
    c0 = np.asarray(c0, np.float32).reshape(1, 3)
    c1 = np.asarray(c1, np.float32).reshape(1, 3)
    t = np.linspace(0.0, 1.0, n, dtype=np.float32).reshape(-1, 1)
    return c0 * (1 - t) + c1 * t


def hex_to_rgb(h: str) -> np.ndarray:
    h = h.lstrip("#")
    return np.array([int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4)], np.float32)
