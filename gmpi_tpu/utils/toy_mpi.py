"""Synthetic toy MPIs — CPU-runnable renderer fixtures (BASELINE config #1).

Capability parity with the reference's toy-MPI builders
(``gmpi/utils/mpi_utils.py:93-245`` ``mpi_from_content_imgs``, ``:302-357``
``mpi_from_plane_imgs``, ``:475-618`` ``gen_plane_imgs_from_objs``): build an
``[L, 4, H, W]`` RGBA plane stack from colored primitives placed on specific
planes, with an opaque background on the last plane — the "known geometry"
input for renderer verification (parallax/occlusion/depth are predictable).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def blank_mpi(n_planes: int, tex: int, background_rgb=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Transparent planes with an opaque constant background on the last
    plane; [L, 4, tex, tex] in [0, 1]."""
    mpi = np.zeros((n_planes, 4, tex, tex), np.float32)
    mpi[-1, :3] = np.asarray(background_rgb, np.float32).reshape(3, 1, 1)
    mpi[-1, 3] = 1.0
    return mpi


def add_rect(
    mpi: np.ndarray,
    plane: int,
    rgb: Sequence[float],
    center: Tuple[float, float] = (0.5, 0.5),
    size: Tuple[float, float] = (0.25, 0.25),
    alpha: float = 1.0,
) -> np.ndarray:
    """Place an opaque colored rectangle on one plane (fractional coords)."""
    _, _, h, w = mpi.shape
    cy, cx = center
    sy, sx = size
    r0, r1 = int((cy - sy / 2) * h), int((cy + sy / 2) * h)
    c0, c1 = int((cx - sx / 2) * w), int((cx + sx / 2) * w)
    mpi[plane, :3, r0:r1, c0:c1] = np.asarray(rgb, np.float32).reshape(3, 1, 1)
    mpi[plane, 3, r0:r1, c0:c1] = alpha
    return mpi


def add_disk(
    mpi: np.ndarray,
    plane: int,
    rgb: Sequence[float],
    center: Tuple[float, float] = (0.5, 0.5),
    radius: float = 0.15,
    alpha: float = 1.0,
) -> np.ndarray:
    _, _, h, w = mpi.shape
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy / h - center[0]) ** 2 + (xx / w - center[1]) ** 2) < radius**2
    mpi[plane, :3, mask] = np.asarray(rgb, np.float32).reshape(1, 3)
    mpi[plane, 3, mask] = alpha
    return mpi


def checkerboard_mpi(n_planes: int, tex: int, cells: int = 8) -> np.ndarray:
    """Per-plane offset checkerboards — dense-texture fixture for warp
    accuracy tests (every plane distinguishable)."""
    mpi = blank_mpi(n_planes, tex)
    yy, xx = np.mgrid[0:tex, 0:tex]
    for p in range(n_planes):
        board = (((yy * cells // tex) + (xx * cells // tex) + p) % 2).astype(np.float32)
        shade = 0.3 + 0.7 * (p + 1) / n_planes
        mpi[p, 0] = board * shade
        mpi[p, 1] = board * (1 - shade)
        mpi[p, 2] = (1 - board) * shade
        mpi[p, 3] = board * 0.8
    mpi[-1, 3] = 1.0
    return mpi


def layered_scene(
    n_planes: int = 4,
    tex: int = 256,
    seed: int = 0,
) -> np.ndarray:
    """A canonical verification scene: one colored square per foreground
    plane at staggered positions + gray background — near planes occlude far
    ones, parallax ordered by depth."""
    rng = np.random.default_rng(seed)
    mpi = blank_mpi(n_planes, tex, background_rgb=(0.3, 0.3, 0.3))
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1), (0, 1, 1)]
    for p in range(n_planes - 1):
        cx = 0.3 + 0.4 * (p % 3) / 2 + rng.uniform(-0.03, 0.03)
        cy = 0.35 + 0.3 * (p % 2) + rng.uniform(-0.03, 0.03)
        add_rect(mpi, p, colors[p % len(colors)], center=(cy, cx), size=(0.18, 0.18))
    return mpi
