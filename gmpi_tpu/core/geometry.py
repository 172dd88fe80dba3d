"""MPI plane geometry — depth sampling, spatial-extent fitting, conditioning grids.

Host-side (numpy) construction of the static ``PlaneGeometry`` pytree, done
once at model build time — the analogue of
``MPIRenderer.compute_mpi_spatial_volume`` (``gmpi/core/mpi_renderer.py:105-152``)
plus the volume-fitting math of ``gmpi/utils/mpi_utils.py:621-917``.  The
reference sweeps a 100x100 grid of (yaw, pitch) poses in a Python loop; here
the sweep is fully vectorized numpy.

The runtime-facing artifact is ``PlaneGeometry`` (a NamedTuple of jnp arrays)
consumed by the renderer and by the generator's depth-conditioning heads.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import poses as poses_mod


def sample_distance(dmin: float, dmax: float, num: int, method: str) -> np.ndarray:
    """Plane depth schedule (``gmpi/utils/mpi_utils.py:21-53``).

    ``inverse`` (default config, ``configs/gmpi.yml:88``) = uniform in
    disparity, returned front-to-back.
    """
    assert 0 < dmin <= dmax
    assert 1 <= num < 9999
    if method == "uniform":
        radii = np.linspace(dmin, dmax, num=num)
    elif method == "log-uniform":
        radii = np.exp(np.linspace(np.log(dmin), np.log(dmax), num=num))
    elif method == "sqrt":
        radii = np.linspace(dmin**0.5, dmax**0.5, num=num) ** 2
    elif method == "squared":
        radii = np.sqrt(np.linspace(dmin**2, dmax**2, num=num))
    elif method == "inverse":
        radii = (1.0 / np.linspace(1.0 / dmax, 1.0 / dmin, num=num))[::-1]
    else:
        raise ValueError(method)
    return np.asarray(radii, dtype=np.float32)


def _deterministic_c2w(yaw: np.ndarray, pitch: np.ndarray, sphere_center_z: float, sphere_r: float) -> np.ndarray:
    """Vectorized float64 look-at c2w for fixed angles (host-side twin of
    ``poses.c2w_from_yaw_pitch`` used during volume fitting)."""
    yaw = np.asarray(yaw, dtype=np.float64).reshape(-1)
    pitch = np.asarray(pitch, dtype=np.float64).reshape(-1)
    cp = np.abs(np.cos(pitch))
    pos = np.stack(
        [sphere_r * cp * np.cos(yaw), sphere_r * cp * np.sin(yaw), sphere_r * np.sin(pitch)], axis=-1
    )
    fwd = -pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    down0 = np.array([0.0, 0.0, -1.0])
    right = np.cross(np.broadcast_to(down0, fwd.shape), fwd)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    down /= np.linalg.norm(down, axis=-1, keepdims=True)
    n = pos.shape[0]
    c2s = np.tile(np.eye(4), (n, 1, 1))
    c2s[:, :3, :3] = np.stack([right, down, fwd], axis=-1)
    c2s[:, :3, 3] = pos
    s2w = poses_mod.sphere_to_world_matrix(np.array([0.0, 0.0, sphere_center_z]))
    return np.einsum("ij,njk->nik", s2w, c2s)


def _frustum_plane_bounds(
    c2w: np.ndarray, border_dirs_cam: np.ndarray, z_plane: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Intersect the 4 corner rays of each camera with the plane ``z=z_plane``
    (``gmpi/utils/mpi_utils.py:621-649``).  Returns per-camera
    (min_x, max_x, min_y, max_y), shape ``[N]`` each.
    """
    rot = c2w[:, :3, :3]
    eye = c2w[:, :3, 3]
    dirs = np.einsum("nij,jk->nik", rot, border_dirs_cam)  # [N, 3, 4]
    scale = (z_plane - eye[:, 2:3]) / dirs[:, 2, :]  # [N, 4]
    x = eye[:, 0:1] + dirs[:, 0, :] * scale
    y = eye[:, 1:2] + dirs[:, 1, :] * scale
    return x.min(axis=1), x.max(axis=1), y.min(axis=1), y.max(axis=1)


def fit_plane_dhws(
    *,
    fov_deg: float,
    sphere_center_z: float,
    sphere_r: float,
    yaw_min: float,
    yaw_max: float,
    pitch_min: float,
    pitch_max: float,
    plane_zs: np.ndarray,
    enlarge_factor: float = 1.0,
    confined: bool = False,
    n_sweep: int = 100,
) -> Tuple[np.ndarray, float]:
    """Plane spatial extents so every camera in the truncated pose range sees
    every plane.

    Faithful to ``compute_plane_dhws_given_cam_pose_spatial_range`` and its
    ``_confined`` variant (``gmpi/utils/mpi_utils.py:652-917``):

    * sweep an ``n_sweep x n_sweep`` grid of (yaw, pitch), intersect corner
      rays with the *last* plane, take symmetric max extents x enlarge_factor
      for the last plane;
    * the mid-angle pose defines the ``confined`` size; nearer planes get
      either the confined size scaled by ``z/z_last`` (non-confined variant)
      or exactly the confined size (confined variant,
      ``configs/gmpi.yml:76`` — used by the paper config);
    * the 5.0 plane-extent sanity bound is preserved.

    Returns ``(dhws [L, 3] float64, tex_expand_ratio)``, front-to-back.
    """
    plane_zs = np.asarray(plane_zs, dtype=np.float64)
    intr = cam.intrinsics_from_fov(fov_deg, 4, 4)
    border = cam.border_ray_dirs_cam(intr)  # [3, 4]

    yaw_grid = np.linspace(yaw_min, yaw_max, n_sweep)
    pitch_grid = np.linspace(pitch_min, pitch_max, n_sweep)
    yy, pp = np.meshgrid(yaw_grid, pitch_grid, indexing="ij")
    yaw_mid = (yaw_min + yaw_max) / 2.0
    pitch_mid = (pitch_min + pitch_max) / 2.0
    all_yaws = np.concatenate([yy.reshape(-1), [yaw_mid]])
    all_pitches = np.concatenate([pp.reshape(-1), [pitch_mid]])

    c2w = _deterministic_c2w(all_yaws, all_pitches, sphere_center_z, sphere_r)
    z_last = float(plane_zs[-1])
    min_x, max_x, min_y, max_y = _frustum_plane_bounds(c2w, border, z_last)

    # Mid-angle pose (last entry) defines the base / confined sizes
    # (``mpi_utils.py:730-744``).
    base_spatial_size = min(max_x[-1] - min_x[-1], max_y[-1] - min_y[-1])
    confined_h = 2.0 * max(abs(min_y[-1]), abs(max_y[-1]))
    confined_w = 2.0 * max(abs(min_x[-1]), abs(max_x[-1]))

    bmin_x, bmax_x = min_x.min(), max_x.max()
    bmin_y, bmax_y = min_y.min(), max_y.max()

    bound = max(abs(bmin_x), abs(bmax_x), abs(bmin_y), abs(bmax_y))
    assert bound <= 5.0, (
        f"MPI plane extent {bound:.3f} > 5.0 — camera pose range too large for "
        f"an MPI; reduce yaw/pitch stddev or n_truncated_stds "
        f"(mirror of gmpi/utils/mpi_utils.py:754-759)."
    )

    spatial_h = 2.0 * max(abs(bmin_y), abs(bmax_y)) * enlarge_factor
    spatial_w = 2.0 * max(abs(bmin_x), abs(bmax_x)) * enlarge_factor

    dhws = [[z_last, spatial_h, spatial_w]]
    for i in range(len(plane_zs) - 2, -1, -1):
        z = float(plane_zs[i])
        if confined:
            dhws.append([z, confined_h, confined_w])
        else:
            dhws.append([z, confined_h * z / z_last, confined_w * z / z_last])
    dhws.reverse()
    dhws = np.asarray(dhws, dtype=np.float64)
    tex_expand_ratio = float(np.max(dhws[:, 1:] / base_spatial_size))
    return dhws, tex_expand_ratio


class PlaneGeometry(NamedTuple):
    """Static MPI plane layout: per-plane (depth, spatial_h, spatial_w).

    ``dhw`` is ``[L, 3]`` float32, ordered front (nearest) to back — the
    analogue of ``MPIRenderer.static_mpi_plane_dhws``
    (``gmpi/core/mpi_renderer.py:149-150``).  ``min_d``/``max_d`` bound the
    depth range for normalized conditioning coordinates.
    """

    dhw: jnp.ndarray  # [L, 3]
    min_d: float
    max_d: float

    @property
    def n_planes(self) -> int:
        return self.dhw.shape[0]


def build_plane_geometry(
    *,
    n_planes: int,
    min_d: float,
    max_d: float,
    distance_sample_method: str = "inverse",
    fov_deg: float,
    sphere_center_z: float,
    sphere_r: float,
    yaw_mean: float,
    yaw_std: float,
    pitch_mean: float,
    pitch_std: float,
    n_truncated_stds: float = 2.0,
    enlarge_factor: float = 1.001,
    confined: bool = True,
) -> PlaneGeometry:
    """One-call construction mirroring ``MPIRenderer.compute_mpi_spatial_volume``
    (``gmpi/core/mpi_renderer.py:105-152``): depth schedule + clamp + extent fit.
    """
    zs = sample_distance(min_d, max_d, n_planes, distance_sample_method)
    zs = np.clip(zs, min_d, max_d)
    dhws, _ = fit_plane_dhws(
        fov_deg=fov_deg,
        sphere_center_z=sphere_center_z,
        sphere_r=sphere_r,
        yaw_min=yaw_mean - n_truncated_stds * yaw_std,
        yaw_max=yaw_mean + n_truncated_stds * yaw_std,
        pitch_min=pitch_mean - n_truncated_stds * pitch_std,
        pitch_max=pitch_mean + n_truncated_stds * pitch_std,
        plane_zs=zs.astype(np.float64),
        enlarge_factor=enlarge_factor,
        confined=confined,
    )
    return PlaneGeometry(dhw=jnp.asarray(dhws, dtype=jnp.float32), min_d=min_d, max_d=max_d)


# ---------------------------------------------------------------------------
# Conditioning coordinates for the generator's MPI heads
# ---------------------------------------------------------------------------


def plane_xyz_grid(geom: PlaneGeometry, tex_h: int, tex_w: int) -> jnp.ndarray:
    """Texture-pixel 3D coordinates ``[L, H, W, 3]`` for one resolution
    (``MPIRenderer.comput_tex_pixels_3d_coords``, ``mpi_renderer.py:252-291``):
    x/y linspace(-1, 1) scaled by half the plane's spatial extent, z = depth.
    """
    dhw = geom.dhw
    L = dhw.shape[0]
    z = jnp.broadcast_to(dhw[:, 0].reshape(L, 1, 1), (L, tex_h, tex_w))
    col = jnp.linspace(-1.0, 1.0, tex_w)
    row = jnp.linspace(-1.0, 1.0, tex_h)
    x = col[None, None, :] * (dhw[:, 2] / 2.0).reshape(L, 1, 1)
    y = row[None, :, None] * (dhw[:, 1] / 2.0).reshape(L, 1, 1)
    x = jnp.broadcast_to(x, (L, tex_h, tex_w))
    y = jnp.broadcast_to(y, (L, tex_h, tex_w))
    return jnp.stack([x, y, z], axis=-1).astype(jnp.float32)


def normalize_xyz(
    geom: PlaneGeometry, xyz: jnp.ndarray, value_range: str = "01"
) -> jnp.ndarray:
    """Normalize plane coordinates to [0,1]^3 (or [-1,1]^3) using the *last*
    plane's extents and the depth range
    (``MPIRenderer.comput_tex_pixels_3d_normalized_coords_mpi``,
    ``mpi_renderer.py:293-318``)."""
    last_h = geom.dhw[-1, 1]
    last_w = geom.dhw[-1, 2]
    min_xyz = jnp.stack([-last_w / 2.0, -last_h / 2.0, jnp.asarray(geom.min_d, jnp.float32)])
    max_xyz = jnp.stack([last_w / 2.0, last_h / 2.0, jnp.asarray(geom.max_d, jnp.float32)])
    out = (xyz - min_xyz) / (max_xyz - min_xyz)
    if value_range == "-11":
        out = 2.0 * out - 1.0
    elif value_range != "01":
        raise ValueError(value_range)
    return out


def multi_res_xyz(
    geom: PlaneGeometry, tex_size: int, normalized: bool = True, value_range: str = "01",
    ztype: str = "depth",
):
    """Dict res -> ``[L, res, res, 3]`` for every synthesis resolution
    4..tex_size (``MPIRenderer.get_xyz(ret_single_res=False)``,
    ``mpi_renderer.py:159-180``).  ``ztype="disparity"`` conditions on 1/z
    (``use_xyz_ztype``, ``mpi_renderer.py:173-178``)."""
    assert tex_size >= 4 and (tex_size & (tex_size - 1)) == 0
    assert ztype in ("depth", "disparity"), ztype
    out = {}
    res = 4
    while res <= tex_size:
        xyz = plane_xyz_grid(geom, res, res)
        if ztype == "disparity":
            xyz = xyz.at[..., 2].set(1.0 / xyz[..., 2])
        out[res] = normalize_xyz(geom, xyz, value_range) if normalized else xyz
        res *= 2
    return out


def plane_interp_weights(
    min_d: float, max_d: float, n_src: int, n_tgt: int, method: str = "inverse"
) -> jnp.ndarray:
    """Linear weights ``[n_tgt, n_src + 2]`` to re-sample ``n_src`` trained
    planes to ``n_tgt`` eval planes by depth interpolation, with sentinel
    columns for out-of-range targets
    (``MPIRenderer.get_xyz_interpolate_ws``, ``mpi_renderer.py:209-250``)."""
    src = np.concatenate([[-999999.0], sample_distance(min_d, max_d, n_src, method), [999999.0]])
    tgt = sample_distance(min_d, max_d, n_tgt, method)
    ws = np.zeros((n_tgt, n_src + 2), dtype=np.float32)
    for i, d in enumerate(tgt):
        j = int(np.searchsorted(src, d, side="right") - 1)
        j = min(max(j, 0), n_src)
        rng = src[j + 1] - src[j]
        ws[i, j] = (src[j + 1] - d) / (rng + 1e-8)
        ws[i, j + 1] = (d - src[j]) / (rng + 1e-8)
    return jnp.asarray(ws)
