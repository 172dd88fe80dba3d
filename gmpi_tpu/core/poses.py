"""Camera poses on a sphere — jittable sampling + deterministic paths.

Re-derives the reference pose pipeline (``gmpi/utils/cam_utils.py``) in JAX:

* cameras live on a sphere of radius ``r`` centred at ``(0, 0, sphere_center_z)``
  (MPI/world frame: +X right, +Y down, +Z forward), always looking at the
  centre;
* yaw/pitch are sampled uniform / gaussian / truncated-gaussian
  (``cam_utils.py:481-568``);
* a look-at matrix is built in the *sphere* frame (+X backward, +Y right,
  +Z up; ``cam_utils.py:571-622``) and converted to the world frame by a fixed
  change of basis (``cam_utils.py:687-731``).

Everything here is pure: randomness enters only through explicit
``jax.random`` keys, so pose sampling is reproducible and fully traceable
under ``jit``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SphereCameraConfig(NamedTuple):
    """Static pose-distribution parameters (from the per-dataset camera setup,
    ``configs/gmpi.yml:91-110`` + ``gmpi/curriculums.py:109-116``)."""

    sphere_center_z: float
    sphere_r: float
    yaw_mean: float
    yaw_std: float
    pitch_mean: float
    pitch_std: float
    n_truncated_stds: float = 2.0
    sample_method: str = "truncated_gaussian"  # uniform | gaussian | truncated_gaussian


# Fixed sphere->world rotation: sphere frame (+X back, +Y right, +Z up) to
# world frame (+X right, +Y down, +Z forward).  Equals
# Rx(90°) @ Rz(-90°) as built by the reference via scipy
# (``cam_utils.py:708-716``); written out as an exact constant here.
_SPHERE_TO_WORLD_ROT = np.array(
    [
        [0.0, 1.0, 0.0],
        [0.0, 0.0, -1.0],
        [-1.0, 0.0, 0.0],
    ],
    dtype=np.float64,
)


def sphere_to_world_matrix(sphere_center: np.ndarray) -> np.ndarray:
    """4x4 coordinate transform from sphere frame to world frame
    (``cam_utils.py:687-731``: ``translate(sphere_center) @ rot``)."""
    m = np.eye(4)
    m[:3, :3] = _SPHERE_TO_WORLD_ROT
    t = np.eye(4)
    t[:3, 3] = np.asarray(sphere_center, dtype=np.float64).reshape(-1)
    return t @ m


def truncated_normal(
    key: jax.Array, shape: Tuple[int, ...], mean, std, n_stds: float
) -> jnp.ndarray:
    """Resample-4 truncated normal (``gmpi/utils/torch_utils.py:51-79``):
    draw 4 candidates per element, keep the first in-range one, clip the rest.
    """
    cand = jax.random.normal(key, shape + (4,), dtype=jnp.float32) * std + mean
    lo = mean - n_stds * std
    hi = mean + n_stds * std
    valid = (cand > lo) & (cand < hi)
    idx = jnp.argmax(valid, axis=-1)
    out = jnp.take_along_axis(cand, idx[..., None], axis=-1)[..., 0]
    return jnp.clip(out, lo, hi)


def sample_yaw_pitch(
    key: jax.Array,
    n: int,
    cfg: SphereCameraConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``[n, 1]`` yaws and pitches per the configured method
    (``cam_utils.py:513-542``)."""
    ky, kp = jax.random.split(key)
    if cfg.sample_method == "uniform":
        yaws = (jax.random.uniform(ky, (n, 1)) - 0.5) * 2 * cfg.n_truncated_stds * cfg.yaw_std + cfg.yaw_mean
        pitches = (jax.random.uniform(kp, (n, 1)) - 0.5) * 2 * cfg.n_truncated_stds * cfg.pitch_std + cfg.pitch_mean
    elif cfg.sample_method in ("normal", "gaussian"):
        yaws = jax.random.normal(ky, (n, 1)) * cfg.yaw_std + cfg.yaw_mean
        pitches = jax.random.normal(kp, (n, 1)) * cfg.pitch_std + cfg.pitch_mean
    elif cfg.sample_method == "truncated_gaussian":
        yaws = truncated_normal(ky, (n, 1), cfg.yaw_mean, cfg.yaw_std, cfg.n_truncated_stds)
        pitches = truncated_normal(kp, (n, 1), cfg.pitch_mean, cfg.pitch_std, cfg.n_truncated_stds)
    else:
        raise ValueError(cfg.sample_method)
    return yaws.astype(jnp.float32), pitches.astype(jnp.float32)


def _normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def c2w_from_yaw_pitch(
    yaws: jnp.ndarray,
    pitches: jnp.ndarray,
    sphere_center_z: float,
    sphere_r: float,
) -> jnp.ndarray:
    """Camera-to-world matrices ``[N, 4, 4]`` for cameras on the sphere looking
    at its centre.

    Combines ``sample_camera_positions_sphere`` (position on sphere,
    ``cam_utils.py:561-564``), ``create_cam2sphere_sys_matrix`` (look-at,
    ``cam_utils.py:571-622``) and the sphere->world change of basis
    (``cam_utils.py:804-808``) into a single jittable function.
    """
    yaws = yaws.reshape(-1)
    pitches = pitches.reshape(-1)
    cp = jnp.abs(jnp.cos(pitches))
    # Position in sphere frame (+X back, +Y right, +Z up).
    pos = jnp.stack(
        [sphere_r * cp * jnp.cos(yaws), sphere_r * cp * jnp.sin(yaws), sphere_r * jnp.sin(pitches)],
        axis=-1,
    )  # [N, 3]
    fwd = _normalize(-pos)
    down0 = jnp.array([0.0, 0.0, -1.0], dtype=pos.dtype)
    right = _normalize(jnp.cross(jnp.broadcast_to(down0, fwd.shape), fwd))
    down = _normalize(jnp.cross(fwd, right))
    n = pos.shape[0]
    rot = jnp.stack([right, down, fwd], axis=-1)  # columns: right, down, forward
    c2s = jnp.zeros((n, 4, 4), dtype=pos.dtype)
    c2s = c2s.at[:, :3, :3].set(rot)
    c2s = c2s.at[:, :3, 3].set(pos)
    c2s = c2s.at[:, 3, 3].set(1.0)
    sphere_center = np.array([0.0, 0.0, sphere_center_z])
    s2w = jnp.asarray(sphere_to_world_matrix(sphere_center), dtype=pos.dtype)
    return jnp.einsum("ij,njk->nik", s2w, c2s, precision="highest")


def sample_sphere_poses(
    key: jax.Array,
    n: int,
    cfg: SphereCameraConfig,
    given_yaws: Optional[jnp.ndarray] = None,
    given_pitches: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random (or given-angle) poses: returns ``(c2w [N,4,4], yaws [N,1],
    pitches [N,1])`` — the jittable analogue of ``gen_sphere_path``
    (``cam_utils.py:734-821``)."""
    if given_yaws is None:
        yaws, pitches = sample_yaw_pitch(key, n, cfg)
    else:
        yaws = jnp.asarray(given_yaws, dtype=jnp.float32).reshape(n, 1)
        pitches = jnp.asarray(given_pitches, dtype=jnp.float32).reshape(n, 1)
    c2w = c2w_from_yaw_pitch(yaws, pitches, cfg.sphere_center_z, cfg.sphere_r)
    return c2w, yaws, pitches


def linspace_sphere_poses(
    n: int,
    cfg: SphereCameraConfig,
    horizontal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic camera path sweeping ±n_truncated_stds around the mean
    (``cam_utils.py:544-554``) — used by video rendering."""
    sweep = jnp.linspace(-cfg.n_truncated_stds, cfg.n_truncated_stds, n).reshape(n, 1)
    if horizontal:
        yaws = sweep * cfg.yaw_std + cfg.yaw_mean
        pitches = jnp.full((n, 1), cfg.pitch_mean)
    else:
        yaws = jnp.full((n, 1), cfg.yaw_mean)
        pitches = sweep * cfg.pitch_std + cfg.pitch_mean
    c2w = c2w_from_yaw_pitch(yaws, pitches, cfg.sphere_center_z, cfg.sphere_r)
    return c2w, yaws, pitches


def yaw_pitch_from_w2c(
    w2c: jnp.ndarray, sphere_center: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (yaw, pitch) from world-to-camera matrices
    (inverse of the construction; ``cam_utils.py:1005-1050`` semantics).

    The camera eye in world coords is ``-R^T t``; converting to the sphere
    frame and inverting the spherical parameterization gives the angles.
    """
    rot = w2c[..., :3, :3]
    t = w2c[..., :3, 3]
    eye_world = -jnp.einsum("...ji,...j->...i", rot, t, precision="highest")
    rel = eye_world - sphere_center  # world frame
    # world -> sphere frame: inverse of _SPHERE_TO_WORLD_ROT (orthonormal).
    rot_ws = jnp.asarray(_SPHERE_TO_WORLD_ROT.T, dtype=w2c.dtype)
    p = jnp.einsum("ij,...j->...i", rot_ws, rel, precision="highest")
    r = jnp.linalg.norm(p, axis=-1)
    pitch = jnp.arcsin(jnp.clip(p[..., 2] / r, -1.0, 1.0))
    yaw = jnp.arctan2(p[..., 1], p[..., 0])
    return yaw[..., None], pitch[..., None]
