"""Device-mesh utilities.

The reference's only parallelism is single-node data parallelism via DDP
(``gmpi/train_helpers.py:111-117``, ``gmpi/train.py:232-243``).  The TPU
framework generalizes this to a `jax.sharding.Mesh` with named axes:

* ``data``  — batch sharding (DP; gradient psum replaces DDP allreduce);
* ``tile``  — pixel-row sharding of the renderer across chips;
* ``plane`` — MPI plane-slab sharding with segment compositing over ICI.

A 1-D ``data`` mesh reproduces the reference's topology; the 2-D/3-D meshes
are the TPU-native scaling paths (BASELINE north-star: pixel/tile sharding +
plane chunking).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``axis_sizes=None`` puts all devices on the first axis.  Axis order is
    chosen so the fastest-varying (last) mesh axis maps to adjacent devices —
    on TPU slices this keeps ``plane``/``tile`` collectives on ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``batch_axis``, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    sh = data_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
