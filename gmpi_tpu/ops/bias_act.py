"""Fused bias + activation + gain + clamp.

The activation *contract* of the reference's CUDA kernel
(``gmpi/models/torch_utils/ops/bias_act.py:25-35``): each activation has a
default gain and alpha, output optionally clamped to ``[-clamp, clamp]``.
On TPU this is a single XLA fusion — no custom kernel needed; arbitrary-order
gradients (needed by the R1 penalty's double backprop) come from JAX autodiff
for free (the reference hand-rolls ``BiasActCudaGrad`` pairs for this,
``bias_act.py:129-212``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class _ActSpec(NamedTuple):
    fn: object
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2.0)),
    "lrelu": _ActSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2.0)),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2.0)),
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    axis: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """Add bias along ``axis``, apply activation, scale by gain, clamp.

    Mirrors ``_bias_act_ref`` (``bias_act.py:95-125``); kept in the input
    dtype end-to-end like the CUDA kernel.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
