"""StyleGAN2 layer library — functional JAX modules over param pytrees.

Each "module" is a frozen dataclass holding only *static* configuration; its
``init(key) -> params`` builds a nested dict of ``jnp`` arrays and
``apply(params, ...)`` is a pure function, so whole models jit/vmap/pjit
cleanly.  Parameter names and storage conventions (``weight`` stored as
``randn / lr_multiplier``, runtime gains, bias-before-activation) mirror
StyleGAN2-ADA so checkpoints convert by name mapping alone.

Reference semantics (re-derived, not copied):
* ``FullyConnectedLayer`` — ``networks_cond_on_pos_enc.py:203-234``
* ``Conv2dLayer`` — ``networks_cond_on_pos_enc.py:238-288``
* ``SynthesisLayer`` — ``networks_cond_on_pos_enc.py:370-425``
* ``ToRGBLayer`` — ``networks_cond_on_pos_enc.py:429-448``
* ``ToRGBLayerDeeperModulatedConv`` — ``networks_cond_on_pos_enc.py:485-548``
* ``MinibatchStdLayer`` — ``networks_cond_on_pos_enc.py:1418-1439``
* ``normalize_2nd_moment`` — ``networks_cond_on_pos_enc.py:135-137``
* instance stats ``calc_mean_std`` — ``networks_cond_on_pos_enc.py:27-36``
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmpi_tpu.ops.bias_act import activation_funcs, bias_act
from gmpi_tpu.ops.conv2d import conv2d_resample
from gmpi_tpu.ops.modulated_conv import modulated_conv2d
from gmpi_tpu.ops.upfirdn2d import setup_filter

FLOATING_EPS = 1e-8


def normalize_2nd_moment(x: jnp.ndarray, axis: int = 1, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def instance_mean_std(feat: jnp.ndarray, eps: float = FLOATING_EPS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel) spatial mean/std with *unbiased* variance —
    matches ``calc_mean_std``'s ``tensor.var()`` default."""
    n, c = feat.shape[:2]
    flat = feat.reshape(n, c, -1)
    mean = jnp.mean(flat, axis=2).reshape(n, c, 1, 1)
    m = flat.shape[2]
    var = jnp.var(flat, axis=2) * (m / max(m - 1, 1)) + eps
    std = jnp.sqrt(var).reshape(n, c, 1, 1)
    return mean, std


@dataclasses.dataclass(frozen=True)
class FullyConnected:
    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    def init(self, key: jax.Array) -> dict:
        p = {"weight": jax.random.normal(key, (self.out_features, self.in_features), jnp.float32) / self.lr_multiplier}
        if self.bias:
            p["bias"] = jnp.full((self.out_features,), self.bias_init, jnp.float32)
        return p

    def apply(self, p: dict, x: jnp.ndarray) -> jnp.ndarray:
        weight_gain = self.lr_multiplier / np.sqrt(self.in_features)
        w = p["weight"].astype(x.dtype) * weight_gain
        b = p.get("bias")
        if b is not None:
            b = b.astype(x.dtype)
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        x = x @ w.T
        if self.activation == "linear":
            if b is not None:
                x = x + b
            return x
        return bias_act(x, b, axis=x.ndim - 1, act=self.activation)


@dataclasses.dataclass(frozen=True)
class Conv2d:
    """Conv2dLayer: weight-gain conv + optional up/down FIR + bias_act."""

    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    def init(self, key: jax.Array) -> dict:
        k = self.kernel_size
        p = {"weight": jax.random.normal(key, (self.out_channels, self.in_channels, k, k), jnp.float32)}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(self, p: dict, x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
        k = self.kernel_size
        weight_gain = 1.0 / np.sqrt(self.in_channels * k * k)
        w = p["weight"].astype(x.dtype) * weight_gain
        f = setup_filter(self.resample_filter) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(
            x, w, f=f, up=self.up, down=self.down, padding=k // 2, flip_weight=(self.up == 1)
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        b = p.get("bias")
        return bias_act(x, None if b is None else b.astype(x.dtype), act=self.activation, gain=act_gain, clamp=act_clamp)


@dataclasses.dataclass(frozen=True)
class SynthesisLayer:
    """Modulated 3x3 conv + noise + lrelu, optional 2x upsample."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        k_aff, k_w, k_noise = jax.random.split(key, 3)
        k = self.kernel_size
        params = {
            "affine": self.affine.init(k_aff),
            "weight": jax.random.normal(k_w, (self.out_channels, self.in_channels, k, k), jnp.float32),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }
        buffers = {}
        if self.use_noise:
            params["noise_strength"] = jnp.zeros((), jnp.float32)
            buffers["noise_const"] = jax.random.normal(k_noise, (self.resolution, self.resolution), jnp.float32)
        return params, buffers

    def apply(
        self,
        p: dict,
        buffers: dict,
        x: jnp.ndarray,
        w: jnp.ndarray,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        gain: float = 1.0,
    ) -> jnp.ndarray:
        assert noise_mode in ("random", "const", "none")
        styles = self.affine.apply(p["affine"], w)
        noise = None
        if self.use_noise and noise_mode == "random":
            assert rng is not None, "noise_mode='random' needs an rng key"
            noise = (
                jax.random.normal(rng, (x.shape[0], 1, self.resolution, self.resolution), jnp.float32)
                * p["noise_strength"]
            )
        elif self.use_noise and noise_mode == "const":
            noise = buffers["noise_const"] * p["noise_strength"]
        x = modulated_conv2d(
            x,
            p["weight"],
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=setup_filter(self.resample_filter) if self.up > 1 else None,
            flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, p["bias"].astype(x.dtype), act=self.activation, gain=act_gain, clamp=act_clamp)


def _expand_styles_per_plane(styles: jnp.ndarray, n_planes: int) -> jnp.ndarray:
    """[B, C] -> [B * n_planes, C] (plane-major within each sample)."""
    bs, c = styles.shape
    return jnp.broadcast_to(styles[:, None, :], (bs, n_planes, c)).reshape(bs * n_planes, c)


@dataclasses.dataclass(frozen=True)
class ToRGB:
    """1x1 modulated conv without demodulation + bias + clamp; ``splitted``
    replicates the style across planes so one call covers all (b, plane)
    pairs."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key: jax.Array) -> dict:
        k_aff, k_w = jax.random.split(key)
        k = self.kernel_size
        return {
            "affine": self.affine.init(k_aff),
            "weight": jax.random.normal(k_w, (self.out_channels, self.in_channels, k, k), jnp.float32),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }

    def apply(self, p: dict, x: jnp.ndarray, w: jnp.ndarray, splitted: bool = False, n_planes: int = 1) -> jnp.ndarray:
        k = self.kernel_size
        weight_gain = 1.0 / np.sqrt(self.in_channels * k * k)
        styles = self.affine.apply(p["affine"], w) * weight_gain
        if splitted:
            styles = _expand_styles_per_plane(styles, n_planes)
        x = modulated_conv2d(x, p["weight"], styles, demodulate=False)
        return bias_act(x, p["bias"].astype(x.dtype), clamp=self.conv_clamp)


@dataclasses.dataclass(frozen=True)
class ToRGBDeeperModulated:
    """4-layer stack of style-modulated 1x1 convs (demod off) with activation
    + clamp after each — the paper's ``modulated_lrelu`` depth-embedding head."""

    in_channels: int
    out_channels: int
    w_dim: int
    intermediate_channels: Tuple[int, int, int]
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    act_name: str = "lrelu"

    def _chans(self) -> Sequence[Tuple[int, int]]:
        c = [self.in_channels, *self.intermediate_channels, self.out_channels]
        return list(zip(c[:-1], c[1:]))

    def init(self, key: jax.Array) -> dict:
        p = {}
        for i, (cin, cout) in enumerate(self._chans(), start=1):
            k_aff, k_w, key = jax.random.split(key, 3)
            p[f"affine{i}"] = FullyConnected(self.w_dim, cin, bias_init=1.0).init(k_aff)
            p[f"weight{i}"] = jax.random.normal(k_w, (cout, cin, self.kernel_size, self.kernel_size), jnp.float32)
            p[f"bias{i}"] = jnp.zeros((cout,), jnp.float32)
        return p

    def apply(self, p: dict, x: jnp.ndarray, w: jnp.ndarray, splitted: bool = False, n_planes: int = 1) -> jnp.ndarray:
        k = self.kernel_size
        for i, (cin, _cout) in enumerate(self._chans(), start=1):
            weight_gain = 1.0 / np.sqrt(cin * k * k)
            styles = FullyConnected(self.w_dim, cin, bias_init=1.0).apply(p[f"affine{i}"], w) * weight_gain
            if splitted:
                styles = _expand_styles_per_plane(styles, n_planes)
            x = modulated_conv2d(x, p[f"weight{i}"], styles, demodulate=False)
            x = bias_act(x, p[f"bias{i}"].astype(x.dtype), clamp=self.conv_clamp, act=self.act_name)
        return x


def minibatch_std(x: jnp.ndarray, group_size: Optional[int], num_channels: int = 1) -> jnp.ndarray:
    """Append cross-sample stddev channels (``MinibatchStdLayer``).  Uses the
    whole (possibly grouped) batch; ``group_size`` must divide the batch."""
    n, c, h, w = x.shape
    g = min(group_size, n) if group_size is not None else n
    f = num_channels
    cpf = c // f
    y = x.reshape(g, -1, f, cpf, h, w)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))
    y = y.reshape(-1, f, 1, 1)
    y = jnp.tile(y, (g, 1, h, w)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=1)
