"""Pose-conditioned StyleGAN2 discriminator.

Functional JAX re-design of the reference D
(``gmpi/models/networks/networks_cond_on_pos_enc.py:1334-1586``): resnet-
architecture downsampling blocks, minibatch-stddev epilogue, and projection
conditioning on the flattened w2c camera matrix — ``score = (out · cmap) /
sqrt(cmap_dim)`` with ``cmap = normalize_2nd_moment(Linear(flat_pose))``
(``:1557-1581``).  High-resolution blocks may run in bfloat16 (the reference
runs its top-4 resolutions in fp16, ``gmpi/train.py:130-134``); the epilogue
is always float32 (``:1485``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmpi_tpu.models.layers import Conv2d, FullyConnected, minibatch_std, normalize_2nd_moment
from gmpi_tpu.ops.upfirdn2d import downsample2d, setup_filter


@dataclasses.dataclass(frozen=True)
class DiscriminatorBlockCfg:
    in_channels: int  # 0 = first block (uses fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int = 3
    architecture: str = "resnet"
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    use_bf16: bool = False

    def _fromrgb(self) -> Conv2d:
        return Conv2d(self.img_channels, self.tmp_channels, 1, activation=self.activation, conv_clamp=self.conv_clamp)

    def _conv0(self) -> Conv2d:
        return Conv2d(self.tmp_channels, self.tmp_channels, 3, activation=self.activation, conv_clamp=self.conv_clamp)

    def _conv1(self) -> Conv2d:
        return Conv2d(self.tmp_channels, self.out_channels, 3, activation=self.activation, down=2, conv_clamp=self.conv_clamp)

    def _skip(self) -> Conv2d:
        return Conv2d(self.tmp_channels, self.out_channels, 1, bias=False, down=2)

    def init(self, key: jax.Array) -> dict:
        p = {}
        if self.in_channels == 0 or self.architecture == "skip":
            key, k = jax.random.split(key)
            p["fromrgb"] = self._fromrgb().init(k)
        key, k0 = jax.random.split(key)
        p["conv0"] = self._conv0().init(k0)
        key, k1 = jax.random.split(key)
        p["conv1"] = self._conv1().init(k1)
        if self.architecture == "resnet":
            key, ks = jax.random.split(key)
            p["skip"] = self._skip().init(ks)
        return p

    def apply(
        self, p: dict, x: Optional[jnp.ndarray], img: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = self._fromrgb().apply(p["fromrgb"], img)
            x = x + y if x is not None else y
            img = downsample2d(img, setup_filter((1, 3, 3, 1))) if self.architecture == "skip" else None
        if self.architecture == "resnet":
            y = self._skip().apply(p["skip"], x, gain=np.sqrt(0.5))
            x = self._conv0().apply(p["conv0"], x)
            x = self._conv1().apply(p["conv1"], x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = self._conv0().apply(p["conv0"], x)
            x = self._conv1().apply(p["conv1"], x)
        return x, img


@dataclasses.dataclass(frozen=True)
class DiscriminatorEpilogueCfg:
    in_channels: int
    cmap_dim: int
    resolution: int = 4
    img_channels: int = 3
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    use_mbstd: bool = True

    def _conv(self) -> Conv2d:
        return Conv2d(
            self.in_channels + self.mbstd_num_channels, self.in_channels, 3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    def _fc(self) -> FullyConnected:
        return FullyConnected(self.in_channels * self.resolution**2, self.in_channels, activation=self.activation)

    def _out(self) -> FullyConnected:
        return FullyConnected(self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim)

    def init(self, key: jax.Array) -> dict:
        k_c, k_f, k_o = jax.random.split(key, 3)
        return {"conv": self._conv().init(k_c), "fc": self._fc().init(k_f), "out": self._out().init(k_o)}

    def apply(self, p: dict, x: jnp.ndarray, cmap: Optional[jnp.ndarray]) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        if self.use_mbstd and self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        else:
            n, _, h, w = x.shape
            x = jnp.concatenate([x, jnp.zeros((n, self.mbstd_num_channels, h, w), x.dtype)], axis=1)
        x = self._conv().apply(p["conv"], x)
        x = self._fc().apply(p["fc"], x.reshape(x.shape[0], -1))
        x = self._out().apply(p["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1.0 / np.sqrt(self.cmap_dim))
        return x


@dataclasses.dataclass(frozen=True)
class DiscriminatorCfg:
    c_dim: int  # flattened-pose dim (16 or 9); 0 = unconditional
    img_resolution: int
    img_channels: int = 3
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_bf16_res: int = 0
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = 16
    mbstd_group_size: Optional[int] = 4
    use_mbstd: bool = True

    @property
    def block_resolutions(self):
        return [2**i for i in range(int(np.log2(self.img_resolution)), 2, -1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def bf16_resolution(self) -> int:
        return max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_bf16_res), 8)

    @property
    def resolved_cmap_dim(self) -> int:
        if self.c_dim == 0:
            return 0
        return self.channels(4) if self.cmap_dim is None else self.cmap_dim

    def block_cfg(self, res: int) -> DiscriminatorBlockCfg:
        return DiscriminatorBlockCfg(
            in_channels=self.channels(res) if res < self.img_resolution else 0,
            tmp_channels=self.channels(res),
            out_channels=self.channels(res // 2),
            resolution=res,
            img_channels=self.img_channels,
            architecture=self.architecture,
            conv_clamp=self.conv_clamp,
            use_bf16=(self.num_bf16_res > 0 and res >= self.bf16_resolution),
        )

    @property
    def epilogue_cfg(self) -> DiscriminatorEpilogueCfg:
        return DiscriminatorEpilogueCfg(
            in_channels=self.channels(4),
            cmap_dim=self.resolved_cmap_dim,
            img_channels=self.img_channels,
            architecture=self.architecture,
            mbstd_group_size=self.mbstd_group_size,
            conv_clamp=self.conv_clamp,
            use_mbstd=self.use_mbstd,
        )

    def init(self, key: jax.Array) -> dict:
        p = {}
        for res in self.block_resolutions:
            key, k = jax.random.split(key)
            p[f"b{res}"] = self.block_cfg(res).init(k)
        if self.c_dim > 0:
            # plain torch.nn.Linear analogue (``:1557-1562``): kaiming-uniform
            # weight, uniform bias in ±1/sqrt(fan_in)
            key, kw, kb = jax.random.split(key, 3)
            bound = 1.0 / np.sqrt(self.c_dim)
            p["mapping"] = {
                "weight": jax.random.uniform(kw, (self.resolved_cmap_dim, self.c_dim), jnp.float32, -bound, bound),
                "bias": jax.random.uniform(kb, (self.resolved_cmap_dim,), jnp.float32, -bound, bound),
            }
        key, k4 = jax.random.split(key)
        p["b4"] = self.epilogue_cfg.init(k4)
        return p

    def apply(self, p: dict, img: jnp.ndarray, flat_pose: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """img [B, 3, R, R], flat_pose [B, c_dim] -> score [B, 1]."""
        x = None
        for res in self.block_resolutions:
            x, img = self.block_cfg(res).apply(p[f"b{res}"], x, img)
        cmap = None
        if self.c_dim > 0:
            cmap = flat_pose.astype(jnp.float32) @ p["mapping"]["weight"].T + p["mapping"]["bias"]
            cmap = normalize_2nd_moment(cmap)
        return self.epilogue_cfg.apply(p["b4"], x, cmap)
