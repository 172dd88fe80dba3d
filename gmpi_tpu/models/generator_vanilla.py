"""Vanilla and depth2alpha MPI generator variants.

Re-designs of the reference's other two generator families:

* **vanilla** (``gmpi/models/networks/networks_vanilla.py``): each skip head
  emits everything in one shot — 3 shared-RGB channels, optional 3 background
  channels (from the boundary-interpolated feature through the same torgb),
  and ``L`` per-plane alpha channels from a single ``toalpha``
  (``networks_vanilla.py:332-391`` head, ``:606-650`` split).  The plane
  count is baked into the head — no depth conditioning, no eval-time plane
  re-sampling.

* **depth2alpha** (``networks_vanilla_depth2alpha.py``): the head emits 1
  *depth* channel instead of L alphas; per-plane alphas are derived
  analytically: ``a = clamp(z_plane - depth, ±range/n_bins)`` rescaled to
  [0, 1] (``:612-661``).

Both reuse the mapping network and synthesis trunk of the main generator
(identical parameter naming -> the same checkpoint converter applies).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmpi_tpu.models.generator import MappingNetwork, SynthesisBlockCfg, SynthesisNetworkCfg
from gmpi_tpu.models.layers import ToRGB
from gmpi_tpu.ops.upfirdn2d import setup_filter, upsample2d


@dataclasses.dataclass(frozen=True)
class VanillaBlockCfg(SynthesisBlockCfg):
    """Skip block whose head emits [3 rgb (+3 bg) + head_channels] at once."""

    n_planes_fixed: int = 32
    head_type: str = "vanilla"  # vanilla -> L alphas; depth2alpha -> 1 depth

    @property
    def head_channels(self) -> int:
        return self.n_planes_fixed if self.head_type == "vanilla" else 1

    @property
    def out_img_channels(self) -> int:
        return 3 + (3 if self.sep_background else 0) + self.head_channels

    @property
    def head_key(self) -> str:
        # reference naming: ``toalpha`` (vanilla, L alphas) vs ``todepth``
        # (depth2alpha, 1 depth channel; ``networks_vanilla_depth2alpha.py:386``)
        return "toalpha" if self.head_type == "vanilla" else "todepth"

    def _toalpha_vanilla(self) -> ToRGB:
        return ToRGB(self.out_channels, self.head_channels, self.w_dim, conv_clamp=self.conv_clamp)

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        params: dict = {}
        buffers: dict = {}
        if self.in_channels == 0:
            key, k = jax.random.split(key)
            params["const"] = jax.random.normal(k, (self.out_channels, self.resolution, self.resolution), jnp.float32)
        else:
            key, k = jax.random.split(key)
            params["conv0"], buffers["conv0"] = self._conv0().init(k)
        key, k = jax.random.split(key)
        params["conv1"], buffers["conv1"] = self._conv1().init(k)
        key, k1, k2 = jax.random.split(key, 3)
        params["torgb"] = self._torgb().init(k1)
        params[self.head_key] = self._toalpha_vanilla().init(k2)
        return params, buffers

    def apply(
        self,
        params: dict,
        buffers: dict,
        x: Optional[jnp.ndarray],
        img: Optional[jnp.ndarray],
        block_ws: jnp.ndarray,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_trunk_grad: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bs = block_ws.shape[0]
        res = self.resolution
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        if self.in_channels == 0:
            x = jnp.broadcast_to(params["const"].astype(dtype)[None], (bs, self.out_channels, res, res))
            x = self._conv1().apply(params["conv1"], buffers["conv1"], x, block_ws[:, 0], noise_mode, rngs[0])
            w_idx = 1
        else:
            x = x.astype(dtype)
            x = self._conv0().apply(params["conv0"], buffers["conv0"], x, block_ws[:, 0], noise_mode, rngs[0])
            x = self._conv1().apply(params["conv1"], buffers["conv1"], x, block_ws[:, 1], noise_mode, rngs[1])
            w_idx = 2
        if stop_trunk_grad:
            x = jax.lax.stop_gradient(x)

        if img is not None:
            img = upsample2d(img, setup_filter(self.resample_filter))

        w_rgba = block_ws[:, w_idx]
        y_rgb = self._torgb().apply(params["torgb"], x, w_rgba)
        parts = [y_rgb]
        if self.sep_background:
            bg_feat = self._background_feature(x)
            parts.append(self._torgb().apply(params["torgb"], bg_feat, w_rgba))
        parts.append(self._toalpha_vanilla().apply(params[self.head_key], x, w_rgba))
        y = jnp.concatenate(parts, axis=1).astype(jnp.float32)
        img = img + y if img is not None else y
        return x, img


@dataclasses.dataclass(frozen=True)
class VanillaGeneratorCfg:
    """Generator over vanilla / depth2alpha heads."""

    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    n_planes: int = 32
    head_type: str = "vanilla"  # or "depth2alpha"
    channel_base: int = 32768
    channel_max: int = 512
    num_bf16_res: int = 0
    conv_clamp: Optional[float] = None
    sep_background: bool = True
    bg_ratio: float = 0.05
    # NOTE: the reference vanilla variants accept but never apply this flag
    # (``networks_vanilla.py:567`` — unused); we implement it, default off
    background_alpha_full: bool = False
    final_img_act: str = "tanh"
    mapping_num_layers: int = 8
    depth2alpha_z_range: float = 1.0
    depth2alpha_n_z_bins: int = 256

    @property
    def block_resolutions(self):
        return [2**i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def bf16_resolution(self) -> int:
        return max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_bf16_res), 8)

    def block_cfg(self, res: int) -> VanillaBlockCfg:
        return VanillaBlockCfg(
            in_channels=self.channels(res // 2) if res > 4 else 0,
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            is_last=(res == self.img_resolution),
            use_bf16=(self.num_bf16_res > 0 and res >= self.bf16_resolution),
            conv_clamp=self.conv_clamp,
            sep_background=self.sep_background,
            build_bg_from_rgb=self.sep_background,
            bg_ratio=self.bg_ratio,
            n_planes_fixed=self.n_planes,
            head_type=self.head_type,
        )

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            b = self.block_cfg(res)
            n += b.num_conv
            if b.is_last:
                n += b.num_torgb
        return n

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(self.z_dim, self.c_dim, self.w_dim, self.num_ws, self.mapping_num_layers)

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        k_map, key = jax.random.split(key)
        map_p, map_b = self.mapping.init(k_map)
        syn_p, syn_b = {}, {}
        for res in self.block_resolutions:
            key, k = jax.random.split(key)
            syn_p[f"b{res}"], syn_b[f"b{res}"] = self.block_cfg(res).init(k)
        return {"mapping": map_p, "synthesis": syn_p}, {"mapping": map_b, "synthesis": syn_b}

    def apply(
        self,
        params: dict,
        buffers: dict,
        z: jnp.ndarray,
        c: Optional[jnp.ndarray],
        xyz_dict: Optional[Dict[int, jnp.ndarray]],
        n_planes: Optional[int] = None,
        truncation_psi: float = 1.0,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_mapping_grad: bool = False,
        stop_trunk_grad: bool = False,
    ) -> jnp.ndarray:
        """z -> MPI [B, n_planes, 4, R, R] (plane count fixed at train value;
        depth2alpha reads per-plane z from ``xyz_dict[img_resolution]``)."""
        n_planes = n_planes or self.n_planes
        assert n_planes == self.n_planes, "vanilla heads bake in the plane count"
        ws = self.mapping.apply(params["mapping"], buffers["mapping"], z, c, truncation_psi)
        if stop_mapping_grad:
            ws = jax.lax.stop_gradient(ws)
        ws = ws.astype(jnp.float32)

        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            cfg = self.block_cfg(res)
            block_ws = ws[:, w_idx : w_idx + cfg.num_conv + cfg.num_torgb]
            w_idx += cfg.num_conv
            rng, block_rng = jax.random.split(rng) if rng is not None else (None, None)
            x, img = cfg.apply(params["synthesis"][f"b{res}"], buffers["synthesis"][f"b{res}"],
                               x, img, block_ws, noise_mode, block_rng, stop_trunk_grad)

        # final activation to [0, 1] (``networks_vanilla.py:613-622``)
        if self.final_img_act == "none":
            img = (jnp.clip(img, -1.0, 1.0) + 1.0) / 2.0
        elif self.final_img_act == "sigmoid":
            img = jax.nn.sigmoid(img)
        elif self.final_img_act == "tanh":
            img = (jnp.tanh(img) + 1.0) / 2.0
        else:
            raise ValueError(self.final_img_act)

        bs = img.shape[0]
        res = self.img_resolution
        rgb = img[:, :3]
        ch = 3
        if self.sep_background:
            background = img[:, 3:6][:, None]
            ch = 6
            fg = jnp.broadcast_to(rgb[:, None], (bs, self.n_planes - 1, 3, res, res))
            rgb_planes = jnp.concatenate([fg, background], axis=1)
        else:
            rgb_planes = jnp.broadcast_to(rgb[:, None], (bs, self.n_planes, 3, res, res))

        if self.head_type == "vanilla":
            alpha = img[:, ch : ch + self.n_planes][:, :, None]  # [B, L, 1, H, W]
        else:  # depth2alpha (``networks_vanilla_depth2alpha.py:612-661``)
            depth = img[:, ch : ch + 1]  # [B, 1, H, W]
            z_diff_max = self.depth2alpha_z_range / self.depth2alpha_n_z_bins
            tex_z = xyz_dict[self.img_resolution][..., 2]  # [L, H, W]
            z_diff = tex_z[None] - depth  # [B, L, H, W]
            z_diff = jnp.clip(z_diff, -z_diff_max, z_diff_max)
            alpha = ((z_diff + z_diff_max) / (2 * z_diff_max + 1e-8))[:, :, None]

        if self.background_alpha_full:
            ones = jnp.ones_like(alpha[:, -1:])
            alpha = jnp.concatenate([alpha[:, :-1], ones], axis=1)
        return jnp.concatenate([rgb_planes, alpha], axis=2)
