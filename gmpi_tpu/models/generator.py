"""MPI generator — StyleGAN2 backbone whose toRGB path emits multiplane images.

Functional JAX re-design of the reference generator family
(``gmpi/models/networks/networks_cond_on_pos_enc.py``): a mapping network, a
skip-architecture synthesis trunk, and per-resolution MPI heads that emit a
shared RGB texture, per-plane alphas conditioned on plane depth, and an
optional separately-synthesized background plane.

Conditioning modes (``networks_cond_on_pos_enc.py:609``): ``add_z``,
``normalize_add_z`` (paper default), ``add_xyz``, ``normalize_add_xyz``,
``cat_xyz``, ``cond_z``, ``cond_xyz``.  Depth-embedding functions:
``mlp``, ``conv_<act>``, ``modulated_<act>`` (paper: ``modulated_lrelu`` =
4-layer w-modulated 1x1 conv stack, ``:485-548``).

All static architecture choices live in frozen dataclass configs; parameters
and buffers are nested dicts of jnp arrays, so the whole generator is a pure
function ready for jit / grad / pjit.  High-resolution blocks can run in
bfloat16 (the TPU analogue of the reference's fp16 top-4-resolutions policy,
``gmpi/train.py:119-134``) while the MPI accumulator stays float32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmpi_tpu.models.layers import (
    FLOATING_EPS,
    Conv2d,
    FullyConnected,
    SynthesisLayer,
    ToRGB,
    ToRGBDeeperModulated,
    _expand_styles_per_plane,
    instance_mean_std,
    normalize_2nd_moment,
)
from gmpi_tpu.ops.upfirdn2d import setup_filter, upsample2d

CondMode = str  # add_z | normalize_add_z | add_xyz | normalize_add_xyz | cat_xyz | cond_z | cond_xyz


def pos_enc_dim(multires: int) -> int:
    """Per-axis positional-encoding width: identity + sin/cos pairs
    (``get_embedder``, ``networks_cond_on_pos_enc.py:84-102``; multires=0 →
    identity, the paper setting)."""
    return 1 + 2 * multires


def apply_pos_enc(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """NeRF positional encoding along the last axis (input width 1)."""
    if multires == 0:
        return x
    outs = [x]
    for k in range(multires):
        freq = 2.0**k
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Mapping network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MappingNetwork:
    """z (+ optional label embed) -> broadcast w's
    (``networks_cond_on_pos_enc.py:291-367``)."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995

    def _features(self):
        embed_features = self.w_dim if self.c_dim > 0 else 0
        return [self.z_dim + embed_features] + [self.w_dim] * (self.num_layers - 1) + [self.w_dim]

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        params = {}
        feats = self._features()
        if self.c_dim > 0:
            key, k = jax.random.split(key)
            params["embed"] = FullyConnected(self.c_dim, self.w_dim).init(k)
        for i in range(self.num_layers):
            key, k = jax.random.split(key)
            params[f"fc{i}"] = FullyConnected(
                feats[i], feats[i + 1], activation="lrelu", lr_multiplier=self.lr_multiplier
            ).init(k)
        buffers = {"w_avg": jnp.zeros((self.w_dim,), jnp.float32)}
        return params, buffers

    def apply(
        self,
        params: dict,
        buffers: dict,
        z: Optional[jnp.ndarray],
        c: Optional[jnp.ndarray] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
    ) -> jnp.ndarray:
        feats = self._features()
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(
                FullyConnected(self.c_dim, self.w_dim).apply(params["embed"], c.astype(jnp.float32))
            )
            x = jnp.concatenate([x, y], axis=1) if x is not None else y
        for i in range(self.num_layers):
            x = FullyConnected(
                feats[i], feats[i + 1], activation="lrelu", lr_multiplier=self.lr_multiplier
            ).apply(params[f"fc{i}"], x)
        ws = jnp.broadcast_to(x[:, None, :], (x.shape[0], self.num_ws, self.w_dim))
        if truncation_psi != 1.0:
            w_avg = buffers["w_avg"]
            if truncation_cutoff is None:
                ws = w_avg + truncation_psi * (ws - w_avg)
            else:
                trunc = w_avg + truncation_psi * (ws[:, :truncation_cutoff] - w_avg)
                ws = jnp.concatenate([trunc, ws[:, truncation_cutoff:]], axis=1)
        return ws

    def updated_w_avg(self, buffers: dict, ws: jnp.ndarray) -> jnp.ndarray:
        """New ``w_avg`` after seeing a batch: ``mean(w).lerp(w_avg, beta)``
        (``networks_cond_on_pos_enc.py:354-356``)."""
        batch_mean = jax.lax.stop_gradient(jnp.mean(ws[:, 0, :], axis=0))
        return batch_mean + self.w_avg_beta * (buffers["w_avg"] - batch_mean)


# ---------------------------------------------------------------------------
# Synthesis block with MPI head
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisBlockCfg:
    in_channels: int  # 0 = first block (learned const input)
    out_channels: int
    w_dim: int
    resolution: int
    is_last: bool
    use_bf16: bool = False
    architecture: str = "skip"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    # MPI head
    pos_enc_multires: int = 0
    cond_mode: CondMode = "normalize_add_z"
    embed_func: str = "modulated_lrelu"
    sep_background: bool = True
    build_bg_from_rgb: bool = True
    bg_ratio: float = 0.05
    only_alpha: bool = True
    gen_alpha_largest_res: int = 256
    img_channels: int = 4
    n_planes_train: int = 32  # token count for embed_func="learnable_param"

    @property
    def gen_alpha_this_res(self) -> bool:
        return self.gen_alpha_largest_res >= self.resolution

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1

    @property
    def pos_enc_total_ch(self) -> int:
        per_axis = pos_enc_dim(self.pos_enc_multires)
        if self.cond_mode in ("cond_xyz", "cat_xyz"):
            return per_axis * 3
        return per_axis

    # -- sub-modules ---------------------------------------------------------

    def _conv0(self) -> SynthesisLayer:
        return SynthesisLayer(
            self.in_channels, self.out_channels, self.w_dim, self.resolution, up=2,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
        )

    def _conv1(self) -> SynthesisLayer:
        return SynthesisLayer(
            self.out_channels if self.in_channels else self.out_channels,
            self.out_channels, self.w_dim, self.resolution, conv_clamp=self.conv_clamp,
        )

    def _embed_head(self):
        """One depth/axis-embedding head mapping pos-enc channels to feature
        channels (``SynthesisBlock.__init__``, ``:622-657``)."""
        if self.embed_func == "mlp":
            return FullyConnected(self.pos_enc_total_ch, self.out_channels, activation="linear")
        if self.embed_func.startswith("conv"):
            act = self.embed_func.split("_")[1]
            c = self.out_channels
            return [
                Conv2d(self.pos_enc_total_ch, c // 4, 1, bias=False, activation=act, conv_clamp=self.conv_clamp),
                Conv2d(c // 4, c // 2, 1, bias=False, activation=act, conv_clamp=self.conv_clamp),
                Conv2d(c // 2, c, 1, bias=False, activation=act, conv_clamp=self.conv_clamp),
            ]
        if self.embed_func.startswith("modulated"):
            act = self.embed_func.split("_")[1]
            c = self.out_channels
            return ToRGBDeeperModulated(
                self.pos_enc_total_ch, c, self.w_dim, (c // 4, c // 2, c),
                conv_clamp=self.conv_clamp, act_name=act,
            )
        if self.embed_func == "learnable_param":
            return "learnable_param"
        raise ValueError(self.embed_func)

    def _torgb(self) -> ToRGB:
        return ToRGB(self.out_channels, 3, self.w_dim, conv_clamp=self.conv_clamp)

    def _toalpha(self) -> ToRGB:
        extra = self.pos_enc_total_ch if self.cond_mode == "cat_xyz" else 0
        return ToRGB(self.out_channels + extra, 1, self.w_dim, conv_clamp=self.conv_clamp)

    def _torgba(self) -> ToRGB:
        extra = self.pos_enc_total_ch if self.cond_mode == "cat_xyz" else 0
        return ToRGB(self.out_channels + extra, self.img_channels, self.w_dim, conv_clamp=self.conv_clamp)

    # -- params --------------------------------------------------------------

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

        if self.gen_alpha_this_res and self.cond_mode not in ("cat_xyz",):
            heads = ["pos_enc_embed_x", "pos_enc_embed_y", "pos_enc_embed_z"] if "xyz" in self.cond_mode and self.cond_mode.startswith(("add", "normalize")) else ["pos_enc_embed"]
            for name in heads:
                key, k = jax.random.split(key)
                head = self._embed_head()
                if isinstance(head, list):
                    sub = {}
                    for i, layer in enumerate(head):
                        k, kk = jax.random.split(k)
                        # Sequential index naming: converter name-walk parity
                        sub[str(i)] = layer.init(kk)
                    params[name] = sub
                elif head == "learnable_param":
                    # per-plane learned token (``networks_pos_enc_learnable_param.py:656-668``)
                    params[name + "_learnable_param"] = jax.random.uniform(
                        k, (1, self.n_planes_train, self.out_channels, 1, 1), jnp.float32
                    )
                    buffers[name + "_learnable_param_left_append"] = jnp.zeros(
                        (1, 1, self.out_channels, 1, 1), jnp.float32
                    )
                else:
                    params[name] = head.init(k)

        if self.only_alpha:
            key, k = jax.random.split(key)
            params["torgb"] = self._torgb().init(k)
            if self.gen_alpha_this_res:
                key, k = jax.random.split(key)
                params["toalpha"] = self._toalpha().init(k)
        else:
            key, k = jax.random.split(key)
            params["torgba"] = self._torgba().init(k)
        return params, buffers

    # -- embedding helpers ---------------------------------------------------

    def _apply_embed_head(self, p: dict, head, x: jnp.ndarray, w, n_planes: int) -> jnp.ndarray:
        """Run one embed head on NCHW input ``x`` ([*, pos_ch, h', w'])."""
        if isinstance(head, FullyConnected):
            n, c, hh, ww = x.shape
            flat = x.transpose(0, 2, 3, 1).reshape(-1, c)
            out = head.apply(p, flat)
            return out.reshape(n, hh, ww, -1).transpose(0, 3, 1, 2)
        if isinstance(head, list):
            for i, layer in enumerate(head):
                x = layer.apply(p[str(i)], x)
            return x
        return head.apply(p, x, w, splitted=True, n_planes=n_planes)

    def _embed_z(self, params: dict, z_vals: jnp.ndarray, w, bs: int, n_planes: int, key: str = "pos_enc_embed",
                 buffers: Optional[dict] = None, z_interpolation_ws: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Per-plane depth embedding -> [bs*L or L, C, 1, 1]
        (``_add_z``, ``networks_cond_on_pos_enc.py:993-1030``)."""
        head = self._embed_head()
        if head == "learnable_param":
            # learned per-plane tokens; eval-time plane-count change blends
            # neighboring tokens with boundary sentinels
            # (``networks_pos_enc_learnable_param.py:880-901``)
            tokens = params[key + "_learnable_param"]  # [1, L_train, C, 1, 1]
            if z_interpolation_ws is not None:
                left = buffers[key + "_learnable_param_left_append"]
                right = tokens[:, -1:]
                ext = jnp.concatenate([left, tokens, right], axis=1)  # [1, L_src+2, C, 1, 1]
                n_tgt, n_src = z_interpolation_ws.shape
                ws_r = z_interpolation_ws.reshape(1, n_tgt, n_src, 1, 1, 1)
                tokens = jnp.sum(ext[:, None] * ws_r, axis=2)  # [1, n_tgt, C, 1, 1]
            assert tokens.shape[1] == n_planes, (tokens.shape, n_planes)
            return jnp.broadcast_to(tokens, (bs, n_planes, *tokens.shape[2:])).reshape(bs * n_planes, -1, 1, 1)
        enc = apply_pos_enc(z_vals.reshape(n_planes, 1), self.pos_enc_multires)  # [L, pos_ch]
        if isinstance(head, ToRGBDeeperModulated):
            inp = jnp.broadcast_to(enc[None], (bs, n_planes, enc.shape[-1])).reshape(bs * n_planes, -1, 1, 1)
            return self._apply_embed_head(params[key], head, inp, w, n_planes)  # [bs*L, C, 1, 1]
        out = self._apply_embed_head(params[key], head, enc.reshape(n_planes, -1, 1, 1), w, n_planes)  # [L, C, 1, 1]
        return jnp.tile(out, (bs, 1, 1, 1))

    def _embed_axis(self, params: dict, vals: jnp.ndarray, w, bs: int, n_planes: int, key: str, horizontal: bool) -> jnp.ndarray:
        """Per-plane x (or y) line embedding -> [bs*L, C, 1, W] / [bs*L, C, H, 1]
        (``_add_x``/``_add_y``, ``:1032-1124``)."""
        res = self.resolution
        enc = apply_pos_enc(vals.reshape(n_planes * res, 1), self.pos_enc_multires)  # [L*res, pos_ch]
        head = self._embed_head()
        if isinstance(head, ToRGBDeeperModulated):
            # reference layout: [res, L, pos_ch] expanded per sample, w repeated per line
            enc_rl = enc.reshape(n_planes, res, -1).transpose(1, 0, 2)  # [res, L, pos_ch]
            inp = jnp.broadcast_to(enc_rl[None], (bs, res, n_planes, enc.shape[-1]))
            inp = inp.reshape(bs * res * n_planes, -1, 1, 1)
            w_rep = jnp.broadcast_to(w[:, None, :], (bs, res, w.shape[-1])).reshape(bs * res, -1)
            out = self._apply_embed_head(params[key], head, inp, w_rep, n_planes)[..., 0, 0]
            out = out.reshape(bs, res, n_planes, -1).transpose(0, 2, 3, 1).reshape(bs * n_planes, -1, res)
        else:
            out = self._apply_embed_head(params[key], head, enc.reshape(n_planes * res, -1, 1, 1), w, n_planes)[..., 0, 0]
            out = out.reshape(n_planes, res, -1).transpose(0, 2, 1)  # [L, C, res]
            out = jnp.tile(out, (bs, 1, 1))
        return out[:, :, None, :] if horizontal else out[:, :, :, None]

    def _background_feature(self, x: jnp.ndarray) -> jnp.ndarray:
        """Horizontally interpolate boundary columns of the (detached) feature
        map (``SynthesisBlock.forward``, ``:900-946``)."""
        res = self.resolution
        xd = jax.lax.stop_gradient(x)
        pad = max(1, int(np.floor(self.bg_ratio * res)))
        start, end = pad, res - pad
        left = xd[:, :, :, :pad]
        right = xd[:, :, :, res - pad:]
        if start < end:
            cols = jnp.arange(start, end, dtype=jnp.float32).reshape(1, 1, 1, -1)
            ratios = (cols - start) / (end - start + FLOATING_EPS)
            lf = xd[:, :, :, start : start + 1]
            rf = xd[:, :, :, end - 1 : end]
            mid = (1.0 - ratios) * lf + ratios * rf
            return jnp.concatenate([left, mid, right], axis=3)
        return jnp.concatenate([left, right], axis=3)

    # -- forward -------------------------------------------------------------

    def apply(
        self,
        params: dict,
        buffers: dict,
        x: Optional[jnp.ndarray],
        img: Optional[jnp.ndarray],
        block_ws: jnp.ndarray,  # [B, num_conv + num_torgb, w_dim]
        xyz: Optional[jnp.ndarray],  # [L, res, res, 3] normalized coords (or None)
        n_planes: int,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_trunk_grad: bool = False,
        z_interpolation_ws: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bs = block_ws.shape[0]
        res = self.resolution
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        # trunk ---------------------------------------------------------------
        if self.in_channels == 0:
            x = jnp.broadcast_to(params["const"].astype(dtype)[None], (bs, self.out_channels, res, res))
            w_conv1 = block_ws[:, 0]
            x = self._conv1().apply(params["conv1"], buffers["conv1"], x, w_conv1, noise_mode, rngs[0])
            w_idx = 1
        else:
            x = x.astype(dtype)
            w_conv0 = block_ws[:, 0]
            x = self._conv0().apply(params["conv0"], buffers["conv0"], x, w_conv0, noise_mode, rngs[0])
            w_conv1 = block_ws[:, 1]
            x = self._conv1().apply(params["conv1"], buffers["conv1"], x, w_conv1, noise_mode, rngs[1])
            w_idx = 2
        if stop_trunk_grad:
            x = jax.lax.stop_gradient(x)

        # MPI head ------------------------------------------------------------
        if img is not None:
            img = upsample2d(img, setup_filter(self.resample_filter))

        w_rgba = block_ws[:, w_idx]

        cond_x = None
        if self.gen_alpha_this_res:
            assert xyz is not None, "conditioning coordinates required at alpha resolutions"
            xyz = xyz.astype(jnp.float32)
            if self.cond_mode in ("add_z", "normalize_add_z"):
                z_vals = xyz[:, 0, 0, 2] if xyz.ndim == 4 else xyz.reshape(n_planes)
                embeds = self._embed_z(params, z_vals.astype(dtype), w_conv1, bs, n_planes,
                                       buffers=buffers, z_interpolation_ws=z_interpolation_ws)
                cond_x = x
                if self.cond_mode == "normalize_add_z":
                    mean, std = instance_mean_std(cond_x.astype(jnp.float32))
                    cond_x = ((cond_x.astype(jnp.float32) - mean) / (std + FLOATING_EPS)).astype(dtype)
                cond_x = jnp.broadcast_to(cond_x[:, None], (bs, n_planes, *cond_x.shape[1:])).reshape(
                    bs * n_planes, -1, res, res
                )
                cond_x = cond_x + embeds.astype(dtype)
            elif self.cond_mode in ("add_xyz", "normalize_add_xyz"):
                x_vals = xyz[:, 0, :, 0]  # [L, W]
                y_vals = xyz[:, :, 0, 1]  # [L, H]
                z_vals = xyz[:, 0, 0, 2]  # [L]
                ex = self._embed_axis(params, x_vals.astype(dtype), w_conv1, bs, n_planes, "pos_enc_embed_x", horizontal=True)
                ey = self._embed_axis(params, y_vals.astype(dtype), w_conv1, bs, n_planes, "pos_enc_embed_y", horizontal=False)
                ez = self._embed_z(params, z_vals.astype(dtype), w_conv1, bs, n_planes, "pos_enc_embed_z")
                cond_x = x
                if self.cond_mode == "normalize_add_xyz":
                    mean, std = instance_mean_std(cond_x.astype(jnp.float32))
                    cond_x = ((cond_x.astype(jnp.float32) - mean) / (std + FLOATING_EPS)).astype(dtype)
                cond_x = jnp.broadcast_to(cond_x[:, None], (bs, n_planes, *cond_x.shape[1:])).reshape(
                    bs * n_planes, -1, res, res
                )
                cond_x = cond_x + ex.astype(dtype) + ey.astype(dtype) + ez.astype(dtype)
            elif self.cond_mode == "cat_xyz":
                enc = apply_pos_enc(xyz.reshape(n_planes, res, res, 3, 1), self.pos_enc_multires)
                enc = enc.reshape(n_planes, res, res, -1).transpose(0, 3, 1, 2)  # [L, 3*pos, res, res]
                cond_x = jnp.broadcast_to(x[:, None], (bs, n_planes, *x.shape[1:])).reshape(
                    bs * n_planes, -1, res, res
                )
                enc_rep = jnp.tile(enc, (bs, 1, 1, 1)).astype(dtype)
                cond_x = jnp.concatenate([cond_x, enc_rep], axis=1)
            elif self.cond_mode in ("cond_z", "cond_xyz"):
                # AdaIN conditioning (``networks_cond_on_pos_enc.py:820-861``):
                # instance-normalized trunk features take the per-plane
                # embedding map's spatial statistics.  The reference supports
                # only mlp/conv embed functions here (its modulated path
                # raises ValueError).  Division is by calc_mean_std's std
                # (eps inside the variance — instance_mean_std matches);
                # unlike normalize_add_*, there is no extra outer
                # FLOATING_EPS (``:846`` vs ``:879``).
                head = self._embed_head()
                assert isinstance(head, (FullyConnected, list)), (
                    "cond_z/cond_xyz support mlp/conv embed functions only "
                    "(reference parity)")
                enc5 = apply_pos_enc(xyz.reshape(n_planes, res, res, 3, 1), self.pos_enc_multires)
                if self.cond_mode == "cond_z":
                    enc = enc5[:, :, :, 2, :]                    # [L, res, res, pos]
                else:
                    enc = enc5.reshape(n_planes, res, res, -1)   # [L, res, res, 3*pos]
                enc = enc.transpose(0, 3, 1, 2).astype(dtype)
                embeds = self._apply_embed_head(
                    params["pos_enc_embed"], head, enc, w_conv1, n_planes)
                e_mean, e_std = instance_mean_std(embeds.astype(jnp.float32))  # [L, C, 1, 1]
                mean, std = instance_mean_std(x.astype(jnp.float32))
                cond_x = (x.astype(jnp.float32) - mean) / std
                cond_x = jnp.broadcast_to(cond_x[:, None], (bs, n_planes, *cond_x.shape[1:])).reshape(
                    bs * n_planes, -1, res, res
                )
                cond_x = (cond_x * jnp.tile(e_std, (bs, 1, 1, 1))
                          + jnp.tile(e_mean, (bs, 1, 1, 1))).astype(dtype)
            else:
                raise NotImplementedError(self.cond_mode)

        background = None
        if self.sep_background:
            assert self.build_bg_from_rgb
            bg_feat = self._background_feature(x)
            background = self._torgb().apply(params["torgb"], bg_feat, w_rgba)  # [bs, 3, res, res]

        if self.only_alpha:
            single_rgb = self._torgb().apply(params["torgb"], x, w_rgba)  # [bs, 3, res, res]
            if self.sep_background:
                fg = jnp.broadcast_to(single_rgb[:, None], (bs, n_planes - 1, 3, res, res))
                cur_rgb = jnp.concatenate([fg, background[:, None]], axis=1)
            else:
                cur_rgb = jnp.broadcast_to(single_rgb[:, None], (bs, n_planes, 3, res, res))
            cur_rgb = cur_rgb.reshape(bs * n_planes, 3, res, res)
            if self.gen_alpha_this_res:
                cur_alpha = self._toalpha().apply(params["toalpha"], cond_x, w_rgba, splitted=True, n_planes=n_planes)
            else:
                cur_alpha = jnp.zeros((bs * n_planes, 1, res, res), cur_rgb.dtype)
            y = jnp.concatenate([cur_rgb, cur_alpha], axis=1)
        else:
            assert not self.sep_background
            y = self._torgba().apply(params["torgba"], cond_x, w_rgba, splitted=True, n_planes=n_planes)

        y = y.reshape(bs, n_planes * self.img_channels, res, res).astype(jnp.float32)
        img = img + y if img is not None else y
        return x, img


# ---------------------------------------------------------------------------
# Synthesis network + generator
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisNetworkCfg:
    w_dim: int
    img_resolution: int
    channel_base: int = 32768
    channel_max: int = 512
    num_bf16_res: int = 0
    conv_clamp: Optional[float] = None
    pos_enc_multires: int = 0
    cond_mode: CondMode = "normalize_add_z"
    embed_func: str = "modulated_lrelu"
    sep_background: bool = True
    build_bg_from_rgb: bool = True
    bg_ratio: float = 0.05
    only_alpha: bool = True
    gen_alpha_largest_res: int = 256
    n_planes_train: int = 32

    @property
    def block_resolutions(self):
        return [2**i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def bf16_resolution(self) -> int:
        return max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_bf16_res), 8)

    def block_cfg(self, res: int) -> SynthesisBlockCfg:
        return SynthesisBlockCfg(
            in_channels=self.channels(res // 2) if res > 4 else 0,
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            is_last=(res == self.img_resolution),
            use_bf16=(self.num_bf16_res > 0 and res >= self.bf16_resolution),
            conv_clamp=self.conv_clamp,
            pos_enc_multires=self.pos_enc_multires,
            cond_mode=self.cond_mode,
            embed_func=self.embed_func,
            sep_background=self.sep_background,
            build_bg_from_rgb=self.build_bg_from_rgb,
            bg_ratio=self.bg_ratio,
            only_alpha=self.only_alpha,
            gen_alpha_largest_res=self.gen_alpha_largest_res,
            n_planes_train=self.n_planes_train,
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

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        params, buffers = {}, {}
        for res in self.block_resolutions:
            key, k = jax.random.split(key)
            params[f"b{res}"], buffers[f"b{res}"] = self.block_cfg(res).init(k)
        return params, buffers

    def apply(
        self,
        params: dict,
        buffers: dict,
        ws: jnp.ndarray,  # [B, num_ws, w_dim]
        xyz_dict: Optional[Dict[int, jnp.ndarray]],
        n_planes: int,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_trunk_grad: bool = False,
        z_interpolation_ws: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ws = ws.astype(jnp.float32)
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            cfg = self.block_cfg(res)
            block_ws = ws[:, w_idx : w_idx + cfg.num_conv + cfg.num_torgb]
            w_idx += cfg.num_conv
            rng, block_rng = jax.random.split(rng) if rng is not None else (None, None)
            xyz = xyz_dict.get(res) if xyz_dict is not None else None
            x, img = cfg.apply(
                params[f"b{res}"], buffers[f"b{res}"], x, img, block_ws, xyz, n_planes,
                noise_mode=noise_mode, rng=block_rng, stop_trunk_grad=stop_trunk_grad,
                z_interpolation_ws=z_interpolation_ws,
            )
        return img


@dataclasses.dataclass(frozen=True)
class GeneratorCfg:
    """Flagship MPI generator (paper variant defaults from
    ``configs/gmpi.yml:121-145``)."""

    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    synthesis: SynthesisNetworkCfg = None  # filled in __post_init__ if None
    mapping_num_layers: int = 8
    background_alpha_full: bool = True
    final_img_act: str = "tanh"  # none | sigmoid | tanh

    def __post_init__(self):
        if self.synthesis is None:
            object.__setattr__(self, "synthesis", SynthesisNetworkCfg(self.w_dim, self.img_resolution))
        assert self.synthesis.img_resolution == self.img_resolution

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(self.z_dim, self.c_dim, self.w_dim, self.num_ws, self.mapping_num_layers)

    def init(self, key: jax.Array) -> Tuple[dict, dict]:
        k_map, k_syn = jax.random.split(key)
        map_p, map_b = self.mapping.init(k_map)
        syn_p, syn_b = self.synthesis.init(k_syn)
        return {"mapping": map_p, "synthesis": syn_p}, {"mapping": map_b, "synthesis": syn_b}

    def synthesize(
        self,
        params: dict,
        buffers: dict,
        ws: jnp.ndarray,
        xyz_dict: Optional[Dict[int, jnp.ndarray]],
        n_planes: int,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_trunk_grad: bool = False,
        z_interpolation_ws: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """ws -> MPI [B, L, 4, R, R] in [0, 1] (``Generator.synthesize``,
        ``networks_cond_on_pos_enc.py:1268-1315``)."""
        img = self.synthesis.apply(
            params["synthesis"], buffers["synthesis"], ws, xyz_dict, n_planes,
            noise_mode=noise_mode, rng=rng, stop_trunk_grad=stop_trunk_grad,
            z_interpolation_ws=z_interpolation_ws,
        )
        if self.final_img_act == "none":
            img = (jnp.clip(img, -1.0, 1.0) + 1.0) / 2.0
        elif self.final_img_act == "sigmoid":
            img = jax.nn.sigmoid(img)
        elif self.final_img_act == "tanh":
            img = (jnp.tanh(img) + 1.0) / 2.0
        else:
            raise ValueError(self.final_img_act)
        if self.background_alpha_full:
            bs = img.shape[0]
            ones = jnp.ones((bs, 1, self.img_resolution, self.img_resolution), img.dtype)
            img = jnp.concatenate([img[:, :-1], ones], axis=1)
        return img.reshape(img.shape[0], n_planes, 4, self.img_resolution, self.img_resolution)

    def apply(
        self,
        params: dict,
        buffers: dict,
        z: jnp.ndarray,
        c: Optional[jnp.ndarray],
        xyz_dict: Optional[Dict[int, jnp.ndarray]],
        n_planes: int,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        noise_mode: str = "random",
        rng: Optional[jax.Array] = None,
        stop_mapping_grad: bool = False,
        stop_trunk_grad: bool = False,
        z_interpolation_ws: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full forward: z -> MPI [B, L, 4, R, R]
        (``Generator.forward``, ``networks_cond_on_pos_enc.py:1317-1326``)."""
        ws = self.mapping.apply(params["mapping"], buffers["mapping"], z, c, truncation_psi, truncation_cutoff)
        if stop_mapping_grad:
            ws = jax.lax.stop_gradient(ws)
        return self.synthesize(
            params, buffers, ws, xyz_dict, n_planes,
            noise_mode=noise_mode, rng=rng, stop_trunk_grad=stop_trunk_grad,
            z_interpolation_ws=z_interpolation_ws,
        )
