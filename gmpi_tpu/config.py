"""Typed experiment configuration — unifies the reference's yacs YAML
(``configs/gmpi.yml``) and python curriculum dicts (``gmpi/curriculums.py``)
into frozen dataclass presets.

The reference merges three config sources at runtime
(``train_helpers.modify_curriculums``, ``gmpi/train_helpers.py:33-108``); here
each dataset preset is one explicit object.  The step-keyed curriculum idea
(``curriculums.extract_metadata``, ``curriculums.py:76-85``) survives as
``TrainPlan.at_step`` for the (vestigial) progressive-resolution machinery —
GMPI trains single-stage, so presets carry exactly one resolution entry.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from gmpi_tpu.core.poses import SphereCameraConfig


@dataclasses.dataclass(frozen=True)
class PlaneConfig:
    """MPI plane layout (``configs/gmpi.yml:72-89`` + curriculum ray range)."""

    n_planes: int = 32
    min_d: float = 0.95
    max_d: float = 1.12
    distance_sample_method: str = "inverse"
    enlarge_factor: float = 1.001
    confined: bool = True
    align_corners: bool = True


@dataclasses.dataclass(frozen=True)
class StepHparams:
    """Per-resolution training hyperparameters (``curriculums.py res_dict``)."""

    batch_size: int
    img_size: int
    tex_size: int
    batch_split: int
    gen_lr: float
    disc_lr: float


@dataclasses.dataclass(frozen=True)
class TrainHparams:
    """Optimization + loss settings (``curriculums.py`` non-int keys and
    ``configs/gmpi.yml GMPI.TRAIN``)."""

    betas: Tuple[float, float] = (0.0, 0.9)
    weight_decay: float = 0.0
    r1_lambda: float = 10.0
    grad_clip: float = 10.0
    mapping_lr_mult: float = 5e-2  # ``train.py:378-380``
    z_dim: int = 512
    w_dim: int = 512
    n_view_per_z: int = 4
    select_worst_view: bool = True
    # worst-view selection renders its no-grad candidate views at this
    # resolution (bilinearly upsampled before D scoring); 0 = full img_size.
    # The selection phase measured 42% of step time at full res — candidates
    # only need enough detail to *rank* views per z (``docs/DESIGN.md``)
    worst_view_render_res: int = 0
    g_iters: int = 1  # G updates per D update (``configs/gmpi.yml:66``)
    train_d: bool = True  # ``configs/gmpi.yml:61`` D_train
    ema_decay: float = 0.999
    ema2_decay: float = 0.9999
    d_cond_on_pose: bool = True
    d_cond_pose_dim: int = 16
    truncation_psi: float = 1.0
    total_iters: int = 5001
    # lighting augmentation (``configs/gmpi.yml:30-34``)
    aug_with_lighting: bool = True
    lighting_max_ka: float = 0.9
    lighting_max_kd: float = 0.1
    lighting_start_iter: int = 1000
    lighting_grow_n_iters: int = 1000
    # generator grad gating (``configs/gmpi.yml:60-64``: heads train, trunk
    # warm-started; full fine-tune enables everything)
    train_mapping: bool = True
    train_trunk: bool = True
    # plane-chunked rendering inside the train step (memory relief at 1024²;
    # None = unchunked)
    renderer_plane_chunk: Optional[int] = None
    # D-phase micro-batching: generate the no-grad fake batch in
    # ``batch_split`` slices (the reference splits exactly this,
    # ``gmpi/train.py:503-518``) — bounds the live plane-stack memory at
    # 1024²/96 planes.  False mirrors round-2 behavior (full batch at once)
    d_batch_split: bool = True
    # rematerialize D activations inside the R1 grad-of-grad (memory relief
    # for the 1024² double-backprop; trades one extra D forward per step)
    r1_remat: bool = False
    # NaN-poison rendered colors when a ray exits the last plane
    # (``gmpi/core/mpi.py:381-395`` runtime analogue); on in tests/smoke
    debug_ray_check: bool = False
    # fused Pallas warp+composite renderer in the train step (TPU fast path;
    # bands planned over the truncated pose range at setup).  None = auto:
    # fused whenever running on an accelerator with align_corners=True and a
    # pixel grid the kernel layout supports (img % 64 == 0); True/False force
    use_fused_renderer: Optional[bool] = None
    # fused renderer texture compute dtype: "bf16" halves texture DMA and
    # the padded-texture HBM footprint (~2e-3 rel fwd err, fp32 accum) —
    # memory relief for 1024^2 training on 16 GB chips; None = fp32
    fused_compute_dtype: Optional[str] = None
    # per-plan-chunk jax.checkpoint through the fused renderer: backward
    # peak holds ONE chunk's residuals (~1/n_chunks) at ~2x forward cost —
    # what lets 96x1024^2 training fit a 16 GB chip
    fused_remat: bool = False
    # multi-chip renderer sharding inside the train step: shard the plane
    # axis (and optionally output pixel rows) of every full-resolution render
    # over a ``("plane"[, "tile"])`` device mesh (``parallel/render.py``) with
    # params/batch replicated — per-chip renderer residuals drop ~n_plane x,
    # which is what makes FFHQ1024 training fit 16 GB v5e chips (the
    # reference's 8x 32 GB V100 config, ``docs/TRAIN_EVAL.md:152``).  The
    # caller passes the mesh to ``make_train_step``; these fields drive the
    # loop's mesh construction.  0/1 = single-device renderer.
    renderer_plane_shards: int = 0
    renderer_tile_shards: int = 0
    # edge-aware depth smoothness loss on rendered (rgb, depth)
    # (``configs/gmpi.yml:51-56``; the reference defines the loss but its
    # train path raises NotImplementedError — we support it)
    use_edge_aware_loss: bool = False
    edge_aware_loss_w: float = 1.0
    edge_aware_loss_e_min: float = 0.05
    edge_aware_loss_g_min: float = 0.01


@dataclasses.dataclass(frozen=True)
class ModelPreset:
    """Generator/discriminator architecture switches
    (``configs/gmpi.yml:121-158``)."""

    cond_mode: str = "normalize_add_z"
    embed_func: str = "modulated_lrelu"
    pos_enc_multires: int = 0
    sep_background: bool = True
    build_bg_from_rgb: bool = True
    bg_ratio: float = 0.05
    only_alpha: bool = True
    gen_alpha_largest_res: int = 256
    background_alpha_full: bool = True
    final_img_act: str = "tanh"
    channel_base: int = 32768
    channel_max: int = 512
    num_bf16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: int = 16
    mbstd_group_size: int = 4
    # xyz conditioning-grid options (``configs/gmpi.yml:36-38``)
    xyz_ztype: str = "depth"  # "depth" | "disparity"
    use_normalized_xyz: bool = True
    normalized_xyz_range: str = "01"  # "01" | "-11"


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    resolution: int
    camera: SphereCameraConfig
    planes: PlaneConfig
    hparams: StepHparams
    train: TrainHparams
    model: ModelPreset
    fov_deg: float = 12.6
    eval_n_planes: int = 96  # eval protocol (``eval.sh:51``)

    def multi_res_xyz(self, geom, tex_size: int | None = None):
        """Conditioning grids with this preset's xyz options
        (``mpi_renderer.py:159-180``)."""
        from gmpi_tpu.core.geometry import multi_res_xyz

        return multi_res_xyz(
            geom, tex_size or self.hparams.tex_size,
            normalized=self.model.use_normalized_xyz,
            value_range=self.model.normalized_xyz_range,
            ztype=self.model.xyz_ztype,
        )

    def generator_cfg(self):
        from gmpi_tpu.models.generator import GeneratorCfg, SynthesisNetworkCfg

        fmaps = 0.5 if self.resolution == 256 else 1.0  # STYLEGAN2_CFG_SPECS (``train_helpers.py:17-30``)
        channel_base = int(self.model.channel_base * fmaps)
        num_bf16 = self.model.num_bf16_res if self.resolution > 128 else 0
        clamp = self.model.conv_clamp if self.resolution > 128 else None
        return GeneratorCfg(
            z_dim=self.train.z_dim,
            w_dim=self.train.w_dim,
            img_resolution=self.resolution,
            background_alpha_full=self.model.background_alpha_full,
            final_img_act=self.model.final_img_act,
            synthesis=SynthesisNetworkCfg(
                w_dim=self.train.w_dim,
                img_resolution=self.resolution,
                channel_base=channel_base,
                channel_max=self.model.channel_max,
                num_bf16_res=num_bf16,
                conv_clamp=clamp,
                pos_enc_multires=self.model.pos_enc_multires,
                cond_mode=self.model.cond_mode,
                embed_func=self.model.embed_func,
                sep_background=self.model.sep_background,
                build_bg_from_rgb=self.model.build_bg_from_rgb,
                bg_ratio=self.model.bg_ratio,
                only_alpha=self.model.only_alpha,
                gen_alpha_largest_res=self.model.gen_alpha_largest_res,
            ),
        )

    def discriminator_cfg(self):
        from gmpi_tpu.models.discriminator import DiscriminatorCfg

        fmaps = 0.5 if self.resolution == 256 else 1.0
        num_bf16 = self.model.num_bf16_res if self.resolution > 128 else 0
        clamp = self.model.conv_clamp if self.resolution > 128 else None
        return DiscriminatorCfg(
            c_dim=self.train.d_cond_pose_dim if self.train.d_cond_on_pose else 0,
            img_resolution=self.resolution,
            channel_base=int(self.model.channel_base * fmaps),
            channel_max=self.model.channel_max,
            num_bf16_res=num_bf16,
            conv_clamp=clamp,
            cmap_dim=self.model.cmap_dim,
            mbstd_group_size=self.model.mbstd_group_size,
        )

    def plane_geometry(self):
        from gmpi_tpu.core.geometry import build_plane_geometry

        return build_plane_geometry(
            n_planes=self.planes.n_planes,
            min_d=self.planes.min_d,
            max_d=self.planes.max_d,
            distance_sample_method=self.planes.distance_sample_method,
            fov_deg=self.fov_deg,
            sphere_center_z=self.camera.sphere_center_z,
            sphere_r=self.camera.sphere_r,
            yaw_mean=self.camera.yaw_mean,
            yaw_std=self.camera.yaw_std,
            pitch_mean=self.camera.pitch_mean,
            pitch_std=self.camera.pitch_std,
            n_truncated_stds=self.camera.n_truncated_stds,
            enlarge_factor=self.planes.enlarge_factor,
            confined=self.planes.confined,
        )


def _ffhq(resolution: int, batch_size: int, batch_split: int) -> ExperimentConfig:
    return ExperimentConfig(
        name=f"FFHQ{resolution}",
        resolution=resolution,
        fov_deg=12.6,
        camera=SphereCameraConfig(
            sphere_center_z=1.0, sphere_r=1.0,
            yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
            n_truncated_stds=2.0, sample_method="truncated_gaussian",
        ),
        planes=PlaneConfig(min_d=0.95, max_d=1.12),
        hparams=StepHparams(batch_size, resolution, resolution, batch_split, 0.002, 0.002),
        train=TrainHparams(),
        model=ModelPreset(),
    )


PRESETS: Dict[str, ExperimentConfig] = {
    "FFHQ256": _ffhq(256, 8, 1),
    "FFHQ512": _ffhq(512, 4, 1),
    "FFHQ1024": _ffhq(1024, 4, 2),
    "AFHQCat": ExperimentConfig(
        name="AFHQCat",
        resolution=512,
        fov_deg=13.39,
        camera=SphereCameraConfig(
            sphere_center_z=2.7, sphere_r=2.7,
            yaw_mean=0.0, yaw_std=0.19, pitch_mean=0.0, pitch_std=0.15,
            n_truncated_stds=3.0, sample_method="truncated_gaussian",
        ),
        planes=PlaneConfig(min_d=2.55, max_d=2.8),
        hparams=StepHparams(4, 512, 512, 1, 0.002, 0.002),
        train=TrainHparams(),
        model=ModelPreset(),
    ),
    "MetFaces": ExperimentConfig(
        name="MetFaces",
        resolution=1024,
        fov_deg=12.6,
        camera=SphereCameraConfig(
            sphere_center_z=1.0, sphere_r=1.0,
            yaw_mean=0.0, yaw_std=0.339, pitch_mean=0.0, pitch_std=0.133,
            n_truncated_stds=2.0, sample_method="truncated_gaussian",
        ),
        planes=PlaneConfig(min_d=0.95, max_d=1.12),
        hparams=StepHparams(4, 1024, 1024, 2, 0.002, 0.002),
        train=TrainHparams(),
        model=ModelPreset(),
    ),
}


def get_config(name: str, **overrides) -> ExperimentConfig:
    cfg = PRESETS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg
