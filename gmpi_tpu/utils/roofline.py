"""Roofline accounting for the renderer hot path (BASELINE: "speed-of-light
roofline accounting for the warp+composite kernels").

Counts the minimum HBM traffic and compute of an MPI render at a given
configuration and converts measured wall time into attained fractions of a
chip's peaks.  Peaks default to TPU v5e (single core); override for other
chips.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    fp32_tflops: float
    bf16_tflops: float


TPU_V5E = ChipSpec(name="tpu-v5e", hbm_gbps=819.0, fp32_tflops=49.0, bf16_tflops=197.0)


def render_cost(
    n_views: int,
    n_planes: int,
    img_h: int,
    img_w: int,
    tex_h: int,
    tex_w: int,
    backward: bool = False,
    bytes_per_el: int = 4,
    patch_overread: float = 2.5,
) -> Dict[str, float]:
    """Minimum-traffic and compute model of warp + composite.

    Forward reads each plane texture at least once (the tile-banded warp
    overlaps patches: ``patch_overread`` models the duplication), writes the
    composited image, and performs ~11 flops/tap for the bilinear combine plus
    ~10 flops/plane/pixel for the over-composite chain.  Backward roughly
    doubles traffic (d-texture writes) and compute.
    """
    p_out = n_views * n_planes * img_h * img_w  # warped samples
    tex_bytes = n_views * n_planes * 4 * tex_h * tex_w * bytes_per_el
    out_bytes = n_views * 4 * img_h * img_w * bytes_per_el

    read_bytes = tex_bytes * patch_overread
    write_bytes = out_bytes
    warp_flops = p_out * 4 * 11  # 4 channels, ~11 flops per bilinear sample
    composite_flops = p_out * 4 * 10

    if backward:
        read_bytes *= 2
        write_bytes += tex_bytes  # d/d(texture)
        warp_flops *= 2
        composite_flops *= 2

    return {
        "bytes": read_bytes + write_bytes,
        "flops": warp_flops + composite_flops,
        "samples": p_out,
    }


def attained(
    seconds: float,
    cost: Dict[str, float],
    chip: ChipSpec = TPU_V5E,
    dtype: str = "fp32",
) -> Dict[str, float]:
    """Convert a wall time into attained bandwidth/compute fractions and the
    speed-of-light time (max of the memory and compute bounds)."""
    peak_flops = (chip.fp32_tflops if dtype == "fp32" else chip.bf16_tflops) * 1e12
    t_mem = cost["bytes"] / (chip.hbm_gbps * 1e9)
    t_cmp = cost["flops"] / peak_flops
    sol = max(t_mem, t_cmp)
    return {
        "time_s": seconds,
        "speed_of_light_s": sol,
        "sol_fraction": sol / seconds if seconds > 0 else 0.0,
        "attained_gbps": cost["bytes"] / seconds / 1e9 if seconds > 0 else 0.0,
        "attained_tflops": cost["flops"] / seconds / 1e12 if seconds > 0 else 0.0,
        "bound": "memory" if t_mem >= t_cmp else "compute",
    }
