from gmpi_tpu.ops.bias_act import activation_funcs, bias_act
from gmpi_tpu.ops.conv2d import conv2d, conv2d_resample
from gmpi_tpu.ops.grid_sample import grid_sample_bilinear
from gmpi_tpu.ops.modulated_conv import modulated_conv2d
from gmpi_tpu.ops.tiled_warp import grid_sample_tiled, make_tiled_warp_with_adjoint, required_bands
from gmpi_tpu.ops.upfirdn2d import downsample2d, setup_filter, upfirdn2d, upsample2d

__all__ = [
    "activation_funcs",
    "bias_act",
    "conv2d",
    "conv2d_resample",
    "downsample2d",
    "grid_sample_bilinear",
    "grid_sample_tiled",
    "make_tiled_warp_with_adjoint",
    "modulated_conv2d",
    "required_bands",
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
]
