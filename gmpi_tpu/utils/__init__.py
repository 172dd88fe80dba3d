from gmpi_tpu.utils.img import edge_aware_smooth_loss, image_gradient, to_sym_range, to_unit_range
from gmpi_tpu.utils.inspect import assert_shape, check_replica_consistency, param_summary
from gmpi_tpu.utils.roofline import TPU_V5E, attained, render_cost
from gmpi_tpu.utils.toy_mpi import blank_mpi, checkerboard_mpi, layered_scene

__all__ = [
    "TPU_V5E",
    "assert_shape",
    "attained",
    "blank_mpi",
    "check_replica_consistency",
    "checkerboard_mpi",
    "edge_aware_smooth_loss",
    "image_gradient",
    "layered_scene",
    "param_summary",
    "render_cost",
    "to_sym_range",
    "to_unit_range",
]
