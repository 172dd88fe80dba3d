from gmpi_tpu.viz.mesh import (
    extract_mesh_from_alpha,
    marching_tetrahedra,
    mpi_mesh_volume_bounds,
    save_ply,
    smooth_volume,
)
from gmpi_tpu.viz.render_video import (
    render_camera_path,
    render_video_artifacts,
    save_mpi_sheets,
    save_video,
    sweep_angles,
)

__all__ = [
    "extract_mesh_from_alpha",
    "marching_tetrahedra",
    "mpi_mesh_volume_bounds",
    "render_camera_path",
    "render_video_artifacts",
    "save_mpi_sheets",
    "save_ply",
    "save_video",
    "smooth_volume",
    "sweep_angles",
]
