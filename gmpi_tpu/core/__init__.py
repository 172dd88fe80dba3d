from gmpi_tpu.core.camera import Intrinsics, generate_rays, intrinsics_from_fov
from gmpi_tpu.core.geometry import PlaneGeometry, build_plane_geometry, multi_res_xyz
from gmpi_tpu.core.poses import SphereCameraConfig, linspace_sphere_poses, sample_sphere_poses
from gmpi_tpu.core.renderer import (
    RenderOutput,
    composite,
    composite_sequential,
    render_mpi,
    render_mpi_chunked,
)

__all__ = [
    "Intrinsics",
    "PlaneGeometry",
    "RenderOutput",
    "SphereCameraConfig",
    "build_plane_geometry",
    "composite",
    "composite_sequential",
    "generate_rays",
    "intrinsics_from_fov",
    "linspace_sphere_poses",
    "multi_res_xyz",
    "render_mpi",
    "render_mpi_chunked",
    "sample_sphere_poses",
]
