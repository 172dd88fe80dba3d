from gmpi_tpu.parallel.mesh import data_sharding, make_mesh, replicate, replicated, shard_batch
from gmpi_tpu.parallel.render import (
    render_mpi_plane_sharded,
    render_mpi_plane_sharded_pipelined,
    render_mpi_plane_tile_sharded,
    render_mpi_tile_sharded,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "render_mpi_plane_sharded",
    "render_mpi_plane_sharded_pipelined",
    "render_mpi_plane_tile_sharded",
    "render_mpi_tile_sharded",
    "replicate",
    "replicated",
    "shard_batch",
]
