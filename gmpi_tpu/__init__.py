"""gmpi_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Generative Multiplane Images.

A from-scratch re-design of the capabilities of apple/ml-gmpi (ECCV 2022):
a differentiable multiplane-image renderer (homography warp + over-composite)
as the core product, with a StyleGAN2 generator emitting depth-conditioned
RGB-alpha planes, a pose-conditioned discriminator, a GAN training loop, and
an evaluation/visualization suite — all built TPU-first:

* compute path: pure-jnp reference renderer + fused Pallas kernels,
* parallelism: ``jax.sharding.Mesh`` + ``shard_map`` (pixel-tile sharding,
  depth-plane chunking, data-parallel gradient ``psum``),
* numerics: renderer pinned to fp32 (matches reference
  ``gmpi/core/mpi_renderer.py:403``), generator bf16-capable.
"""

__version__ = "0.1.0"
