"""Triangulate the forward warp at scale: fused Pallas vs XLA tiled vs the
portable gather path, all at the same pose/config.  Whichever two agree
localize the defect to the third.  Also prints the error vs plane-0-only
renders to remove compositing from the picture.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup, xla_bands  # noqa: E402


def main(n_planes=8, res=1024, tex=1024):
    from gmpi_tpu.core.renderer import (
        plan_fused, render_mpi, render_mpi_chunked)
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    geom, rgba, ray_dir, eye, z_dir, cot = setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=False)

    c_fused = np.asarray(jax.jit(
        lambda x: fn(x, dhw, ray_dir, eye, z_dir)[0])(rgba))

    plane_chunk = min(16, n_planes)
    bands = xla_bands(geom, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)
    c_tiled = np.asarray(jax.jit(lambda x: render_mpi_chunked(
        x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=plane_chunk,
        tiled_bands=bands).color)(rgba))

    # gather at full scale OOMs un-chunked (s32 index temps); chunk planes
    c_gather = np.asarray(jax.jit(lambda x: render_mpi_chunked(
        x, geom.dhw, ray_dir, eye, z_dir,
        plane_chunk=min(2, n_planes)).color)(rgba))

    def rel(a, b):
        return float(np.max(np.abs(a - b))) / max(float(np.max(np.abs(b))), 1.0)

    print(f"config: {n_planes} planes x {res}^2")
    print(f"  fused  vs gather: {rel(c_fused, c_gather):.3e}")
    print(f"  tiled  vs gather: {rel(c_tiled, c_gather):.3e}")
    print(f"  fused  vs tiled : {rel(c_fused, c_tiled):.3e}")

    # error heat location (fused vs gather): where in the image?
    d = np.abs(c_fused - c_gather).max(axis=(0, 1))
    ij = np.unravel_index(d.argmax(), d.shape)
    print(f"  fused-vs-gather worst pixel: {ij}, err {d.max():.3e}")
    rows = np.nonzero(d.max(axis=1) > 1e-3)[0]
    if rows.size:
        print(f"  bad pixel rows: {rows.min()}..{rows.max()} ({rows.size})")
    d2 = np.abs(c_tiled - c_gather).max(axis=(0, 1))
    ij2 = np.unravel_index(d2.argmax(), d2.shape)
    print(f"  tiled-vs-gather worst pixel: {ij2}, err {d2.max():.3e}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()
    main(args.planes, args.res, args.res)
