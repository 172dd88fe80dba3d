"""Interpret-mode (CPU) and on-chip validation of the fused renderer VJP.

Compares ``make_fused_renderer`` forward and gradients against the pure-jnp
gather renderer (``core.renderer.render_slab_partial`` segment chain), which
itself is parity-tested against the reference torch implementation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--R", type=int, default=64)
    ap.add_argument("--early_out", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from test_fused_fwd import setup
    from gmpi_tpu.ops.pallas_warp import (
        make_fused_renderer, plan_fused_render, plan_splat, plane_affine,
        ray_fields)
    from gmpi_tpu.core.renderer import render_slab_partial, combine_segments

    L, R, TEX = args.L, args.R, args.R
    geom, ray_dir, eye, z_dir = setup(L, R, TEX)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], TEX, TEX)[None]
    rx, ry, q = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry)
    adj = plan_splat(scal, ry, plan, TEX)
    print("plan:", [(lo, hi, tuple(b)) for lo, hi, b in plan])
    print("adj :", [tuple(a) for a in adj])

    fn = make_fused_renderer(tuple(plan), tuple(adj), TEX, TEX,
                             early_out=args.early_out, interpret=args.cpu)

    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, L, 4, TEX, TEX)).astype(np.float32))
    gc = jnp.asarray(rng.standard_normal((1, 3, R, R)).astype(np.float32))
    gd = jnp.asarray(rng.standard_normal((1, 1, R, R)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((1, 1, R, R)).astype(np.float32))

    def oracle(x):
        return render_slab_partial(x, geom.dhw, ray_dir, eye, z_dir)

    def loss_fused(x):
        c, d, t = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(c * gc) + jnp.sum(d * gd) + jnp.sum(t * gt)

    def loss_oracle(x):
        c, d, t = oracle(x)
        return jnp.sum(c * gc) + jnp.sum(d * gd) + jnp.sum(t * gt)

    c, d, t = jax.jit(fn)(rgba, dhw, ray_dir, eye, z_dir)
    co, do_, to = jax.jit(oracle)(rgba)
    for name, a, b in [("color", c, co), ("depth", d, do_), ("trans", t, to)]:
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"fwd {name}: max abs err {err:.3e}")
        assert err < 5e-4, (name, err)

    g_fused = jax.jit(jax.grad(loss_fused))(rgba)
    g_oracle = jax.jit(jax.grad(loss_oracle))(rgba)
    err = float(jnp.max(jnp.abs(g_fused - g_oracle)))
    ref = float(jnp.max(jnp.abs(g_oracle)))
    print(f"grad: max abs err {err:.3e}  (oracle max {ref:.3e}, rel {err/ref:.3e})")
    assert err / ref < 1e-3, err
    print("FUSED-VJP OK")


if __name__ == "__main__":
    main()
