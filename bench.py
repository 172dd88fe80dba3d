"""Benchmark: MPI renderer fwd+bwd at 96 planes, 1024x1024 (the BASELINE
north-star metric) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is null — the reference repo publishes no numeric renderer
throughput (see BASELINE.md).  Extra keys gate the number:

* ``allclose``: one-shot full-scale comparison of the measured path's
  forward AND gradients against the gather oracle (rtol/atol 1e-4,
  ``gmpi/core/mpi.py:381-395``-style runtime validation);
* ``bands_ok``: on-device out-of-band check of the static warp bands for
  the benchmark pose.

Primary path: the fused Pallas warp+composite kernel with the MXU splat
backward (``gmpi_tpu/ops/pallas_warp.py``).  Falls back to the tile-banded
XLA formulation, then to a smaller config, rather than emitting nothing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # the image's sitecustomize re-registers the remote-TPU backend at
    # interpreter start; the env var alone does not stick (see
    # tests/conftest.py) — force the platform through jax.config
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES = 96
RES = 1024
TEX = 1024
INNER_ITERS = 4
OUTER = 3
# Gate tolerance: an fp64 referee (tools/ref64.py) measures BOTH fp32 paths
# (fused Pallas and XLA tiled) at ~1.33e-4 max rel err from the true render
# at 96x1024^2 — the inherent fp32 texel-coordinate roundoff floor (the two
# paths associate the homography differently, so they sit ~1.8e-4 apart).
# 5e-4 passes that floor with margin while still catching real defects,
# which manifest at >=1e-3 (the round-2 VJP bug measured 36.7).
TOL = 5e-4


def _setup(n_planes, res, tex):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod

    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    # device-side RNG: a host-materialized [96, 4, 1024, 1024] upload measured
    # >15 min through the remote-tunnel dev chip (~2 MB/s); on-device fill is
    # instant and just as deterministic
    k1, k2 = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(
        k, (1, n_planes, 4, tex, tex), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(k, (1, 3, res, res), jnp.float32))(k2)
    return geom, rgba, ray_dir, eye, z_dir, cot


def _time_grad(grad_fn, rgba):
    @jax.jit
    def bench_step(x):
        # in-graph iteration amortizes the host<->device round-trip; the
        # 1e-30 feedback stops XLA hoisting the grad out of the loop.
        # The feedback must TOUCH EVERY PLANE of the gradient: a
        # single-element read lets XLA dead-code-eliminate the splat
        # kernels of every chunk that element doesn't depend on (r5
        # finding: the r3/r4 headline timings measured a partial backward
        # — chunk 0's splat only — and overstated throughput ~1.5x).
        def body(i, acc):
            g = grad_fn(x + acc * 1e-30)
            fb = jnp.sum(g[..., ::127, 0])  # strided probe across all planes
            return acc + fb * 1e-30
        return jax.lax.fori_loop(0, INNER_ITERS, body, jnp.zeros((), jnp.float32))

    float(np.asarray(bench_step(rgba)))  # compile + sync
    times = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        float(np.asarray(bench_step(rgba)))
        times.append(time.perf_counter() - t0)
    return min(times) / INNER_ITERS


def _oracle_loss_fn(geom, ray_dir, eye, z_dir, cot, plane_chunk, tiled_bands):
    from gmpi_tpu.core.renderer import render_mpi_chunked

    def loss(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                 plane_chunk=plane_chunk, tiled_bands=tiled_bands,
                                 with_disp=False)
        return jnp.sum(out.color * cot), out.color

    return loss


def _xla_bands(geom, rgba, ray_dir, eye, z_dir, n_planes, tex, plane_chunk):
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, n_planes, 3, *ray_dir.shape[2:])
                             ).reshape(n_planes, 3, *ray_dir.shape[2:])
    eye_f = jnp.broadcast_to(eye[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    monotone = check_monotone((n_planes, 4, tex, tex), grid)
    bands = []
    for k in range(n_planes // plane_chunk):
        g_k = grid[k * plane_chunk:(k + 1) * plane_chunk]
        shape_k = (plane_chunk, 4, tex, tex)
        by, bx = required_bands(shape_k, g_k, tile=(8, 256))
        if monotone:
            pbr, pbc = required_output_bands(shape_k, g_k, tile=(32, 512))
            bands.append((int(by), int(bx), int(pbr) + 4, int(pbc) + 8))
        else:
            bands.append((int(by), int(bx)))
    return bands


def run_fused(n_planes, res, tex):
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        fused_bands_ok, make_fused_renderer, plane_affine, ray_fields)

    geom, rgba, ray_dir, eye, z_dir, cot = _setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    # bf16x3 = manual split-operand HIGH (one DEFAULT matmul over the
    # K-concatenated hi/lo halves): ~4e-5 rel err vs the fp32 floor of
    # ~1.3e-4, at a third of HIGHEST's six MXU passes.  The allclose gate
    # below still protects the number.
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=True,
                             precision="bf16x3")

    scal = jax.vmap(lambda e: plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    from gmpi_tpu.ops.pallas_warp import splat_plans_ok

    bands_ok = bool(jax.jit(lambda: fused_bands_ok(scal, rx, ry, plan))())
    bands_ok &= bool(jax.jit(
        lambda: splat_plans_ok(scal, ry, plan, splat_plan))())

    def loss(x):
        color, depth, trans = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(color * cot), color

    grad_fn = jax.grad(lambda x: loss(x)[0])
    best = _time_grad(grad_fn, rgba)

    # one-shot full-scale allclose gate vs the gather oracle (fwd + grads)
    plane_chunk = min(16, n_planes)
    xbands = _xla_bands(geom, rgba, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)
    oracle = _oracle_loss_fn(geom, ray_dir, eye, z_dir, cot, plane_chunk, xbands)
    c_f = jax.jit(lambda x: loss(x)[1])(rgba)
    c_o = jax.jit(lambda x: oracle(x)[1])(rgba)
    g_f = jax.jit(grad_fn)(rgba)
    g_o = jax.jit(jax.grad(lambda x: oracle(x)[0]))(rgba)
    scale_c = float(jnp.max(jnp.abs(c_o)))
    scale_g = float(jnp.max(jnp.abs(g_o)))
    err_c = float(jnp.max(jnp.abs(c_f - c_o)))
    err_g = float(jnp.max(jnp.abs(g_f - g_o)))
    allclose = err_c <= TOL * max(scale_c, 1.0) and err_g <= TOL * max(scale_g, 1.0)

    # document the grad-sparsity dependence of the number: fraction of
    # (plane, strip) blocks the S-criterion keeps live for THIS rgba
    # (uniform-random alphas occlude after ~35 planes; real MPIs differ)
    from gmpi_tpu.ops.pallas_warp import render_mpi_fused_fwd
    # per-strip live-plane counts (r5: dead planes' residual slots are left
    # unwritten, so liveness comes from the kernel's n_live output)
    n_live = jax.jit(lambda x: render_mpi_fused_fwd(
        x, dhw, ray_dir, eye, z_dir, plan, early_out="grad",
        precision="bf16x3")[4])(rgba)
    live = float(jnp.mean(n_live.astype(jnp.float32) / n_planes))

    mpix = (res * res) / 1e6 / best
    return {
        "metric": f"renderer fwd+bwd Mpixels/s/chip ({n_planes} planes, {res}^2)",
        "value": round(mpix, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
        "allclose": bool(allclose),
        "bands_ok": bands_ok,
        "fwd_max_rel_err": round(err_c / max(scale_c, 1e-12), 8),
        "fwd_grad_max_rel_err": round(err_g / max(scale_g, 1e-12), 8),
        "live_fraction": round(live, 4),
        # fwd chunk kernels + composite-bwd + per-chunk splat kernels
        "kernel_launches_per_grad": 2 * len(plan) + 1,
        "path": "fused_pallas_mxu",
        **_roofline(best, n_planes, res, tex),
    }


def _roofline(seconds, n_planes, res, tex):
    """Speed-of-light fraction of a measured fwd+bwd render (VERDICT r2 #2:
    every round reports its attained fraction)."""
    from gmpi_tpu.utils.roofline import attained, render_cost

    cost = render_cost(1, n_planes, res, res, tex, tex, backward=True,
                       patch_overread=1.0)
    a = attained(seconds, cost)
    return {
        "sol_fraction": round(a["sol_fraction"], 4),
        "attained_gbps": round(a["attained_gbps"], 1),
        "sol_bound": a["bound"],
    }


def run_fused_views(n_views, n_planes=N_PLANES, res=RES, tex=TEX):
    """Train-shape measurement (VERDICT r3 #6): ``n_views`` MPIs, one sampled
    camera each, fwd+bwd — the shape the G phase actually runs (batch 4).

    At V=4 x 96 x 1024² the four views' d_rgba gradients (4 x 1.6 GB) plus
    inputs and residuals exceed one v5e's HBM, so views run through a
    ``lax.scan`` of per-view grads reduced in place (the same sequential
    accumulation the train step's batch_split implies); the metric is
    total pixels / wall time.
    """
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        fused_bands_ok, make_fused_renderer, plane_affine, ray_fields,
        splat_plans_ok)

    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    k1, k2 = jax.random.split(jax.random.key(7))
    rgba = jax.jit(lambda k: jax.random.uniform(
        k, (n_views, n_planes, 4, tex, tex), jnp.float32))(k1)
    # poses spread over the truncated range (not just the benchmark pose)
    yaws = jnp.linspace(-0.5, 0.55, n_views).reshape(-1, 1)
    pitches = jnp.linspace(-0.22, 0.24, n_views).reshape(-1, 1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, n_views, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=yaws, given_pitches=pitches,
    )
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(
        k, (n_views, 3, res, res), jnp.float32))(k2)
    dhw = jnp.asarray(geom.dhw)

    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=True,
                             precision="bf16x3")

    scal = jax.vmap(lambda e: plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    bands_ok = bool(jax.jit(lambda: fused_bands_ok(scal, rx, ry, plan))())
    bands_ok &= bool(jax.jit(
        lambda: splat_plans_ok(scal, ry, plan, splat_plan))())

    def view_loss(rgba_v, ray_v, eye_v, z_v, cot_v):
        color, _, _ = fn(rgba_v[None], dhw, ray_v[None], eye_v[None], z_v[None])
        return jnp.sum(color[0] * cot_v)

    # ONE compiled per-view grad (the headline graph shape), driven with
    # each view's pose DATA in turn — training's batch_split runs views
    # sequentially exactly like this, and it avoids both failure modes the
    # whole-batch alternatives hit on one v5e: jax.grad over [V, ...]
    # materializes 4 x 1.6 GB d_rgba (HBM OOM), and a lax.scan-of-grads
    # graph killed the remote compile helper outright
    grad_v = jax.jit(jax.grad(view_loss))

    def time_view(i):
        args = (rgba[i], ray_dir[i], eye[i], z_dir[i], cot[i])

        @jax.jit
        def step(rgba_v, ray_v, eye_v, z_v, cot_v):
            def body(_, acc):
                g = grad_v(rgba_v + acc * 1e-30, ray_v, eye_v, z_v, cot_v)
                fb = jnp.sum(g[..., ::127, 0])  # touch every plane (no DCE)
                return acc + fb * 1e-30
            return jax.lax.fori_loop(0, INNER_ITERS, body,
                                     jnp.zeros((), jnp.float32))

        float(np.asarray(step(*args)))  # compile (shared across views) + sync
        times = []
        for _ in range(OUTER):
            t0 = time.perf_counter()
            float(np.asarray(step(*args)))
            times.append(time.perf_counter() - t0)
        return min(times) / INNER_ITERS

    best = sum(time_view(i) for i in range(n_views))
    mpix = (n_views * res * res) / 1e6 / best

    # multi-view allclose at a scale the gather oracle fits (VERDICT r4 #3:
    # cross-view pairing bugs — cf. b02d466 — must be allclose-gated, not
    # just banded).  Same plane count and pose SPREAD at 512²/512² (the
    # fused kernel's static lane window caps the texture:image ratio at
    # ~2x, so the 1024² textures cannot be rendered at 256²): fused
    # fwd+grad over all n_views at once vs render_mpi per view.
    allclose = None
    try:
        from gmpi_tpu.core.renderer import render_mpi_chunked

        res_s = tex_s = 256
        rgba_s = jax.jit(lambda k: jax.random.uniform(
            k, (n_views, n_planes, 4, tex_s, tex_s), jnp.float32))(k1)
        intr_s = cam.intrinsics_from_fov(12.6, res_s, res_s)
        ray_s, eye_s, z_s = cam.generate_rays(intr_s, c2w)
        cot_s = jax.jit(lambda k: jax.random.normal(
            k, (n_views, 3, res_s, res_s), jnp.float32))(k2)
        plan_s, splat_s = plan_fused(dhw, ray_s, eye_s, z_s, tex_s, tex_s)
        fn_s = make_fused_renderer(plan_s, splat_s, tex_s, tex_s,
                                   early_out=True, precision="bf16x3")

        def loss_s(x):
            color, _, _ = fn_s(x, dhw, ray_s, eye_s, z_s)
            return jnp.sum(color * cot_s), color

        # oracle runs PER VIEW (V=1 jits): the gather VJP's scatter temps
        # and the banded warp's hat materialization both exceed HBM at
        # V=4 x 96 planes in one graph; per-view chunked gather is bounded
        def loss_o_view(x_v, ray_v, eye_v, z_v, cot_v):
            out = render_mpi_chunked(x_v[None], dhw, ray_v[None], eye_v[None],
                                     z_v[None], plane_chunk=8, remat=True,
                                     with_disp=False)
            return jnp.sum(out.color[0] * cot_v), out.color[0]

        c_m = jax.jit(lambda x: loss_s(x)[1])(rgba_s)
        g_m = jax.jit(jax.grad(lambda x: loss_s(x)[0]))(rgba_s)
        c_o_fn = jax.jit(lambda *a: loss_o_view(*a)[1])
        g_o_fn = jax.jit(jax.grad(lambda *a: loss_o_view(*a)[0]))
        err_c = err_g = 0.0
        for vi in range(n_views):
            args_v = (rgba_s[vi], ray_s[vi], eye_s[vi], z_s[vi], cot_s[vi])
            c_o_v = c_o_fn(*args_v)
            g_o_v = g_o_fn(*args_v)
            sc = float(jnp.max(jnp.abs(c_o_v)))
            sg = float(jnp.max(jnp.abs(g_o_v)))
            err_c = max(err_c,
                        float(jnp.max(jnp.abs(c_m[vi] - c_o_v))) / max(sc, 1e-8))
            err_g = max(err_g,
                        float(jnp.max(jnp.abs(g_m[vi] - g_o_v))) / max(sg, 1e-8))
        allclose = bool(err_c < 5e-4 and err_g < 5e-4)
        print(f"# V={n_views} {res_s}^2 gate: fwd rel {err_c:.2e} "
              f"grad rel {err_g:.2e}", file=sys.stderr)
    except Exception as e:
        print(f"# V={n_views} allclose gate failed to run: {e!r}",
              file=sys.stderr)
        allclose = False

    from gmpi_tpu.utils.roofline import attained, render_cost

    cost = render_cost(n_views, n_planes, res, res, tex, tex, backward=True,
                       patch_overread=1.0)
    a = attained(best, cost)
    return {
        "metric": f"renderer fwd+bwd Mpixels/s/chip (V={n_views} train shape, "
                  f"{n_planes} planes, {res}^2)",
        "value": round(mpix, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
        "allclose": allclose,
        "bands_ok": bands_ok,
        "views_sequential_scan": True,
        "path": "fused_pallas_mxu",
        "sol_fraction": round(a["sol_fraction"], 4),
        "attained_gbps": round(a["attained_gbps"], 1),
        "sol_bound": a["bound"],
    }


def run_xla(n_planes, res, tex, plane_chunk):
    from gmpi_tpu.core.renderer import homography_grid, render_mpi_chunked
    from gmpi_tpu.ops.tiled_warp import bands_cover

    geom, rgba, ray_dir, eye, z_dir, cot = _setup(n_planes, res, tex)
    bands = _xla_bands(geom, rgba, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)

    # out-of-band gate for the measured pose (per plane chunk)
    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, n_planes, 3, res, res)
                             ).reshape(n_planes, 3, res, res)
    eye_f = jnp.broadcast_to(eye[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    bands_ok = True
    for k, bk in enumerate(bands):
        g_k = grid[k * plane_chunk:(k + 1) * plane_chunk]
        bands_ok &= bool(bands_cover((plane_chunk, 4, tex, tex), g_k,
                                     bk[0], bk[1], tile=(8, 256)))

    def loss(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                 plane_chunk=plane_chunk, tiled_bands=bands,
                                 with_disp=False)
        return jnp.sum(out.color * cot), out.color

    best = _time_grad(jax.grad(lambda x: loss(x)[0]), rgba)

    # full-scale fwd+grad allclose vs the portable gather oracle — the
    # fallback path gets the same gate strength as the fused one (VERDICT r2
    # #8: the headline number is never softer-gated than the path it
    # replaced).  Gather needs small plane chunks (index temps).
    def oracle(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                 plane_chunk=min(4, n_planes), with_disp=False)
        return jnp.sum(out.color * cot), out.color

    c_m = jax.jit(lambda x: loss(x)[1])(rgba)
    c_o = jax.jit(lambda x: oracle(x)[1])(rgba)
    g_m = jax.jit(jax.grad(lambda x: loss(x)[0]))(rgba)
    g_o = jax.jit(jax.grad(lambda x: oracle(x)[0]))(rgba)
    scale_c = float(jnp.max(jnp.abs(c_o)))
    scale_g = float(jnp.max(jnp.abs(g_o)))
    err_c = float(jnp.max(jnp.abs(c_m - c_o)))
    err_g = float(jnp.max(jnp.abs(g_m - g_o)))
    allclose = err_c <= TOL * max(scale_c, 1.0) and err_g <= TOL * max(scale_g, 1.0)

    mpix = (res * res) / 1e6 / best
    return {
        "metric": f"renderer fwd+bwd Mpixels/s/chip ({n_planes} planes, {res}^2)",
        "value": round(mpix, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
        "allclose": bool(allclose),
        "bands_ok": bands_ok,
        "fwd_max_rel_err": round(err_c / max(scale_c, 1e-12), 8),
        "fwd_grad_max_rel_err": round(err_g / max(scale_g, 1e-12), 8),
        "path": "xla_tiled",
        **_roofline(best, n_planes, res, tex),
    }


def _accelerator_alive(timeout_s: float = 240.0) -> bool:
    """Probe the configured accelerator in a subprocess with a hard timeout.

    A wedged device tunnel can block ``jax.devices()`` indefinitely inside the
    claim handshake; probing in a child process keeps this process (and the
    driver invoking it) from hanging.  Returns True when a trivial reduction
    executes on the configured platform.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() in ("", "cpu"):
        return True
    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.ones((8, 8)))))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and "64.0" in out.stdout


def _run_fused_subprocess(timeout_s: float = 3600.0, mode: str = "fused"):
    """Measure the fused path in a child process with a hard timeout.

    The fused kernel's first on-device Mosaic compile is the riskiest step of
    the whole benchmark (a pathological remote compile once wedged the device
    tunnel); isolating it keeps this process able to fall back to the XLA
    path.  Returns the parsed result dict, or None on timeout/crash.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ, BENCH_MODE=mode)
    try:
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"fused measurement timed out after {timeout_s:.0f}s"}
    if out.returncode != 0:
        tail = "\n".join(out.stderr.strip().splitlines()[-12:])
        return {"error": f"fused child exited {out.returncode}", "stderr_tail": tail}
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    return {"error": "fused child produced no JSON line"}


def main():
    import os

    if os.environ.get("BENCH_MODE") == "fused":
        # child process of _run_fused_subprocess
        print(json.dumps(run_fused(N_PLANES, RES, TEX)))
        return
    if os.environ.get("BENCH_MODE") == "views":
        print(json.dumps(run_fused_views(4)))
        return

    if not _accelerator_alive():
        # Dead tunnel: rerun ourselves on CPU so the driver still gets a
        # parseable line, tagged so nobody mistakes it for a chip number.
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_CPU_FALLBACK="1")
        raise SystemExit(subprocess.run([sys.executable, __file__], env=env).returncode)

    if os.environ.get("BENCH_CPU_FALLBACK") == "1":
        # accelerator tunnel down at measurement time — emit a small-config
        # CPU number so the round still records a parseable (tagged) line
        result = run_xla(32, 256, 256, plane_chunk=8)
        result["metric"] += " [CPU FALLBACK - accelerator tunnel down]"
        print(json.dumps(result))
        return

    if os.environ.get("BENCH_FUSED", "1") == "0":
        print(json.dumps(run_xla(N_PLANES, RES, TEX, plane_chunk=16)))
        return
    result = _run_fused_subprocess()
    if result is not None and result.get("allclose") and result.get("bands_ok"):
        print(json.dumps(result))
        if os.environ.get("BENCH_VIEWS", "1") != "0":
            # second line (VERDICT r3 #6): the V=4 train-shape point.  Only
            # attempted after the headline validated — it shares every kernel
            # with the V=1 run, so its own gate is bands_ok.
            views = _run_fused_subprocess(mode="views")
            if views is not None and views.get("bands_ok"):
                print(json.dumps(views))
            else:
                import sys
                print(f"views measurement dropped: {views}", file=sys.stderr)
        return
    # never report a number that fails its own validation (or that never
    # came back) — fall back to the tile-banded XLA formulation
    rejected = result
    if not _accelerator_alive():
        # killing a wedged fused compile can take the tunnel down with it
        # (observed 2026-08-17); don't hang in the XLA fallback too
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_CPU_FALLBACK="1")
        raise SystemExit(subprocess.run([sys.executable, __file__], env=env).returncode)
    try:
        result = run_xla(N_PLANES, RES, TEX, plane_chunk=16)
    except Exception:
        result = run_xla(32, 512, 512, plane_chunk=8)
        result["metric"] += " [fallback config]"
    if rejected is not None:
        result["fused_rejected"] = rejected
    print(json.dumps(result))


if __name__ == "__main__":
    main()
