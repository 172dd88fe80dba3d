"""Tests for the fused Pallas warp+composite renderer (interpret mode).

The kernel itself targets TPU (``tools/test_fused_fwd.py`` /
``tools/test_fused_vjp.py`` run the same checks on hardware); here the
interpreter validates the kernel logic and the composite backward against
the pure-jnp oracle renderer on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_slab_partial, warp_planes
from gmpi_tpu.ops.pallas_warp import (
    EPS,
    composite_bwd,
    make_fused_renderer,
    plan_adjoint,
    plan_fused_render,
    plan_splat,
    plane_affine,
    ray_fields,
)


def _setup(n_planes, res):
    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12,
        distance_sample_method="inverse", fov_deg=12.6, sphere_center_z=1.0,
        sphere_r=1.0, yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0,
        pitch_std=0.127, n_truncated_stds=2.0, enlarge_factor=1.001,
        confined=True,
    )
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, ray_dir, eye, z_dir


def test_composite_bwd_matches_autodiff():
    rng = np.random.default_rng(1)
    v, l, h, w = 2, 7, 8, 16
    warped_np = rng.random((v, l, 4, h, w)).astype(np.float32)
    # include exactly-opaque planes mid-stack: the occluder's alpha gradient
    # divides by (1 - a + eps) = 1e-10, which amplifies any suffix-sum
    # cancellation to O(1) (regression for the exclusive-cumsum fix)
    warped_np[:, 2, 3] = 1.0
    warped = jnp.asarray(warped_np)
    delta = jnp.asarray(rng.random((v, l, h, w)).astype(np.float32) + 0.9)

    def fwd(warped):
        rgb, alpha = warped[:, :, :3], warped[:, :, 3]
        acc_c = jnp.zeros((v, 3, h, w))
        acc_d = jnp.zeros((v, h, w))
        t = jnp.ones((v, h, w))
        for i in range(l):
            wgt = alpha[:, i] * t
            acc_c = acc_c + wgt[:, None] * rgb[:, i]
            acc_d = acc_d + wgt * delta[:, i]
            t = t * (1.0 - alpha[:, i] + EPS)
        return acc_c, acc_d, t

    gc = jnp.asarray(rng.random((v, 3, h, w)).astype(np.float32))
    gd = jnp.asarray(rng.random((v, h, w)).astype(np.float32))
    gt = jnp.asarray(rng.random((v, h, w)).astype(np.float32))
    _, vjp = jax.vjp(fwd, warped)
    (d_ref,) = vjp((gc, gd, gt))
    d_mine = composite_bwd(warped, delta, gc, gd, gt)
    np.testing.assert_allclose(np.asarray(d_mine), np.asarray(d_ref),
                               atol=1e-4, rtol=1e-4)
    (d_ref2,) = jax.vjp(fwd, warped)[1]((gc, jnp.zeros_like(gd),
                                         jnp.zeros_like(gt)))
    d_mine2 = composite_bwd(warped, delta, gc, None, None)
    np.testing.assert_allclose(np.asarray(d_mine2), np.asarray(d_ref2),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_render_fwd_and_grad_matches_oracle_interpret():
    n_planes, res = 2, 256
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry)
    adj = plan_splat(scal, ry, plan, res)
    fn = make_fused_renderer(
        tuple((int(lo), int(hi), b) for lo, hi, b in plan), tuple(adj),
        res, res, early_out=False, interpret=True)

    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, n_planes, 4, res, res)).astype(np.float32))
    gc = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    color, depth, trans = fn(rgba, dhw, ray_dir, eye, z_dir)
    c_ref, d_ref, t_ref = render_slab_partial(rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(color), np.asarray(c_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(d_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(t_ref), atol=5e-4)

    def loss_fused(x):
        c, d, t = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(c * gc)

    def loss_oracle(x):
        c, d, t = render_slab_partial(x, geom.dhw, ray_dir, eye, z_dir)
        return jnp.sum(c * gc)

    g_fused = jax.grad(loss_fused)(rgba)
    g_oracle = jax.grad(loss_oracle)(rgba)
    ref = float(jnp.max(jnp.abs(g_oracle)))
    err = float(jnp.max(jnp.abs(g_fused - g_oracle)))
    assert err / ref < 1e-3, (err, ref)


@pytest.mark.slow
def test_warp_adjoint_matches_vjp_oracle_interpret():
    from gmpi_tpu.ops.pallas_warp import (_adjoint_bands_from_spans,
                                          _adjoint_spans, warp_adjoint)

    n_planes, res = 2, 256
    tex_h, tex_w = 64, 256   # shallow texture keeps interpret time bounded
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], tex_h, tex_w)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((1, n_planes, 4, res, res)).astype(np.float32))

    def warp_all(x):
        flat = x.reshape(n_planes, 4, tex_h, tex_w)
        dhw_f = jnp.broadcast_to(dhw, (n_planes, 3))
        ray_f = jnp.broadcast_to(ray_dir[:, None], (1, n_planes, 3, res, res)
                                 ).reshape(n_planes, 3, res, res)
        eye_f = jnp.broadcast_to(eye[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
        z_f = jnp.broadcast_to(z_dir[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
        rgb, _, alpha = warp_planes(flat, dhw_f, eye_f, ray_f, z_f)
        return jnp.concatenate([rgb, alpha], axis=1)[None]

    x0 = jnp.asarray(rng.random((1, n_planes, 4, tex_h, tex_w)).astype(np.float32))
    out, vjp = jax.vjp(warp_all, x0)
    (d_ref,) = vjp(g.reshape(out.shape))
    rs, dv, h = _adjoint_spans(scal, rx, ry, tex_h, tex_w)
    bands = _adjoint_bands_from_spans(rs, dv, h)
    d_mine = warp_adjoint(g, rx, ry, scal, bands, tex_h, tex_w, interpret=True)
    np.testing.assert_allclose(np.asarray(d_mine), np.asarray(d_ref), atol=1e-3)


def test_fused_bands_ok_accepts_plan_and_rejects_shrunk():
    from gmpi_tpu.ops.pallas_warp import FusedBands, fused_bands_ok

    n_planes, res = 2, 256
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    scal = plane_affine(jnp.asarray(geom.dhw), eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry)
    assert bool(fused_bands_ok(scal, rx, ry, plan))
    shrunk = [(lo, hi, FusedBands(b.d_x, 1, b.by_pad, 8)) for lo, hi, b in plan]
    assert not bool(fused_bands_ok(scal, rx, ry, shrunk))


def test_tiled_warp_check_nan_poisons_out_of_band():
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import bands_cover, grid_sample_tiled, required_bands

    n_planes, res = 1, 128
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    tex = jnp.asarray(np.random.default_rng(0).random((1, 4, res, res)).astype(np.float32))
    dhw = jnp.asarray(geom.dhw).reshape(1, 3)
    grid, _ = homography_grid(dhw, eye, ray_dir[:, :, :res, :res], z_dir)
    by, bx = required_bands(tex.shape, grid)
    assert bool(bands_cover(tex.shape, grid, by, bx))
    assert not bool(bands_cover(tex.shape, grid, 4, 4))
    ok = grid_sample_tiled(tex, grid, band_y=by, band_x=bx, check=True)
    assert np.isfinite(np.asarray(ok)).all()
    bad = grid_sample_tiled(tex, grid, band_y=8, band_x=8, check=True)
    assert np.isnan(np.asarray(bad)).all()


@pytest.mark.slow
def test_bench_fused_gate_interpret(monkeypatch):
    """bench.py's fused path + allclose/bands gate, on CPU via interpret."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(bench, "INNER_ITERS", 1)
    monkeypatch.setattr(bench, "OUTER", 1)
    with pltpu.force_tpu_interpret_mode():
        r = bench.run_fused(2, 256, 256)
    assert r["allclose"] is True, r
    assert r["bands_ok"] is True, r
    assert r["value"] > 0


@pytest.mark.slow
def test_fused_render_multiview_physics_interpret():
    """Two-view fused render (V>1 grid dim): oracle parity + parallax and
    occlusion physics on a toy colored-squares MPI."""
    from gmpi_tpu.core.renderer import plan_fused, render_mpi
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    L, res = 3, 256
    geom, _, _, _ = _setup(L, res)
    rgba = np.zeros((2, L, 4, res, res), np.float32)
    rgba[:, L - 1, 2] = 1.0
    rgba[:, L - 1, 3] = 1.0                       # far plane: solid blue
    rgba[:, 0, 0, 96:160, 64:128] = 1.0           # near plane: red square
    rgba[:, 0, 3, 96:160, 64:128] = 1.0
    rgba = jnp.asarray(rgba)
    yaws = jnp.asarray([[-0.3], [0.3]])
    pitches = jnp.zeros((2, 1))
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 2, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=yaws, given_pitches=pitches)
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw = jnp.asarray(geom.dhw)
    plan, splat = plan_fused(dhw, ray_dir, eye, z_dir, res, res)
    fn = make_fused_renderer(plan, splat, res, res, early_out=True, interpret=True)
    color, depth, _ = fn(rgba, dhw, ray_dir, eye, z_dir)
    ref = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color), atol=5e-4)
    cols = []
    for v in range(2):
        c = np.asarray(color[v])
        red = (c[0] > 0.5) & (c[2] < 0.5)
        assert red.sum() > 500
        cols.append(np.nonzero(red)[1].mean())
        assert (c[2] > 0.5).mean() > 0.5
    assert abs(cols[0] - cols[1]) > 2.0  # near content parallaxes across views


@pytest.mark.slow
def test_fused_bf16_fast_mode_interpret():
    """compute_dtype=bf16 fast mode: ~5e-3 of the fp32 oracle (texture DMA
    and MXU operands halved; accumulation fp32)."""
    from gmpi_tpu.core.renderer import plan_fused, render_slab_partial
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    n_planes, res = 2, 256
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    dhw = jnp.asarray(geom.dhw)
    plan, splat = plan_fused(dhw, ray_dir, eye, z_dir, res, res)
    fn = make_fused_renderer(plan, splat, res, res, early_out=False,
                             interpret=True, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, n_planes, 4, res, res)).astype(np.float32))
    c, _, _ = fn(rgba, dhw, ray_dir, eye, z_dir)
    c_ref, _, _ = render_slab_partial(rgba, geom.dhw, ray_dir, eye, z_dir)
    assert float(jnp.max(jnp.abs(c - c_ref))) < 2e-2


def test_splat_plans_ok_accepts_plan_and_rejects_shrunk():
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import SplatPlan, splat_plans_ok

    n_planes, res = 2, 256
    geom, ray_dir, eye, z_dir = _setup(n_planes, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    _, ry, _ = ray_fields(ray_dir, z_dir)
    plan, splat = plan_fused(dhw, ray_dir, eye, z_dir, res, res)
    assert bool(splat_plans_ok(scal, ry, plan, splat))
    shrunk = [SplatPlan(1, s[1]) for s in splat]
    assert not bool(splat_plans_ok(scal, ry, plan, shrunk))


@pytest.mark.slow
def test_fused_grads_exact_behind_opaque_planes():
    """Regression: a visible plane with alpha=1 must still receive the
    behind-composite term in its alpha gradient (the VJP's forward pass
    must not early-out — d alpha_l depends on hidden planes at O(1))."""
    from gmpi_tpu.core.renderer import render_slab_partial
    from gmpi_tpu.ops.pallas_warp import (make_fused_renderer,
                                          plan_fused_render, plan_splat)

    L, res = 3, 256
    geom, ray_dir, eye, z_dir = _setup(L, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry, max_chunk_planes=1)  # force chaining
    splat = plan_splat(scal, ry, plan, res)
    fn = make_fused_renderer(tuple((int(a), int(b), c) for a, b, c in plan),
                             tuple(splat), res, res, early_out=True,
                             interpret=True)
    rng = np.random.default_rng(0)
    rgba = rng.random((1, L, 4, res, res)).astype(np.float32)
    rgba[:, 0, 3] = 1.0          # opaque near plane (occludes planes 1-2)
    rgba[:, 0, 3, :64] = 0.0     # except the top rows
    rgba = jnp.asarray(rgba)
    gc = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    g = jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    go = jax.grad(lambda x: jnp.sum(
        render_slab_partial(x, geom.dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    rel = float(jnp.max(jnp.abs(g - go))) / float(jnp.max(jnp.abs(go)))
    assert rel < 1e-3, rel


@pytest.mark.parametrize("with_gd,with_gt", [(False, False), (True, True)])
def test_composite_bwd_pallas_matches_xla(with_gd, with_gt):
    """The Pallas composite backward (two in-register plane passes) equals
    the XLA oracle ``composite_bwd`` on random stacks, with and without the
    depth/transmittance cotangents."""
    from gmpi_tpu.ops.pallas_warp import LANES, composite_bwd_pallas

    v, L, ns, r8 = 1, 5, 2, 32  # pixel block = r8 x 128 per strip
    rng = np.random.default_rng(0)
    # strip-major [V, NS, L, 4, R8, 128] since r4
    warped = jnp.asarray(rng.random((v, ns, L, 4, r8, LANES)).astype(np.float32))
    scal = jnp.asarray(rng.standard_normal((v, L, 6)).astype(np.float32))
    qf = jnp.asarray(rng.random((v, ns, r8, LANES)).astype(np.float32))
    gc = jnp.asarray(rng.standard_normal((v, 3, ns, r8, LANES)).astype(np.float32))
    gd = jnp.asarray(rng.standard_normal((v, ns, r8, LANES)).astype(np.float32)) if with_gd else None
    gt = jnp.asarray(rng.standard_normal((v, ns, r8, LANES)).astype(np.float32)) if with_gt else None

    got = composite_bwd_pallas(warped, scal, qf, gc, gd, gt,
                               interpret=True, block_rows=16)

    qflat = qf.reshape(v, -1, LANES)
    warped_f = jnp.transpose(warped, (0, 2, 3, 1, 4, 5)).reshape(
        v, L, 4, -1, LANES)
    delta = scal[:, :, 4][:, :, None, None] * qflat[:, None]
    want = composite_bwd(
        warped_f, delta, gc.reshape(v, 3, -1, LANES),
        None if gd is None else gd.reshape(v, -1, LANES),
        None if gt is None else gt.reshape(v, -1, LANES))
    got_pm = jnp.transpose(got, (0, 2, 3, 1, 4, 5)).reshape(v, L, 4, -1, LANES)
    np.testing.assert_allclose(
        np.asarray(got_pm), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_grad_sparsity_skips_doubly_occluded_planes_exactly():
    """Grad-safe occlusion sparsity (r4): behind TWO opaque planes the
    S = T/min-factor criterion kills plane gradients (S <= ~eps there),
    while ONE opaque plane must not trigger it (the amplified behind-
    composite term is O(1)).  Grads must stay allclose to the oracle and
    the doubly-occluded planes' cotangents must be exact zeros."""
    from gmpi_tpu.core.renderer import render_slab_partial
    from gmpi_tpu.ops.pallas_warp import (composite_bwd_pallas, flatten_pixels,
                                          make_fused_renderer,
                                          plan_fused_render, plan_splat)

    L, res = 5, 256
    geom, ray_dir, eye, z_dir = _setup(L, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, q = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry)
    splat = plan_splat(scal, ry, plan, res)
    plan_t = tuple((int(a), int(b), c) for a, b, c in plan)
    fn = make_fused_renderer(plan_t, tuple(splat), res, res,
                             early_out=True, interpret=True)
    rng = np.random.default_rng(3)
    rgba = rng.random((1, L, 4, res, res)).astype(np.float32)
    rgba[:, 0, 3] = 1.0   # two fully opaque near planes -> S collapses to
    rgba[:, 1, 3] = 1.0   # ~eps for planes 2..4
    rgba = jnp.asarray(rgba)
    gc = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    g = jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    go = jax.grad(lambda x: jnp.sum(
        render_slab_partial(x, geom.dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    rel = float(jnp.max(jnp.abs(g - go))) / float(jnp.max(jnp.abs(go)))
    assert rel < 1e-3, rel
    # the doubly-occluded planes' texture gradients are exact zeros
    # (their oracle values are <= eps-scale, i.e. ~1e-10 relative)
    assert float(jnp.max(jnp.abs(g[:, 2:]))) == 0.0

    # and the composite backward zeroes their warped-sample cotangents
    # (warped is strip-major [V, NS, L, 4, R8, 128] since r4)
    qf = flatten_pixels(q)
    gc6 = flatten_pixels(gc)
    warped = jnp.asarray(rng.random(
        (1, res // 16, L, 4, res // 64 * 8, 128)).astype(np.float32))
    warped = warped.at[:, :, 0, 3].set(1.0).at[:, :, 1, 3].set(1.0)
    d6 = composite_bwd_pallas(warped, scal, qf, gc6, None, None,
                              interpret=True, grad_tau=1e-7)
    assert float(jnp.max(jnp.abs(d6[:, :, 2:]))) == 0.0
    assert float(jnp.max(jnp.abs(d6[:, :, 0]))) > 0.0


def test_fused_multi_chunk_offsets_match_oracle():
    """Chunked plans index tex_pad / d_samp through the kernels' lo-offset
    DMA (r4: no per-chunk slice materialization) — force a 3-chunk plan on
    5 planes and check fwd + grads against the gather oracle."""
    from gmpi_tpu.core.renderer import render_slab_partial
    from gmpi_tpu.ops.pallas_warp import (make_fused_renderer,
                                          plan_fused_render, plan_splat)

    L, res = 5, 256
    geom, ray_dir, eye, z_dir = _setup(L, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry, max_chunk_planes=2, overhead=1.0)
    assert len(plan) >= 3, [tuple(p[:2]) for p in plan]
    splat = plan_splat(scal, ry, plan, res)
    fn = make_fused_renderer(
        tuple((int(lo), int(hi), b) for lo, hi, b in plan), tuple(splat),
        res, res, early_out=True, interpret=True)

    rng = np.random.default_rng(11)
    rgba = jnp.asarray(rng.random((1, L, 4, res, res)).astype(np.float32))
    gc = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    color, _, _ = fn(rgba, dhw, ray_dir, eye, z_dir)
    c_ref, _, _ = render_slab_partial(rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(color), np.asarray(c_ref), atol=5e-4)

    g = jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    go = jax.grad(lambda x: jnp.sum(
        render_slab_partial(x, geom.dhw, ray_dir, eye, z_dir)[0] * gc))(rgba)
    rel = float(jnp.max(jnp.abs(g - go))) / float(jnp.max(jnp.abs(go)))
    assert rel < 1e-3, rel


def test_grad_sparsity_propagates_across_chunks():
    """r4 fix + r5 n_live contract: the S/M occlusion state threads through
    the inter-chunk carry — with a forced multi-chunk plan, planes in LATER
    chunks behind two opaque planes of chunk 0 must be counted dead by the
    per-strip ``n_live`` output (their residual slots are left unwritten —
    the composite backward masks them by ``n_live``, oracle-gated by the
    grad-parity tests)."""
    from gmpi_tpu.ops.pallas_warp import (plan_fused_render,
                                          render_mpi_fused_fwd)

    L, res = 6, 256
    geom, ray_dir, eye, z_dir = _setup(L, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry, max_chunk_planes=2, overhead=1.0)
    assert len(plan) >= 3
    plan_t = tuple((int(lo), int(hi), b) for lo, hi, b in plan)

    rng = np.random.default_rng(5)
    rgba = rng.random((1, L, 4, res, res)).astype(np.float32)
    rgba[:, 0, 3] = 1.0
    rgba[:, 1, 3] = 1.0
    rgba = jnp.asarray(rgba)

    outs = render_mpi_fused_fwd(
        rgba, dhw, ray_dir, eye, z_dir, plan_t, early_out="grad",
        interpret=True)
    warped, n_live = outs[3], outs[4]
    nl = np.asarray(n_live)   # [V, NS]
    # planes in chunks PAST the occluders must be dead (each chunk entry
    # re-checks the carried S).  Within a chunk the S-check runs every 4th
    # plane, so a plane can lag its death by <=3 slots — assert from the
    # first chunk boundary after the occluders onward.
    first_boundary = next(lo for lo, hi, _ in plan_t if lo >= 2)
    assert int(nl.max()) <= first_boundary
    assert int(nl.min()) >= 1  # the front opaque plane is always live
    # live planes' residuals are real values
    w = np.asarray(warped)
    assert float(np.max(np.abs(w[:, :, 0]))) > 0.0


def test_fused_bands_ok_batched_views_pairing():
    """r4 fix: the batched check must pair scal[v] with rays[v] only — the
    cross-product form falsely failed 4-view pose spreads whose per-view
    checks all pass (bench V=4 regression)."""
    from gmpi_tpu.ops.pallas_warp import fused_bands_ok

    L, res, V = 3, 256, 3
    geom, _, _, _ = _setup(L, res)
    yaws = jnp.asarray([[-0.5], [0.0], [0.55]])
    pitches = jnp.asarray([[-0.22], [0.0], [0.24]])
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, V, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=yaws, given_pitches=pitches)
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw = jnp.asarray(geom.dhw)
    scal = jax.vmap(lambda e: plane_affine(dhw, e, res, res))(eye)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    plan = plan_fused_render(np.asarray(scal), np.asarray(rx), np.asarray(ry))
    plan_t = tuple((int(lo), int(hi), b) for lo, hi, b in plan)
    # the plan was built FOR these poses: the batch check must accept it
    assert bool(fused_bands_ok(scal, rx, ry, plan_t))
    for vi in range(V):
        assert bool(fused_bands_ok(scal[vi:vi+1], rx[vi:vi+1],
                                   ry[vi:vi+1], plan_t))


def test_fused_remat_matches_oracle():
    """render_mpi_fused_remat (r4: per-chunk checkpoint + partial combine)
    — fwd and grads allclose to the gather oracle on a multi-chunk plan."""
    from gmpi_tpu.core.renderer import (render_mpi, render_mpi_fused_remat,
                                        plan_fused)

    L, res = 5, 256
    geom, ray_dir, eye, z_dir = _setup(L, res)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], res, res)[None]
    rx, ry, _ = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry, max_chunk_planes=2, overhead=1.0)
    plan_t = tuple((int(lo), int(hi), b) for lo, hi, b in plan)
    splat = tuple(plan_splat(scal, ry, plan_t, res))
    assert len(plan_t) >= 3

    rng = np.random.default_rng(7)
    rgba = jnp.asarray(rng.random((1, L, 4, res, res)).astype(np.float32))
    gc = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    out = render_mpi_fused_remat(rgba, dhw, ray_dir, eye, z_dir,
                                 (plan_t, splat), interpret=True)
    oracle = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(oracle.color),
                               atol=5e-4)

    g = jax.grad(lambda x: jnp.sum(render_mpi_fused_remat(
        x, dhw, ray_dir, eye, z_dir, (plan_t, splat), interpret=True
    ).color * gc))(rgba)
    go = jax.grad(lambda x: jnp.sum(render_mpi(
        x, geom.dhw, ray_dir, eye, z_dir).color * gc))(rgba)
    rel = float(jnp.max(jnp.abs(g - go))) / float(jnp.max(jnp.abs(go)))
    assert rel < 1e-3, rel
