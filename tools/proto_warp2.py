"""Prototype measurements for the v2 tile-banded warp (round-2 perf work).

Measures, at the bench config (96 planes, 1024^2, chunk 16):
  1. patch extraction backends: vmapped dynamic_slice vs block gather
  2. v2 forward (16x128 tiles, By=32, Bx<=128/256 packed matmuls)
  3. v2 backward: d_patch transposed matmul + scatter-add
All timings in-graph (fori_loop) to dominate the ~30 ms tunnel RTT.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=4, name=""):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            r = fn(*jax.tree_util.tree_map(lambda x: jnp.where(jnp.isnan(acc), x, x), a))
            leaves = jax.tree_util.tree_leaves(r)
            return acc + sum(jnp.sum(l) * 1e-30 for l in leaves)
        return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    t = (min(ts) - 0.030) / iters
    print(f"  {name:<44} {t*1e3:9.2f} ms")
    return t


def bench_setup(L=96, R=1024, TEX=1024):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import homography_grid

    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, R, R)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, L, 3, R, R)).reshape(L, 3, R, R)
    eye_f = jnp.broadcast_to(eye[:, None], (1, L, 3)).reshape(L, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, L, 3)).reshape(L, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    return grid


def v2_forward(tex, grid, tr, tc, By, Bx, prec, g_rows=4, patch_backend="dus"):
    """tex [N,C,H,W], grid [N,Ho,Wo,2] -> out [N,C,Ho,Wo]."""
    from gmpi_tpu.ops.grid_sample import _unnormalize

    n, c, h, w = tex.shape
    _, ho, wo, _ = grid.shape
    fx = _unnormalize(grid[..., 0], w, True)
    fy = _unnormalize(grid[..., 1], h, True)
    nty, ntx = ho // tr, wo // tc
    P = tr * tc
    fx_t = fx.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
    fy_t = fy.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)

    pad_y, pad_x = By, Bx
    texl = jnp.pad(tex.transpose(0, 3, 2, 1),
                   ((0, 0), (pad_x, pad_x), (pad_y, pad_y), (0, 0)))
    texl = texl.reshape(n, w + 2 * pad_x, (h + 2 * pad_y) * c)

    y_lo = jnp.floor(jnp.min(fy_t, axis=(3, 4))).astype(jnp.int32) - 1  # [N,nty,ntx]
    x_lo = jnp.floor(jnp.min(fx_t, axis=(3, 4))).astype(jnp.int32) - 1
    y_lo = jnp.clip(y_lo + pad_y, 0, h + 2 * pad_y - By)
    x_lo = jnp.clip(x_lo + pad_x, 0, w + 2 * pad_x - Bx)

    assert nty % g_rows == 0
    fx_s = fx_t.reshape(n, nty // g_rows, g_rows, ntx, tr, tc).swapaxes(0, 1)
    fy_s = fy_t.reshape(n, nty // g_rows, g_rows, ntx, tr, tc).swapaxes(0, 1)
    ylo_s = y_lo.reshape(n, nty // g_rows, g_rows, ntx).swapaxes(0, 1)
    xlo_s = x_lo.reshape(n, nty // g_rows, g_rows, ntx).swapaxes(0, 1)

    def row_group(fx_r, fy_r, ylo_r, xlo_r):
        # fx_r [N, g, ntx, tr, tc]; ylo_r [N, g, ntx]
        def slice_patch(tf, yl, xl):
            return lax.dynamic_slice(tf, (xl, yl * c), (Bx, By * c))

        pm = jax.vmap(lambda tf, yls, xls: jax.vmap(jax.vmap(slice_patch, in_axes=(None, 0, 0)),
                                                    in_axes=(None, 0, 0))(tf, yls, xls))(texl, ylo_r, xlo_r)
        # pm [N, g, ntx, Bx, By*C]
        ty = fy_r.reshape(n, g_rows, ntx, P, 1) - (ylo_r - pad_y).astype(fy_r.dtype)[..., None, None]
        tx = fx_r.reshape(n, g_rows, ntx, P, 1) - (xlo_r - pad_x).astype(fx_r.dtype)[..., None, None]
        iy = lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1, By), 4)
        ix = lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1, Bx), 4)
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(ty - iy))  # [N,g,ntx,P,By]
        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(tx - ix))  # [N,g,ntx,P,Bx]
        mixed = jnp.einsum("...px,...xm->...pm", hat_x, pm,
                           precision=prec, preferred_element_type=jnp.float32)
        mixed = mixed.reshape(n, g_rows, ntx, P, By, c)
        return jnp.einsum("...py,...pyc->...pc", hat_y, mixed)  # [N,g,ntx,P,C]

    def body(_, xs):
        return None, row_group(*xs)

    _, out = lax.scan(body, None, (fx_s, fy_s, ylo_s, xlo_s))
    # out [nty/g, N, g, ntx, P, C]
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(n, nty, ntx, tr, tc, c)
    return out.transpose(0, 5, 1, 3, 2, 4).reshape(n, c, ho, wo)


def v3_forward(tex, grid, tr, tc, By, Bx, prec, g_rows=4, ymix="einsum"):
    """Transposed/channel-major formulation: texture fused [N, C, Hp, Wp];
    per tile: patchT [C*By, Bx] @ hat_xT [Bx, P] -> mixedT [C*By, P];
    y-mix = sublane reduce over By groups -> [C, P]."""
    from gmpi_tpu.ops.grid_sample import _unnormalize

    n, c, h, w = tex.shape
    _, ho, wo, _ = grid.shape
    fx = _unnormalize(grid[..., 0], w, True)
    fy = _unnormalize(grid[..., 1], h, True)
    nty, ntx = ho // tr, wo // tc
    P = tr * tc
    fx_t = fx.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
    fy_t = fy.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)

    pad_y, pad_x = By, Bx
    texl = jnp.pad(tex, ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)))
    # [N, C, Hp, Wp]

    y_lo = jnp.floor(jnp.min(fy_t, axis=(3, 4))).astype(jnp.int32) - 1  # [N,nty,ntx]
    x_lo = jnp.floor(jnp.min(fx_t, axis=(3, 4))).astype(jnp.int32) - 1
    y_lo = jnp.clip(y_lo + pad_y, 0, h + 2 * pad_y - By)
    x_lo = jnp.clip(x_lo + pad_x, 0, w + 2 * pad_x - Bx)

    assert nty % g_rows == 0
    fx_s = fx_t.reshape(n, nty // g_rows, g_rows, ntx, tr, tc).swapaxes(0, 1)
    fy_s = fy_t.reshape(n, nty // g_rows, g_rows, ntx, tr, tc).swapaxes(0, 1)
    ylo_s = y_lo.reshape(n, nty // g_rows, g_rows, ntx).swapaxes(0, 1)
    xlo_s = x_lo.reshape(n, nty // g_rows, g_rows, ntx).swapaxes(0, 1)

    def row_group(fx_r, fy_r, ylo_r, xlo_r):
        # fx_r [N, g, ntx, tr, tc]; ylo_r [N, g, ntx]
        def slice_patch(tf, yl, xl):
            return lax.dynamic_slice(tf, (0, yl, xl), (c, By, Bx))

        pm = jax.vmap(lambda tf, yls, xls: jax.vmap(jax.vmap(
            slice_patch, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))(tf, yls, xls)
        )(texl, ylo_r, xlo_r)  # [N, g, ntx, C, By, Bx]
        pm = pm.reshape(n, g_rows, ntx, c * By, Bx)

        ty = fy_r.reshape(n, g_rows, ntx, 1, P) - (ylo_r - pad_y).astype(fy_r.dtype)[..., None, None]
        tx = fx_r.reshape(n, g_rows, ntx, 1, P) - (xlo_r - pad_x).astype(fx_r.dtype)[..., None, None]
        ix = lax.broadcasted_iota(jnp.float32, (1, 1, 1, Bx, 1), 3)
        iy = lax.broadcasted_iota(jnp.float32, (1, 1, 1, By, 1), 3)
        hat_xT = jnp.maximum(0.0, 1.0 - jnp.abs(tx - ix))  # [N,g,ntx,Bx,P]
        hat_yT = jnp.maximum(0.0, 1.0 - jnp.abs(ty - iy))  # [N,g,ntx,By,P]
        mixedT = jnp.einsum("...mx,...xp->...mp", pm, hat_xT,
                            precision=prec, preferred_element_type=jnp.float32)
        mixedT = mixedT.reshape(n, g_rows, ntx, c, By, P)
        if ymix == "einsum":
            out = jnp.einsum("...yp,...cyp->...cp", hat_yT, mixedT)
        else:  # unrolled static sublane slices
            out = sum(hat_yT[..., None, y, :] * mixedT[..., y, :] for y in range(By))
        return out  # [N, g, ntx, C, P]

    def body(_, xs):
        return None, row_group(*xs)

    _, out = lax.scan(body, None, (fx_s, fy_s, ylo_s, xlo_s))
    # [nty/g, N, g, ntx, C, P] -> [N, C, H, W]
    out = out.reshape(nty // g_rows, n, g_rows, ntx, c, tr, tc)
    out = out.transpose(1, 4, 0, 2, 5, 3, 6).reshape(n, c, ho, wo)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fwd")
    args = ap.parse_args()

    L, R, TEX, PC = 96, 1024, 1024, 16
    rng = np.random.default_rng(0)
    grid = bench_setup(L, R, TEX)
    print("grid ready")

    tex_c = jnp.asarray(rng.random((PC, 4, TEX, TEX)).astype(np.float32))
    grid_c = grid[:PC]

    if args.mode == "v3":
        from gmpi_tpu.ops.grid_sample import grid_sample_bilinear
        small = jnp.asarray(rng.random((4, 4, 256, 256)).astype(np.float32))
        g_small = grid_c[:4, ::4, ::4]
        ref = grid_sample_bilinear(small, g_small)
        out = v3_forward(small, g_small, 16, 128, 32, 128, "highest")
        print("v3 max abs err vs oracle:", float(jnp.max(jnp.abs(out - ref))))
        for (tr, tc, By, Bx) in [(16, 128, 32, 128), (32, 128, 64, 160)]:
            for prec in ["default", "high"]:
                for ymix in (["einsum", "unroll"] if tr == 16 else ["einsum"]):
                    f = functools.partial(v3_forward, tr=tr, tc=tc, By=By, Bx=Bx,
                                          prec=prec, ymix=ymix)
                    t = timed(f, tex_c, grid_c,
                              name=f"v3 fwd chunk16 ({tr},{tc}) B=({By},{Bx}) {prec} {ymix}")
                    print(f"    -> est full 96-plane fwd: {t*6*1e3:.1f} ms")
    elif args.mode == "ablate3":
        from gmpi_tpu.ops.grid_sample import _unnormalize
        tr, tc, By, Bx = 16, 128, 32, 128
        n, c, h, w = tex_c.shape
        fx = _unnormalize(grid_c[..., 0], w, True)
        fy = _unnormalize(grid_c[..., 1], h, True)
        nty, ntx = R // tr, R // tc
        P = tr * tc
        fx_t = fx.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
        fy_t = fy.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
        pad_y, pad_x = By, Bx
        texl = jnp.pad(tex_c, ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x)))
        y_lo = jnp.clip(jnp.floor(jnp.min(fy_t, axis=(3, 4))).astype(jnp.int32) - 1 + pad_y,
                        0, h + 2 * pad_y - By)
        x_lo = jnp.clip(jnp.floor(jnp.min(fx_t, axis=(3, 4))).astype(jnp.int32) - 1 + pad_x,
                        0, w + 2 * pad_x - Bx)

        def prep(fx, fy):
            fx_t = fx.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
            fy_t = fy.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
            y_lo = jnp.floor(jnp.min(fy_t, axis=(3, 4))) - 1
            x_lo = jnp.floor(jnp.min(fx_t, axis=(3, 4))) - 1
            return jnp.sum(y_lo) + jnp.sum(x_lo) + jnp.sum(fx_t[..., 0, 0])

        timed(prep, fx, fy, name="coord tiling + start mins")

        def extract(texl, y_lo, x_lo):
            def slice_patch(tf, yl, xl):
                return lax.dynamic_slice(tf, (0, yl, xl), (c, By, Bx))
            f = jax.vmap(jax.vmap(slice_patch, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))
            return jax.vmap(f)(texl, y_lo, x_lo)

        timed(lambda t, y, x: jnp.sum(extract(t, y, x)), texl, y_lo, x_lo,
              name="extract c-major [C,By,Bx] dus")

        pm = extract(texl, y_lo, x_lo).reshape(n, nty, ntx, c * By, Bx)

        def hats(fx_t, fy_t, y_lo, x_lo):
            ty = fy_t.reshape(n, nty, ntx, 1, P) - (y_lo - pad_y).astype(fy_t.dtype)[..., None, None]
            tx = fx_t.reshape(n, nty, ntx, 1, P) - (x_lo - pad_x).astype(fx_t.dtype)[..., None, None]
            ix = lax.broadcasted_iota(jnp.float32, (1, 1, 1, Bx, 1), 3)
            iy = lax.broadcasted_iota(jnp.float32, (1, 1, 1, By, 1), 3)
            return (jnp.maximum(0.0, 1.0 - jnp.abs(tx - ix)),
                    jnp.maximum(0.0, 1.0 - jnp.abs(ty - iy)))

        timed(lambda a, b, yl, xl: sum(jnp.sum(t) for t in hats(a, b, yl, xl)),
              fx_t, fy_t, y_lo, x_lo, name="hatsT construction")

        hx, hy = hats(fx_t, fy_t, y_lo, x_lo)

        def mm1(pm, hx):
            return jnp.einsum("...mx,...xp->...mp", pm, hx, precision="default",
                              preferred_element_type=jnp.float32)

        timed(lambda p, h: jnp.sum(mm1(p, h)), pm, hx, name="mm1 patchT@hatxT (whole chunk)")
        mx = mm1(pm, hx).reshape(n, nty, ntx, c, By, P)

        def ymix(hy, mx):
            return jnp.einsum("...yp,...cyp->...cp", hy, mx)

        timed(lambda a, b: jnp.sum(ymix(a, b)), hy, mx, name="ymix einsum (whole chunk)")
        out = ymix(hy, mx)

        def assemble(out):
            o = out.reshape(n, nty, ntx, c, tr, tc)
            return o.transpose(0, 3, 1, 4, 2, 5).reshape(n, c, R, R)

        timed(lambda o: jnp.sum(assemble(o)), out, name="assembly transpose")
    elif args.mode == "fwd":
        # v2 forward, one chunk of 16 planes; compare precisions and tiles
        for (tr, tc, By, Bx) in [(16, 128, 32, 128), (8, 128, 32, 128), (16, 128, 32, 160), (32, 128, 64, 160)]:
            for prec in ["default", "high"]:
                try:
                    f = functools.partial(v2_forward, tr=tr, tc=tc, By=By, Bx=Bx, prec=prec)
                    t = timed(f, tex_c, grid_c, name=f"v2 fwd chunk16 tile=({tr},{tc}) B=({By},{Bx}) {prec}")
                    print(f"    -> est full 96-plane fwd: {t*6*1e3:.1f} ms")
                except Exception as e:
                    print(f"  tile=({tr},{tc}) B=({By},{Bx}) {prec}: FAIL {type(e).__name__}: {str(e)[:120]}")
    elif args.mode == "ablate":
        # component ablations on one 16-plane chunk, tile (16,128), B=(32,128)
        from gmpi_tpu.ops.grid_sample import _unnormalize
        tr, tc, By, Bx = 16, 128, 32, 128
        n, c, h, w = tex_c.shape
        fx = _unnormalize(grid_c[..., 0], w, True)
        fy = _unnormalize(grid_c[..., 1], h, True)
        nty, ntx = R // tr, R // tc
        P = tr * tc
        fx_t = fx.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
        fy_t = fy.reshape(n, nty, tr, ntx, tc).transpose(0, 1, 3, 2, 4)
        pad_y, pad_x = By, Bx

        def fuse(tex):
            texl = jnp.pad(tex.transpose(0, 3, 2, 1),
                           ((0, 0), (pad_x, pad_x), (pad_y, pad_y), (0, 0)))
            return texl.reshape(n, w + 2 * pad_x, (h + 2 * pad_y) * c)

        timed(fuse, tex_c, name="pad+fuse layout")
        texl = fuse(tex_c)
        y_lo = jnp.floor(jnp.min(fy_t, axis=(3, 4))).astype(jnp.int32) - 1
        x_lo = jnp.floor(jnp.min(fx_t, axis=(3, 4))).astype(jnp.int32) - 1
        y_lo = jnp.clip(y_lo + pad_y, 0, h + 2 * pad_y - By)
        x_lo = jnp.clip(x_lo + pad_x, 0, w + 2 * pad_x - Bx)

        def extract_dus(texl, y_lo, x_lo):
            def slice_patch(tf, yl, xl):
                return lax.dynamic_slice(tf, (xl, yl * c), (Bx, By * c))
            f = jax.vmap(jax.vmap(slice_patch, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))
            return jax.vmap(f)(texl, y_lo, x_lo)

        timed(lambda t, y, x: jnp.sum(extract_dus(t, y, x)), texl, y_lo, x_lo,
              name="patch extract: vmapped dynamic_slice")

        # quantized-start block gather: starts multiple of (8 rows x, 8*C lanes y)
        def extract_gather(texl, y_lo, x_lo):
            ylq = (y_lo // 8) * 8
            xlq = (x_lo // 8) * 8
            starts = jnp.stack([xlq, ylq * c], axis=-1).reshape(n, -1, 2)
            dn = lax.GatherDimensionNumbers(offset_dims=(1, 2), collapsed_slice_dims=(),
                                            start_index_map=(0, 1))
            def one(tf, st):
                return lax.gather(tf, st, dn, slice_sizes=(Bx + 8, (By + 8) * c),
                                  mode=lax.GatherScatterMode.CLIP)
            return jax.vmap(one)(texl, starts)

        timed(lambda t, y, x: jnp.sum(extract_gather(t, y, x)), texl, y_lo, x_lo,
              name="patch extract: quantized block gather")

        # hats only
        def hats(fx_t, fy_t, y_lo, x_lo):
            ty = fy_t.reshape(n, nty, ntx, P, 1) - (y_lo - pad_y).astype(fy_t.dtype)[..., None, None]
            tx = fx_t.reshape(n, nty, ntx, P, 1) - (x_lo - pad_x).astype(fx_t.dtype)[..., None, None]
            iy = lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1, By), 4)
            ix = lax.broadcasted_iota(jnp.float32, (1, 1, 1, 1, Bx), 4)
            hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(ty - iy))
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(tx - ix))
            return jnp.sum(hat_x) + jnp.sum(hat_y)

        timed(hats, fx_t, fy_t, y_lo, x_lo, name="hat construction only")

        # matmuls only (static patches/hats)
        hx = jnp.asarray(rng.random((n, 8, ntx, P, Bx)).astype(np.float32))
        hy = jnp.asarray(rng.random((n, 8, ntx, P, By)).astype(np.float32))
        pm = jnp.asarray(rng.random((n, 8, ntx, Bx, By * c)).astype(np.float32))

        def mm(hx, hy, pm):
            mixed = jnp.einsum("...px,...xm->...pm", hx, pm, precision="default",
                               preferred_element_type=jnp.float32)
            mixed = mixed.reshape(n, 8, ntx, P, By, c)
            return jnp.einsum("...py,...pyc->...pc", hy, mixed)

        t = timed(mm, hx, hy, pm, name="einsum pair (8 of 64 tile-rows)")
        print(f"    -> est einsums full chunk: {t*8*1e3:.1f} ms")

        def mm1(hx, pm):
            return jnp.einsum("...px,...xm->...pm", hx, pm, precision="default",
                              preferred_element_type=jnp.float32)
        t = timed(mm1, hx, pm, name="first einsum only (8 rows)")
        print(f"    -> est first einsum full chunk: {t*8*1e3:.1f} ms")
    elif args.mode == "check":
        from gmpi_tpu.ops.grid_sample import grid_sample_bilinear
        small = jnp.asarray(rng.random((4, 4, 256, 256)).astype(np.float32))
        g_small = grid_c[:4, ::4, ::4] if R == 1024 else grid_c[:4]
        ref = grid_sample_bilinear(small, g_small)
        out = v2_forward(small, g_small, 16, 128, 32, 128, "highest")
        err = float(jnp.max(jnp.abs(out - ref)))
        print("max abs err v2 vs gather oracle (256^2):", err)


if __name__ == "__main__":
    main()
