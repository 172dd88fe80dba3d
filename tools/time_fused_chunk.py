"""Time the fused kernel on real bench chunks (96-plane geometry, chunk 16)."""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="0,5")
    ap.add_argument("--early_out", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from test_fused_fwd import setup
    from gmpi_tpu.ops.pallas_warp import (
        estimate_fused_bands, flatten_pixels, pad_textures, plane_affine,
        ray_fields, warp_composite_fwd)

    L, R, TEX, PC = 96, 1024, 1024, 16
    geom, ray_dir, eye, z_dir = setup(L, R, TEX)
    scal_all = plane_affine(jnp.asarray(geom.dhw), eye[0], TEX, TEX)
    rx, ry, q = ray_fields(ray_dir, z_dir)
    bands_rx = (rx, ry)  # row-major copies for band estimation
    rxf, ryf, qf = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)
    rng = np.random.default_rng(0)

    total = 0.0
    for k in [int(c) for c in args.chunks.split(",")]:
        scal = scal_all[None, k * PC:(k + 1) * PC]
        bands = estimate_fused_bands(scal, rx, ry)
        rgba = jnp.asarray(rng.random((1, PC, 4, TEX, TEX)).astype(np.float32))
        tex_pad = pad_textures(rgba)

        def fwd(tp):
            c, d, t, w = warp_composite_fwd(tp, rxf, ryf, qf, scal, bands,
                                            early_out=args.early_out)
            return jnp.sum(c) + jnp.sum(t) + jnp.sum(w) * 1e-30

        @jax.jit
        def loop(tp):
            def body(i, acc):
                return acc + fwd(tp + acc * 1e-30) * 1e-30
            return lax.fori_loop(0, 4, body, jnp.zeros((), jnp.float32))

        t0 = time.time()
        float(loop(tex_pad))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(tex_pad))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.030) / 4
        total += t
        print(f"chunk {k}: bands={tuple(bands)} compile={compile_s:.0f}s "
              f"fwd={t*1e3:.1f} ms", flush=True)
        if args.check:
            from gmpi_tpu.core.renderer import render_slab_partial
            c, d, t_, w = jax.jit(
                lambda tp: warp_composite_fwd(tp, rxf, ryf, qf, scal, bands,
                                              early_out=args.early_out))(tex_pad)
            from gmpi_tpu.ops.pallas_warp import unflatten_pixels
            c = unflatten_pixels(c, R, R); t_ = unflatten_pixels(t_, R, R)
            cr, dr, tr = jax.jit(
                lambda r: render_slab_partial(r, geom.dhw[k*PC:(k+1)*PC],
                                              ray_dir, eye, z_dir))(rgba)
            print(f"  color err {float(jnp.max(jnp.abs(c - cr))):.2e} "
                  f"trans err {float(jnp.max(jnp.abs(t_[:,None] - tr))):.2e}")
    print(f"sum over tested chunks: {total*1e3:.1f} ms")


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "full"):
    main()

def full():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--early_out", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--no_time", action="store_true")
    args, _ = ap.parse_known_args(sys.argv[2:])

    from test_fused_fwd import setup
    from gmpi_tpu.ops.pallas_warp import (
        plan_fused_render, plane_affine, ray_fields, render_mpi_fused_fwd)

    L, R, TEX = 96, 1024, 1024
    geom, ray_dir, eye, z_dir = setup(L, R, TEX)
    dhw = jnp.asarray(geom.dhw)
    scal = plane_affine(dhw, eye[0], TEX, TEX)
    rx, ry, q = ray_fields(ray_dir, z_dir)
    plan = plan_fused_render(scal, rx, ry)
    for lo, hi, b in plan:
        print(f"  plan chunk [{lo},{hi}) bands={tuple(b)}")
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, L, 4, TEX, TEX)).astype(np.float32))

    def fwd(x):
        c, d, t, w = render_mpi_fused_fwd(x, dhw, ray_dir, eye, z_dir, plan,
                                          early_out=args.early_out)
        return jnp.sum(c) + jnp.sum(d) + jnp.sum(w) * 1e-30

    if not args.no_time:
        @jax.jit
        def loop(x):
            def body(i, acc):
                return acc + fwd(x + acc * 1e-30) * 1e-30
            return lax.fori_loop(0, 4, body, jnp.zeros((), jnp.float32))
        t0 = time.time(); float(loop(rgba)); print(f"compile {time.time()-t0:.0f}s", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(rgba)); ts.append(time.perf_counter()-t0)
        t = (min(ts) - 0.030) / 4
        print(f"FULL fused fwd 96 planes @1024^2 early_out={args.early_out}: {t*1e3:.1f} ms")
    if args.check:
        c, d, t_, w = jax.jit(lambda x: render_mpi_fused_fwd(
            x, dhw, ray_dir, eye, z_dir, plan, early_out=args.early_out))(rgba)
        from gmpi_tpu.core.renderer import render_mpi_chunked
        ref = jax.jit(lambda x: render_mpi_chunked(
            x, dhw, ray_dir, eye, z_dir, plane_chunk=16))(rgba)
        print(f"  color err {float(jnp.max(jnp.abs(c - ref.color))):.2e} "
              f"depth err {float(jnp.max(jnp.abs(d - ref.depth))):.2e}")

if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "full":
    full()
