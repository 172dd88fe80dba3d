"""Measure the fused fwd's PER-GRID-STEP machinery in isolation (r5).

Round-4 left a ~26 ms fwd floor with 94/96 planes dead and attributed it to
"~50 us x 512 steps of per-grid-step machinery".  This probe separates the
candidates with null-body kernels that copy the REAL fwd's block structure
at 96x1024^2 grad-mode shapes (12 planes/chunk x 8 chunks x 64 strips):

  A. full block set (9 pixel-field ins, 6 outs, 3 MB warped block) — body
     writes constants only: pure block-copy machinery;
  B. same minus the warped block: how much the 3 MB/step flush costs;
  C. resident variant: rx/ry/q as per-view resident blocks + ONE packed
     state block in/out, warped kept: what the planned refactor would pay;
  D. A + a fori_loop of 12 dead-plane zero stores: the zeroing cost.

Run on the v5e:  python tools/probe_fwd_machinery.py [--res 1024]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LANES = 128
STRIP = 16


def timeit(fn, *args, inner=8, outer=3, name=""):
    @jax.jit
    def step(*a):
        def body(i, acc):
            out = fn(*(x * (1.0 + acc * 1e-30) for x in a))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0] * 1e-30
        return lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))

    float(np.asarray(step(*args)))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        float(np.asarray(step(*args)))
        ts.append(time.perf_counter() - t0)
    best = min(ts) / inner
    print(f"# {name:<44} {best*1000:8.2f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--l_chunk", type=int, default=12)
    args = ap.parse_args()

    res = args.res
    ns = res // STRIP
    r8 = (res // 64) * 8
    v = 1
    lc = args.l_chunk
    f32 = jnp.float32
    px = jnp.zeros((v, ns, r8, LANES), f32)
    cx = jnp.zeros((v, 3, ns, r8, LANES), f32)
    pxspec = pl.BlockSpec((1, 1, r8, LANES), lambda vi, si: (vi, si, 0, 0))
    cspec = pl.BlockSpec((1, 3, 1, r8, LANES), lambda vi, si: (vi, 0, si, 0, 0))
    pxshape = jax.ShapeDtypeStruct((v, ns, r8, LANES), f32)
    cshape = jax.ShapeDtypeStruct((v, 3, ns, r8, LANES), f32)
    wshape = jax.ShapeDtypeStruct((v, ns, lc, 4, r8, LANES), f32)
    wspec = pl.BlockSpec((1, 1, lc, 4, r8, LANES),
                         lambda vi, si: (vi, si, 0, 0, 0, 0))

    def body_a(*refs, zero_loop=0, n_out):
        outs = refs[-n_out:]
        for o in outs[:-1]:
            o[...] = jnp.zeros_like(o)
        w = outs[-1]
        if zero_loop:
            def zb(l, c):
                w[0, 0, pl.ds(l, 1)] = jnp.zeros((1, 4, r8, LANES), f32)
                return c
            lax.fori_loop(0, zero_loop, zb, 0)
        else:
            w[...] = jnp.zeros_like(w)

    def call_a(zero_loop=0, with_warped=True, n_in=9):
        n_out = 6 + (1 if with_warped else 0)
        in_specs = [cspec] + [pxspec] * (n_in - 1)
        out_specs = [cspec] + [pxspec] * 5
        out_shape = [cshape] + [pxshape] * 5
        if with_warped:
            out_specs.append(wspec)
            out_shape.append(wshape)
        kern = functools.partial(body_a, zero_loop=zero_loop, n_out=n_out)
        def fn(cxa, pxa):
            ins = [cxa] + [pxa] * (n_in - 1)
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0, grid=(v, ns),
                    in_specs=in_specs, out_specs=tuple(out_specs)),
                out_shape=tuple(out_shape),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*ins)
        return fn

    def per_chunk(fn):
        def multi(cxa, pxa):
            outs = None
            for _ in range(args.chunks):
                outs = fn(cxa, pxa)
            return outs
        return multi

    res_a = timeit(per_chunk(call_a()), cx, px,
                   name=f"A full blocks x{args.chunks} chunks")
    res_b = timeit(per_chunk(call_a(with_warped=False)), cx, px,
                   name="B no warped block")
    res_d = timeit(per_chunk(call_a(zero_loop=lc)), cx, px,
                   name="D + 12-plane zero fori_loop")

    # C. resident rays + one packed state in/out + warped
    F = 8
    state = jnp.zeros((v, ns, F, r8, LANES), f32)
    rays = jnp.zeros((v, 3, ns, r8, LANES), f32)

    def body_c(rays_ref, sin_any, sout_any, w_ref, sscr, sems):
        si = pl.program_id(1)

        @pl.when(si == 0)
        def _():
            cp = pltpu.make_async_copy(sin_any.at[0], sscr, sems.at[0])
            cp.start()
            cp.wait()

        v0 = rays_ref[0, 0, pl.ds(si, 1)][0, 0, 0]  # touch resident block
        sscr[pl.ds(si, 1)] = jnp.zeros((1, F, r8, LANES), f32) + v0
        w_ref[...] = jnp.zeros_like(w_ref)

        @pl.when(si == ns - 1)
        def _():
            cp = pltpu.make_async_copy(sscr, sout_any.at[0], sems.at[1])
            cp.start()
            cp.wait()

    def call_c(rays_a, state_a):
        return pl.pallas_call(
            body_c,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(v, ns),
                in_specs=[
                    pl.BlockSpec((1, 3, ns, r8, LANES),
                                 lambda vi, si: (vi, 0, 0, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=(pl.BlockSpec(memory_space=pl.ANY), wspec),
                scratch_shapes=[
                    pltpu.VMEM((ns, F, r8, LANES), f32),
                    pltpu.SemaphoreType.DMA((2,)),
                ]),
            out_shape=(jax.ShapeDtypeStruct((v, ns, F, r8, LANES), f32),
                       wshape),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024),
        )(rays_a, state_a)

    res_c = timeit(per_chunk(call_c), rays, state,
                   name="C resident rays + scratch state + warped")

    # E/F: cost of vector-reduce -> scalar extract -> SMEM -> branch chains
    # (the S-liveness checks the real kernel runs per step / per group)
    def body_e(rays_ref, w_ref, smem, *, reduces, loop_iters):
        def one_check(i):
            x = rays_ref[0, 0, pl.ds(i % ns, 1)][0]
            smem[0] = jnp.where(jnp.max(x) >= -1e30, 1, 0)

            @pl.when(smem[0] == 1)
            def _():
                smem[1] = i

        for i in range(reduces):
            one_check(i)
        if loop_iters:
            def lbody(l, c):
                one_check(l)

                @pl.when(smem[0] == 1)
                def _():
                    w_ref[0, 0, pl.ds(l % lc, 1)] = jnp.zeros(
                        (1, 4, r8, LANES), f32)
                return c
            lax.fori_loop(0, loop_iters, lbody, 0)
        else:
            w_ref[...] = jnp.zeros_like(w_ref)

    def call_e(reduces=3, loop_iters=0):
        kern = functools.partial(body_e, reduces=reduces,
                                 loop_iters=loop_iters)
        def fn(rays_a, _):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0, grid=(v, ns),
                    in_specs=[pl.BlockSpec((1, 3, ns, r8, LANES),
                                           lambda vi, si: (vi, 0, 0, 0, 0))],
                    out_specs=wspec,
                    scratch_shapes=[pltpu.SMEM((2,), jnp.int32)]),
                out_shape=wshape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(rays_a)
        return fn

    res_e0 = timeit(per_chunk(call_e(reduces=0)), rays, state,
                    name="E0 resident+warped only")
    res_e3 = timeit(per_chunk(call_e(reduces=3)), rays, state,
                    name="E3 + 3 reduce->SMEM->when per step")
    res_f = timeit(per_chunk(call_e(reduces=0, loop_iters=lc)), rays, state,
                   name=f"F + {lc}-iter loop w/ reduce+when each")

    print(json.dumps({
        "res": res, "chunks": args.chunks,
        "A_full_blocks_ms": round(res_a * 1000, 2),
        "B_no_warped_ms": round(res_b * 1000, 2),
        "C_resident_ms": round(res_c * 1000, 2),
        "D_with_zeroloop_ms": round(res_d * 1000, 2),
        "E0_ms": round(res_e0 * 1000, 2),
        "E3_ms": round(res_e3 * 1000, 2),
        "F_loop_reduce_ms": round(res_f * 1000, 2),
    }))


if __name__ == "__main__":
    main()
