"""Microbenchmark the fused kernels' inner-op suspects on the v5e.

One pallas kernel loops ITER times over a parameterized op mix; the loop
carry consumes results (no DCE) and inputs vary per iteration (no CSE).
Costs are per-iteration deltas vs the empty loop.
"""

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RWP, WADD, BX, LANES = 40, 384, 96, 128
ITERS = 2048


def kernel(x_ref, o_ref, acc, *, mode):
    f32 = jnp.float32
    acc[...] = x_ref[...]

    def body(i, c):
        if mode == "empty":
            return c + 1
        if mode == "roll":
            w = acc[0, :, pl.ds(0, RWP), :]
            w = pltpu.roll(w, lax.rem(i, 128), 2)
            acc[0, :, pl.ds(RWP, RWP), :] = w
            return c + 1
        if mode == "rmw":
            r0 = lax.rem(i, 8) * 8
            cur = acc[0, :, pl.ds(r0, RWP), :]
            acc[0, :, pl.ds(r0 + 8, RWP), :] = cur + 1.0
            return c + 1
        if mode == "hat":
            iota = lax.broadcasted_iota(jnp.int32, (BX, 16, LANES), 0).astype(f32)
            fx = acc[0, 0, pl.ds(0, 16), 0:LANES] + jnp.float32(1.0) * i
            h = jnp.maximum(0.0, 1.0 - jnp.abs(fx[None] - iota))
            acc[0, 0, pl.ds(8, 8), 0:LANES] = h[0, 0:8] + h[1, 0:8]
            return c + 1
        if mode == "matmul":
            a = acc[0, :, pl.ds(0, RWP), 0:BX].reshape(4 * RWP, BX)
            b = acc[0, 0, pl.ds(0, BX), 0:LANES]      # [BX, 128]
            m = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            acc[0, 0, pl.ds(0, 8), 0:LANES] = (
                m[0:8] * 1e-30 + acc[0, 0, pl.ds(0, 8), 0:LANES])
            return c + 1
        if mode == "reduce":
            x = acc[0, 0, pl.ds(0, 8), :]
            s = jnp.min(x) + jnp.float32(i)
            acc[0, 0, pl.ds(0, 1), 0:1] = s.reshape(1, 1)
            return c + 1
        raise ValueError(mode)

    lax.fori_loop(0, ITERS, body, jnp.int32(0))
    o_ref[0] = acc[0, :, pl.ds(0, 8), :]


def run(mode):
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, 4, 2 * RWP + 16, WADD)).astype(np.float32))
    fn = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(1,),
            in_specs=[pl.BlockSpec((1, 4, 2 * RWP + 16, WADD),
                                   lambda i: (0, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 4, 8, WADD), lambda i: (0, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, 4, 2 * RWP + 16, WADD),
                                       jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 4, 8, WADD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    f = jax.jit(fn)
    f(x).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


base = run("empty")
out = {"iters": ITERS, "empty_us_total": round(base * 1e6, 1)}
for m in ("roll", "rmw", "hat", "matmul", "reduce"):
    t = run(m)
    out[f"{m}_ns_per_iter"] = round((t - base) / ITERS * 1e9, 1)
print(json.dumps(out))
