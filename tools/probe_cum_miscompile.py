"""Micro-repro hunt for the XLA:TPU at-scale miscompile in composite_bwd:
test cumprod / flip+cumsum / the full formula on synthetic data of the same
shape, TPU jit vs CPU."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

L, R, C = 96, 8192, 128
rng = np.random.default_rng(0)
alpha = rng.random((1, L, R, C)).astype(np.float32)
alpha[0, -1] = 0.987
one_m_np = (1.0 - alpha + 1e-10).astype(np.float32)
one_m = jnp.asarray(one_m_np)

cpu = jax.devices("cpu")[0]


def cmp(name, fn, *args):
    t = np.asarray(jax.jit(fn)(*args))
    c = np.asarray(jax.jit(fn, backend="cpu")(
        *[jax.device_put(np.asarray(a), cpu) for a in args]))
    denom = max(np.abs(c).max(), 1e-30)
    err = np.abs(t - c).max() / denom
    # where the junk is, if any
    print(f"{name:28s} max rel err {err:.3e}  (tpu max {np.abs(t).max():.3e},"
          f" cpu max {np.abs(c).max():.3e})")
    return t, c


cmp("cumprod axis=1", lambda x: jnp.cumprod(x, axis=1), one_m)

t, c = cmp("cumprod last plane", lambda x: jnp.cumprod(x, axis=1)[:, -1], one_m)
print("   tpu[0,:3,:3]", t[0, :3, :3].ravel())
print("   cpu[0,:3,:3]", c[0, :3, :3].ravel())

we = (rng.random((1, L, R, C)).astype(np.float32)
      * np.asarray(jnp.cumprod(one_m, axis=1)))
cmp("flip+cumsum+flip", lambda x: jnp.flip(jnp.cumsum(
    jnp.flip(x, 1), axis=1), 1), jnp.asarray(we))

cmp("full: texcl*e - u/onem", lambda om, w: (
    jnp.concatenate([jnp.ones_like(om[:, :1]),
                     jnp.cumprod(om, axis=1)[:, :-1]], 1)
    - jnp.flip(jnp.cumsum(jnp.flip(w, 1), 1), 1) / om), one_m, jnp.asarray(we))
