"""Minimal synthetic repro of the XLA:TPU composite_bwd miscompile and
barrier-placement bisection: chained cumprod -> mul -> flipped cumsum -> div
in ONE jit."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

L, R, C = 96, 8192, 128
EPS = 1e-10
rng = np.random.default_rng(0)
alpha = jnp.asarray(rng.random((1, L, R, C)).astype(np.float32))
e = jnp.asarray(rng.standard_normal((1, L, R, C)).astype(np.float32))
cpu = jax.devices("cpu")[0]


def formula(a, ee, barrier=()):
    om = 1.0 - a + EPS

    def b(name, x):
        return lax.optimization_barrier(x) if name in barrier else x

    t_incl = b("t_incl", jnp.cumprod(om, axis=1))
    t_excl = b("t_excl", jnp.concatenate(
        [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], 1))
    we = b("we", a * t_excl * ee)
    we_rev = jnp.flip(we, 1)
    u_rev = b("u_rev", jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(we_rev[:, :1]), we_rev[:, :-1]], 1), axis=1))
    u = b("u", jnp.flip(u_rev, 1))
    q = b("q", u / om)
    return t_excl * ee - q


c_ref = None


def run(name, fn):
    global c_ref
    t = np.asarray(jax.jit(fn)(alpha, e))
    if c_ref is None:
        c_ref = np.asarray(jax.jit(fn, backend="cpu")(
            jax.device_put(np.asarray(alpha), cpu),
            jax.device_put(np.asarray(e), cpu)))
    c = c_ref
    # compare only the far planes where the junk lives (ignore any
    # shared-NaN pixels)
    m = np.isfinite(c) & np.isfinite(t)
    err = np.abs(np.where(m, t - c, 0.0))[0, 90:].max()
    print(f"{name:28s} far-plane abs err {err:.3e}  "
          f"nan(t)={int((~np.isfinite(t)).sum())} "
          f"nan(c)={int((~np.isfinite(c)).sum())}")


run("no barrier", lambda a, ee: formula(a, ee))
for name in ("t_incl", "t_excl", "we", "u_rev", "u", "q"):
    run(f"barrier {name}", lambda a, ee, n=name: formula(a, ee, (n,)))
