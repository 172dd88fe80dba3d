"""grid_sample_bilinear vs torch.nn.functional.grid_sample (values + grads)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gmpi_tpu.ops.grid_sample import grid_sample_bilinear


def _rand_case(rng, n=3, c=4, h=17, w=23, ho=9, wo=13, spread=1.4):
    tex = rng.standard_normal((n, c, h, w)).astype(np.float32)
    # grid partially out of bounds to exercise zeros padding
    grid = (rng.random((n, ho, wo, 2)).astype(np.float32) * 2 - 1) * spread
    return tex, grid


@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_forward(align_corners):
    rng = np.random.default_rng(0)
    tex, grid = _rand_case(rng)
    want = F.grid_sample(
        torch.from_numpy(tex),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).numpy()
    got = np.asarray(grid_sample_bilinear(jnp.asarray(tex), jnp.asarray(grid), align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_grad_wrt_texture(align_corners):
    rng = np.random.default_rng(1)
    tex, grid = _rand_case(rng, h=11, w=12, ho=7, wo=8)
    cot = rng.standard_normal((3, 4, 7, 8)).astype(np.float32)

    t_tex = torch.from_numpy(tex).requires_grad_(True)
    out = F.grid_sample(
        t_tex, torch.from_numpy(grid), mode="bilinear", padding_mode="zeros", align_corners=align_corners
    )
    out.backward(torch.from_numpy(cot))
    want = t_tex.grad.numpy()

    def f(x):
        return jnp.sum(grid_sample_bilinear(x, jnp.asarray(grid), align_corners) * jnp.asarray(cot))

    got = np.asarray(jax.grad(f)(jnp.asarray(tex)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exact_corner_alignment_true():
    # align_corners=True: grid -1/+1 hits boundary pixel centers exactly.
    tex = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
    grid = np.array([[[[-1.0, -1.0], [1.0, 1.0]]]], dtype=np.float32)  # [1,1,2,2]
    got = np.asarray(grid_sample_bilinear(jnp.asarray(tex), jnp.asarray(grid), True))
    assert got[0, 0, 0, 0] == tex[0, 0, 0, 0]
    assert got[0, 0, 0, 1] == tex[0, 0, 2, 3]
