"""GAN losses + R1 gradient penalty (reference semantics:
``gmpi/train.py:584-618, 770-779``).

Non-saturating softplus GAN loss; the R1 penalty is the squared L2 norm of
``dD/d(real image)``, obtained with plain ``jax.grad`` — JAX autodiff gives
the required grad-of-grad for free (the reference hand-rolls CUDA
``BiasActCudaGrad`` pairs and ``torch.autograd.grad(create_graph=True)``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def d_gan_loss(real_scores: jnp.ndarray, fake_scores: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discriminator loss pair (``train.py:615-617``)."""
    loss_real = jnp.mean(jax.nn.softplus(-real_scores))
    loss_fake = jnp.mean(jax.nn.softplus(fake_scores))
    return loss_real, loss_fake


def g_gan_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """Generator non-saturating loss (``train.py:774``)."""
    return jnp.mean(jax.nn.softplus(-fake_scores))


def r1_penalty(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    real_imgs: jnp.ndarray,
    r1_lambda: float,
) -> jnp.ndarray:
    """``0.5 * lambda * mean_b ||d sum(D)/d x_b||^2`` (``train.py:590-603``)."""
    grad = jax.grad(lambda imgs: jnp.sum(d_apply(imgs)))(real_imgs)
    sq = jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1)
    return 0.5 * r1_lambda * jnp.mean(sq)
