"""Shared latent core: reparameterization, slerp — SURVEY §2.1 component 5.

The reference's stochastic node is ``z = mu + eps * exp(0.5*logvar)``
(BASELINE.json: "reparameterization sampling"); KL and the annealing
schedule live in ops/losses.py so the fused Pallas kernel can own them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize(key: jax.Array, mu: jax.Array,
                   logvar: jax.Array) -> jax.Array:
    """z = mu + eps * exp(0.5 * logvar), eps ~ N(0, I)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


def slerp(z_a: jax.Array, z_b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation between latents (C5 interpolation sweeps).

    Broadcasts t against leading axes; falls back to lerp when the vectors
    are nearly collinear (sin(omega) ~ 0).
    """
    a = z_a / (jnp.linalg.norm(z_a, axis=-1, keepdims=True) + 1e-9)
    b = z_b / (jnp.linalg.norm(z_b, axis=-1, keepdims=True) + 1e-9)
    dot = jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < jnp.ndim(z_a) else t
    safe = jnp.abs(so) > 1e-6
    slerped = (jnp.sin((1.0 - t) * omega) * z_a
               + jnp.sin(t * omega) * z_b) / jnp.where(safe, so, 1.0)
    lerped = (1.0 - t) * z_a + t * z_b
    return jnp.where(safe, slerped, lerped)
