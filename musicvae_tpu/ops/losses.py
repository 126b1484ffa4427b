"""Masked piano-roll BCE + KL-annealed ELBO — reference jnp implementation.

The reference trains a "masked piano-roll BCE + KL-annealed ELBO"
(BASELINE.json north_star). This module is the numerically-defined ground
truth for that loss; musicvae_tpu/ops/fused_elbo.py provides the fused
Pallas TPU kernel that must match it (tests/test_fused_elbo.py asserts
fwd ≤ 1e-5 rel and grads ≤ 1e-6 abs agreement, the SURVEY §7.3 bar).

Conventions (mirrored by tests/oracle/oracle_loss.py):
- ``logits``/``x`` have shape [..., T, P]; the mask broadcasts against them
  (typically the [P]-shaped pitch-crop mask from midi.tensorize.pitch_mask).
- recon = sum over masked cells of BCE-with-logits, divided by batch size
  (sum-per-sample, mean-over-batch).
- kl = -0.5 * sum(1 + logvar - mu^2 - exp(logvar)) per sample, mean-over-batch.
- elbo_loss = recon + beta * kl   (the minimized objective).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically stable per-cell binary cross entropy from logits.

    max(l, 0) - l*x + log1p(exp(-|l|)) — identical formula in the torch
    oracle (it is torch's own BCEWithLogits formulation).
    """
    # f32 accumulate regardless of input dtype: bf16 logits (the decoder
    # head's HBM-saving output format) and uint8 targets (the resident
    # gather's roll dtype) upcast INSIDE the elementwise chain — XLA fuses
    # the converts into this fusion, so no f32 copy of either tensor is
    # ever materialized in HBM.
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def masked_bce_sum(logits: jax.Array, targets: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Sum of masked per-cell BCE over ALL axes (batch included)."""
    return jnp.sum(bce_with_logits(logits, targets) * mask)


def kl_diag_gaussian(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, diag(exp(logvar))) || N(0, I)), summed over ALL axes."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


def kl_free_bits(mu: jax.Array, logvar: jax.Array,
                 free_bits: float) -> jax.Array:
    """Free-bits KL objective (Kingma et al. 2016, as used throughout the
    MusicVAE lineage): the per-DIMENSION batch-mean KL is floored at
    ``free_bits`` nats before summing, so dimensions already below the
    floor contribute a constant (zero gradient) and the posterior is never
    pushed all the way into the prior — the standard posterior-collapse
    guard alongside β-annealing.

    Returns the OBJECTIVE value summed over latent dims and scaled back by
    the batch size, so `kl_free_bits(...) / batch` is a drop-in for
    `kl_diag_gaussian(...) / batch` in the minimized loss (identical when
    every dimension's mean KL exceeds the floor; the reported `kl` metric
    stays the true un-floored KL either way). ``mu``/``logvar``: [B, z]
    (leading batch axis, any trailing latent axes).
    """
    batch = mu.shape[0]
    per_dim = -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    mean_per_dim = jnp.mean(per_dim.reshape(batch, -1), axis=0)   # [z]
    return jnp.sum(jnp.maximum(mean_per_dim, free_bits)) * batch


def elbo_loss(
    logits: jax.Array,
    targets: jax.Array,
    mask: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    beta: jax.Array,
) -> Tuple[jax.Array, dict]:
    """Minimized objective: recon + beta*kl, batch-mean. Returns (loss, aux).

    ``mu``/``logvar`` may be a single [B, z] pair or, for hierarchical
    models, pytrees handled by the caller — this function takes one level;
    models with multiple latent levels sum their KLs before annealing.
    """
    batch = logits.shape[0]
    recon = masked_bce_sum(logits, targets, mask) / batch
    kl = kl_diag_gaussian(mu, logvar) / batch
    loss = recon + beta * kl
    return loss, {"loss": loss, "recon": recon, "kl": kl, "beta": beta}


def beta_schedule(step: jax.Array, beta_max: float, warmup_steps: int,
                  hold_steps: int = 0, mode: str = "linear",
                  cycle_steps: int = 0) -> jax.Array:
    """KL-annealing weight — pure function of the step counter so it lives
    inside the jitted train step (no host-side schedule state).

    - ``linear`` (the reference's KL-annealed ELBO): 0 for ``hold_steps``,
      then a linear ramp to ``beta_max`` over ``warmup_steps``.
    - ``cyclical`` (Fu et al. 2019 cyclical annealing; standard in the
      music-VAE literature to fight posterior collapse): within each
      ``cycle_steps`` window, ramp 0→beta_max over ``warmup_steps`` and
      hold at beta_max for the remainder.
    """
    s = jnp.maximum(step - hold_steps, 0).astype(jnp.float32)
    if mode == "cyclical":
        if cycle_steps <= 0:
            raise ValueError("cyclical schedule needs cycle_steps > 0")
        s = jnp.mod(s, float(cycle_steps))
    elif mode != "linear":
        raise ValueError(f"unknown beta schedule mode {mode!r}")
    if warmup_steps <= 0:
        return jnp.asarray(beta_max, jnp.float32)
    frac = jnp.minimum(s / float(warmup_steps), 1.0)
    return frac * beta_max
