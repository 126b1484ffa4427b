"""Numerical ops: losses (jnp reference + fused Pallas kernel), binarize."""

from musicvae_tpu.ops.binarize import (  # noqa: F401
    binarize_logits, sample_bernoulli_logits,
)
from musicvae_tpu.ops.losses import (  # noqa: F401
    bce_with_logits,
    beta_schedule,
    elbo_loss,
    kl_diag_gaussian,
    masked_bce_sum,
)
