"""Numerical ops: losses (jnp reference + fused Pallas kernels), binarize,
bit-packing, and the banded-MXU first-conv kernel."""

from musicvae_tpu.ops.binarize import (  # noqa: F401
    binarize_logits, sample_bernoulli_logits,
)
from musicvae_tpu.ops.conv1_pallas import first_conv_s2  # noqa: F401
from musicvae_tpu.ops.losses import (  # noqa: F401
    bce_with_logits,
    beta_schedule,
    elbo_loss,
    kl_diag_gaussian,
    kl_free_bits,
    masked_bce_sum,
)
