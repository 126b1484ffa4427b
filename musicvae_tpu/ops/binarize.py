"""Generation-time binarization (SEMANTICS.md §6).

The reference binarizes decoder probabilities with a threshold before
feeding the bar back as the next prev-bar condition (BASELINE.json:
"decode → binarize"). Elementwise — XLA fuses it into the scan body; no
hand kernel needed (SURVEY §2.3, documented decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binarize_logits(logits: jax.Array, threshold: float = 0.5,
                    pitch_mask: jax.Array | None = None,
                    dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """(sigmoid(logits) > threshold) in {0,1} as ``dtype``, strict >,
    crop-masked.

    Implemented in logit space (sigmoid is monotone): sigmoid(l) > t
    ⟺ l > logit(t), avoiding the transcendental on the hot scan path.
    The generation scan stacks bars as uint8 (binary content — float32
    quadruples HBM for the stacked [B,N,96,128] sweep output and the
    device→host transfer; C5's 1024×64-bar sweep is 3.2GB f32 vs 0.8GB u8).
    """
    logit_t = jnp.log(threshold) - jnp.log1p(-threshold)
    keep = logits > logit_t
    if pitch_mask is not None:
        keep = keep & (pitch_mask > 0)
    return keep.astype(dtype)


def sample_bernoulli_logits(key: jax.Array, logits: jax.Array,
                            temperature: float = 1.0,
                            pitch_mask: jax.Array | None = None,
                            dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Stochastic alternative: Bernoulli(sigmoid(logits/T)) sampling.

    Generation-scan counterpart of binarize_logits (GenSpec.sample_mode
    "bernoulli"); T sharpens (<1) or flattens (>1) the per-cell note
    probabilities before sampling.
    """
    probs = jax.nn.sigmoid(logits / temperature)
    keep = jax.random.bernoulli(key, probs)
    if pitch_mask is not None:
        keep = keep & (pitch_mask > 0)
    return keep.astype(dtype)
