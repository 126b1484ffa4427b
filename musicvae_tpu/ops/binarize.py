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
                    pitch_mask: jax.Array | None = None) -> jax.Array:
    """(sigmoid(logits) > threshold) as float32, strict >, crop-masked.

    Implemented in logit space (sigmoid is monotone): sigmoid(l) > t
    ⟺ l > logit(t), avoiding the transcendental on the hot scan path.
    """
    logit_t = jnp.log(threshold) - jnp.log1p(-threshold)
    bar = (logits > logit_t).astype(jnp.float32)
    if pitch_mask is not None:
        bar = bar * pitch_mask
    return bar


def sample_bernoulli_logits(key: jax.Array, logits: jax.Array,
                            temperature: float = 1.0,
                            pitch_mask: jax.Array | None = None) -> jax.Array:
    """Stochastic alternative: Bernoulli(sigmoid(logits/T)) sampling."""
    probs = jax.nn.sigmoid(logits / temperature)
    bar = jax.random.bernoulli(key, probs).astype(jnp.float32)
    if pitch_mask is not None:
        bar = bar * pitch_mask
    return bar
