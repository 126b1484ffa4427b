"""Reconstruction-quality metrics (SURVEY §2.1 #10 'periodic eval recon').

Note-level (cell-level) precision/recall/F1 of the binarized reconstruction
against the input roll, plus the ELBO terms — all computed inside jit and
returned as a scalars pytree (no host callbacks, SURVEY §5.5).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def recon_prf(recon_bin: jax.Array, x: jax.Array,
              mask: jax.Array) -> Dict[str, jax.Array]:
    """Cell-level precision/recall/F1 over masked cells. Inputs in {0,1}."""
    m = jnp.broadcast_to(mask, x.shape)
    tp = jnp.sum(recon_bin * x * m)
    fp = jnp.sum(recon_bin * (1.0 - x) * m)
    fn = jnp.sum((1.0 - recon_bin) * x * m)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    return {"precision": precision, "recall": recall, "f1": f1}


def make_eval_fn(cfg, model):
    """Jitted eval: (params, batch, key) → {loss, recon, kl, precision,
    recall, f1}. Uses a posterior sample (one-sample ELBO) and SEMANTICS §6
    binarization for the PRF terms."""
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.ops.binarize import binarize_logits
    from musicvae_tpu.train.trainer import elbo_from_outputs

    mask = pitch_mask(cfg.midi)

    # grad-free path: the Pallas forward kernel is strictly faster here
    # (ops/fused_elbo.py perf note)
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def eval_fn(params, batch, key):
        kw = {}
        if cfg.model.kind == "cond":
            kw = {"chord": batch["chord"], "key_sig": batch["key_sig"]}
        logits, latents = model.apply({"params": params}, batch["x"], **kw,
                                      rngs={"latent": key})
        _, m = elbo_from_outputs(cfg, logits, batch["x"], latents,
                                 jnp.asarray(cfg.train.beta_max),
                                 use_pallas=use_pallas)
        recon_bin = binarize_logits(logits, cfg.midi.binarize_threshold,
                                    mask)
        m.update(recon_prf(recon_bin, batch["x"], mask))
        m.pop("beta", None)
        return m

    return eval_fn
