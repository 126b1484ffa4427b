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
    """Jitted eval: (params, batch, key[, weights]) → {loss, recon, kl,
    precision, recall, f1}. Uses a posterior sample (one-sample ELBO) and
    SEMANTICS §6 binarization for the PRF terms.

    ``weights`` (optional [B] f32, 1.0 = real example, 0.0 = padding):
    per-example weighting so a final partial batch can be padded to the
    jitted batch shape without double-counting the pad windows (cli.py
    cmd_eval's tail batch — means were silently biased on datasets whose
    size is not a batch multiple). None keeps the exact production
    (Pallas-eligible) unweighted path.
    """
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.ops import losses
    from musicvae_tpu.ops.binarize import binarize_logits
    from musicvae_tpu.train.trainer import elbo_from_outputs

    mask = pitch_mask(cfg.midi)

    # grad-free path: the Pallas forward kernel is strictly faster here
    # (ops/fused_elbo.py perf note)
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def eval_fn(params, batch, key, weights=None):
        kw = {}
        if cfg.model.kind == "cond":
            kw = {"chord": batch["chord"], "key_sig": batch["key_sig"]}
        x = batch["x"]
        logits, latents = model.apply({"params": params}, x, **kw,
                                      rngs={"latent": key})
        beta = jnp.asarray(cfg.train.beta_max)
        if weights is None:
            _, m = elbo_from_outputs(cfg, logits, x, latents,
                                     beta, use_pallas=use_pallas)
            prf_mask = mask
        else:
            w = weights.astype(jnp.float32)
            wsum = jnp.sum(w)
            nb = tuple(range(1, logits.ndim))           # non-batch axes
            bce_ex = jnp.sum(losses.bce_with_logits(logits, x) * mask,
                             axis=nb)                   # [B]
            recon = jnp.sum(w * bce_ex) / wsum
            kl = sum(
                jnp.sum(w * (-0.5) * jnp.sum(
                    1.0 + lv - jnp.square(mu) - jnp.exp(lv),
                    axis=tuple(range(1, mu.ndim))))
                for mu, lv in latents) / wsum
            loss = recon + beta * kl
            m = {"loss": loss, "recon": recon, "kl": kl}
            # zero-weight examples drop out of the tp/fp/fn counts too
            prf_mask = mask * w.reshape((-1,) + (1,) * (x.ndim - 1))
        recon_bin = binarize_logits(logits, cfg.midi.binarize_threshold,
                                    mask)
        m.update(recon_prf(recon_bin, x, prf_mask))
        m.pop("beta", None)
        return m

    return eval_fn
