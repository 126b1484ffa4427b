"""Model-family forward/shape/determinism tests (SURVEY §4.2/§4.5)."""

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from musicvae_tpu.config import (C1_CONV_BAR, C2_GRU_4BAR, C3_HIER_16BAR,
                                 C4_COND)
from musicvae_tpu.models import build_model, init_params

from conftest import cpu_friendly

CONFIGS = {
    "c1": cpu_friendly(C1_CONV_BAR),
    "c2": cpu_friendly(C2_GRU_4BAR),
    "c3": cpu_friendly(C3_HIER_16BAR.replace(
        model=dataclasses.replace(C3_HIER_16BAR.model, num_bars=4))),
    "c4": cpu_friendly(C4_COND),
}


def _dummy_batch(cfg, batch=2):
    x = jax.random.bernoulli(
        jax.random.key(1),
        0.1,
        (batch, cfg.model.num_bars, cfg.midi.steps_per_bar,
         cfg.midi.num_pitches)).astype(jnp.float32)
    kw = {}
    if cfg.model.kind == "cond":
        kw = {"chord": jnp.ones((batch, cfg.model.num_bars), jnp.int32),
              "key_sig": jnp.ones((batch,), jnp.int32)}
    return x, kw


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_forward_shapes(name):
    cfg = CONFIGS[name]
    model, params = init_params(cfg, jax.random.key(0))
    x, kw = _dummy_batch(cfg)
    logits, latents = model.apply(
        {"params": params}, x, **kw, rngs={"latent": jax.random.key(2)})
    assert logits.shape == x.shape
    assert logits.dtype == jnp.float32
    n_levels = 2 if cfg.model.kind == "hier" else 1
    assert len(latents) == n_levels
    mu, logvar = latents[0]
    assert jnp.all(jnp.isfinite(mu)) and jnp.all(jnp.isfinite(logvar))


def test_forward_deterministic_under_fixed_rng():
    cfg = CONFIGS["c2"]
    model, params = init_params(cfg, jax.random.key(0))
    x, kw = _dummy_batch(cfg)
    out1, _ = model.apply({"params": params}, x,
                          rngs={"latent": jax.random.key(7)})
    out2, _ = model.apply({"params": params}, x,
                          rngs={"latent": jax.random.key(7)})
    assert jnp.array_equal(out1, out2)


def test_c1_param_count_about_1m():
    """BASELINE config 1: '~1M params'."""
    _, params = init_params(C1_CONV_BAR, jax.random.key(0))
    n = sum(p.size for p in jax.tree.leaves(params))
    assert 3e5 < n < 3e6, f"C1 param count {n} out of the ~1M band"


def test_generate_shapes_and_binary():
    cfg = CONFIGS["c2"]
    model, params = init_params(cfg, jax.random.key(0))
    b, n = 2, 8
    z = jax.random.normal(jax.random.key(3), (b, n, cfg.model.z_dim))
    reset = jnp.zeros((b, n)).at[:, 0].set(1.0).at[:, 4].set(1.0)
    logits, bars = model.apply({"params": params}, z, reset,
                               method=model.generate)
    assert bars.shape == (b, n, 96, 128)
    assert set(jnp.unique(bars).tolist()) <= {0.0, 1.0}


# --- MXU patch-stem variant (c2_mxu, VERDICT r4 #1) --------------------------

def _tiny_mxu_cfg():
    """c2_mxu shrunk for the CPU test backend — same patch stem/head
    topology (space-to-depth, wide convs, depth-to-space), tiny widths."""
    from musicvae_tpu.config import get_config

    cfg = get_config("c2_mxu")
    return cpu_friendly(cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(8, 8, 16), dec_channels=(16, 8, 8),
            z_dim=8, gru_hidden=16, bar_feat_dim=16)))


def test_space_depth_roundtrip():
    from musicvae_tpu.models.layers import depth_to_space, space_to_depth

    x = jax.random.bernoulli(jax.random.key(0), 0.3,
                             (3, 96, 128)).astype(jnp.float32)
    for pt, pp in [(8, 16), (4, 8), (2, 2)]:
        y = space_to_depth(x, pt, pp)
        assert y.shape == (3, 96 // pt, 128 // pp, pt * pp)
        assert jnp.array_equal(depth_to_space(y, pt, pp), x)


def test_patch_stem_forward_generate_and_grads():
    cfg = _tiny_mxu_cfg()
    model, params = init_params(cfg, jax.random.key(0))
    x, _ = _dummy_batch(cfg)
    logits, latents = model.apply(
        {"params": params}, x, rngs={"latent": jax.random.key(2)})
    assert logits.shape == x.shape
    assert len(latents) == 1

    # the full ELBO fwd+bwd runs and produces finite, nonzero grads
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.ops.losses import elbo_loss

    def loss(p):
        lg, lat = model.apply({"params": p}, x,
                              rngs={"latent": jax.random.key(3)})
        mu, logvar = lat[0]
        l, _ = elbo_loss(lg, x, pitch_mask(cfg.midi), mu, logvar,
                         jnp.float32(1.0))
        return l

    grads = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))
    assert all(float(jnp.abs(g).max()) > 0 for g in jax.tree.leaves(grads))

    # scanned generation (shares the patch head weights with teacher mode)
    z = jax.random.normal(jax.random.key(4), (2, 3, cfg.model.z_dim))
    reset = jnp.zeros((2, 3)).at[:, 0].set(1.0)
    _, bars = model.apply({"params": params}, z, reset,
                          method=model.generate)
    assert bars.shape == (2, 3, 96, 128)
    assert bars.dtype == jnp.uint8
    assert set(np.unique(np.asarray(bars))) <= {0, 1}


def test_patch_stem_torch_convert_rejected():
    """The MXU variant has no torch twin: conversion must fail with a
    clear message, not a KeyError deep in the name mapping."""
    from musicvae_tpu.checkpoints.torch_convert import (
        flax_params_to_torch_state_dict, torch_state_dict_to_flax)

    cfg = _tiny_mxu_cfg()
    _, params = init_params(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="patch stem"):
        flax_params_to_torch_state_dict(params, cfg)
    with pytest.raises(ValueError, match="patch stem"):
        torch_state_dict_to_flax({}, cfg)


def test_patch_stem_hier_forward_and_generate():
    """c3_mxu (hier + patch stem): two latent levels through the patch
    trunk/head, and the scanned conductor generation path."""
    from musicvae_tpu.config import get_config

    cfg = get_config("c3_mxu")
    cfg = cpu_friendly(cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(8, 8, 16), dec_channels=(16, 8, 8),
            z_dim=8, z_phrase_dim=16, gru_hidden=16, bar_feat_dim=16,
            num_bars=4)))
    model, params = init_params(cfg, jax.random.key(0))
    x, _ = _dummy_batch(cfg)
    logits, latents = model.apply(
        {"params": params}, x, rngs={"latent": jax.random.key(2)})
    assert logits.shape == x.shape
    assert len(latents) == 2                      # phrase + bar levels

    z = jax.random.normal(jax.random.key(4), (2, 3, cfg.model.z_dim))
    zp = jax.random.normal(jax.random.key(5), (2, cfg.model.z_phrase_dim))
    reset = jnp.zeros((2, 3)).at[:, 0].set(1.0)
    _, bars = model.apply({"params": params}, z, reset, z_phrase=zp,
                          method=model.generate)
    assert bars.shape == (2, 3, 96, 128)
    assert bars.dtype == jnp.uint8


def test_odd_meter_bars_through_both_stems():
    """Round-5 bar-adapting meters at the model level: 120-step (5/4)
    and 84-step (7/8) bars run forward + generate through BOTH stems —
    the conv head ceil-pad-crops, the patch trunk zero-pads partial
    time patches and the patch head crops (models/layers.py)."""
    from musicvae_tpu.config import get_config, meter_grid

    for meter, base in [((5, 4), "c2_gru_4bar"), ((7, 8), "c2_gru_4bar"),
                        ((5, 4), "c2_mxu"), ((7, 8), "c2_mxu")]:
        cfg = get_config(base)
        mk = dict(z_dim=8, gru_hidden=16, bar_feat_dim=16)
        if cfg.model.stem == "patch":
            mk.update(enc_channels=(8, 8, 16), dec_channels=(16, 8, 8))
        else:
            mk.update(enc_channels=(4, 8, 8, 8, 8),
                      dec_channels=(8, 8, 8, 8, 8))
        cfg = cpu_friendly(cfg.replace(
            midi=dataclasses.replace(cfg.midi, **meter_grid(*meter)),
            model=dataclasses.replace(cfg.model, **mk)))
        spb = cfg.midi.steps_per_bar
        assert spb == {(5, 4): 120, (7, 8): 84}[meter]
        model, params = init_params(cfg, jax.random.key(0))
        x = jax.random.bernoulli(
            jax.random.key(1), 0.1,
            (2, cfg.model.num_bars, spb, 128)).astype(jnp.float32)
        logits, latents = model.apply(
            {"params": params}, x, rngs={"latent": jax.random.key(2)})
        assert logits.shape == x.shape, (meter, base)
        assert jnp.all(jnp.isfinite(logits))

        z = jax.random.normal(jax.random.key(4), (2, 3, cfg.model.z_dim))
        reset = jnp.zeros((2, 3)).at[:, 0].set(1.0)
        _, bars = model.apply({"params": params}, z, reset,
                              method=model.generate)
        assert bars.shape == (2, 3, spb, 128) and bars.dtype == jnp.uint8


def test_patch_stem_cond_forward_and_generate():
    """The patch stem composes with the conditional wrapper (kind='cond'
    + stem='patch'): chord/key embeddings thread through the patch
    trunk/head unchanged."""
    from musicvae_tpu.config import get_config

    cfg = get_config("c2_mxu")
    cfg = cpu_friendly(cfg.replace(
        model=dataclasses.replace(
            cfg.model, kind="cond", enc_channels=(8, 8, 16),
            dec_channels=(16, 8, 8), z_dim=8, gru_hidden=16,
            bar_feat_dim=16)))
    model, params = init_params(cfg, jax.random.key(0))
    x, kw = _dummy_batch(cfg)
    logits, latents = model.apply(
        {"params": params}, x, **kw, rngs={"latent": jax.random.key(2)})
    assert logits.shape == x.shape and len(latents) == 1

    z = jax.random.normal(jax.random.key(4), (2, 3, cfg.model.z_dim))
    reset = jnp.zeros((2, 3)).at[:, 0].set(1.0)
    _, bars = model.apply(
        {"params": params}, z, reset,
        chord=jnp.ones((2, 3), jnp.int32), key_sig=jnp.ones((2,), jnp.int32),
        method=model.generate)
    assert bars.shape == (2, 3, 96, 128) and bars.dtype == jnp.uint8
