"""Equivalence + gradient tests for the banded-MXU first-conv kernel
(ops/conv1_pallas.py) against the flax nn.Conv layer it replaces.

Runs in Pallas interpreter mode on the CPU test backend (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from musicvae_tpu.ops.conv1_pallas import build_band, first_conv_s2

C = 16


def _ref_layer(dtype=jnp.float32):
    return nn.Conv(C, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                   dtype=dtype, param_dtype=jnp.float32)


def _params(key):
    conv = _ref_layer()
    v = conv.init(key, jnp.zeros((1, 96, 128, 1)))
    w = v["params"]["kernel"][:, :, 0, :]            # [3,3,C]
    b = v["params"]["bias"]
    return conv, v, w, b


def test_forward_matches_flax_conv_f32():
    key = jax.random.key(0)
    conv, v, w, b = _params(key)
    x = (jax.random.uniform(jax.random.key(1), (5, 96, 128)) < 0.1
         ).astype(jnp.float32)
    ref = nn.gelu(conv.apply(v, x[..., None]))
    got = first_conv_s2(x, w, b, gelu=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_matches_flax_conv_bf16():
    key = jax.random.key(2)
    conv, v, w, b = _params(key)
    conv_bf = _ref_layer(jnp.bfloat16)
    x = (jax.random.uniform(jax.random.key(3), (3, 96, 128)) < 0.1
         ).astype(jnp.float32)
    ref = nn.gelu(conv_bf.apply(v, x[..., None])).astype(jnp.float32)
    got = first_conv_s2(x, w, b, gelu=True,
                        out_dtype=jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_band_reconstruction_exact():
    """The banded matrix reproduces every (tap, pitch) weight placement."""
    w = jnp.arange(3 * 3 * C, dtype=jnp.float32).reshape(3, 3, C) + 1
    band = np.asarray(build_band(w))
    for kt in range(3):
        for kp in range(3):
            for j in (0, 1, 31, 63):
                p = 2 * j + kp - 1
                col = j * C
                if 0 <= p < 128:
                    np.testing.assert_array_equal(
                        band[kt, p, col:col + C], np.asarray(w[kt, kp]))
    # pitch edge: (j=0, kp=0) → p=-1 must be absent → column j=0 only has
    # kp∈{1,2} contributions
    assert (band[:, :, :C] != 0).sum() == 3 * 2 * C


def test_grads_match_autodiff_wrt_weights():
    key = jax.random.key(4)
    conv, v, w, b = _params(key)
    x = (jax.random.uniform(jax.random.key(5), (4, 96, 128)) < 0.1
         ).astype(jnp.float32)
    tgt = jax.random.normal(jax.random.key(6), (4, 48, 64, C))

    def loss_pallas(w, b):
        y = first_conv_s2(x, w, b, gelu=True, out_dtype=jnp.float32)
        return jnp.sum((y - tgt) ** 2)

    def loss_ref(w, b):
        vv = {"params": {"kernel": w[:, :, None, :], "bias": b}}
        y = nn.gelu(_ref_layer().apply(vv, x[..., None]))
        return jnp.sum((y - tgt) ** 2)

    gw_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(w, b)
    gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(w, b)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               atol=1e-3, rtol=1e-3)


def test_dx_is_zero_by_contract():
    key = jax.random.key(7)
    _, _, w, b = _params(key)
    x = jax.random.uniform(jax.random.key(8), (2, 96, 128))
    dx = jax.grad(lambda x: jnp.sum(
        first_conv_s2(x, w, b, gelu=False, out_dtype=jnp.float32)))(x)
    assert float(jnp.abs(dx).max()) == 0.0


@pytest.mark.parametrize("m", [1, 7, 8, 9])
def test_ragged_batch_padding(m):
    """M not divisible by the 8-image tile is padded and cropped exactly."""
    key = jax.random.key(9)
    conv, v, w, b = _params(key)
    x = (jax.random.uniform(jax.random.key(10), (m, 96, 128)) < 0.1
         ).astype(jnp.float32)
    ref = nn.gelu(conv.apply(v, x[..., None]))
    got = first_conv_s2(x, w, b, gelu=True, out_dtype=jnp.float32)
    assert got.shape == (m, 48, 64, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_model_flag_checkpoint_compatible():
    """use_pallas_conv1 keeps the param pytree identical and the forward
    equivalent, so checkpoints swap between the two paths freely."""
    import dataclasses

    from musicvae_tpu.config import C2_GRU_4BAR
    from musicvae_tpu.models import init_params
    from musicvae_tpu.models.vae import build_model

    cfg = C2_GRU_4BAR.replace(model=dataclasses.replace(
        C2_GRU_4BAR.model, dtype="float32"))
    cfg_p = cfg.replace(model=dataclasses.replace(
        cfg.model, use_pallas_conv1=True))
    _, params = init_params(cfg, jax.random.key(0))
    model_p = build_model(cfg_p)
    model_x = build_model(cfg)

    x = (jax.random.uniform(jax.random.key(1), (2, 4, 96, 128)) < 0.1
         ).astype(jnp.float32)
    # identical params drive both paths (same pytree structure)
    lg_x, lat_x = model_x.apply({"params": params}, x,
                                rngs={"latent": jax.random.key(2)})
    lg_p, lat_p = model_p.apply({"params": params}, x,
                                rngs={"latent": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_x),
                               atol=5e-4, rtol=5e-4)
