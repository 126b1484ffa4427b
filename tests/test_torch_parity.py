"""BASELINE parity bar: ELBO-equivalent reconstructions from the same
checkpoints — torch oracle weights → flax via the converter, identical
inputs and noise draws, logits and ELBO must agree (≪ the 1% bar).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conftest import cpu_friendly
from musicvae_tpu.checkpoints.torch_convert import (
    flax_params_to_torch_state_dict, torch_state_dict_to_flax)
from musicvae_tpu.config import C1_CONV_BAR, C2_GRU_4BAR
from musicvae_tpu.midi.tensorize import pitch_mask
from musicvae_tpu.models import build_model
from musicvae_tpu.ops import losses
from tests.oracle.oracle_model import OracleVAE, oracle_elbo


def tiny(cfg):
    m = dataclasses.replace(cfg.model, enc_channels=(4, 8, 8, 8, 8),
                            dec_channels=(8, 8, 8, 8, 8), z_dim=16,
                            gru_hidden=32, bar_feat_dim=32, dtype="float32")
    return cpu_friendly(cfg.replace(model=m))


def _parity_case(cfg, seed=0):
    torch.manual_seed(seed)
    oracle = OracleVAE(cfg)
    flax_params = torch_state_dict_to_flax(oracle.state_dict(), cfg)
    model = build_model(cfg)

    rng = np.random.default_rng(seed)
    b, n = 4, cfg.model.num_bars
    x = (rng.random((b, n, 96, 128)) < 0.05).astype(np.float32)
    eps = rng.standard_normal((b, cfg.model.z_dim)).astype(np.float32)

    with torch.no_grad():
        logits_t, mu_t, lv_t = oracle(torch.tensor(x), torch.tensor(eps))
    logits_f, latents_f = model.apply({"params": flax_params},
                                      jnp.asarray(x),
                                      eps=(jnp.asarray(eps),))
    return (x, np.asarray(logits_f), latents_f,
            logits_t.numpy(), mu_t.numpy(), lv_t.numpy())


@pytest.mark.parametrize("cfg_base", [C1_CONV_BAR, C2_GRU_4BAR],
                         ids=["c1", "c2"])
def test_logits_parity_same_weights(cfg_base):
    cfg = tiny(cfg_base)
    x, lf, latents_f, lt, mu_t, lv_t = _parity_case(cfg)
    mu_f, lv_f = np.asarray(latents_f[0][0]), np.asarray(latents_f[0][1])
    np.testing.assert_allclose(mu_f, mu_t, atol=2e-5)
    np.testing.assert_allclose(lv_f, lv_t, atol=2e-5)
    np.testing.assert_allclose(lf, lt, atol=2e-4)


@pytest.mark.parametrize("cfg_base", [C1_CONV_BAR, C2_GRU_4BAR],
                         ids=["c1", "c2"])
def test_elbo_parity_within_1pct(cfg_base):
    cfg = tiny(cfg_base)
    x, lf, latents_f, lt, mu_t, lv_t = _parity_case(cfg)
    mask = pitch_mask(cfg.midi)
    mu_f, lv_f = latents_f[0]
    elbo_f, _ = losses.elbo_loss(jnp.asarray(lf), jnp.asarray(x), mask,
                                 mu_f, lv_f, 1.0)
    elbo_t, _, _ = oracle_elbo(torch.tensor(lt), torch.tensor(x),
                               torch.ones(128), torch.tensor(mu_t),
                               torch.tensor(lv_t), 1.0)
    rel = abs(float(elbo_f) - float(elbo_t)) / abs(float(elbo_t))
    assert rel < 0.01, f"ELBO parity {rel:.2e} exceeds 1%"
    assert rel < 1e-4   # in practice the agreement is numerical-noise level


def test_roundtrip_flax_to_torch_to_flax():
    cfg = tiny(C2_GRU_4BAR)
    torch.manual_seed(3)
    oracle = OracleVAE(cfg)
    p1 = torch_state_dict_to_flax(oracle.state_dict(), cfg)
    sd = flax_params_to_torch_state_dict(p1, cfg)
    oracle2 = OracleVAE(cfg)
    oracle2.load_state_dict(sd)
    x = torch.rand(2, cfg.model.num_bars, 96, 128).round()
    eps = torch.randn(2, cfg.model.z_dim)
    with torch.no_grad():
        a = oracle(x, eps)[0]
        b = oracle2(x, eps)[0]
    # b_hh_r/b_hh_z fold into input biases: outputs identical, weights not
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-5)
