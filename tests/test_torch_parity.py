"""BASELINE parity bar: ELBO-equivalent reconstructions from the same
checkpoints — torch oracle weights → flax via the converter, identical
inputs and noise draws, logits and ELBO must agree (≪ the 1% bar).
Covers all four reference kinds (C1 conv, C2 GRU, C3 hierarchical,
C4 conditional).
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
from musicvae_tpu.config import (C1_CONV_BAR, C2_GRU_4BAR, C3_HIER_16BAR,
                                 C4_COND)
from musicvae_tpu.midi.tensorize import pitch_mask
from musicvae_tpu.models import build_model
from musicvae_tpu.ops import losses
from tests.oracle.oracle_model import OracleVAE, oracle_elbo


def tiny(cfg, num_bars=None):
    m = dataclasses.replace(cfg.model, enc_channels=(4, 8, 8, 8, 8),
                            dec_channels=(8, 8, 8, 8, 8), z_dim=16,
                            z_phrase_dim=24, gru_hidden=32, bar_feat_dim=32,
                            cond_embed_dim=8, dtype="float32",
                            **({"num_bars": num_bars} if num_bars else {}))
    return cpu_friendly(cfg.replace(model=m))


CASES = {
    "c1": tiny(C1_CONV_BAR),
    "c2": tiny(C2_GRU_4BAR),
    "c3": tiny(C3_HIER_16BAR, num_bars=4),
    "c4": tiny(C4_COND),
}


def _parity_case(name, seed=0):
    cfg = CASES[name]
    torch.manual_seed(seed)
    oracle = OracleVAE(cfg)
    flax_params = torch_state_dict_to_flax(oracle.state_dict(), cfg)
    model = build_model(cfg)

    rng = np.random.default_rng(seed)
    b, n = 4, cfg.model.num_bars
    x = (rng.random((b, n, 96, 128)) < 0.05).astype(np.float32)

    t_kw, f_kw = {}, {}
    if cfg.model.kind == "cond":
        chord = rng.integers(0, 24, (b, n)).astype(np.int32)
        key_sig = rng.integers(0, 24, (b,)).astype(np.int32)
        t_kw = {"chord": torch.tensor(chord).long(),
                "key_sig": torch.tensor(key_sig).long()}
        f_kw = {"chord": jnp.asarray(chord), "key_sig": jnp.asarray(key_sig)}
    if cfg.model.kind == "hier":
        eps_p = rng.standard_normal((b, cfg.model.z_phrase_dim)).astype(
            np.float32)
        eps_b = rng.standard_normal((b, n, cfg.model.z_dim)).astype(
            np.float32)
        t_kw["eps_bar"] = torch.tensor(eps_b)
        eps_t = torch.tensor(eps_p)
        eps_f = (jnp.asarray(eps_p), jnp.asarray(eps_b))
    else:
        e = rng.standard_normal((b, cfg.model.z_dim)).astype(np.float32)
        eps_t, eps_f = torch.tensor(e), (jnp.asarray(e),)

    with torch.no_grad():
        logits_t, latents_t = oracle(torch.tensor(x), eps_t, **t_kw)
    logits_f, latents_f = model.apply({"params": flax_params},
                                      jnp.asarray(x), eps=eps_f, **f_kw)
    return cfg, x, np.asarray(logits_f), latents_f, logits_t, latents_t


@pytest.mark.parametrize("name", sorted(CASES))
def test_logits_parity_same_weights(name):
    cfg, x, lf, latents_f, lt, latents_t = _parity_case(name)
    for (mu_f, lv_f), (mu_t, lv_t) in zip(latents_f, latents_t):
        np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(lv_f), lv_t.numpy(), atol=3e-5)
    np.testing.assert_allclose(lf, lt.numpy(), atol=5e-4)


@pytest.mark.parametrize("name", sorted(CASES))
def test_elbo_parity_within_1pct(name):
    cfg, x, lf, latents_f, lt, latents_t = _parity_case(name)
    mask = pitch_mask(cfg.midi)
    batch = lf.shape[0]
    recon = losses.masked_bce_sum(jnp.asarray(lf), jnp.asarray(x),
                                  mask) / batch
    kl = sum(losses.kl_diag_gaussian(mu, lv)
             for mu, lv in latents_f) / batch
    elbo_f = float(recon + kl)
    elbo_t, _, _ = oracle_elbo(lt, torch.tensor(x), torch.ones(128),
                               latents_t, 1.0)
    rel = abs(elbo_f - float(elbo_t)) / abs(float(elbo_t))
    assert rel < 0.01, f"ELBO parity {rel:.2e} exceeds 1%"
    assert rel < 1e-4   # in practice the agreement is numerical-noise level


@pytest.mark.parametrize("name", ["c2", "c3", "c4"])
def test_roundtrip_flax_to_torch_to_flax(name):
    cfg = CASES[name]
    torch.manual_seed(3)
    oracle = OracleVAE(cfg)
    p1 = torch_state_dict_to_flax(oracle.state_dict(), cfg)
    sd = flax_params_to_torch_state_dict(p1, cfg)
    oracle2 = OracleVAE(cfg)
    oracle2.load_state_dict(sd)
    n = cfg.model.num_bars
    x = torch.rand(2, n, 96, 128).round()
    kw = {}
    if cfg.model.kind == "cond":
        kw = {"chord": torch.zeros(2, n).long(),
              "key_sig": torch.zeros(2).long()}
    eps = torch.randn(2, cfg.model.z_phrase_dim if cfg.model.kind == "hier"
                      else cfg.model.z_dim)
    with torch.no_grad():
        a = oracle(x, eps, **kw) if cfg.model.kind != "hier" else None
        b = oracle2(x, eps, **kw) if cfg.model.kind != "hier" else None
        if cfg.model.kind == "hier":
            eb = torch.randn(2, n, cfg.model.z_dim)
            a = oracle(x, eps, eps_bar=eb)
            b = oracle2(x, eps, eps_bar=eb)
    # b_hh_r/b_hh_z fold into input biases: outputs identical, weights not
    np.testing.assert_allclose(a[0].numpy(), b[0].numpy(), atol=1e-5)


def test_convert_no_prev_bar_roundtrip():
    """use_prev_bar=False models declare no prev_feat module; both
    conversion directions must respect that instead of KeyError-ing on
    export / carrying dead weights on import (review finding)."""
    import dataclasses

    from musicvae_tpu.checkpoints.torch_convert import (
        flax_params_to_torch_state_dict, torch_state_dict_to_flax)
    from musicvae_tpu.models import init_params

    cfg = CASES["c2"].replace(model=dataclasses.replace(
        CASES["c2"].model, use_prev_bar=False))
    _, params = init_params(cfg, jax.random.key(0))
    assert "prev_feat" not in params["decoder"]

    sd = flax_params_to_torch_state_dict(params, cfg)     # must not raise
    assert not any("prev_feat" in k for k in sd)
    back = torch_state_dict_to_flax(sd, cfg)
    assert "prev_feat" not in back["decoder"]
    for (pa, a), (pb, b2) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back),
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1e-6)


def test_grad_parity_same_weights_c1():
    """Cross-framework TRAINING parity: d(ELBO)/d(params) agrees between
    the torch oracle and the flax model under converter-shared weights —
    reference checkpoints are not just loadable but trainable with
    equivalent dynamics. Conv config: every weight mapping is an
    invertible transpose/reshape, so the converter maps gradients the
    same way it maps weights (the GRU configs fold torch's redundant
    r/z hidden biases into one flax bias, which is weight-lossless but
    not gradient-invertible — conv is the clean case)."""
    cfg = CASES["c1"]
    torch.manual_seed(0)
    oracle = OracleVAE(cfg)
    flax_params = torch_state_dict_to_flax(oracle.state_dict(), cfg)
    model = build_model(cfg)

    rng = np.random.default_rng(1)
    b = 4
    x = (rng.random((b, 1, 96, 128)) < 0.05).astype(np.float32)
    e = rng.standard_normal((b, cfg.model.z_dim)).astype(np.float32)
    mask = pitch_mask(cfg.midi)
    mask_t = torch.tensor(np.asarray(mask, np.float32))

    logits_t, latents_t = oracle(torch.tensor(x), torch.tensor(e))
    loss_t, _, _ = oracle_elbo(logits_t, torch.tensor(x), mask_t,
                               latents_t, 1.0)
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy()
              for k, p in oracle.named_parameters() if p.grad is not None}

    def loss_f(params):
        logits, latents = model.apply({"params": params}, jnp.asarray(x),
                                      eps=(jnp.asarray(e),))
        recon = losses.masked_bce_sum(logits, jnp.asarray(x), mask) / b
        kl = sum(losses.kl_diag_gaussian(mu, lv)
                 for mu, lv in latents) / b
        return recon + kl

    fgrads = jax.grad(loss_f)(flax_params)
    mapped = flax_params_to_torch_state_dict(fgrads, cfg)

    assert set(mapped) == set(tgrads)
    for name in sorted(tgrads):
        np.testing.assert_allclose(
            mapped[name].numpy() if hasattr(mapped[name], "numpy")
            else np.asarray(mapped[name]),
            tgrads[name], rtol=5e-4, atol=5e-5,
            err_msg=f"gradient mismatch for {name}")
