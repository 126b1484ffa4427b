"""Pallas fused-ELBO kernel ≡ jnp reference (SURVEY §7.3 hard part #3).

Runs in interpreter mode on the CPU test backend; the identical kernel code
compiles on TPU (exercised by bench.py and the TPU train path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicvae_tpu.ops import losses
from musicvae_tpu.ops.fused_elbo import (fused_elbo, kl_sum_pallas,
                                         masked_bce_sum_pallas)


def _data(b=4, n=2, t=96, p=128, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.key(seed), 4)
    logits = jax.random.normal(k1, (b, n, t, p)) * 3.0
    x = jax.random.bernoulli(k2, 0.1, (b, n, t, p)).astype(jnp.float32)
    mask = ((jnp.arange(p) >= 24) & (jnp.arange(p) < 108)).astype(jnp.float32)
    mu = jax.random.normal(k3, (b, 64))
    logvar = jax.random.normal(k4, (b, 64))
    return logits, x, mask, mu, logvar


def test_bce_forward_matches_reference():
    logits, x, mask, *_ = _data()
    got = masked_bce_sum_pallas(logits, x, mask)
    want = losses.masked_bce_sum(logits, x, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_forward_ragged_rows():
    """Row count not divisible by the tile: padding must contribute zero."""
    logits, x, mask, *_ = _data(b=3, n=1, t=67)
    got = masked_bce_sum_pallas(logits, x, mask)
    want = losses.masked_bce_sum(logits, x, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_grad_matches_autodiff():
    logits, x, mask, *_ = _data()
    g_pallas = jax.grad(lambda l: masked_bce_sum_pallas(l, x, mask))(logits)
    g_ref = jax.grad(lambda l: losses.masked_bce_sum(l, x, mask))(logits)
    np.testing.assert_allclose(g_pallas, g_ref, atol=1e-6)


def test_kl_forward_and_grad_match():
    *_, mu, logvar = _data()
    np.testing.assert_allclose(kl_sum_pallas(mu, logvar),
                               losses.kl_diag_gaussian(mu, logvar), rtol=1e-5)
    for argnum in (0, 1):
        g_p = jax.grad(kl_sum_pallas, argnums=argnum)(mu, logvar)
        g_r = jax.grad(losses.kl_diag_gaussian, argnums=argnum)(mu, logvar)
        np.testing.assert_allclose(g_p, g_r, atol=1e-6)


def test_fused_elbo_matches_elbo_loss_and_grads():
    logits, x, mask, mu, logvar = _data()
    beta = jnp.asarray(0.37)

    def f_pallas(l, m, lv):
        return fused_elbo(l, x, mask, m, lv, beta)[0]

    def f_ref(l, m, lv):
        return losses.elbo_loss(l, x, mask, m, lv, beta)[0]

    np.testing.assert_allclose(f_pallas(logits, mu, logvar),
                               f_ref(logits, mu, logvar), rtol=1e-5)
    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(logits, mu, logvar)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(logits, mu, logvar)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_beta_schedule_linear_and_cyclical():
    import numpy as np
    from musicvae_tpu.ops.losses import beta_schedule

    # linear: hold, ramp, saturate
    assert float(beta_schedule(0, 1.0, 100, hold_steps=10)) == 0.0
    assert float(beta_schedule(10, 1.0, 100, hold_steps=10)) == 0.0
    np.testing.assert_allclose(
        float(beta_schedule(60, 1.0, 100, hold_steps=10)), 0.5)
    assert float(beta_schedule(10_000, 1.0, 100, hold_steps=10)) == 1.0
    # cyclical: ramp repeats every cycle
    for s, want in [(0, 0.0), (50, 0.5), (100, 1.0), (150, 1.0),
                    (200, 0.0), (250, 0.5)]:
        np.testing.assert_allclose(
            float(beta_schedule(s, 1.0, 100, mode="cyclical",
                                cycle_steps=200)), want)
    with pytest.raises(ValueError):
        beta_schedule(0, 1.0, 100, mode="cyclical", cycle_steps=0)
    with pytest.raises(ValueError):
        beta_schedule(0, 1.0, 100, mode="bogus")


def test_fused_elbo_under_jit():
    logits, x, mask, mu, logvar = _data(b=2, n=1)
    f = jax.jit(lambda l: fused_elbo(l, x, mask, mu, logvar, 1.0)[0])
    np.testing.assert_allclose(
        f(logits), losses.elbo_loss(logits, x, mask, mu, logvar, 1.0)[0],
        rtol=1e-5)


def test_recon_prf_metrics():
    from musicvae_tpu.utils.metrics import recon_prf

    x = jnp.zeros((1, 4, 4)).at[0, 0, :2].set(1.0)      # 2 true cells
    r = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0).at[0, 1, 0].set(1.0)
    m = recon_prf(r, x, jnp.ones(4))
    np.testing.assert_allclose(m["precision"], 0.5)      # 1 of 2 predicted
    np.testing.assert_allclose(m["recall"], 0.5)         # 1 of 2 true
    np.testing.assert_allclose(m["f1"], 0.5)
    # an FP at pitch 3 with that column masked out does not count:
    # precision becomes perfect while recall is unchanged
    r2 = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0).at[0, 1, 3].set(1.0)
    m2 = recon_prf(r2, x, jnp.array([1.0, 1.0, 1.0, 0.0]))
    np.testing.assert_allclose(m2["precision"], 1.0)
    np.testing.assert_allclose(m2["recall"], 0.5)


def test_bce_grads_wrt_targets_and_mask():
    """custom VJP must match autodiff for ALL args, not just logits."""
    logits, x, mask, *_ = _data(b=2, n=1)
    for argnum in (1, 2):
        g_p = jax.grad(masked_bce_sum_pallas, argnums=argnum)(logits, x, mask)
        g_r = jax.grad(losses.masked_bce_sum, argnums=argnum)(logits, x, mask)
        np.testing.assert_allclose(g_p, g_r, rtol=1e-5, atol=1e-5)


def test_kl_free_bits_floor_and_passthrough():
    """Free bits: dims below the floor contribute exactly the floor (and
    zero gradient); dims above pass through the true KL unchanged."""
    from musicvae_tpu.ops.losses import kl_diag_gaussian, kl_free_bits

    b, z = 8, 16
    # posterior == prior: true per-dim KL is 0 everywhere, so the
    # objective is exactly free_bits * z (scaled by batch)
    mu = jnp.zeros((b, z))
    lv = jnp.zeros((b, z))
    fb = 0.25
    np.testing.assert_allclose(float(kl_free_bits(mu, lv, fb)) / b, fb * z,
                               rtol=1e-6)
    # grads vanish below the floor (that is the point of free bits)
    g_mu, g_lv = jax.grad(
        lambda m, l: kl_free_bits(m, l, fb), argnums=(0, 1))(mu, lv)
    np.testing.assert_allclose(g_mu, 0.0, atol=0)
    np.testing.assert_allclose(g_lv, 0.0, atol=0)

    # far above the floor: identical to the true KL (and fb=0 always is)
    k1, k2 = jax.random.split(jax.random.key(0))
    mu = jax.random.normal(k1, (b, z)) * 4.0
    lv = jax.random.normal(k2, (b, z))
    np.testing.assert_allclose(float(kl_free_bits(mu, lv, 1e-4)),
                               float(kl_diag_gaussian(mu, lv)), rtol=1e-5)
    np.testing.assert_allclose(float(kl_free_bits(mu, lv, 0.0)),
                               float(kl_diag_gaussian(mu, lv)), rtol=1e-6)


def test_elbo_from_outputs_free_bits_objective():
    """The train objective uses the floored KL; the reported `kl` metric
    stays the true KL (curves comparable across runs with/without it)."""
    from musicvae_tpu.config import C1_CONV_BAR
    from musicvae_tpu.ops.losses import kl_free_bits
    from musicvae_tpu.train.trainer import elbo_from_outputs

    logits, x, _, mu, logvar = _data(b=4, n=1)
    logits, x = logits[:, 0], x[:, 0]
    cfg = C1_CONV_BAR
    fb = 5.0   # far above any dim's mean KL here -> floor binds everywhere
    loss, m = elbo_from_outputs(cfg, logits, x, [(mu, logvar)],
                                beta=jnp.asarray(1.0), free_bits=fb)
    loss0, m0 = elbo_from_outputs(cfg, logits, x, [(mu, logvar)],
                                  beta=jnp.asarray(1.0))
    np.testing.assert_allclose(float(m["kl"]), float(m0["kl"]), rtol=1e-6)
    want = float(m["recon"]) + float(kl_free_bits(mu, logvar, fb)) / 4
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    assert float(loss) > float(loss0)


# --- dual-output forward (round-4, VERDICT r3 weak #2) -----------------------

def test_bce_dual_forward_and_grad_match():
    """The dual kernel's forward sum AND its precomputed-tile VJP match
    the jnp reference — including on ragged row counts."""
    from musicvae_tpu.ops.fused_elbo import masked_bce_sum_pallas_dual

    for t in (96, 67):
        logits, x, mask, *_ = _data(b=3, n=1, t=t)
        got = masked_bce_sum_pallas_dual(logits, x, mask)
        want = losses.masked_bce_sum(logits, x, mask)
        np.testing.assert_allclose(got, want, rtol=1e-5)

        g_dual = jax.grad(
            lambda l: masked_bce_sum_pallas_dual(l, x, mask))(logits)
        g_ref = jax.grad(
            lambda l: losses.masked_bce_sum(l, x, mask))(logits)
        np.testing.assert_allclose(np.asarray(g_dual), np.asarray(g_ref),
                                   atol=1e-6)
        # non-unit upstream cotangent scales the saved tile correctly
        g2 = jax.grad(
            lambda l: 3.5 * masked_bce_sum_pallas_dual(l, x, mask))(logits)
        np.testing.assert_allclose(np.asarray(g2), 3.5 * np.asarray(g_ref),
                                   atol=1e-5)


def test_bce_dual_target_mask_cotangents():
    from musicvae_tpu.ops.fused_elbo import masked_bce_sum_pallas_dual

    logits, x, mask, *_ = _data(b=2, n=1)
    dx_dual = jax.grad(
        lambda xx: masked_bce_sum_pallas_dual(logits, xx, mask))(x)
    dx_ref = jax.grad(
        lambda xx: losses.masked_bce_sum(logits, xx, mask))(x)
    np.testing.assert_allclose(np.asarray(dx_dual), np.asarray(dx_ref),
                               atol=1e-5)
    dm_dual = jax.grad(
        lambda m: masked_bce_sum_pallas_dual(logits, x, m))(mask)
    dm_ref = jax.grad(
        lambda m: losses.masked_bce_sum(logits, x, m))(mask)
    np.testing.assert_allclose(np.asarray(dm_dual), np.asarray(dm_ref),
                               rtol=1e-5)


def test_train_step_pallas_dual_matches_jnp():
    """One full train step with use_pallas_loss=True (which routes the
    differentiated loss through the dual kernel) matches the jnp step's
    loss and updated params."""
    import dataclasses

    from musicvae_tpu.config import C1_CONV_BAR
    from musicvae_tpu.train import create_state, make_train_step

    cfg = C1_CONV_BAR.replace(
        model=dataclasses.replace(
            C1_CONV_BAR.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=8, dtype="float32"),
        train=dataclasses.replace(C1_CONV_BAR.train, batch_size=2))
    model, state0 = create_state(cfg)
    batch = {"x": jax.random.bernoulli(
        jax.random.key(5), 0.1,
        (2, 1, 96, 128)).astype(jnp.float32)}
    s_jnp, m_jnp = make_train_step(cfg, model, use_pallas=False)(state0,
                                                                 batch)
    _, state0b = create_state(cfg)
    s_pal, m_pal = make_train_step(cfg, model, use_pallas=True)(state0b,
                                                                batch)
    np.testing.assert_allclose(float(m_jnp["loss"]), float(m_pal["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_jnp.params),
                    jax.tree.leaves(s_pal.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_bce_dual_bf16_target_cotangent_dtype():
    """custom_vjp requires cotangent dtypes to match the primals: the
    dual kernel must return a bf16 dx for a bf16 x (code-review r4 —
    the first cut hardcoded float32 and only worked because the trainer
    pre-casts)."""
    from musicvae_tpu.ops.fused_elbo import masked_bce_sum_pallas_dual

    logits, x, mask, *_ = _data(b=2, n=1)
    xb = x.astype(jnp.bfloat16)
    dx = jax.grad(
        lambda xx: masked_bce_sum_pallas_dual(logits, xx, mask))(xb)
    assert dx.dtype == jnp.bfloat16
    dx_ref = jax.grad(
        lambda xx: losses.masked_bce_sum(logits, xx, mask))(xb)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_ref, np.float32),
                               rtol=2e-2, atol=1e-2)
