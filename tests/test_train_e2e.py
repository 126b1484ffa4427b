"""Minimum end-to-end slice (SURVEY §7.2) + property tests (§4.5):
synthetic MIDI → parse → tensorize → train → ELBO decreases → on-device
scan generation → binarize → MIDI bytes out → re-parse equals roll.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C1_CONV_BAR, C2_GRU_4BAR, GenSpec
from musicvae_tpu.data import PianoRollDataset, synth_corpus
from musicvae_tpu.generate import bars_to_midi, make_generate_fn
from musicvae_tpu.midi import midi_bytes_to_bars
from musicvae_tpu.models import build_model
from musicvae_tpu.train import create_state, make_train_step


def tiny(cfg, **model_kw):
    """Shrink a config for fast CPU tests."""
    model = dataclasses.replace(
        cfg.model, enc_channels=(4, 8, 8, 8, 8), dec_channels=(8, 8, 8, 8, 8),
        z_dim=16, gru_hidden=32, bar_feat_dim=32, dtype="float32", **model_kw)
    train = dataclasses.replace(cfg.train, batch_size=8, learning_rate=2e-3)
    return cfg.replace(model=model, train=train)


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(num_pieces=4, n_bars=8, seed=0)


def _overfit(cfg, corpus, steps=40):
    ds = PianoRollDataset.from_corpus(corpus, cfg.midi, cfg.model.num_bars)
    batch = ds.batch(np.arange(cfg.train.batch_size) % len(ds))
    model, state = create_state(cfg)
    step_fn = make_train_step(cfg, model, use_pallas=False)
    first = None
    metrics = {}
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        if first is None:
            first = float(metrics["loss"])
    return model, state, first, float(metrics["loss"])


def test_c1_overfit_one_batch(corpus):
    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    _, state, first, last = _overfit(cfg, corpus)
    assert last < first * 0.7, f"ELBO did not decrease: {first} -> {last}"
    assert int(state.step) == 40


def test_c2_overfit_one_batch(corpus):
    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    _, _, first, last = _overfit(cfg, corpus, steps=30)
    assert last < first * 0.9, f"ELBO did not decrease: {first} -> {last}"


def test_e2e_generate_to_midi_roundtrip(corpus):
    cfg = tiny(cpu_friendly(C2_GRU_4BAR)).replace(
        gen=GenSpec(num_bars=8, num_samples=2))
    model, state, _, _ = _overfit(cfg, corpus, steps=3)
    gen = make_generate_fn(cfg, model)
    bars = np.asarray(gen(state.params, jax.random.key(0)))
    assert bars.shape == (2, 8, 96, 128)
    # roll → SMF bytes → parse → tensorize must reproduce the roll, up to
    # trailing all-empty bars (SEMANTICS.md §3: T is set by the last note).
    data = bars_to_midi(bars[0], cfg)
    back = np.asarray(midi_bytes_to_bars(data, cfg.midi))
    n = bars[0].shape[0]
    padded = np.zeros_like(bars[0])
    padded[:min(back.shape[0], n)] = back[:n]
    np.testing.assert_array_equal(padded, bars[0])


def test_cropped_config_end_to_end(corpus):
    """Pitch-range crop driven through train → generate → MIDI export:
    generated rolls are zero outside [pitch_lo, pitch_hi) and exported
    notes stay inside the crop (BASELINE north_star 'pitch-range crop')."""
    from musicvae_tpu.config import C2_CROPPED
    from musicvae_tpu.midi import smf

    cfg = tiny(cpu_friendly(C2_CROPPED)).replace(
        gen=GenSpec(num_bars=6, num_samples=2))
    assert (cfg.midi.pitch_lo, cfg.midi.pitch_hi) == (24, 108)
    model, state, first, last = _overfit(cfg, corpus, steps=25)
    assert last < first, "cropped config must still learn"
    gen = make_generate_fn(cfg, model)
    bars = np.asarray(gen(state.params, jax.random.key(1)))
    assert bars.shape == (2, 6, 96, 128)     # rolls stay 128-wide (mask,
    assert bars[..., :24].sum() == 0         # not slice) — out-of-crop
    assert bars[..., 108:].sum() == 0        # cells are forced to zero
    # export respects the crop even if some bars are non-empty
    data = bars_to_midi(bars[0], cfg)
    parsed = smf.parse_smf(data)
    for note in parsed.notes:
        assert 24 <= note.pitch < 108
    # the loss must ignore out-of-crop cells: perturbing logits there
    # cannot change the ELBO
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.ops import losses
    k = jax.random.key(3)
    logits = jax.random.normal(k, (2, 1, 96, 128))
    x = jnp.zeros((2, 1, 96, 128))
    mask = pitch_mask(cfg.midi)
    base = float(losses.masked_bce_sum(logits, x, mask))
    bumped = float(losses.masked_bce_sum(
        logits.at[..., 0].add(100.0).at[..., 120].add(-50.0), x, mask))
    assert base == bumped


def test_generation_bit_deterministic(corpus):
    cfg = tiny(cpu_friendly(C2_GRU_4BAR)).replace(
        gen=GenSpec(num_bars=4, num_samples=2))
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    gen = make_generate_fn(cfg, model)
    a = np.asarray(gen(state.params, jax.random.key(5)))
    b = np.asarray(gen(state.params, jax.random.key(5)))
    np.testing.assert_array_equal(a, b)


def test_scan_equals_manual_barwise_loop(corpus):
    """lax.scan generation ≡ host-loop generation (SURVEY §4.5), using a
    1-bar-phrase GRU model so the GRU state re-initializes each bar and the
    only cross-bar coupling is the binarized prev-bar feedback."""
    cfg = tiny(cpu_friendly(C2_GRU_4BAR), num_bars=1)
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    b, n, zd = 2, 5, cfg.model.z_dim
    z = jax.random.normal(jax.random.key(9), (b, n, zd))
    reset = jnp.ones((b, n))
    _, scanned = model.apply({"params": state.params}, z, reset,
                             method=model.generate)
    prev = None
    for t in range(n):
        _, bar = model.apply({"params": state.params}, z[:, t:t + 1],
                             jnp.ones((b, 1)), prev, method=model.generate)
        np.testing.assert_array_equal(np.asarray(bar[:, 0]),
                                      np.asarray(scanned[:, t]))
        prev = bar[:, 0]


def test_interpolation_path_endpoints():
    from musicvae_tpu.generate import latent_path
    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    z, reset = latent_path(jax.random.key(0), cfg, batch=3, num_bars=16,
                           interpolate=True)
    assert z.shape == (3, 16, cfg.model.z_dim)
    # constant within each 4-bar phrase
    np.testing.assert_array_equal(np.asarray(z[:, 0]), np.asarray(z[:, 3]))
    assert not np.array_equal(np.asarray(z[:, 0]), np.asarray(z[:, 4]))
    np.testing.assert_array_equal(
        np.asarray(reset[0]),
        np.asarray([1, 0, 0, 0] * 4, dtype=np.float32))


def test_multi_step_scan_equals_sequential(corpus):
    """make_train_step_multi(k) scanned on device == k sequential steps."""
    from musicvae_tpu.train import make_train_step_multi

    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    ds = PianoRollDataset.from_corpus(corpus, cfg.midi, cfg.model.num_bars)
    batch = ds.batch(np.arange(cfg.train.batch_size))

    model, s_seq = create_state(cfg)
    step = make_train_step(cfg, model, use_pallas=False)
    for _ in range(4):
        s_seq, m_seq = step(s_seq, batch)

    _, s_multi = create_state(cfg)
    multi = make_train_step_multi(cfg, model, 4, use_pallas=False)
    stacked = jax.tree.map(lambda a: np.broadcast_to(a, (4, *a.shape)),
                           batch)
    s_multi, m_multi = multi(s_multi, stacked)

    assert int(s_multi.step) == int(s_seq.step) == 4
    np.testing.assert_allclose(float(m_seq["loss"]), float(m_multi["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_seq.params)),
                    jax.tree.leaves(jax.device_get(s_multi.params))):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_streaming_prefetch_matches_sequential(corpus):
    """The streaming fallback (iterator data → double-buffered prefetch +
    K-step scan) must compute exactly what K sequential single steps over
    the same host batches compute."""
    from musicvae_tpu.train import train

    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, num_steps=6, log_every=2, ckpt_every=6))
    ds = PianoRollDataset.from_corpus(corpus, cfg.midi, cfg.model.num_bars)

    model, s_ref = create_state(cfg)
    step_fn = make_train_step(cfg, model, use_pallas=False)
    it = ds.iterator(cfg.train.batch_size, seed=5)
    for _ in range(6):
        s_ref, m_ref = step_fn(s_ref, next(it))

    records = []
    _, s_str, m_str = train(cfg, ds.iterator(cfg.train.batch_size, seed=5),
                            log_fn=lambda s, m: records.append(s))
    assert int(s_str.step) == int(s_ref.step) == 6
    assert records == [2, 4, 6]   # log cadence preserved under K-step scan
    np.testing.assert_allclose(float(m_str["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_ref.params)),
                    jax.tree.leaves(jax.device_get(s_str.params))):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # the uint8 fast path (no host float expansion) is bit-identical too:
    # the producer packs (x != 0) either way
    _, s_u8, m_u8 = train(cfg, ds.iterator(cfg.train.batch_size, seed=5,
                                           x_dtype=np.uint8))
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_str["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_str.params)),
                    jax.tree.leaves(jax.device_get(s_u8.params))):
        np.testing.assert_array_equal(a, b)


def test_cond_generation_keys_independent_of_chords():
    """PRNG streams for auto-sampled chord and key_sig must be independent."""
    from musicvae_tpu.config import C4_COND

    cfg = tiny(cpu_friendly(C4_COND)).replace(
        gen=GenSpec(num_bars=4, num_samples=8))
    from musicvae_tpu.models import init_params
    model, params = init_params(cfg, jax.random.key(0))
    gen = make_generate_fn(cfg, model)
    bars = gen(params, jax.random.key(42))
    assert bars.shape == (8, 4, 96, 128)
    # regression for key reuse: chord and key draws came from one key and
    # key_sig equalled chord.ravel()[:batch]; recompute the draws EXACTLY
    # the way generate does (same split arity — keep in sync with
    # sampler._sweep_body, the shared body both generation programs trace)
    import inspect

    from musicvae_tpu.generate import sampler as sampler_mod
    src = inspect.getsource(sampler_mod._sweep_body)
    assert "jax.random.split(key, 5)" in src, (
        "generate's key split changed; update this test's derivation")
    k_z, k_c, k_k, k_p, k_bin = jax.random.split(jax.random.key(42), 5)
    chord = jax.random.randint(k_c, (8, 4), 0, 24)
    key_sig = jax.random.randint(k_k, (8,), 0, 24)
    assert not np.array_equal(np.asarray(key_sig),
                              np.asarray(chord).ravel()[:8])


def test_hier_latent_path_is_per_bar():
    from musicvae_tpu.config import C3_HIER_16BAR
    from musicvae_tpu.generate import latent_path

    cfg = tiny(cpu_friendly(C3_HIER_16BAR), num_bars=4)
    z, reset = latent_path(jax.random.key(1), cfg, batch=2, num_bars=8,
                           interpolate=False)
    # hier draws an independent z per bar (per-bar posterior prior)
    assert not np.array_equal(np.asarray(z[:, 0]), np.asarray(z[:, 1]))
    # but the GRU reset cadence still follows the phrase length
    np.testing.assert_array_equal(np.asarray(reset[0]),
                                  np.asarray([1, 0, 0, 0] * 2, np.float32))


def test_single_phrase_interpolation_uses_both_endpoints():
    """A single-phrase interpolated sweep must decode the slerp MIDPOINT —
    a regression to linspace(0, 1, 1) == [0.0] would silently decode z_a."""
    from musicvae_tpu.generate import latent_path
    from musicvae_tpu.models.latent import slerp

    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    key = jax.random.key(2)
    z, _ = latent_path(key, cfg, batch=2, num_bars=4, interpolate=True)
    # recompute the endpoints exactly the way latent_path draws them
    k_a, k_b = jax.random.split(key)
    z_a = jax.random.normal(k_a, (2, cfg.model.z_dim))
    z_b = jax.random.normal(k_b, (2, cfg.model.z_dim))
    np.testing.assert_allclose(np.asarray(z[:, 0]),
                               np.asarray(slerp(z_a, z_b, 0.5)), atol=1e-5)
    assert not np.allclose(np.asarray(z[:, 0]), np.asarray(z_a), atol=1e-3)
    assert not np.allclose(np.asarray(z[:, 0]), np.asarray(z_b), atol=1e-3)
    # and all bars of the single phrase share that one z
    np.testing.assert_array_equal(np.asarray(z[:, 0]), np.asarray(z[:, 3]))


def test_seed_bar_changes_generation(corpus):
    """SURVEY §3.3: generation seeds prev_bar with 'zeros or a real bar'.
    A real (dense) seed bar must measurably change the FIRST generated
    bar's logits vs the zero seed — the prev-bar conditioning actually
    flows through the feature extractor into the decode."""
    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    b, n, zd = 2, 4, cfg.model.z_dim
    z = jax.random.normal(jax.random.key(11), (b, n, zd))
    reset = jnp.zeros((b, n)).at[:, 0].set(1.0)
    logits0, _ = model.apply({"params": state.params}, z, reset, None,
                             method=model.generate)
    seed = jnp.ones((b, 96, 128), jnp.uint8)
    logits1, _ = model.apply({"params": state.params}, z, reset, seed,
                             method=model.generate)
    # the effect rides feat → GRU gates → head, so it is numerically small
    # on a near-init model (~1e-4 logits); both paths are deterministic,
    # so any difference above float noise proves the conditioning flows
    d = float(jnp.abs(logits0[:, 0] - logits1[:, 0]).max())
    assert d > 1e-6, f"seed bar did not change the first bar's decode ({d})"


def test_latent_path_z0_pins_first_phrase():
    """z0 (an encoded posterior draw) pins phrase 0's z — later phrases
    stay prior draws; under interpolate it becomes the slerp start."""
    from musicvae_tpu.generate import latent_path

    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    z0 = jnp.full((2, cfg.model.z_dim), 0.5)
    z, _ = latent_path(jax.random.key(0), cfg, batch=2, num_bars=8,
                       interpolate=False, z0=z0)
    np.testing.assert_array_equal(np.asarray(z[:, 0]), np.asarray(z0))
    np.testing.assert_array_equal(np.asarray(z[:, 3]), np.asarray(z0))
    assert not np.array_equal(np.asarray(z[:, 4]), np.asarray(z0))
    zi, _ = latent_path(jax.random.key(0), cfg, batch=2, num_bars=8,
                        interpolate=True, z0=z0)
    np.testing.assert_allclose(np.asarray(zi[:, 0]), np.asarray(z0),
                               atol=1e-6)   # slerp t=0 endpoint = z0
    assert not np.allclose(np.asarray(zi[:, 4]), np.asarray(z0))


def test_encode_fn_continuation(corpus):
    """make_encode_fn: posterior draws with the right shapes, deterministic
    in the key, and consumable by the generation sweep (z0/z_phrase0)."""
    from musicvae_tpu.config import C3_HIER_16BAR
    from musicvae_tpu.generate import make_encode_fn

    cfg = tiny(cpu_friendly(C2_GRU_4BAR)).replace(
        gen=GenSpec(num_bars=8, num_samples=2))
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    ds = PianoRollDataset.from_corpus(corpus, cfg.midi, cfg.model.num_bars)
    x = jnp.asarray(ds.batch(np.arange(2))["x"])
    enc = make_encode_fn(cfg, model)
    out = enc(state.params, x, jax.random.key(0))
    assert set(out) == {"z0"} and out["z0"].shape == (2, cfg.model.z_dim)
    np.testing.assert_array_equal(
        np.asarray(out["z0"]),
        np.asarray(enc(state.params, x, jax.random.key(0))["z0"]))
    gen = make_generate_fn(cfg, model)
    bars = np.asarray(gen(state.params, jax.random.key(1), z0=out["z0"]))
    assert bars.shape == (2, 8, 96, 128)
    # the pinned latent changes the sweep vs the pure-prior path
    prior = np.asarray(gen(state.params, jax.random.key(1)))
    assert (bars != prior).any()

    # hier: the encoded level is the phrase latent (bar z stays prior)
    hcfg = tiny(cpu_friendly(C3_HIER_16BAR), num_bars=4).replace(
        gen=GenSpec(num_bars=4, num_samples=2))
    hmodel, hstate, _, _ = _overfit(hcfg, corpus, steps=2)
    hds = PianoRollDataset.from_corpus(corpus, hcfg.midi, 4)
    hx = jnp.asarray(hds.batch(np.arange(2))["x"])
    hout = make_encode_fn(hcfg, hmodel)(hstate.params, hx,
                                        jax.random.key(0))
    assert set(hout) == {"z_phrase0"}
    assert hout["z_phrase0"].shape == (2, hcfg.model.z_phrase_dim)
    hgen = make_generate_fn(hcfg, hmodel)
    hbars = np.asarray(hgen(hstate.params, jax.random.key(1),
                            z_phrase0=hout["z_phrase0"]))
    assert hbars.shape == (2, 4, 96, 128)


def test_hier_interpolation_slerps_per_bar():
    """Documented semantic (latent_path docstring): a hier interpolation
    sweep slerps the PER-BAR z along the path (phrase granularity = 1
    bar) while the phrase z is one draw for the whole sweep — the phrase
    latent is the piece identity, the bar latents are the material being
    morphed."""
    from musicvae_tpu.config import C3_HIER_16BAR
    from musicvae_tpu.generate import latent_path
    from musicvae_tpu.models.latent import slerp

    cfg = tiny(cpu_friendly(C3_HIER_16BAR), num_bars=4)
    key = jax.random.key(7)
    z, reset = latent_path(key, cfg, batch=2, num_bars=8, interpolate=True)
    k_a, k_b = jax.random.split(key)
    z_a = jax.random.normal(k_a, (2, cfg.model.z_dim))
    z_b = jax.random.normal(k_b, (2, cfg.model.z_dim))
    # 8 bars → 8 slerp points from z_a to z_b, one PER BAR
    np.testing.assert_allclose(np.asarray(z[:, 0]), np.asarray(z_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[:, 7]), np.asarray(z_b),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z[:, 3]), np.asarray(slerp(z_a, z_b, 3.0 / 7.0)),
        atol=1e-5)
    # reset cadence still follows the model's phrase length (4 bars)
    np.testing.assert_array_equal(np.asarray(reset[0]),
                                  np.asarray([1, 0, 0, 0] * 2, np.float32))


def test_latent_path_z1_pins_slerp_end():
    """z1 pins the slerp END — with both endpoints encoded from real
    pieces the sweep is a two-endpoint morph (generate --interp-midi-b)."""
    import pytest

    from musicvae_tpu.generate import latent_path

    cfg = tiny(cpu_friendly(C2_GRU_4BAR))
    z0 = jnp.full((2, cfg.model.z_dim), 0.5)
    z1 = jnp.full((2, cfg.model.z_dim), -0.25)
    z, _ = latent_path(jax.random.key(0), cfg, batch=2, num_bars=8,
                       interpolate=True, z0=z0, z1=z1)
    # 8 bars = 2 phrases of 4: phrase 0 is the slerp start (t=0) = z0,
    # phrase 1 the end (t=1) = z1
    np.testing.assert_allclose(np.asarray(z[:, 0]), np.asarray(z0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, 3]), np.asarray(z0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, 4]), np.asarray(z1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, 7]), np.asarray(z1),
                               atol=1e-6)
    # z1 without interpolate is a usage error, not a silent ignore
    with pytest.raises(ValueError, match="interpolate"):
        latent_path(jax.random.key(0), cfg, batch=2, num_bars=8,
                    interpolate=False, z1=z1)


def test_hier_phrase_morph(corpus):
    """z_phrase1: the hier PHRASE identity slerps bar-by-bar from
    z_phrase0 to z_phrase1 (the piece-identity morph) while the per-bar
    z path keeps its usual per-bar granularity."""
    import pytest

    from musicvae_tpu.config import C3_HIER_16BAR

    cfg = tiny(cpu_friendly(C3_HIER_16BAR), num_bars=4).replace(
        gen=GenSpec(num_bars=4, num_samples=2, interpolate=True))
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    gen = make_generate_fn(cfg, model)
    zp0 = jnp.full((2, cfg.model.z_phrase_dim), 2.0)
    zp1 = -zp0
    bars = np.asarray(gen(state.params, jax.random.key(1),
                          z_phrase0=zp0, z_phrase1=zp1))
    assert bars.shape == (2, 4, 96, 128)
    # morphing the identity changes the sweep vs holding it fixed at zp0
    fixed = np.asarray(gen(state.params, jax.random.key(1),
                           z_phrase0=zp0))
    assert (bars != fixed).any()
    # z_phrase1 without interpolate is a usage error
    cfg_ni = cfg.replace(gen=GenSpec(num_bars=4, num_samples=2))
    with pytest.raises(ValueError, match="interpolate"):
        make_generate_fn(cfg_ni, model)(state.params, jax.random.key(1),
                                        z_phrase0=zp0, z_phrase1=zp1)


def test_bernoulli_sample_mode(corpus):
    """GenSpec.sample_mode='bernoulli': deterministic under a fixed key,
    different draws under different keys, distinct from threshold mode,
    and still zero outside the pitch crop."""
    from musicvae_tpu.config import C2_CROPPED

    cfg = tiny(cpu_friendly(C2_CROPPED)).replace(
        gen=GenSpec(num_bars=4, num_samples=2, sample_mode="bernoulli",
                    sample_temperature=2.0))
    model, state, _, _ = _overfit(cfg, corpus, steps=2)
    gen = make_generate_fn(cfg, model)
    a = np.asarray(gen(state.params, jax.random.key(3)))
    b = np.asarray(gen(state.params, jax.random.key(3)))
    c = np.asarray(gen(state.params, jax.random.key(4)))
    np.testing.assert_array_equal(a, b)          # PRNG-keyed, not wall-clock
    assert (a != c).any()                        # actually stochastic
    assert set(np.unique(a)) <= {0, 1}
    assert a[..., :24].sum() == 0 and a[..., 108:].sum() == 0   # crop holds
    thr = np.asarray(make_generate_fn(
        cfg.replace(gen=GenSpec(num_bars=4, num_samples=2))
    , model)(state.params, jax.random.key(3)))
    assert (a != thr).any()                      # mode changes the output


def test_bad_sample_mode_rejected():
    cfg = tiny(cpu_friendly(C2_GRU_4BAR)).replace(
        gen=GenSpec(num_bars=2, num_samples=1, sample_mode="nope"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sample_mode"):
        make_generate_fn(cfg)


def test_transpose_rolls_matches_numpy():
    """ops/augment.transpose_rolls: per-example pitch shift with zero
    fill at the edges, dtype-preserving, exact vs a numpy reference."""
    from musicvae_tpu.ops.augment import transpose_rolls

    rng = np.random.default_rng(0)
    x = (rng.random((5, 2, 8, 16)) < 0.3).astype(np.uint8)
    shifts = np.array([-3, 0, 2, 15, -16], np.int32)

    def ref(x, shifts):
        out = np.zeros_like(x)
        p = x.shape[-1]
        for b, s in enumerate(shifts):
            for q in range(p):
                if 0 <= q - s < p:
                    out[b, ..., q] = x[b, ..., q - s]
        return out

    got = np.asarray(jax.jit(transpose_rolls)(x, shifts))
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(got, ref(x, shifts))
    # float path + identity shift
    xf = x.astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(transpose_rolls(xf, np.zeros(5, np.int32))), xf)


def test_train_step_transpose_aug(corpus):
    """transpose_aug trains (finite loss), actually changes the data the
    step sees (metrics differ from aug=0 on the same state+batch), is
    deterministic per state.rng, and is refused for cond models."""
    from musicvae_tpu.config import C4_COND

    cfg0 = tiny(cpu_friendly(C2_GRU_4BAR))
    cfg2 = cfg0.replace(
        train=dataclasses.replace(cfg0.train, transpose_aug=3))
    ds = PianoRollDataset.from_corpus(corpus, cfg0.midi, cfg0.model.num_bars)
    batch = ds.batch(np.arange(cfg0.train.batch_size) % len(ds))
    # the step donates its state: give each call a fresh (deterministic,
    # seed-identical) state instead of reusing a consumed one
    model, _ = create_state(cfg0)
    _, m0 = make_train_step(cfg0, model, use_pallas=False)(
        create_state(cfg0)[1], batch)
    step_aug = make_train_step(cfg2, model, use_pallas=False)
    _, ma = step_aug(create_state(cfg0)[1], batch)
    _, mb = step_aug(create_state(cfg0)[1], batch)
    assert np.isfinite(float(ma["loss"]))
    assert float(ma["loss"]) == float(mb["loss"])      # deterministic
    assert float(ma["loss"]) != float(m0["loss"])      # data actually moved

    # cond models train under augmentation too (labels rotate with the
    # shift); a non-rotatable label encoding is refused at build time
    cfg_cond = tiny(cpu_friendly(C4_COND))
    cfg_cond = cfg_cond.replace(
        train=dataclasses.replace(cfg_cond.train, transpose_aug=2))
    ds_c = PianoRollDataset.from_corpus(corpus, cfg_cond.midi,
                                        cfg_cond.model.num_bars)
    b = ds_c.batch(np.arange(cfg_cond.train.batch_size) % len(ds_c))
    rng = np.random.default_rng(0)
    b["chord"] = rng.integers(0, 24, b["x"].shape[:2]).astype(np.int32)
    b["key_sig"] = rng.integers(0, 24, (b["x"].shape[0],)).astype(np.int32)
    model_c, state_c = create_state(cfg_cond)
    _, mc = make_train_step(cfg_cond, model_c, use_pallas=False)(state_c, b)
    assert np.isfinite(float(mc["loss"]))

    cfg_bad = cfg_cond.replace(model=dataclasses.replace(
        cfg_cond.model, cond_chord_classes=8))
    with pytest.raises(ValueError, match="cannot be rotated"):
        make_train_step(cfg_bad, build_model(cfg_bad), use_pallas=False)


def test_rotate_chord_classes():
    """root*2+minor classes transpose exactly: root moves mod 12, the
    quality bit survives, negative shifts wrap."""
    from musicvae_tpu.ops.augment import rotate_chord_classes

    classes = np.array([0, 1, 22, 23, 8, 9], np.int32)   # C, Cm, B, Bm...
    got = np.asarray(rotate_chord_classes(classes, np.int32(2)))
    np.testing.assert_array_equal(got, [4, 5, 2, 3, 12, 13])
    got = np.asarray(rotate_chord_classes(classes, np.int32(-3)))
    np.testing.assert_array_equal(got, [18, 19, 16, 17, 2, 3])
    # broadcast: [B,N] chords against [B,1] shifts
    chords = np.array([[0, 2], [4, 6]], np.int32)
    shifts = np.array([[1], [-2]], np.int32)
    got = np.asarray(rotate_chord_classes(chords, shifts))
    np.testing.assert_array_equal(got, [[2, 4], [0, 2]])
    # quality bit is untouched for every class/shift
    all_classes = np.arange(24, dtype=np.int32)
    for s in (-12, -1, 0, 5, 11, 12):
        rot = np.asarray(rotate_chord_classes(all_classes, np.int32(s)))
        np.testing.assert_array_equal(rot % 2, all_classes % 2)
        assert sorted(rot.tolist()) == list(range(24))   # a permutation


def test_lr_schedule_values_and_train_step(corpus):
    """Cosine lr schedule: warmup ramp, peak, decay to lr*min_ratio; and a
    train step built with it runs and still reduces the loss."""
    from musicvae_tpu.train.trainer import make_lr

    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, lr_schedule="cosine", lr_warmup_steps=10,
        lr_min_ratio=0.1, num_steps=100, learning_rate=1e-3))
    sched = make_lr(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # cosine floor at num_steps (and beyond)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10_000)), 1e-4, rtol=1e-5)
    # monotone decay after warmup
    assert float(sched(40)) > float(sched(70)) > float(sched(100))

    _, _, first, last = _overfit(cfg, corpus, steps=30)
    assert last < first, f"loss did not decrease under cosine lr: " \
                         f"{first} -> {last}"

    with pytest.raises(ValueError):
        make_lr(cfg.replace(train=dataclasses.replace(
            cfg.train, lr_schedule="bogus")))


def test_free_bits_train_reports_true_kl(corpus):
    """free_bits > 0: the step runs, the objective includes the floor, and
    the logged kl is the true KL (strictly below the floored objective
    term early in training when beta=0... so compare losses directly)."""
    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    # beta=1 immediately so the KL term is live from step 0
    base = dataclasses.replace(cfg.train, beta_warmup_steps=0, beta_max=1.0)
    cfg_fb = cfg.replace(train=dataclasses.replace(base, free_bits=2.0))
    cfg_0 = cfg.replace(train=base)

    ds = PianoRollDataset.from_corpus(corpus, cfg.midi, cfg.model.num_bars)
    batch = ds.batch(np.arange(cfg.train.batch_size) % len(ds))

    # the jitted step DONATES the state — create_state is deterministic in
    # (cfg, seed), so rebuild an identical state for each variant
    model, state = create_state(cfg_fb)
    m_fb = make_train_step(cfg_fb, model, use_pallas=False)(state, batch)[1]
    model, state = create_state(cfg_0)
    m_0 = make_train_step(cfg_0, model, use_pallas=False)(state, batch)[1]
    # same params/batch/rng: recon and true kl agree; only the loss differs
    # by the floor (z_dim*fb >= floored KL > true KL at init)
    np.testing.assert_allclose(float(m_fb["recon"]), float(m_0["recon"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_fb["kl"]), float(m_0["kl"]),
                               rtol=1e-6)
    assert float(m_fb["loss"]) > float(m_0["loss"])
    assert float(m_fb["loss"]) - float(m_fb["recon"]) <= \
        cfg.model.z_dim * 2.0 + 1e-3


def test_transpose_rolls_exact_for_nonbinary_floats():
    """The one-hot matmul formulation must remain a BIT-EXACT selection
    for arbitrary float values (code-review r4: bf16 input casting would
    round them), not just for binary rolls."""
    from musicvae_tpu.ops.augment import transpose_rolls

    rng = np.random.default_rng(3)
    x = rng.random((4, 1, 6, 128)).astype(np.float32)   # arbitrary values
    shifts = np.array([-5, 0, 1, 12], np.int32)
    got = np.asarray(jax.jit(transpose_rolls)(x, shifts))
    want = np.zeros_like(x)
    for b, s in enumerate(shifts):
        lo, hi = max(0, s), min(128, 128 + s)
        want[b, ..., lo:hi] = x[b, ..., lo - s:hi - s]
    np.testing.assert_array_equal(got, want)   # bit-exact, not allclose
