"""Bar-by-bar autoregressive generation + latent interpolation sweeps.

Reference behavior (BASELINE.json, SURVEY §3.3): a host-side Python loop —
per bar: sample z → decode(z, prev bar) → binarize → feed back — one device
round-trip per bar. Rebuild: the whole loop is the scanned BarCell inside
models/vae.py (``PianoRollVAE.generate``), so an entire 64-bar, 1k-sample
sweep (BASELINE config 5) is ONE jitted device program: latent path sampling,
per-bar decode, binarize, and feedback all stay on-TPU.

Latent paths:
- sampled: one z ~ N(0,I) per phrase (phrase = model.num_bars bars), held
  constant within the phrase; the seq-GRU state resets at phrase starts.
- interpolated (C5): z slerps from z_a to z_b across phrases
  (models/latent.slerp).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from musicvae_tpu.config import Config
from musicvae_tpu.midi import tensorize
from musicvae_tpu.models.latent import slerp
from musicvae_tpu.models.vae import PianoRollVAE, build_model


def latent_path(key: jax.Array, cfg: Config, batch: int, num_bars: int,
                interpolate: bool, temperature: float = 1.0,
                z0: Optional[jax.Array] = None,
                z1: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-bar latent path z[B, num_bars, z] and GRU reset mask [B, num_bars].

    Granularity matches training: gru_seq/cond hold one z per phrase
    (phrase = model.num_bars, the per-sequence posterior); hier models draw
    an independent z per bar (the per-bar posterior's prior is N(0,I)) —
    so a hier interpolation sweep slerps the PER-BAR z along the path
    while the phrase z stays a single draw for the whole sweep; that is
    the intended semantic (the phrase latent is the piece's identity, the
    bar latents are the local material being morphed), asserted in
    tests/test_train_e2e.py.
    For ``interpolate`` the path slerps z_a→z_b across phrases; a
    single-phrase sweep uses the slerp midpoint (still a function of both
    endpoints). ``z0`` ([B, z], e.g. an encoded posterior sample from
    `make_encode_fn` — the continuation path) pins the FIRST phrase's z
    (and the slerp start z_a under ``interpolate``); later phrases still
    come from the prior. ``z1`` ([B, z]) pins the slerp END z_b — with
    both endpoints encoded from real pieces the sweep is a MORPH from
    piece A's material to piece B's (the MusicVAE-lineage two-endpoint
    interpolation); requires ``interpolate``. Pure function of the PRNG
    key — safe inside jit.
    """
    z_dim = cfg.model.z_dim
    phrase = 1 if cfg.model.kind == "hier" else max(1, cfg.model.num_bars)
    n_phrases = -(-num_bars // phrase)
    if z1 is not None and not interpolate:
        raise ValueError("z1 pins the slerp endpoint and only makes sense "
                         "with interpolate=True")
    if interpolate:
        k_a, k_b = jax.random.split(key)
        z_a = (z0 if z0 is not None
               else jax.random.normal(k_a, (batch, z_dim)) * temperature)
        z_b = (z1 if z1 is not None
               else jax.random.normal(k_b, (batch, z_dim)) * temperature)
        ts = (jnp.linspace(0.0, 1.0, n_phrases) if n_phrases > 1
              else jnp.array([0.5]))
        # [n_phrases, B, z] → phrase-major path
        z_phrases = jax.vmap(lambda t: slerp(z_a, z_b, t))(ts)
    else:
        z_phrases = jax.random.normal(
            key, (n_phrases, batch, z_dim)) * temperature
        if z0 is not None:
            z_phrases = z_phrases.at[0].set(z0)
    z_bars = jnp.repeat(z_phrases, phrase, axis=0)[:num_bars]    # [N,B,z]
    z_bars = jnp.swapaxes(z_bars, 0, 1)                          # [B,N,z]
    bar_idx = jnp.arange(num_bars)
    # the seq-GRU state resets at phrase starts (model.num_bars cadence
    # regardless of z granularity)
    p = max(1, cfg.model.num_bars)
    reset = jnp.broadcast_to((bar_idx % p == 0).astype(jnp.float32),
                             (batch, num_bars))
    return z_bars, reset


def _sweep_body(cfg: Config, model: PianoRollVAE, mesh=None):
    """The one full-sweep body BOTH generation programs trace (the
    single-request make_generate_fn and the coalesced serve program) —
    shared so the PRNG split order, conditioning defaults, and
    binarization can never drift apart between the two transports
    (their per-key bit-identity is asserted in tests/test_cli.py).

    ``seed_bar`` [B,T,P]: a real bar as the first prev-bar conditioning
    (SURVEY §3.3 'zeros or a real bar'); ``z0`` [B,z] pins the first
    phrase's latent and ``z_phrase0`` [B,z_phrase] the hier phrase
    latent — both typically encoded posterior samples from
    make_encode_fn (continuation from real music rather than the prior).
    Under ``interpolate``, ``z1`` [B,z] pins the slerp END — with both
    endpoints encoded the sweep MORPHS from piece A to piece B; for hier
    models ``z_phrase1`` instead slerps the PHRASE latent (the piece
    identity) bar-by-bar from z_phrase0 to z_phrase1 while the per-bar
    z path keeps its usual granularity. On hier models ``z0``/``z1`` are
    ALSO meaningful: there they pin the endpoints of the PER-BAR z slerp
    (latent_path draws hier bar latents per bar, so the path morphs the
    local MATERIAL rather than the piece identity — the complementary
    knob to z_phrase1; the two compose). Omitted cond chord/key_sig draw
    random classes on device.
    """
    g = cfg.gen
    if g.sample_mode not in ("threshold", "bernoulli"):
        raise ValueError(f"unknown GenSpec.sample_mode {g.sample_mode!r}; "
                         "expected 'threshold' or 'bernoulli'")
    batch, num_bars = g.num_samples, g.num_bars
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from musicvae_tpu.parallel.mesh import DATA_AXIS
        batch_spec = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

    def sweep(params, key, seed_bar=None, chord=None, key_sig=None,
              z0=None, z_phrase0=None, z1=None, z_phrase1=None):
        if z_phrase1 is not None and not (cfg.model.kind == "hier"
                                          and g.interpolate):
            raise ValueError("z_phrase1 morphs the hier phrase latent and "
                             "needs kind='hier' plus interpolate=True")
        k_z, k_c, k_k, k_p, k_bin = jax.random.split(key, 5)
        z_bars, reset = latent_path(k_z, cfg, batch, num_bars,
                                    g.interpolate, g.temperature,
                                    z0=z0, z1=z1)
        if mesh is not None:
            z_bars = jax.lax.with_sharding_constraint(z_bars, batch_spec)
        kw: Dict = {}
        if cfg.model.kind == "cond":
            if chord is None:
                chord = jax.random.randint(
                    k_c, (batch, num_bars), 0, cfg.model.cond_chord_classes)
            if key_sig is None:
                key_sig = jax.random.randint(
                    k_k, (batch,), 0, cfg.model.cond_key_classes)
            kw = {"chord": chord, "key_sig": key_sig}
        z_phrase = None
        if cfg.model.kind == "hier":
            z_phrase = (z_phrase0 if z_phrase0 is not None
                        else jax.random.normal(
                            k_p, (batch, cfg.model.z_phrase_dim))
                        * g.temperature)
            if z_phrase1 is not None:
                # phrase-identity morph: slerp the piece latent bar-by-bar
                # from z_phrase (A) to z_phrase1 (B) — [B,N,z_phrase],
                # consumed per bar by model.generate
                ts = (jnp.linspace(0.0, 1.0, num_bars) if num_bars > 1
                      else jnp.array([0.5]))
                z_phrase = jnp.swapaxes(
                    jax.vmap(lambda t: slerp(z_phrase, z_phrase1, t))(ts),
                    0, 1)
        if g.sample_mode == "bernoulli":
            kw["bin_keys"] = jax.random.split(k_bin, num_bars)
            kw["sample_temperature"] = g.sample_temperature
        _, bars = model.apply({"params": params}, z_bars, reset,
                              seed_bar, **kw, z_phrase=z_phrase,
                              method=model.generate)
        return bars

    return sweep


def make_generate_fn(cfg: Config, model: Optional[PianoRollVAE] = None,
                     mesh=None):
    """Jitted end-to-end sweep: (params, key, *cond) → binarized bars.

    Returns fn(params, key, seed_bar=None, chord=None, key_sig=None,
    z0=None, z_phrase0=None) → bars [num_samples, num_bars, T, P] uint8
    in {0,1} (binary content; uint8 keeps the stacked sweep output and
    its device→host transfer at 1/4 the float32 size — 0.8GB vs 3.2GB
    for the C5 1024×64-bar sweep). Argument semantics: _sweep_body.

    With ``mesh`` the sample axis is sharded over 'data' (the C5 1k-sample
    sweep on a v5e-8 slice); without it the sweep runs single-device.
    """
    model = model or build_model(cfg)
    return jax.jit(_sweep_body(cfg, model, mesh=mesh))


def make_coalesced_generate_fn(cfg: Config,
                               model: Optional[PianoRollVAE] = None,
                               pack: bool = True, mesh=None):
    """Dynamic-batching program for ``serve``: W independent requests —
    each with its OWN PRNG key, seed bar, and conditioning — generated in
    ONE device dispatch. On remote-TPU setups every dispatch pays a fixed
    floor (~25 ms over the axon tunnel), so batching W queued requests
    into one program amortizes that floor W-ways; the vmap also turns W
    small sweeps into one [W*B]-batched sweep, which the MXU tiles better
    than W back-to-back programs.

    Returns fn(params, keys[W], seed_bars[W,B,T,P] u8, chords[W,B,N] i32,
    key_sigs[W,B] i32) → bars [W,B,N,T,P/8] uint8 (1-bit packed along the
    pitch axis when ``pack``, see ops/pack; unpacked [W,B,N,T,P] bars
    otherwise). The signature is deliberately UNIFORM and fully concrete:
    a zeros seed bar is exactly the unseeded default (models/vae.py
    ``generate`` zero-fills the prev-bar carry when seed_bar is None),
    and chords/key_sigs are ignored for non-cond kinds — so seeded,
    conditioned, and plain requests all share one trace and the server
    never recompiles mid-service, whatever the request mix.

    Slot i's output is the SAME music the single-request program
    (make_generate_fn) produces for that key: both programs trace the
    ONE _sweep_body, so the key splits and semantics cannot drift
    (asserted bit-exactly in
    tests/test_cli.py::test_coalesced_generate_matches_single). The
    caller pads short batches to a fixed W (jit specializes on W) and
    discards pad slots.
    """
    model = model or build_model(cfg)
    sweep = _sweep_body(cfg, model)

    def one(params, key, seed_bar, chord, key_sig):
        # the uniform concrete signature: for non-cond kinds the
        # chord/key_sig slots are traced but unused (model.generate
        # ignores them), matching the single path's None
        if cfg.model.kind != "cond":
            chord = key_sig = None
        return sweep(params, key, seed_bar, chord, key_sig)

    batched = jax.vmap(one, in_axes=(None, 0, 0, 0, 0))
    if mesh is not None:
        # mirror the serial program's sharding (samples over 'data'),
        # applied OUTSIDE the vmap on the stacked [W,B,...] output —
        # GSPMD propagates it back through the whole batched sweep, so
        # coalescing keeps the multi-device scaling the serial path has
        from jax.sharding import NamedSharding, PartitionSpec
        from musicvae_tpu.parallel.mesh import DATA_AXIS
        out_spec = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))

    @jax.jit
    def coalesced(params, keys, seed_bars, chords, key_sigs):
        bars = batched(params, keys, seed_bars, chords, key_sigs)
        if mesh is not None:
            bars = jax.lax.with_sharding_constraint(bars, out_spec)
        if pack:
            from musicvae_tpu.ops.pack import pack_bits
            bars = pack_bits(bars)
        return bars

    return coalesced


def make_encode_fn(cfg: Config, model: Optional[PianoRollVAE] = None):
    """Jitted posterior encode for seeded continuation (SURVEY §3.3: the
    generation loop may start from 'a real bar' — this is the '--encode'
    variant that also starts the LATENT path from the seed music).

    Returns fn(params, x, key, chord=None, key_sig=None) → dict with a
    posterior sample per latent level: {"z0": [B, z]} for conv_bar/
    gru_seq/cond, plus {"z_phrase0": [B, z_phrase]} for hier (whose
    per-bar z continues to come from the prior inside the sweep — the
    phrase latent is the piece identity). x: [B, num_bars, T, P].
    """
    model = model or build_model(cfg)
    from musicvae_tpu.models.latent import reparameterize

    @jax.jit
    def encode(params, x, key, chord=None, key_sig=None):
        def run(mdl):
            cond_vec = None
            if cfg.model.kind == "cond":
                cond_vec = mdl.cond_vector(chord, key_sig)
            return mdl.encode(x, cond_vec)

        enc = model.apply({"params": params}, method=run)
        if cfg.model.kind == "hier":
            mu_p, lv_p = enc["phrase"]
            return {"z_phrase0": reparameterize(key, mu_p, lv_p)}
        mu, lv = enc["z"]
        return {"z0": reparameterize(key, mu, lv)}

    return encode


def reconstruct_fn(cfg: Config, model: Optional[PianoRollVAE] = None):
    """Jitted reconstruction: encode → posterior sample → teacher-forced
    decode → binarize (the reference's eval-time reconstruct)."""
    model = model or build_model(cfg)

    @jax.jit
    def reconstruct(params, x, key, chord=None, key_sig=None):
        kw = {}
        if cfg.model.kind == "cond":
            kw = {"chord": chord, "key_sig": key_sig}
        logits, _ = model.apply({"params": params}, x, **kw,
                                rngs={"latent": key})
        from musicvae_tpu.ops.binarize import binarize_logits
        from musicvae_tpu.midi.tensorize import pitch_mask
        return binarize_logits(logits, cfg.midi.binarize_threshold,
                               pitch_mask(cfg.midi))

    return reconstruct


def bars_to_midi(bars, cfg: Config) -> bytes:
    """Host-side export of one generated sample: [N,T,P] → SMF bytes."""
    return tensorize.bars_to_midi_bytes(np.asarray(bars), cfg.midi)
