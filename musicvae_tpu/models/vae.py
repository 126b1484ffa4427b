"""The piano-roll VAE family — conv bar-VAE (C1), GRU sequence-VAE (C2),
hierarchical bar→phrase VAE (C3), chord/key-conditional VAE (C4).

One model class handles all four kinds; the architectural switch is the
static ``ModelSpec.kind``. The decode step is a single scanned ``BarCell``
used by BOTH the teacher-forced training path and the closed-loop
generation path (the SURVEY §7.3 "teacher-forcing vs sampling asymmetry"
is resolved by carrying a ``teacher`` gate as data, so the two paths share
one set of parameters and one compiled scan body):

    carry = (h_seq, h_cond, prev_bar)
    prev  = teacher_t * x_{t-1} + (1 - teacher_t) * prev_bar     # gate
    feat  = BarFeat(prev)                                         # conv
    h     = reset_t ? tanh(W z_t) : h_seq ; h = GRU(h, [z_t, feat, cond])
    c     = conductor-GRU step from z_phrase                      # hier only
    logits_t = BarDecoderHead([h | z_t, c, cond])
    prev_bar' = binarize(logits_t)                                # §6

Reference behavior being rebuilt (BASELINE.json): conv/GRU encoder →
reparameterized diagonal-Gaussian latent → decoder; bar-by-bar generation
with prev-bar conditioning → latent sample → decode → binarize. The
reference source was unreadable (SURVEY §0.1); exact layer shapes are this
framework's own TPU-first choices (models/layers.py docstring).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from musicvae_tpu.config import Config, MidiSpec, ModelSpec
from musicvae_tpu.models import layers
from musicvae_tpu.models.latent import reparameterize

Latents = List[Tuple[jax.Array, jax.Array]]   # [(mu, logvar), ...] per level


class BarCell(nn.Module):
    """One decode step over the bar axis (see module docstring)."""

    spec: ModelSpec
    midi: MidiSpec

    @nn.compact
    def __call__(self, carry, xs):
        spec, midi = self.spec, self.midi
        dt = layers._dtype(spec.dtype)
        h_seq, h_cond, prev_bar = carry
        z = xs["z"]                        # [B, z]
        reset = xs["reset"][:, None]       # [B, 1]
        teacher = xs["teacher"][:, None, None]  # [B, 1, 1]

        prev = teacher * xs["teacher_prev"] + (1.0 - teacher) * prev_bar

        head_in = []
        gru_in = [z.astype(dt)]
        if spec.use_prev_bar:
            feat = layers.BarFeat(spec.bar_feat_dim, spec.enc_channels,
                                  spec.dtype, name="prev_feat")(prev)
            gru_in.append(feat)
            if spec.kind == "conv_bar":
                head_in.append(feat)
        if "cond" in xs:                   # chord/key embedding (C4)
            gru_in.append(xs["cond"].astype(dt))
            head_in.append(xs["cond"].astype(dt))

        if spec.kind == "conv_bar":
            head_in.insert(0, z.astype(dt))
            new_h_seq = h_seq
        else:
            h0 = nn.tanh(nn.Dense(spec.gru_hidden, dtype=dt,
                                  param_dtype=jnp.float32,
                                  name="h_init")(z.astype(dt)))
            h = jnp.where(reset > 0, h0, h_seq)
            cell = nn.GRUCell(features=spec.gru_hidden, dtype=dt,
                              param_dtype=jnp.float32, name="seq_gru")
            new_h_seq, out = cell(h, jnp.concatenate(gru_in, axis=-1))
            head_in.insert(0, out)

        if spec.kind == "hier":
            zp = xs["z_phrase"].astype(dt)
            hc0 = nn.tanh(nn.Dense(spec.gru_hidden, dtype=dt,
                                   param_dtype=jnp.float32,
                                   name="cond_init")(zp))
            hc = jnp.where(reset > 0, hc0, h_cond)
            ccell = nn.GRUCell(features=spec.gru_hidden, dtype=dt,
                               param_dtype=jnp.float32, name="conductor")
            new_h_cond, c = ccell(hc, zp)
            head_in.append(c)
        else:
            new_h_cond = h_cond

        logits = layers.BarDecoderHead(
            spec.dec_channels, midi.steps_per_bar, midi.num_pitches,
            spec.dtype, name="head")(jnp.concatenate(head_in, axis=-1))

        # SEMANTICS.md §6: strict >, threshold in logit space, crop-masked.
        thr = midi.binarize_threshold
        logit_t = math.log(thr) - math.log1p(-thr)
        pmask = ((jnp.arange(midi.num_pitches) >= midi.pitch_lo)
                 & (jnp.arange(midi.num_pitches) < midi.pitch_hi))
        bar = (logits > logit_t).astype(jnp.float32) * pmask.astype(jnp.float32)

        return (new_h_seq, new_h_cond, bar), (logits, bar)


class PianoRollVAE(nn.Module):
    """Encoder + reparameterized latent(s) + scanned BarCell decoder."""

    spec: ModelSpec
    midi: MidiSpec
    remat: bool = False

    def setup(self):
        spec = self.spec
        if spec.kind == "conv_bar":
            self.enc_trunk = layers.ConvTrunk(spec.enc_channels, spec.dtype)
            self.z_head = layers.GaussianHead(spec.z_dim, spec.dtype)
        else:
            feat_cls = nn.remat(layers.BarFeat) if self.remat \
                else layers.BarFeat
            self.enc_feat = feat_cls(spec.bar_feat_dim, spec.enc_channels,
                                     spec.dtype)
            self.enc_gru = layers.ScanGRU(spec.gru_hidden, spec.dtype)
            if spec.kind == "hier":
                self.phrase_head = layers.GaussianHead(spec.z_phrase_dim,
                                                       spec.dtype)
                self.bar_head = layers.GaussianHead(spec.z_dim, spec.dtype)
            else:
                self.z_head = layers.GaussianHead(spec.z_dim, spec.dtype)
        if spec.kind == "cond":
            self.chord_emb = nn.Embed(spec.cond_chord_classes,
                                      spec.cond_embed_dim,
                                      param_dtype=jnp.float32)
            self.key_emb = nn.Embed(spec.cond_key_classes,
                                    spec.cond_embed_dim,
                                    param_dtype=jnp.float32)
        self.decoder = nn.scan(
            BarCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )(spec=spec, midi=self.midi, name="bar_cell")

    # ---- pieces ----------------------------------------------------------

    def _bar_feats(self, x: jax.Array) -> jax.Array:
        """[B,N,T,P] → [B,N,F]: fold bars into batch for one big conv."""
        b, n, t, p = x.shape
        f = self.enc_feat(x.reshape(b * n, t, p))
        return f.reshape(b, n, -1)

    def cond_vector(self, chord: jax.Array, key_sig: jax.Array,
                    num_bars: int) -> jax.Array:
        """[B,N] chord ids + [B] key ids → [B,N,2E] conditioning (C4)."""
        ce = self.chord_emb(chord)                              # [B,N,E]
        ke = self.key_emb(key_sig)[:, None, :]                  # [B,1,E]
        ke = jnp.broadcast_to(ke, (*ce.shape[:2], ke.shape[-1]))
        return jnp.concatenate([ce, ke], axis=-1)

    def encode(self, x: jax.Array,
               cond_vec: Optional[jax.Array] = None):
        """Posterior parameters. x: [B,N,T,P]. Returns kind-specific dict."""
        spec = self.spec
        if spec.kind == "conv_bar":
            h = self.enc_trunk(x[:, 0][..., None])
            mu, logvar = self.z_head(h)
            return {"z": (mu, logvar)}
        f = self._bar_feats(x)                                  # [B,N,F]
        if cond_vec is not None:
            f = jnp.concatenate([f, cond_vec], axis=-1)
        hs = self.enc_gru(f)                                    # [B,N,H]
        h_last = hs[:, -1]
        if spec.kind == "hier":
            mu_p, lv_p = self.phrase_head(h_last)
            return {"phrase": (mu_p, lv_p), "bar_feats": f}
        mu, logvar = self.z_head(h_last)
        return {"z": (mu, logvar)}

    def _decode_xs(self, z_bars, reset, teacher, teacher_prev,
                   cond_vec=None, z_phrase=None) -> Dict[str, jax.Array]:
        xs = {"z": z_bars, "reset": reset, "teacher": teacher,
              "teacher_prev": teacher_prev}
        if self.spec.kind == "cond":
            assert cond_vec is not None
            xs["cond"] = cond_vec
        if self.spec.kind == "hier":
            assert z_phrase is not None
            xs["z_phrase"] = z_phrase
        return xs

    def init_carry(self, batch: int,
                   seed_bar: Optional[jax.Array] = None):
        dt = layers._dtype(self.spec.dtype)
        h = jnp.zeros((batch, self.spec.gru_hidden), dt)
        prev = seed_bar if seed_bar is not None else jnp.zeros(
            (batch, self.midi.steps_per_bar, self.midi.num_pitches),
            jnp.float32)
        return (h, h, prev)

    # ---- training forward ------------------------------------------------

    def __call__(self, x: jax.Array,
                 chord: Optional[jax.Array] = None,
                 key_sig: Optional[jax.Array] = None,
                 eps: Optional[Tuple[jax.Array, ...]] = None,
                 ) -> Tuple[jax.Array, Latents]:
        """Teacher-forced ELBO forward. x: [B,N,T,P] → (logits, latents).

        ``eps``: optional externally-supplied N(0,1) draws (one per latent
        level: (eps_z,) or (eps_phrase, eps_bar)) — used by the oracle
        parity tests to share the stochastic node with the torch model.
        When None, noise comes from the 'latent' PRNG stream.
        """
        spec = self.spec
        b, n = x.shape[0], x.shape[1]
        rng = self.make_rng("latent") if eps is None else None

        def _sample(key, mu, logvar, e):
            if e is not None:
                return mu + e * jnp.exp(0.5 * logvar)
            return reparameterize(key, mu, logvar)

        cond_vec = None
        if spec.kind == "cond":
            cond_vec = self.cond_vector(chord, key_sig, n)

        enc = self.encode(x, cond_vec)
        latents: Latents = []
        if spec.kind == "hier":
            k_p, k_b = jax.random.split(rng) if rng is not None else (None,
                                                                      None)
            mu_p, lv_p = enc["phrase"]
            z_phrase = _sample(k_p, mu_p, lv_p,
                               eps[0] if eps is not None else None)
            latents.append((mu_p, lv_p))
            # per-bar posterior conditioned on encoder features + z_phrase
            zp_b = jnp.broadcast_to(z_phrase[:, None, :],
                                    (b, n, z_phrase.shape[-1]))
            mu_b, lv_b = self.bar_head(
                jnp.concatenate([enc["bar_feats"],
                                 zp_b.astype(enc["bar_feats"].dtype)],
                                axis=-1))
            z_bars = _sample(k_b, mu_b, lv_b,                   # [B,N,z]
                             eps[1] if eps is not None else None)
            latents.append((mu_b, lv_b))
            z_phrase_bars = zp_b
        else:
            mu, logvar = enc["z"]
            z = _sample(rng, mu, logvar,
                        eps[0] if eps is not None else None)
            latents.append((mu, logvar))
            z_bars = jnp.broadcast_to(z[:, None, :], (b, n, z.shape[-1]))
            z_phrase_bars = None

        reset = jnp.zeros((b, n), jnp.float32).at[:, 0].set(1.0)
        teacher = jnp.ones((b, n), jnp.float32)
        teacher_prev = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        xs = self._decode_xs(z_bars, reset, teacher, teacher_prev,
                             cond_vec, z_phrase_bars)
        _, (logits, _) = self.decoder(self.init_carry(b), xs)
        return logits, latents

    # ---- closed-loop generation (one scan, no host round-trips) ----------

    def generate(self, z_bars: jax.Array,
                 reset: jax.Array,
                 seed_bar: Optional[jax.Array] = None,
                 chord: Optional[jax.Array] = None,
                 key_sig: Optional[jax.Array] = None,
                 z_phrase: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, jax.Array]:
        """z_bars: [B,N,z] per-bar latent path (sampled or interpolated);
        reset: [B,N] 1.0 where the GRU state re-initializes (phrase starts).
        Returns (logits, bars) with bars binarized per SEMANTICS.md §6."""
        b, n = z_bars.shape[0], z_bars.shape[1]
        cond_vec = None
        if self.spec.kind == "cond":
            cond_vec = self.cond_vector(chord, key_sig, n)
        teacher = jnp.zeros((b, n), jnp.float32)
        teacher_prev = jnp.zeros(
            (b, n, self.midi.steps_per_bar, self.midi.num_pitches),
            jnp.float32)
        zp_bars = None
        if self.spec.kind == "hier":
            assert z_phrase is not None
            zp_bars = jnp.broadcast_to(z_phrase[:, None, :],
                                       (b, n, z_phrase.shape[-1]))
        xs = self._decode_xs(z_bars, reset, teacher, teacher_prev,
                             cond_vec, zp_bars)
        _, (logits, bars) = self.decoder(self.init_carry(b, seed_bar), xs)
        return logits, bars


def build_model(cfg: Config) -> PianoRollVAE:
    return PianoRollVAE(spec=cfg.model, midi=cfg.midi,
                        remat=cfg.train.remat_encoder)


def init_params(cfg: Config, rng: jax.Array):
    """Initialize parameters with a dummy batch (batch=2 keeps init cheap)."""
    model = build_model(cfg)
    x = jnp.zeros((2, cfg.model.num_bars, cfg.midi.steps_per_bar,
                   cfg.midi.num_pitches), jnp.float32)
    kw = {}
    if cfg.model.kind == "cond":
        kw = {"chord": jnp.zeros((2, cfg.model.num_bars), jnp.int32),
              "key_sig": jnp.zeros((2,), jnp.int32)}
    p_rng, l_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "latent": l_rng}, x, **kw)
    return model, variables["params"]
