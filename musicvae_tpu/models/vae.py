"""The piano-roll VAE family — conv bar-VAE (C1), GRU sequence-VAE (C2),
hierarchical bar→phrase VAE (C3), chord/key-conditional VAE (C4).

One model class handles all four kinds; the architectural switch is the
static ``ModelSpec.kind``. All decode-path parameters live in a single
``BarDecoder`` module with two entry points sharing one set of weights
(SURVEY §7.3 "teacher-forcing vs sampling asymmetry"):

- ``teacher(z_bars, x, …)`` — training decode. Teacher forcing makes every
  bar's conv work independent (SURVEY §3.4), so the prev-bar feature
  extractor and the deconv head run as ONE big batched conv over
  [batch × bars]; only the (tiny) GRU recurrences are scanned. This is the
  TPU-first layout: the MXU sees large batched convs, the sequential scan
  carries only [B, hidden] vectors.
- ``step(carry, xs)`` — one closed-loop generation step (scan-lifted):
  prev-bar conditioning → decode → binarize (SEMANTICS.md §6) → feed back.
  Used by ``PianoRollVAE.generate`` as a single on-device ``lax.scan`` with
  no host round-trips (the reference runs this loop on host, one device
  round-trip per bar — BASELINE.json north_star mandates the scan form).

Reference behavior being rebuilt (BASELINE.json): conv/GRU encoder →
reparameterized diagonal-Gaussian latent → decoder; bar-by-bar generation
with prev-bar conditioning → latent sample → decode → binarize. The
reference source was unreadable (SURVEY §0.1); layer shapes are this
framework's own TPU-first choices (models/layers.py docstring).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from musicvae_tpu.config import Config, MidiSpec, ModelSpec
from musicvae_tpu.models import layers
from musicvae_tpu.models.latent import reparameterize

Latents = List[Tuple[jax.Array, jax.Array]]   # [(mu, logvar), ...] per level


class BarDecoder(nn.Module):
    """Decode-path weights + the two decode modes (see module docstring)."""

    spec: ModelSpec
    midi: MidiSpec

    def setup(self):
        spec = self.spec
        dt = layers._dtype(spec.dtype)
        self._dt = dt
        if spec.use_prev_bar:
            self.prev_feat = layers.BarFeat(spec.bar_feat_dim,
                                            spec.enc_channels, spec.dtype,
                                            spec.use_pallas_conv1,
                                            stem=spec.stem,
                                            patch=spec.patch_size)
        if spec.kind != "conv_bar":
            if spec.temporal == "attn":
                self.seq_attn = layers.AttnStack(
                    hidden=spec.gru_hidden, num_layers=spec.attn_layers,
                    heads=spec.attn_heads, max_len=spec.attn_max_bars,
                    causal=True, dtype=spec.dtype)
            else:
                self.h_init = nn.Dense(spec.gru_hidden, dtype=dt,
                                       param_dtype=jnp.float32)
                self.seq_gru = nn.GRUCell(features=spec.gru_hidden,
                                          dtype=dt,
                                          param_dtype=jnp.float32)
        if spec.kind == "hier" and spec.temporal != "attn":
            # the GRU conductor (MusicVAE lineage): z_phrase → per-bar
            # codes via a scanned recurrence. With temporal="attn" there
            # is NO separate conductor — z_phrase joins the attention
            # input per bar and the causal stack plays both roles
            # (position-dependent conductor codes AND the bar-axis
            # temporal core), removing the LAST scan from the 16-bar
            # teacher-forced train step (PALLAS_NOTES round-4 ceiling
            # attribution pins c3_mxu's MFU on these scans).
            self.cond_init = nn.Dense(spec.gru_hidden, dtype=dt,
                                      param_dtype=jnp.float32)
            self.conductor = nn.GRUCell(features=spec.gru_hidden, dtype=dt,
                                        param_dtype=jnp.float32)
        if spec.stem == "patch":
            self.head = layers.PatchHead(
                spec.dec_channels, spec.patch_size,
                self.midi.steps_per_bar, self.midi.num_pitches,
                spec.dtype, spec.logits_dtype)
        else:
            self.head = layers.BarDecoderHead(
                spec.dec_channels, self.midi.steps_per_bar,
                self.midi.num_pitches, spec.dtype, spec.logits_dtype)

    # -- helpers -------------------------------------------------------------

    def _binarize(self, logits: jax.Array) -> jax.Array:
        """SEMANTICS.md §6 via the one canonical implementation. uint8:
        the scan stacks N bars of binary content — see binarize_logits."""
        from musicvae_tpu.midi.tensorize import pitch_mask
        from musicvae_tpu.ops.binarize import binarize_logits
        return binarize_logits(logits, self.midi.binarize_threshold,
                               pitch_mask(self.midi), dtype=jnp.uint8)

    def _recur(self, h, hc, z, reset, gru_in, z_phrase):
        """Shared single-step recurrence (teacher scan AND gen step)."""
        spec = self.spec
        reset = reset[:, None]
        out = c = None
        if spec.kind != "conv_bar":
            h0 = nn.tanh(self.h_init(z.astype(self._dt)))
            h, out = self.seq_gru(jnp.where(reset > 0, h0, h), gru_in)
        if spec.kind == "hier":
            zp = z_phrase.astype(self._dt)
            hc0 = nn.tanh(self.cond_init(zp))
            hc, c = self.conductor(jnp.where(reset > 0, hc0, hc), zp)
        return h, hc, out, c

    def _head_in(self, z, feat, cond, out, c) -> jax.Array:
        """Head-input composition, fixed across both decode modes."""
        if self.spec.kind == "conv_bar":
            parts = [z.astype(self._dt)]
            if feat is not None:
                parts.append(feat)
            if cond is not None:
                parts.append(cond.astype(self._dt))
        else:
            parts = [out]
            if cond is not None:
                parts.append(cond.astype(self._dt))
            if c is not None:
                parts.append(c)
        return jnp.concatenate(parts, axis=-1)

    # -- training decode: bar-parallel convs, scanned GRU only ---------------

    def teacher(self, z_bars: jax.Array, x: jax.Array,
                cond_vec: Optional[jax.Array] = None,
                z_phrase_bars: Optional[jax.Array] = None) -> jax.Array:
        spec = self.spec
        b, n, t, p = x.shape
        teacher_prev = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        feats = None
        if spec.use_prev_bar:
            feats = self.prev_feat(
                teacher_prev.reshape(b * n, t, p)).reshape(b, n, -1)

        out = c = None
        if spec.kind != "conv_bar":
            gru_parts = [z_bars.astype(self._dt)]
            if feats is not None:
                gru_parts.append(feats)
            if spec.kind == "cond" and cond_vec is not None:
                gru_parts.append(cond_vec.astype(self._dt))
            if spec.kind == "hier" and spec.temporal == "attn":
                # hier+attn: z_phrase rides the attention input — the
                # stack IS the conductor (setup's conductor note)
                gru_parts.append(z_phrase_bars.astype(self._dt))
            seq_in = jnp.concatenate(gru_parts, -1)
            if spec.temporal == "attn":
                # the non-recurrent core: every bar at once through
                # batched causal-attention matmuls — NO scan in the
                # train step (AttnStack docstring)
                out = self.seq_attn(seq_in).reshape(b * n, -1)
            else:
                xs = {"z": z_bars, "gru_in": seq_in,
                      "reset": jnp.zeros((b, n)).at[:, 0].set(1.0)}
                if spec.kind == "hier":
                    xs["z_phrase"] = z_phrase_bars
                h = jnp.zeros((b, spec.gru_hidden), self._dt)
                _, (out, c) = self.rnn_step((h, h), xs)
                out = out.reshape(b * n, -1)
                c = c.reshape(b * n, -1) if spec.kind == "hier" else None

        head_in = self._head_in(
            z_bars.reshape(b * n, -1),
            feats.reshape(b * n, -1) if feats is not None else None,
            cond_vec.reshape(b * n, -1) if (spec.kind in ("conv_bar", "cond")
                                            and cond_vec is not None) else None,
            out, c)
        return self.head(head_in).reshape(b, n, t, p)

    # -- scanned bodies (lifted via nn.scan in PianoRollVAE.setup) -----------

    def rnn_step(self, carry, xs):
        """Recurrence-only step for teacher decode (scanned over bars)."""
        h, hc = carry
        h, hc, out, c = self._recur(
            h, hc, xs["z"], xs["reset"], xs["gru_in"],
            xs.get("z_phrase"))
        if out is None:
            out = h
        if c is None:
            c = hc
        return (h, hc), (out, c)

    def step(self, carry, xs):
        """Full closed-loop generation step (scanned over bars).

        Note on phrase boundaries: at reset=1 bars (interior phrase
        starts of a multi-phrase sweep) the GRU state re-initializes but
        ``prev_bar`` deliberately KEEPS the previous phrase's last bar —
        the reference's generation loop chains prev-bar conditioning
        across the whole sweep (BASELINE "prev-bar conditioning → …"),
        and zeroing it would break musical continuity at every phrase
        seam. Training windows never see (reset=1, prev≠0) — bar 0 of a
        window pairs reset with a zero teacher_prev — so interior phrase
        starts are mildly out of the training distribution; this is
        inherent to window-based training + chained generation and the
        reference shares it. Documented rather than 'fixed'.
        """
        spec = self.spec
        h, hc, prev_bar = carry
        z = xs["z"]
        feat = cond = None
        gru_parts = [z.astype(self._dt)]
        if spec.use_prev_bar:
            feat = self.prev_feat(prev_bar)
            gru_parts.append(feat)
        if "cond" in xs:
            cond = xs["cond"]
            if spec.kind == "cond":
                gru_parts.append(cond.astype(self._dt))
        h, hc, out, c = self._recur(h, hc, z, xs["reset"],
                                    jnp.concatenate(gru_parts, -1),
                                    xs.get("z_phrase"))
        logits = self.head(self._head_in(z, feat, cond, out, c))
        bar = self._emit(logits, xs)
        return (h, hc, bar), (logits, bar)

    def _emit(self, logits: jax.Array, xs) -> jax.Array:
        """Logits → binary bar, deterministic or Bernoulli (shared by the
        GRU and attention generation steps)."""
        if "bin_key" in xs:
            # stochastic mode (GenSpec.sample_mode "bernoulli"): per-bar
            # PRNG key rides the scan as raw key data
            from musicvae_tpu.midi.tensorize import pitch_mask
            from musicvae_tpu.ops.binarize import sample_bernoulli_logits
            return sample_bernoulli_logits(
                jax.random.wrap_key_data(xs["bin_key"][0]), logits,
                xs["bin_temp"][0], pitch_mask(self.midi), dtype=jnp.uint8)
        return self._binarize(logits)

    def attn_step(self, carry, xs):
        """Closed-loop generation step for temporal="attn" (scan-lifted,
        the attention analog of ``step``). Carry: (per-layer KV cache,
        pos scalar, segment-start [B], prev bar). A reset=1 bar starts a
        new attention segment (start ← pos) — state isolation across
        phrase seams, exactly like the GRU h0 re-init — while prev_bar
        chains across the seam (see ``step``'s phrase-boundary note)."""
        spec = self.spec
        cache, pos, start, prev_bar = carry
        z = xs["z"]
        feat = cond = None
        parts = [z.astype(self._dt)]
        if spec.use_prev_bar:
            feat = self.prev_feat(prev_bar)
            parts.append(feat)
        if "cond" in xs:
            cond = xs["cond"]
            if spec.kind == "cond":
                parts.append(cond.astype(self._dt))
        if spec.kind == "hier":
            # z_phrase joins the attention input (teacher() hier+attn)
            parts.append(xs["z_phrase"].astype(self._dt))
        start = jnp.where(xs["reset"] > 0, pos, start)
        cache, out = self.seq_attn.step(
            cache, jnp.concatenate(parts, -1), pos, start)
        logits = self.head(self._head_in(z, feat, cond, out, None))
        bar = self._emit(logits, xs)
        return (cache, pos + 1, start, bar), (logits, bar)


class PianoRollVAE(nn.Module):
    """Encoder + reparameterized latent(s) + BarDecoder."""

    spec: ModelSpec
    midi: MidiSpec
    remat: bool = False

    def setup(self):
        spec = self.spec
        if spec.temporal not in ("gru", "attn"):
            raise ValueError(f"unknown ModelSpec.temporal "
                             f"{spec.temporal!r}; expected 'gru' or 'attn'")
        if spec.temporal == "attn" and spec.kind == "conv_bar":
            raise ValueError(
                "temporal='attn' needs a bar-sequence model; "
                "kind='conv_bar' has no temporal core")
        if spec.temporal == "attn" and spec.num_bars > spec.attn_max_bars:
            raise ValueError(
                f"num_bars={spec.num_bars} exceeds attn_max_bars="
                f"{spec.attn_max_bars} (the learned position table)")
        if spec.kind == "conv_bar":
            if spec.stem == "patch":
                self.enc_trunk = layers.PatchTrunk(
                    spec.enc_channels, spec.patch_size, spec.dtype)
            else:
                self.enc_trunk = layers.ConvTrunk(
                    spec.enc_channels, spec.dtype, spec.use_pallas_conv1)
            self.z_head = layers.GaussianHead(spec.z_dim, spec.dtype)
        else:
            feat_cls = nn.remat(layers.BarFeat) if self.remat \
                else layers.BarFeat
            self.enc_feat = feat_cls(spec.bar_feat_dim, spec.enc_channels,
                                     spec.dtype, spec.use_pallas_conv1,
                                     stem=spec.stem, patch=spec.patch_size)
            if spec.temporal == "attn":
                # bidirectional over the window (the encoder sees the
                # whole example; only the decoder is causal)
                self.enc_attn = layers.AttnStack(
                    hidden=spec.gru_hidden, num_layers=spec.attn_layers,
                    heads=spec.attn_heads, max_len=spec.attn_max_bars,
                    causal=False, dtype=spec.dtype)
            else:
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
        # one BarDecoder; 'step' (generation) and 'rnn_step' (teacher
        # recurrence) are scan-lifted over the bar axis, everything else —
        # notably the batched conv head in teacher() — runs unscanned with
        # the SAME parameters.
        self.decoder = nn.scan(
            BarDecoder,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
            methods=["step", "rnn_step", "attn_step"],
        )(spec=spec, midi=self.midi, name="decoder")

    # ---- pieces ----------------------------------------------------------

    def _bar_feats(self, x: jax.Array) -> jax.Array:
        """[B,N,T,P] → [B,N,F]: fold bars into batch for one big conv."""
        b, n, t, p = x.shape
        f = self.enc_feat(x.reshape(b * n, t, p))
        return f.reshape(b, n, -1)

    def cond_vector(self, chord: jax.Array,
                    key_sig: jax.Array) -> jax.Array:
        """[B,N] chord ids + [B] key ids → [B,N,2E] conditioning (C4);
        N comes from chord's shape."""
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
        if spec.temporal == "attn":
            hs = self.enc_attn(f)                               # [B,N,H]
        else:
            hs = self.enc_gru(f)
        # bidirectional attention makes position N-1 see the whole
        # window, so "last hidden" summarizes either way
        h_last = hs[:, -1]
        if spec.kind == "hier":
            mu_p, lv_p = self.phrase_head(h_last)
            return {"phrase": (mu_p, lv_p), "bar_feats": f}
        mu, logvar = self.z_head(h_last)
        return {"z": (mu, logvar)}

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
            cond_vec = self.cond_vector(chord, key_sig)

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

        logits = self.decoder.teacher(z_bars, x, cond_vec, z_phrase_bars)
        return logits, latents

    # ---- closed-loop generation (one scan, no host round-trips) ----------

    def generate(self, z_bars: jax.Array,
                 reset: jax.Array,
                 seed_bar: Optional[jax.Array] = None,
                 chord: Optional[jax.Array] = None,
                 key_sig: Optional[jax.Array] = None,
                 z_phrase: Optional[jax.Array] = None,
                 bin_keys: Optional[jax.Array] = None,
                 sample_temperature: float = 1.0,
                 ) -> Tuple[jax.Array, jax.Array]:
        """z_bars: [B,N,z] per-bar latent path (sampled or interpolated);
        reset: [B,N] 1.0 where the GRU state re-initializes (phrase starts).
        Returns (logits, bars) with bars binarized per SEMANTICS.md §6 —
        or, when ``bin_keys`` ([N] PRNG keys) is given, Bernoulli-sampled
        per cell at ``sample_temperature`` (GenSpec.sample_mode)."""
        spec = self.spec
        b, n = z_bars.shape[0], z_bars.shape[1]
        xs: Dict[str, jax.Array] = {"z": z_bars, "reset": reset}
        if bin_keys is not None:
            xs["bin_key"] = jax.random.key_data(bin_keys)[None]  # [1,N,2]
            xs["bin_temp"] = jnp.full((1, n), sample_temperature,
                                      jnp.float32)
        if spec.kind == "cond":
            xs["cond"] = self.cond_vector(chord, key_sig)
        if spec.kind == "hier":
            assert z_phrase is not None
            # [B,zp] (one piece identity per sweep) or [B,N,zp] (a per-bar
            # phrase path, e.g. a two-endpoint identity morph — sampler
            # _sweep_body z_phrase1)
            if z_phrase.ndim == 3 and z_phrase.shape[:2] != (b, n):
                raise ValueError(
                    f"per-bar z_phrase path has shape {z_phrase.shape}; "
                    f"its leading axes must match (batch, num_bars)="
                    f"({b}, {n}) — a z_phrase1 morph path must supply one "
                    "phrase latent per generated bar")
            xs["z_phrase"] = (z_phrase if z_phrase.ndim == 3
                              else jnp.broadcast_to(
                                  z_phrase[:, None, :],
                                  (b, n, z_phrase.shape[-1])))
        dt = layers._dtype(spec.dtype)
        # prev-bar carry is uint8 (binary content; must match _binarize's
        # output dtype for a well-typed scan carry)
        prev = (seed_bar.astype(jnp.uint8) if seed_bar is not None
                else jnp.zeros((b, self.midi.steps_per_bar,
                                self.midi.num_pitches), jnp.uint8))
        if spec.temporal == "attn":
            if n > spec.attn_max_bars:
                raise ValueError(
                    f"{n}-bar sweep exceeds attn_max_bars="
                    f"{spec.attn_max_bars} (the learned position table); "
                    "raise ModelSpec.attn_max_bars or shorten the sweep")
            cache = layers.attn_cache(b, n, spec.attn_layers,
                                      spec.gru_hidden, dt)
            carry = (cache, jnp.zeros((), jnp.int32),
                     jnp.zeros((b,), jnp.int32), prev)
            _, (logits, bars) = self.decoder.attn_step(carry, xs)
        else:
            h = jnp.zeros((b, spec.gru_hidden), dt)
            _, (logits, bars) = self.decoder.step((h, h, prev), xs)
        return logits, bars


def build_model(cfg: Config) -> PianoRollVAE:
    return PianoRollVAE(spec=cfg.model, midi=cfg.midi,
                        remat=cfg.train.remat_encoder)


def init_params(cfg: Config, rng: jax.Array):
    """Initialize parameters with a dummy batch (batch=2 keeps init cheap).

    Runs on the host CPU backend when the default backend is an
    accelerator: Module.init executes the forward eagerly (one XLA
    program per op), which on a remote-compile TPU backend costs a
    compile round-trip per op for throwaway init work — see
    parallel.mesh.host_init_device. Callers place the returned pytree
    explicitly (pmesh.put_tree / checkpoint restore), so where init ran
    is invisible downstream."""
    import contextlib

    from musicvae_tpu.parallel.mesh import host_init_device
    cpu = host_init_device()
    ctx = (jax.default_device(cpu) if cpu is not None
           else contextlib.nullcontext())
    with ctx:
        if cpu is not None:
            rng = jax.device_put(rng, cpu)   # uncommit from the accelerator
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
