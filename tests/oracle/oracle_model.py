"""Torch-CPU oracle VAE (SURVEY §0.2/§4.1): the reference-equivalent PyTorch
implementation of the BASELINE behavioral spec, used as

1. the performance denominator ("reference PyTorch-CPU steps/sec",
   BASELINE.md) — a plain torch research-repo training step, and
2. the weight-parity target: checkpoints/torch_convert.py maps this model's
   ``state_dict()`` onto the flax params, and tests assert ELBO parity
   ("ELBO-equivalent reconstructions from the same checkpoints").

Architecture mirrors musicvae_tpu/models exactly (same layer dims, same GRU
equations, same tanh-GELU, same logvar soft-clamp) so parity is meaningful.
Written in idiomatic single-device torch — per-bar Python loops, eager ops —
the way the reference repo class does it (SURVEY §3.2/§3.3).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F

from musicvae_tpu.config import Config, MidiSpec, ModelSpec


def _gelu():
    return nn.GELU(approximate="tanh")   # == flax nn.gelu default


class OracleBarFeat(nn.Module):
    """conv trunk + dense + tanh == models.layers.BarFeat."""

    def __init__(self, spec: ModelSpec, midi: MidiSpec, out_dim: int):
        super().__init__()
        chans = [1, *spec.enc_channels]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 3, stride=2, padding=1)
            for i in range(len(spec.enc_channels)))
        t0 = midi.steps_per_bar // (2 ** len(spec.enc_channels))
        p0 = midi.num_pitches // (2 ** len(spec.enc_channels))
        self.fc = nn.Linear(t0 * p0 * spec.enc_channels[-1], out_dim)
        self.act = _gelu()

    def forward(self, bar: torch.Tensor) -> torch.Tensor:  # [B,T,P]
        h = bar.unsqueeze(1)                               # NCHW
        for c in self.convs:
            h = self.act(c(h))
        # flax flattens NHWC; permute to match its element order
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
        return torch.tanh(self.fc(h))


class OracleTrunk(nn.Module):
    """conv trunk only (C1 encoder) == models.layers.ConvTrunk."""

    def __init__(self, spec: ModelSpec, midi: MidiSpec):
        super().__init__()
        chans = [1, *spec.enc_channels]
        self.convs = nn.ModuleList(
            nn.Conv2d(chans[i], chans[i + 1], 3, stride=2, padding=1)
            for i in range(len(spec.enc_channels)))
        self.act = _gelu()

    def forward(self, bar: torch.Tensor) -> torch.Tensor:
        h = bar.unsqueeze(1)
        for c in self.convs:
            h = self.act(c(h))
        return h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)


class OracleHead(nn.Module):
    """dense → deconv pyramid → [B,T,P] logits == models.layers.BarDecoderHead."""

    def __init__(self, spec: ModelSpec, midi: MidiSpec, in_dim: int):
        super().__init__()
        n_up = len(spec.dec_channels)
        self.t0 = midi.steps_per_bar // (2 ** n_up)
        self.p0 = midi.num_pitches // (2 ** n_up)
        self.c0 = spec.dec_channels[0]
        self.fc = nn.Linear(in_dim, self.t0 * self.p0 * self.c0)
        chans = [*spec.dec_channels, 1]
        # padding=0 + crop-to-2x matches SAME-padded fractionally-strided
        # conv alignment (the flax ConvTranspose in models/layers.py); a
        # torch padding=1/output_padding=1 deconv is offset by one pixel.
        self.deconvs = nn.ModuleList(
            nn.ConvTranspose2d(chans[i], chans[i + 1], 3, stride=2, padding=0)
            for i in range(len(spec.dec_channels)))
        self.act = _gelu()

    def forward(self, v: torch.Tensor) -> torch.Tensor:
        h = self.act(self.fc(v))
        # flax reshapes NHWC: [B, t0, p0, c0] then convs; mirror exactly
        h = h.reshape(-1, self.t0, self.p0, self.c0).permute(0, 3, 1, 2)
        for i, d in enumerate(self.deconvs):
            h = d(h)[:, :, :h.shape[2] * 2, :h.shape[3] * 2]
            if i + 1 < len(self.deconvs):
                h = self.act(h)
        return h.squeeze(1)                                 # [B,T,P]


def _clamp_logvar(lv: torch.Tensor) -> torch.Tensor:
    return 8.0 * torch.tanh(lv / 8.0)


class OracleVAE(nn.Module):
    """All four reference kinds (conv_bar C1, gru_seq C2, hier C3, cond C4);
    teacher-forced ELBO forward, mirroring musicvae_tpu/models exactly."""

    def __init__(self, cfg: Config):
        super().__init__()
        spec, midi = cfg.model, cfg.midi
        self.spec, self.midi = spec, midi
        t0 = midi.steps_per_bar // (2 ** len(spec.enc_channels))
        p0 = midi.num_pitches // (2 ** len(spec.enc_channels))
        flat = t0 * p0 * spec.enc_channels[-1]
        cond_dim = 2 * spec.cond_embed_dim if spec.kind == "cond" else 0
        if spec.kind == "conv_bar":
            self.enc_trunk = OracleTrunk(spec, midi)
            self.z_head = nn.Linear(flat, 2 * spec.z_dim)
            head_in = spec.z_dim + (spec.bar_feat_dim if spec.use_prev_bar
                                    else 0)
            self.head = OracleHead(spec, midi, head_in)
            if spec.use_prev_bar:
                self.prev_feat = OracleBarFeat(spec, midi, spec.bar_feat_dim)
            return
        # GRU family (gru_seq / hier / cond)
        self.enc_feat = OracleBarFeat(spec, midi, spec.bar_feat_dim)
        self.enc_gru = nn.GRUCell(spec.bar_feat_dim + cond_dim,
                                  spec.gru_hidden)
        self.prev_feat = OracleBarFeat(spec, midi, spec.bar_feat_dim)
        self.h_init = nn.Linear(spec.z_dim, spec.gru_hidden)
        self.dec_gru = nn.GRUCell(spec.z_dim + spec.bar_feat_dim + cond_dim,
                                  spec.gru_hidden)
        if spec.kind == "hier":
            self.phrase_head = nn.Linear(spec.gru_hidden,
                                         2 * spec.z_phrase_dim)
            self.bar_head = nn.Linear(spec.bar_feat_dim + spec.z_phrase_dim,
                                      2 * spec.z_dim)
            self.cond_init = nn.Linear(spec.z_phrase_dim, spec.gru_hidden)
            self.conductor = nn.GRUCell(spec.z_phrase_dim, spec.gru_hidden)
            self.head = OracleHead(spec, midi, 2 * spec.gru_hidden)
        else:
            self.z_head = nn.Linear(spec.gru_hidden, 2 * spec.z_dim)
            self.head = OracleHead(spec, midi, spec.gru_hidden + cond_dim)
        if spec.kind == "cond":
            self.chord_emb = nn.Embedding(spec.cond_chord_classes,
                                          spec.cond_embed_dim)
            self.key_emb = nn.Embedding(spec.cond_key_classes,
                                        spec.cond_embed_dim)

    def cond_vector(self, chord, key_sig, n):
        ce = self.chord_emb(chord)                          # [B,N,E]
        ke = self.key_emb(key_sig)[:, None, :].expand(-1, n, -1)
        return torch.cat([ce, ke], dim=-1)

    def _bar_feats(self, x):
        b, n = x.shape[:2]
        return self.enc_feat(x.reshape(b * n, *x.shape[2:])).reshape(b, n, -1)

    def _enc_gru_last(self, f):
        b, n = f.shape[:2]
        h = f.new_zeros(b, self.spec.gru_hidden)
        for t in range(n):
            h = self.enc_gru(f[:, t], h)
        return h

    def encode(self, x, cond_vec=None):
        """conv/gru_seq/cond: (mu, logvar); hier: (mu_p, lv_p, bar_feats)."""
        if self.spec.kind == "conv_bar":
            mu, logvar = self.z_head(self.enc_trunk(x[:, 0])).chunk(2, -1)
            return mu, _clamp_logvar(logvar)
        f = self._bar_feats(x)
        if cond_vec is not None:
            f = torch.cat([f, cond_vec], dim=-1)
        h = self._enc_gru_last(f)
        if self.spec.kind == "hier":
            mu_p, lv_p = self.phrase_head(h).chunk(2, -1)
            return mu_p, _clamp_logvar(lv_p), f
        mu, logvar = self.z_head(h).chunk(2, -1)
        return mu, _clamp_logvar(logvar)

    def decode_teacher_forced(self, z_bars, x, cond_vec=None, z_phrase=None):
        """z_bars: [B,N,z] per-bar latents (broadcast for non-hier)."""
        b, n = x.shape[:2]
        spec = self.spec
        logits: List[torch.Tensor] = []
        if spec.kind == "conv_bar":
            for t in range(n):
                vs = [z_bars[:, t]]
                if spec.use_prev_bar:
                    prev = (torch.zeros_like(x[:, 0]) if t == 0
                            else x[:, t - 1])
                    vs.append(self.prev_feat(prev))
                logits.append(self.head(torch.cat(vs, dim=-1)))
            return torch.stack(logits, dim=1)
        h = hc = None
        for t in range(n):
            z = z_bars[:, t]
            prev = torch.zeros_like(x[:, 0]) if t == 0 else x[:, t - 1]
            feat = self.prev_feat(prev)
            gru_in = [z, feat]
            if spec.kind == "cond":
                gru_in.append(cond_vec[:, t])
            h0 = torch.tanh(self.h_init(z))
            h = h0 if t == 0 else h
            h = self.dec_gru(torch.cat(gru_in, dim=-1), h)
            head_in = [h]
            if spec.kind == "cond":
                head_in.append(cond_vec[:, t])
            if spec.kind == "hier":
                hc = torch.tanh(self.cond_init(z_phrase)) if t == 0 else hc
                hc = self.conductor(z_phrase, hc)
                head_in.append(hc)
            logits.append(self.head(torch.cat(head_in, dim=-1)))
        return torch.stack(logits, dim=1)

    def forward(self, x: torch.Tensor, eps: Optional[torch.Tensor] = None,
                chord: Optional[torch.Tensor] = None,
                key_sig: Optional[torch.Tensor] = None,
                eps_bar: Optional[torch.Tensor] = None):
        """Returns (logits, latents) with latents = [(mu, lv), ...] like the
        flax model (one level, or [phrase, bar] for hier)."""
        b, n = x.shape[:2]
        cond_vec = None
        if self.spec.kind == "cond":
            cond_vec = self.cond_vector(chord, key_sig, n)
        if self.spec.kind == "hier":
            mu_p, lv_p, f = self.encode(x)
            if eps is None:
                eps = torch.randn_like(mu_p)
            z_p = mu_p + eps * torch.exp(0.5 * lv_p)
            zp_b = z_p[:, None, :].expand(-1, n, -1)
            mu_b, lv_b = self.bar_head(
                torch.cat([f, zp_b], dim=-1)).chunk(2, -1)
            lv_b = _clamp_logvar(lv_b)
            if eps_bar is None:
                eps_bar = torch.randn_like(mu_b)
            z_bars = mu_b + eps_bar * torch.exp(0.5 * lv_b)
            logits = self.decode_teacher_forced(z_bars, x, z_phrase=z_p)
            return logits, [(mu_p, lv_p), (mu_b, lv_b)]
        mu, logvar = self.encode(x, cond_vec)
        if eps is None:
            eps = torch.randn_like(mu)
        z = mu + eps * torch.exp(0.5 * logvar)
        z_bars = z[:, None, :].expand(-1, n, -1)
        logits = self.decode_teacher_forced(z_bars, x, cond_vec)
        return logits, [(mu, logvar)]


def oracle_elbo(logits: torch.Tensor, x: torch.Tensor, mask: torch.Tensor,
                latents, beta: float):
    """Same conventions as ops/losses.py (sum-per-sample, batch mean);
    latents: [(mu, logvar), ...], KLs summed over levels."""
    batch = logits.shape[0]
    bce = F.binary_cross_entropy_with_logits(logits, x, reduction="none")
    recon = (bce * mask).sum() / batch
    kl = sum(-0.5 * (1 + lv - mu.pow(2) - lv.exp()).sum()
             for mu, lv in latents) / batch
    return recon + beta * kl, recon, kl


def oracle_train_step(model: OracleVAE, opt: torch.optim.Optimizer,
                      x: torch.Tensor, mask: torch.Tensor,
                      beta: float, **kw) -> float:
    """One reference-style train step (fwd → ELBO → backward → Adam)."""
    opt.zero_grad()
    logits, latents = model(x, **kw)
    loss, _, _ = oracle_elbo(logits, x, mask, latents, beta)
    loss.backward()
    opt.step()
    return float(loss.detach())
