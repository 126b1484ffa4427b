"""Torch state-dict ↔ flax params converter (SURVEY §3.5).

BASELINE parity clause: "ELBO-equivalent reconstructions from the same
checkpoints". The reference's own checkpoints are unreadable (empty mount,
SURVEY §0.1), so per §0.2 the converter is keyed to the torch-CPU oracle's
state-dict naming (tests/oracle/oracle_model.py), which mirrors the
reference architecture class. tests/test_torch_parity.py asserts logit- and
ELBO-level agreement under shared weights.

Weight-layout mappings (verified numerically, see test):
- Conv2d (out,in,kh,kw)            → flax Conv kernel (kh,kw,in,out)
- ConvTranspose2d (in,out,kh,kw)   → flax ConvTranspose(transpose_kernel=True)
                                      kernel (kh,kw,out,in)
- Linear (out,in)                  → Dense kernel (in,out)
- GRUCell weight_ih=[Wr;Wz;Wn], weight_hh=[Ur;Uz;Un], biases b_ih, b_hh →
  flax GRUCell {ir,iz,in,hr,hz,hn}; torch's b_hh_r/b_hh_z fold into the
  input-side biases (both sit inside the same sigmoid); hn keeps b_hh_n.

This module works on host numpy — no torch import needed to LOAD a converted
checkpoint, only to convert one.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from musicvae_tpu.config import Config


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _deconv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])      # (in, out, kh, kw)
    return {"kernel": w.transpose(2, 3, 1, 0),  # (kh, kw, out, in)
            "bias": np.asarray(sd[f"{name}.bias"])}


def _dense(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gru(sd, name):
    w_ih = np.asarray(sd[f"{name}.weight_ih"])
    w_hh = np.asarray(sd[f"{name}.weight_hh"])
    b_ih = np.asarray(sd[f"{name}.bias_ih"])
    b_hh = np.asarray(sd[f"{name}.bias_hh"])
    h = w_hh.shape[1]
    wr, wz, wn = w_ih[:h], w_ih[h:2 * h], w_ih[2 * h:]
    ur, uz, un = w_hh[:h], w_hh[h:2 * h], w_hh[2 * h:]
    return {
        "ir": {"kernel": wr.T, "bias": b_ih[:h] + b_hh[:h]},
        "iz": {"kernel": wz.T, "bias": b_ih[h:2 * h] + b_hh[h:2 * h]},
        "in": {"kernel": wn.T, "bias": b_ih[2 * h:]},
        "hr": {"kernel": ur.T},
        "hz": {"kernel": uz.T},
        "hn": {"kernel": un.T, "bias": b_hh[2 * h:]},
    }


def _trunk(sd, name, n_convs):
    return {f"Conv_{i}": _conv(sd, f"{name}.convs.{i}")
            for i in range(n_convs)}


def _barfeat(sd, name, n_convs):
    return {"ConvTrunk_0": _trunk(sd, name, n_convs),
            "Dense_0": _dense(sd, f"{name}.fc")}


def _head(sd, name, n_deconvs):
    out = {"Dense_0": _dense(sd, f"{name}.fc")}
    for i in range(n_deconvs):
        out[f"ConvTranspose_{i}"] = _deconv(sd, f"{name}.deconvs.{i}")
    return out


def _require_conv_stem(cfg: Config) -> None:
    if cfg.model.stem != "conv":
        raise ValueError(
            f"config {cfg.name!r} uses the MXU patch stem "
            f"(ModelSpec.stem={cfg.model.stem!r}) — a beyond-reference "
            "architecture with no torch twin; checkpoint conversion "
            "applies to the parity configs (stem='conv') only")
    if cfg.model.temporal != "gru":
        raise ValueError(
            f"config {cfg.name!r} uses the attention temporal core "
            f"(ModelSpec.temporal={cfg.model.temporal!r}) — a "
            "beyond-reference architecture with no torch twin; checkpoint "
            "conversion applies to the parity configs (temporal='gru') "
            "only")


def torch_state_dict_to_flax(state_dict: Dict[str, Any],
                             cfg: Config) -> Dict[str, Any]:
    """Oracle (reference-style) torch state_dict → flax params pytree."""
    _require_conv_stem(cfg)
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}
    spec = cfg.model
    ne, nd = len(spec.enc_channels), len(spec.dec_channels)
    if spec.kind == "conv_bar":
        params = {
            "enc_trunk": _trunk(sd, "enc_trunk", ne),
            "z_head": {"Dense_0": _dense(sd, "z_head")},
            "decoder": {"head": _head(sd, "head", nd)},
        }
        if spec.use_prev_bar:
            params["decoder"]["prev_feat"] = _barfeat(sd, "prev_feat", ne)
        return params
    if spec.kind in ("gru_seq", "hier", "cond"):
        params = {
            "enc_feat": _barfeat(sd, "enc_feat", ne),
            "enc_gru": {"GRUCell_0": _gru(sd, "enc_gru")},
            "decoder": {
                "h_init": _dense(sd, "h_init"),
                "seq_gru": _gru(sd, "dec_gru"),
                "head": _head(sd, "head", nd),
            },
        }
        if spec.use_prev_bar:
            # the flax BarDecoder only declares prev_feat when the spec
            # asks for it (models/vae.py setup) — an unconditional subtree
            # would carry dead weights the model never binds
            params["decoder"]["prev_feat"] = _barfeat(sd, "prev_feat", ne)
        if spec.kind == "hier":
            params["phrase_head"] = {"Dense_0": _dense(sd, "phrase_head")}
            params["bar_head"] = {"Dense_0": _dense(sd, "bar_head")}
            params["decoder"]["cond_init"] = _dense(sd, "cond_init")
            params["decoder"]["conductor"] = _gru(sd, "conductor")
        else:
            params["z_head"] = {"Dense_0": _dense(sd, "z_head")}
        if spec.kind == "cond":
            params["chord_emb"] = {
                "embedding": np.asarray(sd["chord_emb.weight"])}
            params["key_emb"] = {
                "embedding": np.asarray(sd["key_emb.weight"])}
        return params
    raise NotImplementedError(spec.kind)


def flax_params_to_torch_state_dict(params: Dict[str, Any],
                                    cfg: Config) -> Dict[str, Any]:
    """Inverse mapping (flax → oracle torch state_dict), for exporting."""
    _require_conv_stem(cfg)
    import torch

    def t(x):
        return torch.tensor(np.asarray(x))

    out: Dict[str, Any] = {}

    def put_conv(name, p):
        out[f"{name}.weight"] = t(np.transpose(p["kernel"], (3, 2, 0, 1)))
        out[f"{name}.bias"] = t(p["bias"])

    def put_deconv(name, p):
        out[f"{name}.weight"] = t(np.transpose(p["kernel"], (3, 2, 0, 1)))
        out[f"{name}.bias"] = t(p["bias"])

    def put_dense(name, p):
        out[f"{name}.weight"] = t(np.asarray(p["kernel"]).T)
        out[f"{name}.bias"] = t(p["bias"])

    def put_trunk(name, p):
        for key, sub in p.items():
            put_conv(f"{name}.convs.{key.split('_')[1]}", sub)

    def put_barfeat(name, p):
        put_trunk(name, p["ConvTrunk_0"])
        put_dense(f"{name}.fc", p["Dense_0"])

    def put_head(name, p):
        put_dense(f"{name}.fc", p["Dense_0"])
        for key, sub in p.items():
            if key.startswith("ConvTranspose_"):
                put_deconv(f"{name}.deconvs.{key.split('_')[1]}", sub)

    def put_gru(name, p):
        h = np.asarray(p["hr"]["kernel"]).shape[0]
        w_ih = np.concatenate([np.asarray(p[k]["kernel"]).T
                               for k in ("ir", "iz", "in")])
        w_hh = np.concatenate([np.asarray(p[k]["kernel"]).T
                               for k in ("hr", "hz", "hn")])
        b_ih = np.concatenate([np.asarray(p["ir"]["bias"]),
                               np.asarray(p["iz"]["bias"]),
                               np.asarray(p["in"]["bias"])])
        b_hh = np.concatenate([np.zeros(h, np.float32), np.zeros(h, np.float32),
                               np.asarray(p["hn"]["bias"])])
        out[f"{name}.weight_ih"] = t(w_ih)
        out[f"{name}.weight_hh"] = t(w_hh)
        out[f"{name}.bias_ih"] = t(b_ih)
        out[f"{name}.bias_hh"] = t(b_hh)

    spec = cfg.model
    if spec.kind == "conv_bar":
        put_trunk("enc_trunk", params["enc_trunk"])
        put_dense("z_head", params["z_head"]["Dense_0"])
        put_head("head", params["decoder"]["head"])
        if spec.use_prev_bar:
            put_barfeat("prev_feat", params["decoder"]["prev_feat"])
    elif spec.kind in ("gru_seq", "hier", "cond"):
        put_barfeat("enc_feat", params["enc_feat"])
        put_gru("enc_gru", params["enc_gru"]["GRUCell_0"])
        put_dense("h_init", params["decoder"]["h_init"])
        if spec.use_prev_bar:
            put_barfeat("prev_feat", params["decoder"]["prev_feat"])
        put_gru("dec_gru", params["decoder"]["seq_gru"])
        put_head("head", params["decoder"]["head"])
        if spec.kind == "hier":
            put_dense("phrase_head", params["phrase_head"]["Dense_0"])
            put_dense("bar_head", params["bar_head"]["Dense_0"])
            put_dense("cond_init", params["decoder"]["cond_init"])
            put_gru("conductor", params["decoder"]["conductor"])
        else:
            put_dense("z_head", params["z_head"]["Dense_0"])
        if spec.kind == "cond":
            out["chord_emb.weight"] = t(params["chord_emb"]["embedding"])
            out["key_emb.weight"] = t(params["key_emb"]["embedding"])
    else:
        raise NotImplementedError(spec.kind)
    return out
