"""EMA weights (TrainSpec.ema_decay): per-step exponential moving average
of params carried in TrainState, checkpointed, sampled via --ema."""

import dataclasses

import jax
import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C1_CONV_BAR
from musicvae_tpu.data import PianoRollDataset, synth_corpus
from musicvae_tpu.train import create_state, make_train_step


def tiny(cfg, **train_kw):
    model = dataclasses.replace(
        cfg.model, enc_channels=(4, 8, 8, 8, 8), dec_channels=(8, 8, 8, 8, 8),
        z_dim=16, gru_hidden=32, bar_feat_dim=32, dtype="float32")
    train = dataclasses.replace(cfg.train, batch_size=8, **train_kw)
    return cfg.replace(model=model, train=train)


@pytest.fixture(scope="module")
def batch():
    cfg = tiny(cpu_friendly(C1_CONV_BAR))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=2, n_bars=8, seed=0), cfg.midi, 1)
    return ds.batch(np.arange(cfg.train.batch_size) % len(ds))


def test_ema_off_keeps_old_state_structure(batch):
    # None is an empty pytree node: EMA-off states have the exact same
    # leaf set as before the field existed (old checkpoints restore)
    cfg = cpu_friendly(tiny(C1_CONV_BAR))
    model, state = create_state(cfg)
    assert state.ema_params is None
    state, _ = make_train_step(cfg, model, use_pallas=False)(state, batch)
    assert state.ema_params is None


def test_ema_matches_manual_recursion(batch):
    """ema_{t} = d*ema_{t-1} + (1-d)*params_t, started at the init point —
    checked leaf-for-leaf against a manual recomputation over 3 steps."""
    d = 0.5
    cfg = cpu_friendly(tiny(C1_CONV_BAR, ema_decay=d))
    model, state = create_state(cfg)
    assert state.ema_params is not None
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_fn = make_train_step(cfg, model, use_pallas=False)
    manual = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    for _ in range(3):
        state, _ = step_fn(state, batch)
        params = [np.asarray(x) for x in jax.tree.leaves(state.params)]
        manual = [m * d + p * (1 - d) for m, p in zip(manual, params)]
    for got, want in zip(jax.tree.leaves(state.ema_params), manual):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-7)
    # and the average genuinely lags the raw params
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree.leaves(state.ema_params),
                             jax.tree.leaves(state.params))]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip_and_resume(batch, tmp_path):
    """EMA state checkpoints and resumes bit-exactly: 2+2 resumed steps
    produce the same ema as 4 continuous steps."""
    from musicvae_tpu import checkpoints

    cfg = cpu_friendly(tiny(C1_CONV_BAR, ema_decay=0.9))
    model, state = create_state(cfg)
    step_fn = make_train_step(cfg, model, use_pallas=False)
    for _ in range(2):
        state, _ = step_fn(state, batch)
    mgr = checkpoints.make_manager(str(tmp_path / "c"), 1)
    checkpoints.save(mgr, state, cfg, wait=True)

    _, template = create_state(cfg)
    restored, _ = checkpoints.restore(mgr, template)
    for _ in range(2):
        restored, _ = step_fn(restored, batch)

    model, cont = create_state(cfg)
    for _ in range(4):
        cont, _ = step_fn(cont, batch)
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(cont.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_ema_train_generate_and_errors(tmp_path, capsys):
    """train --ema-decay → generate --ema uses the EMA weights; --ema on
    an EMA-less checkpoint is a clean rc-2 error; enabling EMA on resume
    starts the average at the resumed params."""
    from musicvae_tpu.cli import main

    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ema-decay", "0.9",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["generate", "--ckpt-dir", str(tmp_path / "c"),
                 "--bars", "1", "--samples", "1", "--ema",
                 "--out-dir", str(tmp_path / "g")]) == 0
    assert "using EMA weights" in capsys.readouterr().err

    # EMA-less checkpoint: clean in-band error
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    capsys.readouterr()
    rc = main(["generate", "--ckpt-dir", str(tmp_path / "c2"),
               "--bars", "1", "--samples", "1", "--ema",
               "--out-dir", str(tmp_path / "g2")])
    assert rc == 2
    assert "--ema-decay" in capsys.readouterr().err

    # enable EMA on resume: structure aligned, message printed
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--resume", "--steps", "2", "--ema-decay", "0.9",
                 "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    assert "ema enabled on resume" in capsys.readouterr().err


def test_cli_serve_ema(tmp_path, capsys, monkeypatch):
    """serve --ema serves the EMA weights: same-seed responses differ
    from the raw-params service (the averages lag the params after a
    training step), and an EMA-less checkpoint is a clean rc-2 error."""
    import io
    import json

    from musicvae_tpu.cli import main

    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ema-decay", "0.5",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()

    def serve(extra):
        monkeypatch.setattr("sys.stdin",
                            io.StringIO(json.dumps({"id": 0, "seed": 7})
                                        + "\n"))
        assert main(["serve", "--ckpt-dir", str(tmp_path / "c"),
                     "--bars", "2", "--samples", "1"] + extra) == 0
        out_text = capsys.readouterr().out
        return json.loads(out_text.strip().splitlines()[-1])

    raw = serve([])
    ema = serve(["--ema"])
    assert "midi_b64" in raw and "midi_b64" in ema
    # logits differ between raw and averaged weights; densities are the
    # cheap observable (equal-bytes would mean --ema was ignored)
    assert raw["midi_b64"] != ema["midi_b64"] or \
        raw["density"] != ema["density"]

    # EMA-less checkpoint
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    capsys.readouterr()
    rc = main(["serve", "--ckpt-dir", str(tmp_path / "c2"),
               "--bars", "2", "--samples", "1", "--ema"])
    assert rc == 2
    assert "--ema-decay" in capsys.readouterr().err


def test_eval_reports_ema_metrics(tmp_path):
    """With EMA on and in-training eval enabled, every eval sweep also
    scores the EMA weights under eval_ema_* keys (raw eval_loss still
    drives best-checkpoint selection)."""
    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, ema_decay=0.9, num_steps=4,
                            log_every=2, ckpt_every=4, eval_every=2,
                            eval_batches=1))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=4, n_bars=6, seed=1), cfg.midi, 1)
    tr, ev = ds.split(0.3, seed=0)
    logged = {}
    train(cfg, tr, eval_data=ev,
          log_fn=lambda s, m: logged.setdefault(s, {}).update(m))
    evals = [m for m in logged.values() if "eval_loss" in m]
    assert evals, logged
    for m in evals:
        assert "eval_ema_loss" in m and "eval_ema_f1" in m
        # both are real numbers from the same sweep
        assert np.isfinite(m["eval_ema_loss"])


def test_cli_convert_exports_ema(tmp_path, capsys):
    """convert --to-torch --ema exports the averaged weights (differ from
    the raw export after training); --ema without EMA in the checkpoint
    is rc 2."""
    import torch

    from musicvae_tpu.cli import main

    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ema-decay", "0.5",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    raw_pt, ema_pt = str(tmp_path / "raw.pt"), str(tmp_path / "ema.pt")
    assert main(["convert", "--to-torch", str(tmp_path / "c"),
                 "--out", raw_pt]) == 0
    assert main(["convert", "--to-torch", str(tmp_path / "c"),
                 "--out", ema_pt, "--ema"]) == 0
    raw = torch.load(raw_pt, weights_only=True)
    ema = torch.load(ema_pt, weights_only=True)
    assert set(raw) == set(ema)
    assert any(not torch.equal(raw[k], ema[k]) for k in raw)

    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    capsys.readouterr()
    rc = main(["convert", "--to-torch", str(tmp_path / "c2"),
               "--out", str(tmp_path / "x.pt"), "--ema"])
    assert rc == 2
    assert "--ema-decay" in capsys.readouterr().err


def test_reload_once_ema_and_structure_diagnostics(tmp_path):
    """Hot-reload prechecks: a newer step whose config dropped EMA (while
    the service runs --ema) or changed the model structure raises the
    crafted operator diagnostic instead of a generic Orbax structure
    mismatch; a compatible newer step still reloads."""
    from musicvae_tpu import checkpoints
    from musicvae_tpu.cli import _make_reload_once
    from musicvae_tpu.parallel import make_mesh

    cfg = cpu_friendly(tiny(C1_CONV_BAR, ema_decay=0.5))
    model, state = create_state(cfg)
    state = state.replace(step=state.step + 1)
    mgr = checkpoints.make_manager(str(tmp_path / "c"), keep=3)
    checkpoints.save(mgr, state, cfg, wait=True)
    mesh = make_mesh(cfg.mesh)
    store = {"params": state.ema_params, "step": 1}
    reload_once = _make_reload_once(mgr, state, mesh, store, use_ema=True)
    assert reload_once() is None            # nothing newer yet

    # newer step trained WITHOUT EMA → crafted diagnostic, store untouched
    cfg0 = cpu_friendly(tiny(C1_CONV_BAR))
    _, s2 = create_state(cfg0)
    s2 = s2.replace(step=s2.step + 2)
    checkpoints.save(mgr, s2, cfg0, wait=True)
    with pytest.raises(ValueError, match="carries no EMA weights"):
        reload_once()
    assert store["step"] == 1

    # newer step with a different model structure → crafted diagnostic
    cfg_big = cpu_friendly(tiny(C1_CONV_BAR, ema_decay=0.5))
    cfg_big = cfg_big.replace(model=dataclasses.replace(
        cfg_big.model, z_dim=32))
    _, s3 = create_state(cfg_big)
    s3 = s3.replace(step=s3.step + 3)
    checkpoints.save(mgr, s3, cfg_big, wait=True)
    with pytest.raises(ValueError, match="different model structure"):
        reload_once()

    # compatible newer step reloads and swaps the EMA side in
    _, s4 = create_state(cfg)
    s4 = s4.replace(step=s4.step + 4)
    checkpoints.save(mgr, s4, cfg, wait=True)
    assert reload_once() == 4
    assert store["step"] == 4


def test_ema_off_checkpoint_keeps_pre_ema_disk_layout(tmp_path):
    """EMA-off checkpoints carry NO ema entry on disk: a pre-EMA-era
    4-key template (plain dict, how all round-1/2 checkpoints look)
    restores them, and vice versa. Regression for a real break: saving
    the TrainState dataclass recorded the None ema field in Orbax's
    tree metadata, which made every pre-EMA checkpoint fail to restore
    ('Source: MISSING / Target: MISSING' on ema_params — caught on a
    real round-3 checkpoint on-chip)."""
    from musicvae_tpu import checkpoints

    cfg = cpu_friendly(tiny(C1_CONV_BAR))
    model, state = create_state(cfg)
    state = state.replace(step=state.step + 1)
    mgr = checkpoints.make_manager(str(tmp_path / "c"), 1)
    checkpoints.save(mgr, state, cfg, wait=True)

    plain = {"params": state.params, "opt_state": state.opt_state,
             "step": state.step, "rng": state.rng}
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), plain)
    restored, _ = checkpoints.restore(mgr, abstract)   # pre-EMA template
    assert set(restored) == set(plain)
    np.testing.assert_array_equal(np.asarray(restored["step"]), 1)


def test_cli_eval_ema(tmp_path, capsys):
    """eval --ema scores the EMA weights (metrics differ from the raw
    params after training); EMA-less checkpoint is rc 2."""
    from musicvae_tpu.cli import main

    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ema-decay", "0.5",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["eval", "--ckpt-dir", str(tmp_path / "c"),
                 "--data", out, "--batches", "1"]) == 0
    raw_out = capsys.readouterr().out.strip().splitlines()[-1]
    assert main(["eval", "--ckpt-dir", str(tmp_path / "c"),
                 "--data", out, "--batches", "1", "--ema"]) == 0
    cap = capsys.readouterr()
    assert "scoring EMA weights" in cap.err
    ema_out = cap.out.strip().splitlines()[-1]
    assert raw_out != ema_out                  # different weights scored

    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    capsys.readouterr()
    rc = main(["eval", "--ckpt-dir", str(tmp_path / "c2"),
               "--data", out, "--batches", "1", "--ema"])
    assert rc == 2
    assert "--ema-decay" in capsys.readouterr().err


def test_cli_reconstruct_ema(tmp_path, capsys):
    """reconstruct --ema decodes with the EMA weights (output differs
    from the raw-params reconstruction); EMA-less checkpoint is rc 2 —
    the last command on the sampling surface to gain the flag."""
    from musicvae_tpu.cli import main
    from musicvae_tpu.data import synth_corpus

    midi = tmp_path / "piece.mid"
    midi.write_bytes(synth_corpus(num_pieces=1, n_bars=2, seed=4)[0][0])
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ema-decay", "0.5",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["reconstruct", "--ckpt-dir", str(tmp_path / "c"),
                 "--midi-glob", str(midi),
                 "--out-dir", str(tmp_path / "raw")]) == 0
    capsys.readouterr()
    assert main(["reconstruct", "--ckpt-dir", str(tmp_path / "c"),
                 "--midi-glob", str(midi), "--ema",
                 "--out-dir", str(tmp_path / "ema")]) == 0
    cap = capsys.readouterr()
    assert "using EMA weights" in cap.err
    raw = (tmp_path / "raw" / "piece.recon.mid").read_bytes()
    ema = (tmp_path / "ema" / "piece.recon.mid").read_bytes()
    assert raw[:4] == ema[:4] == b"MThd"
    assert raw != ema                         # different weights decoded

    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c2"),
                 "--log-dir", str(tmp_path / "l2")]) == 0
    capsys.readouterr()
    rc = main(["reconstruct", "--ckpt-dir", str(tmp_path / "c2"),
               "--midi-glob", str(midi), "--ema",
               "--out-dir", str(tmp_path / "x")])
    assert rc == 2
    assert "--ema-decay" in capsys.readouterr().err


def test_interim_layout_checkpoint_restores(tmp_path):
    """EMA-off checkpoints from the FIRST EMA build saved the dataclass
    directly, recording an explicit None ema_params node; the restore
    path must retry with that node present rather than bricking the
    directory (second-review finding — reproduced with a raw Orbax
    save of the interim tree shape)."""
    import orbax.checkpoint as ocp

    from musicvae_tpu import checkpoints

    cfg = cpu_friendly(tiny(C1_CONV_BAR))
    model, state = create_state(cfg)
    state = state.replace(step=state.step + 1)

    mgr = checkpoints.make_manager(str(tmp_path / "c"), 1)
    import dataclasses as _dc

    from musicvae_tpu.config import Config  # noqa: F401 (clarity)
    interim_tree = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step, "rng": state.rng,
                    "ema_params": None}       # the interim on-disk shape
    mgr.save(1, args=ocp.args.Composite(
        state=ocp.args.StandardSave(interim_tree),
        config=ocp.args.JsonSave(_dc.asdict(cfg))))
    mgr.wait_until_finished()

    _, template = create_state(cfg)           # EMA-off: 4-key template
    restored, rcfg = checkpoints.restore(mgr, template)
    assert int(restored.step) == 1
    assert restored.ema_params is None
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
