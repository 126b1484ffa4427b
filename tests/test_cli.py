"""CLI entry-point tests (L6): in-process main() on the CPU test backend."""

import os

import numpy as np
import pytest

from musicvae_tpu.cli import main


def test_preprocess_writes_cache(tmp_path, capsys):
    out = str(tmp_path / "rolls.npz")
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--synthetic-pieces", "3", "--out", out])
    assert rc == 0
    with np.load(out) as z:
        assert z["bars"].shape[1:] == (96, 128)
        assert z["bars"].dtype == np.uint8
        assert int(z["num_bars"]) == 1
        assert z["starts"].shape[0] > 0


def test_unknown_config_clean_error(capsys):
    rc = main(["train", "--config", "nope"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unknown config" in err and "Traceback" not in err


def test_malformed_midi_clean_error(tmp_path, capsys):
    bad = tmp_path / "bad.mid"
    bad.write_bytes(b"definitely not midi")
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(bad), "--out", str(tmp_path / "x.npz")])
    assert rc == 2
    assert "malformed MIDI" in capsys.readouterr().err


def test_empty_glob_errors(tmp_path, capsys):
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(tmp_path / "*.mid"),
               "--out", str(tmp_path / "x.npz")])
    assert rc == 1
    assert "no MIDI files" in capsys.readouterr().err


def test_train_beta_schedule_flags(tmp_path):
    """--beta-schedule cyclical flows through train end to end (1 step on
    a tiny synthetic cache; a bad cycle value would raise in
    ops.losses.beta_schedule)."""
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c2_gru_4bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c2_gru_4bar", "--data", out,
                 "--steps", "1", "--beta-schedule", "cyclical",
                 "--beta-cycle-steps", "50",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0


def test_resume_keeps_eval_holdout(tmp_path, capsys):
    """`train --resume` (no eval flags) must honor the checkpoint's eval
    settings: the holdout split happens AFTER config restore, so the
    resumed run keeps evaluating and never trains on the former holdout
    (review finding: the split was decided from the pre-restore config,
    silently disabling eval on resume)."""
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "6", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--eval-every", "2", "--eval-batches", "1",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    err1 = capsys.readouterr().err
    assert "holdout:" in err1
    n_train_1 = [l for l in err1.splitlines() if l.startswith("dataset:")]
    # resume WITHOUT eval flags: checkpoint config must re-enable the split
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--resume", "--steps", "4",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    err2 = capsys.readouterr().err
    assert "holdout:" in err2, "resume dropped the eval holdout"
    n_train_2 = [l for l in err2.splitlines() if l.startswith("dataset:")]
    assert n_train_1 == n_train_2, "train/eval partition changed on resume"


def test_serve_json_protocol(tmp_path, capsys, monkeypatch):
    """`serve` loads+compiles once and answers JSON-line requests: valid
    requests return base64 MIDI per sample, deterministic per seed;
    malformed requests get in-band errors without killing the service."""
    import base64
    import io
    import json

    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()

    requests = "\n".join([
        json.dumps({"id": 1, "seed": 7}),
        json.dumps({"id": 2, "seed": 7}),       # same seed → same MIDI
        "this is not json",
        json.dumps({"id": 3, "seed": 8}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(requests))
    assert main(["serve", "--config", "c1_conv_bar",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--bars", "2", "--samples", "2"]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 4
    by_id = {l.get("id"): l for l in lines}
    assert len(by_id[1]["midi_b64"]) == 2
    # valid SMF bytes and seed-deterministic
    assert base64.b64decode(by_id[1]["midi_b64"][0])[:4] == b"MThd"
    assert by_id[1]["midi_b64"] == by_id[2]["midi_b64"]
    assert "error" in by_id[None]
    assert by_id[3]["midi_b64"] != by_id[1]["midi_b64"] or \
        by_id[3]["density"] == by_id[1]["density"] == 0.0

    # no checkpoint → clean error exit
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert main(["serve", "--config", "c1_conv_bar",
                 "--ckpt-dir", str(tmp_path / "nope")]) == 2
