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
    assert by_id[1]["latency_ms"] > 0          # per-request serving metric
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


def _tiny_ckpt(tmp_path, base_name, **model_kw):
    """Write a checkpoint of a TINY model under a canonical config name —
    serve/generate/reconstruct rebuild the model from the checkpoint's own
    config, so CLI tests avoid full-size CPU training."""
    import dataclasses

    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.train import create_state

    cfg = get_config(base_name)
    kw = dict(enc_channels=(4, 8, 8, 8, 8), dec_channels=(8, 8, 8, 8, 8),
              z_dim=16, gru_hidden=32, bar_feat_dim=32, dtype="float32")
    kw.update(model_kw)                 # explicit overrides win
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **kw),
        train=dataclasses.replace(cfg.train, batch_size=4))
    _, state = create_state(cfg)
    state = state.replace(step=state.step + 1)
    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=1)
    checkpoints.save(mgr, state, cfg, wait=True)
    return str(tmp_path / "ckpt")


def _write_seed_midi(tmp_path):
    from musicvae_tpu.data import synth_corpus

    piece = synth_corpus(num_pieces=1, n_bars=6, seed=5)[0][0]
    path = tmp_path / "seed.mid"
    path.write_bytes(piece)
    return str(path)


def test_generate_seed_midi_and_encode(tmp_path, capsys):
    """`generate --seed-midi [--encode]` runs end to end: the real bar
    seeds the prev-bar conditioning and --encode starts the latent from
    the encoded posterior (VERDICT r2 #2)."""
    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    seed_midi = _write_seed_midi(tmp_path)
    out = tmp_path / "gen"
    rc = main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
               "--bars", "4", "--samples", "2", "--seed-midi", seed_midi,
               "--out-dir", str(out), "--write-midis", "1"])
    assert rc == 0
    rolls = np.load(str(out / "rolls.npy"))
    assert rolls.shape == (2, 4, 96, 128)

    out2 = tmp_path / "gen_enc"
    rc = main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
               "--bars", "4", "--samples", "2", "--seed-midi", seed_midi,
               "--encode", "--out-dir", str(out2), "--write-midis", "1"])
    assert rc == 0
    # the encoded start differs from the prior-seeded sweep
    rolls2 = np.load(str(out2 / "rolls.npy"))
    assert rolls2.shape == (2, 4, 96, 128)

    # --encode without --seed-midi is a clean usage error
    assert main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
                 "--encode", "--out-dir", str(tmp_path / "x")]) == 2


def test_generate_morph_two_files(tmp_path, capsys):
    """`generate --interp-midi-b B.mid`: the sweep slerps from A's encoded
    latent to B's (the MusicVAE two-endpoint interpolation). Same seed
    without the B endpoint gives a different sweep; missing prerequisite
    flags are a clean usage error."""
    from musicvae_tpu.data import synth_corpus

    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    a = _write_seed_midi(tmp_path)
    b = tmp_path / "b.mid"
    b.write_bytes(synth_corpus(num_pieces=2, n_bars=6, seed=11)[1][0])
    out = tmp_path / "morph"
    rc = main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
               "--bars", "8", "--samples", "2", "--interpolate",
               "--seed-midi", a, "--encode", "--interp-midi-b", str(b),
               "--out-dir", str(out), "--write-midis", "1"])
    assert rc == 0
    rolls = np.load(str(out / "rolls.npy"))
    assert rolls.shape == (2, 8, 96, 128)
    assert (out / "sample_0000.mid").read_bytes()[:4] == b"MThd"
    # the pinned B endpoint changes the sweep vs a prior-drawn slerp end
    out2 = tmp_path / "nomorph"
    rc = main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
               "--bars", "8", "--samples", "2", "--interpolate",
               "--seed-midi", a, "--encode", "--out-dir", str(out2),
               "--write-midis", "0"])
    assert rc == 0
    assert (rolls != np.load(str(out2 / "rolls.npy"))).any()
    # --interp-midi-b without --encode/--interpolate is a usage error
    assert main(["generate", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
                 "--seed-midi", a, "--interp-midi-b", str(b),
                 "--out-dir", str(tmp_path / "x")]) == 2
    assert "interp-midi-b" in capsys.readouterr().err


def test_reconstruct_cli(tmp_path, capsys):
    """`reconstruct`: MIDI → encode → decode → MIDI + P/R/F1 line."""
    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    seed_midi = _write_seed_midi(tmp_path)
    out = tmp_path / "rec"
    rc = main(["reconstruct", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
               "--midi-glob", seed_midi, "--out-dir", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "f1=" in text and "precision=" in text
    recon = out / "seed.recon.mid"
    assert recon.exists()
    assert recon.read_bytes()[:4] == b"MThd"
    # no checkpoint → clean error
    assert main(["reconstruct", "--config", "c2_gru_4bar",
                 "--ckpt-dir", str(tmp_path / "nope"),
                 "--midi-glob", seed_midi,
                 "--out-dir", str(out)]) == 2


def test_serve_cond_model(tmp_path, capsys, monkeypatch):
    """serve against a conditional (C4) checkpoint (VERDICT r2 weak #2):
    chord/key requests answer from the startup-compiled program (omitted
    fields fall back to host-random classes — same trace either way) and
    out-of-range values come back as in-band errors without killing the
    service."""
    import io
    import json

    ckpt = _tiny_ckpt(tmp_path, "c4_cond")
    requests = "\n".join([
        json.dumps({"id": 1, "seed": 3, "chord": 0, "key": 0}),
        json.dumps({"id": 2, "seed": 3, "chord": 14, "key": 7}),
        json.dumps({"id": 3, "seed": 3}),              # omitted → random
        json.dumps({"id": 4, "seed": 3, "chord": 99}),  # out of range
        json.dumps({"id": 5, "seed": 3, "key": -1}),    # out of range
        json.dumps({"id": 6, "seed": 4, "chord": 14, "key": 7}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(requests))
    assert main(["serve", "--config", "c4_cond", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "2"]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    by_id = {l["id"]: l for l in lines}
    assert len(by_id[1]["midi_b64"]) == 2
    assert len(by_id[2]["midi_b64"]) == 2
    assert len(by_id[3]["midi_b64"]) == 2
    assert "chord 99 out of range" in by_id[4]["error"]
    assert "key -1 out of range" in by_id[5]["error"]
    # the service kept answering after the bad requests
    assert len(by_id[6]["midi_b64"]) == 2


def test_serve_seed_midi_request(tmp_path, capsys, monkeypatch):
    """serve accepts seed_midi_b64 (base64 SMF) to seed the prev-bar
    conditioning; --warm-seed pre-compiles that second program."""
    import base64
    import io
    import json

    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    seed_b64 = base64.b64encode(
        open(_write_seed_midi(tmp_path), "rb").read()).decode()
    requests = "\n".join([
        json.dumps({"id": 1, "seed": 2}),
        json.dumps({"id": 2, "seed": 2, "seed_midi_b64": seed_b64}),
        json.dumps({"id": 3, "seed": 2,
                    "seed_midi_b64": base64.b64encode(b"junk").decode()}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(requests))
    assert main(["serve", "--config", "c2_gru_4bar", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "1", "--warm-seed"]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    by_id = {l["id"]: l for l in lines}
    assert len(by_id[1]["midi_b64"]) == 1
    assert len(by_id[2]["midi_b64"]) == 1
    assert "error" in by_id[3]            # bad seed MIDI stays in-band


def test_serve_pipeline_ordering(tmp_path, capsys, monkeypatch):
    """A backlog of requests under --pipeline (the depth-1 compute/encode
    pipeline actually fills) comes back strictly in request order, one
    response per request, bit-identical to the default serial path; an
    in-band error in the middle must not desync the ordering."""
    import io
    import json

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    reqs = [json.dumps({"id": i, "seed": i % 3}) for i in range(10)]
    reqs.insert(5, "not json")                  # mid-stream protocol error
    text = "\n".join(reqs) + "\n"

    monkeypatch.setattr("sys.stdin", io.StringIO(text))
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "1", "--pipeline"]) == 0
    out1 = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert [l.get("id") for l in out1] == \
        [0, 1, 2, 3, 4, None, 5, 6, 7, 8, 9]
    assert "error" in out1[5]

    monkeypatch.setattr("sys.stdin", io.StringIO(text))
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "1"]) == 0
    out2 = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert [(l.get("id"), l.get("midi_b64")) for l in out1] == \
           [(l.get("id"), l.get("midi_b64")) for l in out2]


def test_serve_socket_concurrent_clients(tmp_path):
    """--port serves the same JSON protocol over TCP to concurrent
    clients: two connections interleave requests against the one
    compiled program; each client gets exactly its own responses, in
    its own request order, with protocol errors in-band; --max-requests
    stops the server cleanly."""
    import json
    import socket
    import threading
    import time

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    with socket.socket() as s:            # pre-pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port),
         "--max-requests", "7"])), daemon=True)
    t.start()

    def connect():
        deadline = time.time() + 120      # model compile happens first
        while True:
            try:
                return socket.create_connection(("127.0.0.1", port),
                                                timeout=5)
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.2)

    a, b = connect(), connect()
    try:
        # both clients write their full backlog BEFORE reading: handler
        # threads genuinely interleave on the shared device lock
        a_lines = [json.dumps({"id": i, "seed": i}) for i in (0, 1)] \
            + ["not json"] + [json.dumps({"id": 2, "seed": 2})]
        b_lines = [json.dumps({"id": i, "seed": i}) for i in (10, 11, 12)]
        a.sendall(("\n".join(a_lines) + "\n").encode())
        b.sendall(("\n".join(b_lines) + "\n").encode())

        def read_n(conn, n):
            f = conn.makefile("r")
            return [json.loads(f.readline()) for _ in range(n)]

        got_b = []
        tb = threading.Thread(target=lambda: got_b.extend(read_n(b, 3)))
        tb.start()
        got_a = read_n(a, 4)
        tb.join(timeout=120)
    finally:
        a.close()
        b.close()
    t.join(timeout=120)

    assert rc == [0]
    assert [r.get("id") for r in got_a] == [0, 1, None, 2]
    assert "error" in got_a[2]            # malformed line stays in-band
    assert [r.get("id") for r in got_b] == [10, 11, 12]
    for r in got_a[:2] + [got_a[3]] + got_b:
        assert r["midi_b64"] and "density" in r and "latency_ms" in r


def test_serve_socket_cond_and_seed(tmp_path):
    """The TCP transport shares request_kwargs with stdin mode: a cond
    (C4) server answers chord/key requests, reports out-of-range values
    and a corrupt seed_midi_b64 in-band on the same connection, and
    keeps serving after both."""
    import base64
    import json
    import socket
    import threading
    import time

    ckpt = _tiny_ckpt(tmp_path, "c4_cond")
    seed_b64 = base64.b64encode(
        open(_write_seed_midi(tmp_path), "rb").read()).decode()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c4_cond", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port),
         "--warm-seed", "--max-requests", "5"])), daemon=True)
    t.start()

    deadline = time.time() + 120
    while True:
        try:
            conn = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    try:
        reqs = [{"id": 1, "seed": 3, "chord": 14, "key": 7},
                {"id": 2, "seed": 3, "chord": 99},           # out of range
                {"id": 3, "seed": 3,
                 "seed_midi_b64": base64.b64encode(b"junk").decode()},
                {"id": 4, "seed": 3, "seed_midi_b64": seed_b64},
                {"id": 5, "seed": 4}]                        # omitted cond
        conn.sendall(("\n".join(map(json.dumps, reqs)) + "\n").encode())
        f = conn.makefile("r")
        got = [json.loads(f.readline()) for _ in range(5)]
    finally:
        conn.close()
    t.join(timeout=120)

    assert rc == [0]
    by_id = {r["id"]: r for r in got}
    assert "chord 99 out of range" in by_id[2]["error"]
    assert "error" in by_id[3]
    for i in (1, 4, 5):
        assert len(by_id[i]["midi_b64"]) == 1


def test_convert_cli_roundtrip(tmp_path, capsys):
    """`convert` exposes the torch↔orbax converter at the CLI: export a
    checkpoint to a torch state_dict, and import a torch state_dict into
    a loadable Orbax checkpoint with bit-identical params."""
    import jax
    import torch

    from musicvae_tpu import checkpoints
    from musicvae_tpu.checkpoints.torch_convert import \
        flax_params_to_torch_state_dict
    from musicvae_tpu.config import get_config
    from musicvae_tpu.models import init_params
    from musicvae_tpu.train import create_state

    # export: tiny checkpoint -> torch state_dict
    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    pt = tmp_path / "export.pt"
    assert main(["convert", "--to-torch", ckpt, "--out", str(pt)]) == 0
    sd = torch.load(str(pt), weights_only=True)
    assert any(k.endswith("weight_ih") for k in sd), sorted(sd)[:5]

    # import: full-size C1 torch state_dict -> Orbax checkpoint
    cfg = get_config("c1_conv_bar")
    _, params = init_params(cfg, jax.random.key(0))
    src = tmp_path / "src.pt"
    torch.save(flax_params_to_torch_state_dict(
        jax.device_get(params), cfg), str(src))
    out_dir = str(tmp_path / "imported")
    assert main(["convert", "--from-torch", str(src),
                 "--config", "c1_conv_bar", "--out", out_dir,
                 "--step", "7"]) == 0
    mgr = checkpoints.make_manager(out_dir)
    _, st = create_state(cfg)
    st, cfg2 = checkpoints.restore(mgr, st)
    assert int(st.step) == 7 and cfg2.name == "c1_conv_bar"
    for a, b in zip(jax.tree.leaves(jax.device_get(st.params)),
                    jax.tree.leaves(jax.device_get(params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # exactly one direction required
    assert main(["convert", "--from-torch", "x", "--to-torch", "y",
                 "--out", "z"]) == 2
    assert main(["convert", "--out", "z"]) == 2


def test_eval_partial_tail_batch_unbiased(tmp_path, capsys):
    """cmd_eval on a dataset whose size is NOT a batch multiple: every
    window scored exactly once via the zero-weighted pad (VERDICT r2
    weak #6 — wrapped tail batches used to double-count windows)."""
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c2_gru_4bar",
                 "--synthetic-pieces", "3", "--out", out]) == 0
    # 3 pieces x 29 windows = 87 windows; batch 64 → one full batch plus
    # a 23-window tail: the tail exercises the zero-weighted pad path
    assert main(["train", "--config", "c2_gru_4bar", "--data", out,
                 "--steps", "1", "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    rc = main(["eval", "--config", "c2_gru_4bar",
               "--ckpt-dir", str(tmp_path / "c"), "--data", out,
               "--batches", "99"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "loss=" in text and "f1=" in text


def test_coalesced_generate_matches_single():
    """The serve dynamic-batching program (make_coalesced_generate_fn)
    produces BIT-IDENTICAL music to the single-request program per slot
    key — seeded, conditioned, and plain slots alike — so responses never
    depend on how requests happened to batch."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from musicvae_tpu.config import get_config
    from musicvae_tpu.generate import (make_coalesced_generate_fn,
                                       make_generate_fn)
    from musicvae_tpu.models.vae import init_params
    from musicvae_tpu.ops.pack import unpack_bits_np

    for name, seeded, cond in [("c2_gru_4bar", True, False),
                               ("c4_cond", False, True),
                               ("c3_hier_16bar", False, False)]:
        cfg = get_config(name)
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, enc_channels=(4, 8, 8, 8, 8),
                dec_channels=(8, 8, 8, 8, 8), z_dim=8, gru_hidden=16,
                bar_feat_dim=16, dtype="float32"),
            gen=dataclasses.replace(cfg.gen, num_samples=2, num_bars=2))
        model, params = init_params(cfg, jax.random.key(0))
        gen = make_generate_fn(cfg, model)
        coal = make_coalesced_generate_fn(cfg, model)

        W, B = 3, cfg.gen.num_samples
        T, P = cfg.midi.steps_per_bar, cfg.midi.num_pitches
        N = cfg.gen.num_bars
        rng = np.random.default_rng(0)
        seed_bars = np.zeros((W, B, T, P), np.uint8)
        if seeded:
            seed_bars[1] = (rng.random((B, T, P)) < 0.05).astype(np.uint8)
        chords = rng.integers(0, cfg.model.cond_chord_classes or 1,
                              (W, B, N)).astype(np.int32)
        key_sigs = rng.integers(0, cfg.model.cond_key_classes or 1,
                                (W, B)).astype(np.int32)
        keys = jax.vmap(jax.random.key)(jnp.arange(W))
        out = unpack_bits_np(np.asarray(
            coal(params, keys, seed_bars, chords, key_sigs)))
        assert out.shape == (W, B, N, T, P)
        for i in range(W):
            kw = {}
            if seed_bars[i].any():
                kw["seed_bar"] = jnp.asarray(seed_bars[i])
            if cond:
                kw["chord"] = jnp.asarray(chords[i])
                kw["key_sig"] = jnp.asarray(key_sigs[i])
            ref = np.asarray(gen(params, jax.random.key(i), **kw))
            np.testing.assert_array_equal(out[i], ref, err_msg=f"{name}#{i}")


def test_serve_stdin_coalesce_matches_serial(tmp_path, capsys, monkeypatch):
    """`serve --coalesce 3` answers the same request stream with byte-
    identical responses to per-request dispatch (--coalesce 1), keeps
    request order, and reports malformed lines in-band without poisoning
    the batch they landed in."""
    import io
    import json

    import base64

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    seed_b64 = base64.b64encode(
        open(_write_seed_midi(tmp_path), "rb").read()).decode()
    requests = "\n".join([
        json.dumps({"id": 1, "seed": 7}),
        json.dumps({"id": 2, "seed": 8}),
        "not json",
        json.dumps({"id": 3, "seed": 7}),       # same seed as id 1
        json.dumps({"id": 4, "seed": 9, "seed_midi_b64": seed_b64}),
        # a 64-bit seed must not overflow the coalesced key build (nor
        # poison its co-batched requests); jax.random.key is mod-2^32
        # under x32, so it must answer exactly like seed 7
        json.dumps({"id": 5, "seed": 2**32 + 7}),
    ]) + "\n"

    outs = {}
    for w in ("1", "3"):
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", io.StringIO(requests))
        assert main(["serve", "--config", "c1_conv_bar",
                     "--ckpt-dir", ckpt, "--bars", "2", "--samples", "2",
                     "--coalesce", w]) == 0
        outs[w] = [json.loads(l) for l in
                   capsys.readouterr().out.strip().splitlines()]

    for lines in outs.values():
        assert [l.get("id") for l in lines] == [1, 2, None, 3, 4, 5]
        assert "error" in lines[2]
        assert lines[0]["midi_b64"] == lines[3]["midi_b64"]  # same seed
        assert lines[5]["midi_b64"] == lines[0]["midi_b64"]  # mod-2^32
    for a, b in zip(outs["1"], outs["3"]):
        assert a.get("midi_b64") == b.get("midi_b64")  # batching-invariant

    # flag validation: bad width / pipeline combination exit cleanly
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--coalesce", "0"]) == 2
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--coalesce", "2", "--pipeline"]) == 2


def test_serve_attn_family_coalesce_matches_serial(tmp_path, capsys,
                                                   monkeypatch):
    """serve against ATTENTION-family checkpoints (VERDICT r4 #9: the
    serving stack must provably cover all three temporal families). The
    KV-cache generation step (models/layers.py AttnStack.step) answers
    the same JSON protocol; coalesced dispatch stays byte-identical to
    per-request dispatch; seed-MIDI conditioning threads through the
    attention sweep; and the conductor-free hierarchy (c3_trf) serves
    its two-level latent path."""
    import base64
    import io
    import json

    trf_kw = dict(enc_channels=(8, 8, 16), dec_channels=(16, 8, 8),
                  z_dim=8, gru_hidden=16, bar_feat_dim=16, attn_heads=4)
    ckpt = _tiny_ckpt(tmp_path, "c2_trf", **trf_kw)
    seed_b64 = base64.b64encode(
        open(_write_seed_midi(tmp_path), "rb").read()).decode()
    requests = "\n".join([
        json.dumps({"id": 1, "seed": 7}),
        json.dumps({"id": 2, "seed": 8}),
        json.dumps({"id": 3, "seed": 7}),       # same seed as id 1
        json.dumps({"id": 4, "seed": 9, "seed_midi_b64": seed_b64}),
    ]) + "\n"

    outs = {}
    for w in ("1", "3"):
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", io.StringIO(requests))
        assert main(["serve", "--config", "c2_trf",
                     "--ckpt-dir", ckpt, "--bars", "3", "--samples", "2",
                     "--coalesce", w]) == 0
        outs[w] = [json.loads(l) for l in
                   capsys.readouterr().out.strip().splitlines()]
    for lines in outs.values():
        assert [l.get("id") for l in lines] == [1, 2, 3, 4]
        assert lines[0]["midi_b64"] == lines[2]["midi_b64"]  # same seed
        assert base64.b64decode(lines[0]["midi_b64"][0])[:4] == b"MThd"
    for a, b in zip(outs["1"], outs["3"]):
        assert a.get("midi_b64") == b.get("midi_b64")  # batching-invariant

    # the conductor-free hierarchy serves too (z_phrase rides the
    # attention input through the same KV-cache step)
    ckpt3 = _tiny_ckpt(tmp_path / "h", "c3_trf",
                       z_phrase_dim=16, num_bars=4, **trf_kw)
    capsys.readouterr()
    monkeypatch.setattr("sys.stdin", io.StringIO(
        json.dumps({"id": 1, "seed": 3}) + "\n"))
    assert main(["serve", "--config", "c3_trf", "--ckpt-dir", ckpt3,
                 "--bars", "4", "--samples", "1"]) == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert base64.b64decode(line["midi_b64"][0])[:4] == b"MThd"


def test_serve_socket_coalesce(tmp_path):
    """TCP transport under --coalesce 4: concurrent clients' requests
    are answered from batched dispatches with per-seed determinism
    across clients, in-band errors, and a clean --max-requests stop."""
    import json
    import socket
    import threading
    import time

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port),
         "--coalesce", "4", "--max-requests", "7"])), daemon=True)
    t.start()

    def connect():
        deadline = time.time() + 120
        while True:
            try:
                return socket.create_connection(("127.0.0.1", port),
                                                timeout=5)
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.2)

    a, b = connect(), connect()
    try:
        a_lines = [json.dumps({"id": i, "seed": i}) for i in (0, 1)] \
            + ["not json"] + [json.dumps({"id": 2, "seed": 42})]
        b_lines = [json.dumps({"id": i, "seed": s})
                   for i, s in ((10, 0), (11, 5), (12, 42))]
        a.sendall(("\n".join(a_lines) + "\n").encode())
        b.sendall(("\n".join(b_lines) + "\n").encode())

        def read_n(conn, n):
            f = conn.makefile("r")
            return [json.loads(f.readline()) for _ in range(n)]

        got_b = []
        tb = threading.Thread(target=lambda: got_b.extend(read_n(b, 3)))
        tb.start()
        got_a = read_n(a, 4)
        tb.join(timeout=120)
    finally:
        a.close()
        b.close()
    t.join(timeout=120)

    assert rc == [0]
    assert [r.get("id") for r in got_a] == [0, 1, None, 2]
    assert "error" in got_a[2]
    assert [r.get("id") for r in got_b] == [10, 11, 12]
    by_id_a = {r.get("id"): r for r in got_a}
    by_id_b = {r["id"]: r for r in got_b}
    # same seed → same music, whichever client/batch carried it
    assert by_id_a[0]["midi_b64"] == by_id_b[10]["midi_b64"]
    assert by_id_a[2]["midi_b64"] == by_id_b[12]["midi_b64"]
    for r in [by_id_a[0], by_id_a[1], by_id_a[2]] + got_b:
        assert r["midi_b64"] and "latency_ms" in r


def test_serve_reload_hot_swaps_params(tmp_path, capsys, monkeypatch):
    """`serve --reload-every` hot-swaps newer checkpoint params into the
    running service without a restart or retrace: the same seed answers
    differently after a new step lands, and the reloaded service's
    response is byte-identical to a fresh service started on the new
    checkpoint."""
    import dataclasses
    import io
    import json
    import threading
    import time

    import jax
    import jax.numpy as jnp

    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.train import create_state

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")

    def write_step2():
        cfg = get_config("c1_conv_bar")
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, enc_channels=(4, 8, 8, 8, 8),
                dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
                bar_feat_dim=32, dtype="float32"),
            train=dataclasses.replace(cfg.train, batch_size=4))
        _, state = create_state(cfg)
        # visibly different params: decode output flips for most seeds
        state = state.replace(
            step=state.step + 2,
            params=jax.tree.map(lambda a: a + 0.5, state.params))
        mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=2)
        checkpoints.save(mgr, state, cfg, wait=True)

    class PacedStdin:
        """Yields a request, runs an action + settle delay, then yields
        the same request again (the reader thread iterates us)."""

        def __iter__(self):
            yield json.dumps({"id": 1, "seed": 7}) + "\n"
            time.sleep(0.5)             # let request 1 answer on step 1
            write_step2()
            time.sleep(1.5)             # > --reload-every; watcher swaps
            yield json.dumps({"id": 2, "seed": 7}) + "\n"

    monkeypatch.setattr("sys.stdin", PacedStdin())
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "2",
                 "--reload-every", "0.2"]) == 0
    out, err = capsys.readouterr()
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert "reloaded checkpoint step 2" in err
    assert [l["id"] for l in lines] == [1, 2]
    assert lines[0]["midi_b64"] != lines[1]["midi_b64"], \
        "same seed answered identically after reload"

    # the reloaded response == a fresh service on the new checkpoint
    monkeypatch.setattr("sys.stdin",
                        io.StringIO(json.dumps({"id": 3, "seed": 7}) + "\n"))
    assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
                 "--bars", "2", "--samples", "2"]) == 0
    fresh = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert fresh[0]["midi_b64"] == lines[1]["midi_b64"]


def test_serve_stats_request(tmp_path, capsys, monkeypatch):
    """{"cmd": "stats"} answers with live counters in-band on every
    transport/dispatch mode: serial stdin, coalesced stdin, and TCP —
    in request order, without counting as a generation request."""
    import io
    import json
    import socket
    import threading
    import time

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    requests = "\n".join([
        json.dumps({"id": 1, "seed": 7}),
        json.dumps({"id": 2, "cmd": "stats"}),
        json.dumps({"id": 3, "seed": 8}),
    ]) + "\n"

    for extra in ([], ["--coalesce", "2"]):
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", io.StringIO(requests))
        assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir",
                     ckpt, "--bars", "2", "--samples", "1"] + extra) == 0
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert [l["id"] for l in lines] == [1, 2, 3], extra
        st = lines[1]["stats"]
        assert st["served"] == 1 and st["errors"] == 0
        assert st["requests"] == 1          # stats didn't count as one
        assert st["step"] == 1 and st["config"] == "c1_conv_bar"
        assert st["samples"] == 1 and st["bars"] == 2
        assert st["uptime_s"] >= 0

    # TCP transport
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port),
         "--max-requests", "1"])), daemon=True)
    t.start()
    deadline = time.time() + 120
    while True:
        try:
            conn = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    try:
        conn.sendall((json.dumps({"id": 9, "cmd": "stats"}) + "\n"
                      + json.dumps({"id": 10, "seed": 1}) + "\n").encode())
        f = conn.makefile("r")
        got = [json.loads(f.readline()) for _ in range(2)]
    finally:
        conn.close()
    t.join(timeout=120)
    assert rc == [0]
    assert got[0]["id"] == 9 and got[0]["stats"]["served"] == 0
    assert got[1]["id"] == 10 and got[1]["midi_b64"]


def test_serve_client_library(tmp_path):
    """musicvae_tpu.client.ServeClient wraps the TCP protocol: generate()
    returns decoded SMF bytes, stats() live counters, in-band errors
    raise ServeError and leave the connection usable."""
    import socket
    import threading
    import time

    import pytest as _pytest

    from musicvae_tpu.client import ServeClient, ServeError

    ckpt = _tiny_ckpt(tmp_path, "c4_cond")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c4_cond", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "2", "--port", str(port),
         "--coalesce", "2", "--max-requests", "4"])), daemon=True)
    t.start()
    deadline = time.time() + 120
    while True:
        try:
            c = ServeClient(port=port, timeout=120)
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    with c:
        midis = c.generate(seed=7, chord=3, key=2)
        assert len(midis) == 2 and midis[0][:4] == b"MThd"
        with _pytest.raises(ServeError, match="chord 99 out of range"):
            c.generate(seed=7, chord=99)
        st = c.stats()
        assert st["served"] == 1 and st["errors"] == 1
        assert c.generate(seed=8)[0][:4] == b"MThd"     # still usable
        assert c.generate(seed=7, chord=3, key=2) == midis  # deterministic
    t.join(timeout=120)
    assert rc == [0]


def test_serve_load_harness(tmp_path):
    """bench/serve_load.py spawns a service, drives concurrent clients,
    and prints one JSON result line (the STATUS.md serving-number
    harness, smoke-tested end to end on CPU)."""
    import json
    import subprocess
    import sys

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench", "serve_load.py"),
         "--ckpt-dir", ckpt, "--bars", "2", "--samples", "1",
         "--clients", "2", "--requests", "2", "--coalesce", "2"],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["requests"] == 4 and result["errors"] == 0
    assert result["req_per_s"] > 0 and result["p50_ms"] > 0
    assert result["service_rc"] == 0


def test_serve_push_reload(tmp_path, capsys, monkeypatch):
    """{"cmd": "reload"} hot-swaps a newer checkpoint on demand (push
    mode — no --reload-every poll, no timing): the same seed answers
    differently after the reload and identically to a fresh service; a
    reload with nothing new answers {"reloaded": null}. Covered on the
    serial and coalesced stdin paths plus the TCP transport."""
    import dataclasses
    import io
    import json
    import socket
    import threading
    import time

    import jax

    from musicvae_tpu import checkpoints
    from musicvae_tpu.config import get_config
    from musicvae_tpu.train import create_state

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")

    def write_step2():
        cfg = get_config("c1_conv_bar")
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, enc_channels=(4, 8, 8, 8, 8),
                dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
                bar_feat_dim=32, dtype="float32"),
            train=dataclasses.replace(cfg.train, batch_size=4))
        _, state = create_state(cfg)
        state = state.replace(
            step=state.step + 2,
            params=jax.tree.map(lambda a: a + 0.5, state.params))
        mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=2)
        checkpoints.save(mgr, state, cfg, wait=True)

    class PacedStdin:
        def __iter__(self):
            yield json.dumps({"id": 0, "cmd": "reload"}) + "\n"  # nothing new
            yield json.dumps({"id": 1, "seed": 7}) + "\n"
            time.sleep(0.3)
            write_step2()
            yield json.dumps({"id": 2, "cmd": "reload"}) + "\n"
            yield json.dumps({"id": 3, "seed": 7}) + "\n"

    for extra in ([], ["--coalesce", "2"]):
        # reset to the step-1 checkpoint for each mode
        import shutil
        shutil.rmtree(tmp_path / "ckpt", ignore_errors=True)
        ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", PacedStdin())
        assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir",
                     ckpt, "--bars", "2", "--samples", "2"] + extra) == 0
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert [l["id"] for l in lines] == [0, 1, 2, 3], extra
        assert lines[0]["reloaded"] is None and lines[0]["step"] == 1
        assert lines[2]["reloaded"] == 2 and lines[2]["step"] == 2
        assert lines[1]["midi_b64"] != lines[3]["midi_b64"], extra

        # post-reload response == a fresh service on the new checkpoint
        monkeypatch.setattr(
            "sys.stdin", io.StringIO(json.dumps({"id": 9, "seed": 7}) + "\n"))
        assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir",
                     ckpt, "--bars", "2", "--samples", "2"]) == 0
        fresh = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert fresh[0]["midi_b64"] == lines[3]["midi_b64"], extra

    # TCP transport: reload with nothing new answers null, service keeps
    # serving (generation counts toward --max-requests, reload doesn't)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    rc = []
    t = threading.Thread(target=lambda: rc.append(main(
        ["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port),
         "--max-requests", "1"])), daemon=True)
    t.start()
    deadline = time.time() + 120
    while True:
        try:
            conn = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    try:
        conn.sendall((json.dumps({"id": 0, "cmd": "reload"}) + "\n"
                      + json.dumps({"id": 1, "seed": 4}) + "\n").encode())
        f = conn.makefile("r")
        got = [json.loads(f.readline()) for _ in range(2)]
    finally:
        conn.close()
    t.join(timeout=120)
    assert rc == [0]
    assert got[0]["reloaded"] is None and got[0]["step"] == 2
    assert got[1]["midi_b64"]


def test_convert_safetensors_roundtrip(tmp_path, capsys):
    """convert --to-safetensors / --from-safetensors round-trips params
    exactly, shares the torch export's canonical tensor names, and
    carries config/step metadata."""
    import jax
    from safetensors import safe_open

    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import create_state

    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    st = str(tmp_path / "m.safetensors")
    assert main(["convert", "--to-safetensors", ckpt, "--out", st]) == 0

    with safe_open(st, framework="np") as f:
        meta = f.metadata()
        names = set(f.keys())
    assert meta["config"] == "c2_gru_4bar" and meta["step"] == "1"
    # same canonical names as the torch export
    pt = str(tmp_path / "m.pt")
    assert main(["convert", "--to-torch", ckpt, "--out", pt]) == 0
    import torch
    assert names == set(torch.load(pt, weights_only=True).keys())

    # importing under a config whose shapes don't match the file is
    # refused BEFORE a broken checkpoint is written (the tiny test
    # model's tensors vs canonical c2 sizes)
    out2 = str(tmp_path / "imported")
    assert main(["convert", "--from-safetensors", st,
                 "--config", "c2_gru_4bar", "--out", out2, "--step",
                 "7"]) == 2
    assert "does not match config" in capsys.readouterr().err
    assert not os.path.exists(out2) or not os.listdir(out2)

    # exact round-trip at the file's own sizes, via the library path
    mgr = checkpoints.make_manager(ckpt)
    cfg = checkpoints.restore_config(mgr)
    _, orig = create_state(cfg)
    orig, _ = checkpoints.restore(mgr, orig)

    from musicvae_tpu.checkpoints.torch_convert import \
        torch_state_dict_to_flax
    from safetensors.torch import load_file
    back = torch_state_dict_to_flax(load_file(st), cfg)
    for a, b in zip(jax.tree.leaves(jax.device_get(orig.params)),
                    jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # exactly one direction still enforced across all four flags
    assert main(["convert", "--to-torch", ckpt, "--to-safetensors", ckpt,
                 "--out", st]) == 2


def test_describe_checkpoint(tmp_path, capsys):
    """`describe` reports a checkpoint dir's embedded config, steps,
    param count, and best sidecar — read-only (no weights loaded)."""
    import json

    ckpt = _tiny_ckpt(tmp_path, "c2_gru_4bar")
    assert main(["describe", "--ckpt-dir", ckpt]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["config"] == "c2_gru_4bar"
    assert info["model_kind"] == "gru_seq"
    assert info["steps"] == [1] and info["latest_step"] == 1
    assert info["params"] > 1000
    assert info["roll"] == "96x128" and info["window_bars"] == 4
    assert info["quarantined"] == [] and "best" not in info

    # best sidecar surfaces when present
    best_dir = tmp_path / "ckpt" / "best"
    best_dir.mkdir(parents=True, exist_ok=True)
    (best_dir / "best_metric.json").write_text(
        json.dumps({"eval_loss": 1.25, "step": 1}))
    assert main(["describe", "--ckpt-dir", ckpt]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["best"]["eval_loss"] == 1.25

    assert main(["describe", "--ckpt-dir", str(tmp_path / "nope")]) == 2


def test_coalesced_generate_mesh_sharded_matches_unsharded():
    """make_coalesced_generate_fn(mesh=...) keeps the serial program's
    sample-axis sharding (GSPMD propagates the output constraint through
    the batched sweep) without changing a single bit of output."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from musicvae_tpu.config import get_config
    from musicvae_tpu.generate import make_coalesced_generate_fn
    from musicvae_tpu.models.vae import init_params
    from musicvae_tpu.parallel import make_mesh

    cfg = get_config("c1_conv_bar")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=8, gru_hidden=16,
            bar_feat_dim=16, dtype="float32"),
        gen=dataclasses.replace(cfg.gen, num_samples=4, num_bars=2),
        mesh=dataclasses.replace(cfg.mesh, data=4))
    model, params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(cfg.mesh)

    W, B = 2, cfg.gen.num_samples
    T, P = cfg.midi.steps_per_bar, cfg.midi.num_pitches
    keys = jax.vmap(jax.random.key)(jnp.arange(W))
    sb = np.zeros((W, B, T, P), np.uint8)
    ch = np.zeros((W, B, cfg.gen.num_bars), np.int32)
    ks = np.zeros((W, B), np.int32)

    plain = np.asarray(
        make_coalesced_generate_fn(cfg, model)(params, keys, sb, ch, ks))
    sharded_fn = make_coalesced_generate_fn(cfg, model, mesh=mesh)
    out = sharded_fn(params, keys, sb, ch, ks)
    np.testing.assert_array_equal(np.asarray(out), plain)


def test_serve_unknown_cmd_in_band_error(tmp_path, capsys, monkeypatch):
    """A typo'd/unknown cmd is an in-band error on both stdin dispatch
    modes — it must not fall through and burn a generation sweep."""
    import io
    import json

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    requests = json.dumps({"id": 1, "cmd": "stat"}) + "\n" \
        + json.dumps({"id": 2, "seed": 3}) + "\n"
    for extra in ([], ["--coalesce", "2"]):
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", io.StringIO(requests))
        assert main(["serve", "--config", "c1_conv_bar", "--ckpt-dir",
                     ckpt, "--bars", "2", "--samples", "1"] + extra) == 0
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert [l["id"] for l in lines] == [1, 2], extra
        assert "unknown cmd 'stat'" in lines[0]["error"], extra
        assert lines[1]["midi_b64"]


def test_train_midi_glob_and_missing_data_error(tmp_path, capsys):
    """`train --midi-glob` tensorizes .mid files in-process and trains;
    `--data <missing path>` errors instead of silently training on the
    synthetic fallback corpus (the typo'd-path footgun)."""
    from musicvae_tpu.data import synth_corpus

    for i, (midi, _, _) in enumerate(synth_corpus(2, n_bars=6, seed=1)):
        (tmp_path / f"p{i}.mid").write_bytes(midi)
    rc = main(["train", "--config", "c1_conv_bar",
               "--midi-glob", str(tmp_path / "*.mid"), "--steps", "1",
               "--ckpt-dir", str(tmp_path / "c"),
               "--log-dir", str(tmp_path / "l")])
    assert rc == 0
    err = capsys.readouterr().err
    assert "tensorized 2 MIDI files" in err

    rc = main(["train", "--config", "c1_conv_bar",
               "--data", str(tmp_path / "typo.npz"), "--steps", "1",
               "--ckpt-dir", str(tmp_path / "c2"),
               "--log-dir", str(tmp_path / "l2")])
    assert rc == 2
    assert "does not exist" in capsys.readouterr().err

    rc = main(["train", "--config", "c1_conv_bar",
               "--midi-glob", str(tmp_path / "nothing_matches_*.mid"),
               "--steps", "1", "--ckpt-dir", str(tmp_path / "c3"),
               "--log-dir", str(tmp_path / "l3")])
    assert rc == 2
    assert "no MIDI files" in capsys.readouterr().err


def test_resume_cosine_lr_without_reflags(tmp_path, capsys):
    """A run trained with --lr-schedule cosine must resume WITHOUT the
    flag re-passed: the restore template must come from the CHECKPOINT's
    config (review finding: a CLI-side template lacked the schedule's
    step-count leaf, making every step unrestorable), and changing the
    schedule on resume is refused (the optimizer-state structure
    differs)."""
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--lr-schedule", "cosine",
                 "--lr-warmup-steps", "1",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--resume", "--steps", "4",
                 "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    err = capsys.readouterr().err
    assert "resumed from step 2" in err

    rc = main(["train", "--config", "c1_conv_bar", "--data", out,
               "--resume", "--steps", "6", "--lr-schedule", "constant",
               "--ckpt-dir", str(tmp_path / "c"),
               "--log-dir", str(tmp_path / "l")])
    assert rc == 2
    assert "cannot change --lr-schedule on resume" in capsys.readouterr().err


def test_fresh_train_refuses_dir_with_checkpoints(tmp_path, capsys):
    """Starting a run WITHOUT --resume into a dir that already holds
    checkpoints is refused: Orbax silently skips saves at steps <= the
    existing latest, so the new run's work would be unsaveable (review
    finding: the preemption message would then claim a save that never
    happened)."""
    out = str(tmp_path / "d.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "2", "--out", out]) == 0
    assert main(["train", "--config", "c1_conv_bar", "--data", out,
                 "--steps", "2", "--ckpt-dir", str(tmp_path / "c"),
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    rc = main(["train", "--config", "c1_conv_bar", "--data", out,
               "--steps", "4", "--ckpt-dir", str(tmp_path / "c"),
               "--log-dir", str(tmp_path / "l2")])
    assert rc == 2
    assert "pass --resume" in capsys.readouterr().err


@pytest.mark.slow
def test_serve_socket_sigterm_graceful(tmp_path):
    """SIGTERM to a TCP serve process: answered requests are honored, the
    server drains and exits 0 with the served-count summary (not a
    mid-request kill)."""
    import json
    import signal
    import socket
    import subprocess
    import sys as _sys
    import time

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        os.pardir))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, env.get("PYTHONPATH", "")) if p)
    proc = subprocess.Popen(
        [_sys.executable, "-u", "-m", "musicvae_tpu", "serve",
         "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
         "--bars", "2", "--samples", "1", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo,
        text=True)
    try:
        deadline = time.time() + 300       # startup compile
        while True:
            try:
                conn = socket.create_connection(("127.0.0.1", port),
                                                timeout=5)
                break
            except OSError:
                assert proc.poll() is None, proc.communicate()[1][-3000:]
                assert time.time() < deadline, "serve never listened"
                time.sleep(0.2)
        with conn:
            conn.sendall((json.dumps({"id": 1, "seed": 0}) + "\n")
                         .encode())
            resp = json.loads(conn.makefile("r").readline())
        assert resp["id"] == 1 and "midi_b64" in resp, resp
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, err[-3000:]
    assert "in-flight requests drained" in err
    assert "served 1 requests, 0 errors" in err


def test_serve_protocol_fuzz_survives(tmp_path, capsys, monkeypatch):
    """Protocol fuzz: 60 adversarial stdin lines (binary garbage, wrong
    JSON types, huge/negative fields, nested junk, unknown cmds) must
    each produce exactly one in-band line — never a crash, never a
    silent drop — and a well-formed request afterwards still works."""
    import io
    import json
    import random

    ckpt = _tiny_ckpt(tmp_path, "c1_conv_bar")
    rng = random.Random(0)

    def junk_value(depth=0):
        choices = [
            lambda: rng.randint(-2**40, 2**40),
            lambda: rng.random() * 1e300,
            lambda: "x" * rng.randint(0, 50),
            lambda: None,
            lambda: [junk_value(depth + 1)] if depth < 2 else [],
            lambda: {"k": junk_value(depth + 1)} if depth < 2 else {},
            lambda: True,
        ]
        return rng.choice(choices)()

    lines = []
    for i in range(60):
        kind = i % 6
        if kind == 0:
            lines.append("\x00\xff garbage \x7f")
        elif kind == 1:
            lines.append(json.dumps(junk_value()))   # non-dict JSON
        elif kind == 2:
            lines.append(json.dumps({"id": i, "seed": junk_value()}))
        elif kind == 3:
            lines.append(json.dumps({"id": i, "cmd": "x" * 20}))
        elif kind == 4:
            lines.append(json.dumps(
                {"id": i, "chord": junk_value(), "key": junk_value(),
                 "seed_midi_b64": junk_value()}))
        else:
            k = junk_value()
            lines.append(json.dumps(
                {"id": i, (k if isinstance(k, str) else "f"):
                 junk_value()}))
    lines.append(json.dumps({"id": "final", "seed": 1}))

    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
    rc = main(["serve", "--config", "c1_conv_bar", "--ckpt-dir", ckpt,
               "--bars", "1", "--samples", "1"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # one response per non-empty line, all parseable JSON
    assert len(out) == len(lines)
    parsed = [json.loads(ln) for ln in out]
    assert all(("error" in p) or ("midi_b64" in p) for p in parsed)
    final = [p for p in parsed if p.get("id") == "final"]
    assert final and "midi_b64" in final[0]   # still serving after fuzz


def test_coalesced_runner_two_tier():
    """A width-W runner answers a LONE request through its W=1 trace (1x
    sweep FLOPs instead of Wx padding — VERDICT r3 weak #4), bit-identical
    to the same slot inside a full-width batch."""
    import dataclasses

    import jax

    from musicvae_tpu.cli import _CoalescedRunner
    from musicvae_tpu.config import get_config
    from musicvae_tpu.generate import make_coalesced_generate_fn
    from musicvae_tpu.models.vae import init_params

    cfg = get_config("c2_gru_4bar")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=8, gru_hidden=16,
            bar_feat_dim=16, dtype="float32"),
        gen=dataclasses.replace(cfg.gen, num_samples=2, num_bars=2))
    model, params = init_params(cfg, jax.random.key(0))
    coal = make_coalesced_generate_fn(cfg, model)
    runner = _CoalescedRunner(coal, {"params": params}, cfg, width=3)
    runner.warm()
    lone = runner.run([(7, runner._zero)])
    assert len(lone) == 1
    full = runner.run([(5, runner._zero), (7, runner._zero)])
    np.testing.assert_array_equal(lone[0], full[1])


def test_cli_max_events_flag(tmp_path, capsys):
    """preprocess on a dense piece: default cap errors cleanly naming the
    flag; --max-events raises the cap and succeeds (VERDICT r3 weak #3)."""
    import dataclasses

    from musicvae_tpu.config import MidiSpec
    from musicvae_tpu.midi import smf as smf_mod

    # a deliberately dense 2-bar piece: 6000 sixteenth notes
    tpq = 480
    notes = [smf_mod.Note(21 + (i % 88), i * 8, i * 8 + 6, 100)
             for i in range(6000)]
    path = tmp_path / "dense.mid"
    path.write_bytes(smf_mod.write_smf(notes, tpq, 500000))
    out = str(tmp_path / "cache.npz")

    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out])
    err = capsys.readouterr().err
    assert rc == 2
    assert "max-events" in err or "overflow" in err

    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out,
               "--max-events", "8192"])
    assert rc == 0
    assert os.path.exists(out)
    # bad value is rejected by argparse (usage error, exit 2)
    with pytest.raises(SystemExit):
        main(["preprocess", "--config", "c1_conv_bar",
              "--midi-glob", str(path), "--out", out,
              "--max-events", "0"])


def test_cli_ignore_time_signature_flag(tmp_path, capsys):
    """preprocess on a 3/4 corpus: hard error by default (silent 4/4
    mis-chunking would corrupt every bar), --ignore-time-signature forces
    config-meter chunking (VERDICT r3 missing #3)."""
    import struct

    # 3/4 piece long enough to yield a 1-bar window
    track = bytes([0x00, 0xFF, 0x58, 0x04, 3, 2, 0x18, 0x08])
    for i in range(8):
        track += bytes([0x00 if i == 0 else 0x60, 0x90, 60 + i, 100,
                        0x60, 0x80, 60 + i, 0])
    track += bytes([0x00, 0xFF, 0x2F, 0x00])
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(track)) + track)
    path = tmp_path / "waltz.mid"
    path.write_bytes(data)
    out = str(tmp_path / "cache34.npz")

    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out])
    err = capsys.readouterr().err
    assert rc == 2
    assert "time signature" in err

    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out,
               "--ignore-time-signature"])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_meter_flag(tmp_path, capsys):
    """`preprocess --meter 3/4` ingests a waltz corpus with exact 3/4
    bar boundaries (the grid adapts, the 96-step bar shape doesn't);
    unsupported meters fail with a clean error naming the constraint."""
    from musicvae_tpu.midi import smf as smf_mod

    notes = [smf_mod.Note(48 + (i % 24), i * 480, i * 480 + 240, 100)
             for i in range(36)]                 # 12 bars of 3/4
    path = tmp_path / "waltz34.mid"
    path.write_bytes(smf_mod.write_smf(notes, 480, 500_000,
                                       quarters_per_bar=3))
    out = str(tmp_path / "cache_meter.npz")

    # without --meter: hard time-signature error (not silent 4/4 bars)
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--midi-glob", str(path), "--out", out]) == 2
    assert "time signature" in capsys.readouterr().err

    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--midi-glob", str(path), "--out", out,
                 "--meter", "3/4"]) == 0
    import numpy as np
    with np.load(out) as z:
        assert z["bars"].shape == (12, 96, 128)  # 12 exact 3/4 bars

    # 5/4 is a SUPPORTED meter since round 5 (the bar adapts to 120
    # steps) — but this corpus declares 3/4, so ingestion still fails
    # the time-signature validation, not the meter parser
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out, "--meter", "5/4"])
    err = capsys.readouterr().err
    assert rc == 2 and "time signature" in err
    # ... and a real 5/4 corpus ingests with exact 120-step bars
    notes54 = [smf_mod.Note(48 + (i % 24), i * 480, i * 480 + 240, 100)
               for i in range(30)]                # 6 bars of 5/4
    path54 = tmp_path / "odd54.mid"
    path54.write_bytes(smf_mod.write_smf(notes54, 480, 500_000,
                                         meter=(5, 4)))
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--midi-glob", str(path54), "--out", out,
                 "--meter", "5/4"]) == 0
    with np.load(out) as z:
        assert z["bars"].shape == (6, 120, 128)   # 6 exact 5/4 bars
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out, "--meter", "waltz"])
    assert rc == 2 and "N/D" in capsys.readouterr().err
    # a truly unrepresentable meter still errors cleanly
    rc = main(["preprocess", "--config", "c1_conv_bar",
               "--midi-glob", str(path), "--out", out, "--meter", "1/64"])
    assert rc == 2 and "not a whole number" in capsys.readouterr().err


def test_meter_survives_cache_and_resume(tmp_path, capsys):
    """The meter grid is persisted (cache metadata + checkpoint config)
    and validated, closing the round-4 review findings: a 3/4 cache
    refuses to train a 4/4-configured model, and `train --resume`
    re-tensorizes under the CHECKPOINT's meter without re-passing the
    flag."""
    from musicvae_tpu.midi import smf as smf_mod

    notes = [smf_mod.Note(48 + (i % 24), i * 480, i * 480 + 240, 100)
             for i in range(24)]                 # 8 bars of 3/4
    path = tmp_path / "w34.mid"
    path.write_bytes(smf_mod.write_smf(notes, 480, 500_000,
                                       quarters_per_bar=3))
    cache = str(tmp_path / "w34.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--midi-glob", str(path), "--out", cache,
                 "--meter", "3/4"]) == 0

    # the cache refuses a 4/4-configured train run, naming the remedy
    ck = str(tmp_path / "wck")
    rc = main(["train", "--config", "c1_conv_bar", "--data", cache,
               "--steps", "2", "--ckpt-dir", ck,
               "--log-dir", str(tmp_path / "l1")])
    err = capsys.readouterr().err
    assert rc == 2 and "grid" in err and "--meter" in err

    # with the flag: trains; the checkpoint embeds the 3/4 MidiSpec
    assert main(["train", "--config", "c1_conv_bar", "--data", cache,
                 "--steps", "2", "--ckpt-dir", ck, "--meter", "3/4",
                 "--log-dir", str(tmp_path / "l2")]) == 0
    from musicvae_tpu import checkpoints
    cfg = checkpoints.restore_config(checkpoints.make_manager(ck))
    assert (cfg.midi.steps_per_quarter, cfg.midi.quarters_per_bar) \
        == (32, 3)

    # resume WITHOUT --meter: the checkpoint's grid drives ingestion —
    # both the cache path (validated OK) and the --midi-glob path
    # (re-tensorized on the 3/4 grid rather than erroring/mis-chunking)
    capsys.readouterr()
    assert main(["train", "--config", "c1_conv_bar", "--data", cache,
                 "--steps", "4", "--ckpt-dir", ck, "--resume",
                 "--log-dir", str(tmp_path / "l3")]) == 0
    assert "resumed from step" in capsys.readouterr().err
    capsys.readouterr()
    assert main(["train", "--config", "c1_conv_bar",
                 "--midi-glob", str(path),
                 "--steps", "6", "--ckpt-dir", ck, "--resume",
                 "--log-dir", str(tmp_path / "l4")]) == 0
    err = capsys.readouterr().err
    assert "resumed from step" in err and "tensorized 1 MIDI" in err


def test_meter_54_train_generate_describe_e2e(tmp_path, capsys):
    """Round-5 bar-adapting meters end to end: `train --meter 5/4`
    trains a 120-step-bar model on a synthetic 5/4 corpus, `describe`
    reports 5/4 and the 120-step roll, and generated exports declare
    5/4 (VERDICT r4 missing #4 done-criterion)."""
    from musicvae_tpu.midi import smf as smf_mod

    data = str(tmp_path / "d54.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "3", "--meter", "5/4",
                 "--out", data]) == 0
    with np.load(data) as z:
        assert z["bars"].shape[1:] == (120, 128)
    ck = str(tmp_path / "ck54")
    assert main(["train", "--config", "c1_conv_bar", "--data", data,
                 "--steps", "2", "--meter", "5/4", "--ckpt-dir", ck,
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["describe", "--ckpt-dir", ck]) == 0
    out = capsys.readouterr().out
    assert '"5/4"' in out and '"120x128"' in out

    gen_dir = str(tmp_path / "g54")
    assert main(["generate", "--config", "c1_conv_bar", "--ckpt-dir", ck,
                 "--bars", "2", "--samples", "1", "--write-midis", "1",
                 "--out-dir", gen_dir]) == 0
    rolls = np.load(gen_dir + "/rolls.npy")
    assert rolls.shape == (1, 2, 120, 128)
    import glob as _glob
    mids = sorted(_glob.glob(gen_dir + "/*.mid"))
    assert mids
    with open(mids[0], "rb") as f:
        assert smf_mod.parse_smf(f.read()).time_signatures == ((5, 4),)


def test_meter_68_describe_and_export_true_meter(tmp_path, capsys):
    """A --meter 6/8 run reports and exports 6/8 — not the
    grid-equivalent 3/4 (the round-4 reduced-qpb lie)."""
    from musicvae_tpu.midi import smf as smf_mod

    data = str(tmp_path / "d68.npz")
    assert main(["preprocess", "--config", "c1_conv_bar",
                 "--synthetic-pieces", "3", "--meter", "6/8",
                 "--out", data]) == 0
    ck = str(tmp_path / "ck68")
    assert main(["train", "--config", "c1_conv_bar", "--data", data,
                 "--steps", "2", "--meter", "6/8", "--ckpt-dir", ck,
                 "--log-dir", str(tmp_path / "l")]) == 0
    capsys.readouterr()
    assert main(["describe", "--ckpt-dir", ck]) == 0
    out = capsys.readouterr().out
    assert '"6/8"' in out and '"3/4"' not in out

    gen_dir = str(tmp_path / "g68")
    assert main(["generate", "--config", "c1_conv_bar", "--ckpt-dir", ck,
                 "--bars", "2", "--samples", "1", "--write-midis", "1",
                 "--out-dir", gen_dir]) == 0
    import glob as _glob
    mids = sorted(_glob.glob(gen_dir + "/*.mid"))
    with open(mids[0], "rb") as f:
        assert smf_mod.parse_smf(f.read()).time_signatures == ((6, 8),)
